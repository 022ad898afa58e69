"""Batch pipeline and command-line interface.

Capability parity with the reference ``yaw_cli`` tool
(/root/reference/src/yaw/cli/): YAML-driven project setups describing the
input catalogs (with tomographic unknown bins), the correlation
configuration and a task list; a project directory layout with cached
catalogs, pair counts, estimates and plots; a task scheduler with
dependency resolution and resume support; and an argparse front end.
"""

from yet_another_wizz_tpu.cli.pipeline import Pipeline, run_setup
from yet_another_wizz_tpu.cli.config import ProjectConfig

__all__ = [
    "Pipeline",
    "ProjectConfig",
    "run_setup",
]
