"""The code examples in the user guide must actually run.

Extracts ``python`` code blocks from the docs and executes them against
generated input files (guards the docs against API drift)."""

import re
from pathlib import Path

import numpy as np
import pytest

DOCS = Path(__file__).parent.parent / "docs"


def python_blocks(path):
    text = path.read_text()
    return re.findall(r"```python\n(.*?)```", text, flags=re.DOTALL)


@pytest.fixture(scope="module")
def example_files(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from yet_another_wizz_tpu.examples import generate_mock_data

    root = tmp_path_factory.mktemp("docs_example")
    mock = generate_mock_data(
        num_reference=1500, num_unknown=2000, num_randoms=4000, seed=7
    )
    names = {"reference": "reference", "randoms": "randoms",
             "unknown": "unknown"}
    for key, stem in names.items():
        sample = mock[key]
        cols = dict(
            RA=np.rad2deg(sample["ra"]), Dec=np.rad2deg(sample["dec"])
        )
        if sample.get("redshifts") is not None:
            cols["z"] = sample["redshifts"]
        pq.write_table(pa.table(cols), root / f"{stem}.pqt")
    return root


def test_getting_started_measurement(example_files, tmp_path, monkeypatch):
    blocks = python_blocks(DOCS / "user_guide" / "getting_started.md")
    assert blocks, "no python examples found"
    code = blocks[0]
    # smaller patch count for the miniature catalogs; headless plotting
    code = code.replace("patch_num=64", "patch_num=4")
    code = code.replace("num_bins=11", "num_bins=4")
    code = code.replace("nz.plot()", "")
    monkeypatch.chdir(example_files)
    namespace = {}
    exec(compile(code, "getting_started.md", "exec"), namespace)
    nz = namespace["nz"]
    assert np.all(np.isfinite(nz.data))
    assert (example_files / "nz_estimate.dat").exists()


def test_remaining_python_blocks_compile():
    """Every other python example must at least be valid syntax (the
    generated API reference holds signature blocks, not code)."""
    count = 0
    for path in DOCS.rglob("*.md"):
        if path.is_relative_to(DOCS / "api"):
            continue
        for block in python_blocks(path):
            compile(block, str(path), "exec")
            count += 1
    assert count >= 2


def test_tutorial_runs_end_to_end(tmp_path, monkeypatch):
    """Execute every python block of the tutorial sequentially in one
    namespace (the full walkthrough: example data -> catalogs -> w_sp/w_ss
    -> n(z) with plot -> save/load round trip)."""
    import urllib.error
    import urllib.request

    blocks = python_blocks(DOCS / "user_guide" / "tutorial.md")
    assert len(blocks) >= 6, "tutorial must keep its executable blocks"

    # deterministic mock example in a private cache; shrink the mock so
    # the CPU run stays fast (the tutorial text uses the full sizes)
    monkeypatch.setenv("YAWT_EXAMPLE_FORCE_MOCK", "1")
    monkeypatch.setenv("YAWT_EXAMPLE_CACHE", str(tmp_path / "cache"))
    monkeypatch.chdir(tmp_path)

    import importlib

    import yet_another_wizz_tpu.examples as examples

    examples = importlib.reload(examples)
    real_generate = examples.generate_mock_data

    def small_mock(num_reference, num_unknown, num_randoms, **kwargs):
        return real_generate(
            num_reference=min(num_reference, 2000),
            num_unknown=min(num_unknown, 3000),
            num_randoms=min(num_randoms, 6000),
            **kwargs,
        )

    monkeypatch.setattr(examples, "generate_mock_data", small_mock)

    # no egress in CI: the download attempt must fail fast and the
    # tutorial's RuntimeError guard must carry on with the mock
    def offline(url, timeout=None):
        raise urllib.error.URLError("offline test environment")

    monkeypatch.setattr(urllib.request, "urlopen", offline)

    namespace = {}
    for i, block in enumerate(blocks):
        exec(compile(block, f"tutorial.md block {i}", "exec"), namespace)

    assert not namespace["examples"].USES_REAL_DATA
    nz = namespace["nz"]
    # the shrunken mock leaves sparse bins NaN (RR=0); most must be finite
    assert np.isfinite(nz.data).sum() >= nz.data.size // 2
    assert (tmp_path / "nz_tutorial.png").exists()
    assert (tmp_path / "w_sp.hdf").exists()
    assert (tmp_path / "nz_tutorial.dat").exists()
    # restore module state for other tests: the env overrides must be
    # gone BEFORE the reload, or the module re-imports in mock mode and
    # later tests see stale state (e.g. the generated-API-docs check)
    monkeypatch.delenv("YAWT_EXAMPLE_FORCE_MOCK")
    monkeypatch.delenv("YAWT_EXAMPLE_CACHE")
    importlib.reload(examples)

def test_loading_page_runs(example_files, tmp_path, monkeypatch):
    """Every python block of the data-loading page runs in sequence
    against the miniature parquet catalogs."""
    import shutil

    for stem in ("reference", "unknown"):
        shutil.copy(example_files / f"{stem}.pqt", tmp_path / f"{stem}.pqt")
    monkeypatch.chdir(tmp_path)

    blocks = python_blocks(DOCS / "user_guide" / "loading.md")
    assert len(blocks) >= 5
    namespace = {}
    for i, block in enumerate(blocks):
        exec(compile(block, f"loading.md block {i}", "exec"), namespace)

    assert (tmp_path / "ref_cache" / "patch_0" / "data.bin").exists()
    assert namespace["reopened"].num_patches == 8
    assert namespace["lazy"].num_patches == 8
    assert namespace["unknown"].num_patches == 8  # shared centers


def test_randoms_page_runs(example_files, tmp_path, monkeypatch):
    """The randoms page: box + healpix generators, external randoms and
    the footprint check plot."""
    import shutil

    shutil.copy(example_files / "randoms.pqt", tmp_path / "randoms.pqt")
    monkeypatch.chdir(tmp_path)

    blocks = python_blocks(DOCS / "user_guide" / "randoms.md")
    assert len(blocks) >= 4
    namespace = {}
    for i, block in enumerate(blocks):
        # miniature sample sizes for the CPU test run
        block = block.replace("num_randoms=100_000", "num_randoms=8_000")
        exec(compile(block, f"randoms.md block {i}", "exec"), namespace)

    assert namespace["randoms"].has_redshifts
    masked = namespace["masked_randoms"]
    assert masked.num_patches == namespace["randoms"].num_patches
    assert namespace["ext_randoms"].num_patches == 16
    assert (tmp_path / "randoms_check.png").exists()


def test_logging_page_runs(tmp_path, monkeypatch):
    """The logging page: handler setup, captured stream, file logging
    and the profiler trace."""
    import logging as stdlib_logging
    import sys

    from yet_another_wizz_tpu.utils.logging import LOGGER_NAME

    monkeypatch.chdir(tmp_path)
    pkg_logger = stdlib_logging.getLogger(LOGGER_NAME)
    saved = (pkg_logger.handlers[:], pkg_logger.level, sys.excepthook)
    try:
        blocks = python_blocks(DOCS / "user_guide" / "logging.md")
        assert len(blocks) >= 4
        namespace = {}
        for i, block in enumerate(blocks):
            exec(compile(block, f"logging.md block {i}", "exec"), namespace)
        assert "patch" in namespace["capture"].getvalue()
        assert (tmp_path / "measurement.log").exists()
    finally:
        pkg_logger.handlers, pkg_logger.level = saved[0], saved[1]
        sys.excepthook = saved[2]
