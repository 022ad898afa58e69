"""Host-side logic of the tomographic CLI proof harness
(scripts/tomo_pipeline_proof.py): pipeline.log task-wall parsing."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from tomo_pipeline_proof import parse_task_walls  # noqa: E402


def _write_log(tmp_path, lines):
    path = tmp_path / "pipeline.log"
    path.write_text("\n".join(lines) + "\n")
    return path


class TestParseTaskWalls:
    def test_pairs_timed_from_timestamps(self, tmp_path):
        log = _write_log(tmp_path, [
            "2026-08-20 07:00:00,000 INFO yawt.cli running task 'cache_ref'",
            "2026-08-20 07:00:01,500 INFO yawt.cli task 'cache_ref' "
            "finished after 0m01.50s",
            "2026-08-20 07:00:01,500 INFO yawt.cli running task 'cross_corr'",
            "2026-08-20 07:00:31,250 INFO yawt.cli task 'cross_corr' "
            "finished after 0m29.75s",
        ])
        assert parse_task_walls(log) == {
            "cache_ref": 1.5, "cross_corr": 29.8,
        }

    def test_unrelated_and_malformed_lines_ignored(self, tmp_path):
        log = _write_log(tmp_path, [
            "2026-08-20 07:00:00,000 DEBUG yawt.engine counting DD",
            "not a log line at all",
            "2026-08-20 07:00:00,000 INFO yawt.cli running task 'hist'",
            "2026-08-20 07:00:00,000 INFO yawt.cli running 7 task(s)",
            "2026-08-20 07:00:02,000 INFO yawt.cli task 'hist' "
            "finished after 0m02.00s",
        ])
        assert parse_task_walls(log) == {"hist": 2.0}

    def test_unmatched_finish_or_start_dropped(self, tmp_path):
        # a crashed run may leave a start without a finish (and a resumed
        # log may hold a finish whose start predates the file)
        log = _write_log(tmp_path, [
            "2026-08-20 07:00:00,000 INFO yawt.cli task 'estimate' "
            "finished after 0m09.00s",
            "2026-08-20 07:00:05,000 INFO yawt.cli running task 'plot'",
        ])
        assert parse_task_walls(log) == {}

    def test_repeated_task_accumulates(self, tmp_path):
        # tomographic pipelines run some tasks once per bin under the
        # same task name
        log = _write_log(tmp_path, [
            "2026-08-20 07:00:00,000 INFO yawt.cli running task 'cross_corr'",
            "2026-08-20 07:00:01,000 INFO yawt.cli task 'cross_corr' "
            "finished after 0m01.00s",
            "2026-08-20 07:00:01,000 INFO yawt.cli running task 'cross_corr'",
            "2026-08-20 07:00:03,500 INFO yawt.cli task 'cross_corr' "
            "finished after 0m02.50s",
        ])
        assert parse_task_walls(log) == {"cross_corr": 3.5}
