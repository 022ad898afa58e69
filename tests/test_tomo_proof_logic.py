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


class TestParseBinWalls:
    def test_marginal_bin_walls(self, tmp_path):
        from tomo_pipeline_proof import parse_bin_walls

        log = _write_log(tmp_path, [
            "2026-08-20 07:00:00,000 CLIENT yawt.cli running task "
            "'cross_corr'",
            "2026-08-20 07:00:02,000 CLIENT yawt.cli.tasks processing "
            "bin 1 / 3",
            "2026-08-20 07:00:32,000 CLIENT yawt.cli.tasks processing "
            "bin 2 / 3",
            "2026-08-20 07:00:42,000 CLIENT yawt.cli.tasks processing "
            "bin 3 / 3",
            "2026-08-20 07:00:52,500 CLIENT yawt.cli task 'cross_corr' "
            "finished after 0m52.50s",
        ])
        # bin 1 pays the shared sides (30 s); bins 2-3 are marginal
        assert parse_bin_walls(log) == {"cross_corr": [30.0, 10.0, 10.5]}

    def test_bins_scoped_per_task(self, tmp_path):
        from tomo_pipeline_proof import parse_bin_walls

        log = _write_log(tmp_path, [
            "2026-08-20 07:00:00,000 CLIENT yawt.cli running task "
            "'auto_unk'",
            "2026-08-20 07:00:01,000 CLIENT yawt.cli.tasks processing "
            "bin 1 / 2",
            "2026-08-20 07:00:05,000 CLIENT yawt.cli.tasks processing "
            "bin 2 / 2",
            "2026-08-20 07:00:08,000 CLIENT yawt.cli task 'auto_unk' "
            "finished after 0m08.00s",
            "2026-08-20 07:00:08,000 CLIENT yawt.cli running task "
            "'cross_corr'",
            "2026-08-20 07:00:10,000 CLIENT yawt.cli.tasks processing "
            "bin 1 / 2",
            "2026-08-20 07:00:20,000 CLIENT yawt.cli.tasks processing "
            "bin 2 / 2",
            "2026-08-20 07:00:25,000 CLIENT yawt.cli task 'cross_corr' "
            "finished after 0m17.00s",
        ])
        assert parse_bin_walls(log) == {
            "auto_unk": [4.0, 3.0], "cross_corr": [10.0, 5.0],
        }

    def test_no_bin_lines_yields_empty(self, tmp_path):
        from tomo_pipeline_proof import parse_bin_walls

        log = _write_log(tmp_path, [
            "2026-08-20 07:00:00,000 CLIENT yawt.cli running task 'hist'",
            "2026-08-20 07:00:02,000 CLIENT yawt.cli task 'hist' "
            "finished after 0m02.00s",
        ])
        assert parse_bin_walls(log) == {}
