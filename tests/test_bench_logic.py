"""Host-side logic of the benchmark harness (no device required):
stall-aware warm timing and the roofline composition."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


@pytest.fixture
def fake_clock(monkeypatch):
    """Replace bench's perf_counter with a clock advanced by the timed
    function itself, so 'run durations' are scripted exactly."""
    state = {"now": 0.0}
    monkeypatch.setattr(bench.time, "perf_counter", lambda: state["now"])
    return state


def _scripted(durations, clock):
    it = iter(durations)

    def fn():
        clock["now"] += next(it)
        return "result"

    return fn


class TestTimedStallAware:
    def test_no_stalls(self, fake_clock):
        fn = _scripted([1.0, 1.1, 0.9, 1.05, 1.0], fake_clock)
        med, times, stalled, reruns, res, _ = bench.timed_stall_aware(fn, runs=5)
        assert times == pytest.approx([1.0, 1.1, 0.9, 1.05, 1.0])
        assert stalled == 0 and reruns == 0
        assert med == 1.0
        assert res == "result"

    def test_single_stall_single_rerun(self, fake_clock):
        """One tunnel-stalled run triggers exactly ONE replacement (the
        flagged time stays in the list, which must not re-trigger the
        budget) and is excluded from the trimmed median."""
        fn = _scripted([1.0, 1.0, 5.0, 1.1, 0.95, 1.02], fake_clock)
        med, times, stalled, reruns, res, _ = bench.timed_stall_aware(fn, runs=5)
        assert reruns == 1
        assert stalled == 1
        assert len(times) == 6
        assert 5.0 not in sorted(times)[:5]  # trimmed set excludes it
        assert med == pytest.approx(1.0)

    def test_rerun_budget_bounded(self, fake_clock):
        """A pathologically stalling link cannot loop forever: reruns are
        capped and every stalled time is still reported."""
        fn = _scripted([1.0, 1.0, 9.0, 9.0, 9.0, 9.0, 9.0, 9.0], fake_clock)
        med, times, stalled, reruns, res, _ = bench.timed_stall_aware(fn, runs=5)
        assert reruns == 3  # max_reruns
        assert stalled == 6
        assert med == pytest.approx(1.0)

    def test_stall_threshold_uses_second_fastest(self, fake_clock):
        """The floor is the second-fastest run, so one anomalously FAST
        run cannot flag every normal run as stalled."""
        fn = _scripted([0.1, 1.0, 1.05, 1.1, 1.2], fake_clock)
        med, times, stalled, reruns, res, _ = bench.timed_stall_aware(fn, runs=5)
        assert stalled == 0 and reruns == 0

    def test_snapshot_metrics_exclude_stalled_runs(self, fake_clock):
        """Per-run counter deltas from stalled runs are dropped, so one
        tunnel stall cannot inflate the phase attribution the explained-
        wall record divides by the trimmed median."""
        durations = [1.0, 1.0, 5.0, 1.1, 0.95, 1.02]
        it = iter(durations)
        totals = {"drain_wait": 0.0}

        def fn():
            dt = next(it)
            fake_clock["now"] += dt
            totals["drain_wait"] += dt  # phase grows with the stall
            return "result"

        med, times, stalled, reruns, res, kept = bench.timed_stall_aware(
            fn, runs=5, snapshot=lambda: totals
        )
        assert stalled == 1 and reruns == 1
        # the 5.0 s stalled run's delta is excluded from the kept sum
        assert kept["drain_wait"] == pytest.approx(
            sum(durations) - 5.0
        )


class TestRoofline:
    class _Edges:
        direct = None
        num_edges = 2

    def test_terms_compose(self):
        work = [
            {"slot_transitions": 1000, "fetch_bytes": 32_000_000},
            {"slot_transitions": 500, "fetch_bytes": 16_000_000},
        ]
        link = {"fetch_mb_s": 32.0}
        out = bench.roofline(
            self._Edges(), 1e9, 10.0, work_stats=work, link=link
        )
        pair_s = 1e9 * bench.ops_per_candidate_pair(self._Edges()) / bench.VPU_RATE
        assert out["slot_switch_s"] == pytest.approx(
            1500 * bench.T_SLOT_SWITCH, abs=1e-4
        )
        assert out["fetch_s"] == pytest.approx(48e6 / 32e6, abs=1e-3)
        assert out["bound_s"] == pytest.approx(
            pair_s + out["slot_switch_s"] + out["fetch_s"], abs=2e-4
        )
        assert out["fraction"] == pytest.approx(out["bound_s"] / 10.0, abs=1e-3)
