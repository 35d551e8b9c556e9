"""Spike-guard baseline unit tests (r10 verdict, "What's wrong #1").

The guard's baseline must be the per-query MIN across ALL committed
BENCH_r*.json artifacts — in particular, a noisy value written by the
*current* round's own file must never raise the baseline above a
quieter value recorded in any earlier round (the self-legitimizing
spike hole the r10 judge found in the highest-numbered-file rule).
"""

import importlib.util
import json
import os

_BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")


def _load_bench_module():
    spec = importlib.util.spec_from_file_location("bench_under_test", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write(dirpath, name, queries):
    with open(os.path.join(dirpath, name), "w", encoding="utf-8") as f:
        json.dump({"metric": "headline_queries_total_sec", "queries": queries}, f)


def test_baseline_is_min_across_all_rounds(tmp_path):
    bench = _load_bench_module()
    _write(tmp_path, "BENCH_r08.json", {"q1": 1.0, "dedup_exact": 0.30})
    _write(tmp_path, "BENCH_r09.json", {"q1": 1.2, "dedup_exact": 0.32})
    baseline = bench._previous_round_timings(str(tmp_path))
    assert baseline == {"q1": 1.0, "dedup_exact": 0.30}


def test_same_round_spike_cannot_self_legitimize(tmp_path):
    """A spiked value in the newest (same-round) artifact must not become
    the baseline when an earlier round recorded the quiet value."""
    bench = _load_bench_module()
    _write(tmp_path, "BENCH_r09.json", {"dedup_exact": 0.319})
    # Synthetic same-round file carrying the r10-style uncaught spike.
    _write(tmp_path, "BENCH_r10.json", {"dedup_exact": 1.467})
    baseline = bench._previous_round_timings(str(tmp_path))
    assert baseline["dedup_exact"] == 0.319
    # The guard fires when a fresh 1.467 s read exceeds 3x that baseline.
    assert 1.467 > 3.0 * baseline["dedup_exact"]


def test_baseline_tolerates_garbage_files(tmp_path):
    bench = _load_bench_module()
    _write(tmp_path, "BENCH_r01.json", {"q1": 2.0, "bad": "xx"})
    with open(os.path.join(tmp_path, "BENCH_r02.json"), "w", encoding="utf-8") as f:
        f.write("{not json")
    # Non-matching names are ignored entirely.
    _write(tmp_path, "BENCH_sf1_r08.json", {"q1": 0.001})
    baseline = bench._previous_round_timings(str(tmp_path))
    assert baseline == {"q1": 2.0}


def test_empty_dir_gives_empty_baseline(tmp_path):
    bench = _load_bench_module()
    assert bench._previous_round_timings(str(tmp_path)) == {}


def test_quiet_host_gate_waits_then_proceeds(monkeypatch):
    # r11 verdict "What's wrong #2": uniform ~1.3x load inflation is
    # invisible to the 3x per-query spike guard; the pre-bench gate
    # sleep-polls (bounded) until the 1-min loadavg drops
    bench = _load_bench_module()
    readings = iter([5.0, 4.0, 1.2])
    slept = []
    monkeypatch.setattr(
        bench.os, "getloadavg", lambda: (next(readings), 0.0, 0.0)
    )
    monkeypatch.setattr(bench.time, "sleep", lambda s: slept.append(s))
    got = bench._wait_for_quiet_host(threshold=2.5, max_wait_sec=300,
                                     poll_sec=15)
    assert got == 1.2 and len(slept) == 2


def test_quiet_host_gate_bounded(monkeypatch):
    # a permanently-loaded host must not stall the bench forever
    bench = _load_bench_module()
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (9.9, 9.9, 9.9))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    got = bench._wait_for_quiet_host(threshold=2.5, max_wait_sec=60,
                                     poll_sec=15)
    assert got == 9.9
