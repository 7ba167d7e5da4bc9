"""Driver-contract tests for bench.py's default matrix mode.

The round-2 regression (VERDICT r2 #1): matrix mode printed the headline
JSON only after ALL five subprocess benches finished, so the driver's
timeout produced rc=124 with no output. These tests pin the new contract —
headline printed first, incremental BENCH_MATRIX.json writes, budget
respected, stale entries retained — by stubbing the subprocess runner
(no TPU, no subprocesses).
"""

import json
import time

import pytest

import bench


@pytest.fixture()
def matrix_file(tmp_path, monkeypatch):
    path = tmp_path / "BENCH_MATRIX.json"
    monkeypatch.setattr(bench, "_matrix_path", lambda: str(path))
    return path


def _fake_runner(records, delays=None, calls=None):
    def run(name, env, timeout_s):
        if calls is not None:
            calls.append((name, timeout_s))
        if delays and name in delays:
            time.sleep(delays[name])
        rec = records.get(name)
        if rec is None:
            return {"bench": name, "metric": f"{name}_failed", "error": "x"}
        return dict(rec, bench=name)

    return run


GOOD = {
    "sd": {"metric": "sd15", "value": 1.6, "unit": "img/s/chip",
           "vs_baseline": 0.8},
    "sd_dpm": {"metric": "sd15_dpm", "value": 3.0, "unit": "img/s/chip",
               "vs_baseline": 1.5},
    "opt_w8": {"metric": "opt_w8", "value": 2200.0, "unit": "tok/s",
               "vs_baseline": 6.0},
    "opt": {"metric": "opt", "value": 1500.0, "unit": "tok/s",
            "vs_baseline": 4.0},
    "opt67_w8": {"metric": "opt67_w8", "value": 500.0, "unit": "tok/s",
                 "vs_baseline": 5.0},
    "opt67_w8_long": {"metric": "opt67_long", "value": 400.0,
                      "unit": "tok/s", "vs_baseline": 20.0},
    "train": {"metric": "train", "value": 100.0, "unit": "ex/s",
              "vs_baseline": 8.0},
}


def test_headline_is_first_output_and_complete_matrix(
        matrix_file, monkeypatch, capsys):
    monkeypatch.setattr(bench, "_run_one_subprocess", _fake_runner(GOOD))
    monkeypatch.setenv("GILL_BENCH_BUDGET",
                       str(sum(est for _, _, est in bench._MATRIX_RUNS) + 60))
    bench.bench_matrix()
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    head = json.loads(lines[0])
    assert head == GOOD["sd"]  # no bench/stamp keys leak into the contract
    rows = json.loads(matrix_file.read_text())
    assert [r["bench"] for r in rows] == [n for n, _, _ in bench._MATRIX_RUNS]
    assert all("stamp" in r for r in rows)


def test_budget_skips_tail_but_headline_still_prints(
        matrix_file, monkeypatch, capsys):
    calls = []
    monkeypatch.setattr(
        bench, "_run_one_subprocess",
        _fake_runner(GOOD, delays={"sd": 0.3}, calls=calls))
    # Budget burns out during the headline: every later entry's estimate
    # (>=120s) exceeds the remaining fraction of a second.
    monkeypatch.setenv("GILL_BENCH_BUDGET", "0.2")
    bench.bench_matrix()
    head = json.loads(capsys.readouterr().out.splitlines()[0])
    assert head["value"] == 1.6
    assert [c[0] for c in calls] == ["sd"]
    rows = json.loads(matrix_file.read_text())
    assert [r["bench"] for r in rows] == ["sd"]


def test_stale_entries_survive_a_partial_refresh(
        matrix_file, monkeypatch, capsys):
    # Seed a full previous matrix, then re-run with a budget that only
    # allows the headline: old values must remain, KEEPING their original
    # stamp (the stamp is the entry's age and drives the refresh rotation).
    monkeypatch.setattr(bench, "_run_one_subprocess", _fake_runner(GOOD))
    monkeypatch.setattr(bench, "_stamp_now", lambda: "2026-01-01T00:00:00Z")
    monkeypatch.setenv("GILL_BENCH_BUDGET",
                       str(sum(est for _, _, est in bench._MATRIX_RUNS) + 60))
    bench.bench_matrix()
    capsys.readouterr()

    newer = dict(GOOD, sd={"metric": "sd15", "value": 1.9,
                           "unit": "img/s/chip", "vs_baseline": 0.95})
    monkeypatch.setattr(bench, "_run_one_subprocess", _fake_runner(newer))
    monkeypatch.setattr(bench, "_stamp_now", lambda: "2026-01-02T00:00:00Z")
    monkeypatch.setenv("GILL_BENCH_BUDGET", "0.0001")
    bench.bench_matrix()
    assert json.loads(capsys.readouterr().out.splitlines()[0])["value"] == 1.9
    rows = {r["bench"]: r for r in json.loads(matrix_file.read_text())}
    assert rows["sd"]["value"] == 1.9
    assert rows["opt_w8"]["value"] == 2200.0  # stale but retained
    assert rows["sd"]["stamp"] == "2026-01-02T00:00:00Z"
    assert rows["opt_w8"]["stamp"] == "2026-01-01T00:00:00Z"


def test_failed_refresh_preserves_last_known_good(
        matrix_file, monkeypatch, capsys):
    """VERDICT r4 #1a: the round-4 driver run timed sd_dpm out and the
    failure record CLOBBERED the recorded 3.141 img/s. A failed refresh
    must keep the old value and only annotate the failure."""
    monkeypatch.setattr(bench, "_run_one_subprocess", _fake_runner(GOOD))
    monkeypatch.setattr(bench, "_stamp_now", lambda: "2026-01-01T00:00:00Z")
    monkeypatch.setenv("GILL_BENCH_BUDGET",
                       str(sum(est for _, _, est in bench._MATRIX_RUNS) + 60))
    bench.bench_matrix()
    capsys.readouterr()

    broken = dict(GOOD)
    del broken["sd_dpm"]  # runner now fails sd_dpm (e.g. timeout)
    monkeypatch.setattr(bench, "_run_one_subprocess", _fake_runner(broken))
    monkeypatch.setattr(bench, "_stamp_now", lambda: "2026-01-02T00:00:00Z")
    monkeypatch.setenv("GILL_BENCH_BUDGET", "900")
    bench.bench_matrix()
    capsys.readouterr()
    rows = {r["bench"]: r for r in json.loads(matrix_file.read_text())}
    assert rows["sd_dpm"]["value"] == 3.0          # survived the failure
    assert rows["sd_dpm"]["stamp"] == "2026-01-01T00:00:00Z"
    assert rows["sd_dpm"]["last_error"] == "x"
    assert rows["sd_dpm"]["last_error_stamp"] == "2026-01-02T00:00:00Z"
    # ... and a later successful refresh clears the annotation
    monkeypatch.setattr(bench, "_run_one_subprocess", _fake_runner(GOOD))
    monkeypatch.setattr(bench, "_stamp_now", lambda: "2026-01-03T00:00:00Z")
    bench.bench_matrix()
    capsys.readouterr()
    rows = {r["bench"]: r for r in json.loads(matrix_file.read_text())}
    assert rows["sd_dpm"]["stamp"] == "2026-01-03T00:00:00Z"
    assert "last_error" not in rows["sd_dpm"]


def test_sd_dpm_is_pinned_second(matrix_file, monkeypatch, capsys):
    """VERDICT r4 #1b: sd_dpm (the north-star carrier) runs immediately
    after the headline, every invocation, regardless of its stamp age."""
    calls = []
    monkeypatch.setattr(bench, "_run_one_subprocess",
                        _fake_runner(GOOD, calls=calls))
    monkeypatch.setenv("GILL_BENCH_BUDGET", "10000")
    bench.bench_matrix()
    capsys.readouterr()
    calls.clear()
    bench.bench_matrix()   # second run: everything has a fresh stamp
    capsys.readouterr()
    assert [c[0] for c in calls[:2]] == ["sd", "sd_dpm"]


SYNTH_RUNS = [("sd", {}, 100), ("sd_dpm", {}, 100)] + [
    (f"e{i}", {}, 100) for i in range(7)]


def test_rotation_refreshes_every_entry_within_three_runs(
        matrix_file, monkeypatch, capsys):
    """VERDICT r4 #2: with a budget covering only part of the matrix, the
    non-pinned refresh order is oldest-stamp-first, so consecutive runs
    walk the whole matrix (here: 9 entries, 5 per run => full coverage in
    3 runs) instead of re-running the same priority prefix forever."""
    monkeypatch.setattr(bench, "_MATRIX_RUNS", SYNTH_RUNS)
    records = {n: {"metric": n, "value": 1.0, "unit": "u",
                   "vs_baseline": 1.0} for n, _, _ in SYNTH_RUNS}
    clock = [0.0]
    stamps = iter(f"2026-01-0{i}T00:00:00Z" for i in range(1, 8))
    refreshed = []

    def runner(name, env, timeout_s):
        clock[0] += 100.0
        refreshed.append(name)
        return dict(records[name], bench=name)

    monkeypatch.setattr(bench, "_run_one_subprocess", runner)
    monkeypatch.setattr(bench, "_now", lambda: clock[0])
    monkeypatch.setenv("GILL_BENCH_BUDGET", "500")
    per_run = []
    for _ in range(3):
        monkeypatch.setattr(bench, "_stamp_now",
                            lambda s=next(stamps): s)
        clock[0] = 0.0
        refreshed.clear()
        bench.bench_matrix()
        capsys.readouterr()
        per_run.append(list(refreshed))
    # every run: pins first, then 3 rotated entries; full coverage in 3
    assert all(run[:2] == ["sd", "sd_dpm"] and len(run) == 5
               for run in per_run)
    covered = set().union(*map(set, per_run))
    assert covered == {n for n, _, _ in SYNTH_RUNS}
    # the rotation is oldest-first: run 2 picks entries run 1 skipped
    assert not (set(per_run[0][2:]) & set(per_run[1][2:]))


def _tiny_cfg():
    from gill_tpu.config import OPTConfig

    return OPTConfig(num_layers=2, hidden_size=64, ffn_dim=128, num_heads=4,
                     vocab_size=100, max_positions=64,
                     word_embed_proj_dim=64)


def test_roofline_traffic_model():
    """VERDICT r4 #5: the weight+KV bytes-per-step model behind the
    roofline_frac fields, checked against hand arithmetic."""
    cfg = _tiny_cfg()
    w, kvr = bench._opt_stream_bytes(cfg, w8=False)
    assert w == 2 * (4 * 64 * 64 + 2 * 64 * 128) * 2 + 100 * 64 * 2
    assert kvr == 2 * 2 * 64 * 2
    w8b, kvr8 = bench._opt_stream_bytes(cfg, w8=True, kv8=True)
    assert w8b == 2 * (4 * 64 * 64 + 2 * 64 * 128) + 100 * 64 * 2
    assert kvr8 == kvr // 2
    # a decode running exactly at the bandwidth bound reads frac == 1
    bytes_step = w + 4 * 10 * kvr
    bound_steps_s = bench._HBM_BYTES_PER_S / bytes_step
    assert bench._decode_roofline(
        cfg, 4, 10, 4 * bound_steps_s, w8=False) == pytest.approx(1.0)


def test_serve_roofline_uses_stat_deltas():
    """_serve_roofline must count only the timed region's traffic (the
    engine's counters also accumulate warmup work)."""
    cfg = _tiny_cfg()

    class Eng:
        chunk, slots = 4, 2
        stats = {"decode_steps": 12, "kv_rows_read": 96, "prefills": 3}

    before = {"decode_steps": 4, "kv_rows_read": 32, "prefills": 1}
    w, kvr = bench._opt_stream_bytes(cfg, w8=False)
    traffic = 8 * w + 64 * 4 * 2 * kvr + 2 * w
    frac = bench._serve_roofline(Eng(), cfg, before, 2.0, w8=False)
    assert frac == pytest.approx(traffic / (2.0 * bench._HBM_BYTES_PER_S))


def test_plan_order_prefers_failed_and_unstamped():
    by_name = {
        "sd": {"value": 1, "stamp": "2026-01-05T00:00:00Z"},
        "sd_dpm": {"metric": "sd_dpm_failed", "error": "timeout",
                   "stamp": "2026-01-06T00:00:00Z"},
        "opt_w8": {"value": 1, "stamp": "2026-01-04T00:00:00Z"},
        "opt": {"value": 1, "stamp": "2026-01-02T00:00:00Z"},
        "train": {"value": 1},   # known value, never stamped => oldest
    }
    order = bench._plan_order(by_name)
    assert order[:2] == ["sd", "sd_dpm"]
    rest = [n for n in order[2:] if n in ("train", "opt", "opt_w8")]
    assert rest == ["train", "opt", "opt_w8"]


def test_headline_failure_falls_back_to_cheap_bench(
        matrix_file, monkeypatch, capsys):
    records = dict(GOOD)
    del records["sd"]  # headline fails
    records["opt13"] = {"metric": "opt13", "value": 3000.0, "unit": "tok/s",
                        "vs_baseline": 9.0}
    monkeypatch.setattr(bench, "_run_one_subprocess", _fake_runner(records))
    monkeypatch.setenv("GILL_BENCH_BUDGET", "900")
    bench.bench_matrix()
    head = json.loads(capsys.readouterr().out.splitlines()[0])
    assert head["value"] == 3000.0
    rows = {r["bench"]: r for r in json.loads(matrix_file.read_text())}
    assert rows["sd"]["metric"] == "sd_failed"
    assert rows["opt13"]["value"] == 3000.0
