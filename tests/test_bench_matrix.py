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
    # allows the headline: old values must remain, without a fresh stamp.
    monkeypatch.setattr(bench, "_run_one_subprocess", _fake_runner(GOOD))
    monkeypatch.setenv("GILL_BENCH_BUDGET",
                       str(sum(est for _, _, est in bench._MATRIX_RUNS) + 60))
    bench.bench_matrix()
    capsys.readouterr()

    newer = dict(GOOD, sd={"metric": "sd15", "value": 1.9,
                           "unit": "img/s/chip", "vs_baseline": 0.95})
    monkeypatch.setattr(bench, "_run_one_subprocess", _fake_runner(newer))
    monkeypatch.setenv("GILL_BENCH_BUDGET", "0.0001")
    bench.bench_matrix()
    assert json.loads(capsys.readouterr().out.splitlines()[0])["value"] == 1.9
    rows = {r["bench"]: r for r in json.loads(matrix_file.read_text())}
    assert rows["sd"]["value"] == 1.9
    assert rows["opt_w8"]["value"] == 2200.0  # stale but retained
    assert "stamp" in rows["sd"] and "stamp" not in rows["opt_w8"]


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
