"""Pins for bench.py's driver-budget discipline (round 5).

Round 4's driver bench was killed at ~30 min mid-compile having printed
NOTHING (BENCH_r04.json rc=124, parsed null). The contract pinned here:

* run_extras enforces the internal wall-clock budget — an extra whose
  estimated cost exceeds the remaining budget is recorded as
  "SKIPPED budget (...)" WITHOUT being started, later cheaper extras still
  run, failures record "FAILED ..." without hiding the headline, and the
  checkpoint callback fires after every extra.
* main() prints the headline JSON line (flushed) BEFORE any extra runs,
  then the enriched line at the end — a caller-side timeout always leaves
  a parseable record on stdout.

The serving-canary estimator companion pin lives in
tests/test_serving.py::test_bench_canary_estimator.
"""

import json

import pytest


@pytest.fixture()
def bench(tmp_path, monkeypatch):
    import bench as bench_mod

    # never touch the repo's real bench_last.json from tests
    monkeypatch.setattr(
        bench_mod, "_BENCH_LAST", str(tmp_path / "bench_last.json")
    )
    return bench_mod


def _spec(clock, calls, entries):
    """[(key, est_s, fn)] where fn advances the fake clock by actual_s."""
    spec = []
    for key, est_s, actual_s, value in entries:
        def fn(key=key, actual_s=actual_s, value=value):
            calls.append(key)
            clock["t"] += actual_s
            if isinstance(value, Exception):
                raise value
            return value, [value - 1.0, value + 1.0]

        spec.append((key, est_s, fn))
    return spec


def test_run_extras_budget_skips_loudly(bench):
    clock = {"t": 100.0}
    calls = []
    checkpoints = []
    result = {"metric": "m", "value": 1.0}
    spec = _spec(
        clock,
        calls,
        [
            ("a", 50, 40, 10.0),  # fits: remaining 100 >= 50
            ("b", 500, 0, 20.0),  # remaining 60 < 500 -> skipped, never runs
            ("c", 30, 20, 30.0),  # still fits after the skip
        ],
    )
    bench.run_extras(
        result,
        spec,
        budget_s=100.0,
        t_start=100.0,
        checkpoint=lambda r: checkpoints.append(json.loads(json.dumps(r))),
        now=lambda: clock["t"],
    )
    assert calls == ["a", "c"]  # the skipped extra was never started
    ex = result["extras"]
    assert ex["a"] == 10.0 and ex["a_minmax"] == [9.0, 11.0]
    assert isinstance(ex["b"], str) and ex["b"].startswith("SKIPPED budget")
    assert "b_minmax" not in ex
    assert ex["c"] == 30.0
    # measured wall times recorded for estimate tuning (skips have none)
    assert ex["timings_s"] == {"a": 40.0, "c": 20.0}
    # checkpoint fired after EVERY extra incl. the skip; the skip
    # checkpoint already carries a's finished number
    assert len(checkpoints) == 3
    assert checkpoints[0]["extras"]["a"] == 10.0
    assert checkpoints[1]["extras"]["b"].startswith("SKIPPED budget")


def test_run_extras_failure_does_not_hide_later_extras(bench):
    clock = {"t": 0.0}
    calls = []
    result = {"metric": "m", "value": 1.0}
    spec = _spec(
        clock,
        calls,
        [
            ("a", 10, 5, RuntimeError("boom")),
            ("b", 10, 5, 2.0),
        ],
    )
    bench.run_extras(
        result,
        spec,
        budget_s=1e9,
        t_start=0.0,
        checkpoint=lambda r: None,
        now=lambda: clock["t"],
    )
    assert calls == ["a", "b"]
    assert result["extras"]["a"].startswith("FAILED RuntimeError: boom")
    assert result["extras"]["b"] == 2.0


def test_extras_spec_costs_and_default_set(bench, monkeypatch):
    monkeypatch.delenv("SPEECHCLIP_BENCH_LARGE_CASC", raising=False)
    keys = [k for k, _, _ in bench._extras_spec()]
    # large_casc is OFF by default (half of round 4's compile storm);
    # large_par and the serving canary stay driver-visible
    assert "train_step_ms_large_casc_b128" not in keys
    assert keys[-1] == "serving_utt_per_sec_b32"
    assert "train_step_ms_large_par_b128" in keys
    for key, est, _fn in bench._extras_spec():
        assert est == bench._EXTRA_EST_S[key] > 0
    monkeypatch.setenv("SPEECHCLIP_BENCH_LARGE_CASC", "1")
    keys = [k for k, _, _ in bench._extras_spec()]
    assert "train_step_ms_large_casc_b128" in keys


def test_main_prints_headline_before_extras(bench, monkeypatch, capsys):
    """The driver tails stdout: the headline line must be out (flushed)
    before the first extra starts, and the final line carries extras."""
    monkeypatch.setattr(bench, "headline", lambda: (1000.0, [0.9, 1.1]))

    def fake_spec():
        def fn():
            # the headline line must ALREADY be on stdout here
            out = capsys.readouterr().out
            lines = [l for l in out.splitlines() if l.startswith("{")]
            assert len(lines) == 1, out
            assert json.loads(lines[0])["value"] == 1000.0
            print(out, end="")  # put it back for the final assertions
            return 42.0, [41.0, 43.0]

        return [("probe_extra", 1, fn)]

    monkeypatch.setattr(bench, "_extras_spec", fake_spec)
    monkeypatch.delenv("SPEECHCLIP_BENCH_HEADLINE_ONLY", raising=False)
    monkeypatch.setenv("SPEECHCLIP_BENCH_BUDGET_S", "100000")
    import jax

    prng_before = jax.config.jax_default_prng_impl
    try:
        bench.main()  # switches the default PRNG to rbg (production config)
    finally:
        jax.config.update("jax_default_prng_impl", prng_before)
    lines = [
        l for l in capsys.readouterr().out.splitlines() if l.startswith("{")
    ]
    assert len(lines) == 2
    early, final = json.loads(lines[0]), json.loads(lines[1])
    assert early["value"] == final["value"] == 1000.0
    assert "extras" not in early
    assert final["extras"]["probe_extra"] == 42.0
    assert final["extras"]["headline_minmax_s"] == [0.9, 1.1]


def test_mfu_extras_match_statement_script(bench):
    """The driver-record MFU keys must agree with the published table's
    math (scripts/mfu_statement.py, pinned by tests/test_mfu.py): at the
    documented round-5 measurements the extras reproduce 68.8% / 58.1%."""
    result = {"value": 1394.2, "extras": {"train_step_ms_b256": 280.0}}
    out = bench.mfu_extras(result)
    assert out["encode_mfu_pct"] == pytest.approx(68.8, abs=0.1)
    assert out["train_b256_mfu_pct"] == pytest.approx(58.1, abs=0.1)
    # headline-only records (or SKIPPED/FAILED extras) degrade gracefully
    out = bench.mfu_extras({"value": 1394.2, "extras": {"train_step_ms_b256": "SKIPPED budget"}})
    assert "train_b256_mfu_pct" not in out
    assert bench.mfu_extras({"value": 0, "extras": {}}) == {}
