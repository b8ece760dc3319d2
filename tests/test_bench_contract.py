"""Driver-contract guards for bench.py's output: exactly ONE JSON line on
stdout with the required keys, in every degraded mode (dead accelerator with
and without a cached last-good run).  The happy path needs the real TPU and
is exercised by the driver at round end — these tests pin the failure
behavior that previously zeroed (or emptied) the scoring artifact.
"""

import io
import json
import sys

import pytest


@pytest.fixture()
def bench(monkeypatch):
    sys.path.insert(0, ".")
    import bench as bench_mod

    monkeypatch.setattr(bench_mod, "_tpu_preflight", lambda *a, **k: False)
    return bench_mod


def _run_main(bench_mod, capsys):
    bench_mod.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, f"bench must print exactly one stdout line, got {out}"
    # the driver's tail-capture window is small: BENCH_r03's full inline
    # matrix overflowed it (parsed=null) — the line must stay compact
    assert len(out[0].encode()) <= bench_mod.MAX_LINE_BYTES, len(out[0])
    return json.loads(out[0])


REQUIRED = ("metric", "value", "unit", "vs_baseline", "extra")


def test_dead_tunnel_with_cache_reports_last_good(bench, capsys, monkeypatch, tmp_path):
    cache = tmp_path / "bench_last_good.json"
    cache.write_text(json.dumps({
        "metric": "nafnet_w64_128px_fp32_saturated_inference_throughput",
        "value": 12.5, "unit": "Megapixels/sec/chip", "vs_baseline": 6.25,
        "extra": {"nafnet_bs16_fp32_xla_mpix_s": 12.5},
        "measured_at": "2026-08-17T00:00:00Z", "git_rev": "abc123",
    }))
    monkeypatch.setattr(bench, "_last_good_path", lambda: str(cache))
    d = _run_main(bench, capsys)
    assert all(k in d for k in REQUIRED)
    assert d["value"] == 12.5
    assert d["cached"] is True  # schema-level marker: NOT a fresh measurement
    assert "error" in d["extra"] and "CACHED" in d["extra"]["error"]
    # provenance moved into extra so the top level stays schema-clean
    assert d["extra"]["cached_measured_at"] == "2026-08-17T00:00:00Z"
    assert d["extra"]["cached_git_rev"] == "abc123"
    assert "measured_at" not in d and "git_rev" not in d
    # the full matrix is written next to the cache and the line points at it
    assert d["extra"]["full"] == "results/bench_full.json"
    full = json.loads((cache.parent / "bench_full.json").read_text())
    assert full["extra"]["nafnet_bs16_fp32_xla_mpix_s"] == 12.5


def test_compact_line_drops_overflow_but_keeps_schema(bench, capsys, monkeypatch, tmp_path):
    """A pathological extra (huge strings, many keys) must still yield one
    parseable line under the cap, with the full detail in bench_full.json."""
    monkeypatch.setattr(bench, "_last_good_path", lambda: str(tmp_path / "lg.json"))
    bench._emit({
        "metric": "m", "value": 1.0, "unit": "u", "vs_baseline": 1.0,
        "extra": {f"section_{i}_error": "x" * 500 for i in range(20)}
                 | {k: 1.0 for k in bench.COMPACT_KEYS},
    })
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1 and len(out[0].encode()) <= bench.MAX_LINE_BYTES
    d = json.loads(out[0])
    assert d["value"] == 1.0 and d["extra"]["errors"] == 20
    full = json.loads((tmp_path / "bench_full.json").read_text())
    assert len(full["extra"]) == 20 + len(bench.COMPACT_KEYS)


def test_dead_tunnel_without_cache_reports_zero(bench, capsys, monkeypatch, tmp_path):
    monkeypatch.setattr(bench, "_last_good_path", lambda: str(tmp_path / "absent.json"))
    d = _run_main(bench, capsys)
    assert all(k in d for k in REQUIRED)
    assert d["value"] == 0.0 and d["vs_baseline"] == 0.0
    assert "error" in d["extra"]


def test_dead_tunnel_with_corrupt_cache_still_prints_one_line(bench, capsys, monkeypatch, tmp_path):
    """A truncated cache (crash mid-write) must degrade to the 0.0 line, not
    crash main() with zero stdout lines."""
    cache = tmp_path / "bench_last_good.json"
    cache.write_text('{"metric": "nafnet_w64')  # truncated JSON
    monkeypatch.setattr(bench, "_last_good_path", lambda: str(cache))
    d = _run_main(bench, capsys)
    assert d["value"] == 0.0 and "error" in d["extra"]


def test_repo_cache_is_valid_and_schema_complete():
    """The committed seed cache must itself satisfy the one-line contract."""
    import bench as bench_mod

    with open(bench_mod._last_good_path()) as f:
        d = json.load(f)
    assert all(k in d for k in REQUIRED)
    assert d["value"] > 0 and d["unit"] == "Megapixels/sec/chip"
    assert "measured_at" in d


def test_retry_transient_retries_compile_500_once(bench, monkeypatch):
    """The axon compile-helper intermittently 500s on the biggest train-step
    programs (BENCH_r03's swinir_train_error); a section wrapped in
    _retry_transient must retry exactly once on that signature and surface
    every other exception unchanged."""
    monkeypatch.setattr("time.sleep", lambda s: None)
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError(
                "INTERNAL: http://127.0.0.1:8113/remote_compile: HTTP 500: "
                "tpu_compile_helper subprocess exit code 1")
        return {"ok": calls["n"]}

    assert bench._retry_transient(flaky, pause_s=0) == {"ok": 2}

    def always_500():
        raise RuntimeError("remote_compile: HTTP 500")

    with pytest.raises(RuntimeError):  # second failure propagates
        bench._retry_transient(always_500, pause_s=0)

    def real_bug():
        calls["n"] += 1
        raise ValueError("shape mismatch")

    calls["n"] = 0
    with pytest.raises(ValueError):
        bench._retry_transient(real_bug, pause_s=0)
    assert calls["n"] == 1  # non-transient errors are NOT retried
