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


def test_retry_transient_retries_compile_500_once(bench):
    """The axon compile-helper intermittently 500s on the biggest train-step
    programs (BENCH_r03's swinir_train_error); a section wrapped in
    _retry_transient must retry exactly once on that signature, record the
    retry in notes, and surface every other exception unchanged."""
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError(
                "INTERNAL: http://127.0.0.1:8113/remote_compile: HTTP 500: "
                "tpu_compile_helper subprocess exit code 1")
        return {"ok": calls["n"]}

    notes = {}
    assert bench._retry_transient(flaky, pause_s=0, notes=notes) == {"ok": 2}
    assert notes == {"flaky_retried": True}  # recovering flake stays visible

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


def test_retry_transient_not_fooled_by_bare_internal(bench):
    """A deterministic XLA miscompile also says "INTERNAL" — it must publish
    immediately, not after a doubled multi-minute compile (ADVICE r4 #1).
    The transient classifier anchors on the infra signature only."""
    calls = {"n": 0}

    def miscompile():
        calls["n"] += 1
        raise RuntimeError("XlaRuntimeError: INTERNAL: Mosaic failed to compile")

    with pytest.raises(RuntimeError):
        bench._retry_transient(miscompile, pause_s=0)
    assert calls["n"] == 1


def test_retry_transient_suppressed_when_budget_exhausted(bench, monkeypatch):
    """A retry whose pause+rerun would bust the wall-clock budget is
    suppressed — the error publishes and the line still lands in time."""
    monkeypatch.setattr(bench, "BUDGET_S", 0.0)  # _remaining() < 0
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        raise RuntimeError("remote_compile: HTTP 500")

    with pytest.raises(RuntimeError):
        bench._retry_transient(flaky, pause_s=0)
    assert calls["n"] == 1  # no second attempt


def test_emit_prints_line_before_writing_full_matrix(bench, capsys, monkeypatch, tmp_path):
    """The round-4 run died between producing the result and the stdout line
    (rc=124) — the line is the graded artifact, so it must print BEFORE the
    full-matrix file write."""
    monkeypatch.setattr(bench, "_last_good_path", lambda: str(tmp_path / "lg.json"))

    def boom(result):
        raise OSError("disk full")

    monkeypatch.setattr(bench, "_write_full_matrix", boom)
    with pytest.raises(OSError):
        bench._emit({"metric": "m", "value": 1.0, "unit": "u", "vs_baseline": 1.0, "extra": {}})
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1 and json.loads(out[0])["value"] == 1.0


def test_error_runs_never_become_last_good(bench, tmp_path, monkeypatch):
    """VERDICT r4 #2: the round-4 guard checked only section_*/ab_error_*/
    dcpt_train_error, so a run with swinir_train_error became the
    "fully-clean" fallback.  The guard must use the same `"error" in k`
    predicate as the emit summary, and budget-skipped runs don't qualify
    either."""
    clean_of = lambda extra: not any(  # noqa: E731 — mirror of bench's guard
        k.startswith(("section_", "ab_error_")) or "error" in k or k.endswith("_skipped")
        for k in extra)
    assert not clean_of({"swinir_train_error": "HTTP 500"})  # the r4 escape
    assert not clean_of({"restormer_train_error": "x"})
    assert not clean_of({"section_nafnet_error": "x"})
    assert not clean_of({"ab_error_SwinIR_128px_bs4_bfloat16_auto": "x"})
    assert not clean_of({"section_swinir_train_skipped": "budget"})
    assert clean_of({"nafnet_bs16_fp32_xla_mpix_s": 18.8,
                     "bench_swinir_train_step_retried": True})  # recovered flake is clean

    # and the committed cache must satisfy the invariant the guard enforces
    with open(bench._last_good_path()) as f:
        d = json.load(f)
    assert not any("error" in k or k.endswith("_skipped") for k in d.get("extra", {})), \
        "committed bench_last_good.json violates the fully-clean invariant"


def test_train_sections_measure_shipped_defaults(bench, monkeypatch):
    """Round-5 root cause of every swinir_train "HTTP 500": an inference A/B
    leg left the global pallas mode "off", so the train sections traced the
    per-op twin graph — whose 4 scanned mixed SwinIR steps deterministically
    OOM compile-time HBM (30.75G vs 15.75G).  Every train-step bench fn must
    force mode "auto" (the shipped default: winner forward kernels + analytic
    Pallas backwards) before any tracing happens."""
    import numpy as np

    import dcpt_tpu.models as models
    import dcpt_tpu.ops as ops

    class _Stop(Exception):
        pass

    def boom(opt):
        raise _Stop()

    monkeypatch.setattr(models, "build_model", boom)
    import jax

    cpu = jax.devices("cpu")[0]
    for fn in (bench.bench_train_step, bench.bench_restormer_train_step,
               bench.bench_swinir_train_step):
        ops.enable_pallas("off")  # simulate the leaked kill-switch
        with pytest.raises(_Stop):
            fn(np.random.default_rng(0), cpu, None)
        assert ops.pallas_mode() == "auto", fn.__name__
    ops.enable_pallas("auto")


def test_budget_skip_markers_reach_the_compact_line(bench, capsys, monkeypatch, tmp_path):
    """A budget-degraded run must say so in the one printed line (skipped
    count) while staying under the cap."""
    monkeypatch.setattr(bench, "_last_good_path", lambda: str(tmp_path / "lg.json"))
    bench._emit({
        "metric": "m", "value": 1.0, "unit": "u", "vs_baseline": 1.0,
        "extra": {"section_swinir_train_skipped": "budget",
                  "section_restormer_train_skipped": "budget",
                  "nafnet_bs16_fp32_xla_mpix_s": 18.8},
    })
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1 and len(out[0].encode()) <= bench.MAX_LINE_BYTES
    d = json.loads(out[0])
    assert d["extra"]["skipped"] == 2


def test_budget_gate_skips_sections_and_still_emits(bench, capsys, monkeypatch, tmp_path):
    """VERDICT r4 #1 contract: with the budget already exhausted (simulating
    a run whose early sections ate the wall-clock), every remaining section
    must be skipped with a marker and the one line must still be emitted —
    quickly, not after more slow compiles.  Simulated by entering main() with
    a zero budget and a preflight that 'succeeds' instantly; the jax-touching
    section bodies never run (they would fail loudly under the stub)."""
    import sys as _sys
    import types

    monkeypatch.setattr(bench, "_tpu_preflight", lambda *a, **k: True)
    monkeypatch.setattr(bench, "BUDGET_S", 0.0)
    monkeypatch.setattr(bench, "_last_good_path", lambda: str(tmp_path / "lg.json"))

    # main() imports jax at the top — give it a minimal stub so a dead/slow
    # tunnel can't hang this test; no section body may execute under a zero
    # budget, so nothing beyond these attributes is touched.
    class _Dev:
        platform = "cpu"

    jax_stub = types.ModuleType("jax")
    jax_stub.devices = lambda *a, **k: [_Dev()]
    jax_stub.config = types.SimpleNamespace(update=lambda *a, **k: None)
    jax_stub.numpy = types.ModuleType("jax.numpy")
    monkeypatch.setitem(_sys.modules, "jax", jax_stub)
    monkeypatch.setitem(_sys.modules, "jax.numpy", jax_stub.numpy)
    # the arch/ops imports inside main() must also not pull real jax (incl.
    # the parent package, whose __init__ would otherwise import under the stub)
    pkg_stub = types.ModuleType("dcpt_tpu")
    dcpt_stub = types.ModuleType("dcpt_tpu.archs")
    dcpt_stub.build_network = lambda *a, **k: None
    ops_stub = types.ModuleType("dcpt_tpu.ops")
    ops_stub.enable_pallas = lambda *a, **k: None
    pkg_stub.archs, pkg_stub.ops = dcpt_stub, ops_stub
    monkeypatch.setitem(_sys.modules, "dcpt_tpu", pkg_stub)
    monkeypatch.setitem(_sys.modules, "dcpt_tpu.archs", dcpt_stub)
    monkeypatch.setitem(_sys.modules, "dcpt_tpu.ops", ops_stub)

    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1 and len(out[0].encode()) <= bench.MAX_LINE_BYTES
    d = json.loads(out[0])
    full = json.loads((tmp_path / "bench_full.json").read_text())
    skipped = [k for k in full["extra"] if k.endswith("_skipped")]
    assert len(skipped) == 8, skipped  # every section gated out
    assert d["extra"]["skipped"] == 8
    # a fully-skipped run reports the cached/zero fallback, never a fake number
    assert d.get("cached") or d["value"] == 0.0
