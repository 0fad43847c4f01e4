"""Pallas sketch-kernel equality tests (interpreter mode on CPU).

The kernel's Mosaic-on-TPU quirks (16-bit lane narrowing of small-range
operands, arithmetic uint32 shifts, signed compares) cannot all manifest
under the interpreter, so bench.py additionally asserts pallas-vs-jnp
equality on the real chip before timing (the round-1 keep-mask bug was
TPU-only). These tests pin the kernel's *structure* against the jnp path
and the streaming wiring end-to-end.
"""

import numpy as np
import pytest

from public_kssd_tpu import shufspace
from public_kssd_tpu.config import SketchParams
from public_kssd_tpu.ops import pallas_sketch, sketch as sketch_ops
from public_kssd_tpu.seqio import BREAK


def _mk(k, s, l, n, seed, n_breaks=40):
    p = SketchParams(id=77, half_ctx_len=k, half_subctx_len=s, drlevel=l)
    comp = shufspace.ComputedShuf(p.id, p.half_subctx_len)
    rng = np.random.default_rng(seed)
    sym = rng.integers(0, 4, size=n).astype(np.uint8)
    sym[rng.integers(0, n, size=n_breaks)] = BREAK
    return p, comp, sym


@pytest.mark.parametrize("accum", ["log", "unroll"])
@pytest.mark.parametrize("k,s,l", [(10, 6, 3), (8, 5, 2), (7, 5, 2), (6, 5, 1)])
def test_pallas_dense_matches_jnp(k, s, l, accum):
    p, comp, sym = _mk(k, s, l, 8192, seed=k)
    assert pallas_sketch.supported(p)
    dense = np.asarray(
        pallas_sketch.sketch_windows_pallas(
            sym, p, comp.seed, interpret=True, accum=accum
        )
    )
    dr, keep = sketch_ops.sketch_windows(sym, None, p, comp)
    dr, keep = np.asarray(dr), np.asarray(keep)
    m = dr.shape[0]
    keep_p = dense != pallas_sketch.SENTINEL32
    np.testing.assert_array_equal(keep_p[:m], keep)
    assert keep_p[m:].sum() == 0  # tail windows read BREAK halo
    np.testing.assert_array_equal(dense[:m][keep], dr[keep].astype(np.uint32))


def test_pallas_stream_wiring(monkeypatch):
    """KSSD_TPU_PALLAS=interpret routes sketch_codes_stream through the
    pallas dense kernel; output must equal the jnp route exactly."""
    p, comp, sym = _mk(10, 6, 3, 150_000, seed=5, n_breaks=200)
    monkeypatch.setenv("KSSD_TPU_PALLAS", "off")
    codes_jnp, pos_jnp = sketch_ops.sketch_codes_stream(sym, comp, p)
    monkeypatch.setenv("KSSD_TPU_PALLAS", "interpret")
    codes_pal, pos_pal = sketch_ops.sketch_codes_stream(sym, comp, p)
    np.testing.assert_array_equal(codes_pal, codes_jnp)
    np.testing.assert_array_equal(pos_pal, pos_jnp)


def test_rows_compaction_matches_fullscan():
    """Per-row top_k compaction == dense mask, including chunked blocks."""
    p, comp, sym = _mk(8, 5, 2, 300_000, seed=11, n_breaks=500)
    dr, keep = sketch_ops.sketch_windows(sym, None, p, comp)
    dr, keep = np.asarray(dr), np.asarray(keep)
    want_codes = dr[keep]
    want_pos = np.flatnonzero(keep)
    codes, pos = sketch_ops.sketch_codes_stream(sym, comp, p, block=65536)
    np.testing.assert_array_equal(codes, want_codes)
    np.testing.assert_array_equal(pos, want_pos)


def test_rows_compaction_overflow_retry():
    """A survivor burst denser than the initial row capacity triggers the
    grow-and-retry path and still returns every survivor in order."""
    p = SketchParams(id=77, half_ctx_len=10, half_subctx_len=6, drlevel=3)
    comp = shufspace.ComputedShuf(p.id, p.half_subctx_len)
    rng = np.random.default_rng(3)
    sym = rng.integers(0, 4, size=65536).astype(np.uint8)
    # a long homopolymer repeat: every window identical -> if its inner
    # substring is kept, a whole row of survivors (way beyond _row_cap)
    probe = rng.integers(0, 4, size=p.TL).astype(np.uint8)
    probed = sketch_ops.sketch_codes_host(probe, comp, p)
    tries = 0
    while probed.size == 0:  # find a kept k-mer to tile
        tries += 1
        probe = rng.integers(0, 4, size=p.TL).astype(np.uint8)
        probed = sketch_ops.sketch_codes_host(probe, comp, p)
        assert tries < 100_000
    sym[10_000:30_000] = np.tile(probe, 20_000 // p.TL)[:20_000]
    dr, keep = sketch_ops.sketch_windows(sym, None, p, comp)
    dr, keep = np.asarray(dr), np.asarray(keep)
    assert keep.sum() > sketch_ops._row_cap(p)  # the burst overflows C0
    codes, pos = sketch_ops.sketch_codes_stream(sym, comp, p)
    np.testing.assert_array_equal(codes, dr[keep])
    np.testing.assert_array_equal(pos, np.flatnonzero(keep))


def test_self_check_passes_in_interpret(monkeypatch):
    """The production self-check body agrees with the jnp oracle when the
    kernel is correct (interpret stands in for the real device here; the
    real-device run happens in bench.py and on first CLI dispatch)."""
    p, comp, _ = _mk(10, 6, 3, 128, seed=1)
    real = pallas_sketch.sketch_windows_pallas
    monkeypatch.setattr(
        pallas_sketch, "sketch_windows_pallas",
        lambda sym, pp, seed: real(sym, pp, seed, interpret=True),
    )
    assert pallas_sketch._self_check(p, comp)


def test_self_check_gates_dispatch(monkeypatch):
    """A failing self-check makes _pallas_mode fall back to jnp (and the
    verdict is cached — the check runs once per geometry)."""
    import jax

    p, comp, _ = _mk(10, 6, 3, 128, seed=2)
    calls = []

    def fake_check(pp, cc):
        calls.append(1)
        return False

    monkeypatch.setattr(pallas_sketch, "_self_check", fake_check)
    monkeypatch.setattr(pallas_sketch, "_validated", {})
    monkeypatch.setattr(
        jax, "default_backend", lambda: "tpu", raising=True
    )
    monkeypatch.delenv("KSSD_TPU_PALLAS", raising=False)
    assert sketch_ops._pallas_mode(p, comp) == ""
    assert sketch_ops._pallas_mode(p, comp) == ""
    assert len(calls) == 1  # cached verdict, no re-dispatch

    monkeypatch.setattr(pallas_sketch, "_self_check", lambda pp, cc: True)
    monkeypatch.setattr(pallas_sketch, "_validated", {})
    assert sketch_ops._pallas_mode(p, comp) == "tpu"


@pytest.mark.parametrize("accum", ["log", "unroll"])
@pytest.mark.parametrize(
    "k,s,l", [(10, 6, 2), (12, 6, 3), (15, 7, 3), (15, 7, 1)])
def test_pallas_wide_dense_matches_jnp(k, s, l, accum):
    """The wide (32..60-bit drtuple) dual-plane kernel must equal the
    jnp uint64 path exactly (covers left-outer shift S1 < 32, == 32 and
    > 32 carry layouts: drtuple_bits 32 / 36 / 48 / 56; k = 16 is
    excluded by supported_wide — W = 32 breaks the level invariant)."""
    p, comp, sym = _mk(k, s, l, 8192, seed=k + 50)
    assert pallas_sketch.supported_wide(p) and not pallas_sketch.supported(p)
    dense = np.asarray(
        pallas_sketch.sketch_windows_pallas_wide(
            sym, p, comp.seed, interpret=True, accum=accum
        )
    )
    dr, keep = sketch_ops.sketch_windows(sym, None, p, comp)
    dr, keep = np.asarray(dr), np.asarray(keep)
    m = dr.shape[0]
    sentinel = np.uint64(0xFFFFFFFFFFFFFFFF)
    keep_p = dense != sentinel
    np.testing.assert_array_equal(keep_p[:m], keep)
    assert keep_p[m:].sum() == 0
    np.testing.assert_array_equal(dense[:m][keep], dr[keep])
    assert keep.sum() > 0


def test_wide_stream_pallas_equals_jnp(monkeypatch):
    """KSSD_TPU_PALLAS=interpret routes the WIDE streaming path through
    the pallas kernel; codes and positions must match the jnp route."""
    p, comp, sym = _mk(12, 6, 3, 120_000, seed=9, n_breaks=120)
    monkeypatch.setenv("KSSD_TPU_PALLAS", "off")
    codes_jnp, pos_jnp = sketch_ops.sketch_codes_stream(sym, comp, p)
    monkeypatch.setenv("KSSD_TPU_PALLAS", "interpret")
    codes_pal, pos_pal = sketch_ops.sketch_codes_stream(sym, comp, p)
    np.testing.assert_array_equal(codes_pal, codes_jnp)
    np.testing.assert_array_equal(pos_pal, pos_jnp)
    assert codes_jnp.size > 0
