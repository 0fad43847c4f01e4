"""Pallas TPU sketch kernel: base-code stream -> per-window sketch codes.

This is the hand-scheduled VMEM variant of ``ops.sketch.sketch_windows_math``
(the reference hot loop is fasta2co, iseq2comem.c:205-270). The jnp path
is correct and fuses well, but it pays two TPU taxes the compiler cannot
remove:

  * every window value is a ``uint64`` — the VPU has 32-bit lanes, so each
    64-bit op lowers to 2-3 32-bit ops;
  * the per-window validity scan is a full-length ``lax.cummax``.

Here the 4k-bit window value lives in two explicit uint32 registers
(hi/lo), the Feistel shuffled-space filter (shufspace.py) is evaluated
in-register, and break-validity is an OR-accumulation folded into the
same W-step unrolled loop — one pass over VMEM-resident tiles, zero
gathers, zero 64-bit emulation. Output is one uint32 per window: the
4(k-l)-bit drtuple, or a sentinel where the window is filtered/invalid.

Layout: the 1-D symbol stream is viewed as rows of ``LANES`` columns;
each grid step processes a (BLOCK_ROWS, LANES) tile plus a (W-1)-column
halo taken from the row below (windows cross row boundaries), which the
BlockSpec pipeline streams HBM->VMEM automatically (double-buffered by
the Pallas grid pipeline).

Supported when the drtuple fits 32 bits (4(k-l) <= 31, i.e. k-l <= 7 —
every default configuration; COMPONENT_SZ=7 exists precisely because the
reference also splits codes wider than 7 nibbles, SURVEY.md C9). Wider
geometries fall back to the jnp uint64 path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import numpy as np

from public_kssd_tpu import shufspace
from public_kssd_tpu.config import SketchParams
from public_kssd_tpu.seqio import BREAK

LANES = 128
BLOCK_ROWS = 256  # (256, 128) uint32 tiles: ~128 KiB/operand in VMEM

SENTINEL32 = np.uint32(0xFFFFFFFF)


class _NpConsts:
    """xp shim for shufspace.feistel inside a Pallas kernel: dtype
    constructors must yield numpy scalars (pallas_call rejects captured
    device-array constants)."""

    uint32 = np.uint32


def supported(params: SketchParams) -> bool:
    """drtuple (4(k-l) bits) and window halo must fit the tile layout.

    TL <= 30 guards the same _accumulate_log level invariant as
    supported_wide (W = 32 would build a 64-bit level segment and shift
    by the full register width). Unreachable for narrow geometries under
    the config validator today (k-l <= 7 with l <= s < 8 forces k <= 14,
    TL <= 28), but enforced so a future validator change cannot route a
    W >= 31 geometry into the kernel."""
    return (
        params.drtuple_bits <= 31
        and (params.TL - 1) <= LANES
        and params.TL <= 30
    )


def supported_wide(params: SketchParams) -> bool:
    """Wide variant: 32..60-bit drtuples (k-l >= 8) as two uint32 output
    planes; window halo must still fit one lane tile. k = 16 (W = 32)
    stays on the jnp path: the log accumulation's level segments must
    fit uint32 (W <= 30, see _accumulate_log) and the rc derivation
    shifts by 64-2W (zero-shift hazard at W = 32)."""
    return (
        31 < params.drtuple_bits <= 60
        and (params.TL - 1) <= LANES
        and params.TL <= 30
    )


def _u32(x: int) -> np.uint32:
    return np.uint32(x & 0xFFFFFFFF)


def _lsr(x, sh: int):
    """LOGICAL right shift of a uint32 lane value by a static amount.

    Mosaic lowers uint32 ``>>`` as an arithmetic i32 shift (the same
    class of bug as the signed-compare quirk handled in _sketch_kernel),
    so the sign extension must be masked off explicitly. No-op cost: the
    mask fuses into the shift on the VPU.
    """
    if sh == 0:
        return x
    if sh >= 32:
        return x ^ x  # zeros_like, keeps dtype
    return (x >> _u32(sh)) & _u32(0xFFFFFFFF >> sh)


def _shift_right_128(hi, lo, sh: int):
    """(hi:lo) >> sh for a 64-bit value in two uint32 halves, 0<=sh<64."""
    if sh == 0:
        return lo
    if sh < 32:
        return _lsr(lo, sh) | (hi << _u32(32 - sh))
    return _lsr(hi, sh - 32)


def _shl_wide(x, sh: int):
    """Left shift that defeats Mosaic's narrow-range lane packing.

    Mosaic may evaluate a small-range operand (e.g. a freshly built
    16-bit-range level value) in 16-bit lanes; a shift whose result
    needs more bits then silently truncates (observed on a v5e with
    ``(3 ^ bj) << 2j`` for 2j >= 16). ORing in the top bit forces a
    full-32-bit range; for sh >= 1 that bit shifts out entirely
    ((x | m) << s == (x << s) | (m << s) and 0x80000000 << s == 0 mod
    2^32), so the value is unchanged.
    """
    if sh == 0:
        return x
    if sh >= 32:
        return x ^ x
    return (x | _u32(0x80000000)) << _u32(sh)


def _ult(a, b):
    """Unsigned a < b on uint32 lanes, independent of whether the backend
    lowers the compare signed (Mosaic/TPU) or unsigned (interpreter):
    compare the sign-safe 31-bit halves first, then the low bit."""
    ah, bh = _lsr(a, 1), _lsr(b, 1)
    return (ah < bh) | ((ah == bh) & ((a & _u32(1)) < (b & _u32(1))))


def _ule(a, b):
    """Unsigned a <= b (same backend-independence as _ult)."""
    return ~_ult(b, a)


def _accumulate_unrolled(ext, W: int):
    """W-step linear accumulation: (fwd_hi, fwd_lo, rc_hi, rc_lo,
    invalid), each (BLOCK_ROWS, LANES)."""
    a = ext[:, :LANES]
    fwd_hi = jnp.zeros_like(a)
    fwd_lo = jnp.zeros_like(a)
    rc_hi = jnp.zeros_like(a)
    rc_lo = jnp.zeros_like(a)
    invalid = jnp.zeros_like(a, dtype=jnp.bool_)
    three = _u32(3)

    for j in range(W):
        sym = ext[:, j : j + LANES]
        invalid = invalid | (sym >= np.uint32(BREAK))
        bj = sym & three  # harmless for BREAK lanes; masked via `invalid`
        # fwd = (fwd << 2) | bj   (64-bit via hi/lo)
        fwd_hi = (fwd_hi << _u32(2)) | _lsr(fwd_lo, 30)
        fwd_lo = (fwd_lo << _u32(2)) | bj
        # rc = (rc << 2) | (3 ^ b[W-1-j]) — descending-index accumulation
        # so every shift stays on the born-32-bit ACCUMULATOR. The naive
        # form ``(3 ^ bj) << 2j`` silently truncates for 2j >= 16: Mosaic
        # evaluates the narrow-range operand (<= 3) in 16-bit lanes
        # (verified on a v5e — bits 16+ of rc came out zero).
        symr = ext[:, W - 1 - j : W - 1 - j + LANES]
        rc_hi = (rc_hi << _u32(2)) | _lsr(rc_lo, 30)
        rc_lo = (rc_lo << _u32(2)) | (three ^ (symr & three))
    return fwd_hi, fwd_lo, rc_hi, rc_lo, invalid


def _rev2_32(x):
    """Reverse the 16 2-bit groups of a uint32 lane value (the 32-bit
    half of the reference's crvs64bits, global_basic.h:64-71). The final
    half-swap is written as a rotate so every shifted operand has full
    32-bit range (Mosaic narrow-range lane packing, see _accumulate_log).
    """
    m2, m4, m8 = _u32(0x33333333), _u32(0x0F0F0F0F), _u32(0x00FF00FF)
    x = (_lsr(x, 2) & m2) | ((x & m2) << _u32(2))
    x = (_lsr(x, 4) & m4) | ((x & m4) << _u32(4))
    x = (_lsr(x, 8) & m8) | ((x & m8) << _u32(8))
    return _lsr(x, 16) | (x << _u32(16))


def _accumulate_log(ext, W: int):
    """Log-depth accumulation: O(log W) doubling passes instead of W
    linear steps (~3x fewer VPU ops at W=20).

    Level arrays over the extended width E = LANES + W - 1:
      f_l[p] = symbols [p, p+2^l) packed big-endian    (2*2^l bits)
      i_l[p] = any BREAK in [p, p+2^l)
    built by f_{l+1}[p] = (f_l[p] << 2*2^l) | f_l[p+2^l] (one lane-roll
    per level); the W-window forward value is then the combine of
    popcount(W) segments along W's binary decomposition — 2 segments for
    the default W=20. Levels stay in single uint32 registers (2*2^l <= 32
    for l <= 4, and W <= 30 caps the top level at 4); only the final
    combine produces hi/lo pairs.

    The reverse-complement value is NOT accumulated separately: it is
    derived from fwd by 2-bit-group reversal + complement
    (rc = crvs64(fwd) >> (64-2W), exactly the reference's crvs64bits
    identity) — cheaper than a second level pyramid, and its operands
    are always full-range. That matters: Mosaic packs provably-narrow
    lane values into 16-bit (or narrower) lanes and a left shift whose
    result outgrows them silently truncates; the first version of this
    kernel accumulated rc little-endian from narrow level segments and
    miscompiled exactly there (k=7, verified on a v5e — _shl_wide's
    constant-OR widening trick does not survive the simplifier either).
    Remaining left shifts apply to full-range operands or to level /
    accumulator values of >=16-bit range (empirically safe: 16-bit-range
    operands lower to 32-bit lanes). Hardware-validated against the jnp
    path for every supported segment pattern — k in {6,7,8,9,10,11,13,
    14}, i.e. W = 12..28 covering 1, 2 and 3-segment combines with and
    without a live hi register — on a v5e (2026-08; bench.py re-asserts
    the default geometry on every run).
    """
    three = _u32(3)
    max_l = W.bit_length() - 1  # floor(log2 W) <= 4 for W <= 30
    fl = {0: ext & three}
    il = {0: (ext >= np.uint32(BREAK)).astype(jnp.uint32)}
    for l in range(max_l):
        d = 1 << l
        fl[l + 1] = _shl_wide(fl[l], 2 * d) | jnp.concatenate(
            [fl[l][:, d:], fl[l][:, :d]], axis=1
        )
        il[l + 1] = il[l] | jnp.concatenate(
            [il[l][:, d:], il[l][:, :d]], axis=1
        )

    segs = [l for l in range(max_l, -1, -1) if (W >> l) & 1]  # MSB first
    rows = ext.shape[0]

    # fwd: big-endian — largest segment first, offsets ascending
    off = 0
    fwd_hi = jnp.zeros((rows, LANES), jnp.uint32)
    fwd_lo = None
    invalid = jnp.zeros((rows, LANES), jnp.bool_)
    for l in segs:
        seg = fl[l][:, off : off + LANES]
        invalid = invalid | (il[l][:, off : off + LANES] != 0)
        if fwd_lo is None:
            fwd_lo = seg
        else:
            s = 2 * (1 << l)  # < 32: only the first segment can be lvl 4
            fwd_hi = (fwd_hi << _u32(s)) | _lsr(fwd_lo, 32 - s)
            fwd_lo = _shl_wide(fwd_lo, s) | seg
        off += 1 << l

    # rc = crvs64(fwd) >> (64 - 2W): group-reverse + complement the
    # 64-bit (hi:lo) forward value, then logical-shift down
    full_hi = ~_rev2_32(fwd_lo)
    full_lo = ~_rev2_32(fwd_hi)
    sh = 64 - 2 * W
    if sh < 32:
        rc_lo = _lsr(full_lo, sh) | (full_hi << _u32(32 - sh))
        rc_hi = _lsr(full_hi, sh)
    else:
        rc_lo = _lsr(full_hi, sh - 32)
        rc_hi = jnp.zeros_like(full_hi)
    return fwd_hi, fwd_lo, rc_hi, rc_lo, invalid


def _shl64(x, S: int):
    """uint32 value -> 64-bit (hi, lo) pair shifted left by static S
    (S < 64); uses the Mosaic-safe shift helpers."""
    if S >= 32:
        return _shl_wide(x, S - 32), x ^ x  # _shl_wide(x, 0) == x
    hi = _lsr(x, 32 - S) if S > 0 else x ^ x
    return hi, _shl_wide(x, S)


def _sketch_kernel(
    a_ref, b_ref, out_ref, *, params: SketchParams, seed: int,
    debug: str = "", accum: str = "log", wide: bool = False,
    hi_ref=None,
):
    """One (BLOCK_ROWS, LANES) tile: a_ref = this row-block, b_ref = the
    row-block one row down (halo source). Emits one code per window
    position, SENTINEL32 where filtered out. ``wide`` emits the drtuple
    as two planes (out_ref = low 32 bits, hi_ref = high bits; a real hi
    is < 2^28, so hi == SENTINEL32 marks filtered windows)."""
    W = params.TL
    H = W - 1  # halo width

    a = a_ref[:].astype(jnp.uint32)
    b = b_ref[:].astype(jnp.uint32)
    # ext[:, j] for j in [0, LANES+H): symbol at window offset j
    ext = jnp.concatenate([a, b[:, :H]], axis=1)

    accumulate = _accumulate_log if accum == "log" else _accumulate_unrolled
    fwd_hi, fwd_lo, rc_hi, rc_lo, invalid = accumulate(ext, W)
    if 4 * params.half_ctx_len <= 32:
        fwd_hi = jnp.zeros_like(fwd_hi)  # 4k bits fit entirely in lo

    # canonical = min(fwd, rc), 64-bit lexicographic on (hi, lo), using
    # the backend-independent unsigned compares (_ult/_ule).
    take_fwd = _ult(fwd_hi, rc_hi) | ((fwd_hi == rc_hi) & _ule(fwd_lo, rc_lo))
    uni_hi = jnp.where(take_fwd, fwd_hi, rc_hi)
    uni_lo = jnp.where(take_fwd, fwd_lo, rc_lo)

    # inner 4s-bit substring (iseq2comem.c:246)
    inner = _shift_right_128(uni_hi, uni_lo, 2 * params.half_outctx_len) & _u32(
        params.dim_shuf_len - 1
    )
    pf = shufspace.feistel(_NpConsts, inner, seed, params.half_subctx_len)
    if debug:  # test-only intermediate dump (see tests / debugging scripts)
        out_ref[:] = {
            "inner": inner,
            "pf": pf,
            "uni_lo": uni_lo,
            "uni_hi": uni_hi,
            "fwd_lo": fwd_lo,
            "fwd_hi": fwd_hi,
            "rc_lo": rc_lo,
            "rc_hi": rc_hi,
            "invalid": invalid.astype(jnp.uint32),
        }[debug]
        return
    keep = (
        (~invalid)
        & (pf >= np.uint32(params.dim_start))
        & (pf < np.uint32(params.dim_end))
    )

    # drtuple repack (iseq2comem.c:250-253), decomposed into outer halves:
    #   ((uni & undomask) + ((uni & rightmask) << 4s)) >> 4l
    # = left_outer << (2(k+s) - 4l)  +  right_outer << (4s - 4l)
    s, k, l = params.half_subctx_len, params.half_ctx_len, params.drlevel
    left_outer = _shift_right_128(uni_hi, uni_lo, 2 * (k + s))
    right_outer = uni_lo & _u32(params.rightmask)
    pfv = pf - np.uint32(params.dim_start)
    S1 = 2 * (k + s) - 4 * l
    S2 = 4 * s - 4 * l
    if not wide:
        drtuple = (
            (left_outer << _u32(S1)) + (right_outer << _u32(S2)) + pfv
        )
        out_ref[:] = jnp.where(keep, drtuple, SENTINEL32)
        return
    # wide (32..60-bit) repack: explicit (hi, lo) add with carries.
    # left_outer has 2(k-s) <= 28 bits, right_outer 2(k-s) bits, pfv
    # < 2^(4s); only S1 can reach/exceed 32 (S1 + 2(k-s) = drtuple_bits)
    a_hi, a_lo = _shl64(left_outer, S1)
    b_hi, b_lo = _shl64(right_outer, S2)
    lo1 = a_lo + b_lo
    hi1 = a_hi + b_hi + _ult(lo1, a_lo).astype(jnp.uint32)
    lo2 = lo1 + pfv
    hi2 = hi1 + _ult(lo2, lo1).astype(jnp.uint32)
    out_ref[:] = jnp.where(keep, lo2, SENTINEL32)
    hi_ref[:] = jnp.where(keep, hi2, SENTINEL32)


def _default_accum() -> str:
    """'log' (doubling accumulation, ~2x kernel throughput) unless
    KSSD_TPU_PALLAS_ACCUM=unroll forces the W-step linear loop."""
    import os

    return os.environ.get("KSSD_TPU_PALLAS_ACCUM", "log")


_validated: dict[tuple, bool] = {}


def validated_on_backend(params: SketchParams, computed) -> bool:
    """One-shot pallas-vs-jnp parity check on the REAL backend, cached
    per (backend, params, accum, seed) for the process lifetime.

    The log-depth accumulation's correctness depends on empirically
    observed Mosaic narrow-range lane-packing behaviour (two prior
    silent miscompiles are documented on _accumulate_log); CI exercises
    interpret mode only, so a Mosaic/runtime change or an untested TPU
    generation could silently produce wrong sketches. This check runs
    once before the first production dispatch per geometry: one small
    kernel (~8k symbols incl. BREAKs) against the always-correct jnp
    path. On mismatch the caller falls back to jnp — slower, never
    wrong — and an error is logged.
    """
    import jax

    key = (jax.default_backend(), params, _default_accum(), computed.seed)
    ok = _validated.get(key)
    if ok is None:
        ok = _self_check(params, computed)
        _validated[key] = ok
        if not ok:
            from public_kssd_tpu import utils

            utils.log.error(
                "pallas sketch kernel FAILED the on-device parity "
                "self-check for %s on backend %s (accum=%s) — falling "
                "back to the jnp path (correct, slower). Set "
                "KSSD_TPU_PALLAS_ACCUM=unroll or KSSD_TPU_PALLAS=off "
                "and report this configuration.",
                params, jax.default_backend(), _default_accum(),
            )
    return ok


def _self_check(params: SketchParams, computed) -> bool:
    """pallas dense output == jnp dense output on ~8k mixed symbols
    (narrow or wide kernel, picked by the geometry's code width)."""
    from public_kssd_tpu.ops import sketch as sketch_ops

    rng = np.random.default_rng(0xC0DE)
    n = 1 << 13
    sym = rng.integers(0, 4, size=n).astype(np.uint8)
    sym[rng.integers(0, n, size=16)] = BREAK
    symd = jnp.asarray(sym)
    wide = params.drtuple_bits > 31
    if wide:
        dense = np.asarray(
            sketch_windows_pallas_wide(symd, params, computed.seed)
        )
        sentinel = np.uint64(0xFFFFFFFFFFFFFFFF)
    else:
        dense = np.asarray(sketch_windows_pallas(symd, params, computed.seed))
        sentinel = SENTINEL32
    dr, keep = sketch_ops.sketch_windows(symd, None, params, computed)
    dr, keep = np.asarray(dr), np.asarray(keep)
    m = dr.shape[0]
    keep_p = dense != sentinel
    return (
        np.array_equal(keep_p[:m], keep)
        and np.array_equal(dense[:m][keep], dr[keep].astype(dense.dtype))
        and int(keep_p[m:].sum()) == 0
    )


@functools.partial(
    jax.jit, static_argnames=("params", "seed", "interpret", "debug", "accum")
)
def sketch_windows_pallas(
    symbols: jax.Array,  # uint8 [N], N a multiple of LANES
    params: SketchParams,
    seed: int,
    interpret: bool = False,
    debug: str = "",
    accum: str | None = None,
) -> jax.Array:
    """uint32 [N] per-window sketch codes (SENTINEL32 = filtered out).

    Position p holds the code of the window starting at symbol p; the
    last W-1 positions are valid only if the caller padded with BREAK
    (the standard stream protocol of ops.sketch.sketch_codes_stream).
    Requires ``supported(params)`` and a Feistel (computed) shuffle space.
    """
    n = symbols.shape[0]
    assert n % LANES == 0, "pad stream to a multiple of LANES"
    rows = n // LANES
    grid_rows = pl.cdiv(rows, BLOCK_ROWS)
    pad_rows = grid_rows * BLOCK_ROWS - rows
    sym2d = symbols.reshape(rows, LANES)
    if pad_rows:
        sym2d = jnp.pad(sym2d, ((0, pad_rows), (0, 0)), constant_values=BREAK)
    total_rows = rows + pad_rows

    kernel = functools.partial(
        _sketch_kernel, params=params, seed=seed, debug=debug,
        accum=accum or _default_accum(),
    )
    out = pl.pallas_call(
        kernel,
        grid=(grid_rows,),
        in_specs=[
            pl.BlockSpec(
                (BLOCK_ROWS, LANES), lambda i: (i, i - i), memory_space=pltpu.VMEM
            ),
            # halo source: same array shifted one row down (clamped)
            pl.BlockSpec(
                (BLOCK_ROWS, LANES),
                lambda i: (i, i - i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (BLOCK_ROWS, LANES), lambda i: (i, i - i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((total_rows, LANES), jnp.uint32),
        interpret=interpret,
    )(sym2d, _rolled_down(sym2d))
    return out[:rows].reshape(n)


@functools.partial(
    jax.jit, static_argnames=("params", "seed", "interpret", "accum")
)
def sketch_windows_pallas_wide(
    symbols: jax.Array,  # uint8 [N], N a multiple of LANES
    params: SketchParams,
    seed: int,
    interpret: bool = False,
    accum: str | None = None,
) -> jax.Array:
    """uint64 [N] per-window sketch codes for 32..60-bit drtuples
    (SENTINEL = all-ones marks filtered windows).

    The kernel emits two uint32 planes (low word + high bits with
    explicit carry propagation — Mosaic-safe helpers throughout, see
    _sketch_kernel ``wide``); they combine to uint64 outside the kernel
    (x64 ops don't exist on the VPU lanes). Requires
    ``supported_wide(params)``.
    """
    n = symbols.shape[0]
    assert n % LANES == 0, "pad stream to a multiple of LANES"
    rows = n // LANES
    grid_rows = pl.cdiv(rows, BLOCK_ROWS)
    pad_rows = grid_rows * BLOCK_ROWS - rows
    sym2d = symbols.reshape(rows, LANES)
    if pad_rows:
        sym2d = jnp.pad(sym2d, ((0, pad_rows), (0, 0)), constant_values=BREAK)
    total_rows = rows + pad_rows

    kernel = functools.partial(
        _sketch_kernel, params=params, seed=seed,
        accum=accum or _default_accum(), wide=True,
    )

    def body(a_ref, b_ref, lo_ref, hi_ref):
        kernel(a_ref, b_ref, lo_ref, hi_ref=hi_ref)

    spec = pl.BlockSpec(
        (BLOCK_ROWS, LANES), lambda i: (i, i - i), memory_space=pltpu.VMEM
    )
    lo, hi = pl.pallas_call(
        body,
        grid=(grid_rows,),
        in_specs=[spec, spec],
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((total_rows, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((total_rows, LANES), jnp.uint32),
        ),
        interpret=interpret,
    )(sym2d, _rolled_down(sym2d))
    lo = lo[:rows].reshape(n)
    hi = hi[:rows].reshape(n)
    keep = hi != SENTINEL32
    code = (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(jnp.uint64)
    return jnp.where(keep, code, jnp.uint64(0xFFFFFFFFFFFFFFFF))


def _rolled_down(sym2d: jax.Array) -> jax.Array:
    """Rows shifted up by one (row r holds original row r+1): the halo
    source. The final row's halo is all-BREAK, so windows never read
    past the stream end."""
    brk = jnp.full((1, sym2d.shape[1]), BREAK, sym2d.dtype)
    return jnp.concatenate([sym2d[1:], brk], axis=0)
