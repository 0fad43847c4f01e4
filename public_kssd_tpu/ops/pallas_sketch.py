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
    """drtuple (4(k-l) bits) and window halo must fit the tile layout."""
    return params.drtuple_bits <= 31 and (params.TL - 1) <= LANES


def _u32(x: int) -> np.uint32:
    return np.uint32(x & 0xFFFFFFFF)


def _shift_right_128(hi, lo, sh: int):
    """(hi:lo) >> sh for a 64-bit value in two uint32 halves, 0<=sh<64."""
    if sh == 0:
        return lo
    if sh < 32:
        return (lo >> _u32(sh)) | (hi << _u32(32 - sh))
    return hi >> _u32(sh - 32)


def _sketch_kernel(a_ref, b_ref, out_ref, *, params: SketchParams, seed: int):
    """One (BLOCK_ROWS, LANES) tile: a_ref = this row-block, b_ref = the
    row-block one row down (halo source). Emits one code per window
    position, SENTINEL32 where filtered out."""
    W = params.TL
    H = W - 1  # halo width

    a = a_ref[:].astype(jnp.uint32)
    b = b_ref[:].astype(jnp.uint32)
    # ext[:, j] for j in [0, LANES+H): symbol at window offset j
    ext = jnp.concatenate([a, b[:, :H]], axis=1)

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
        fwd_hi = (fwd_hi << _u32(2)) | (fwd_lo >> _u32(30))
        fwd_lo = (fwd_lo << _u32(2)) | bj
        # rc |= (3 ^ bj) << 2j
        comp = three ^ bj
        if 2 * j < 32:
            rc_lo = rc_lo | (comp << _u32(2 * j))
        else:
            rc_hi = rc_hi | (comp << _u32(2 * j - 32))
    if 4 * params.half_ctx_len <= 32:
        fwd_hi = jnp.zeros_like(fwd_hi)  # 4k bits fit entirely in lo

    # canonical = min(fwd, rc), 64-bit lexicographic on (hi, lo).
    # Mosaic lowers uint32 < as a SIGNED i32 compare; flip the sign bit
    # (x ^ 0x80000000) so the signed order matches unsigned order.
    flip = _u32(0x80000000)
    take_fwd = ((fwd_hi ^ flip) < (rc_hi ^ flip)) | (
        (fwd_hi == rc_hi) & ((fwd_lo ^ flip) <= (rc_lo ^ flip))
    )
    uni_hi = jnp.where(take_fwd, fwd_hi, rc_hi)
    uni_lo = jnp.where(take_fwd, fwd_lo, rc_lo)

    # inner 4s-bit substring (iseq2comem.c:246)
    inner = _shift_right_128(uni_hi, uni_lo, 2 * params.half_outctx_len) & _u32(
        params.dim_shuf_len - 1
    )
    pf = shufspace.feistel(_NpConsts, inner, seed, params.half_subctx_len)
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
    drtuple = (
        (left_outer << _u32(2 * (k + s) - 4 * l))
        + (right_outer << _u32(4 * s - 4 * l))
        + (pf - np.uint32(params.dim_start))
    )
    out_ref[:] = jnp.where(keep, drtuple, SENTINEL32)


@functools.partial(jax.jit, static_argnames=("params", "seed", "interpret"))
def sketch_windows_pallas(
    symbols: jax.Array,  # uint8 [N], N a multiple of LANES
    params: SketchParams,
    seed: int,
    interpret: bool = False,
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

    kernel = functools.partial(_sketch_kernel, params=params, seed=seed)
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


def _rolled_down(sym2d: jax.Array) -> jax.Array:
    """Rows shifted up by one (row r holds original row r+1): the halo
    source. The final row's halo is all-BREAK, so windows never read
    past the stream end."""
    brk = jnp.full((1, sym2d.shape[1]), BREAK, sym2d.dtype)
    return jnp.concatenate([sym2d[1:], brk], axis=0)
