"""Device sketch kernel: base-code streams -> kept sketch codes (drtuples).

This is the TPU-native redesign of the reference's rolling scalar loop
(fasta2co hot loop, iseq2comem.c:205-270). Instead of a sequential 2-bit
rolling register, every window value is computed data-parallel:

  window fwd value  F[p] = sum_j b[p+j] * 4^(W-1-j)      (W = 2k bases)
  window rc  value  R[p] = sum_j (3-b[p+j]) * 4^j
  canonical         U[p] = min(F[p], R[p])               (iseq2comem.c:245)
  inner substring   I[p] = (U[p] >> 2(k-s)) & (16^s - 1) (iseq2comem.c:246)
  rank              P[p] = shuffled_dim[I[p]]             (HBM gather)
  keep              dim_start <= P[p] < dim_end           (iseq2comem.c:248)
  drtuple           ((U & undomask) + ((U & right) << 4s)) >> 4l + P
                                                          (iseq2comem.c:250-253)

Window validity (no BREAK symbol inside the window) is a cummax over
break positions — the data-parallel equivalent of the scanner's
``base > TL`` run-length counter.

The unrolled W-step accumulation is O(W·N) VPU work with no sequential
dependence, so XLA vectorises/fuses it freely; the only HBM-random access
is the 16^s-entry shuffled-dimension gather. A Pallas double-buffered
variant lives in ops/pallas_sketch.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from public_kssd_tpu.config import SketchParams
from public_kssd_tpu.seqio import BREAK


@functools.partial(jax.jit, static_argnames=("params",))
def sketch_windows(
    symbols: jax.Array,  # uint8 [N] base codes 0..3 or BREAK(4)
    shuffled_dim: jax.Array,  # int32 [16^s]
    params: SketchParams,
) -> tuple[jax.Array, jax.Array]:
    """Return (drtuple uint64 [M], keep bool [M]) for all M = N-W+1 windows.

    ``drtuple`` entries where ``keep`` is False are arbitrary; callers
    compact with the mask. Order of windows == sequence order, matching the
    reference scanner's emission order.
    """
    W = params.TL
    n = symbols.shape[0]
    m = max(n - W + 1, 0)
    if m == 0:
        return (jnp.zeros((0,), jnp.uint64), jnp.zeros((0,), bool))

    b = symbols.astype(jnp.uint64)
    is_brk = symbols >= BREAK

    # --- window values, W-step unrolled accumulation ------------------
    fwd = jnp.zeros((m,), jnp.uint64)
    rc = jnp.zeros((m,), jnp.uint64)
    three = jnp.uint64(3)
    for j in range(W):
        bj = jax.lax.dynamic_slice(b, (j,), (m,))
        fwd = (fwd << 2) | bj
        rc = rc | ((three ^ bj) << jnp.uint64(2 * j))
    # fwd used b masked by tupmask implicitly: W*2 = 4k bits exactly.

    # --- validity: no break inside [p, p+W) ---------------------------
    pos = jnp.arange(n, dtype=jnp.int32)
    brk_pos = jnp.where(is_brk, pos, -1)
    last_brk = jax.lax.cummax(brk_pos)  # last break at or before each pos
    valid = jax.lax.dynamic_slice(last_brk, (W - 1,), (m,)) < pos[:m]

    # --- canonical + shuffled-space filter ----------------------------
    uni = jnp.minimum(fwd, rc)
    inner = ((uni >> jnp.uint64(2 * params.half_outctx_len)).astype(jnp.uint32)
             & jnp.uint32(params.dim_shuf_len - 1)).astype(jnp.int32)
    pf = shuffled_dim[inner]
    keep = valid & (pf >= params.dim_start) & (pf < params.dim_end)

    # --- repack to drtuple (iseq2comem.c:250-253) ---------------------
    left = uni & jnp.uint64(params.undomask)
    right = (uni & jnp.uint64(params.rightmask)) << jnp.uint64(
        4 * params.half_subctx_len
    )
    drtuple = ((left + right) >> jnp.uint64(4 * params.drlevel)) + (
        pf - params.dim_start
    ).astype(jnp.uint64)
    return drtuple, keep


def sketch_codes_host(
    symbols: np.ndarray,
    shuffled_dim,
    params: SketchParams,
    block: int = 1 << 22,
) -> np.ndarray:
    """Host wrapper: stream a symbol array through the device kernel in
    fixed-size blocks (static shapes for XLA) and return kept drtuples in
    sequence order as uint64 numpy.

    Blocks overlap by W-1 symbols so every window is seen exactly once —
    the chunked-sequence streaming described in SURVEY.md §5.
    """
    W = params.TL
    n = symbols.size
    if n < W:
        return np.zeros(0, dtype=np.uint64)
    out: list[np.ndarray] = []
    start = 0
    while start + W - 1 < n:
        end = min(start + block, n)
        chunk = symbols[start:end]
        if chunk.size < block:
            # pad with BREAKs to a power-of-two bucket: static shapes,
            # bounded number of distinct compilations
            bucket = max(4096, 1 << (chunk.size - 1).bit_length())
            pad = np.full(bucket - chunk.size, BREAK, dtype=np.uint8)
            chunk = np.concatenate([chunk, pad])
        dr, keep = sketch_windows(jnp.asarray(chunk), shuffled_dim, params)
        dr = np.asarray(dr)
        keep = np.asarray(keep)
        out.append(dr[keep])
        start = end - (W - 1)
    if not out:
        return np.zeros(0, dtype=np.uint64)
    return np.concatenate(out)


def sketch_codes_reads(
    reads: list[np.ndarray],
    shuffled_dim,
    params: SketchParams,
) -> tuple[np.ndarray, np.ndarray]:
    """Sketch a list of reads; returns (codes, read_id) arrays with codes
    in (read, position) order — the --byread streaming layout
    (reads2mco, iseq2comem.c:78-186).

    Reads are concatenated with BREAK separators and pushed through the
    same windowed kernel, so one device call covers the whole batch.
    """
    if not reads:
        return np.zeros(0, np.uint64), np.zeros(0, np.int64)
    brk = np.array([BREAK], dtype=np.uint8)
    pieces = []
    bounds = [0]
    for r in reads:
        pieces.append(r)
        pieces.append(brk)
        bounds.append(bounds[-1] + r.size + 1)
    symbols = np.concatenate(pieces)
    W = params.TL
    dr, keep = sketch_windows(jnp.asarray(symbols), jnp.asarray(shuffled_dim), params)
    dr = np.asarray(dr)
    keep = np.asarray(keep)
    kept_pos = np.flatnonzero(keep)
    codes = dr[kept_pos]
    # window starting at p belongs to the read whose span contains p
    read_id = np.searchsorted(np.asarray(bounds), kept_pos, side="right") - 1
    return codes, read_id
