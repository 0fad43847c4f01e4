"""Unit tests of the sketch bit-math against brute-force Python oracles.

The oracle re-implements the reference scanner literally (rolling 2-bit
registers, iseq2comem.c:205-270) in pure Python; the device kernel must
agree on every window."""

import numpy as np
import pytest

from public_kssd_tpu.config import SketchParams
from public_kssd_tpu.ops.sketch import sketch_codes_host, sketch_codes_reads
from public_kssd_tpu.seqio import BREAK


def oracle_sketch(symbols: np.ndarray, shuffled_dim: np.ndarray, p: SketchParams):
    """Literal port of the fasta2co rolling loop over a symbol stream."""
    tuple_ = 0
    crvs = 0
    base = 1
    out = []
    for ch in symbols.tolist():
        if ch < 4:
            tuple_ = ((tuple_ << 2) | ch) & p.tupmask
            crvs = (crvs >> 2) + ((ch ^ 3) << p.crvsaddmove)
            base += 1
        else:
            base = 1
            continue
        if base > p.TL:
            uni = min(tuple_, crvs)
            dim_tup = (uni & p.domask) >> (p.half_outctx_len * 2)
            pf = int(shuffled_dim[dim_tup])
            if pf >= p.dim_end or pf < p.dim_start:
                continue
            pf -= p.dim_start
            drtuple = (
                ((uni & p.undomask)
                 + ((uni & ((1 << (p.half_outctx_len * 2)) - 1))
                    << (p.TL * 2 - p.half_outctx_len * 4)))
                >> (p.drlevel * 4)
            ) + pf
            out.append(drtuple)
    return np.array(out, dtype=np.uint64)


@pytest.mark.parametrize("k,subk,drlevel", [(8, 5, 2), (7, 5, 2), (10, 6, 3), (15, 6, 3)])
def test_kernel_matches_oracle(k, subk, drlevel):
    p = SketchParams(id=1, half_ctx_len=k, half_subctx_len=subk, drlevel=drlevel)
    rng = np.random.default_rng(k * 100 + drlevel)
    shuffled_dim = rng.permutation(p.dim_shuf_len).astype(np.int32)
    symbols = rng.integers(0, 4, size=5000).astype(np.uint8)
    # sprinkle breaks
    brk_pos = rng.integers(0, symbols.size, size=30)
    symbols[brk_pos] = BREAK
    expected = oracle_sketch(symbols, shuffled_dim, p)
    got = sketch_codes_host(symbols, shuffled_dim, p)
    np.testing.assert_array_equal(got, expected)


def test_kernel_chunking_invariance():
    """Streaming in small blocks must equal one-shot processing."""
    p = SketchParams(id=1, half_ctx_len=8, half_subctx_len=5, drlevel=2)
    rng = np.random.default_rng(0)
    shuffled_dim = rng.permutation(p.dim_shuf_len).astype(np.int32)
    symbols = rng.integers(0, 4, size=100_000).astype(np.uint8)
    symbols[rng.integers(0, symbols.size, size=100)] = BREAK
    whole = sketch_codes_host(symbols, shuffled_dim, p)
    chunked = sketch_codes_host(symbols, shuffled_dim, p, block=8192)
    np.testing.assert_array_equal(whole, chunked)


def test_reads_kernel_matches_per_read_oracle():
    p = SketchParams(id=1, half_ctx_len=7, half_subctx_len=5, drlevel=2)
    rng = np.random.default_rng(3)
    shuffled_dim = rng.permutation(p.dim_shuf_len).astype(np.int32)
    reads = [rng.integers(0, 4, size=int(n)).astype(np.uint8)
             for n in rng.integers(5, 200, size=50)]
    codes, read_id = sketch_codes_reads(reads, shuffled_dim, p)
    ptr = 0
    for i, r in enumerate(reads):
        exp = oracle_sketch(r, shuffled_dim, p)
        seg = codes[read_id == i]
        np.testing.assert_array_equal(seg, exp, err_msg=f"read {i}")
        ptr += exp.size
    assert ptr == codes.size


def test_canonical_strand_invariance():
    """sketch(revcomp(seq)) must produce the same multiset of codes."""
    p = SketchParams(id=1, half_ctx_len=8, half_subctx_len=5, drlevel=2)
    rng = np.random.default_rng(9)
    shuffled_dim = rng.permutation(p.dim_shuf_len).astype(np.int32)
    seq = rng.integers(0, 4, size=3000).astype(np.uint8)
    rc = (3 - seq)[::-1].astype(np.uint8)
    a = np.sort(sketch_codes_host(seq, shuffled_dim, p))
    b = np.sort(sketch_codes_host(rc, shuffled_dim, p))
    np.testing.assert_array_equal(a, b)


def test_compact_use_pallas_requires_computed():
    """sketch_windows_compact(use_pallas=True) without a computed
    (Feistel) space must raise a clear ValueError at trace time, not an
    AttributeError on computed.seed (advisor r4)."""
    import jax.numpy as jnp

    from public_kssd_tpu.ops import sketch as sketch_ops

    p = SketchParams(id=1, half_ctx_len=8, half_subctx_len=5, drlevel=2)
    rng = np.random.default_rng(11)
    shuffled_dim = jnp.asarray(rng.permutation(p.dim_shuf_len).astype(np.int32))
    symbols = jnp.asarray(rng.integers(0, 4, size=512).astype(np.uint8))
    with pytest.raises(ValueError, match="computed"):
        sketch_ops.sketch_windows_compact(
            symbols, shuffled_dim, p, 64, None, use_pallas=True
        )
