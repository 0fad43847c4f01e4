"""Computed (Feistel) shuffle space: bijectivity, .shuf interop,
kernel equality between the gather path and the computed path."""

import numpy as np
import pytest

from public_kssd_tpu import formats, shufspace
from public_kssd_tpu.config import SketchParams
from public_kssd_tpu.ops import sketch as sketch_ops


@pytest.mark.parametrize("s", [2, 3, 4, 5, 6])
def test_feistel_is_a_permutation(s):
    n = 1 << (4 * s)
    idx = np.arange(n, dtype=np.uint32)
    out = shufspace.feistel(np, idx, seed=12345, subctx_len=s)
    assert out.min() >= 0 and out.max() == n - 1
    assert np.unique(out).size == n  # bijective


def test_feistel_seeds_differ():
    idx = np.arange(1 << 12, dtype=np.uint32)
    a = shufspace.feistel(np, idx, seed=1, subctx_len=3)
    b = shufspace.feistel(np, idx, seed=2, subctx_len=3)
    assert not np.array_equal(a, b)


def test_feistel_sampling_rate():
    """dim_end/16^s of the space must land below dim_end (exact, since
    the permutation is a bijection)."""
    params = SketchParams(id=99, half_ctx_len=10, half_subctx_len=6, drlevel=3)
    idx = np.arange(params.dim_shuf_len, dtype=np.uint32)
    ranks = shufspace.feistel(np, idx, params.id, params.half_subctx_len)
    kept = int((ranks < params.dim_end).sum())
    assert kept == params.dim_end


def test_shuf_file_roundtrip_detect(tmp_path):
    params = SketchParams(id=4242, half_ctx_len=8, half_subctx_len=5, drlevel=2)
    table = shufspace.make_feistel_dim(params)
    path = str(tmp_path / "x.shuf")
    formats.write_shuf(path, params, table)
    params2, table2 = formats.read_shuf(path)
    assert np.array_equal(table, table2)
    computed = shufspace.detect(params2, table2)
    assert computed == shufspace.ComputedShuf(4242, 5)


def test_detect_rejects_foreign_table():
    params = SketchParams(id=7, half_ctx_len=8, half_subctx_len=5, drlevel=2)
    rng = np.random.default_rng(0)
    foreign = rng.permutation(params.dim_shuf_len).astype("<i4")
    assert shufspace.detect(params, foreign) is None


@pytest.mark.parametrize("k,s,l", [(8, 5, 2), (10, 6, 3)])
def test_computed_path_equals_gather_path(k, s, l):
    import jax.numpy as jnp

    params = SketchParams(id=314159, half_ctx_len=k, half_subctx_len=s, drlevel=l)
    table = shufspace.make_feistel_dim(params)
    computed = shufspace.ComputedShuf(params.id, s)

    rng = np.random.default_rng(1)
    sym = rng.integers(0, 4, size=1 << 16).astype(np.uint8)
    sym[rng.integers(0, sym.size, 50)] = 4  # BREAKs

    via_table = sketch_ops.sketch_codes_host(sym, jnp.asarray(table), params)
    via_computed = sketch_ops.sketch_codes_host(sym, computed, params)
    assert np.array_equal(via_table, via_computed)
    assert via_table.size > 0


def test_pipeline_accepts_computed(tmp_path):
    """run_stage1 with a ComputedShuf produces the same sketch dir as
    with the equivalent materialised table."""
    import gzip

    from public_kssd_tpu import pipeline

    params = SketchParams(id=2718, half_ctx_len=8, half_subctx_len=5, drlevel=2)
    table = shufspace.make_feistel_dim(params)
    computed = shufspace.ComputedShuf(params.id, 5)

    rng = np.random.default_rng(3)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    files = []
    for i in range(3):
        p = str(tmp_path / f"g{i}.fasta.gz")
        seq = lut[rng.integers(0, 4, size=20000)].tobytes()
        with gzip.open(p, "wb") as f:
            f.write(b">chr\n" + seq + b"\n")
        files.append(p)

    d1, d2 = str(tmp_path / "via_table"), str(tmp_path / "via_comp")
    pipeline.run_stage1(files, d1, params, table)
    pipeline.run_stage1(files, d2, params, computed)
    for c in range(params.component_num):
        a = formats.read_combco(d1, c)
        b = formats.read_combco(d2, c)
        assert np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])
