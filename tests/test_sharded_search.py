"""Multi-device sharding tests on the 8-virtual-CPU-device mesh:
shard-merged counts must equal single-device counts exactly."""

import os

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from public_kssd_tpu import formats, index as index_mod, search
from public_kssd_tpu.config import SketchParams
from public_kssd_tpu.ops import count as count_ops
from public_kssd_tpu.parallel import sharded_search


@pytest.fixture(scope="module")
def db7(golden7):
    old = os.getcwd()
    os.chdir(golden7)
    try:
        params, _ = formats.read_shuf(os.path.join(golden7, "fix_k8.shuf"))
        if not os.path.isdir(os.path.join(golden7, "my_ref")):
            from public_kssd_tpu import pipeline

            for gdir, mdir in (("ref_co", "my_ref"), ("qry_co", "my_qry")):
                stat = formats.read_co_stat(os.path.join(golden7, gdir))
                shuf = formats.read_shuf(os.path.join(golden7, "fix_k8.shuf"))[1]
                pipeline.run_stage1(
                    stat.names, os.path.join(golden7, mdir), params, shuf
                )
    finally:
        os.chdir(old)
    _, comps = index_mod.sparse_index_from_co(os.path.join(golden7, "my_ref"))
    oracle = search.compute_shared_counts(
        os.path.join(golden7, "my_qry"), comps, 3, use_device=False
    )
    return golden7, params, comps, oracle


@pytest.mark.parametrize("dp,ref", [(1, 8), (8, 1), (2, 4), (4, 2)])
def test_sharded_counts_equal_oracle(db7, dp, ref):
    root, params, comps, oracle = db7
    devices = np.array(jax.devices()[: dp * ref]).reshape(dp, ref)
    mesh = Mesh(devices, ("dp", "ref"))
    got = sharded_search.sharded_search_counts(
        os.path.join(root, "my_qry"), comps, params, mesh
    )
    np.testing.assert_array_equal(got, oracle)


def test_sharded_db_construction(db7):
    _, params, comps, _ = db7
    key, offsets, gids = sharded_search.merge_components(
        comps, params.comp_code_bits
    )
    assert np.all(np.diff(key.astype(np.int64)) > 0)  # strictly sorted keys
    assert offsets[-1] == gids.size
    db = sharded_search.build_sharded_db(key, offsets, gids, 4, 4)
    # shards partition the key space
    total_keys = sum(
        int((db.uniq[s] != np.iinfo(np.uint64).max).sum()) for s in range(4)
    )
    assert total_keys == key.size
    total_gids = sum(int(db.offsets[s, -1]) for s in range(4))
    assert total_gids == gids.size


@pytest.mark.slow
def test_sharded_search_50k_genome_scale():
    """GTDB-direction scale check (SURVEY C17): a 50k-genome synthetic DB
    sharded 2x4 over the virtual mesh must (a) match the host oracle and
    (b) use a per-device pair capacity ~1/S of the full-DB pair count."""
    import time

    n_ref, n_qry, sk = 50_000, 64, 64
    params = SketchParams(id=9, half_ctx_len=10, half_subctx_len=6, drlevel=3)
    rng = np.random.default_rng(1)
    space = 1 << params.drtuple_bits
    ref = rng.integers(0, space, size=(n_ref, sk), dtype=np.uint64)
    # CSR component directly (single component)
    flat = ref.ravel().astype(np.uint32)
    idx = (np.arange(n_ref + 1, dtype=np.uint64)) * sk
    sp = index_mod.build_component_index(flat, idx, n_ref)

    qry = rng.integers(0, space, size=n_qry * sk, dtype=np.uint64)
    hit = rng.random(qry.size) < 0.5
    qry[hit] = ref.ravel()[rng.integers(0, ref.size, size=int(hit.sum()))]
    qry = qry.astype(np.uint32)
    qidx = (np.arange(n_qry + 1, dtype=np.uint64)) * sk

    qry_dir = None  # bypass the dir API: drive the internals directly
    key, offsets, gids = sharded_search.merge_components(
        [sp], params.comp_code_bits
    )
    db = sharded_search.build_sharded_db(key, offsets, gids, n_ref, 4)
    # capacity sanity: max per-shard pairs well below total pairs
    total_pairs = int(
        np.diff(offsets)[
            np.searchsorted(key, qry.astype(np.uint64))[
                np.isin(qry.astype(np.uint64), key)
            ]
        ].sum()
    )

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("dp", "ref"))
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        formats.write_combco(d, 0, qry, qidx)
        stat = formats.CoStat(
            params_id=params.id, koc=False, kmerlen=params.kmerlen,
            dim_rd_len=params.dim_rd_len, comp_num=1, infile_num=n_qry,
            all_ctx_ct=int(qry.size),
            ctx_ct=np.full(n_qry, sk, np.uint32),
            names=[f"q{i}" for i in range(n_qry)],
        )
        formats.write_co_stat(d, stat)
        t0 = time.perf_counter()
        got = sharded_search.sharded_search_counts(d, [sp], params, mesh)
        dt = time.perf_counter() - t0
    want = count_ops.count_shared_np(
        qry, qidx, sp.uniq_codes, sp.offsets, sp.gids, n_qry, n_ref
    )
    np.testing.assert_array_equal(got, want)
    print(f"\nsharded 50k-genome search: {n_qry * n_ref / dt:.0f} pairs/s "
          f"on 2x4 cpu mesh ({dt:.2f}s, total_pairs={total_pairs})")


@pytest.mark.parametrize("batch", [1, 3])
def test_mesh_query_batching_equals_unbatched(db7, batch):
    """The -m governor inside the sharded path: per-batch psum counting
    into a caller matrix must equal the single-shot result."""
    root, params, comps, oracle = db7
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("dp", "ref"))
    n_qry, n_ref = oracle.shape
    out = np.zeros((n_qry, n_ref), dtype=np.uint32)
    got = sharded_search.sharded_search_counts(
        os.path.join(root, "my_qry"), comps, params, mesh,
        batch=batch, counts_out=out,
    )
    assert got is out
    np.testing.assert_array_equal(out, oracle)


def test_cli_mesh_search_matches_plain(db7, tmp_path):
    """dist --mesh DPxREF through the CLI == plain search output."""
    from public_kssd_tpu import cli, index as index_mod

    root, params, comps, oracle = db7
    old = os.getcwd()
    os.chdir(root)
    try:
        if not os.path.isfile(os.path.join("my_ref", formats.MCO_DSTAT)):
            index_mod.run_stage2("my_ref", "my_ref", 7, dense=False)
        rc = cli.main(["dist", "-r", "my_ref", "-o", str(tmp_path / "plain"),
                       "my_qry"])
        assert rc == 0
        rc = cli.main(["dist", "-r", "my_ref", "-o", str(tmp_path / "mesh"),
                       "--mesh", "2x4", "-m", "1", "my_qry"])
        assert rc == 0
        with open(tmp_path / "plain" / "distance.out") as a, \
             open(tmp_path / "mesh" / "distance.out") as b:
            assert a.read() == b.read()
    finally:
        os.chdir(old)
