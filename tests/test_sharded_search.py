"""Multi-device sharding tests on the 8-virtual-CPU-device mesh:
shard-merged counts must equal single-device counts exactly."""

import os

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from public_kssd_tpu import formats, index as index_mod, search
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
