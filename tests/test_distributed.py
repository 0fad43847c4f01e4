"""Sharded-artifact tests: N sketch shards merged == single-run sketches
(code sets per genome), manifest restartability."""

import os

import numpy as np

from public_kssd_tpu import formats, pipeline
from public_kssd_tpu.parallel import distributed


def test_shard_merge_equals_single_run(golden7, in_dir):
    with in_dir(golden7):
        params, shuf = formats.read_shuf("fix_k8.shuf")
        stat = formats.read_co_stat("ref_co")
        files = stat.names
        root = "shard_root"
        for s in range(2):
            distributed.sketch_shard(
                files, root, params, shuf, shard_id=s, n_shards=2
            )
        merged = distributed.merge_shards(root, "merged_co")
        # single run over the same (round-robin-reordered) file list
        rr = [f for s in range(2) for f in distributed.shard_files(files, 2, s)]
        pipeline.run_stage1(rr, "single_co", params, shuf)
        a = formats.read_co_stat("merged_co")
        b = formats.read_co_stat("single_co")
        assert a.names == b.names
        assert a.ctx_ct.tolist() == b.ctx_ct.tolist()
        assert a.all_ctx_ct == b.all_ctx_ct
        ca, ia = formats.read_combco("merged_co", 0)
        cb, ib = formats.read_combco("single_co", 0)
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(ca, cb)


def test_shard_restart_idempotent(golden7, in_dir):
    with in_dir(golden7):
        params, shuf = formats.read_shuf("fix_k8.shuf")
        stat = formats.read_co_stat("qry_co")
        root = "shard_root2"
        d1 = distributed.sketch_shard(
            stat.names, root, params, shuf, shard_id=0, n_shards=1
        )
        mtime = os.path.getmtime(os.path.join(d1, "combco.0"))
        d2 = distributed.sketch_shard(
            stat.names, root, params, shuf, shard_id=0, n_shards=1
        )
        assert d1 == d2
        assert os.path.getmtime(os.path.join(d2, "combco.0")) == mtime
        man = distributed.read_manifest(root)
        assert man["shards"]["0"]["files"] == stat.names
