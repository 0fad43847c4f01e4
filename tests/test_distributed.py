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


def test_two_process_jax_distributed(tmp_path):
    """REAL multi-process jax.distributed: two OS processes with a
    coordinator each sketch their file shard (shard id = process index
    from jax.distributed), then the shards merge and must equal a
    single-process run. CPU backend, loopback coordinator."""
    import socket
    import subprocess
    import sys
    import textwrap

    import gzip

    # tiny deterministic inputs
    data = tmp_path / "genomes"
    data.mkdir()
    rng = np.random.default_rng(11)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    for i in range(6):
        seq = lut[rng.integers(0, 4, size=40_000).astype(np.uint8)].tobytes()
        with gzip.open(data / f"g{i}.fasta.gz", "wb") as f:
            f.write(b">g%d\n" % i + seq + b"\n")
    files = [str(data / f"g{i}.fasta.gz") for i in range(6)]

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    root = str(tmp_path / "shard_root")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    worker = tmp_path / "worker.py"
    worker.write_text(textwrap.dedent(f"""
        import os, sys
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.pop("XLA_FLAGS", None)
        sys.path.insert(0, {repo!r})
        from public_kssd_tpu.parallel import distributed
        pidx, pcount = distributed.initialize({coord!r}, 2, int(sys.argv[1]))
        assert pcount == 2
        from public_kssd_tpu import shufspace
        from public_kssd_tpu.config import SketchParams
        params = SketchParams.create(k=8, drlevel=2, subk=5, seed=5)
        shuf = shufspace.ComputedShuf(params.id, params.half_subctx_len)
        files = {files!r}
        distributed.sketch_shard(files, {root!r}, params, shuf,
                                 shard_id=pidx, n_shards=pcount)
    """))
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen([sys.executable, str(worker), str(i)], env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for i in range(2)
    ]
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err.decode()[-2000:]

    merged = str(tmp_path / "merged")
    distributed.merge_shards(root, merged)

    from public_kssd_tpu import shufspace
    from public_kssd_tpu.config import SketchParams
    params = SketchParams.create(k=8, drlevel=2, subk=5, seed=5)
    shuf = shufspace.ComputedShuf(params.id, params.half_subctx_len)
    rr = [f for s in range(2) for f in distributed.shard_files(files, 2, s)]
    single = str(tmp_path / "single")
    pipeline.run_stage1(rr, single, params, shuf)
    a, b = formats.read_co_stat(merged), formats.read_co_stat(single)
    assert a.names == b.names
    assert a.ctx_ct.tolist() == b.ctx_ct.tolist()
    ca, ia = formats.read_combco(merged, 0)
    cb, ib = formats.read_combco(single, 0)
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_array_equal(ca, cb)
