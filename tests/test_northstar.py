"""North-star correctness config (BASELINE.json): bit-identical output vs
the reference binary on the REAL test_fna fixture.

Mirrors the reference Quick-Tutorial (README.md:33-45) with one shared
generated ``.shuf`` (k=10, s=6, l=3):

  kssd dist -L L3K10.shuf -o ref_co  test_fna/seqs1     (20 genomes)
  kssd dist -o ref_co ref_co                            (stage II index)
  kssd dist -L L3K10.shuf -o qry_co  test_fna/seqs2     (11 genomes)
  kssd dist -r ref_co -o distout qry_co                 (search + stats)

and asserts byte-identical sketches and line-identical distance.out.
The shared ``.shuf`` is a Feistel-encoded table written by our framework
(shufspace.make_feistel_dim) so the same file drives both the reference's
table-gather path and our computed gather-free kernel — the interop
contract of shufspace.py.

Slow: builds the reference with gcc and writes its 2 GiB dense
mco.index.0 (co2mco.c:58-62). Run with ``pytest -m slow``.
"""

import os
import shutil
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

from conftest import assert_co_stat_equal, assert_files_equal  # noqa: E402

from public_kssd_tpu import formats, index as index_mod, pipeline, search, shufspace  # noqa: E402
from public_kssd_tpu.config import SketchParams  # noqa: E402

REF_SRC = "/root/reference"
TEST_FNA = os.path.join(REF_SRC, "test_fna")

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def ref_exe(tmp_path_factory):
    if not os.path.isdir(TEST_FNA):
        pytest.skip("reference test_fna fixture not available")
    bdir = str(tmp_path_factory.mktemp("refbuild"))
    for f in os.listdir(REF_SRC):
        if f.endswith((".c", ".h")):
            shutil.copy(os.path.join(REF_SRC, f), bdir)
    exe = os.path.join(bdir, "kssd_csz7")
    subprocess.run(
        "gcc -std=gnu11 -Wno-unused-result -O3 -DCOMPONENT_SZ=7 *.c "
        f"-o {exe} -lz -fopenmp -lm",
        shell=True, check=True, cwd=bdir,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    return exe


@pytest.fixture(scope="module")
def northstar(ref_exe, tmp_path_factory):
    """Run the whole tutorial with the reference binary once."""
    root = str(tmp_path_factory.mktemp("northstar"))
    params = SketchParams.create(k=10, drlevel=3, subk=6, seed=33)
    shuf_path = os.path.join(root, "L3K10.shuf")
    formats.write_shuf(shuf_path, params, shufspace.make_feistel_dim(params))

    def ref(cmd):
        subprocess.run(
            f"{ref_exe} {cmd}", shell=True, check=True, cwd=root,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )

    ref(f"dist -L {shuf_path} -o ref_co {TEST_FNA}/seqs1")
    ref(f"dist -L {shuf_path} -o qry_co {TEST_FNA}/seqs2")
    ref("dist -o ref_co ref_co")
    ref("dist -r ref_co -o distout qry_co")
    return root, params, shuf_path


def test_northstar_test_fna_parity(northstar):
    root, params, shuf_path = northstar
    rparams, table = formats.read_shuf(shuf_path, component_sz=7)
    assert rparams == params
    computed = shufspace.detect(rparams, table)
    assert computed is not None, ".shuf must round-trip as a computed space"

    old = os.getcwd()
    os.chdir(root)
    try:
        # --- stage I on both input sets, same (shuffled) order as the
        # reference run recorded in its own cofiles.stat ----------------
        for gdir, mdir in (("ref_co", "my_ref"), ("qry_co", "my_qry")):
            stat = formats.read_co_stat(gdir)
            pipeline.run_stage1(stat.names, mdir, rparams, computed)
            assert_files_equal(
                os.path.join(gdir, "combco.0"),
                os.path.join(mdir, "combco.0"),
            )
            assert_files_equal(
                os.path.join(gdir, "combco.index.0"),
                os.path.join(mdir, "combco.index.0"),
            )
            assert_co_stat_equal(gdir, mdir)

        # --- stage II + search --------------------------------------
        index_mod.run_stage2("my_ref", "my_ref", 7)
        assert_files_equal(
            os.path.join("ref_co", "mco.0"), os.path.join("my_ref", "mco.0")
        )
        search.search("my_ref", "my_qry", "my_distout")
        with open(os.path.join("distout", "distance.out")) as f:
            want = f.read()
        with open(os.path.join("my_distout", "distance.out")) as f:
            got = f.read()
        assert want.count("\n") == 221  # header + 11*20 rows
        assert got == want
    finally:
        os.chdir(old)


@pytest.fixture(scope="module")
def allpairs_env(ref_exe, tmp_path_factory):
    """BASELINE.json config 2: ~100 bacterial-like genomes, -k 8 -L 3,
    ref-vs-ref all-pairs matrix with CIs."""
    import gzip

    import numpy as np

    root = str(tmp_path_factory.mktemp("allpairs"))
    gd = os.path.join(root, "genomes")
    os.makedirs(gd)
    rng = np.random.default_rng(17)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    base = rng.integers(0, 4, size=200_000).astype(np.uint8)
    for i in range(100):
        g = base.copy()
        mut = rng.integers(0, g.size, size=rng.integers(1000, 40_000))
        g[mut] = (g[mut] + rng.integers(1, 4, size=mut.size)) % 4
        with gzip.open(os.path.join(gd, f"g{i:03d}.fa.gz"), "wb") as f:
            f.write(b">g%d\n" % i + lut[g].tobytes() + b"\n")
    params = SketchParams.create(k=8, drlevel=3, seed=44)  # subk=6
    shuf_path = os.path.join(root, "L3K8.shuf")
    formats.write_shuf(shuf_path, params, shufspace.make_feistel_dim(params))
    return root, shuf_path


def test_allpairs_matrix_parity(ref_exe, allpairs_env):
    root, shuf_path = allpairs_env

    def ref(cmd):
        subprocess.run(f"{ref_exe} {cmd}", shell=True, check=True, cwd=root,
                       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)

    ref(f"dist -L {shuf_path} -o ref_co ./genomes")
    ref("dist -o ref_co ref_co")
    ref("dist -r ref_co -o distout ref_co")  # all-pairs, CIs on by default
    old = os.getcwd()
    os.chdir(root)
    try:
        rparams, table = formats.read_shuf(shuf_path, component_sz=7)
        computed = shufspace.detect(rparams, table)
        stat = formats.read_co_stat("ref_co")
        pipeline.run_stage1(stat.names, "my_ref", rparams, computed)
        assert_files_equal("ref_co/combco.0", "my_ref/combco.0")
        index_mod.run_stage2("my_ref", "my_ref", 7)
        search.search("my_ref", "my_ref", "my_out")
        with open("distout/distance.out") as f:
            want = f.read()
        with open("my_out/distance.out") as f:
            got = f.read()
        assert want.count("\n") == 1 + 100 * 100
        assert got == want
    finally:
        os.chdir(old)


def test_streaming_fastq_k10_l4_parity(ref_exe, tmp_path_factory):
    """BASELINE.json config 4: gzipped read files, on-the-fly 2-bit pack +
    sketch at k=20 bases (-k 10 -L 4), byte-identical sketches."""
    import gzip

    import numpy as np

    root = str(tmp_path_factory.mktemp("fq20"))
    rng = np.random.default_rng(23)
    lut = np.frombuffer(b"ACGTN", dtype=np.uint8)
    paths = []
    for s in range(2):
        p = os.path.join(root, f"reads{s}.fq.gz")
        paths.append(p)
        with gzip.open(p, "wb") as f:
            for i in range(20_000):
                n = int(rng.integers(80, 120))
                seq = lut[rng.integers(0, 5, size=n)].tobytes()
                qual = rng.integers(35, 74, size=n).astype(np.uint8).tobytes()
                f.write(b"@r%d\n%s\n+\n%s\n" % (i, seq, qual))
    params = SketchParams.create(k=10, drlevel=4, seed=55)  # subk=7
    shuf_path = os.path.join(root, "L4K10.shuf")
    formats.write_shuf(shuf_path, params, shufspace.make_feistel_dim(params))
    subprocess.run(
        f"{ref_exe} dist -L {shuf_path} -o ref_co {' '.join(paths)}",
        shell=True, check=True, cwd=root,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    old = os.getcwd()
    os.chdir(root)
    try:
        rparams, table = formats.read_shuf(shuf_path, component_sz=7)
        computed = shufspace.detect(rparams, table)
        stat = formats.read_co_stat("ref_co")
        # force the bounded-RAM streaming parse path on the same files
        import public_kssd_tpu.pipeline as pl

        old_thresh = pl.STREAM_BYTES
        pl.STREAM_BYTES = 1
        try:
            pipeline.run_stage1(stat.names, "my_co", rparams, computed)
        finally:
            pl.STREAM_BYTES = old_thresh
        assert_files_equal("ref_co/combco.0", "my_co/combco.0")
        assert_files_equal("ref_co/combco.index.0", "my_co/combco.index.0")
        assert_co_stat_equal("ref_co", "my_co")
    finally:
        os.chdir(old)
