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
