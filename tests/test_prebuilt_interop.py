"""CSZ=8 interop vs the PREBUILT reference binary.

``/root/reference/kssd`` was compiled with ``COMPONENT_SZ=8`` (prints
``Unit_space_size = 8``; the repo Makefile's default build uses 7 —
SURVEY.md §0 verified-ground-truth note), so it exercises the runtime
``--component-sz`` geometry against a binary this repo never compiled.
A k=12 / l=3 space (k−l = 9 > 8) forces a REAL component split
(16^(k−l−CSZ) = 16 components at CSZ=8, vs 256 at CSZ=7), covering the
drtuple→(component, id) split (iseq2comem.c:540-543) where CSZ actually
matters. The 34 GiB dense stage II index at CSZ=8 (BASELINE.md measured
row) is deliberately skipped; stage I artifacts and the set-op pan dirs
must be byte-identical with a shared generated ``.shuf``.

Slow: sketches real ~5 Mb test_fna genomes at k=12 on the CPU backend.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

from conftest import assert_files_equal  # noqa: E402

from public_kssd_tpu import formats, pipeline, setops, shufspace  # noqa: E402
from public_kssd_tpu.config import SketchParams  # noqa: E402

PREBUILT = "/root/reference/kssd"
TEST_FNA = "/root/reference/test_fna"
CSZ = 8

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def prebuilt_run(tmp_path_factory):
    if not (os.path.isfile(PREBUILT) and os.access(PREBUILT, os.X_OK)):
        pytest.skip("prebuilt reference binary not available")
    if not os.path.isdir(TEST_FNA):
        pytest.skip("test_fna fixture not available")
    root = str(tmp_path_factory.mktemp("csz8"))
    params = SketchParams.create(k=12, drlevel=3, subk=6, seed=77)
    shuf_path = os.path.join(root, "L3K12.shuf")
    formats.write_shuf(shuf_path, params, shufspace.make_feistel_dim(params))

    # 3 genomes keep the k=12 CPU sketching under a minute
    genomes = sorted(
        os.path.join(TEST_FNA, "seqs1", f)
        for f in os.listdir(os.path.join(TEST_FNA, "seqs1"))
    )[:3]
    glist = os.path.join(root, "genomes.txt")
    with open(glist, "w") as f:
        f.write("\n".join(genomes) + "\n")

    def ref(cmd) -> str:
        out = subprocess.run(
            f"{PREBUILT} {cmd}", shell=True, check=True, cwd=root,
            capture_output=True, text=True,
        )
        return out.stdout + out.stderr

    # confirm the binary really is the CSZ=8 build before comparing:
    # the no-args banner prints Unit_space_size (global_wrapper.c:117)
    probe = subprocess.run(
        [PREBUILT], capture_output=True, text=True, cwd=root
    )
    assert "Unit_space_size = 8" in probe.stdout + probe.stderr, (
        (probe.stdout + probe.stderr)[:500]
    )
    ref(f"dist -L {shuf_path} -l {glist} -o ref_co")
    ref("set -u -o ref_pan ref_co")
    return root, params, shuf_path, genomes


def test_stage1_bytes_identical_at_csz8(prebuilt_run):
    root, params, shuf_path, genomes = prebuilt_run
    my_params, shuf = formats.read_shuf(shuf_path, component_sz=CSZ)
    assert my_params.component_num == 16  # the split actually engages
    out = os.path.join(root, "my_co")
    ref_dir = os.path.join(root, "ref_co")
    stat = formats.read_co_stat(ref_dir)
    # the reference randomises its genome processing order at runtime
    # (shuffleN seeded by srand(time), command_dist.c:75,168) and writes
    # combco in THAT order; its cofiles.stat records it — sketch in the
    # same order for byte parity (same approach as test_northstar)
    assert sorted(stat.names) == sorted(genomes)
    pipeline.run_stage1(stat.names, out, my_params, shuf)
    assert stat.comp_num == 16
    for c in range(stat.comp_num):
        assert_files_equal(
            os.path.join(ref_dir, f"combco.{c}"),
            os.path.join(out, f"combco.{c}"),
            f"combco.{c}",
        )
        assert_files_equal(
            os.path.join(ref_dir, f"combco.index.{c}"),
            os.path.join(out, f"combco.index.{c}"),
            f"combco.index.{c}",
        )
    mine = formats.read_co_stat(out)
    assert mine.comp_num == stat.comp_num
    assert mine.kmerlen == stat.kmerlen
    assert mine.all_ctx_ct == stat.all_ctx_ct
    np.testing.assert_array_equal(mine.ctx_ct, stat.ctx_ct)


def test_set_union_bytes_identical_at_csz8(prebuilt_run):
    root, params, shuf_path, genomes = prebuilt_run
    my_co = os.path.join(root, "my_co")
    assert os.path.isdir(my_co), "stage I test must run first"
    my_pan = os.path.join(root, "my_pan")
    setops.sketch_union(my_co, my_pan)
    ref_pan = os.path.join(root, "ref_pan")
    stat = formats.read_co_stat(ref_pan)
    for c in range(stat.comp_num):
        assert_files_equal(
            os.path.join(ref_pan, f"pan.{c}"),
            os.path.join(my_pan, f"pan.{c}"),
            f"pan.{c}",
        )
