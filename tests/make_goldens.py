"""Regenerate the golden fixtures under tests/golden/ from the REFERENCE
C binary (one-time; outputs are committed).

Usage:
    python tests/make_goldens.py <reference_src_dir> [workdir]

Builds the reference twice (COMPONENT_SZ=7 — the Makefile default — and
COMPONENT_SZ=4 for a small multi-component config), runs the full command
surface over the deterministic synthetic inputs of fixture_data.py, and
packs the outputs into tests/golden/csz7.tar.gz + csz4.tar.gz.

Large dense index files (mco.index.<c> at CSZ=7 is 2 GiB) are replaced by
<name>.sha256 stamps inside the archive.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import subprocess
import sys
import tarfile

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
import fixture_data  # noqa: E402

BIG_FILE_LIMIT = 4 << 20  # hash instead of committing files above this


def sh(cmd: str, cwd: str) -> None:
    subprocess.run(cmd, shell=True, check=True, cwd=cwd,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)


def sh_out(cmd: str, cwd: str) -> bytes:
    return subprocess.run(
        cmd, shell=True, check=True, cwd=cwd,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
    ).stdout


def build_reference(src: str, workdir: str) -> dict[int, str]:
    bdir = os.path.join(workdir, "refbuild")
    os.makedirs(bdir, exist_ok=True)
    for f in os.listdir(src):
        if f.endswith((".c", ".h")) or f == "Makefile":
            shutil.copy(os.path.join(src, f), bdir)
    out = {}
    for csz in (7, 4):
        exe = os.path.join(bdir, f"kssd_csz{csz}")
        if not os.path.exists(exe):
            sh(
                "gcc -std=gnu11 -Wno-unused-result -O3 -lz -fopenmp "
                f"-DCOMPONENT_SZ={csz} *.c -o {exe} -lm",
                bdir,
            )
        out[csz] = exe
    return out


def run_config(k: str, root: str, shuf: str, csz: int, with_index: bool) -> None:
    """Run the whole reference command surface in ``root``.

    with_index=False for multi-component configs: the reference's
    combco2mco double-frees stale postings rows whenever comp_num > 1
    (co2mco.c:46-70: ``mco[ind]`` is never reset between components), so
    stage II/search goldens only exist for single-component configs.
    """
    sh(f"{k} dist -L {shuf} -o ref_co ./genomes", root)
    sh(f"{k} dist -L {shuf} -o qry_co ./qry", root)
    if with_index:
        sh(f"{k} dist -o ref_co ref_co", root)
        sh(f"{k} dist -r ref_co -o distout qry_co", root)
        for name, flags in [
            ("dv_m1", "-M 1"), ("dv_o0", "-O 0"), ("dv_o1", "-O 1"),
            ("dv_n2", "-N 2"), ("dv_corr", "--correction 1"),
            ("dv_d02", "-D 0.2"),
        ]:
            sh(f"{k} dist -r ref_co -o {name} {flags} qry_co", root)
    # set ops
    sh(f"{k} set -u -o set_union ref_co", root)
    sh(f"{k} set -q -o set_uniqu ref_co", root)
    sh(f"{k} set -s set_union -o set_sub qry_co", root)
    sh(f"{k} set -i set_union -o set_int qry_co", root)
    sh(f"{k} set -c -o set_comb set_union set_uniqu", root)
    sh(f"{k} set -g tax.tsv -o set_grp ref_co", root)
    with open(os.path.join(root, "set_names.txt"), "wb") as f:
        f.write(sh_out(f"{k} set -P ref_co", root))
    # reverse
    os.makedirs(os.path.join(root, "rev_out"), exist_ok=True)
    sh(f"{k} reverse -L {shuf} -o rev_out qry_co", root)
    # fastq variants
    sh(f"{k} dist -L {shuf} -o fq_plain reads0.fq.gz reads1.fq.gz", root)
    sh(f"{k} dist -L {shuf} -n 2 -o fq_n2 reads0.fq.gz reads1.fq.gz", root)
    sh(f"{k} dist -L {shuf} -Q 40 -o fq_q40 reads0.fq.gz reads1.fq.gz", root)
    sh(f"{k} dist -L {shuf} -A -p 1 -o fq_koc reads0.fq.gz reads1.fq.gz", root)
    sh(f"{k} dist -L {shuf} -A -p 1 -o deep_koc deep.fq.gz", root)
    # byread (raw files) + byread reverse
    sh(f"{k} dist -L {shuf} --byread -o fa_byread g0.fasta", root)
    sh(f"{k} dist -L {shuf} --byread -o fq_byread reads0.fq", root)
    with open(os.path.join(root, "rev_byread.txt"), "wb") as f:
        f.write(sh_out(f"{k} reverse -L {shuf} -b fa_byread", root))
    # composite
    with open(os.path.join(root, "composite_report.txt"), "wb") as f:
        f.write(sh_out(f"{k} composite -r ref_co -q fq_koc -p 1", root))
    with open(os.path.join(root, "composite_deep_report.txt"), "wb") as f:
        f.write(sh_out(f"{k} composite -r ref_co -q deep_koc -p 1", root))
    sh(f"{k} composite -r ref_co -q fq_koc -p 1 -b", root)
    sh(f"{k} composite -r ref_co -q deep_koc -p 1 -b", root)
    sh(f"{k} composite -r ref_co -i", root)
    for mode in (0, 1, 2):
        with open(os.path.join(root, f"abv_s{mode}.txt"), "wb") as f:
            f.write(sh_out(
                f"{k} composite -r ref_co -s {mode} deep.fq.gz.abv", root
            ))
    with open(os.path.join(root, "abv_dump.txt"), "wb") as f:
        f.write(sh_out(
            f"{k} composite -d ref_co/abundance_Vec/deep.fq.gz.abv", root
        ))
    # combine queries
    sh(f"{k} dist -o comb_q qry_co qry_co", root)


def prune_and_pack(root: str, out_tar: str) -> None:
    """Replace big files with sha256 stamps; drop inputs; tar the rest."""
    for dirpath, _dirnames, filenames in os.walk(root):
        for fn in filenames:
            p = os.path.join(dirpath, fn)
            if fn.endswith(".shuf"):
                continue  # tests need the exact permutation bytes
            if os.path.getsize(p) > BIG_FILE_LIMIT:
                h = hashlib.sha256()
                with open(p, "rb") as f:
                    for chunk in iter(lambda: f.read(1 << 24), b""):
                        h.update(chunk)
                with open(p + ".sha256", "w") as f:
                    f.write(h.hexdigest() + "\n")
                os.remove(p)
    # inputs are regenerated by fixture_data; don't commit them
    for junk in ("genomes", "qry", "reads0.fq.gz", "reads1.fq.gz",
                 "deep.fq.gz", "g0.fasta", "reads0.fq"):
        p = os.path.join(root, junk)
        if os.path.isdir(p):
            shutil.rmtree(p)
        elif os.path.exists(p):
            os.remove(p)
    with tarfile.open(out_tar, "w:gz") as tar:
        tar.add(root, arcname=os.path.basename(root))


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
    workdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/golden_gen"
    os.makedirs(workdir, exist_ok=True)
    exes = build_reference(src, workdir)
    golden_dir = os.path.join(HERE, "golden")
    os.makedirs(golden_dir, exist_ok=True)
    for csz, kdim in ((7, 8), (4, 7)):
        root = os.path.join(workdir, f"csz{csz}")
        shutil.rmtree(root, ignore_errors=True)
        os.makedirs(root)
        fixture_data.make_all(root)
        shuf = f"fix_k{kdim}.shuf"
        sh(f"{exes[csz]} shuffle -k {kdim} -s 5 -l 2 -o {root}/fix_k{kdim}", root)
        run_config(exes[csz], root, shuf, csz, with_index=(csz == 7))
        prune_and_pack(root, os.path.join(golden_dir, f"csz{csz}.tar.gz"))
    print("goldens written to", golden_dir)


if __name__ == "__main__":
    main()
