"""Synthetic GTDB-shaped sketch databases, written through the REAL
on-disk artifact path (combco.* + cofiles.stat, formats.py), for scale
benchmarks and capacity planning.

The flagship scale target is the reference's 317k-genome GTDB species
database (SURVEY.md C17; /root/reference/data/specuq_grp_gtdb317kgenome_
kssd, 65,702 species groups survive upstream) at the measured ~1,300
codes per genome for the k=10/l=3 default geometry (BASELINE.md).
Everything downstream of these files — stage II CSR build, index load,
-m governed or mesh-sharded search, composite — exercises the exact
code paths a real GTDB run uses.
"""

from __future__ import annotations

import os

import numpy as np

from public_kssd_tpu import formats

SPACE_BITS = 28  # 4*(k-l) at k=10, l=3 — in-component id space at CSZ=7


def build_synth_ref(
    out_dir: str,
    n_ref: int,
    sketch_sz: int,
    seed: int = 0,
    space_bits: int = SPACE_BITS,
    params_id: int = 9,
    kmerlen: int = 20,
    dim_rd_len: int = 6,
) -> None:
    """Write a synthetic reference sketch dir (single component)."""
    if os.path.isfile(os.path.join(out_dir, formats.CO_DSTAT)):
        return  # cached
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    total = n_ref * sketch_sz
    codes = rng.integers(0, 1 << space_bits, size=total, dtype=np.uint32)
    index = np.arange(n_ref + 1, dtype=np.uint64) * sketch_sz
    formats.write_combco(out_dir, 0, codes, index)
    formats.write_co_stat(out_dir, formats.CoStat(
        params_id=params_id, koc=False, kmerlen=kmerlen,
        dim_rd_len=dim_rd_len, comp_num=1, infile_num=n_ref,
        all_ctx_ct=int(total),
        ctx_ct=np.full(n_ref, sketch_sz, np.uint32),
        names=[f"g{i:06d}" for i in range(n_ref)],
    ))


def build_synth_queries(
    out_dir: str,
    ref_dir: str,
    n_qry: int,
    sketch_sz: int,
    hit_rate: float = 0.3,
    seed: int = 1,
    koc: bool = False,
    space_bits: int = SPACE_BITS,
    focus_refs: int = 8,
) -> None:
    """Write a query sketch dir whose codes hit the reference DB at
    ``hit_rate``, CONCENTRATED in ``focus_refs`` genomes per query
    (metagenome-shaped: a sample contains a handful of species, so
    per-ref match counts clear composite's MIN_KM_S gate). Drawn from
    the ref combco via memmap — no second copy of the DB in RAM. With
    ``koc`` adds uint16 abundance counters."""
    if os.path.isfile(os.path.join(out_dir, formats.CO_DSTAT)):
        return  # cached
    os.makedirs(out_dir, exist_ok=True)
    ref_stat = formats.read_co_stat(ref_dir)
    ref_codes = np.memmap(
        os.path.join(ref_dir, "combco.0"), dtype="<u4", mode="r"
    )
    rng = np.random.default_rng(seed)
    total = n_qry * sketch_sz
    codes = rng.integers(0, 1 << space_bits, size=total, dtype=np.uint32)
    hit = rng.random(total) < hit_rate
    ref_sk = int(ref_stat.ctx_ct[0])  # synth refs are uniform-size
    picks = rng.integers(0, ref_stat.infile_num, size=(n_qry, focus_refs))
    which = rng.integers(0, focus_refs, size=(n_qry, sketch_sz))
    gsel = np.take_along_axis(picks, which, axis=1)
    offs = rng.integers(0, ref_sk, size=(n_qry, sketch_sz))
    src = (gsel.astype(np.int64) * ref_sk + offs).ravel()
    codes[hit] = ref_codes[src[hit]]
    index = np.arange(n_qry + 1, dtype=np.uint64) * sketch_sz
    abund = (
        rng.integers(1, 50, size=total).astype(np.uint16) if koc else None
    )
    formats.write_combco(out_dir, 0, codes, index, abund)
    formats.write_co_stat(out_dir, formats.CoStat(
        params_id=ref_stat.params_id, koc=koc, kmerlen=ref_stat.kmerlen,
        dim_rd_len=ref_stat.dim_rd_len, comp_num=1, infile_num=n_qry,
        all_ctx_ct=int(total),
        ctx_ct=np.full(n_qry, sketch_sz, np.uint32),
        names=[f"q{i:04d}" for i in range(n_qry)],
    ))
