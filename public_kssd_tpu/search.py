"""Search: query sketch dir vs reference index dir -> distance.out.

Orchestrates the counting kernel over components and the statistics
printer; mirrors mco_cbdco_nobin_dist (command_dist.c:670-808) +
dist_print_nobin (:1161-1250) including the sharedk_ct.dat artifact
(--keepskf / -f resume, command_dist.c:735-738, 1164, 1249).
"""

from __future__ import annotations

import os

import numpy as np

from public_kssd_tpu import formats, index as index_mod
from public_kssd_tpu.ops import count as count_ops
from public_kssd_tpu.ops import stats as stats_ops


class ShufIdMismatch(ValueError):
    pass


def compute_shared_counts(
    qry_dir: str,
    ref_components: list[index_mod.SparseIndex],
    n_qry: int,
    use_device: bool = True,
) -> np.ndarray:
    """Sum shared-code counts across components -> uint32 [n_qry, n_ref]."""
    n_ref = ref_components[0].n_genomes
    counts = np.zeros((n_qry, n_ref), dtype=np.uint32)
    for c, sp in enumerate(ref_components):
        codes, idx = formats.read_combco(qry_dir, c)
        counts += count_ops.count_shared(codes, idx, sp, n_qry, use_device)
    return counts


def search(
    ref_dir: str,
    qry_dir: str,
    out_dir: str,
    opts: stats_ops.OutputOptions | None = None,
    use_device: bool = True,
    keep_shared_kmer: bool = False,
    shared_kmer_path: str | None = None,
    mesh=None,
    component_sz: int = 7,
) -> str:
    """Full search -> ``<out_dir>/distance.out``; returns its path.

    ``shared_kmer_path`` (-f) skips counting and reprints statistics from
    a saved sharedk_ct.dat matrix; ``keep_shared_kmer`` (--keepskf)
    retains the matrix file after printing. With ``mesh`` (a
    jax.sharding.Mesh with axes dp/ref) counting runs DB-sharded across
    devices with psum merging.
    """
    opts = opts or stats_ops.OutputOptions()
    mco_stat = formats.read_mco_stat(ref_dir)
    qry_stat = formats.read_co_stat(qry_dir)
    if qry_stat.params_id != mco_stat.params_id:
        raise ShufIdMismatch(
            f"qry shuf_id {qry_stat.params_id} != ref shuf_id {mco_stat.params_id}"
        )
    if qry_stat.comp_num != mco_stat.comp_num:
        raise ValueError(
            f"qry comp_num {qry_stat.comp_num} != ref comp_num {mco_stat.comp_num}"
        )
    os.makedirs(out_dir, exist_ok=True)
    skf = shared_kmer_path or os.path.join(out_dir, "sharedk_ct.dat")
    if shared_kmer_path:
        counts = (
            np.fromfile(skf, dtype="<u4")
            .reshape(qry_stat.infile_num, mco_stat.infile_num)
        )
    else:
        _, comps = index_mod.load_sparse_index(ref_dir)
        if mesh is not None:
            from public_kssd_tpu.config import SketchParams
            from public_kssd_tpu.parallel import sharded_search

            params = SketchParams(
                id=mco_stat.params_id,
                half_ctx_len=mco_stat.kmerlen // 2,
                half_subctx_len=min(mco_stat.kmerlen // 2, 7),
                drlevel=mco_stat.dim_rd_len // 2,
                component_sz=component_sz,
            )
            counts = sharded_search.sharded_search_counts(
                qry_dir, comps, params, mesh
            )
        else:
            counts = compute_shared_counts(
                qry_dir, comps, qry_stat.infile_num, use_device
            )
        counts.astype("<u4").tofile(skf)

    out_path = os.path.join(out_dir, "distance.out")
    stats_ops.write_distance_out(
        out_path,
        counts,
        mco_stat.ctx_ct,
        qry_stat.ctx_ct,
        mco_stat.names,
        qry_stat.names,
        qry_stat.kmerlen,
        qry_stat.dim_rd_len,
        opts,
    )
    if not keep_shared_kmer and not shared_kmer_path:
        os.remove(skf)
    return out_path
