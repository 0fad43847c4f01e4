"""Oracle helper: re-sketch a single decoded 2k-mer with pure Python
bit-math (the forward transform of iseq2comem.c:245-253)."""

from __future__ import annotations

import numpy as np

from public_kssd_tpu.config import SketchParams


def resketch_unituple(uni: int, p: SketchParams, shuffled_dim: np.ndarray):
    """drtuple of a canonical k-mer value, or None if filtered out."""
    dim_tup = (uni & p.domask) >> (p.half_outctx_len * 2)
    pf = int(shuffled_dim[dim_tup])
    if pf >= p.dim_end or pf < p.dim_start:
        return None
    pf -= p.dim_start
    return (
        ((uni & p.undomask)
         + ((uni & ((1 << (p.half_outctx_len * 2)) - 1))
            << (p.TL * 2 - p.half_outctx_len * 4)))
        >> (p.drlevel * 4)
    ) + pf
