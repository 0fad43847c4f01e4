"""Benchmark: genomes sketched per second per chip (BASELINE.md config).

Workload mirrors the reference's measured baseline (BASELINE.md: 20 x
~5.3 Mb gzipped fasta, k=10/s=6/l=3, COMPONENT_SZ=7 -> 3.3 s wall = ~6
genomes/s on a 64-vCPU x86 VM): end-to-end sketching from gzipped fasta
files on disk to per-genome sketch code sets, on ONE chip.

Prints one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N/6.0}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_GENOMES_PER_S = 6.0  # BASELINE.md stage I measurement
GENOME_MB = 5.3
N_TIMED = 10
DATA_DIR = "/tmp/kssd_bench_data"


def _make_data() -> list[str]:
    import gzip

    os.makedirs(DATA_DIR, exist_ok=True)
    paths = []
    rng = np.random.default_rng(123)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    for i in range(N_TIMED + 2):
        p = os.path.join(DATA_DIR, f"bench_{i}.fasta.gz")
        paths.append(p)
        if os.path.exists(p):
            continue
        n = int(GENOME_MB * 1e6)
        seq = lut[rng.integers(0, 4, size=n).astype(np.uint8)]
        lines = []
        width = 80
        header = f">chr1 synthetic bench genome {i}\n".encode()
        body = seq.tobytes()
        chunks = [body[j : j + width] for j in range(0, len(body), width)]
        with gzip.open(p, "wb", compresslevel=1) as f:
            f.write(header + b"\n".join(chunks) + b"\n")
    return paths


def main() -> None:
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "kssd_tpu_jax_cache"),
    )
    import public_kssd_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )

    from public_kssd_tpu import hashdedup, pipeline, shufspace
    from public_kssd_tpu.config import SketchParams
    from public_kssd_tpu.ops import sketch as sketch_ops

    params = SketchParams(id=1, half_ctx_len=10, half_subctx_len=6, drlevel=3)
    # the framework's default shuffle space: computed Feistel permutation
    # (gather-free sketch kernel; identical .shuf interop — shufspace.py)
    shuffled_dev = shufspace.ComputedShuf(params.id, params.half_subctx_len)

    paths = _make_data()

    parse_opts = pipeline.SketchOptions()

    def sketch_batch(batch: list[str]) -> int:
        streams = [
            s for _, _, s in pipeline.parsed_streams(batch, parse_opts)
        ]
        kept = sketch_ops.sketch_codes_multi(streams, shuffled_dev, params)
        return sum(hashdedup.dedup_sorted(k).size for k in kept)

    # warmup: trigger all bucket compilations
    sketch_batch(paths[:2])

    t0 = time.perf_counter()
    total_codes = sketch_batch(paths[2 : 2 + N_TIMED])
    dt = time.perf_counter() - t0

    genomes_per_s = N_TIMED / dt
    print(
        json.dumps(
            {
                "metric": "genomes_sketched_per_s_per_chip",
                "value": round(genomes_per_s, 3),
                "unit": "genomes/s (5.3Mb gz fasta, k=10 s=6 l=3)",
                "vs_baseline": round(genomes_per_s / BASELINE_GENOMES_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
