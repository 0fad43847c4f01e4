"""Benchmarks vs BASELINE.md on ONE chip.

1. TPU correctness gate: the Pallas sketch kernel must agree with the
   jnp path on the real chip (Mosaic lowering quirks do not reproduce in
   interpret mode — see ops/pallas_sketch.py).
2. Pair counting: shared-k-mer counts on a synthetic 1k-query x 10k-ref
   DB (the search hot loop, command_dist.c:779-784).
3. HEADLINE (last JSON line): end-to-end genomes sketched/s from gzipped
   fasta on disk — the BASELINE.md stage-I config (20 x ~5.3 Mb,
   k=10/s=6/l=3 -> 6 genomes/s on a 64-vCPU x86 reference box).
"""

from __future__ import annotations

import json
import math
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


def assert_pallas_correct(params, computed) -> None:
    """Hard gate: pallas dense == jnp dense on THIS backend."""
    import jax.numpy as jnp

    from public_kssd_tpu.ops import pallas_sketch, sketch as sketch_ops

    rng = np.random.default_rng(7)
    n = 1 << 17
    sym = rng.integers(0, 4, size=n).astype(np.uint8)
    sym[rng.integers(0, n, size=64)] = 4
    symd = jnp.asarray(sym)
    dense = np.asarray(
        pallas_sketch.sketch_windows_pallas(symd, params, computed.seed)
    )
    dr, keep = sketch_ops.sketch_windows(symd, None, params, computed)
    dr, keep = np.asarray(dr), np.asarray(keep)
    m = dr.shape[0]
    keep_p = dense != pallas_sketch.SENTINEL32
    assert np.array_equal(keep_p[:m], keep), "pallas keep-mask != jnp on TPU"
    assert np.array_equal(
        dense[:m][keep], dr[keep].astype(np.uint32)
    ), "pallas codes != jnp on TPU"
    assert keep_p[m:].sum() == 0


def bench_counting(n_qry: int = 1000, n_ref: int = 10_000) -> dict:
    """Shared-k counting throughput on a synthetic DB shaped like the
    BASELINE config (~1,300 codes per genome at k=10/l=3)."""
    from public_kssd_tpu import index as index_mod
    from public_kssd_tpu.ops import count as count_ops

    rng = np.random.default_rng(42)
    sketch_sz = 1300
    space = 1 << 28  # 4(k-l)=28-bit code space
    ref_codes = rng.integers(0, space, size=(n_ref, sketch_sz), dtype=np.uint64)
    flat = np.sort(ref_codes, axis=None).astype(np.uint32)
    gids = np.argsort(ref_codes, axis=None, kind="stable") // sketch_sz
    uniq, first = np.unique(flat, return_index=True)
    offsets = np.zeros(uniq.size + 1, dtype=np.uint64)
    offsets[1:-1] = first[1:]
    offsets[-1] = flat.size
    sp = index_mod.SparseIndex(
        uniq_codes=uniq.astype(np.uint32),
        offsets=offsets,
        gids=gids.astype(np.uint32),
        n_genomes=n_ref,
    )
    qry_codes = rng.integers(0, space, size=n_qry * sketch_sz, dtype=np.uint64)
    # make ~30% of query codes real DB hits so postings walks happen
    hit = rng.random(qry_codes.size) < 0.3
    qry_codes[hit] = ref_codes.ravel()[
        rng.integers(0, ref_codes.size, size=int(hit.sum()))
    ]
    qry_codes = qry_codes.astype(np.uint32)
    qry_index = (np.arange(n_qry + 1, dtype=np.uint64)) * sketch_sz

    # warmup twice: call 1 learns the DB's pair density (ops/count),
    # call 2 compiles the steady-state capacity shape
    count_ops.count_shared(qry_codes, qry_index, sp, n_qry, True)
    counts = count_ops.count_shared(qry_codes, qry_index, sp, n_qry, True)
    dt = math.inf
    for _ in range(3):  # best-of-3: the device tunnel has heavy jitter
        t0 = time.perf_counter()
        counts = count_ops.count_shared(qry_codes, qry_index, sp, n_qry, True)
        dt = min(dt, time.perf_counter() - t0)
    pairs = n_qry * n_ref
    return {
        "metric": "sketch_pairs_per_s_per_chip",
        "value": round(pairs / dt, 1),
        "unit": f"genome pairs/s ({n_qry} qry x {n_ref} ref, {sketch_sz} codes/sketch)",
        "vs_baseline": round((pairs / dt) / (220 / 0.11), 3),
        "checksum": int(counts.sum()),
    }


def main() -> None:
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "kssd_tpu_jax_cache"),
    )
    import public_kssd_tpu  # noqa: F401
    import jax

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

    if jax.default_backend() not in ("cpu",):
        assert_pallas_correct(params, shuffled_dev)
        print("pallas-vs-jnp equality on TPU: OK", file=sys.stderr)

    print(json.dumps(bench_counting()), flush=True)

    paths = _make_data()
    parse_opts = pipeline.SketchOptions()

    def sketch_batch(batch: list[str]) -> int:
        streams = (
            s for _, _, s in pipeline.parsed_streams(batch, parse_opts)
        )  # lazy: parsing overlaps pack/upload/compute
        kept = sketch_ops.sketch_codes_multi(streams, shuffled_dev, params)
        return sum(hashdedup.dedup_sorted(k).size for k in kept)

    # warmup: the SAME batch as the timed run, so every bucket shape is
    # compiled (or loaded from the persistent cache) before timing
    sketch_batch(paths[2 : 2 + N_TIMED])

    dt = math.inf
    for _ in range(3):  # best-of-3 against tunnel jitter
        t0 = time.perf_counter()
        total_codes = sketch_batch(paths[2 : 2 + N_TIMED])
        dt = min(dt, time.perf_counter() - t0)

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
