"""Benchmarks vs BASELINE.md on ONE chip.

Sections (each emits one JSON line; every emit is mirrored into
bench_results.json, and the LAST stdout line is a compact summary of
the headline + ALL metrics so the driver's tail capture holds the
whole round record):

  1. HEADLINE FIRST: end-to-end genomes sketched/s from gzipped fasta on
     disk (BASELINE.md stage-I config: 10 x ~5.3 Mb, k=10/s=6/l=3 -> 6
     genomes/s on a 64-vCPU x86 reference box), measured in best-of-2
     FRESH SUBPROCESSES before this process opens the exclusive TPU,
     for both the TPU-native sorted dedup and the DEFAULT byte-parity
     compat-order dedup. NOTE: this metric is bounded by the device
     tunnel, whose bandwidth swings 8.8-613 MB/s hour to hour.
  2. TPU correctness gate: the Pallas sketch kernel must agree with the
     jnp path on the real chip (Mosaic lowering quirks do not reproduce
     in interpret mode — see ops/pallas_sketch.py), then the sketch
     stage breakdown (parse / pack+upload+kernel / dedup, unpipelined)
     + measured tunnel bandwidth + raw kernel Gbases/s.
  3. HOST-I/O speed-of-light: parse / pack / upload terms measured with
     no device in the loop + the projected genomes/s/chip on a real
     PCIe host (the design-bound number the tunnel cannot touch).
  4. Pair counting at TWO DB sizes: 10k refs (13M postings) and 100k
     refs (130M postings), with the capacity-learning first call timed
     separately from steady state (the search hot loop,
     command_dist.c:779-784); then the counting-kernel ROOFLINE study:
     the production row-gather kernel vs the round-4 kernel like for
     like, the two measured gather rates, a gather-issue floor model
     and the MXU matmul crossover — all timed with in-jit chains +
     host-fetch sync (_chain_time; repeated-dispatch timing is
     unsound on this backend).
  5. GTDB flagship THROUGH THE ON-DISK ARTIFACTS (SURVEY C17), twice:
     the synthetic 317k-genome x ~1,300-code scale stressor AND the
     REAL size distribution (65,702 species groups from the surviving
     combco.index.0, 80x skew) -> combco -> stage II CSR sidecar ->
     -m-governed counting -> top-N statistics, plus composite via the
     CSR join SHARING the search index's device residency, plus the
     shard-balance factors of both sharding strategies under the real
     skew.
  6. WEAK-scaling study on CPU subprocesses (fixed per-device DB
     shard, 1 XLA thread per device): MARGINAL per-step CPU inflation
     with a linearity-fit validity control, all-reduce bytes from the
     compiled HLO for BOTH sharding strategies, and 1- vs 2-process
     jax.distributed sketching with total-CPU inflation.
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys
import textwrap
import time

import numpy as np

BASELINE_GENOMES_PER_S = 6.0  # BASELINE.md stage I measurement
BASELINE_PAIRS_PER_S = 220 / 0.11  # BASELINE.md search measurement
GENOME_MB = 5.3
N_TIMED = 10
DATA_DIR = "/tmp/kssd_bench_data"
GTDB_DIR = "/tmp/kssd_bench_gtdb"
REPO = os.path.dirname(os.path.abspath(__file__))


# every _emit lands here keyed by metric; the LAST stdout line of the
# run is a single compact summary holding ALL of it, so the driver's
# tail capture / `parsed` field carry the full round record even when
# earlier stdout is truncated (round-4 lost every non-headline metric
# that way). The same record is also written to bench_results.json.
RESULTS: dict[str, dict] = {}


def _emit(obj) -> None:
    print(json.dumps(obj), flush=True)
    if isinstance(obj, dict) and "metric" in obj:
        RESULTS[obj["metric"]] = obj
        try:
            with open(os.path.join(REPO, "bench_results.json"), "w") as f:
                json.dump(RESULTS, f, indent=1)
        except OSError:
            pass  # read-only checkout: stdout is still the record


def _guard(name: str, fn) -> None:
    try:
        fn()
    except Exception as e:  # noqa: BLE001 — a failed section must not
        # take down the sections after it; the error is the record
        _emit({"metric": name, "error": f"{type(e).__name__}: {e}"})


def _rss_gb() -> float:
    import resource

    return round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2
    )


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


def _synth_csr(n_ref: int, sketch_sz: int, seed: int):
    """Synthetic CSR index + planted-hit queries, cached on disk (the
    100k build needs a 130M-element argsort on this 2-vCPU host)."""
    from public_kssd_tpu import index as index_mod

    tag = os.path.join(DATA_DIR, f"csr_{n_ref}_{sketch_sz}_{seed}")
    os.makedirs(DATA_DIR, exist_ok=True)
    if os.path.isfile(tag + ".uniq.npy"):
        sp = index_mod.SparseIndex(
            uniq_codes=np.load(tag + ".uniq.npy"),
            offsets=np.load(tag + ".off.npy"),
            gids=np.load(tag + ".gids.npy"),
            n_genomes=n_ref,
        )
        qry = np.load(tag + ".qry.npy")
        return sp, qry
    rng = np.random.default_rng(seed)
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
    n_qry = 1000
    qry = rng.integers(0, space, size=n_qry * sketch_sz, dtype=np.uint64)
    hit = rng.random(qry.size) < 0.3
    qry[hit] = ref_codes.ravel()[
        rng.integers(0, ref_codes.size, size=int(hit.sum()))
    ]
    qry = qry.astype(np.uint32)
    np.save(tag + ".uniq.npy", sp.uniq_codes)
    np.save(tag + ".off.npy", sp.offsets)
    np.save(tag + ".gids.npy", sp.gids)
    np.save(tag + ".qry.npy", qry)
    return sp, qry


def bench_counting(n_qry: int = 1000, n_ref: int = 10_000) -> None:
    """Shared-k counting throughput on a synthetic DB shaped like the
    BASELINE config (~1,300 codes per genome at k=10/l=3)."""
    from public_kssd_tpu.ops import count as count_ops

    sketch_sz = 1300
    sp, qry_codes = _synth_csr(n_ref, sketch_sz, 42)
    qry_codes = qry_codes[: n_qry * sketch_sz]
    qry_index = (np.arange(n_qry + 1, dtype=np.uint64)) * sketch_sz

    # first call learns the DB's pair density AND compiles: the
    # capacity-retry path, timed separately
    t0 = time.perf_counter()
    count_ops.count_shared(qry_codes, qry_index, sp, n_qry, True)
    first_call = time.perf_counter() - t0
    counts = count_ops.count_shared(qry_codes, qry_index, sp, n_qry, True)
    dt = math.inf
    for rep in range(3):  # best-of-3: the device tunnel has heavy jitter
        # perturb one code per rep: the backend dedups repeated
        # identical executions (measured round 5), which would turn
        # "steady state" into a cache read
        qry_codes = qry_codes.copy()
        qry_codes[0] ^= np.uint32(rep + 1)
        t0 = time.perf_counter()
        counts = count_ops.count_shared(qry_codes, qry_index, sp, n_qry, True)
        dt = min(dt, time.perf_counter() - t0)
    pairs = n_qry * n_ref
    _emit({
        "metric": f"sketch_pairs_per_s_per_chip_{n_ref // 1000}k",
        "value": round(pairs / dt, 1),
        "unit": f"genome pairs/s ({n_qry} qry x {n_ref} ref, "
                f"{sketch_sz} codes/sketch, {sp.gids.size} postings)",
        "vs_baseline": round((pairs / dt) / BASELINE_PAIRS_PER_S, 3),
        "first_call_s": round(first_call, 3),
        "steady_s": round(dt, 3),
        "checksum": int(counts.sum()),
    })


HBM_PEAK = 8.1e11  # bytes/s, v5e (public scaling-book figure)
MXU_PEAK_BF16 = 1.97e14  # flops/s, v5e bf16


def _chain_time(make_call, base_args, arrs, reps=3):
    """Device-only seconds/call: in-jit K-chain (1 vs 3) with a fresh
    scalar input per call and a HOST FETCH as the sync. The only
    timing methodology that survived round-5 scrutiny on this remote
    device: the backend dedups repeated identical executions (a
    repeat-args 40-stage chain returned in 0.6 ms after computing
    once) and block_until_ready does not reliably sync the tunnel.
    ``make_call(c, qq, *arrs)`` must return a uint32 scalar that
    depends on the whole computation."""
    import jax
    import jax.numpy as jnp

    qc_d, qq_d = base_args

    def chain(Ko):
        @jax.jit
        def f(qc, qq, s, *a):
            acc = jnp.uint32(0)
            c = qc ^ s
            for _ in range(Ko):
                r = make_call(c, qq, *a)
                acc = acc + r
                c = qc ^ (r % 2)
            return acc
        return f

    f1, f3 = chain(1), chain(3)
    int(f1(qc_d, qq_d, jnp.uint32(0), *arrs))
    int(f3(qc_d, qq_d, jnp.uint32(0), *arrs))
    best = math.inf
    for s in range(1, reps + 1):
        t0 = time.perf_counter()
        int(f1(qc_d, qq_d, jnp.uint32(s), *arrs))
        w1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        int(f3(qc_d, qq_d, jnp.uint32(16 + s), *arrs))
        w3 = time.perf_counter() - t0
        best = min(best, (w3 - w1) / 2)
    return best


def bench_counting_roofline() -> None:
    """Counting-kernel attribution + the measured gather floor
    (redesigned twice: round 4 modeled minimum HBM bytes and concluded
    'scatter-bound, <1% of peak'; round-5 stage attribution overturned
    that — the duplicate-index scatter-add is ~5 ms of a ~300 ms call
    and every expensive stage is GATHER-bound).

    Measured facts the design now rests on (re-measured here so the
    record tracks the hardware/toolchain):
      * XLA TPU gather issues ~1 element / 7 ns regardless of table
        size (0.1-537 MB) or dependency structure
      * a 128-lane ROW gather costs ~2.4 ns for 512 B — the
        row-gather kernel (ops.count._count_rowgather) replaces the
        scalar binary search with lane loads + VPU compares
    This section times, via _chain_time (in-jit chain + host-fetch
    sync — repeated-dispatch timing is unsound on this backend):
      (a) the production row-gather kernel, device-only
      (b) the round-4-equivalent kernel on identical inputs
      (c) the two gather-rate micros + a gather-issue floor model
      (d) the MXU one-hot matmul crossover at small n_ref
    """
    import jax
    import jax.numpy as jnp

    from public_kssd_tpu import index as index_mod
    from public_kssd_tpu.ops import count as count_ops

    sk, n_ref, n_qry = 1300, 10_000, 1000
    sp, qry = _synth_csr(n_ref, sk, 42)
    qry = qry[: n_qry * sk]
    qidx = np.arange(n_qry + 1, dtype=np.uint64) * sk
    counts = count_ops.count_shared(qry, qidx, sp, n_qry, True)  # warm
    matched = int(counts.sum())
    capacity = 1 << int(max(matched - 1, 1)).bit_length()

    qid_of = np.searchsorted(
        qidx[1:], np.arange(qry.size, dtype=np.uint64), "right"
    ).astype(np.int32)
    L = count_ops.pad_len(qry.size)
    qc = np.zeros(L, dtype=np.uint32)
    qc[: qry.size] = qry
    qq = np.full(L, -1, dtype=np.int32)
    qq[: qry.size] = qid_of
    uniq, offs, g = count_ops._device_index(sp)
    qc_d, qq_d = jnp.asarray(qc), jnp.asarray(qq)
    bucket, shift, Kb = count_ops._device_bucket(sp)
    po = count_ops._device_packed(sp)
    rt = count_ops._device_rowtab(sp)

    # (a) production row-gather kernel
    u2, rowtab, shift_r, S, _nrows = rt

    def call_row(c, q, u2, po, g, rowtab):
        body, total = count_ops._count_rowgather.__wrapped__(
            c, q, u2, po, g, rowtab, n_qry=n_qry, n_ref=n_ref,
            capacity=capacity, shift=shift_r, S=S, out16=False)
        return body[0] + body[-1] + total.astype(jnp.uint32)

    t_row = _chain_time(call_row, (qc_d, qq_d), (u2, po, g, rowtab))

    # (b) round-4-equivalent: unpacked bucketed kernel at the r4 K=6
    def call_r4(c, q, uniq, offs, g, bucket):
        body, total = count_ops._count_bucketed.__wrapped__(
            c, q, uniq, offs, g, bucket, n_qry=n_qry, n_ref=n_ref,
            capacity=capacity, shift=shift, K=6, out16=False)
        return body[0] + body[-1] + total.astype(jnp.uint32)

    t_r4 = _chain_time(call_r4, (qc_d, qq_d), (uniq, offs, g, bucket))

    # (c) gather-rate micros on THIS chip (8-vs-2 stage chains)
    M = uniq.shape[0]
    tab1 = jnp.asarray(
        np.random.default_rng(3).integers(0, M, size=M, dtype=np.int32)
    )

    NMICRO = 1 << 20  # <= L for every pad_len at this config

    def mk_scalar(stages):
        def call(c, q, tab1):
            x = jnp.clip(c[:NMICRO].astype(jnp.int32), 0, M - 1)
            for _ in range(stages):
                x = tab1[x]
            return x.sum().astype(jnp.uint32)
        return call

    t2 = _chain_time(mk_scalar(2), (qc_d, qq_d), (tab1,))
    t8 = _chain_time(mk_scalar(8), (qc_d, qq_d), (tab1,))
    ns_scalar = max((t8 - t2) / 6, 1e-12) / NMICRO * 1e9
    R = u2.shape[0]

    def mk_row(stages):
        def call(c, q, u2):
            r = jnp.clip(c[:NMICRO].astype(jnp.int32), 0, R - 1)
            for _ in range(stages):
                out = u2[r]
                r = jnp.clip(out[:, 0].astype(jnp.int32), 0, R - 1)
            return r.sum().astype(jnp.uint32)
        return call

    t2r = _chain_time(mk_row(2), (qc_d, qq_d), (u2,))
    t8r = _chain_time(mk_row(8), (qc_d, qq_d), (u2,))
    ns_row = max((t8r - t2r) / 6, 1e-12) / NMICRO * 1e9

    # gather-issue floor for the row-gather kernel's access counts:
    # per code 2 scalar gathers (rowtab, po) + S row gathers; per pair
    # slot 3 scalar gathers (sq, cum-prev, gids)
    floor_s = (
        L * (2 * ns_scalar + S * ns_row) + capacity * 3 * ns_scalar
    ) / 1e9
    out = {
        "metric": "counting_kernel_roofline",
        "value": round(matched / t_row, 1),
        "unit": "matched code-pairs/s, device-only production "
                f"row-gather kernel ({n_qry} qry x {n_ref} ref, "
                f"capacity {capacity}; in-jit chain + host-fetch sync)",
        "device_s_per_call": round(t_row, 5),
        "r4_equiv_kernel_s": round(t_r4, 5),
        "speedup_vs_r4_kernel": round(t_r4 / t_row, 2),
        "measured_ns_per_scalar_gather": round(ns_scalar, 2),
        "measured_ns_per_128lane_row_gather": round(ns_row, 2),
        "gather_issue_floor_s": round(floor_s, 5),
        "fraction_of_gather_floor": round(floor_s / t_row, 3),
        "scatter_note": "duplicate-index scatter-add measured ~5 ms "
                        "of the call (round-5 attribution) — the old "
                        "'scatter-bound' roofline was wrong",
    }

    # (d) matmul-vs-expansion crossover at small n_ref (sk shrunk so the
    # one-hot operands stay well inside the budget at every size)
    crossover = {}
    skx = 256
    for nr in (128, 512, 1024):
        rng = np.random.default_rng(nr)
        ref = rng.integers(0, 1 << 28, size=(nr, skx), dtype=np.uint64)
        spx = index_mod.build_component_index(
            np.sort(ref, axis=1).ravel().astype(np.uint32),
            np.arange(nr + 1, dtype=np.uint64) * skx, nr)
        nq = 256
        q2 = rng.integers(0, 1 << 28, size=nq * skx, dtype=np.uint64)
        hit = rng.random(q2.size) < 0.3
        q2[hit] = ref.ravel()[rng.integers(0, ref.size, size=int(hit.sum()))]
        q2 = q2.astype(np.uint32)
        qx = np.arange(nq + 1, dtype=np.uint64) * skx
        t_exp = t_mm = math.inf
        count_ops.count_shared(q2, qx, spx, nq, True)
        a = count_ops.count_shared_matmul(q2, qx, spx, nq)
        b = count_ops.count_shared(q2, qx, spx, nq, True)
        assert np.array_equal(a, b), "matmul != expansion counts"
        for rep in range(3):
            # distinct inputs per rep: the backend dedups repeated
            # identical executions
            q2 = q2.copy()
            q2[0] ^= np.uint32(rep + 1)
            t0 = time.perf_counter()
            count_ops.count_shared(q2, qx, spx, nq, True)
            t_exp = min(t_exp, time.perf_counter() - t0)
            t0 = time.perf_counter()
            count_ops.count_shared_matmul(q2, qx, spx, nq)
            t_mm = min(t_mm, time.perf_counter() - t0)
        flops = 2 * nq * spx.uniq_codes.size * nr
        crossover[str(nr)] = {
            "expansion_s": round(t_exp, 4),
            "matmul_s": round(t_mm, 4),
            "matmul_model_s_at_peak": round(flops / MXU_PEAK_BF16, 5),
        }
    out["matmul_crossover_by_n_ref"] = crossover
    _emit(out)


def _perturb_combco(co_dir: str) -> None:
    """Flip one code in a sketch dir's combco.0 so a re-run is a
    DISTINCT computation: the device backend dedups repeated identical
    executions, which would let a warm+timed pair report cache-read
    time as steady state."""
    p = os.path.join(co_dir, "combco.0")
    m = np.memmap(p, dtype="<u4", mode="r+")
    m[0] ^= np.uint32(1)
    m.flush()


def bench_gtdb() -> None:
    """The 317k-genome GTDB flagship through the on-disk artifact path."""
    import jax

    from public_kssd_tpu import (
        composite, formats, index as index_mod, search, synthdb,
    )
    from public_kssd_tpu.ops import count as count_ops
    from public_kssd_tpu.ops import stats as stats_ops

    n_ref, sk = 317_000, 1300
    n_qry, n_koc = 64, 8
    ref = os.path.join(GTDB_DIR, "ref")
    qry = os.path.join(GTDB_DIR, "qry")
    koc = os.path.join(GTDB_DIR, "koc")
    t0 = time.perf_counter()
    synthdb.build_synth_ref(ref, n_ref, sk, seed=21)
    synthdb.build_synth_queries(qry, ref, n_qry, sk, seed=22)
    synthdb.build_synth_queries(koc, ref, n_koc, sk, seed=23, koc=True)
    t_build = time.perf_counter() - t0
    t_index = None  # cached artifacts from an earlier run
    if not os.path.isfile(os.path.join(ref, "mco.uniq.0")):
        t0 = time.perf_counter()
        index_mod.run_stage2(ref, ref, 7, dense=False)
        t_index = time.perf_counter() - t0

    t0 = time.perf_counter()
    _, comps = index_mod.load_sparse_index(ref)
    sp = comps[0]
    t_load = time.perf_counter() - t0
    t0 = time.perf_counter()
    dev_arrays = count_ops._device_index(sp)
    for a in dev_arrays:
        a.block_until_ready()
    t_upload = time.perf_counter() - t0
    # HBM residency at device dtypes (offsets downcast to uint32 when
    # the postings total allows — ops/count._device_index)
    db_gb = sum(a.nbytes for a in dev_arrays) / 1e9
    del dev_arrays

    # -m-governed counting (disk-backed matrix), one warm + one timed
    skf = os.path.join(GTDB_DIR, "sharedk_ct.dat")
    counts = np.memmap(skf, dtype="<u4", mode="w+", shape=(n_qry, n_ref))
    batch = search.query_batch_size(n_qry, n_ref, 16.0)
    search.compute_shared_counts(qry, comps, n_qry, True,
                                 counts_out=counts, batch=batch)
    _perturb_combco(qry)  # distinct inputs vs the warm pass (dedup)
    t0 = time.perf_counter()
    search.compute_shared_counts(qry, comps, n_qry, True,
                                 counts_out=counts, batch=batch)
    t_count = time.perf_counter() - t0
    pairs = n_qry * n_ref

    # top-N statistics over the full 317k-column matrix
    qstat = formats.read_co_stat(qry)
    rstat = formats.read_mco_stat(ref)
    t0 = time.perf_counter()
    stats_ops.write_distance_out(
        os.path.join(GTDB_DIR, "distance.out"), counts,
        rstat.ctx_ct, qstat.ctx_ct, rstat.names, qstat.names,
        qstat.kmerlen, qstat.dim_rd_len,
        stats_ops.OutputOptions(top_n=100),
    )
    t_print = time.perf_counter() - t0
    _emit({
        "metric": "gtdb317k_search_pairs_per_s_per_chip",
        "value": round(pairs / t_count, 1),
        "unit": f"genome pairs/s ({n_qry} qry x {n_ref} ref, {sk} codes/"
                f"sketch, {sp.gids.size} postings, -m 16GB batch={batch})",
        "vs_baseline": round((pairs / t_count) / BASELINE_PAIRS_PER_S, 3),
        "db_hbm_gb": round(db_gb, 2),
        "index_upload_s": round(t_upload, 1),
        "stage2_csr_build_s": (
            round(t_index, 1) if t_index is not None else "cached"
        ),
        "artifact_build_s": round(t_build, 1),
        "index_load_s": round(t_load, 1),
        "topn_print_s": round(t_print, 1),
        "peak_rss_gb": _rss_gb(),
        "checksum": int(np.asarray(counts[:4]).sum()),
    })

    # composite over the same DB through the CSR join, SHARING the
    # search path's device-resident index (ops.count._device_index):
    # zero additional upload or HBM — the round-3 design re-staged raw
    # combco + a rid_of array (+5 GB host RSS) and re-uploaded 3.3 GB
    # through the ~50 MB/s tunnel (282 s wall, 23 GB peak RSS)
    del counts
    t0 = time.perf_counter()
    rep = composite.species_abundance(ref, koc, ref_components=comps)
    t_cold = time.perf_counter() - t0
    _perturb_combco(koc)  # distinct inputs for the warm pass (dedup)
    t0 = time.perf_counter()
    rep = composite.species_abundance(ref, koc, ref_components=comps)
    t_comp = time.perf_counter() - t0
    _emit({
        "metric": "gtdb317k_composite_batch_wall_s",
        "value": round(t_comp, 1),
        "cold_incl_compile_s": round(t_cold, 1),
        "unit": f"seconds for {n_koc} koc queries vs {n_ref} refs x {sk} "
                "codes via the CSR join sharing the search path's "
                "resident device index (zero extra upload; wall "
                "~constant in query count)",
        "queries_per_s": round(n_koc / t_comp, 3),
        "report_rows": rep.count("\n"),
        "peak_rss_gb": _rss_gb(),
    })


PCIE_BW = 1.5e10  # bytes/s, PCIe gen3 x16 — a real TPU host's
# device link (this environment's ~30-50 MB/s tunnel stands in for it)


def bench_host_io() -> None:
    """Host-side speed-of-light for stage I, NO device in the loop
    (VERDICT r4 #4): the round-4 claim that the 3.2-3.5x headline is
    tunnel-bound 'and on a real host the pipeline becomes
    host-decompression-bound' was narrative — this measures it. Three
    terms, separately:

      parse   gz inflate + fasta scan -> symbol stream (zlib via
              threads; the native scanner releases the GIL), measured
              at 1 worker (per-core rate) and at the box's 2 cores
              (thread-scaling check: zlib+scanner threads are the
              process-pool answer on any core count)
      pack    2-bit packing of the symbol stream (ops.sketch.pack2)
      upload  packed bytes / PCIe bw (analytic on a real host; the
              measured tunnel MBps is in sketch_stage_breakdown)

    plus the projected genomes/s/chip on a real PCIe host:
    pipelined = min(parse_total, pack, upload, kernel) with every term
    printed so a pod run can falsify each one independently.
    """
    from public_kssd_tpu import pipeline
    from public_kssd_tpu.ops import sketch as sketch_ops

    paths = _make_data()[2 : 2 + N_TIMED]
    opts = pipeline.SketchOptions()

    def parse_all(workers: int) -> tuple[float, int]:
        best, bases = math.inf, 0
        for _ in range(3):
            t0 = time.perf_counter()
            bases = sum(
                s.size for _, _, s in pipeline.parsed_streams(
                    paths, opts, workers=workers
                )
            )
            best = min(best, time.perf_counter() - t0)
        return best, bases

    t1, bases = parse_all(1)
    tn, _ = parse_all(os.cpu_count() or 2)
    syms = [s for _, _, s in pipeline.parsed_streams(paths, opts)]
    t0 = time.perf_counter()
    packed_bytes = 0
    for s in syms:
        total = 1 << max(int(s.size - 1).bit_length(), 6)
        packed_bytes += sketch_ops.pack2(s, total).nbytes
    t_pack = time.perf_counter() - t0

    parse_core = bases / t1 / 1e6  # Mbases/s on ONE core
    parse_box = bases / tn / 1e6
    pack_rate = bases / t_pack / 1e6
    upload_rate = PCIE_BW * 4 / 1e6  # Mbases/s at 2 bits/base
    kernel = RESULTS.get("sketch_stage_breakdown", {}).get(
        "pallas_kernel_gbases_per_s"
    )
    kernel_rate = kernel * 1e3 if kernel else None  # Mbases/s
    terms = [parse_box, pack_rate, upload_rate] + (
        [kernel_rate] if kernel_rate else []
    )
    pipelined = min(terms)
    genome_mbases = GENOME_MB  # 1 base = 1 byte of fasta body here
    _emit({
        "metric": "host_io_speed_of_light",
        "value": round(pipelined / genome_mbases, 1),
        "unit": "projected genomes/s/chip on a real PCIe host = "
                "min(parse, pack, upload, kernel) Mbases/s / genome "
                "(5.3 Mb gz genomes; parse measured with no device in "
                "the loop, upload analytic at PCIe gen3 x16, kernel "
                "from the breakdown's K-chain slope)",
        "parse_mbases_per_s_1core": round(parse_core, 1),
        "parse_mbases_per_s_box": round(parse_box, 1),
        "parse_thread_scaling": round(parse_box / parse_core, 2),
        "pack_mbases_per_s": round(pack_rate, 1),
        "upload_mbases_per_s_pcie": round(upload_rate, 1),
        "kernel_mbases_per_s": (
            round(kernel_rate, 1) if kernel_rate else None
        ),
        "bottleneck": ["parse", "pack", "upload", "kernel"][
            terms.index(min(terms))
        ],
        "note": "parse threads scale with cores (zlib + native scanner "
                "release the GIL): per-chip projection assumes host "
                "cores >= parse_box/parse_core x (chip Mbases/s / "
                "parse_core)",
    })


def bench_gtdb_realskew() -> None:
    """The GTDB flagship against the REAL size distribution (VERDICT r4
    next-round #5): /root/reference/.../combco.index.0 preserves the
    65,702 real species-group sketch sizes (19.7M codes, median 251 /
    mean 300 / max 23,925 — 80x skew). Codes are synthetic (the blobs
    are gone) but every ragged shape downstream — CSR row lengths,
    genome-block padding, the postings-balanced code cut — is the real
    database's. Reports search pairs/s, composite wall, and the
    padding-waste factors of BOTH sharding strategies at S=8 that the
    uniform synthetic DB could never stress."""
    from public_kssd_tpu import (
        composite, formats, index as index_mod, search, synthdb,
    )
    from public_kssd_tpu.parallel import sharded_search

    sizes = synthdb.real_gtdb_sizes()
    n_ref = sizes.size
    skew_dir = GTDB_DIR + "_skew"
    ref = os.path.join(skew_dir, "ref")
    qry = os.path.join(skew_dir, "qry")
    koc = os.path.join(skew_dir, "koc")
    n_qry, n_koc, qry_sk = 64, 8, 1300
    synthdb.build_synth_ref_sizes(ref, sizes, seed=31)
    synthdb.build_synth_queries(qry, ref, n_qry, qry_sk, seed=32)
    synthdb.build_synth_queries(koc, ref, n_koc, qry_sk, seed=33, koc=True)
    if not os.path.isfile(os.path.join(ref, "mco.uniq.0")):
        index_mod.run_stage2(ref, ref, 7, dense=False)

    _, comps = index_mod.load_sparse_index(ref)
    counts = np.zeros((n_qry, n_ref), dtype=np.uint32)
    batch = search.query_batch_size(n_qry, n_ref, 16.0)
    search.compute_shared_counts(qry, comps, n_qry, True,
                                 counts_out=counts, batch=batch)
    _perturb_combco(qry)  # distinct inputs: the backend dedups
    # repeated identical executions (round-5 finding)
    t0 = time.perf_counter()
    search.compute_shared_counts(qry, comps, n_qry, True,
                                 counts_out=counts, batch=batch)
    t_count = time.perf_counter() - t0
    pairs = n_qry * n_ref
    _emit({
        "metric": "gtdb_realskew_search_pairs_per_s_per_chip",
        "value": round(pairs / t_count, 1),
        "unit": f"genome pairs/s ({n_qry} qry x {n_ref} species groups, "
                "REAL per-group sketch sizes from combco.index.0, "
                f"{int(sizes.sum())} postings)",
        "vs_baseline": round((pairs / t_count) / BASELINE_PAIRS_PER_S, 3),
        "checksum": int(counts[:4].sum()),
    })

    t0 = time.perf_counter()
    rep = composite.species_abundance(ref, koc, ref_components=comps)
    t_cold = time.perf_counter() - t0
    _perturb_combco(koc)  # distinct inputs for the warm pass (dedup)
    t0 = time.perf_counter()
    rep = composite.species_abundance(ref, koc, ref_components=comps)
    t_comp = time.perf_counter() - t0
    _emit({
        "metric": "gtdb_realskew_composite_wall_s",
        "value": round(t_comp, 1),
        "cold_incl_compile_s": round(t_cold, 1),
        "unit": f"seconds for {n_koc} koc queries vs the real-skew "
                "65,702-group DB via the CSR join (value = warm; the "
                "cold field includes the one-off XLA compile)",
        "report_rows": rep.count("\n"),
    })

    # sharding balance under REAL skew at S=8: the genome strategy cuts
    # by genome count (skewed per-genome sizes unbalance its postings),
    # the code strategy cuts by postings mass (balanced by design) —
    # waste factor = padded size / ideal size, the HBM multiplier every
    # device pays because shard_map needs uniform blocks
    sp = comps[0]
    key, offsets, gids = sharded_search.merge_components([sp], 0)
    S = 8
    out = {"metric": "gtdb_realskew_shard_balance_x8", "value": None,
           "unit": "padded/ideal HBM factor per strategy at S=8 under "
                   "the real GTDB size skew (rows=CSR rows, "
                   "postings=gid array)"}
    for strat, builder in (
        ("genome", sharded_search.build_genome_sharded_db),
        ("code", sharded_search.build_sharded_db),
    ):
        db = builder(key, offsets, gids, n_ref, S)
        out[strat] = {
            "rows_waste": round(S * db.uniq.shape[1] / max(key.size, 1), 3),
            "postings_waste": round(
                S * db.gids.shape[1] / max(int(offsets[-1]), 1), 3
            ),
        }
    out["value"] = out["genome"]["postings_waste"]
    _emit(out)


_SCALING_CHILD = textwrap.dedent("""
    # WEAK-scaling probe: per-device DB shard FIXED (ref_per_shard
    # genomes), query set fixed; argv = n_dev repo strategy.
    # Reports wall, process CPU seconds of the timed region (the
    # contention-free work measure: on an oversubscribed host, wall
    # conflates core contention with sharding overhead, CPU-time does
    # not), and the all-reduce bytes of the COMPILED HLO (the
    # falsifiable collective-payload accounting).
    import json, os, re, resource, sys, time
    import numpy as np
    n_dev = int(sys.argv[1])
    strategy = sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    # SINGLE-THREADED execution per device: with the default intra-op
    # thread pool the N=1 baseline burns extra CPU in partitioning and
    # spin-wait that the per-device work at N=8 does not pay pro-rata,
    # which pushed the round-4 control BELOW the free-sharding floor
    # (inflation 0.59-0.69 < 1.0 — a free decomposition cannot use less
    # total CPU than its own baseline). One thread per unit of work
    # makes CPU-seconds a clean work measure at every N.
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_dev} "
        "--xla_cpu_multi_thread_eigen=false "
        "intra_op_parallelism_threads=1"
    )
    sys.path.insert(0, sys.argv[2])
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from public_kssd_tpu import index as index_mod
    from public_kssd_tpu.parallel import sharded_search

    # n_qry sized so the per-device step is O(0.5 s) on a CPU device:
    # the bucketed kernels made a 512-query step ~45 ms, small enough
    # that fixed per-step orchestration swamped the inflation ratio
    REF_PER_SHARD, sk, n_qry, space = 12_500, 256, 4096, 1 << 28
    n_ref = REF_PER_SHARD * n_dev
    rng = np.random.default_rng(5)
    ref = rng.integers(0, space, size=(n_ref, sk), dtype=np.uint64)
    sp = index_mod.build_component_index(
        ref.ravel().astype(np.uint32),
        np.arange(n_ref + 1, dtype=np.uint64) * sk, n_ref)
    key, offsets, gids = sharded_search.merge_components([sp], 0)
    builder = (sharded_search.build_genome_sharded_db
               if strategy == "genome" else sharded_search.build_sharded_db)
    db = sharded_search._attach_buckets(
        builder(key, offsets, gids, n_ref, n_dev))

    # fixed query work: half the codes planted from the FIRST shard's
    # genomes so expansion work per query is n_dev-independent
    qry = rng.integers(0, space, size=n_qry * sk, dtype=np.uint64)
    hit = rng.random(qry.size) < 0.5
    pool = ref[:REF_PER_SHARD].ravel()
    qry[hit] = pool[rng.integers(0, pool.size, size=int(hit.sum()))]
    qq = np.repeat(np.arange(n_qry, dtype=np.int32), sk)
    L = 1 << int(max(qry.size - 1, 1)).bit_length()
    qk_pad = np.zeros(L, dtype=np.uint64)
    qk_pad[: qry.size] = qry
    qq_pad = np.full(L, -1, dtype=np.int32)
    qq_pad[: qq.size] = qq

    mesh = Mesh(np.array(jax.devices()).reshape(1, n_dev), ("dp", "ref"))
    # per-device pair capacity via the PRODUCTION helper — the bench
    # must time kernels compiled at the capacities production uses
    capacity = sharded_search.estimate_capacity(
        db, qk_pad[None], qq_pad[None], key, offsets, strategy)

    per_col = REF_PER_SHARD if strategy == "genome" else n_ref
    fn = sharded_search.make_sharded_count_fn(
        mesh, n_qry, per_col, capacity, strategy=strategy,
        rshift=db.rshift, rspan=db.rspan)
    sh_ref = NamedSharding(mesh, P("ref", None))
    sh_ref3 = NamedSharding(mesh, P("ref", None, None))
    sh_dp = NamedSharding(mesh, P("dp"))
    db_dev = tuple(
        jax.make_array_from_callback(
            a.shape, sh_ref3 if a.ndim == 3 else sh_ref,
            lambda i, a=a: a[i])
        for a in (db.uniq, db.offsets, db.gids, db.u2, db.rowtab))
    qk_dev = jax.make_array_from_callback(
        qk_pad.shape, sh_dp, lambda i: qk_pad[i])
    qq_dev = jax.make_array_from_callback(
        qq_pad.shape, sh_dp, lambda i: qq_pad[i])

    # collective-byte accounting straight from the compiled HLO
    hlo = fn.lower(qk_dev, qq_dev, *db_dev).compile().as_text()
    BYTES = {"u8": 1, "u16": 2, "u32": 4, "s32": 4, "f32": 4,
             "u64": 8, "s64": 8, "f64": 8, "pred": 1}
    ar_bytes = 0
    for m in re.finditer(
            r"= (\\w+)\\[([\\d,]*)\\][^ ]* all-reduce", hlo):
        dims = [int(x) for x in m.group(2).split(",") if x]
        ar_bytes += int(np.prod(dims)) * BYTES.get(m.group(1), 4) if dims \\
            else BYTES.get(m.group(1), 4)

    out = np.asarray(fn(qk_dev, qq_dev, *db_dev))  # warm (compile done)
    checksum = int(out[:, :n_ref].sum())

    def cpu_now():
        ru = resource.getrusage(resource.RUSAGE_SELF)
        return ru.ru_utime + ru.ru_stime

    # empty-step control: a trivial shard_map over the SAME mesh/axes
    # measures the fixed per-step dispatch cost so the record shows how
    # small it is next to the real step (it is NOT subtracted — the
    # single-thread setting already removes the baseline bias)
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P2
    tiny = jax.make_array_from_callback(
        (n_dev, 8), NamedSharding(mesh, P2("ref", None)),
        lambda i: np.ones((1, 8), np.float32))
    efn = jax.jit(sharded_search.shard_map(
        lambda x: x + 1.0, mesh=mesh,
        in_specs=(P2("ref", None),), out_specs=P2("ref", None)))
    jax.block_until_ready(efn(tiny))
    c0 = cpu_now()
    for _ in range(10):
        jax.block_until_ready(efn(tiny))
    empty_cpu = (cpu_now() - c0) / 10

    # timed region: the SPMD step only (block_until_ready, no host
    # fetch) — on a real pod each host fetches just its own output
    # shard, so the O(N) whole-matrix host copy is not part of the
    # scaled step
    walls = []
    c0 = cpu_now()
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(qk_dev, qq_dev, *db_dev))
        walls.append(time.perf_counter() - t0)
    cpu = cpu_now() - c0
    print(json.dumps({
        "n_dev": n_dev, "strategy": strategy, "wall_s": min(walls),
        "cpu_s_per_step": cpu / 3, "empty_step_cpu_s": empty_cpu,
        "allreduce_bytes": ar_bytes,
        "capacity": capacity, "n_ref": n_ref, "checksum": checksum,
    }))
""")

_SKETCH_CHILD = textwrap.dedent("""
    import json, os, sys, time
    os.environ["JAX_PLATFORMS"] = "cpu"
    # ONE device per process AND one XLA thread: the 1-process baseline
    # otherwise spreads each op over both host cores and burns extra
    # CPU in partitioning/spin that the 2-process run cannot, which
    # drove the round-4 control below 1.0 (cpu_2proc < cpu_1proc for a
    # free split — impossible for a clean work measure)
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=1 "
        "--xla_cpu_multi_thread_eigen=false "
        "intra_op_parallelism_threads=1"
    )
    sys.path.insert(0, sys.argv[1])
    n_proc, pid, coord, data_dir = (
        int(sys.argv[2]), int(sys.argv[3]), sys.argv[4], sys.argv[5])
    if n_proc > 1:
        from public_kssd_tpu.parallel import distributed
        distributed.initialize(coord, n_proc, pid)
    import numpy as np
    from public_kssd_tpu import pipeline, shufspace
    from public_kssd_tpu.config import SketchParams
    paths = sorted(
        os.path.join(data_dir, f) for f in os.listdir(data_dir)
        if f.endswith(".fasta.gz"))[:8]
    mine = paths[pid::n_proc]
    params = SketchParams(id=1, half_ctx_len=10, half_subctx_len=6,
                          drlevel=3)
    shuf = shufspace.ComputedShuf(params.id, params.half_subctx_len)
    out = os.path.join(data_dir, f"skout_{n_proc}_{pid}")
    import resource, shutil
    shutil.rmtree(out, ignore_errors=True)

    def cpu_now():
        rs = resource.getrusage(resource.RUSAGE_SELF)
        rc = resource.getrusage(resource.RUSAGE_CHILDREN)
        return rs.ru_utime + rs.ru_stime + rc.ru_utime + rc.ru_stime

    # warm run first: interpreter + jax init + compiles are per-process
    # FIXED costs, not split overhead — measuring them made the 2-proc
    # inflation metric report startup cost instead of decomposition cost
    pipeline.run_stage1(mine, out, params, shuf,
                        pipeline.SketchOptions(compat_order=False))
    shutil.rmtree(out, ignore_errors=True)
    c0 = cpu_now()
    t0 = time.perf_counter()
    pipeline.run_stage1(mine, out, params, shuf,
                        pipeline.SketchOptions(compat_order=False))
    wall = time.perf_counter() - t0
    print(json.dumps({"pid": pid, "wall_s": wall, "cpu_s": cpu_now() - c0,
                      "n": len(mine)}))
""")


def _clean_cpu_env() -> dict:
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["PYTHONPATH"] = ":".join(
        [REPO] + [p for p in env.get("PYTHONPATH", "").split(":")
                  if p and ".axon_site" not in p]
    )
    env["JAX_PLATFORMS"] = "cpu"
    return env


# v5e public figures for the analytic collective model (jax-ml
# scaling-book numbers; the model is emitted so a future pod run has a
# prediction to falsify)
ICI_BW_ONEWAY = 4.5e10  # bytes/s per link, TPU v5e
DCN_BW_HOST = 2.5e10  # bytes/s per host egress (order of magnitude)


def bench_scaling() -> None:
    """WEAK-scaling study on CPU subprocesses (no pod here): per-device
    DB shard fixed at 12.5k genomes, fixed 4096-query batch, mesh (1, N),
    every child SINGLE-THREADED per device (see _SCALING_CHILD: the
    default intra-op pool biased the round-4 N=1 baseline and pushed the
    control below the free-sharding floor).

    Three falsifiable quantities per sharding strategy:
      * cpu_inflation = cpu_s_per_step[N] / (N * cpu_s_per_step[1]).
        The per-device work is constant by construction, so a free
        decomposition gives exactly N x the total CPU at N devices;
        1.0 = free sharding, and < 0.9 is an INVALID point ratio (a
        free decomposition cannot beat its own baseline) — the emit
        carries a ``control`` verdict instead of silently publishing.
        Each N runs in several fresh processes; the headline uses the
        MEDIAN CPU (robust to a single noisy child in either
        direction), the record carries every rep, and a least-squares
        linearity fit cpu(N) = f + w*N over the medians is the
        alternate validity check: free sharding IS per-step CPU linear
        in N through ~the origin, and the fit cannot be failed by one
        noisy arm the way a point ratio can.
      * allreduce_bytes: counted from the COMPILED HLO of the step.
        genome strategy must be 0; code strategy must equal the psum
        partial (n_qry x n_ref x 4 B, up to compiler fusion).
      * an analytic ICI model: ring all-reduce moves 2(S-1)/S x payload
        per device; at ICI_BW_ONEWAY this predicts the collective
        seconds a real v5e pod would add per batch.
    """
    script = os.path.join(DATA_DIR, "scaling_child.py")
    os.makedirs(DATA_DIR, exist_ok=True)
    with open(script, "w") as f:
        f.write(_SCALING_CHILD)
    for strategy in ("genome", "code"):
        reps = 5 if strategy == "genome" else 3
        res: dict[int, dict] = {}
        spread: dict[int, list[float]] = {}
        med: dict[int, float] = {}
        for n_dev in (1, 2, 4, 8):
            runs = []
            for _ in range(reps):
                out = subprocess.run(
                    [sys.executable, script, str(n_dev), REPO, strategy],
                    env=_clean_cpu_env(), capture_output=True, text=True,
                    timeout=900,
                )
                if out.returncode != 0:
                    raise RuntimeError(out.stderr[-1000:])
                runs.append(json.loads(out.stdout.strip().splitlines()[-1]))
            runs.sort(key=lambda r: r["cpu_s_per_step"])
            res[n_dev] = runs[len(runs) // 2]  # median rep is the record
            spread[n_dev] = [r["cpu_s_per_step"] for r in runs]
            med[n_dev] = spread[n_dev][len(runs) // 2]
        # Statistics (medians per arm; every rep in the record):
        #
        # The HEADLINE is the MARGINAL inflation
        #   (cpu_8 - cpu_4) / (2 * (cpu_4 - cpu_2))
        # — the per-shard cost of the last 4 shards over the per-shard
        # cost of shards 3-4. Differencing cancels any fixed per-step
        # offset f exactly; the point ratio cpu_N/(N*cpu_1) does NOT,
        # and full-bench runs showed f drifting 0..0.13 s with system
        # state (page-cache pressure after the GTDB sections), which
        # made the point ratio fail its own floor while the fit
        # cpu(N) = f + w*N stayed linear at r2 > 0.997 — free sharding
        # holding exactly. Free sharding = marginal inflation ~ 1.0
        # and r2 ~ 1; a collective/overhead cost growing with N would
        # bend the line upward.
        cpu1 = med[1]
        marginal = (med[8] - med[4]) / max(2 * (med[4] - med[2]), 1e-9)
        point_ratio = {
            n: round(med[n] / (n * cpu1), 3) for n in (2, 4, 8)
        }
        band = {
            n: [
                round(spread[n][0] / (n * spread[1][-1]), 3),
                round(spread[n][-1] / (n * spread[1][0]), 3),
            ]
            for n in (2, 4, 8)
        }
        ns = np.array([1.0, 2.0, 4.0, 8.0])
        cs = np.array([med[1], med[2], med[4], med[8]])
        w_fit, f_fit = np.polyfit(ns, cs, 1)
        r2 = 1.0 - float(
            np.sum((cs - (w_fit * ns + f_fit)) ** 2)
            / max(np.sum((cs - cs.mean()) ** 2), 1e-12)
        )
        if strategy == "genome":
            control = (
                "ok"
                if 0.9 <= marginal <= 1.25 and r2 >= 0.99
                else "FAILED: marginal inflation outside [0.9, 1.25] "
                     "or nonlinear cpu(N) — measurement invalid, do "
                     "not quote"
            )
        else:
            # a strategy with real collective cost is EXPECTED to
            # inflate superlinearly — only the free-sharding floor is
            # a validity check here; a large marginal is the result
            control = (
                "ok"
                if marginal >= 0.9
                else "FAILED: marginal below the free-sharding floor "
                     "— measurement invalid, do not quote"
            )
        inflation = {8: round(marginal, 3)}
        # analytic ICI collective seconds per step at the GTDB flagship
        # shape (64-query batch x 317k refs, uint32)
        payload = 64 * 317_000 * 4
        model = {
            str(s): round(
                (2 * (s - 1) / s) * payload / ICI_BW_ONEWAY * 1e3, 3
            ) if res[8]["allreduce_bytes"] else 0.0
            for s in (2, 4, 8)
        }
        _emit({
            "metric": f"weak_scaling_{strategy}_cpu_inflation_x8",
            "value": inflation[8],
            "unit": "MARGINAL inflation (cpu_8-cpu_4)/(2*(cpu_4-cpu_2)) "
                    "at fixed 12.5k-genome shard/device, 4096 queries, "
                    "(1,N) cpu mesh, 1 thread/device, MEDIAN CPU of "
                    "the fresh processes per N. Differencing cancels "
                    "the fixed per-step offset that contaminates the "
                    "N=1 point ratio (reported alongside). 1.0 = free "
                    "sharding. North star: >=80% linear scaling => "
                    "inflation <= 1.25 on a real pod",
            "control": control,
            "point_ratio_per_n": {
                str(n): point_ratio[n] for n in point_ratio
            },
            "point_ratio_band": {str(n): band[n] for n in band},
            "linear_fit": {
                "w_per_shard_s": round(float(w_fit), 4),
                "fixed_offset_s": round(float(f_fit), 4),
                "r2": round(r2, 5),
            },
            "cpu_s_per_step_all_reps": {
                str(n): [round(v, 3) for v in spread[n]] for n in spread
            },
            "empty_step_cpu_s": round(res[8]["empty_step_cpu_s"], 4),
            "wall_s": {str(n): round(res[n]["wall_s"], 2) for n in res},
            "allreduce_bytes_per_step": {
                str(n): res[n]["allreduce_bytes"] for n in res
            },
            "ici_model_ms_per_gtdb_batch": model,
            "checksum": {str(n): res[n]["checksum"] for n in res},
        })

    # 1- vs 2-process jax.distributed sketching over the bench genomes
    sketch_script = os.path.join(DATA_DIR, "sketch_child.py")
    with open(sketch_script, "w") as f:
        f.write(_SKETCH_CHILD)
    _make_data()

    def run_procs(n_proc: int) -> tuple[float, float]:
        import socket

        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            coord = f"127.0.0.1:{s.getsockname()[1]}"
        procs = [
            subprocess.Popen(
                [sys.executable, sketch_script, REPO, str(n_proc), str(i),
                 coord, DATA_DIR],
                env=_clean_cpu_env(), stdout=subprocess.PIPE,
                stderr=subprocess.PIPE, text=True,
            )
            for i in range(n_proc)
        ]
        walls, cpus = [], []
        for p in procs:
            out, err = p.communicate(timeout=900)
            if p.returncode != 0:
                raise RuntimeError(err[-1000:])
            r = json.loads(out.strip().splitlines()[-1])
            walls.append(r["wall_s"])
            cpus.append(r["cpu_s"])
        return max(walls), sum(cpus)

    # fixed total work (8 genomes) split 1 vs 2 processes: total CPU
    # seconds are contention-free, so c2/c1 is the true decomposition
    # overhead (jax.distributed init barrier, split file IO); 1.0 =
    # free split. Children run single-XLA-thread (see _SKETCH_CHILD) so
    # the 1-proc baseline is not inflated by intra-op parallelism — the
    # round-4 instrument measured 0.649 (< 1.0, an impossible value for
    # a free split) for exactly that reason. 3 reps, min CPU per arm.
    runs1 = sorted(c for _, c in (run_procs(1) for _ in range(3)))
    runs2 = sorted(c for _, c in (run_procs(2) for _ in range(3)))
    c1, c2 = runs1[1], runs2[1]  # medians (robust both directions)
    c1_max, c2_max = runs1[-1], runs2[-1]
    c1_min, c2_min = runs1[0], runs2[0]
    infl = round(c2 / c1, 3) if c1 else 0.0
    _emit({
        "metric": "sketch_2proc_split_cpu_inflation",
        "value": infl,
        "unit": "total CPU-s of 2 jax.distributed processes / 1 process, "
                "same 8 genomes, 1 XLA thread per process (1.0 = free "
                "split; contention-free measure). 3 reps per "
                "arm (median); band = cross-run envelope. North star >=80% "
                "scaling => inflation <= 1.25",
        "control": (
            "ok" if infl >= 0.9
            else "FAILED: inflation < 0.9 (free-split floor) — "
                 "measurement invalid, do not quote"
        ),
        "band": [
            round(c2_min / c1_max, 3) if c1_max else 0.0,
            round(c2_max / c1_min, 3) if c1_min else 0.0,
        ],
        "cpu_1proc_s": round(c1, 2),
        "cpu_2proc_s": round(c2, 2),
    })


def bench_sketch_breakdown(paths, params, shuffled_dev) -> None:
    """Unpipelined stage split + tunnel bandwidth + default-path number.

    The headline pipeline OVERLAPS these stages; the split attributes
    where the wall is (BASELINE 'speed-of-light' north star)."""
    import jax
    import jax.numpy as jnp

    from public_kssd_tpu import hashdedup, pipeline
    from public_kssd_tpu.ops import sketch as sketch_ops

    # measured tunnel bandwidth: one 64 MB upload
    buf = np.random.default_rng(0).integers(
        0, 2**32, size=16 << 20, dtype=np.uint32
    )
    jnp.asarray(buf[:1024]).block_until_ready()  # wake the device
    t0 = time.perf_counter()
    jnp.asarray(buf).block_until_ready()
    up_bw = buf.nbytes / (time.perf_counter() - t0) / 1e6

    # raw pallas kernel throughput (device-resident input): the VPU
    # speed-of-light number for the window kernel itself. Measured as
    # the SLOPE between a K=2 and a K=10 dependency chain of kernel
    # applications inside one jit — a single dispatch through the
    # device tunnel is pure round-trip latency (~26 ms), and
    # block_until_ready does not sync through it (host-fetch does)
    kernel_gbps = None
    if jax.default_backend() != "cpu":
        from public_kssd_tpu.ops import pallas_sketch

        nb = 1 << 23
        symd = jnp.asarray(
            np.random.default_rng(1).integers(0, 4, size=nb).astype(np.uint8)
        )

        def chain_fn(K):
            def chain(x, s):
                # s varies per call: the backend dedups repeated
                # identical executions (round-5 finding)
                tot = jnp.uint32(0)
                x = (x + s) & jnp.uint8(3)
                for _ in range(K):
                    out = pallas_sketch.sketch_windows_pallas.__wrapped__(
                        x, params, shuffled_dev.seed
                    )
                    tot = tot + out[0] + out[nb // 2]
                    x = (x + (out[0] % 2).astype(jnp.uint8)) & jnp.uint8(3)
                return tot

            return jax.jit(chain)

        walls = {}
        for K in (2, 10):
            f = chain_fn(K)
            float(f(symd, jnp.uint8(0)))  # compile + warm
            best = math.inf
            for s in range(1, 5):
                t0 = time.perf_counter()
                float(f(symd, jnp.uint8(s)))  # host fetch = real sync
                best = min(best, time.perf_counter() - t0)
            walls[K] = best
        per_call = (walls[10] - walls[2]) / 8
        # a non-positive or sub-100us slope means timing noise swamped
        # the chain difference — report null, not an absurd throughput
        if per_call > 1e-4:
            kernel_gbps = round(nb / per_call / 1e9, 2)

    parse_opts = pipeline.SketchOptions()
    t0 = time.perf_counter()
    syms = [s for _, _, s in pipeline.parsed_streams(paths, parse_opts)]
    t_parse = time.perf_counter() - t0
    t0 = time.perf_counter()
    kept = sketch_ops.sketch_codes_multi(iter(syms), shuffled_dev, params)
    t_kernel = time.perf_counter() - t0  # pack + upload + kernel + fetch
    t0 = time.perf_counter()
    n_fast = sum(hashdedup.dedup_sorted(k).size for k in kept)
    t_dedup_fast = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_compat = sum(
        hashdedup.dedup_slot_order(k, params).size for k in kept
    )
    t_dedup_compat = time.perf_counter() - t0
    assert n_fast == n_compat
    packed_mb = sum(s.size for s in syms) / 4 / 1e6
    _emit({
        "metric": "sketch_stage_breakdown",
        "value": round(t_parse + t_kernel + t_dedup_fast, 2),
        "unit": f"seconds, unpipelined, {len(paths)} x {GENOME_MB} Mb "
                "genomes (the pipeline overlaps parse with device work)",
        "parse_s": round(t_parse, 2),
        "pack_upload_kernel_s": round(t_kernel, 2),
        "dedup_sorted_s": round(t_dedup_fast, 2),
        "dedup_compat_order_s": round(t_dedup_compat, 2),
        "tunnel_upload_MBps": round(up_bw, 1),
        "packed_upload_mb": round(packed_mb, 1),
        "tunnel_floor_s": round(packed_mb / up_bw * 1e0, 2),
        "pallas_kernel_gbases_per_s": kernel_gbps,
    })


_HEADLINE_CHILD = textwrap.dedent("""
    # fresh-process headline measurement: argv = repo data_dir n_timed
    # (the parent must NOT have initialised the TPU backend yet — the
    # chip is exclusive and a second client blocks)
    import json, os, sys
    repo, data_dir, n_timed = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache",
                     "kssd_tpu_jax_cache"))
    sys.path.insert(0, repo)
    import public_kssd_tpu  # noqa: F401
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    import bench
    from public_kssd_tpu import shufspace
    from public_kssd_tpu.config import SketchParams
    params = SketchParams(id=1, half_ctx_len=10, half_subctx_len=6,
                          drlevel=3)
    shuffled = shufspace.ComputedShuf(params.id, params.half_subctx_len)
    paths = bench._make_data()[2 : 2 + n_timed]  # same set as the parent
    v = bench._sketch_run(paths, params, shuffled, False)
    vc = bench._sketch_run(paths, params, shuffled, True)
    print(json.dumps({"genomes_per_s": v, "compat_genomes_per_s": vc,
                      "backend": jax.default_backend()}))
""")


def _sketch_run(paths, params, shuffled_dev, compat: bool) -> float:
    """Best-of-3 pipelined genomes/s for one dedup mode."""
    from public_kssd_tpu import hashdedup, pipeline
    from public_kssd_tpu.ops import sketch as sketch_ops

    parse_opts = pipeline.SketchOptions()

    def sketch_batch(batch: list[str]) -> int:
        streams = (
            s for _, _, s in pipeline.parsed_streams(batch, parse_opts)
        )  # lazy: parsing overlaps pack/upload/compute
        kept = sketch_ops.sketch_codes_multi(streams, shuffled_dev, params)
        if compat:
            return sum(
                hashdedup.dedup_slot_order(k, params).size for k in kept
            )
        return sum(hashdedup.dedup_sorted(k).size for k in kept)

    sketch_batch(paths)  # warmup: compile / load every bucket shape
    dt = math.inf
    for _ in range(3):  # best-of-3 against tunnel jitter
        t0 = time.perf_counter()
        sketch_batch(paths)
        dt = min(dt, time.perf_counter() - t0)
    return len(paths) / dt


def main() -> None:
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "kssd_tpu_jax_cache"),
    )

    # HEADLINE FIRST, in FRESH SUBPROCESSES, before this process touches
    # the (exclusive) TPU: best-of-2 fresh processes x best-of-3 in-
    # process runs — the same stabilisation treatment bench_scaling got
    # (round-3 regression turned out to be single-process tunnel luck:
    # r2 19.4 vs r3 16.4 on identical code paths). Each child warms from
    # the persistent compile cache. Every line EMITS as soon as it is
    # measured (a driver timeout mid-run must not lose finished
    # sections), and the headline is re-emitted at the very end (driver
    # contract: LAST line wins).
    paths = _make_data()
    headline: list[dict] = []

    def measure_headline_fresh():
        script = os.path.join(DATA_DIR, "headline_child.py")
        with open(script, "w") as f:
            f.write(_HEADLINE_CHILD)
        runs = []
        for _ in range(2):
            out = subprocess.run(
                [sys.executable, script, REPO, DATA_DIR, str(N_TIMED)],
                env=os.environ.copy(), capture_output=True, text=True,
                timeout=1800,
            )
            if out.returncode != 0:
                raise RuntimeError(out.stderr[-1500:])
            runs.append(json.loads(out.stdout.strip().splitlines()[-1]))
        v = max(r["genomes_per_s"] for r in runs)
        vc = max(r["compat_genomes_per_s"] for r in runs)
        headline.append({
            "metric": "genomes_sketched_per_s_per_chip",
            "value": round(v, 3),
            "unit": "genomes/s (5.3Mb gz fasta, k=10 s=6 l=3; best of 2 "
                    "fresh processes x best-of-3 runs)",
            "vs_baseline": round(v / BASELINE_GENOMES_PER_S, 3),
            "runs": [round(r["genomes_per_s"], 3) for r in runs],
            "backend": runs[0]["backend"],
        })
        _emit(headline[0])
        _emit({
            "metric": "genomes_sketched_per_s_per_chip_default_compat",
            "value": round(vc, 3),
            "unit": "genomes/s (5.3Mb gz fasta, k=10 s=6 l=3, DEFAULT "
                    "compat-order host dedup — byte-identical sketch "
                    "files; best of 2 fresh processes)",
            "runs": [round(r["compat_genomes_per_s"], 3) for r in runs],
        })

    _guard("genomes_sketched_per_s_per_chip", measure_headline_fresh)

    import public_kssd_tpu  # noqa: F401
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )

    from public_kssd_tpu import shufspace
    from public_kssd_tpu.config import SketchParams

    params = SketchParams(id=1, half_ctx_len=10, half_subctx_len=6, drlevel=3)
    # the framework's default shuffle space: computed Feistel permutation
    # (gather-free sketch kernel; identical .shuf interop — shufspace.py)
    shuffled_dev = shufspace.ComputedShuf(params.id, params.half_subctx_len)

    if jax.default_backend() not in ("cpu",):
        assert_pallas_correct(params, shuffled_dev)
        print("pallas-vs-jnp equality on TPU: OK", file=sys.stderr)

    timed = paths[2 : 2 + N_TIMED]
    _guard(
        "sketch_stage_breakdown",
        lambda: bench_sketch_breakdown(timed, params, shuffled_dev),
    )

    _guard("host_io_speed_of_light", bench_host_io)
    _guard("sketch_pairs_per_s_per_chip_10k", lambda: bench_counting())
    _guard(
        "sketch_pairs_per_s_per_chip_100k",
        lambda: bench_counting(n_qry=1000, n_ref=100_000),
    )
    _guard("counting_roofline", bench_counting_roofline)
    _guard("gtdb317k", bench_gtdb)
    _guard("gtdb_realskew", bench_gtdb_realskew)
    _guard("scaling_proxies", bench_scaling)

    # FINAL LINE = headline record + ALL metrics (compact, unit strings
    # stripped): the driver keeps only a stdout tail and parses the last
    # line, so this one line must carry the whole round's evidence —
    # round 4's tail truncated mid-run and lost every README headline
    # except sketching.
    # pruned: the driver keeps only ~3.4 KB of stdout tail, and this
    # line must fit INTACT or `parsed` breaks — prose and per-rep
    # arrays live in bench_results.json / the earlier full lines
    DROP = {
        "unit", "checksum", "cpu_s_per_step_all_reps", "wall_s",
        "matmul_crossover_by_n_ref", "scatter_note", "note", "runs",
        "ici_model_ms_per_gtdb_batch", "point_ratio_band", "band",
        "allreduce_bytes_per_step", "empty_step_cpu_s",
    }

    def _strip(obj):
        if isinstance(obj, dict):
            return {k: _strip(v) for k, v in obj.items() if k not in DROP}
        return obj

    summary = dict(headline[0]) if headline else {
        "metric": "bench_summary", "value": None,
    }
    summary.pop("runs", None)
    summary["all"] = {
        k: _strip(v) for k, v in RESULTS.items()
        if k != summary.get("metric")
    }
    print(json.dumps(summary, separators=(",", ":")), flush=True)


if __name__ == "__main__":
    main()
