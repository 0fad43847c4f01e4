"""Multi-device / multi-host search: reference DB sharded over a mesh.

The reference has no distributed backend at all (single node, OpenMP +
mmap; SURVEY.md §2). This module is the TPU-native scale-out design:

  * the CSR inverted index is sharded by CODE RANGE over the mesh axis
    ``ref`` — each device owns a contiguous slice of the sorted unique
    code space with its postings (balanced by postings mass),
  * query code batches are replicated over ``ref`` and sharded over the
    data-parallel axis ``dp``,
  * every device counts its queries against its DB shard with the same
    capacity-bounded expansion kernel as single-chip search, and the
    partial [n_qry, n_ref] counts merge with ``jax.lax.psum`` over
    ``ref`` — one ICI collective per batch.

Components are folded into a single uint64 key space
(key = id << comp_code_bits | component — a bijection of the reference's
(component, in-component id) pair, iseq2comem.c:540-543), so one sharded
index serves all components.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

if hasattr(jax, "shard_map"):  # jax >= 0.4.35
    shard_map = jax.shard_map
else:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

from public_kssd_tpu import formats
from public_kssd_tpu.config import SketchParams
from public_kssd_tpu.index import SparseIndex


@dataclasses.dataclass
class ShardedDB:
    """Code-range-sharded CSR index, padded to uniform per-shard shapes.

    Leading axis of every array is the shard axis (= mesh axis ``ref``).
    """

    uniq: np.ndarray  # uint64 [S, nnz_pad], pad = UINT64_MAX
    offsets: np.ndarray  # int64 [S, nnz_pad+1], pad rows repeat the end
    gids: np.ndarray  # uint32 [S, g_pad]
    n_ref: int
    n_shards: int
    row_bounds: np.ndarray  # int64 [S+1] shard cut rows in the merged CSR


def merge_components(
    components: list[SparseIndex], comp_code_bits: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fold per-component CSR indices into one uint64-keyed CSR."""
    keys, counts, gids = [], [], []
    for c, sp in enumerate(components):
        keys.append((sp.uniq_codes.astype(np.uint64) << np.uint64(comp_code_bits))
                    | np.uint64(c))
        counts.append(np.diff(sp.offsets).astype(np.int64))
        gids.append(sp.gids)
    key = np.concatenate(keys)
    cnt = np.concatenate(counts)
    gid = np.concatenate(gids)
    order = np.argsort(key, kind="stable")
    key = key[order]
    # reorder postings blocks: build gather of ragged blocks
    starts = np.zeros(cnt.size, dtype=np.int64)
    np.cumsum(cnt[:-1], out=starts[1:])
    from public_kssd_tpu.ops.count import _ragged_indices_np

    gid = gid[_ragged_indices_np(starts[order], cnt[order])]
    cnt = cnt[order]
    offsets = np.zeros(key.size + 1, dtype=np.int64)
    np.cumsum(cnt, out=offsets[1:])
    return key, offsets, gid


def query_keys(qry_dir: str, comp_code_bits: int) -> tuple[np.ndarray, np.ndarray]:
    """All query codes of a sketch dir as merged uint64 keys + query ids."""
    stat = formats.read_co_stat(qry_dir)
    keys, qids = [], []
    for c in range(stat.comp_num):
        codes, index = formats.read_combco(qry_dir, c)
        keys.append((codes.astype(np.uint64) << np.uint64(comp_code_bits))
                    | np.uint64(c))
        qids.append(
            np.searchsorted(
                index[1:], np.arange(codes.size, dtype=np.uint64), "right"
            ).astype(np.int32)
        )
    return np.concatenate(keys), np.concatenate(qids)


def build_sharded_db(
    key: np.ndarray, offsets: np.ndarray, gids: np.ndarray,
    n_ref: int, n_shards: int,
) -> ShardedDB:
    """Split a merged CSR into ``n_shards`` contiguous code ranges,
    balanced by postings mass, padded to uniform shapes."""
    total = int(offsets[-1])
    # balanced split points in postings space -> code-row boundaries
    targets = (np.arange(1, n_shards) * total) // n_shards
    cuts = np.searchsorted(offsets[1:], targets, side="left")
    row_bounds = np.concatenate([[0], cuts, [key.size]]).astype(np.int64)
    nnz_pad = max(1, int(np.max(np.diff(row_bounds))))
    g_pad = 1
    for s in range(n_shards):
        lo, hi = int(row_bounds[s]), int(row_bounds[s + 1])
        g_pad = max(g_pad, int(offsets[hi] - offsets[lo]))
    # padding waste telemetry: every shard is padded to the max shard's
    # shape (shard_map needs uniform blocks), so code-space skew inflates
    # HBM residency. The postings-balanced cut keeps this near 1.0 for
    # realistic DBs; a hot code region shows up here before it OOMs.
    waste_rows = n_shards * nnz_pad / max(key.size, 1)
    waste_gids = n_shards * g_pad / max(total, 1)
    if max(waste_rows, waste_gids) > 1.5:
        from public_kssd_tpu import utils

        utils.log.warning(
            "sharded DB padding waste: rows x%.2f, postings x%.2f over "
            "%d shards (skewed code space?) — HBM residency is the "
            "padded size", waste_rows, waste_gids, n_shards,
        )
    uniq = np.full((n_shards, nnz_pad), np.iinfo(np.uint64).max, dtype=np.uint64)
    offs = np.zeros((n_shards, nnz_pad + 1), dtype=np.int64)
    gd = np.zeros((n_shards, g_pad), dtype=np.uint32)
    for s in range(n_shards):
        lo, hi = int(row_bounds[s]), int(row_bounds[s + 1])
        n = hi - lo
        uniq[s, :n] = key[lo:hi]
        local = offsets[lo : hi + 1] - offsets[lo]
        offs[s, : n + 1] = local
        offs[s, n + 1 :] = local[-1] if n >= 0 else 0
        g = int(offsets[hi] - offsets[lo])
        gd[s, :g] = gids[int(offsets[lo]) : int(offsets[hi])]
    return ShardedDB(uniq=uniq, offsets=offs, gids=gd, n_ref=n_ref,
                     n_shards=n_shards, row_bounds=row_bounds)


def _count_partial(qry_keys, qry_qid, uniq, offsets, gids, n_qry, n_ref, capacity):
    """Per-shard counting (same algorithm as ops.count.count_shared_device,
    on uint64 keys). All inputs are the LOCAL shard block."""
    nnz = uniq.shape[0]
    row = jnp.searchsorted(uniq, qry_keys)
    row_c = jnp.clip(row, 0, nnz - 1)
    found = (row < nnz) & (uniq[row_c] == qry_keys) & (qry_qid >= 0)
    start = jnp.where(found, offsets[row_c], 0)
    length = jnp.where(found, offsets[row_c + 1] - offsets[row_c], 0)
    cum = jnp.cumsum(length)
    total = cum[-1]
    t = jnp.arange(capacity, dtype=jnp.int64)
    src = jnp.searchsorted(cum, t, side="right")
    src_c = jnp.clip(src, 0, length.shape[0] - 1)
    prev = jnp.where(src_c > 0, cum[jnp.maximum(src_c - 1, 0)], 0)
    pos = jnp.clip(start[src_c] + (t - prev), 0, gids.shape[0] - 1)
    rid = gids[pos].astype(jnp.int64)
    qid = qry_qid[src_c].astype(jnp.int64)
    valid = t < total
    flat = jnp.where(valid, qid * n_ref + rid, n_qry * n_ref)
    counts = jnp.zeros((n_qry * n_ref + 1,), jnp.uint32).at[flat].add(jnp.uint32(1))
    return counts[:-1].reshape(n_qry, n_ref)


def make_sharded_count_fn(
    mesh: Mesh, n_qry: int, n_ref: int, capacity: int,
    qry_axis: str = "dp", ref_axis: str = "ref",
):
    """jit-compiled 2-D SPMD counting step over ``mesh``.

    Inputs (global shapes):
      qry_keys uint64 [n_qry_pad_total_codes]  sharded over dp
      qry_qid  int32  [same]                   sharded over dp (LOCAL ids)
      db.uniq/offsets/gids                     sharded over ref (leading axis)
    Output: counts uint32 [n_qry, n_ref] sharded over dp on axis 0.

    n_qry is the PER-DP-SHARD query count; capacity the per-device pair
    budget.
    """

    def step(qk, qq, uniq, offsets, gids):
        partial = _count_partial(
            qk, qq, uniq[0], offsets[0], gids[0], n_qry, n_ref, capacity
        )
        return jax.lax.psum(partial, ref_axis)

    fn = shard_map(
        step,
        mesh=mesh,
        in_specs=(
            P(qry_axis), P(qry_axis),
            P(ref_axis, None), P(ref_axis, None), P(ref_axis, None),
        ),
        out_specs=P(qry_axis, None),
    )
    return jax.jit(fn)


def sharded_search_counts(
    qry_dir: str,
    components: list[SparseIndex],
    comp_code_bits: int | SketchParams,
    mesh: Mesh,
    qry_axis: str = "dp",
    ref_axis: str = "ref",
    batch: int = 0,
    counts_out: np.ndarray | None = None,
) -> np.ndarray:
    """End-to-end sharded counting of a query sketch dir against CSR
    components; returns uint32 [n_qry, n_ref]. ``comp_code_bits`` is the
    component-fold shift (SketchParams accepted for convenience).

    ``batch`` bounds the query rows counted per device step (the -m
    governor: the DB shards stay resident, only the per-step count
    matrix block and query pad scale with the batch); ``counts_out``
    (e.g. a np.memmap) receives the rows so host RAM stays bounded.
    """
    if isinstance(comp_code_bits, SketchParams):
        comp_code_bits = comp_code_bits.comp_code_bits
    n_ref = components[0].n_genomes
    key, offsets, gids = merge_components(components, comp_code_bits)
    n_ref_shards = mesh.shape[ref_axis]
    db = build_sharded_db(key, offsets, gids, n_ref, n_ref_shards)

    qk_all, qq_all = query_keys(qry_dir, comp_code_bits)
    stat = formats.read_co_stat(qry_dir)
    n_qry_total = stat.infile_num
    out = (
        counts_out
        if counts_out is not None
        else np.zeros((n_qry_total, n_ref), dtype=np.uint32)
    )
    # DB shards go on-device ONCE; query batches stream against them
    sh_ref = NamedSharding(mesh, P(ref_axis, None))
    db_dev = tuple(
        jax.make_array_from_callback(a.shape, sh_ref, lambda i, a=a: a[i])
        for a in (db.uniq, db.offsets, db.gids)
    )
    batch = batch or n_qry_total
    for b0 in range(0, n_qry_total, batch):
        b1 = min(b0 + batch, n_qry_total)
        m = (qq_all >= b0) & (qq_all < b1)
        out[b0:b1] = _sharded_count_block(
            qk_all[m], qq_all[m] - b0, b1 - b0, key, offsets, db, db_dev,
            mesh, qry_axis, ref_axis,
        )
    return out


def _sharded_count_block(
    qk, qq, n_qry: int, key, offsets, db: ShardedDB, db_dev,
    mesh: Mesh, qry_axis: str, ref_axis: str,
) -> np.ndarray:
    """Count one contiguous block of queries (LOCAL ids [0, n_qry)) against
    a prebuilt ShardedDB; returns uint32 [n_qry, n_ref]."""
    n_ref = db.n_ref
    n_ref_shards = db.n_shards
    n_dp = mesh.shape[qry_axis]
    # partition queries over dp: contiguous query-id blocks
    per_dp = -(-n_qry // n_dp)
    L = 0
    blocks = []
    for d in range(n_dp):
        qlo, qhi = d * per_dp, min((d + 1) * per_dp, n_qry)
        m = (qq >= qlo) & (qq < qhi)
        blocks.append((qk[m], qq[m] - qlo))
        L = max(L, int(m.sum()))
    L = max(1 << max(int(max(L - 1, 1)).bit_length(), 6), 64)
    qk_pad = np.zeros((n_dp, L), dtype=np.uint64)
    qq_pad = np.full((n_dp, L), -1, dtype=np.int32)
    for d, (k_, q_) in enumerate(blocks):
        qk_pad[d, : k_.size] = k_
        qq_pad[d, : q_.size] = q_

    # capacity: max matching pairs over (dp, ref-shard) PAIRS — the
    # per-DEVICE pair budget. Bucketing the postings lengths by the
    # shard owning each matched row keeps the budget ~1/S of the full-DB
    # pair count (round-1 used the full-DB max, so every device paid the
    # unsharded expansion cost).
    cap = 64
    for d in range(n_dp):
        row = np.searchsorted(key, qk_pad[d])
        row_c = np.clip(row, 0, key.size - 1)
        found = (row < key.size) & (key[row_c] == qk_pad[d]) & (qq_pad[d] >= 0)
        lens = ((offsets[row_c + 1] - offsets[row_c]) * found).astype(np.int64)
        shard_of = np.searchsorted(db.row_bounds[1:-1], row_c, side="right")
        per_shard = np.bincount(shard_of, weights=lens, minlength=n_ref_shards)
        cap = max(cap, int(per_shard.max()))
    capacity = 1 << int(max(cap - 1, 1)).bit_length()

    fn = make_sharded_count_fn(
        mesh, per_dp, n_ref, capacity, qry_axis, ref_axis
    )
    qk_flat = qk_pad.reshape(-1)
    qq_flat = qq_pad.reshape(-1)
    # explicit sharded placement: each device receives ONLY its DB shard
    # slice (already resident via db_dev — no whole-DB device replication
    # and no per-batch re-upload). Built with make_array_from_callback so
    # the SAME code runs multi-process (jax.distributed): each process
    # materialises only the shards its local devices own.
    sh_dp = NamedSharding(mesh, P(qry_axis))

    def put(arr, sh):
        return jax.make_array_from_callback(arr.shape, sh, lambda i: arr[i])

    with mesh:
        out = fn(put(qk_flat, sh_dp), put(qq_flat, sh_dp), *db_dev)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        counts = np.asarray(multihost_utils.process_allgather(out, tiled=True))
    else:
        counts = np.asarray(out)
    # counts rows are per-dp-shard blocks stacked: [n_dp*per_dp, n_ref]
    return counts[:n_qry]
