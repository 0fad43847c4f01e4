"""Metagenomic composition analysis (abundance estimation + .abv search).

Reference: command_composite.c.

  get_species_abundance (-r ref -q qry): per query sample, intersect the
  query's abundance-annotated sketch (koc) with every reference genome's
  sketch, then report per-reference matched-k-mer count, mean, 98-99
  percentile mean, median and max (:389-547) — or write a normalised
  binary abundance vector (.abv) with -b.

  index_abv (-i): fold all .abv under <ref>/abundance_Vec into an
  inverted abundance matrix + L2 norms (:317-387).

  abv_search (-s 0|1|2): cosine / L1 / L2 sample-vs-sample search over
  that matrix (:206-316).

TPU note: the intersection is a sorted searchsorted join (vectorised);
the reference's per-reference OpenMP hash probing is not needed. The
sample-vs-sample search is a sparse dot/distance — for large databases
this becomes a dense [samples x species] matmul on the MXU; the host
implementation here follows the reference's sparse walk for exact parity.
"""

from __future__ import annotations

import math
import os

import numpy as np

from public_kssd_tpu import formats

BINVEC_DIRNAME = "abundance_Vec"  # command_composite.c:34
MIN_KM_S = 6  # command_composite.c:489-491
ST_PCTL = 0.98
ED_PCTL = 0.99


def species_abundance(
    ref_dir: str,
    qry_dir: str,
    out_dir: str | None = None,
    binvec: bool = False,
) -> str:
    """-r/-q composition analysis; returns the text report. With
    ``binvec`` also writes .abv files (get_species_abundance,
    command_composite.c:389-547)."""
    ref_stat = formats.read_co_stat(ref_dir)
    qry_stat = formats.read_co_stat(qry_dir)
    if not qry_stat.koc:
        raise ValueError("get_species_abundance(): query has not abundance")
    n_ref = ref_stat.infile_num
    # the DB is read ONCE (not per query), and the per-ref OpenMP probe
    # loop of the reference (command_composite.c:464-481) becomes one
    # vectorised searchsorted over ALL ref codes + a (ref, abundance)
    # lexsort — O(|DB| log |qry|) per query with no per-ref Python loop,
    # which is what makes the 317k-genome GTDB use case feasible.
    comps = []
    for c in range(ref_stat.comp_num):
        ref_codes, ref_index = formats.read_combco(ref_dir, c)
        rid_of = np.searchsorted(
            ref_index[1:], np.arange(ref_codes.size, dtype=np.uint64), "right"
        ).astype(np.int64)
        qry_codes, qry_index, qry_abund = formats.read_combco(
            qry_dir, c, with_abund=True
        )
        comps.append((ref_codes, rid_of, qry_codes, qry_index, qry_abund))
    lines: list[str] = []
    for qn in range(qry_stat.infile_num):
        rid_hits: list[np.ndarray] = []
        ab_hits: list[np.ndarray] = []
        for ref_codes, rid_of, qry_codes, qry_index, qry_abund in comps:
            q_lo, q_hi = int(qry_index[qn]), int(qry_index[qn + 1])
            qc = qry_codes[q_lo:q_hi]
            qa = qry_abund[q_lo:q_hi]
            if qc.size == 0:
                continue
            order = np.argsort(qc, kind="stable")
            sq, sa = qc[order], qa[order]
            pos = np.searchsorted(sq, ref_codes)
            pos_c = np.clip(pos, 0, max(sq.size - 1, 0))
            hit = (pos < sq.size) & (sq.size > 0)
            hit &= np.where(hit, sq[pos_c] == ref_codes, False)
            rid_hits.append(rid_of[hit])
            ab_hits.append(sa[pos_c[hit]].astype(np.int64))
        rids = np.concatenate(rid_hits) if rid_hits else np.zeros(0, np.int64)
        abunds = np.concatenate(ab_hits) if ab_hits else np.zeros(0, np.int64)
        counts = np.bincount(rids, minlength=n_ref)
        # per-ref ascending abundance slices in one global lexsort
        o = np.lexsort((abunds, rids))
        vals_sorted = abunds[o]
        seg_end = np.cumsum(counts)
        # descending by matched count; ties keep smaller ref id first
        # (the reference's qsort is unstable on ties — avoid ties in tests)
        order = np.argsort(-counts, kind="stable")
        binvec_rows: list[tuple[int, np.float32]] = []
        binvec_sum = np.float32(0)
        for rn in order:
            kmer_num = int(counts[rn])
            if kmer_num < MIN_KM_S:
                break
            vals = vals_sorted[seg_end[rn] - kmer_num : seg_end[rn]]
            arr1 = np.concatenate([[0], vals])  # reference is 1-indexed
            total = int(vals.sum())
            median_val = int(arr1[kmer_num // 2])
            st = int(kmer_num * ST_PCTL)
            ed = kmer_num * ED_PCTL
            lastvals = [int(arr1[n]) for n in range(st, kmer_num + 1) if n <= ed]
            lastsum, lastn = sum(lastvals), len(lastvals)
            pctl_mean = np.float32(lastsum) / np.float32(lastn)
            if binvec:
                if median_val > 1 and kmer_num > MIN_KM_S + 1:
                    binvec_rows.append((int(rn), pctl_mean))
                    binvec_sum += pctl_mean
            else:
                mean = np.float32(total) / np.float32(kmer_num)
                lines.append(
                    f"{qry_stat.names[qn]}\t{ref_stat.names[rn]}\t{kmer_num}\t"
                    f"{float(mean):.6f}\t{float(pctl_mean):.6f}\t"
                    f"{median_val}\t{int(arr1[kmer_num])}\n"
                )
        if binvec:
            out = out_dir or os.path.join(ref_dir, BINVEC_DIRNAME)
            os.makedirs(out, exist_ok=True)
            num_pass = len(binvec_rows)
            denom = binvec_sum - np.float32(num_pass)
            idxs = np.array([r for r, _ in binvec_rows], dtype=np.int32)
            pcts = np.array(
                [
                    (p - np.float32(1)) * np.float32(100) / denom
                    for _, p in binvec_rows
                ],
                dtype=np.float32,
            )
            fname = os.path.basename(qry_stat.names[qn]) + ".abv"
            formats.write_abv(os.path.join(out, fname), idxs, pcts)
    return "".join(lines)


def index_abv(ref_dir: str) -> None:
    """-i: build the inverted abundance matrix over <ref>/abundance_Vec
    (index_abv, command_composite.c:317-387). Files are folded in sorted
    name order (the reference uses readdir order — document accordingly)."""
    abv_dir = os.path.join(ref_dir, BINVEC_DIRNAME)
    ref_stat = formats.read_co_stat(ref_dir)
    names = sorted(n for n in os.listdir(abv_dir) if n.endswith(".abv"))
    per_species: list[list[tuple[int, np.float32]]] = [
        [] for _ in range(ref_stat.infile_num)
    ]
    y_l2n = []
    for fi, name in enumerate(names):
        arr = formats.read_abv(os.path.join(abv_dir, name))
        y_l2n.append(math.sqrt(float(np.sum(arr["pct"].astype(np.float64) ** 2))))
        for ridx, pct in zip(arr["ref_idx"], arr["pct"]):
            per_species[ridx].append((fi, pct))
    base = os.path.join(ref_dir, BINVEC_DIRNAME)
    with open(base + ".name", "w") as f:
        for n in names:
            f.write(n + "\n")
    np.array(y_l2n, dtype="<f8").tofile(base + ".yl2n")
    rows = [r for sp in per_species for r in sp]
    formats.write_abv(
        base + ".abm",
        np.array([r[0] for r in rows], dtype=np.int32),
        np.array([r[1] for r in rows], dtype=np.float32),
    )
    counts = np.array([len(sp) for sp in per_species], dtype=np.int64)
    np.cumsum(counts).astype("<i4").tofile(base + ".abmi")


def abv_search(ref_dir: str, queries: list[str], mode: int) -> str:
    """-s 0|1|2: cosine / L1 / L2 search of query .abv against the indexed
    matrix (abv_search, command_composite.c:206-316); returns the report."""
    base = os.path.join(ref_dir, BINVEC_DIRNAME)
    with open(base + ".name") as f:
        names = [ln.rstrip("\n") for ln in f if ln.strip()]
    y_l2n = np.fromfile(base + ".yl2n", dtype="<f8", count=len(names))
    abm_idx = np.fromfile(base + ".abmi", dtype="<i4")
    abm = formats.read_abv(base + ".abm")
    out = []
    for qpath in queries:
        if not qpath.endswith(".abv"):
            out.append(f"argument {qpath} is not a .abv file, skipped\n")
            continue
        if "/" not in qpath:
            qpath = os.path.join(base, qpath)
        q = formats.read_abv(qpath)
        measure = {}
        xny = {}
        xl2n = np.float32(0)
        order_first_seen: list[int] = []
        for d in range(len(q)):
            ridx = int(q["ref_idx"][d])
            xpct = np.float32(q["pct"][d])
            xl2n += xpct * xpct
            lo = int(abm_idx[ridx - 1]) if ridx > 0 else 0
            hi = int(abm_idx[ridx])
            for j in range(lo, hi):
                fid = int(abm["ref_idx"][j])
                ypct = np.float32(abm["pct"][j])
                if fid not in measure:
                    measure[fid] = np.float32(0)
                    xny[fid] = [np.float32(0), np.float32(0)]
                    order_first_seen.append(fid)
                if mode == 1:
                    measure[fid] += np.float32(abs(float(ypct) - float(xpct)))
                    xny[fid][0] += xpct
                    xny[fid][1] += ypct
                elif mode == 2:
                    measure[fid] += (ypct - xpct) * (ypct - xpct)
                else:
                    measure[fid] += ypct * xpct
        if mode == 0:
            for fid in order_first_seen:
                measure[fid] = np.float32(
                    float(measure[fid]) / (math.sqrt(float(xl2n)) * y_l2n[fid])
                )
        out.append("#Sample\t")
        if mode == 1:
            for fid in order_first_seen:
                measure[fid] += np.float32(
                    2 * 100 - float(xny[fid][0]) - float(xny[fid][1])
                )
            ranked = sorted(order_first_seen, key=lambda f: float(measure[f]))
            out.append("L1norm\n")
            for fid in ranked:
                out.append(f"{names[fid]}\t{float(measure[fid]):.6f}\n")
        elif mode == 2:
            ranked = sorted(order_first_seen, key=lambda f: float(measure[f]))
            out.append("L2norm\n")
            for fid in ranked:
                out.append(f"{names[fid]}\t{math.sqrt(float(measure[fid])):.6f}\n")
        else:
            ranked = sorted(order_first_seen, key=lambda f: float(measure[f]))
            out.append("CosineXY\n")
            for fid in reversed(ranked):
                out.append(f"{names[fid]}\t{float(measure[fid]):.6f}\n")
    return "".join(out)


def abv_search_device(ref_dir: str, queries: list[str], mode: int) -> str:
    """Device (MXU) dense formulation of the .abv sample search — the
    "sample-search = matmul" design of SURVEY.md C13.

    Abundance vectors densify to a [n_samples, n_species] float32 matrix;
    cosine similarity is one ``jnp.dot`` on the MXU, L1/L2 are fused VPU
    reductions. Scales to the 317k-species GTDB matrix where the sparse
    walk is pointer-chasing.

    Semantics notes vs the reference walk (command_composite.c:206-316):
    float32 accumulation ORDER differs (last-digit formatting may differ),
    and L2 here is the true distance over full vectors — the reference
    sums squared differences only over dimensions present in BOTH vectors.
    Like the reference, only samples sharing >= 1 dimension are reported.
    """
    import jax.numpy as jnp

    base = os.path.join(ref_dir, BINVEC_DIRNAME)
    with open(base + ".name") as f:
        names = [ln.rstrip("\n") for ln in f if ln.strip()]
    abm_idx = np.fromfile(base + ".abmi", dtype="<i4")
    abm = formats.read_abv(base + ".abm")
    n_species = abm_idx.size
    n_samples = len(names)
    dense = np.zeros((n_samples, n_species), dtype=np.float32)
    starts = np.concatenate([[0], abm_idx[:-1]]).astype(np.int64)
    for r in range(n_species):
        seg = abm[int(starts[r]): int(abm_idx[r])]
        dense[seg["ref_idx"], r] = seg["pct"]
    y = jnp.asarray(dense)
    y_norm = jnp.sqrt((y.astype(jnp.float32) ** 2).sum(axis=1))
    out = []
    for qpath in queries:
        if not qpath.endswith(".abv"):
            out.append(f"argument {qpath} is not a .abv file, skipped\n")
            continue
        if "/" not in qpath:
            qpath = os.path.join(base, qpath)
        q = formats.read_abv(qpath)
        xv = np.zeros(n_species, dtype=np.float32)
        xv[q["ref_idx"]] = q["pct"]
        x = jnp.asarray(xv)
        shared = np.asarray((y > 0) @ (x > 0))  # >=1 common dimension
        if mode == 1:
            m = np.asarray(jnp.abs(y - x[None, :]).sum(axis=1))
            label, ascending = "L1norm", True
        elif mode == 2:
            m = np.asarray(jnp.sqrt(((y - x[None, :]) ** 2).sum(axis=1)))
            label, ascending = "L2norm", True
        else:
            dots = jnp.dot(y, x, preferred_element_type=jnp.float32)
            m = np.asarray(dots / (jnp.linalg.norm(x) * y_norm))
            label, ascending = "CosineXY", False
        fids = np.flatnonzero(shared)
        order = fids[np.argsort(m[fids] if ascending else -m[fids],
                                kind="stable")]
        out.append(f"#Sample\t{label}\n")
        for fid in order:
            out.append(f"{names[int(fid)]}\t{float(m[fid]):.6f}\n")
    return "".join(out)


def read_abv_text(paths: list[str]) -> str:
    """-d: dump .abv files (read_abv, command_composite.c:184-203)."""
    out = []
    for p in paths:
        if not p.endswith(".abv"):
            out.append(f"argument {p} is not a .abv file, skipped\n")
            continue
        arr = formats.read_abv(p)
        for row in arr:
            out.append(f"{int(row['ref_idx'])}\t{float(row['pct']):f}\n")
    return "".join(out)


def cmd_composite(args) -> int:
    if args.refdir:
        if args.qrydir:
            report = species_abundance(
                args.refdir,
                args.qrydir,
                out_dir=args.outdir if len(args.outdir) >= 3 else None,
                binvec=args.binvec,
            )
            print(report, end="")
            return 0
        if args.idxbv:
            index_abv(args.refdir)
            return 0
        if args.searchbv != -1:
            if 0 <= args.searchbv < 3 and args.remaining:
                fn = abv_search_device if getattr(args, "device_search", False) else abv_search
                print(fn(args.refdir, args.remaining, args.searchbv), end="")
                return 0
            print("Usage: kssd_tpu composite -r <ref> -s <0|1|2> <query.abv>")
            return 1
        print("Usage: kssd_tpu composite -r <ref> < mode: -q | -i | -s >")
        return 1
    if args.readabv:
        print(read_abv_text(args.remaining), end="")
        return 0
    print("Usage: kssd_tpu composite -r <ref> < mode: -q | -i | -s >")
    return -1
