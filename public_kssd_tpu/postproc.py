"""Post-processing converters: kssd composite output -> Krona / QIIME /
CAMI taxonomic-profile formats.

Faithful Python ports of the three most-used reference Perl scripts
(SURVEY.md C16); each is golden-tested against the original script run
by the system perl:

  krona  <- src/kssdcomposite2gtdb_tax_kronafmt.pl   (73 LoC)
  qiime  <- src/merge_krona_otu_tabs2qiime.pl        (73 LoC)
  cami   <- src/kssdcomposite2taxonomy_profilefmt.pl (136 LoC)

Perl quirks (non-obvious but reproduced on purpose): `split /\\t+/`
collapses consecutive tabs, numeric psid tie-break in the Krona sort,
the CAMI converter OVERWRITES (not sums) duplicate psid->same-species
abundances while ancestors accumulate per psid (with a many-to-one
psid mapping the Perl is nondeterministic — randomized hash order picks
the surviving psid; the real GTDB mapping is 1:1, and this port uses
composite-file order), and a node whose parent
is the root gets an empty TAXPATH.
"""

from __future__ import annotations

import os
import re

# thresholds (kssdcomposite2gtdb_tax_kronafmt.pl:7-12)
KRONA_MEDIAN_THR = 1.0
KRONA_AVG_THR = 3.0
KRONA_SHKM_THR = 8.0
KRONA_LOW_AVG_THR = 2.0
KRONA_SMALL_VAL = 0.1

# thresholds (kssdcomposite2taxonomy_profilefmt.pl:7-12)
CAMI_MEDIAN_THR = 1.0
CAMI_AVG_THR = 3.0
CAMI_SHKM_THR = 7.0
CAMI_LOW_AVG_THR = 2.0
CAMI_SMALL_VAL = 0.001

_CMP_FMT = (".gz",)
_SEQ_FMT = (".fq", ".fastq", ".fa", ".fna", ".fas", ".fasta")

RANKS = ("superkingdom", "phylum", "class", "order", "family", "genus",
         "species")


def _basename_strip(path: str) -> str:
    """File::Basename::basename with the .gz then seq-suffix strips
    (kssdcomposite2gtdb_tax_kronafmt.pl:30-37)."""
    b = os.path.basename(path)
    for s in _CMP_FMT:
        if b.endswith(s):
            b = b[: -len(s)]
            break
    for s in _SEQ_FMT:
        if b.endswith(s):
            b = b[: -len(s)]
            break
    return b


def composite_to_krona(composite_tsv: str, psid2tax_tsv: str, outdir: str) -> str:
    """kssdcomposite2gtdb_tax_kronafmt.pl: one sample's composite report
    -> Krona-format <outdir>/<sample>. Returns the output path."""
    tax = {}
    with open(psid2tax_tsv) as f:
        for line in f:
            parts = re.split(r"\t+", line.rstrip("\n"))
            psid = parts[0].replace(" ", "")
            tax[psid] = "\t".join(parts[1:])

    depth: dict[str, float] = {}
    total = 0.0
    sample = "NULL"
    seen: set[str] = set()
    with open(composite_tsv) as f:
        for line in f:
            parts = re.split(r"\t+", line.rstrip("\n"))
            sample_raw, ref, shkm, avg, median = (
                parts[0], parts[1], parts[2], parts[4], parts[5]
            )
            sample = _basename_strip(sample_raw)
            if sample not in seen:
                seen.add(sample)
                if len(seen) > 1:
                    raise SystemExit(
                        "Error: Client mode only accept 1 sample one time"
                    )
            psid = ref.split("_")[0]
            shkm, avg, median = float(shkm), float(avg), float(median)
            if shkm <= KRONA_SHKM_THR:
                continue
            if avg > KRONA_AVG_THR and median > KRONA_MEDIAN_THR:
                depth[psid] = avg - KRONA_AVG_THR
                total += depth[psid]
            elif avg >= KRONA_LOW_AVG_THR:
                depth[psid] = max(avg - KRONA_AVG_THR, KRONA_SMALL_VAL)
                total += depth[psid]

    os.makedirs(outdir, exist_ok=True)
    out = os.path.join(outdir, sample)
    with open(out, "w") as f:
        for psid in sorted(depth, key=lambda p: (-depth[p], float(p))):
            f.write("%.4f\t%s\n" % (depth[psid] * 100 / total, tax.get(psid, "")))
    return out


def merge_krona_to_qiime(outdir: str, krona_files: list[str]) -> None:
    """merge_krona_otu_tabs2qiime.pl: Krona tables -> otu.tsv +
    taxonomy.tsv + meta.tsv in ``outdir``."""
    os.makedirs(outdir, exist_ok=True)
    taxa2otu: dict[str, int] = {}
    otu2taxa: list[str] = []
    abund: dict[tuple[int, int], str] = {}
    for j, path in enumerate(krona_files):
        with open(path) as f:
            for line in f:
                row = line.rstrip("\n").split("\t")
                val, taxa = row[0], ";".join(row[1:])
                if taxa not in taxa2otu:
                    taxa2otu[taxa] = len(otu2taxa)
                    otu2taxa.append(taxa)
                abund[(taxa2otu[taxa], j)] = val
    with open(os.path.join(outdir, "otu.tsv"), "w") as otu, open(
        os.path.join(outdir, "taxonomy.tsv"), "w"
    ) as taxf, open(os.path.join(outdir, "meta.tsv"), "w") as meta:
        meta.write("sample-id\n")
        otu.write("#OTU")
        for path in krona_files:
            otu.write("\t" + path)
            meta.write(path + "\n")
        otu.write("\n")
        for i, taxa in enumerate(otu2taxa):
            otu.write(f"OTU_{i}")
            taxf.write(f"OTU_{i}\t{taxa}\n")
            for j in range(len(krona_files)):
                otu.write("\t" + abund.get((i, j), "0"))
            otu.write("\n")


def composite_to_cami(
    composite_tsv: str, psid2ncbi_tsv: str, nodes_tsv: str
) -> str:
    """kssdcomposite2taxonomy_profilefmt.pl: composite report(s) ->
    CAMI taxonomic-profile text (returned; the Perl prints to stdout)."""
    node2rank, node2pa, node2name = {}, {}, {}
    with open(nodes_tsv) as f:
        for line in f:
            node, rank, pa, name = re.split(r"\t+", line.rstrip("\n"))[:4]
            node2rank[node] = rank
            node2pa[node] = pa
            node2name[node] = name
    psid2ncbi = {}
    with open(psid2ncbi_tsv) as f:
        for line in f:
            psid, ncbi = re.split(r"\t+", line.rstrip("\n"))[:2]
            psid2ncbi[psid] = ncbi

    data: dict[str, dict[str, float]] = {}
    total: dict[str, float] = {}
    order: list[str] = []
    with open(composite_tsv) as f:
        for line in f:
            parts = re.split(r"\t+", line.rstrip("\n"))
            sample, ref, shkm, avg, median = (
                parts[0], parts[1], float(parts[2]), float(parts[4]),
                float(parts[5]),
            )
            sample = re.sub(r"[^0-9a-zA-Z_.]", "_", sample)
            psid = ref.split("_")[0]
            if avg > CAMI_AVG_THR and median > CAMI_MEDIAN_THR and shkm > CAMI_SHKM_THR:
                d = avg - CAMI_AVG_THR
            elif avg >= CAMI_LOW_AVG_THR and shkm > CAMI_SHKM_THR:
                d = max(avg - CAMI_AVG_THR, CAMI_SMALL_VAL)
            else:
                continue
            if sample not in data:
                data[sample] = {}
                total[sample] = 0.0
                order.append(sample)
            data[sample][psid] = d
            total[sample] += d

    out = []
    for sample in order:
        rank_cate: dict[str, list[str]] = {r: [] for r in RANKS}
        ab: dict[str, float] = {}
        for psid, d in data[sample].items():
            sp = psid2ncbi[psid]
            if sp not in ab:
                rank_cate.setdefault(node2rank[sp], []).append(sp)
            # Perl overwrites duplicate psid->species abundance (=, not +=)
            ab[sp] = d / total[sample] * 100
            node = node2pa[sp]
            while node != "1":
                if node not in ab:
                    rank_cate.setdefault(node2rank[node], []).append(node)
                    ab[node] = 0.0
                ab[node] += ab[sp]
                node = node2pa[node]
        out.append("# Taxonomic Profiling Output")
        out.append(f"@SampleID:{sample}")
        out.append("@Version:0.9.1")
        out.append("@Ranks:superkingdom|phylum|class|order|family|genus|species")
        out.append("@TaxonomyID:ncbi-taxonomy_2021.07.19")
        out.append("@__program__:kssd2")
        out.append("@@TAXID\tRANK\tTAXPATH\tTAXPATHSN\tPERCENTAGE")
        for rank in RANKS:
            for taxid in sorted(rank_cate.get(rank, []), key=lambda t: -ab[t]):
                path, names = [], []
                node = taxid
                # a node whose parent is the root gets an EMPTY path
                # (the Perl loop guards on the parent, :95-101)
                while node2pa[node] != "1":
                    if node2rank[node] in RANKS:
                        path.append(node)
                        names.append(node2name[node])
                    node = node2pa[node]
                out.append(
                    f"{taxid}\t{rank}\t{'|'.join(reversed(path))}"
                    f"\t{'|'.join(reversed(names))}\t{ab[taxid]:.4f}"
                )
    return "\n".join(out) + "\n"


def cmd_convert(args) -> int:
    """CLI dispatch for the ``convert`` subcommand."""
    if args.mode == "krona":
        p = composite_to_krona(args.inputs[0], args.tax, args.outdir)
        print(p)
        return 0
    if args.mode == "qiime":
        merge_krona_to_qiime(args.outdir, args.inputs)
        return 0
    if args.mode == "cami":
        text = composite_to_cami(args.inputs[0], args.tax, args.nodes)
        import sys

        sys.stdout.write(text)
        return 0
    return 2
