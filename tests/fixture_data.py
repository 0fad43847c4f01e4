"""Deterministic synthetic inputs shared by tests and the golden
regeneration script (tests/make_goldens.py).

Everything is generated from fixed numpy seeds, so the byte content is
reproducible on any machine; only the golden OUTPUTS (produced once from
the reference C binary) are committed under tests/golden/.
"""

from __future__ import annotations

import gzip
import os

import numpy as np

N_REF_GENOMES = 4
N_QRY_GENOMES = 3
GENOME_SIZE = 200_000
QRY_SIZE = 150_000
N_READS = 3000
READ_LEN = 100


def _genome(rng: np.random.Generator, size: int) -> str:
    seq = rng.choice(list("ACGT"), size=size)
    seq[1000:1010] = "N"  # break run
    s = "".join(seq)
    return s[:5000] + s[5000:6000].lower() + s[6000:]


def _write_fasta_gz(path: str, s: str, label: str) -> None:
    recs = []
    third = len(s) // 3
    for c in range(3):
        part = s[c * third : (c + 1) * third]
        lines = "\n".join(part[j : j + 70] for j in range(0, len(part), 70))
        recs.append(f">contig_{c} synthetic {label}\n{lines}\n")
    with gzip.open(path, "wt") as f:
        f.write("".join(recs))


def make_genomes(root: str) -> tuple[list[str], list[str]]:
    """Create ref + query fasta.gz sets; returns (ref_files, qry_files)."""
    rng = np.random.default_rng(42)
    ref_dir = os.path.join(root, "genomes")
    qry_dir = os.path.join(root, "qry")
    os.makedirs(ref_dir, exist_ok=True)
    os.makedirs(qry_dir, exist_ok=True)
    refs, qrys = [], []
    for d, n, sz, out in (
        (ref_dir, N_REF_GENOMES, GENOME_SIZE, refs),
        (qry_dir, N_QRY_GENOMES, QRY_SIZE, qrys),
    ):
        for i in range(n):
            p = os.path.join(d, f"g{i}.fasta.gz")
            _write_fasta_gz(p, _genome(rng, sz), f"genome {i}")
            out.append(p)
    return refs, qrys


def make_fastq(root: str) -> list[str]:
    """Two fastq.gz read sets sampled from ref genome 0 (+ random reads,
    N injections, quality bytes 35..73 — includes '>' = 62 to exercise
    the byread pseudo-record quirk)."""
    rng = np.random.default_rng(7)
    ref_path = os.path.join(root, "genomes", "g0.fasta.gz")
    raw = gzip.open(ref_path, "rt").read()
    seq = "".join(ln for ln in raw.splitlines() if not ln.startswith(">"))
    out = []
    for fi in range(2):
        recs = []
        for i in range(N_READS):
            if rng.random() < 0.8:
                start = rng.integers(0, len(seq) - READ_LEN)
                r = seq[start : start + READ_LEN]
            else:
                r = "".join(rng.choice(list("ACGT"), size=READ_LEN))
            if rng.random() < 0.1:
                p = rng.integers(0, READ_LEN)
                r = r[:p] + "N" + r[p + 1 :]
            qual = "".join(chr(int(q)) for q in rng.integers(35, 74, size=len(r)))
            recs.append(f"@read{i}\n{r}\n+\n{qual}\n")
        p = os.path.join(root, f"reads{fi}.fq.gz")
        with gzip.open(p, "wt") as f:
            f.write("".join(recs))
        out.append(p)
    return out


def make_deep_fastq(root: str) -> str:
    """High-coverage read set (median abundance > 1) so the composite
    .abv path produces non-trivial vectors."""
    rng = np.random.default_rng(11)
    raw = gzip.open(os.path.join(root, "genomes", "g0.fasta.gz"), "rt").read()
    seq = "".join(ln for ln in raw.splitlines() if not ln.startswith(">"))
    recs = []
    for i in range(12000):
        start = rng.integers(0, len(seq) - READ_LEN)
        r = seq[start : start + READ_LEN]
        qual = "I" * len(r)
        recs.append(f"@deep{i}\n{r}\n+\n{qual}\n")
    p = os.path.join(root, "deep.fq.gz")
    with gzip.open(p, "wt") as f:
        f.write("".join(recs))
    return p


def make_tax_tsv(root: str) -> str:
    p = os.path.join(root, "tax.tsv")
    with open(p, "w") as f:
        f.write("101\tSpeciesA\n101\tSpeciesA\n202\tSpeciesB\n202\tSpeciesB\n")
    return p


def make_all(root: str) -> dict:
    refs, qrys = make_genomes(root)
    fq = make_fastq(root)
    deep = make_deep_fastq(root)
    tax = make_tax_tsv(root)
    # uncompressed copies for --byread (reference reads raw bytes)
    import shutil

    fa_plain = os.path.join(root, "g0.fasta")
    with gzip.open(refs[0], "rb") as fin, open(fa_plain, "wb") as fout:
        shutil.copyfileobj(fin, fout)
    fq_plain = os.path.join(root, "reads0.fq")
    with gzip.open(fq[0], "rb") as fin, open(fq_plain, "wb") as fout:
        shutil.copyfileobj(fin, fout)
    return {
        "refs": refs,
        "qrys": qrys,
        "fastq": fq,
        "deep_fastq": deep,
        "tax": tax,
        "fa_plain": fa_plain,
        "fq_plain": fq_plain,
    }
