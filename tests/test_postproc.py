"""Golden tests of the post-processing converter ports against the
ORIGINAL Perl scripts (/root/reference/src/*.pl) run by the system perl."""

import os
import shutil
import subprocess

import numpy as np
import pytest

from public_kssd_tpu import postproc

SRC = "/root/reference/src"

perl = shutil.which("perl")
pytestmark = pytest.mark.skipif(
    perl is None or not os.path.isdir(SRC),
    reason="perl or reference scripts unavailable",
)


def _mk_composite(path, rows):
    """Composite report rows: Qry Ref Share Avg Avgpct9899 Median Pct98."""
    with open(path, "w") as f:
        for r in rows:
            f.write("\t".join(str(x) for x in r) + "\n")


@pytest.fixture()
def fixture_files(tmp_path):
    rng = np.random.default_rng(2)
    comp = tmp_path / "composite.tsv"
    rows = []
    for i in range(40):
        psid = 1000 + i
        shkm = int(rng.integers(0, 40))
        avg = float(rng.uniform(0, 8))
        median = float(rng.integers(0, 4))
        rows.append((
            "/data/sampleA.fq.gz", f"{psid}_GCA_0000{i}.1_genomic",
            shkm, round(avg + 0.3, 4), round(avg, 4), median,
            round(avg + 0.5, 4),
        ))
    _mk_composite(comp, rows)
    tax = tmp_path / "psid2tax.tsv"
    with open(tax, "w") as f:
        for i in range(40):
            f.write(f"{1000 + i}\td__Bacteria\tp__P{i%3}\ts__Species {i}\n")
    # ncbi mapping + nodes: chain species -> genus -> ... -> superkingdom -> 1
    # psid -> ncbi species is 1:1, as in the real GTDB mapping: with
    # many-to-one mappings the PERL SCRIPT ITSELF is nondeterministic
    # (species pct = last-iterated psid under randomized hash order)
    ncbi = tmp_path / "psid2ncbi.tsv"
    nodes = tmp_path / "nodes.tsv"
    with open(ncbi, "w") as f:
        for i in range(40):
            f.write(f"{1000 + i}\t{5000 + i}\n")
    with open(nodes, "w") as f:
        ranks = list(postproc.RANKS)
        for i in range(40):
            sp = 5000 + i
            chain = [sp] + [6000 + 10 * j + i % 2 for j in range(6)]
            for lvl, node in enumerate(chain):
                rank = ranks[len(ranks) - 1 - lvl]
                pa = chain[lvl + 1] if lvl + 1 < len(chain) else 1
                f.write(f"{node}\t{rank}\t{pa}\tname_{node}\n")
    return comp, tax, ncbi, nodes


def test_krona_port_matches_perl(tmp_path, fixture_files):
    comp, tax, _, _ = fixture_files
    pdir, mydir = tmp_path / "perl_out", tmp_path / "py_out"
    subprocess.run(
        [perl, f"{SRC}/kssdcomposite2gtdb_tax_kronafmt.pl",
         str(comp), str(tax), str(pdir)],
        check=True, capture_output=True,
    )
    out = postproc.composite_to_krona(str(comp), str(tax), str(mydir))
    want = (pdir / "sampleA").read_text()
    got = open(out).read()
    assert os.path.basename(out) == "sampleA"
    assert got == want


def test_qiime_port_matches_perl(tmp_path, fixture_files):
    comp, tax, _, _ = fixture_files
    k1 = postproc.composite_to_krona(str(comp), str(tax), str(tmp_path / "k1"))
    # second sample: reuse the table with shuffled values
    k2 = str(tmp_path / "k2.tsv")
    lines = open(k1).read().splitlines()
    with open(k2, "w") as f:
        f.write("\n".join(reversed(lines)) + "\n")
    pdir, mydir = tmp_path / "perlq", tmp_path / "pyq"
    subprocess.run(
        [perl, f"{SRC}/merge_krona_otu_tabs2qiime.pl", str(pdir), k1, k2],
        check=True, capture_output=True,
    )
    postproc.merge_krona_to_qiime(str(mydir), [k1, k2])
    for fn in ("otu.tsv", "taxonomy.tsv", "meta.tsv"):
        assert (mydir / fn).read_text() == (pdir / fn).read_text(), fn


def test_cami_port_matches_perl(tmp_path, fixture_files):
    comp, _, ncbi, nodes = fixture_files
    r = subprocess.run(
        [perl, f"{SRC}/kssdcomposite2taxonomy_profilefmt.pl",
         str(comp), str(ncbi), str(nodes)],
        check=True, capture_output=True,
    )
    got = postproc.composite_to_cami(str(comp), str(ncbi), str(nodes))
    assert got == r.stdout.decode()


REAL_NCBI = "/root/reference/data/best.gtdbr207_psid2ncbi_specid.tsv"
REAL_NODES = "/root/reference/data/ncbitaxid_rank_parentnode_name.gtdbr207_pseudoidrelated.tsv"


@pytest.mark.skipif(
    not (os.path.isfile(REAL_NCBI) and os.path.isfile(REAL_NODES)),
    reason="GTDB r207 mapping files unavailable",
)
def test_cami_port_on_real_gtdb_mappings(tmp_path):
    """Golden vs perl on the REAL GTDB r207 fixture files (SURVEY C17):
    65k psid->ncbi mappings, 37k taxonomy nodes."""
    rng = np.random.default_rng(8)
    psids = []
    with open(REAL_NCBI) as f:
        for line in f:
            psids.append(line.split("\t")[0])
    picks = rng.choice(len(psids), size=60, replace=False)
    comp = tmp_path / "composite.tsv"
    rows = []
    for j, ix in enumerate(picks):
        shkm = int(rng.integers(0, 40))
        avg = float(rng.uniform(0, 9))
        median = float(rng.integers(0, 4))
        rows.append((
            f"/x/meta{j % 2}.fq.gz", f"{psids[ix]}_GCA_{j}.1",
            shkm, round(avg + 0.3, 4), round(avg, 4), median,
            round(avg + 0.4, 4),
        ))
    _mk_composite(comp, rows)
    r = subprocess.run(
        [perl, f"{SRC}/kssdcomposite2taxonomy_profilefmt.pl",
         str(comp), REAL_NCBI, REAL_NODES],
        check=True, capture_output=True,
    )
    got = postproc.composite_to_cami(str(comp), REAL_NCBI, REAL_NODES)
    # the PERL SCRIPT is nondeterministic across runs on this data
    # (equal-percentage ties ordered by randomized hash iteration;
    # verified: two perl invocations differ), so compare the canonical
    # sorted line multiset instead of raw bytes
    assert sorted(got.splitlines()) == sorted(r.stdout.decode().splitlines())


def _perl(script, *args, stdin=None):
    return subprocess.run(
        [perl, f"{SRC}/{script}", *map(str, args)],
        check=True, capture_output=True,
    ).stdout.decode()


def test_extract_taxid_matches_perl(tmp_path):
    g2t = tmp_path / "g2t.tsv"
    g2t.write_text("GCA_000001.1\t55\tEco\nGCF_000002.2\t66\nGCA_000003.1\t77\tSau\n")
    gl = tmp_path / "list.txt"
    gl.write_text("x_GCA_000001.1_y\nGCF_000002.2\nGCA_000009.9\n")
    assert postproc.extract_taxid(str(gl), str(g2t)) == _perl(
        "extract_taxid.pl", gl, g2t)


def test_ac2pseudotaxid_matches_perl(tmp_path):
    m = tmp_path / "m.tsv"
    m.write_text("AC1\t10\tnameA\nAC2\t20\nAC3\t30\tnameC\n")
    acs = tmp_path / "acs.txt"
    acs.write_text("AC2\nAC9\nAC1\n")
    assert postproc.ac2pseudotaxid(str(acs), str(m)) == _perl(
        "ac2pseudotaxid.pl", acs, m)


def test_csv_table_subset_matches_perl(tmp_path):
    csv = tmp_path / "all.csv"
    csv.write_text("a,1,2\nb,3,4\nc,5,6\n")
    sel = tmp_path / "sel.tsv"
    sel.write_text("c\textra\na\n")
    assert postproc.csv_table_subset(str(csv), str(sel)) == _perl(
        "csv_table_subset.pl", csv, sel)


def test_ncbi_ftp_matches_perl(tmp_path):
    t = tmp_path / "acc.tsv"
    t.write_text("GCA_000123456.1\tASM 12v1\nGCF_009876543.2\tXyz9\n")
    assert postproc.ncbi_accession2ftp(str(t)) == _perl(
        "NCBIaccession2ftp_address.pl", t)


def test_kmer_finder_matches_perl(tmp_path):
    fa = tmp_path / "x.fasta"
    fa.write_text(">r1 desc\nACGTacgTNNA\nCCGTA\n>r2\nGGGTTTacgt\n")
    got = set(postproc.kmer_finder(str(fa), 4))
    want = set(_perl("kmer_finder.pl", fa, 4).splitlines())
    assert got == want  # perl prints randomized hash order


def test_gtdbspecies2pseudo_taxid_matches_perl(tmp_path):
    m = tmp_path / "t2s.tsv"
    m.write_text(" 12 \tEscherichia coli\n34\tStaph aureus\n")
    nl = tmp_path / "names.txt"
    nl.write_text("Staph aureus\nUnknown sp\nEscherichia coli\n")
    assert postproc.gtdbspecies2pseudo_taxid(str(nl), str(m)) == _perl(
        "gtdbspecies2pseudo_taxid.pl", nl, m)


def test_gtdbspecies2ncbitaxonomy_matches_perl(tmp_path):
    db = tmp_path / "g2n.tsv"
    db.write_text(
        "d__B;s__Eco\t561\tEscherichia\n"
        "d__B;s__Eco\t562\tE. coli\n"
        "d__B;s__Sau\t1280\tS. aureus\n"
        "nospecies\t99\tX\n"
    )
    nl = tmp_path / "sp.txt"
    nl.write_text("Eco\nSau\nMissing\n")
    assert postproc.gtdbspecies2ncbitaxonomy(str(nl), str(db)) == _perl(
        "gtdbspecies2ncbitaxonomy.pl", nl, db)


def test_abv_match_metadata_matches_perl(tmp_path):
    meta = tmp_path / "meta.csv"
    meta.write_text(
        "run,bioproject,biosample,organism\n"
        "R1,P1,S1,Ecoli\nR2,P2,,\nR3,P3,S3,Worm\n"
    )
    abv = tmp_path / "abv.txt"
    abv.write_text("Qry\t0.99\nR1.abv\t0.88\nR2.abv\t0.77\nR9.abv\t0.5\n")
    assert postproc.abv_match_metadata(str(abv), str(meta)) == _perl(
        "abv_match_metaData.pl", abv, meta)


def test_gtdbpsid2ncbitax_matches_perl(tmp_path):
    t = tmp_path / "g.tsv"
    t.write_text(
        "GTDB_AC\theader\n"
        "GCA_1\t7\tEco\t2|561|562\tBacteria|Escherichia|E coli\n"
        "GCA_2\t7\tEco\t2|561|562\tBacteria|Escherichia|E coli\n"
        "GCA_3\t7\tEco\t2|561|563\tBacteria|Escherichia|E fergusonii\n"
        "GCA_4\t8\tSau\t2|1279|1280\tBacteria|Staph|S aureus\n"
        "badrow\t9\tX\t1|2\tA|B\n"
    )
    for flag in (0, 1):
        assert postproc.gtdbpsid2ncbitax_by_genomesupport(
            str(t), bool(flag)
        ) == _perl("gtdbpsid2ncbitax_by_genomesupport.pl", t, flag)
