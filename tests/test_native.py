"""Native C helpers must agree exactly with the python implementations."""

import gzip

import numpy as np
import pytest

from public_kssd_tpu import native, seqio
from public_kssd_tpu.config import SketchParams
from public_kssd_tpu import hashdedup


needs_native = pytest.mark.skipif(
    native.get_lib() is None, reason="native toolchain unavailable"
)


def _random_fasta(rng, n=50_000) -> bytes:
    chars = rng.choice(
        list(b">ACGTNacgtn \r\n\nxQ7"), size=n, p=None
    )
    return bytes(chars.tolist())


@needs_native
def test_fasta_parser_matches_python():
    rng = np.random.default_rng(0)
    for trial in range(8):
        raw = _random_fasta(rng)
        a = native.fasta_to_codes(raw)
        b = seqio.fasta_to_codes_py(raw)
        np.testing.assert_array_equal(a, b, err_msg=f"trial {trial}")
    # realistic fasta
    raw = b">chr1 desc\nACGTACGTNNNNacgt\nACGT\n>chr2\nTTTT\nGGGG\n"
    np.testing.assert_array_equal(
        native.fasta_to_codes(raw), seqio.fasta_to_codes_py(raw)
    )


@needs_native
def test_fastq_parser_matches_python():
    rng = np.random.default_rng(1)
    recs = []
    for i in range(200):
        n = int(rng.integers(5, 120))
        seq = bytes(rng.choice(list(b"ACGTN"), size=n).tolist())
        qual = bytes(rng.integers(33, 75, size=n).astype(np.uint8).tolist())
        recs.append(b"@r%d\n%s\n+\n%s\n" % (i, seq, qual))
    raw = b"".join(recs)
    for q in (0, 40, 60):
        a = native.fastq_to_codes(raw, q)
        b = seqio.fastq_to_codes_py(raw, q)
        np.testing.assert_array_equal(a, b, err_msg=f"minq {q}")


@needs_native
def test_dedup_matches_python():
    p = SketchParams(id=1, half_ctx_len=8, half_subctx_len=5, drlevel=2)
    rng = np.random.default_rng(2)
    codes = rng.integers(0, 1 << 24, size=20_000).astype(np.uint64)
    codes[rng.integers(0, codes.size, 50)] = 0  # zero-code quirk
    for uniq in (False, True):
        a = native.dedup_slot_order(codes, p.hashsize, p.hashlimit, uniq)
        b = hashdedup.dedup_slot_order_py(codes, p, uniq)
        np.testing.assert_array_equal(a, b, err_msg=f"uniq={uniq}")


@needs_native
def test_dedup_counts_matches_python():
    p = SketchParams(id=1, half_ctx_len=8, half_subctx_len=5, drlevel=2)
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 1 << 16, size=30_000).astype(np.uint64)
    for bits, m in ((4, 1), (4, 2), (4, 7), (16, 1)):
        ac, an = native.dedup_counts(codes, p.hashsize, bits, m)
        bc, bn = hashdedup.dedup_counts_slot_order_py(codes, p, bits, m)
        np.testing.assert_array_equal(ac, bc, err_msg=f"bits={bits} m={m}")
        np.testing.assert_array_equal(an, bn, err_msg=f"bits={bits} m={m}")


@needs_native
def test_dedup_u32_matches_python():
    rng = np.random.default_rng(4)
    codes = rng.integers(0, 1 << 20, size=5_000).astype(np.uint32)
    codes[::100] = 0
    hashsize = 8191
    a = native.dedup_u32_slot_order(codes, hashsize)
    # python twin (setops fallback loop)
    table = np.zeros(hashsize, dtype=np.uint32)
    for c in codes.tolist():
        if c == 0:
            continue
        h2 = 1 + c % (hashsize - 1)
        n = c % hashsize
        while True:
            if table[n] == 0:
                table[n] = c
                break
            if table[n] == c:
                break
            n = (n + h2) % hashsize
    b = table[table != 0]
    np.testing.assert_array_equal(a, b)


def test_native_dist_writer_matches_python(tmp_path, monkeypatch):
    """The C distance.out writer must be byte-identical to the Python
    formatter across the -M/-O/-N/-D/--correction grid, including the
    degenerate corners (self-pair x=y=xny -> -nan columns, xny=0)."""
    import itertools

    from public_kssd_tpu import native
    from public_kssd_tpu.ops import stats as stats_ops

    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(0)
    n_qry, n_ref = 4, 32
    ref_sizes = rng.integers(2, 2000, n_ref).astype(np.uint32)
    qry_sizes = rng.integers(2, 2000, n_qry).astype(np.uint32)
    counts = np.minimum(
        rng.integers(0, 1500, (n_qry, n_ref)),
        np.minimum(ref_sizes[None, :], qry_sizes[:, None]) - 1,
    ).astype(np.uint32)
    # degenerate corners
    ref_sizes[0] = qry_sizes[0] = counts[0, 0] = 1277  # self-pair
    counts[0, 1] = 0  # no sharing
    ref_sizes[2] = 1
    counts[:, 2] = np.minimum(counts[:, 2], 1)  # tiny ref
    rnames = [f"ref_{i}" for i in range(n_ref)]
    qnames = [f"qry_{i}" for i in range(n_qry)]

    grid = itertools.product(
        (stats_ops.Metric.JACCARD, stats_ops.Metric.CONTAINMENT),
        (stats_ops.Fields.DIST, stats_ops.Fields.QV, stats_ops.Fields.CI),
        (False, True), (1.0, 0.05), (0, 5),
    )
    for metric, fields, corr, maxd, topn in grid:
        opts = stats_ops.OutputOptions(
            metric=metric, fields=fields, correction=corr,
            max_dist=maxd, top_n=topn,
        )
        a = str(tmp_path / "native.out")
        b = str(tmp_path / "python.out")
        monkeypatch.setenv("KSSD_TPU_NATIVE_PRINT", "auto")
        stats_ops.write_distance_out(
            a, counts, ref_sizes, qry_sizes, rnames, qnames, 16, 4, opts)
        monkeypatch.setenv("KSSD_TPU_NATIVE_PRINT", "off")
        stats_ops.write_distance_out(
            b, counts, ref_sizes, qry_sizes, rnames, qnames, 16, 4, opts)
        with open(a, "rb") as fa, open(b, "rb") as fb:
            ca, cb = fa.read(), fb.read()
        assert ca == cb, (
            f"native != python for metric={metric} fields={fields} "
            f"corr={corr} maxd={maxd} topn={topn}"
        )
        assert ca.count(b"\n") > 1
