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
