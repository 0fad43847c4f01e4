"""Bounded-RAM streaming parse (seqio.stream_*_codes): piece-wise parsing
must produce the same sketch codes as the whole-file parse, across chunk
boundaries that split sequence lines, headers, records, and break runs."""

import gzip

import numpy as np
import pytest

from public_kssd_tpu import pipeline, seqio, shufspace
from public_kssd_tpu.config import SketchParams
from public_kssd_tpu.ops import sketch as sketch_ops

P8 = SketchParams(id=3, half_ctx_len=8, half_subctx_len=5, drlevel=2)
SHUF = shufspace.ComputedShuf(P8.id, P8.half_subctx_len)


def _fasta_bytes(rng, n_records=40):
    out = []
    for i in range(n_records):
        out.append(b">rec%d some description\n" % i)
        n = int(rng.integers(50, 3000))
        seq = rng.choice(np.frombuffer(b"ACGTacgtN", np.uint8), size=n)
        body = seq.tobytes()
        out += [body[j : j + 61] + b"\n" for j in range(0, len(body), 61)]
    return b"".join(out)


def _fastq_bytes(rng, n_records=300):
    out = []
    for i in range(n_records):
        n = int(rng.integers(30, 150))
        seq = rng.choice(np.frombuffer(b"ACGTN", np.uint8), size=n).tobytes()
        qual = rng.integers(33, 74, size=n).astype(np.uint8).tobytes()
        out.append(b"@r%d\n%s\n+\n%s\n" % (i, seq, qual))
    return b"".join(out)


def _codes_of(sym_or_gen):
    if isinstance(sym_or_gen, np.ndarray):
        return sketch_ops.sketch_codes_host(sym_or_gen, SHUF, P8)
    return sketch_ops.sketch_codes_multi([sym_or_gen], SHUF, P8)[0]


@pytest.mark.parametrize("chunk", [97, 4096, 1 << 20])
def test_fasta_stream_equals_whole(tmp_path, chunk):
    rng = np.random.default_rng(5)
    raw = _fasta_bytes(rng)
    p = tmp_path / "x.fasta.gz"
    with gzip.open(p, "wb") as f:
        f.write(raw)
    whole = _codes_of(seqio.fasta_to_codes(raw))
    pieces = list(seqio.stream_fasta_codes(str(p), chunk_bytes=chunk))
    streamed = _codes_of(iter(pieces))
    np.testing.assert_array_equal(streamed, whole)
    # base runs identical (positions may differ only by break collapsing)
    whole_sym = seqio.fasta_to_codes(raw)
    joined = np.concatenate(pieces)
    assert np.array_equal(joined[joined != 4], whole_sym[whole_sym != 4])


@pytest.mark.parametrize("chunk", [256, 8192])
def test_fastq_stream_equals_whole(tmp_path, chunk):
    rng = np.random.default_rng(6)
    raw = _fastq_bytes(rng)
    p = tmp_path / "x.fq"
    p.write_bytes(raw)
    for q in (0, 40):
        whole = _codes_of(seqio.fastq_to_codes(raw, min_qual=q))
        streamed = _codes_of(seqio.stream_fastq_codes(str(p), q, chunk_bytes=chunk))
        np.testing.assert_array_equal(streamed, whole)


def test_pipeline_streams_big_files(tmp_path, monkeypatch):
    """Force the streaming threshold to ~0: run_stage1 must produce the
    byte-identical sketch dir either way."""
    import os

    from public_kssd_tpu import formats

    rng = np.random.default_rng(7)
    paths = []
    for i in range(3):
        raw = _fasta_bytes(rng, n_records=10)
        p = tmp_path / f"g{i}.fasta"
        p.write_bytes(raw)
        paths.append(str(p))
    d1, d2 = str(tmp_path / "whole"), str(tmp_path / "streamed")
    pipeline.run_stage1(paths, d1, P8, SHUF)
    monkeypatch.setattr(pipeline, "STREAM_BYTES", 1)
    pipeline.run_stage1(paths, d2, P8, SHUF)
    for f in ("combco.0", "combco.index.0"):
        assert (
            (tmp_path / "whole" / f).read_bytes()
            == (tmp_path / "streamed" / f).read_bytes()
        )
    a, b = formats.read_co_stat(d1), formats.read_co_stat(d2)
    assert a.ctx_ct.tolist() == b.ctx_ct.tolist()


def test_wide_geometry_accepts_stream_iterators():
    """k-l >= 8 (drtuple > 31 bits) must accept lazy piece iterators like
    the packed path does (large-file streaming previously crashed with
    AttributeError: 'generator' object has no attribute 'size')."""
    params = SketchParams(id=11, half_ctx_len=12, half_subctx_len=6, drlevel=3)
    assert params.drtuple_bits > 31
    shuf = shufspace.ComputedShuf(params.id, params.half_subctx_len)
    rng = np.random.default_rng(3)
    sym = rng.integers(0, 4, size=20000).astype(np.uint8)
    whole = sketch_ops.sketch_codes_multi([sym], shuf, params)[0]
    pieces = [sym[:7000], sym[7000:15000], sym[15000:]]
    streamed = sketch_ops.sketch_codes_multi([iter(pieces)], shuf, params)[0]
    np.testing.assert_array_equal(streamed, whole)


def test_libdeflate_gzip_decompress_identical():
    """The libdeflate fast path must be byte-identical to zlib on
    single-member, multi-member and empty gz buffers, and fall back
    cleanly when the library is absent."""
    import gzip

    from public_kssd_tpu import seqio

    rng = np.random.default_rng(3)
    body = rng.integers(65, 91, size=1 << 18, dtype=np.uint8).tobytes()
    comp = gzip.compress(body, compresslevel=1)
    assert seqio.gzip_decompress(comp) == body
    assert seqio.gzip_decompress(comp + comp) == body + body  # multi-member
    assert seqio.gzip_decompress(gzip.compress(b"")) == b""
    # forced-fallback path (library absent)
    saved = seqio._LIBDEFLATE
    try:
        seqio._LIBDEFLATE = None
        assert seqio.gzip_decompress(comp) == body
    finally:
        seqio._LIBDEFLATE = saved
