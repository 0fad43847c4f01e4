"""Mesh-sharded composite (parallel/sharded_composite.py): the report
must be byte-identical to the host path for every mesh width, the
per-shard overflow retry must engage under planted hit skew, and the
CLI --mesh flag must route through it."""

import os

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from public_kssd_tpu import composite, formats
from public_kssd_tpu.parallel import sharded_composite

from test_composite_scale import _mk_db


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_sharded_equals_host(tmp_path, n_dev):
    ref_dir, qry_dir, *_ = _mk_db(tmp_path, n_ref=40, sk=64, n_qry=3, seed=3)
    want = composite.species_abundance(ref_dir, qry_dir, device=False)
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("ref",))
    got = sharded_composite.species_abundance_sharded(ref_dir, qry_dir, mesh)
    assert want  # the fixture plants real overlaps
    assert got == want


def test_overflow_retry_engages(tmp_path):
    """A DB whose codes massively duplicate one query code overflows the
    initial per-shard capacity; the retry must still yield exact stats."""
    rng = np.random.default_rng(9)
    ref_dir = str(tmp_path / "ref")
    qry_dir = str(tmp_path / "qry")
    os.makedirs(ref_dir)
    os.makedirs(qry_dir)
    n_ref, sk = 50, 200
    # every ref genome's sketch is mostly the SAME few codes -> each
    # matching query code expands to ~n_ref*sk hits in one shard
    hot = np.arange(100, 108, dtype=np.uint32)
    ref = np.tile(hot, (n_ref, sk // hot.size))
    ridx = np.arange(n_ref + 1, dtype=np.uint64) * sk
    formats.write_combco(ref_dir, 0, ref.ravel().astype(np.uint32), ridx)
    formats.write_co_stat(ref_dir, formats.CoStat(
        params_id=5, koc=False, kmerlen=16, dim_rd_len=4, comp_num=1,
        infile_num=n_ref, all_ctx_ct=int(ref.size),
        ctx_ct=np.full(n_ref, sk, np.uint32),
        names=[f"r{i}" for i in range(n_ref)]))
    qsk = 16
    qry = np.unique(
        np.concatenate([hot, rng.integers(1000, 1 << 20, qsk, dtype=np.uint32)])
    )[:qsk].astype(np.uint32)
    qidx = np.array([0, qry.size], dtype=np.uint64)
    ab = rng.integers(1, 40, size=qry.size).astype(np.uint16)
    formats.write_combco(qry_dir, 0, qry, qidx, ab)
    formats.write_co_stat(qry_dir, formats.CoStat(
        params_id=5, koc=True, kmerlen=16, dim_rd_len=4, comp_num=1,
        infile_num=1, all_ctx_ct=int(qry.size),
        ctx_ct=np.array([qry.size], np.uint32), names=["q0"]))

    want = composite.species_abundance(ref_dir, qry_dir, device=False)
    mesh = Mesh(np.array(jax.devices()[:4]), ("ref",))
    got = sharded_composite.species_abundance_sharded(ref_dir, qry_dir, mesh)
    assert want
    assert got == want
    # the planted hit mass really exceeds the initial capacity guess
    assert n_ref * sk > 1 << max(int(qsk * 2 // 4).bit_length(), 10)


def test_sharded_multi_component(tmp_path):
    """comp_num > 1: the uint64 component fold must keep per-component
    joins separate (a code value shared across components is distinct)."""
    rng = np.random.default_rng(17)
    ref_dir = str(tmp_path / "ref")
    qry_dir = str(tmp_path / "qry")
    os.makedirs(ref_dir)
    os.makedirs(qry_dir)
    n_ref, sk = 20, 40  # per component
    refs = []
    for c in range(2):
        ref = rng.integers(0, 1 << 16, size=(n_ref, sk), dtype=np.uint32)
        refs.append(np.sort(ref, axis=1))
        formats.write_combco(
            ref_dir, c, refs[-1].ravel(),
            np.arange(n_ref + 1, dtype=np.uint64) * sk,
        )
    formats.write_co_stat(ref_dir, formats.CoStat(
        params_id=5, koc=False, kmerlen=16, dim_rd_len=4, comp_num=2,
        infile_num=n_ref, all_ctx_ct=2 * n_ref * sk,
        ctx_ct=np.full(n_ref, 2 * sk, np.uint32),
        names=[f"r{i}" for i in range(n_ref)]))
    for c in range(2):
        # half the query codes come from component c's refs, half from
        # the OTHER component's value range (must NOT join across comps)
        pool = np.unique(refs[c][:6].ravel())
        other = np.unique(refs[1 - c][:6].ravel())
        q = np.unique(np.concatenate([pool[:60], other[:60]]))
        ab = rng.integers(1, 30, size=q.size).astype(np.uint16)
        formats.write_combco(
            qry_dir, c, q, np.array([0, q.size], np.uint64), ab,
        )
    formats.write_co_stat(qry_dir, formats.CoStat(
        params_id=5, koc=True, kmerlen=16, dim_rd_len=4, comp_num=2,
        infile_num=1, all_ctx_ct=0,
        ctx_ct=np.array([1], np.uint32), names=["q0"]))
    want = composite.species_abundance(ref_dir, qry_dir, device=False)
    mesh = Mesh(np.array(jax.devices()[:4]), ("ref",))
    got = sharded_composite.species_abundance_sharded(ref_dir, qry_dir, mesh)
    assert want
    assert got == want


def test_cli_mesh_rejects_bad_specs(tmp_path, capsys):
    from public_kssd_tpu import cli

    ref_dir, qry_dir, *_ = _mk_db(tmp_path, n_ref=10, sk=32, n_qry=1, seed=7)
    for bad in ("bogus", "0", "999"):
        with pytest.raises(SystemExit):
            cli.main(["composite", "-r", ref_dir, "-q", qry_dir,
                      "--mesh", bad])
    # DPxREF spec is accepted (dp folds into the device count)
    assert cli.main(["composite", "-r", ref_dir, "-q", qry_dir,
                     "--mesh", "2x2"]) == 0
    capsys.readouterr()


def test_duplicate_query_codes_count_once(tmp_path):
    """A forged query sketch carrying duplicate codes: a sketch is a SET
    (the reference hash-dedups before probing, command_composite.c:
    453-463), so both device paths must match the host oracle's
    first-occurrence semantics instead of counting per occurrence."""
    rng = np.random.default_rng(23)
    ref_dir = str(tmp_path / "ref")
    qry_dir = str(tmp_path / "qry")
    os.makedirs(ref_dir)
    os.makedirs(qry_dir)
    n_ref, sk = 25, 64
    ref = np.sort(
        rng.integers(0, 1 << 16, size=(n_ref, sk), dtype=np.uint32), axis=1
    )
    formats.write_combco(ref_dir, 0, ref.ravel(),
                         np.arange(n_ref + 1, dtype=np.uint64) * sk)
    formats.write_co_stat(ref_dir, formats.CoStat(
        params_id=5, koc=False, kmerlen=16, dim_rd_len=4, comp_num=1,
        infile_num=n_ref, all_ctx_ct=int(ref.size),
        ctx_ct=np.full(n_ref, sk, np.uint32),
        names=[f"r{i}" for i in range(n_ref)]))
    base = np.unique(ref[:5].ravel())[:80]
    # every code appears TWICE, with different abundances: first must win
    qry = np.concatenate([base, base])
    ab = np.concatenate([
        rng.integers(1, 30, size=base.size),
        rng.integers(30, 60, size=base.size),
    ]).astype(np.uint16)
    formats.write_combco(qry_dir, 0, qry,
                         np.array([0, qry.size], np.uint64), ab)
    formats.write_co_stat(qry_dir, formats.CoStat(
        params_id=5, koc=True, kmerlen=16, dim_rd_len=4, comp_num=1,
        infile_num=1, all_ctx_ct=int(qry.size),
        ctx_ct=np.array([qry.size], np.uint32), names=["q0"]))
    host = composite.species_abundance(ref_dir, qry_dir, device=False)
    dev = composite.species_abundance(ref_dir, qry_dir, device=True)
    mesh = Mesh(np.array(jax.devices()[:4]), ("ref",))
    meshed = sharded_composite.species_abundance_sharded(
        ref_dir, qry_dir, mesh
    )
    assert host
    assert dev == host
    assert meshed == host


def test_cli_mesh_composite_matches_plain(tmp_path, capsys):
    from public_kssd_tpu import cli

    ref_dir, qry_dir, *_ = _mk_db(tmp_path, n_ref=30, sk=48, n_qry=2, seed=5)
    assert cli.main(["composite", "-r", ref_dir, "-q", qry_dir]) == 0
    plain = capsys.readouterr().out
    assert cli.main(
        ["composite", "-r", ref_dir, "-q", qry_dir, "--mesh", "4"]
    ) == 0
    meshed = capsys.readouterr().out
    assert plain
    assert meshed == plain
