"""Statistical equivalence of the Feistel shuffle space vs Fisher-Yates.

The framework's DEFAULT space is a computed 4-round Feistel permutation
(shufspace.py) where the reference uses a uniformly-random Fisher-Yates
table (command_shuffle.c:131-153). Interop and sampling RATE are covered
elsewhere (test_shufspace.py); this test checks the scientific claim:
Jaccard ESTIMATES from Feistel spaces are statistically
indistinguishable from Fisher-Yates estimates against the brute-force
exact Jaccard of the full canonical k-mer sets of REAL genomes.

Method: for every pair of 6 real test_fna genomes, the estimator error
(J_hat - J_exact) is sampled under N_SPACES Feistel seeds and N_SPACES
Fisher-Yates tables. A kept k-mer is a pure function of its code, so
J_hat needs only keep-counts over the precomputed per-genome sets and
pairwise intersections — no sketching pipeline in the loop.

Checked (alpha=0.01, Bonferroni over pairs):
  * per-pair Welch t-test on the two error samples (bias equality),
  * per-pair Levene test (variance equality),
  * pooled two-sample KS on per-pair-standardised errors.
"""

import glob
import gzip
import os

import numpy as np
import pytest

from public_kssd_tpu import formats, seqio, shufspace
from public_kssd_tpu.config import SketchParams

SEQ_DIR = "/root/reference/test_fna/seqs1"
N_GENOMES = 6
N_SPACES = 20
PARAMS = SketchParams.create(k=8, drlevel=2, subk=5)  # dim 16^5, keep 4096


def _canonical_set(sym: np.ndarray, k: int) -> np.ndarray:
    """Sorted unique canonical 2k-mer codes (the brute-force ground
    truth the estimator is judged against)."""
    W = 2 * k
    n = sym.size
    m = n - W + 1
    fwd = np.zeros(m, np.uint64)
    rc = np.zeros(m, np.uint64)
    for j in range(W):
        b = sym[j : j + m].astype(np.uint64)
        fwd = (fwd << np.uint64(2)) | b
        rc |= (np.uint64(3) ^ b) << np.uint64(2 * j)
    pos = np.arange(n, dtype=np.int64)
    brk = np.where(sym >= seqio.BREAK, pos, -1)
    last = np.maximum.accumulate(brk)
    valid = last[W - 1 :] < pos[:m]
    return np.unique(np.minimum(fwd, rc)[valid])


@pytest.fixture(scope="module")
def genome_sets():
    paths = sorted(glob.glob(os.path.join(SEQ_DIR, "*.fasta.gz")))[:N_GENOMES]
    if len(paths) < N_GENOMES:
        pytest.skip("reference test_fna genomes not available")
    sets = []
    for p in paths:
        with gzip.open(p, "rb") as f:
            sym = seqio.fasta_to_codes(f.read())
        sets.append(_canonical_set(sym, PARAMS.half_ctx_len))
    inners = {}
    shift = np.uint64(2 * PARAMS.half_outctx_len)
    mask = np.uint64(PARAMS.dim_shuf_len - 1)

    def inner_of(codes):
        return ((codes >> shift) & mask).astype(np.int64)

    pairs = []
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            inter = np.intersect1d(sets[i], sets[j], assume_unique=True)
            j_exact = inter.size / (sets[i].size + sets[j].size - inter.size)
            pairs.append((i, j, inner_of(inter), j_exact))
    inners = [inner_of(s) for s in sets]
    return inners, pairs


def _errors(inners, pairs, keep_of):
    """Estimator errors (J_hat - J_exact) per pair for ONE space."""
    kc = [int(keep_of(inn).sum()) for inn in inners]
    errs = []
    for i, j, inter_inn, j_exact in pairs:
        ki = int(keep_of(inter_inn).sum())
        union = kc[i] + kc[j] - ki
        errs.append(ki / union - j_exact)
    return np.array(errs)


def _keep_feistel(seed):
    def keep(inn):
        kp = shufspace.feistel(
            np, inn.astype(np.uint32), seed, PARAMS.half_subctx_len
        ).astype(np.int64)
        return (kp >= PARAMS.dim_start) & (kp < PARAMS.dim_end)

    return keep


def _keep_table(table):
    def keep(inn):
        kp = table[inn]
        return (kp >= PARAMS.dim_start) & (kp < PARAMS.dim_end)

    return keep


@pytest.mark.slow
def test_feistel_estimates_match_fisher_yates(genome_sets):
    from scipy import stats as sps

    inners, pairs = genome_sets
    fe = np.stack([
        _errors(inners, pairs, _keep_feistel(1000 + s))
        for s in range(N_SPACES)
    ])  # [N_SPACES, n_pairs]
    fy = np.stack([
        _errors(
            inners, pairs,
            _keep_table(formats.make_shuffled_dim(PARAMS, seed=2000 + s)),
        )
        for s in range(N_SPACES)
    ])
    n_pairs = fe.shape[1]
    alpha = 0.01 / n_pairs  # Bonferroni
    worst_t, worst_lev = 1.0, 1.0
    for p in range(n_pairs):
        t_p = sps.ttest_ind(fe[:, p], fy[:, p], equal_var=False).pvalue
        lev_p = sps.levene(fe[:, p], fy[:, p]).pvalue
        worst_t, worst_lev = min(worst_t, t_p), min(worst_lev, lev_p)
        assert t_p > alpha, (
            f"pair {pairs[p][:2]}: Feistel bias differs from Fisher-Yates "
            f"(t-test p={t_p:.2e}, mean_F={fe[:, p].mean():.3e}, "
            f"mean_FY={fy[:, p].mean():.3e})"
        )
        assert lev_p > alpha, (
            f"pair {pairs[p][:2]}: variance differs (Levene p={lev_p:.2e})"
        )
    # pooled shape check: standardise each pair by the COMBINED sample
    both = np.concatenate([fe, fy])
    mu, sd = both.mean(axis=0), both.std(axis=0, ddof=1)
    z_f = ((fe - mu) / sd).ravel()
    z_y = ((fy - mu) / sd).ravel()
    ks = sps.ks_2samp(z_f, z_y)
    assert ks.pvalue > 0.01, f"pooled error distributions differ: {ks}"
    print(
        f"\nFeistel vs Fisher-Yates over {n_pairs} genome pairs x "
        f"{N_SPACES} spaces: worst t-test p={worst_t:.3f}, worst Levene "
        f"p={worst_lev:.3f}, pooled KS p={ks.pvalue:.3f}; "
        f"mean |bias| F={np.abs(fe.mean(axis=0)).mean():.2e} "
        f"FY={np.abs(fy.mean(axis=0)).mean():.2e}; "
        f"mean sd F={fe.std(axis=0, ddof=1).mean():.2e} "
        f"FY={fy.std(axis=0, ddof=1).mean():.2e}"
    )
