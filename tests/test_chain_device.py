"""Device chaining kernel parity vs the host (C++/numpy) implementation."""

import numpy as np
import pytest

from ciri_long_tpu.io.genome import Genome
from ciri_long_tpu.models.aligner import GenomeAligner
from ciri_long_tpu.ops.chain import backtrack_chains, chain_scores_batch


def test_device_chain_matches_host(rng):
    genome = Genome.from_dict({"c": "ACGT" * 500})
    al = GenomeAligner(genome)

    B, A = 4, 200
    rs = np.zeros((B, A), np.int64)
    qs = np.zeros((B, A), np.int64)
    cs = np.zeros((B, A), np.int64)
    val = np.zeros((B, A), bool)
    host = []
    for b in range(B):
        n = int(rng.integers(50, A))
        r = np.sort(rng.integers(0, 300_000, n)).astype(np.int64)
        q = np.sort(rng.integers(0, 10_000, n)).astype(np.int64)
        order = np.lexsort((q, r))
        r, q = r[order], q[order]
        ctg = (r // 150_000).astype(np.int64)
        rs[b, :n] = r
        qs[b, :n] = q
        cs[b, :n] = ctg
        val[b, :n] = True
        # make padding non-chainable monotone garbage
        rs[b, n:] = r[-1] + np.arange(A - n) * 1_000_000
        f_h, pre_h = al._chain_dp(r, q, ctg, al.cfg.max_gap_ref, 5000)
        host.append((n, f_h, pre_h))

    f_d, pre_d = chain_scores_batch(rs, qs, cs, val, al.k, 64,
                                    al.cfg.max_gap_ref, 5000)
    f_d = np.asarray(f_d)
    pre_d = np.asarray(pre_d)

    for b, (n, f_h, pre_h) in enumerate(host):
        np.testing.assert_allclose(f_d[b, :n], f_h, rtol=1e-5, atol=1e-4)
        agree = (pre_d[b, :n] == pre_h).mean()
        assert agree > 0.97, agree   # float32 ties may flip rare choices


def test_backtrack_extracts_planted_chain(rng):
    genome = Genome.from_dict({"c": "ACGT" * 500})
    al = GenomeAligner(genome)
    # one clean colinear chain plus noise anchors
    n_chain = 30
    r = 1000 + np.arange(n_chain) * 20
    q = 500 + np.arange(n_chain) * 20
    noise_r = rng.integers(50_000, 90_000, 20)
    noise_q = rng.integers(8_000, 9_000, 20)
    rr = np.concatenate([r, noise_r]).astype(np.int64)
    qq = np.concatenate([q, noise_q]).astype(np.int64)
    order = np.lexsort((qq, rr))
    rr, qq = rr[order], qq[order]
    A = len(rr)
    rs = rr[None, :]
    qs = qq[None, :]
    cs = np.zeros((1, A), np.int64)
    val = np.ones((1, A), bool)
    f, pre = chain_scores_batch(rs, qs, cs, val, al.k)
    chains = backtrack_chains(f, pre, val, al.min_chain_score,
                              al.min_chain_anchors)[0]
    assert chains
    idx, score = chains[0]
    assert len(idx) >= n_chain - 2
    assert score >= 200


def _random_anchor_batch(rng, B, A):
    rs = np.zeros((B, A), np.int64)
    qs = np.zeros((B, A), np.int64)
    cs = np.zeros((B, A), np.int64)
    val = np.zeros((B, A), bool)
    for b in range(B):
        n = int(rng.integers(A // 2, A))
        # colinear-ish anchors with jitter so real chains exist
        r = np.sort(rng.integers(0, 40_000, n)).astype(np.int64)
        q = (r // 4 + rng.integers(-30, 30, n)).clip(0).astype(np.int64)
        order = np.lexsort((q, r))
        rs[b, :n], qs[b, :n] = r[order], q[order]
        val[b, :n] = True
        rs[b, n:] = rs[b, n - 1] + np.arange(A - n) * 1_000_000
    return rs, qs, cs, val


def _compact_vs_full(rng, B, A, topk, min_score=30.0, min_anchors=3):
    from ciri_long_tpu.ops.chain import (backtrack_chains_compact,
                                         chain_scores_compact)
    rs, qs, cs, val = _random_anchor_batch(rng, B, A)
    f, pre = chain_scores_batch(rs, qs, cs, val, 15)
    full = backtrack_chains(f, pre, val, min_score, min_anchors, 10)
    kv, ki, delta, count, f_dev = chain_scores_compact(
        rs, qs, cs, val, min_score, 15, topk=topk)
    compact = backtrack_chains_compact(kv, ki, delta, count, f_dev,
                                       min_score, min_anchors, 10)
    assert len(full) == len(compact)
    for b, (fc, cc) in enumerate(zip(full, compact)):
        assert len(fc) == len(cc), (b, len(fc), len(cc))
        for (fi, fs), (ci, cs2) in zip(fc, cc):
            np.testing.assert_array_equal(fi, ci)
            assert fs == cs2


def test_compact_matches_full_backtrack(rng):
    """chain_scores_compact + backtrack_chains_compact == the full-fetch
    path, chain for chain, score for score."""
    _compact_vs_full(rng, B=8, A=512, topk=256)


def test_compact_fallback_when_topk_overflows(rng):
    """topk smaller than #candidates forces the per-row full-f fallback;
    results must stay identical."""
    _compact_vs_full(rng, B=4, A=512, topk=8)


def _extract_vs_full(rng, B, A, min_score=30.0, min_anchors=3,
                     max_chains=10):
    from ciri_long_tpu.ops.chain import chain_extract_batch, decode_chains
    rs, qs, cs, val = _random_anchor_batch(rng, B, A)
    f, pre = chain_scores_batch(rs, qs, cs, val, 15)
    full = backtrack_chains(f, pre, val, min_score, min_anchors, max_chains)
    cid, scores, nch = chain_extract_batch(rs, qs, cs, val, min_score, 15,
                                           max_chains=max_chains,
                                           min_anchors=min_anchors)
    dev = decode_chains(cid, scores, nch)
    assert len(full) == len(dev)
    for b, (fc, dc) in enumerate(zip(full, dev)):
        assert len(fc) == len(dc), (b, len(fc), len(dc))
        for (fi, fs), (di, ds) in zip(fc, dc):
            np.testing.assert_array_equal(fi, di)
            assert abs(fs - ds) < 1e-4


def test_device_extract_matches_host_backtrack(rng):
    """chain_extract_batch (full greedy on device) == chain DP + host
    greedy backtrack, chain for chain, anchor for anchor."""
    _extract_vs_full(rng, B=8, A=512)


def test_device_extract_truncation_and_rejects(rng):
    """Small max_chains + high min_anchors exercise the used-mask path
    truncation and rejected-short-path anchor consumption."""
    _extract_vs_full(rng, B=6, A=256, min_anchors=8, max_chains=2)
