"""Kernel parity: batched SW vs brute-force oracle.

Covers the scoring schemes the pipeline uses: 1/1/1/1 (clip re-alignment,
find_bsj.py:204) and 10/4/8/2 (junction curation, collapse.py:170)."""

import numpy as np
import pytest

from ciri_long_tpu.ops.sw import SWParams, sw_align_batch, sw_score_ends
from ciri_long_tpu.ops.traceback import sw_traceback
from ciri_long_tpu.utils.seq import encode_seq, pad_encoded
from tests.oracles import sw_oracle, apply_cigar_score

SCHEMES = [SWParams(1, 1, 1, 1), SWParams(10, 4, 8, 2), SWParams(2, 3, 5, 2)]


def random_seqs(rng, b, lo, hi, n_frac=0.0):
    out = []
    for _ in range(b):
        n = int(rng.integers(lo, hi + 1))
        s = rng.integers(0, 4, n)
        if n_frac:
            mask = rng.random(n) < n_frac
            s = np.where(mask, 4, s)
        out.append(s.astype(np.int8))
    return out


@pytest.mark.parametrize("params", SCHEMES)
def test_sw_score_ends_random(rng, params):
    qs = random_seqs(rng, 24, 5, 60, n_frac=0.05)
    rs = random_seqs(rng, 24, 5, 90, n_frac=0.05)
    q, _ = pad_encoded(qs)
    r, _ = pad_encoded(rs)
    score, q_end, r_end = map(np.asarray, sw_score_ends(q, r, params))
    for i in range(len(qs)):
        ref = sw_oracle(qs[i], rs[i], *params)
        assert (int(score[i]), int(q_end[i]), int(r_end[i])) == ref, i


@pytest.mark.parametrize("params", SCHEMES)
def test_sw_with_planted_motif(rng, params):
    # plant a query inside a longer ref with small perturbations
    for _ in range(10):
        core = rng.integers(0, 4, 40).astype(np.int8)
        ref = np.concatenate([rng.integers(0, 4, 30), core, rng.integers(0, 4, 25)]).astype(np.int8)
        q = core.copy()
        q[10] = (q[10] + 1) % 4  # mismatch
        q = np.delete(q, 25)     # deletion
        qb, _ = pad_encoded([q])
        rb, _ = pad_encoded([ref])
        score, q_end, r_end = map(np.asarray, sw_score_ends(qb, rb, params))
        exp = sw_oracle(q, ref, *params)
        assert (int(score[0]), int(q_end[0]), int(r_end[0])) == exp


def test_sw_align_batch_begins(rng):
    params = SWParams(10, 4, 8, 2)
    qs = random_seqs(rng, 16, 8, 50)
    rs = random_seqs(rng, 16, 8, 70)
    q, _ = pad_encoded(qs)
    r, _ = pad_encoded(rs)
    res = sw_align_batch(q, r, params)
    for i in range(len(qs)):
        s, qe, re_ = sw_oracle(qs[i], rs[i], *params)
        assert res.score[i] == s
        if s == 0:
            continue
        assert res.query_end[i] == qe and res.ref_end[i] == re_
        # begins must bound a region that reproduces the score via traceback
        tb = sw_traceback(qs[i], rs[i], *params)
        assert tb is not None
        tb_score, tb_qb, tb_qe, tb_rb, tb_re, cigar = tb
        assert tb_score == s
        assert 0 <= res.query_begin[i] <= res.query_end[i]
        assert 0 <= res.ref_begin[i] <= res.ref_end[i]
        # reverse-pass begins reproduce the full score when re-aligned
        sub_q = qs[i][res.query_begin[i]:res.query_end[i] + 1]
        sub_r = rs[i][res.ref_begin[i]:res.ref_end[i] + 1]
        s2, _, _ = sw_oracle(sub_q, sub_r, *params)
        assert s2 == s


def test_sw_traceback_cigar_consistency(rng):
    for params in SCHEMES:
        for _ in range(8):
            q = rng.integers(0, 4, int(rng.integers(10, 60))).astype(np.int8)
            r = rng.integers(0, 4, int(rng.integers(10, 80))).astype(np.int8)
            tb = sw_traceback(q, r, *params)
            exp = sw_oracle(q, r, *params)
            if tb is None:
                assert exp[0] == 0
                continue
            score, qb, qe, rb, re_, cigar = tb
            assert score == exp[0]
            sc, qi, rj = apply_cigar_score(q, r, cigar, *params, q_start=qb, r_start=rb)
            assert sc == score
            assert qi == qe + 1 and rj == re_ + 1


def test_sw_pad_batches_are_inert():
    params = SWParams(1, 1, 1, 1)
    q = np.full((2, 16), 5, np.int8)
    r = np.full((2, 16), 5, np.int8)
    q[0, :4] = [0, 1, 2, 3]
    r[0, :4] = [0, 1, 2, 3]
    score, q_end, r_end = map(np.asarray, sw_score_ends(q, r, params))
    assert score[0] == 4 and q_end[0] == 3 and r_end[0] == 3
    assert score[1] == 0 and q_end[1] == -1 and r_end[1] == -1


def test_sw_matches_reference_test_fixture():
    """The reference's only SSW smoke input (tests/test_ssw.py:5-15): scores
    1/1/1/1 over the two sequences of tests/test.fa.  We assert against our
    own oracle (no value assertions exist in the reference test either)."""
    seq1 = ("GGCCAATTCGAAGTTGGTTTACTCAAGTAAGCTAGAATGGGCCATAGTGCAATGTATTACGG"
            "TTAACAAACCATATAGCTGGTGGCCTTGGCCTGCAAAGCATGCCTTCAACTGCCCAAGTAGG"
            "ACAACTCCATCTGGCCCGGGCCACCCATTCCCGCCGGGATGAGAAAGACTGATCAGAACAGG"
            "CTAGAAACTGGCGAGGCCAAGCCCAGCTGGAAGGGACAACAGGCTCTGAACACCTCCAGGGC"
            "AGCTGAGACCTGTCCTGCAAAGAAATGACCACTGGAGCGGTCCAGAGCCAGTGAGGGCCCCC"
            "ATTAGAAAAGGCTGGGTGGGCACCGTGGGCTTAGACCTGTCCAGGGCCATCTCTTCCAGAAC"
            "TACACCATCTTGATTAATAAAAACACCCATCACAAGTTGGGTGCTGATGACACACATCCTTAATT")
    seq2 = ("TTCCCTGAAGCACCTAGGCCTTGGCCTATGCCCTCCCACTCCCCACTGGCCCTCTCTCTCC"
            "TCATCTGCATTTCTTCCCTCTGTTCTGGCGACACACACCTCCTGGATGCTATTCCAACAAA"
            "CTCTGTCCTGCCCCAGGTCCTTTGCACA")
    q = encode_seq(seq2)
    r = encode_seq(seq1)
    params = SWParams(1, 1, 1, 1)
    qb, _ = pad_encoded([q])
    rb, _ = pad_encoded([r])
    score, q_end, r_end = map(np.asarray, sw_score_ends(qb, rb, params))
    exp = sw_oracle(q, r, *params)
    assert (int(score[0]), int(q_end[0]), int(r_end[0])) == exp
    assert score[0] > 0


def test_banded_global_cigar_matches_oracle(rng):
    from ciri_long_tpu.ops.traceback import banded_global_cigar
    from tests.oracles import nw_oracle, apply_cigar_score
    for _ in range(10):
        n = int(rng.integers(1, 80))
        m = int(rng.integers(1, 80))
        q = rng.integers(0, 4, n).astype(np.int8)
        r = rng.integers(0, 4, m).astype(np.int8)
        score, cigar = banded_global_cigar(q, r)
        exp = nw_oracle(q, r, 2, 4, 4, 2)
        assert score == exp, (n, m)
        sc, qi, rj = apply_cigar_score(q, r, cigar, 2, 4, 4, 2)
        assert sc == score and qi == n and rj == m


def test_banded_global_cigar_gap_open_lt_extend(rng):
    """gap_open < gap_extend exercises nwcore's fused fallback rows (the
    split E recurrence needs open >= extend); scores must still match the
    direct-recurrence oracle and cigars must re-score exactly."""
    from ciri_long_tpu.ops.traceback import banded_global_cigar
    from tests.oracles import nw_oracle, apply_cigar_score

    params = (2, 3, 1, 4)   # open < extend
    for _ in range(10):
        n = int(rng.integers(1, 60))
        m = int(rng.integers(1, 60))
        q = rng.integers(0, 5, n).astype(np.int8)
        r = rng.integers(0, 5, m).astype(np.int8)
        score, cigar = banded_global_cigar(q, r, None, *params)
        assert score == nw_oracle(q, r, *params), (n, m)
        # the cigar must consume all of q and r; its run-merged affine
        # re-score is NOT comparable here (with open < extend the DP's
        # optimum re-opens gaps per base, which merged runs can't express
        # -- the repo-wide open >= extend convention exists for this)
        _, qi, rj = apply_cigar_score(q, r, cigar, *params)
        assert qi == n and rj == m
