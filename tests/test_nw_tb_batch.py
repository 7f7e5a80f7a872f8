"""Device batched banded-NW traceback vs the host implementation.

nw_traceback_batch must be byte-identical to banded_global_cigar
(band=None defaults, incl. the band-doubling stability rule) pair by
pair -- it backs the CCS unit polish, where cigars feed base voting.
"""

import numpy as np
import pytest

from ciri_long_tpu.ops.nw_tb_batch import nw_traceback_batch
from ciri_long_tpu.ops.traceback import banded_global_cigar


def _mutated_pair(rng, m, sub=0.03, ins=0.03, dele=0.03):
    r = rng.integers(0, 4, m).astype(np.int8)
    out = []
    for b in r:
        x = rng.random()
        if x < dele:
            continue
        if x < dele + ins:
            out.append(int(rng.integers(0, 4)))
        if x < dele + ins + sub:
            out.append(int(rng.integers(0, 4)))
        else:
            out.append(int(b))
    return np.array(out, np.int8), r


def _check(qs, rs):
    got = nw_traceback_batch(qs, rs)
    for t, (q, r) in enumerate(zip(qs, rs)):
        want = banded_global_cigar(q, r)
        assert got[t] == want, (t, len(q), len(r), got[t][0], want[0])


def test_near_identical_pairs(rng):
    qs, rs = [], []
    for _ in range(30):
        q, r = _mutated_pair(rng, int(rng.integers(30, 600)))
        qs.append(q)
        rs.append(r)
    _check(qs, rs)


def test_identical_and_tiny(rng):
    r = rng.integers(0, 4, 100).astype(np.int8)
    qs = [r.copy(), r[:1], np.array([1, 2, 3], np.int8)]
    rs = [r.copy(), r[:1].copy(), np.array([3, 2, 1], np.int8)]
    _check(qs, rs)


def test_length_skew_and_n_bases(rng):
    qs, rs = [], []
    for _ in range(12):
        q, r = _mutated_pair(rng, int(rng.integers(50, 300)),
                             sub=0.05, ins=0.15, dele=0.02)
        # salt with N's (code 4: substitution score 0 on the host)
        q[rng.integers(0, len(q), max(1, len(q) // 20))] = 4
        qs.append(q)
        rs.append(r)
    # heavy skew: band doubling and/or host fallback paths
    qs.append(rng.integers(0, 4, 60).astype(np.int8))
    rs.append(rng.integers(0, 4, 360).astype(np.int8))
    qs.append(rng.integers(0, 4, 360).astype(np.int8))
    rs.append(rng.integers(0, 4, 60).astype(np.int8))
    _check(qs, rs)


def test_random_unrelated(rng):
    """Unrelated sequences: scores differ between bands often -> exercises
    the stability fallback; results must still match the host exactly."""
    qs, rs = [], []
    for _ in range(10):
        qs.append(rng.integers(0, 5, int(rng.integers(30, 250))
                               ).astype(np.int8))
        rs.append(rng.integers(0, 5, int(rng.integers(30, 250))
                               ).astype(np.int8))
    _check(qs, rs)


def test_empty_inputs(rng):
    r = rng.integers(0, 4, 50).astype(np.int8)
    _check([np.zeros(0, np.int8), r], [r, np.zeros(0, np.int8)])


def test_oversize_falls_back(rng):
    q, r = _mutated_pair(rng, 3000)
    _check([q], [r])
