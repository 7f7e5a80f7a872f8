"""Chunked long-window SW parity: the batched-chunk formulation must equal
the direct alignment on windows it can cross-check."""

import numpy as np
import pytest

from ciri_long_tpu.ops.sw import SWParams, sw_align_batch, sw_window_align


def test_window_align_matches_direct(rng):
    params = SWParams(1, 1, 1, 1)
    ref = rng.integers(0, 4, 8000).astype(np.int8)
    core = ref[5200:5400].copy()
    q = core.copy()
    q[50] = (q[50] + 1) % 4
    direct = sw_align_batch(q[None, :], ref[None, :], params)
    got = sw_window_align(q, ref, params, chunk=2048)
    assert got[0] == int(direct.score[0])
    assert got[2] == int(direct.query_end[0])
    assert got[4] == int(direct.ref_end[0])
    assert got[1] == int(direct.query_begin[0])
    assert got[3] == int(direct.ref_begin[0])


def test_window_align_planted_far(rng):
    params = SWParams(1, 1, 1, 1)
    ref = rng.integers(0, 4, 60_000).astype(np.int8)
    q = ref[41_000:41_300].copy()
    score, qb, qe, rb, re_ = sw_window_align(q, ref, params, chunk=4096)
    assert score == 300
    assert rb == 41_000 and re_ == 41_299
    assert qb == 0 and qe == 299


def test_window_align_no_hit(rng):
    params = SWParams(10, 4, 8, 2)
    ref = np.full(50_000, 4, np.int8)  # all N -> all scores 0
    q = rng.integers(0, 4, 100).astype(np.int8)
    score, qb, qe, rb, re_ = sw_window_align(q, ref, params, chunk=4096)
    assert score == 0 and rb == -1
