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

def test_window_align_many_matches_single(rng):
    """Cross-read batched windows (ops.sw.sw_window_align_many) must equal
    the per-pair sw_window_align result field for field -- the batch only
    changes padding and dispatch count, never a row's outcome."""
    from ciri_long_tpu.ops.sw import sw_window_align_many

    params = SWParams(1, 1, 1, 1)
    pairs = []
    for t in range(12):
        Lr = int(rng.integers(3_000, 70_000))
        ref = rng.integers(0, 4, Lr).astype(np.int8)
        kind = t % 4
        if kind == 0:                      # planted exact hit
            st = int(rng.integers(0, Lr - 400))
            q = ref[st:st + int(rng.integers(120, 400))].copy()
        elif kind == 1:                    # noisy hit
            st = int(rng.integers(0, Lr - 400))
            q = ref[st:st + 300].copy()
            mut = rng.integers(0, 300, 30)
            q[mut] = (q[mut] + 1) % 4
        elif kind == 2:                    # random query (likely weak hit)
            q = rng.integers(0, 4, int(rng.integers(50, 200))).astype(np.int8)
        else:                              # all-N window -> no hit
            ref = np.full(Lr, 4, np.int8)
            q = rng.integers(0, 4, 100).astype(np.int8)
        pairs.append((q, ref))

    got = sw_window_align_many(pairs, params, chunk=4096)
    for t, (q, ref) in enumerate(pairs):
        want = sw_window_align(q, ref, params, chunk=4096)
        assert got[t] == want, f"pair {t}: {got[t]} vs {want}"
