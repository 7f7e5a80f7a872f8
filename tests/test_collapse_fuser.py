"""Fused-dispatch identity (parallel/fuser.py): SW/edit jobs submitted
from concurrent worker threads and fused into one batch must return
bit-identical results to direct per-job dispatches, for mixed shapes
and params."""

import threading

import numpy as np
import pytest

from ciri_long_tpu.ops.sw import SWParams
from ciri_long_tpu.parallel.fuser import DeviceFuser, current_fuser
from ciri_long_tpu.pipeline.collapse import (_edit_many_direct, _fused_edit,
                                             _fused_sw,
                                             _sw_many_vs_many_direct)


def rand_codes(rng, lo, hi):
    return rng.integers(0, 5, size=int(rng.integers(lo, hi))).astype(np.int8)


PARAMS_A = SWParams(10, 4, 8, 2)
PARAMS_B = SWParams(2, 4, 4, 2)


def make_sw_job(rng):
    n = int(rng.integers(1, 9))
    qs = [rand_codes(rng, 5, 300) for _ in range(n)]
    rs = [rand_codes(rng, 5, 500) for _ in range(n)]
    p = PARAMS_A if rng.integers(2) else PARAMS_B
    return (qs, rs, p)


def test_fused_sw_matches_direct(rng):
    jobs = [make_sw_job(rng) for _ in range(13)]
    fused = _fused_sw(jobs)
    for job, got in zip(jobs, fused):
        want = _sw_many_vs_many_direct(*job)
        for g, w in zip(got, want):
            assert np.array_equal(g, w)


def test_fused_edit_matches_direct(rng):
    jobs = []
    for _ in range(9):
        n = int(rng.integers(1, 7))
        a = [rand_codes(rng, 0, 200) for _ in range(n)]
        b = [rand_codes(rng, 0, 150) for _ in range(n)]
        jobs.append((a, b))
    fused = _fused_edit(jobs)
    for (a, b), got in zip(jobs, fused):
        want = _edit_many_direct(a, b)
        assert np.array_equal(np.asarray(got), np.asarray(want))


def test_fuser_threads_roundtrip(rng):
    """Worker threads submitting through DeviceFuser get per-job results
    identical to direct dispatch; jobs actually fuse (rounds < jobs)."""
    jobs = [make_sw_job(rng) for _ in range(24)]
    fuser = DeviceFuser({'sw': _fused_sw, 'edit': _fused_edit})
    results = [None] * len(jobs)

    def worker(lo, hi):
        fuser.register()
        try:
            assert current_fuser() is fuser
            for t in range(lo, hi):
                results[t] = fuser.call('sw', jobs[t])
        finally:
            fuser.unregister()

    threads = [threading.Thread(target=worker, args=(k * 6, (k + 1) * 6))
               for k in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    fuser.close()

    assert current_fuser() is None
    for job, got in zip(jobs, results):
        want = _sw_many_vs_many_direct(*job)
        for g, w in zip(got, want):
            assert np.array_equal(g, w)
    assert fuser.jobs == len(jobs)
    assert 0 < fuser.rounds < len(jobs)


def test_fuser_propagates_executor_error():
    def boom(jobs):
        raise ValueError('fused boom')

    fuser = DeviceFuser({'sw': boom})
    fuser.register()
    try:
        with pytest.raises(ValueError, match='fused boom'):
            fuser.call('sw', ([], [], None))
    finally:
        fuser.unregister()
        fuser.close()
