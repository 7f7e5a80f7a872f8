"""Sharding tests on the 8-device virtual CPU mesh (SURVEY.md §5: multi-
host strategy validated with a CPU mesh)."""

import jax
import numpy as np
import pytest

from ciri_long_tpu.ops.period import lag_profile
from ciri_long_tpu.ops.sw import SWParams, sw_score_ends
from ciri_long_tpu.parallel.mesh import (LAG_AXIS, READS_AXIS, make_mesh,
                                         sharded_pipeline_step, sharded_sw)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharded_sw_matches_single_device(rng):
    mesh = make_mesh()
    params = SWParams(1, 1, 1, 1)
    q = rng.integers(0, 4, (13, 64)).astype(np.int8)   # non-divisible batch
    r = rng.integers(0, 4, (13, 96)).astype(np.int8)
    score, q_end, r_end, n_pos = sharded_sw(mesh, q, r, params)
    ref_score, ref_qe, ref_re = map(np.asarray, sw_score_ends(q, r, params))
    np.testing.assert_array_equal(score, ref_score)
    np.testing.assert_array_equal(q_end, ref_qe)
    np.testing.assert_array_equal(r_end, ref_re)
    assert n_pos == int((ref_score > 0).sum())


def test_lag_profile_periodic_read(rng):
    unit = rng.integers(0, 4, 50).astype(np.int8)
    read = np.tile(unit, 6)[None, :]
    prof = np.asarray(lag_profile(read, 128))
    # peak at lag 50 (index 49), 100 (99)
    assert prof[0, 49] == 1.0
    assert prof[0, 99] == 1.0
    assert prof[0, 10] < 0.6


def test_sharded_pipeline_step(rng):
    mesh = make_mesh()
    B = mesh.shape[READS_AXIS] * 3
    reads = rng.integers(0, 4, (B, 120)).astype(np.int8)
    q = rng.integers(0, 4, (B, 48)).astype(np.int8)
    r = rng.integers(0, 4, (B, 64)).astype(np.int8)
    max_lag = mesh.shape[LAG_AXIS] * 32
    prof, score, n_pos = sharded_pipeline_step(mesh, reads, q, r,
                                               max_lag=max_lag)
    assert prof.shape == (B, max_lag)
    # sharded tandem counts must equal the single-device ones
    from ciri_long_tpu.ops.period import tandem_counts
    ref_prof = np.asarray(tandem_counts(reads, max_lag))
    np.testing.assert_array_equal(np.asarray(prof), ref_prof)


def test_graft_entry_singlechip():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    score = np.asarray(out[0])
    assert score.shape == (8,)


def test_graft_entry_multichip():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_gather_candidates_merge(rng):
    """All-gather candidate-record merge (ROADMAP 5): per-shard records
    merge into one replicated, deterministically-sorted table -- the
    device-side analog of the reference's shared cand_circ.fa append
    (find_bsj.py:473)."""
    from ciri_long_tpu.parallel.mesh import (CAND_FIELDS, gather_candidates,
                                             make_mesh)

    mesh = make_mesh()
    B = 32
    rec = rng.integers(0, 1000, (B, CAND_FIELDS)).astype(np.int32)
    rec[:, 0] = np.arange(B)            # read ids
    valid = rng.random(B) < 0.6
    merged, n = gather_candidates(mesh, rec, valid)
    assert n == int(valid.sum())
    want = rec[valid]
    order = np.lexsort(tuple(want[:, c] for c in
                             range(want.shape[1] - 1, -1, -1)))
    np.testing.assert_array_equal(merged, want[order])


def test_gather_candidates_cohort(rng):
    """Cohort flavour: two samples' record tables merged in sequence give
    the same result regardless of shard layout (multi-sample collapse
    input, reference collapse.py:37-71)."""
    from ciri_long_tpu.parallel.mesh import (CAND_FIELDS, gather_candidates,
                                             make_mesh)

    mesh = make_mesh()
    tables = []
    for sample in range(2):
        rec = rng.integers(0, 100, (16, CAND_FIELDS)).astype(np.int32)
        rec[:, 0] = sample * 1000 + np.arange(16)
        valid = rng.random(16) < 0.7
        merged, n = gather_candidates(mesh, rec, valid)
        assert len(merged) == n
        tables.append(merged)
    cohort = np.concatenate(tables)
    # every sample's valid records present exactly once
    assert len(np.unique(cohort[:, 0])) == len(cohort)
