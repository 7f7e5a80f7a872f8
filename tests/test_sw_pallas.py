"""Pallas SW kernel parity vs the XLA-scan implementation and the oracle
(run in interpreter mode on the CPU test mesh; the driver exercises the
compiled path on hardware via bench.py / __graft_entry__)."""

import numpy as np
import pytest

from ciri_long_tpu.ops.sw import SWParams, sw_score_ends
from ciri_long_tpu.ops.sw_pallas import sw_score_ends_pallas
from ciri_long_tpu.utils.seq import pad_encoded
from tests.oracles import sw_oracle


@pytest.mark.parametrize("params", [SWParams(1, 1, 1, 1), SWParams(10, 4, 8, 2)])
def test_pallas_matches_scan_and_oracle(rng, params):
    qs = [rng.integers(0, 4, int(rng.integers(5, 24))).astype(np.int8)
          for _ in range(8)]
    rs = [rng.integers(0, 4, int(rng.integers(5, 40))).astype(np.int8)
          for _ in range(8)]
    q, _ = pad_encoded(qs)
    r, _ = pad_encoded(rs)
    s1, qe1, re1 = map(np.asarray, sw_score_ends(q, r, params))
    s2, qe2, re2 = map(np.asarray,
                       sw_score_ends_pallas(q, r, params, interpret=True))
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(qe1, qe2)
    np.testing.assert_array_equal(re1, re2)
    for i in range(len(qs)):
        assert (int(s2[i]), int(qe2[i]), int(re2[i])) == \
            sw_oracle(qs[i], rs[i], *params)


def test_pallas_with_n_and_pad(rng):
    params = SWParams(1, 1, 1, 1)
    q = np.full((8, 16), 5, np.int8)
    r = np.full((8, 16), 5, np.int8)
    q[0, :6] = [0, 1, 2, 4, 3, 0]
    r[0, :6] = [0, 1, 2, 1, 3, 0]
    s, qe, re = map(np.asarray, sw_score_ends_pallas(q, r, params, interpret=True))
    exp = sw_oracle(q[0, :6], r[0, :6], *params)
    assert (int(s[0]), int(qe[0]), int(re[0])) == exp
    assert s[1] == 0 and qe[1] == -1 and re[1] == -1


@pytest.mark.parametrize("params", [SWParams(1, 1, 1, 1), SWParams(10, 4, 8, 2)])
def test_wave_matches_scan_and_oracle(rng, params):
    """Wavefront kernel (lanes = query positions): identical scores, ends
    and tie-breaks to the scan implementations and the oracle."""
    from ciri_long_tpu.ops.sw_pallas import sw_score_ends_wave

    qs = [rng.integers(0, 5, int(rng.integers(5, 30))).astype(np.int8)
          for _ in range(10)]
    rs = [rng.integers(0, 5, int(rng.integers(5, 70))).astype(np.int8)
          for _ in range(10)]
    q, _ = pad_encoded(qs)
    r, _ = pad_encoded(rs)
    s1, qe1, re1 = map(np.asarray, sw_score_ends(q, r, params))
    s2, qe2, re2 = map(np.asarray,
                       sw_score_ends_wave(q, r, params, interpret=True))
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(qe1, qe2)
    np.testing.assert_array_equal(re1, re2)
    for i in range(len(qs)):
        assert (int(s2[i]), int(qe2[i]), int(re2[i])) == \
            sw_oracle(qs[i], rs[i], *params)


@pytest.mark.parametrize("params", [SWParams(1, 1, 1, 1), SWParams(10, 4, 8, 2)])
@pytest.mark.parametrize("unroll", [1, 2, 4])
def test_wave5_matches_scan_and_oracle(rng, params, unroll):
    """Lean wavefront kernel (wave5: pad-6 scoring, diag-only shift-packed
    best, unrolled steps): identical scores, ends and tie-breaks to the
    scan implementation and the oracle, at every unroll factor."""
    from ciri_long_tpu.ops.sw_pallas import sw_score_ends_wave5, wave5_fits

    qs = [rng.integers(0, 5, int(rng.integers(5, 30))).astype(np.int8)
          for _ in range(10)]
    rs = [rng.integers(0, 5, int(rng.integers(5, 70))).astype(np.int8)
          for _ in range(10)]
    q, _ = pad_encoded(qs)
    r, _ = pad_encoded(rs)
    assert wave5_fits(q.shape[1], r.shape[1], params)
    s1, qe1, re1 = map(np.asarray, sw_score_ends(q, r, params))
    s2, qe2, re2 = map(np.asarray,
                       sw_score_ends_wave5(q, r, params, interpret=True,
                                           unroll=unroll))
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(qe1, qe2)
    np.testing.assert_array_equal(re1, re2)
    for i in range(len(qs)):
        assert (int(s2[i]), int(qe2[i]), int(re2[i])) == \
            sw_oracle(qs[i], rs[i], *params)


def test_wave5_n_column_adjacent_to_best(rng):
    """Regression guard for the pad-lane tie-steal hazard: an N column in
    r immediately after the best cell's column must not let the first
    query-pad lane tie the best with a smaller j (the lane_real mask in
    the wave5 scoring rule)."""
    from ciri_long_tpu.ops.sw_pallas import sw_score_ends_wave5

    params = SWParams(10, 4, 8, 2)
    # query length NOT a multiple of 128 -> pad lanes exist right after
    q = np.array([[0, 1, 2, 3, 0, 1]], np.int8)          # 6 real lanes
    r = np.array([[0, 1, 2, 3, 0, 1, 4, 4, 2, 2]], np.int8)  # N right after
    s, qe, re = map(np.asarray,
                    sw_score_ends_wave5(q, r, params, interpret=True))
    assert (int(s[0]), int(qe[0]), int(re[0])) == \
        sw_oracle(q[0], r[0], *params)


@pytest.mark.parametrize("params", [SWParams(1, 1, 1, 1), SWParams(10, 4, 8, 2)])
def test_chain_matches_scan_and_oracle(rng, params):
    """Chained wavefront production path (sw_score_ends_chain): identical
    scores/ends/tie-breaks to the scan implementation and the oracle,
    including chain-padding rows (B not divisible by C) and N codes."""
    from ciri_long_tpu.ops.sw_pallas import chain_plan, sw_score_ends_chain

    B = 13                      # not divisible by C -> pad-job rows
    qs = [rng.integers(0, 5, int(rng.integers(5, 30))).astype(np.int8)
          for _ in range(B)]
    rs = [rng.integers(0, 5, int(rng.integers(30, 90))).astype(np.int8)
          for _ in range(B)]
    q, _ = pad_encoded(qs)
    r, _ = pad_encoded(rs)
    plan = chain_plan(B, q.shape[1], r.shape[1], params)
    assert plan is not None and plan[0] >= 4
    s1, qe1, re1 = map(np.asarray, sw_score_ends(q, r, params))
    s2, qe2, re2 = map(np.asarray,
                       sw_score_ends_chain(q, r, params, plan,
                                           interpret=True))
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(qe1, qe2)
    np.testing.assert_array_equal(re1, re2)
    for i in range(B):
        assert (int(s2[i]), int(qe2[i]), int(re2[i])) == \
            sw_oracle(qs[i], rs[i], *params)


def test_dispatcher_routes_to_chain(rng, monkeypatch):
    """sw_score_ends_pallas picks the chained kernel for large batches
    (and CIRI_SW_CHAIN=0 falls back to wave5) with identical results."""
    from ciri_long_tpu.ops import sw_pallas

    params = SWParams(10, 4, 8, 2)
    B = 32
    q = rng.integers(0, 4, (B, 24)).astype(np.int8)
    r = rng.integers(0, 4, (B, 60)).astype(np.int8)

    calls = []
    real = sw_pallas.sw_score_ends_chain

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(sw_pallas, 'sw_score_ends_chain', spy)
    got = [np.asarray(x) for x in
           sw_pallas.sw_score_ends_pallas(q, r, params, interpret=True)]
    assert calls, "large batch should route through the chained kernel"
    monkeypatch.setenv('CIRI_SW_CHAIN', '0')
    alt = [np.asarray(x) for x in
           sw_pallas.sw_score_ends_pallas(q, r, params, interpret=True)]
    for a, b in zip(got, alt):
        np.testing.assert_array_equal(a, b)


def test_chain_plan_bounds():
    """chain_plan respects the packing/VMEM preconditions and degrades
    to None rather than emitting an invalid configuration."""
    from ciri_long_tpu.ops.sw_pallas import chain_plan

    params = SWParams(10, 4, 8, 2)
    plan = chain_plan(512, 1024, 4096, params)
    assert plan is not None
    C, btile, lrp, Tp, lb = plan
    assert (lrp + 1) % 128 == 0 and lrp >= 1024 - 1
    assert params.match * 1024 << lb < 2 ** 31
    # absurd shape: packing can never fit -> None
    assert chain_plan(512, 100_000, 3_000_000, params) is None


def test_wave_routing_and_empty_rows(rng):
    """sw_score_ends_pallas routes long-reference shapes to the wavefront
    kernel (CIRI_SW_WAVE honours overrides); all-pad rows report
    (0, -1, -1) on both paths."""
    import os

    params = SWParams(2, 3, 4, 2)
    q = np.full((4, 12), 5, np.int8)
    r = np.full((4, 300), 5, np.int8)   # LrP >= 2 * LqP -> wave
    q[0, :7] = [0, 1, 2, 3, 0, 1, 2]
    r[0, 100:107] = [0, 1, 2, 3, 0, 1, 2]
    got = [np.asarray(x)
           for x in sw_score_ends_pallas(q, r, params, interpret=True)]
    assert (got[0][0], got[1][0], got[2][0]) == (14, 6, 106)
    assert got[0][1] == 0 and got[1][1] == -1 and got[2][1] == -1
    prior = os.environ.get('CIRI_SW_WAVE')
    os.environ['CIRI_SW_WAVE'] = '0'
    try:
        scan = [np.asarray(x)
                for x in sw_score_ends_pallas(q, r, params, interpret=True)]
    finally:
        if prior is None:
            del os.environ['CIRI_SW_WAVE']
        else:
            os.environ['CIRI_SW_WAVE'] = prior
    for a, b in zip(got, scan):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("params", [SWParams(1, 1, 1, 1), SWParams(10, 4, 8, 2)])
def test_no_n_routes_match_generic(rng, params):
    """no_n=True (host-proven N-free reference) compiles leaner chain and
    wave5 scoring; results must be identical to the generic kernels and
    the scan implementation on N-free data.  Query-side N codes remain
    legal under no_n (they are folded into the hoisted score vectors)."""
    from ciri_long_tpu.ops.sw_pallas import (chain_plan, sw_score_ends_chain,
                                             sw_score_ends_wave5, wave5_fits)

    B = 13
    # queries may contain N (code 4); references must not under no_n
    qs = [rng.integers(0, 5, int(rng.integers(5, 30))).astype(np.int8)
          for _ in range(B)]
    rs = [rng.integers(0, 4, int(rng.integers(30, 90))).astype(np.int8)
          for _ in range(B)]
    q, _ = pad_encoded(qs)
    r, _ = pad_encoded(rs)
    s1, qe1, re1 = map(np.asarray, sw_score_ends(q, r, params))

    plan = chain_plan(B, q.shape[1], r.shape[1], params)
    assert plan is not None
    s2, qe2, re2 = map(np.asarray,
                       sw_score_ends_chain(q, r, params, plan,
                                           interpret=True, no_n=True))
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(qe1, qe2)
    np.testing.assert_array_equal(re1, re2)

    assert wave5_fits(q.shape[1], r.shape[1], params)
    s3, qe3, re3 = map(np.asarray,
                       sw_score_ends_wave5(q, r, params, interpret=True,
                                           no_n=True))
    np.testing.assert_array_equal(s1, s3)
    np.testing.assert_array_equal(qe1, qe3)
    np.testing.assert_array_equal(re1, re3)


def test_ref_no_n_host_proof(monkeypatch):
    """_ref_no_n only claims N-freedom for host numpy arrays without
    code 4, and only when CIRI_SW_NON enables the specialisation
    (default off: measured flat on hardware while doubling per-shape
    cold compiles).  Device arrays and tracers stay conservatively
    False."""
    import jax.numpy as jnp
    from ciri_long_tpu.ops.sw import _ref_no_n

    clean = np.array([[0, 1, 2, 3, 5]], np.int8)
    assert not _ref_no_n(clean)          # gated off by default
    monkeypatch.setenv('CIRI_SW_NON', '1')
    assert _ref_no_n(clean)
    assert not _ref_no_n(np.array([[0, 4, 2]], np.int8))
    assert not _ref_no_n(jnp.zeros((2, 3), jnp.int8))
