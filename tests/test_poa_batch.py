"""Device POA (ops/poa_batch.py) parity vs the sequential host/native path.

The lockstep driver (ops/poa.py::poa_consensus_many with use_device=True)
must produce byte-identical consensus to per-job poa() -- the same
contract the pipeline relies on when the device path engages on the TPU
backend (collapse cluster consensus, reference collapse.py:504).
"""

import numpy as np
import pytest

from ciri_long_tpu.ops.poa import poa, poa_consensus_many
from tests.test_poa import SEGMENTS, mutate


def _jobs_equal(jobs):
    want = [poa(seqs, 2, False, 10, -4, -8, -2, -24, -1)[0] for seqs in jobs]
    got = poa_consensus_many(jobs, use_device=True)
    assert got == want, [
        (i, g, w) for i, (g, w) in enumerate(zip(got, want)) if g != w][:3]


def test_device_poa_identical_copies():
    _jobs_equal([["ACGTACGTTGCAGGGCATCGATCG"] * 5])


def test_device_poa_reference_segments():
    _jobs_equal([SEGMENTS])


def test_device_poa_single_and_empty():
    _jobs_equal([["ACGT"], ["ACGTAC", ""], [""], ["", "GGGT", "GGAT"]])


def test_device_poa_fuzz_batch(rng):
    jobs = []
    for _ in range(12):
        template = "".join(rng.choice(list("ACGTN"),
                                      size=int(rng.integers(20, 220))))
        k = int(rng.integers(2, 9))
        sub = float(rng.uniform(0.0, 0.12))
        jobs.append([mutate(rng, template, sub=sub, ins=sub / 2,
                            dele=sub / 2) for _ in range(k)])
    _jobs_equal(jobs)


def test_device_poa_fuzz_indel_heavy(rng):
    jobs = []
    for _ in range(6):
        template = "".join(rng.choice(list("ACGT"),
                                      size=int(rng.integers(30, 120))))
        jobs.append([mutate(rng, template, sub=0.05, ins=0.12, dele=0.12)
                     for _ in range(int(rng.integers(2, 6)))])
    _jobs_equal(jobs)


def test_device_poa_mixed_lengths(rng):
    """Jobs landing in different shape buckets within one lockstep round."""
    t1 = "".join(rng.choice(list("ACGT"), size=40))
    t2 = "".join(rng.choice(list("ACGT"), size=500))
    jobs = [[mutate(rng, t1) for _ in range(3)],
            [mutate(rng, t2) for _ in range(4)],
            [mutate(rng, t1) for _ in range(7)]]
    _jobs_equal(jobs)


def _rand_graph(rng, V, P=8, L=16, extra_edge_p=0.35):
    """Synthetic topo-ordered DAG: linear backbone + random short back
    edges (delta <= L), the shape real consensus bubbles take."""
    bases = rng.integers(0, 4, V).astype(np.int32)
    preds = np.zeros((V, P), np.int32)
    npred = np.ones(V, np.int32)
    for i in range(1, V):
        ps = [i]                        # rank+1 of node i-1
        while (len(ps) < P and rng.random() < extra_edge_p):
            delta = int(rng.integers(1, min(L, i + 1) + 1))
            pr = i + 1 - delta          # rank+1 in [1, i]
            if pr not in ps:
                ps.append(pr)
        preds[i, :len(ps)] = sorted(ps)
        npred[i] = len(ps)
    return bases, preds, npred


@pytest.mark.parametrize("L", [2, 4, 8, 16])
def test_window_kernel_matches_general(rng, L):
    """poa_align_batch(lookback=L) must be bit-identical to the general
    gather kernel on graphs whose preds all fit the ring, at every ring
    depth the production router picks (ops/poa.py::_poa_lb_bucket) plus
    the L=2 edge (valid kernel, routed around for speed)."""
    from ciri_long_tpu.ops.poa_batch import max_lookback, poa_align_batch

    B, Vmax, nmax, P = 6, 48, 40, 8
    bases_a = np.zeros((B, Vmax), np.int32)
    preds_a = np.zeros((B, Vmax, P), np.int32)
    npred_a = np.ones((B, Vmax), np.int32)
    seqs_a = np.full((B, nmax), 5, np.int32)
    nv_a = np.zeros(B, np.int32)
    ns_a = np.zeros(B, np.int32)
    for bi in range(B):
        V = int(rng.integers(5, Vmax + 1))
        n = int(rng.integers(3, nmax + 1))
        bases, preds, npred = _rand_graph(rng, V, P, L)
        assert max_lookback(preds, npred) <= L
        bases_a[bi, :V] = bases
        preds_a[bi, :V] = preds
        npred_a[bi, :V] = npred
        nv_a[bi] = V
        seqs_a[bi, :n] = rng.integers(0, 4, n)
        ns_a[bi] = n

    scores = (10, -4, -8, -2, -24, -1)
    gs, ga, gc = poa_align_batch(bases_a, nv_a, preds_a, npred_a,
                                 seqs_a, ns_a, scores)
    ws, wa, wc = poa_align_batch(bases_a, nv_a, preds_a, npred_a,
                                 seqs_a, ns_a, scores, lookback=L)
    assert np.array_equal(ws, gs)
    assert np.array_equal(wc, gc)
    assert np.array_equal(wa, ga)


def test_lb_bucket_routing():
    """Jobs route to the smallest ring depth covering their back edges;
    overflow past the deepest ring returns None (general kernel)."""
    from ciri_long_tpu.ops.poa import _poa_lb_bucket

    assert _poa_lb_bucket(0) == 4          # pure-source graphs
    assert _poa_lb_bucket(1) == 4          # linear backbone rounds
    assert _poa_lb_bucket(4) == 4
    assert _poa_lb_bucket(5) == 8
    assert _poa_lb_bucket(16) == 16
    assert _poa_lb_bucket(17) is None

    from ciri_long_tpu.ops.poa import _poa_p_bucket

    assert _poa_p_bucket(1) == 4           # backbone rounds
    assert _poa_p_bucket(4) == 4
    assert _poa_p_bucket(5) == 8
    assert _poa_p_bucket(8) == 8


def test_pred_slot_slicing_invariant(rng):
    """Dropping dead predecessor padding (P=8 -> P=4 when every in-degree
    fits) must not change scores, tracebacks or counts -- the property
    the adaptive-P router relies on."""
    from ciri_long_tpu.ops.poa_batch import poa_align_batch

    B, Vmax, nmax, L = 5, 40, 36, 4
    bases_a = np.zeros((B, Vmax), np.int32)
    preds_a = np.zeros((B, Vmax, 8), np.int32)
    npred_a = np.ones((B, Vmax), np.int32)
    seqs_a = np.full((B, nmax), 5, np.int32)
    nv_a = np.zeros(B, np.int32)
    ns_a = np.zeros(B, np.int32)
    for bi in range(B):
        V = int(rng.integers(5, Vmax + 1))
        n = int(rng.integers(3, nmax + 1))
        bases, preds, npred = _rand_graph(rng, V, P=4, L=L)
        assert npred.max() <= 4
        bases_a[bi, :V] = bases
        preds_a[bi, :V, :4] = preds
        npred_a[bi, :V] = npred
        nv_a[bi] = V
        seqs_a[bi, :n] = rng.integers(0, 4, n)
        ns_a[bi] = n

    scores = (10, -4, -8, -2, -24, -1)
    for lb in (None, L):
        s8, a8, c8 = poa_align_batch(bases_a, nv_a, preds_a, npred_a,
                                     seqs_a, ns_a, scores, lookback=lb)
        s4, a4, c4 = poa_align_batch(bases_a, nv_a, preds_a[:, :, :4],
                                     npred_a, seqs_a, ns_a, scores,
                                     lookback=lb)
        assert np.array_equal(s4, s8)
        assert np.array_equal(c4, c8)
        assert np.array_equal(a4, a8)


def test_max_lookback_and_overflow_routing(rng):
    """max_lookback flags long back edges; jobs that overflow the ring
    still produce byte-identical consensus (general-kernel group)."""
    from ciri_long_tpu.ops.poa_batch import max_lookback

    preds = np.zeros((30, 8), np.int32)
    npred = np.ones(30, np.int32)
    preds[1:, 0] = np.arange(1, 30)
    assert max_lookback(preds, npred) == 1
    preds[29, 1] = 2                      # node 30 <- rank 2: delta 28
    npred[29] = 2
    assert max_lookback(preds, npred) == 28

    # end-to-end: a long repeat forces far-back fuse edges in real
    # graphs; device path (whatever kernels it picks) must match host
    t = "".join(rng.choice(list("ACGT"), size=30))
    job = [t * 3, t * 2 + mutate(rng, t), mutate(rng, t * 3, sub=0.08)]
    _jobs_equal([job])
