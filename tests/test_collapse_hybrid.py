"""Round-5 collapse parallel paths: the threaded device-cluster executor
(correct_chunk exec_threads) and the hybrid work-steal drain shared with
the scan stage must leave outputs byte-identical to the serial path.

The reference pools correct_chunk over a plain mp.Pool (collapse.py:848);
the threaded executor + back-steal are TPU-first additions that let a
(possibly remote) accelerator overlap its per-cluster dispatch chains and
ADD to host throughput instead of replacing it."""

import os
import threading
import time

import pytest

from ciri_long_tpu.context import Context
from ciri_long_tpu.io.genome import Genome
from ciri_long_tpu.models.aligner import GenomeAligner
from ciri_long_tpu.ops.ccs import find_consensus
from ciri_long_tpu.pipeline.collapse import (cluster_reads, correct_chunk,
                                             correct_reads)

from tests.test_hybrid_scan import FakePool
from tests.test_pipeline_call import make_rolling_read
from tests.test_stage_differential import _ccs_chunk, _records_to_reads


def rand_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


@pytest.fixture(scope='module')
def clusters_world(module_rng):
    """Three planted circRNA loci, 6 rolling-circle reads each -> BSJ
    candidate clusters via the real scan stage."""
    rng = module_rng
    chars = list(rand_seq(rng, 40_000))
    loci = [(8_000, 8_400), (16_000, 16_520), (26_000, 26_300)]
    for st, en in loci:
        chars[st - 2:st] = list('AG')
        chars[en:en + 2] = list('GT')
    chr1 = ''.join(chars)
    genome = Genome.from_dict({'chr1': chr1})
    ctx = Context(aligner=GenomeAligner(genome), genome=genome)

    reads = []
    for li, (st, en) in enumerate(loci):
        unit = chr1[st:en]
        for i in range(6):
            reads.append(('l{}_r{}'.format(li, i),
                          make_rolling_read(rng, unit, copies=3.5,
                                            rot=i * 41, noise=0.015)))

    from ciri_long_tpu.pipeline.find_bsj import scan_ccs_chunk
    chunk, _ = _ccs_chunk(reads)
    _, _, ret = scan_ccs_chunk(ctx, chunk, True)
    cand = _records_to_reads(ret)
    clusters = [c for c in cluster_reads(cand) if len(c) >= 2]
    assert len(clusters) >= 2, 'world produced too few clusters'
    return ctx, clusters, cand


def _norm(cs):
    return [(list(r[0]), r[1], [tuple(x) for x in r[2]], *r[3:])
            for r in cs]


def test_correct_chunk_threaded_identical(clusters_world):
    ctx, clusters, _ = clusters_world
    cs1, cnt1 = correct_chunk(ctx, clusters, max_cluster=200)
    cs8, cnt8 = correct_chunk(ctx, clusters, max_cluster=200,
                              exec_threads=8)
    assert dict(cnt8) == dict(cnt1)
    assert _norm(cs8) == _norm(cs1)


def test_correct_reads_device_env_identical(clusters_world, monkeypatch):
    """CIRI_COLLAPSE_DEVICE=1 forces the threaded executor even on the
    CPU backend; outputs and counters must match the pinned-host run."""
    ctx, clusters, _ = clusters_world
    monkeypatch.setenv('CIRI_COLLAPSE_DEVICE', '0')
    cnt_host, reads_host = correct_reads(ctx, clusters)
    monkeypatch.setenv('CIRI_COLLAPSE_DEVICE', '1')
    monkeypatch.setenv('CIRI_COLLAPSE_DEVICE_THREADS', '7')
    cnt_dev, reads_dev = correct_reads(ctx, clusters)
    assert dict(cnt_dev) == dict(cnt_host)
    assert _norm(reads_dev) == _norm(reads_host)


def test_hybrid_drain_multi_stealer_exactly_once():
    """device_width > 1: several stealer threads share the back cursor;
    the split must stay exactly-once and in-order drainable."""
    from ciri_long_tpu.parallel.hybrid import HybridDrain

    n = 40
    worker_seen, local_seen = [], []
    lock = threading.Lock()

    def worker_fn(p):
        with lock:
            worker_seen.append(p)
        time.sleep(0.03)
        return p * 10

    def run_local(p):
        with lock:
            local_seen.append(p)
        time.sleep(0.005)
        return p * 10

    hd = HybridDrain(FakePool(2), 2, worker_fn, run_local,
                     [(ci, ci) for ci in range(n)], device_width=4)
    for ci in range(n):
        assert hd.result(ci) == ci * 10
    assert sorted(worker_seen + local_seen) == list(range(n))
    assert not (set(worker_seen) & set(local_seen))
    assert hd.stolen == len(local_seen) > 1


def test_hybrid_drain_device_error_healed_by_pool_race():
    """A failing device steal no longer dooms the drain when the idle
    pool can race the chunk: delivery completes with the pool's result
    (round-5: a cold-compiling steal must never be the critical path,
    and a dying tunnel must not kill a run the host can finish)."""
    from ciri_long_tpu.parallel.hybrid import HybridDrain

    def worker_fn(p):
        return p * 10

    def run_local(p):
        raise ValueError('device boom %d' % p)

    hd = HybridDrain(FakePool(1, delay=0.02), 1, worker_fn, run_local,
                     [(ci, ci) for ci in range(8)], device_width=3)
    for ci in range(8):
        assert hd.result(ci) == ci * 10
    assert hd.raced > 0


def test_hybrid_drain_error_on_both_sides_propagates():
    from ciri_long_tpu.parallel.hybrid import HybridDrain

    def worker_fn(p):
        if p >= 4:
            raise ValueError('pool boom %d' % p)
        return p

    def run_local(p):
        raise ValueError('device boom %d' % p)

    # back chunks (>=4) fail on the device AND in the pool race -> the
    # ordered drain must surface the failure
    hd = HybridDrain(FakePool(1, delay=0.02), 1, worker_fn, run_local,
                     [(ci, ci) for ci in range(8)], device_width=3)
    with pytest.raises(RuntimeError, match='hybrid drain failed'):
        for ci in range(8):
            hd.result(ci)


def test_slow_device_rounds_pin_host(clusters_world, monkeypatch):
    """Degraded-link bail-out: two fused rounds over budget must pin
    CIRI_PREFER_HOST_COMPUTE for the rest of the process (the RTT gate
    cannot catch a link whose probe is fast but whose kernel calls are
    seconds -- observed on the axon tunnel, round 5).  Results stay
    identical (the fuser keeps fusing; dispatch just routes host)."""
    import time

    from ciri_long_tpu.pipeline import collapse as cl

    ctx, clusters, _ = clusters_world
    want_cs, want_cnt = correct_chunk(ctx, clusters, max_cluster=200)

    real = cl._fused_sw

    def slow_fused_sw(jobs):
        time.sleep(0.02)
        return real(jobs)

    monkeypatch.setattr(cl, '_fused_sw', slow_fused_sw)
    monkeypatch.setenv('CIRI_COLLAPSE_ROUND_BUDGET_S', '0.01')
    monkeypatch.delenv('CIRI_PREFER_HOST_COMPUTE', raising=False)
    got_cs, got_cnt = cl.correct_chunk(ctx, clusters, max_cluster=200,
                                       exec_threads=4, fuse=True)
    assert os.environ.get('CIRI_PREFER_HOST_COMPUTE') == '1'
    assert dict(got_cnt) == dict(want_cnt)
    assert _norm(got_cs) == _norm(want_cs)
