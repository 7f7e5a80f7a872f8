"""Hybrid work-stealing scan split (ROADMAP r4 #5): the worker pool
drains chunks from the queue FRONT while the main process's device path
steals from the BACK; the writer drains strictly in chunk order, so the
output bytes must be identical to the serial / pooled paths no matter
which side processed a chunk.

The reference has no analog (its Pool fans everything out,
CIRI_long/find_bsj.py:328-372); this is a TPU-first addition so the one
accelerator and the host cores add throughput instead of idling each
other."""

import dataclasses
import threading
import time

import numpy as np
import pytest


class FakePool:
    """apply_async-compatible pool running tasks on daemon threads with a
    bounded concurrency -- stands in for the spawn pool so the scheduler
    logic is testable without paying worker startup."""

    def __init__(self, n, delay=0.0):
        self._processes = n
        self._delay = delay
        self._sem = threading.Semaphore(n)

    def apply_async(self, fn, args, callback=None, error_callback=None):
        def run():
            with self._sem:
                try:
                    if self._delay:
                        time.sleep(self._delay)
                    res = fn(*args)
                except BaseException as exc:  # noqa: BLE001
                    if error_callback is not None:
                        error_callback(exc)
                    return
            callback(res)

        threading.Thread(target=run, daemon=True).start()


def test_scheduler_exactly_once_and_steals():
    from ciri_long_tpu.pipeline.find_bsj import _HybridScan

    n = 24
    worker_seen = []
    local_seen = []
    lock = threading.Lock()

    def worker_fn(payload):
        with lock:
            worker_seen.append(payload)
        time.sleep(0.05)
        return payload * 10

    def run_local(payload):
        with lock:
            local_seen.append(payload)
        return payload * 10

    pool = FakePool(2)
    payloads = [(ci, ci) for ci in range(n)]
    hs = _HybridScan(pool, 2, worker_fn, run_local, payloads)
    # drain in order, as the writer does
    for ci in range(n):
        assert hs.result(ci) == ci * 10
    # exactly-once DELIVERY covering everything; computation may overlap
    # only for chunks the idle pool raced against a running steal
    assert set(worker_seen) | set(local_seen) == set(range(n))
    assert len(set(worker_seen) & set(local_seen)) <= hs.raced
    # the local (device) side must actually have stolen work from the back
    assert hs.stolen == len(local_seen) > 0
    assert min(local_seen) > max(worker_seen) - n  # sanity: both sides ran


def test_scheduler_leaves_tail_to_pool():
    """The device side must stop stealing when only nworkers un-started
    chunks remain, so a slow device chunk never becomes the critical
    path."""
    from ciri_long_tpu.pipeline.find_bsj import _HybridScan

    local_seen = []

    def worker_fn(payload):
        return payload

    def run_local(payload):
        local_seen.append(payload)
        time.sleep(0.02)
        return payload

    nworkers = 3
    payloads = [(ci, ci) for ci in range(10)]
    hs = _HybridScan(FakePool(nworkers), nworkers, worker_fn, run_local,
                     payloads)
    for ci in range(10):
        hs.result(ci)
    # prime depth is nworkers+2=5; the device may steal at most until
    # tail-head == nworkers, i.e. never the last 3 un-started chunks
    assert len(local_seen) <= 10 - 5 - nworkers + 3  # loose structural cap
    assert sorted(set(local_seen)) == sorted(local_seen)  # no duplicates


def test_scheduler_propagates_worker_error():
    from ciri_long_tpu.pipeline.find_bsj import _HybridScan

    def worker_fn(payload):
        raise ValueError("boom %d" % payload)

    def run_local(payload):
        return payload

    hs = _HybridScan(FakePool(1), 1, worker_fn, run_local,
                     [(ci, ci) for ci in range(4)])
    with pytest.raises(RuntimeError, match="hybrid drain failed"):
        # chunk 0 goes to the failing pool side
        hs.result(0)


def rand_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


def test_hybrid_scan_bytes_identical(rng, tmp_path, monkeypatch):
    """scan_ccs_reads under CIRI_SCAN_HYBRID=1 with a fake pool must
    produce byte-identical cand_circ.fa and counters vs the serial path,
    with the steal side actually engaged."""
    from ciri_long_tpu.config import CallConfig
    from ciri_long_tpu.context import Context
    from ciri_long_tpu.io.genome import Genome
    from ciri_long_tpu.models.aligner import GenomeAligner
    from ciri_long_tpu.ops.ccs import find_consensus
    from ciri_long_tpu.pipeline import find_bsj as fb
    from tests.test_pipeline_call import make_rolling_read

    chr1 = list(rand_seq(rng, 25_000))
    st, en = 9_000, 9_400
    chr1[st - 2:st] = list("AG")
    chr1[en:en + 2] = list("GT")
    chr1 = "".join(chr1)
    unit = chr1[st:en]
    genome = Genome.from_dict({"chr1": chr1})
    ctx = Context(aligner=GenomeAligner(genome), genome=genome)

    ccs_seq = {}
    for i in range(8):
        seq = make_rolling_read(rng, unit, copies=4.0, rot=i * 29,
                                noise=0.01)
        seg, ccs = find_consensus(seq)
        assert ccs is not None
        ccs_seq["r%d" % i] = [seg, ccs, seq]

    cfg = dataclasses.replace(CallConfig(), ccs_chunk_size=1)
    out_dir = str(tmp_path)
    (tmp_path / "tmp").mkdir()

    cnt_serial, _ = fb.scan_ccs_reads(ctx, ccs_seq, True, out_dir,
                                      "serial", cfg)
    golden = (tmp_path / "serial.cand_circ.fa").read_text()

    # hybrid run: fake pool workers use the SAME ctx via _WORKER_CTX (the
    # real spawn pool builds its own identical Context); slow pool so the
    # local side demonstrably steals
    monkeypatch.setenv("CIRI_SCAN_HYBRID", "1")
    monkeypatch.setattr(fb, "_WORKER_CTX", ctx)
    pool = FakePool(1, delay=0.15)
    cnt_hybrid, _ = fb.scan_ccs_reads(ctx, ccs_seq, True, out_dir,
                                      "hyb", cfg, threads=2, pool=pool)
    assert (tmp_path / "hyb.cand_circ.fa").read_text() == golden
    assert dict(cnt_hybrid) == dict(cnt_serial)
