"""Stage 1: cyclic-consensus detection over the input reads.

Reference behavior: find_ccs_reads / load_ccs_reads (find_ccs.py:21-120).
Output files keep the exact reference format so downstream stages and the
resume logic are interchangeable:
  tmp/{prefix}.ccs.fa : '>read_id\\tsegments\\tlen(ccs)' + consensus
  tmp/{prefix}.raw.fa : '>read_id' + raw read

On a non-CPU backend the whole input batch first runs through the device
tandem-repeat pre-screen (ops/period.py::tandem_counts + screen_periodic):
one bucketed device program per length class, after which only the reads
that can possibly be periodic pay the host consensus cost.  The screen is
sound (it over-approximates the host lag voting), so screened and
unscreened runs produce byte-identical outputs.
"""

import multiprocessing
import os

from ciri_long_tpu.io.fastx import read_fastx
from ciri_long_tpu.ops.ccs import K, MIN_PERIOD, MIN_UNITS, find_consensus
from ciri_long_tpu.utils.dispatch import \
    low_rtt_device_ready as _low_rtt_device_ready
from ciri_long_tpu.utils.logger import ProgressBar

CHUNK_SIZE = 250  # reference job granularity (find_ccs.py:62)

# device-path megabatch: every unit alignment in a megabatch goes out as
# one bucketed submit (a handful of kernel calls), and ALL megabatches
# dispatch before any fetch -- the dispatch count, not the per-call RTT,
# sets the tunnel floor (VERDICT r2 #1)
MEGA_CHUNK = 2500

# device-screen shape ladder: reads pad to the smallest bucket, lags cover
# the full candidate period range (<= L/2) so the screen stays sound
SCREEN_BUCKETS = (512, 1024, 2048, 4096)
SCREEN_MAX_LEN = SCREEN_BUCKETS[-1]


def _ccs_chunk(chunk):
    """Worker: run find_consensus over one chunk of (id, seq) pairs.
    Pure host code (numpy + C++ extensions) -- no jax in workers."""
    return [(rid, find_consensus(seq)) for rid, seq in chunk]


def _detect_chunk(chunk):
    """Pool worker: host tandem detection only (C++ core, no jax).
    Returns one detect_units() result per read (picklable tuples)."""
    from ciri_long_tpu.ops.ccs import detect_units
    from ciri_long_tpu.utils.seq import encode_seq

    return [detect_units(encode_seq(seq) if isinstance(seq, str) else seq)
            for _rid, seq in chunk]


def _ccs_prep(chunk, dets=None):
    """First half of the device chunk path: host detection + job staging +
    ASYNC device dispatch.  Returns (preps, handle) for _ccs_finish.
    ``dets`` optionally injects precomputed detect_units results (the
    pooled-detection megabatch path)."""
    from ciri_long_tpu.ops.ccs import (MAX_POA_UNITS, detect_units,
                                       star_rep_index)
    from ciri_long_tpu.ops.nw_tb_batch import nw_traceback_submit
    from ciri_long_tpu.utils.seq import encode_seq

    preps = []
    qs, rs = [], []
    for t, (rid, seq) in enumerate(chunk):
        codes = encode_seq(seq) if isinstance(seq, str) else seq
        det = dets[t] if dets is not None else detect_units(codes)
        if det is None:
            preps.append((rid, seq, None, None))
            continue
        _period, _segments, units = det
        cons_units = [codes[st:en] for st, en in units[:MAX_POA_UNITS]]
        cu = [u for u in cons_units if len(u)]
        if len(cons_units) < 3 or len(cu) < 2:
            preps.append((rid, seq, det, None))   # rare POA path: host
            continue
        rep_i = star_rep_index(cu)
        jobs = []
        for ui, u in enumerate(cu):
            if ui == rep_i:
                continue
            jobs.append((ui, len(qs)))
            qs.append(u)
            rs.append(cu[rep_i])
        preps.append((rid, seq, det, (len(cu), jobs)))

    return preps, (nw_traceback_submit(qs, rs) if qs else None)


def _ccs_finish(preps, handle):
    """Second half: collect the device cigars, run the column votes."""
    from ciri_long_tpu.ops.nw_tb_batch import nw_traceback_collect

    cigars = nw_traceback_collect(handle) if handle is not None else []
    out = []
    for rid, seq, det, plan in preps:
        if plan is None:
            out.append((rid, (None, None) if det is None
                       else find_consensus(seq, det=det)))
        else:
            U, jobs = plan
            star = [None] * U
            for ui, ji in jobs:
                star[ui] = cigars[ji][1]
            out.append((rid, find_consensus(seq, star_cigars=star,
                                            det=det)))
    return out


def _ccs_hybrid_enabled():
    """Whether the main process's device-NW path should steal CCS chunks
    from the back of the pool queue.  Unlike the scan hybrid (whose
    stolen chunks are mostly device work), a CCS chunk's detection,
    staging and column votes are HOST work running in the stealer
    thread -- on a fully-subscribed box each tunnel-grade steal removes
    ~a pool worker's worth of CPU while the drain throttle sees a
    within-budget wall (measured 13.4 s vs 4.6 s CCS at 12.5k reads,
    10/50 stolen).  Auto therefore requires a LOCAL-grade link, like
    every other CCS offload gate; CIRI_CCS_HYBRID pins."""
    env = os.environ.get('CIRI_CCS_HYBRID', 'auto')
    if env in ('0', 'false'):
        return False
    if env in ('1', 'true'):
        return True
    return _low_rtt_device_ready()


def _ccs_chunk_batched(chunk):
    """Device path: every center-star unit-vs-representative alignment in
    the chunk runs as ONE batched banded-NW program with on-device
    traceback (ops/nw_tb_batch.py); detection and the column vote stay on
    host.  Byte-identical to _ccs_chunk (the kernel falls back to the
    host aligner pair-by-pair whenever its band-stability rule fails)."""
    preps, handle = _ccs_prep(chunk)
    return _ccs_finish(preps, handle)


def _ccs_device_all(work, threads, prog, pool=None):
    """Megabatched device CCS: ALL megabatches are prepped and their device
    programs dispatched before any result is fetched, so every NW program
    executes while the host detects/stages later megabatches, and the
    collect+vote tail overlaps nothing slower than itself.  Detection is
    fanned over a fork pool when threads > 1 (detection is pure C++ --
    the jax client stays in this process).  Results identical to mapping
    _ccs_chunk_batched over the same partition (tests/test_ccs_screen.py).

    Dispatch accounting vs the round-2 one-chunk-lookahead pipeline at 5k
    reads: 5 submit/collect rounds of ~8 kernel calls each with a blocking
    fetch between rounds -> ~#buckets kernel calls total, one fetch pass.
    """
    megas = [work[i:i + MEGA_CHUNK] for i in range(0, len(work), MEGA_CHUNK)]
    own_pool = pool is None and threads > 1 and len(work) > CHUNK_SIZE
    if own_pool:
        import multiprocessing

        from ciri_long_tpu.utils.dispatch import wait_backend_warm
        wait_backend_warm()
        pool = multiprocessing.get_context('fork').Pool(threads)
    try:
        pending = []
        for mi, mega in enumerate(megas):
            if pool is not None:
                det_chunks = pool.map(
                    _detect_chunk,
                    [mega[i:i + CHUNK_SIZE]
                     for i in range(0, len(mega), CHUNK_SIZE)])
                dets = [d for ch in det_chunks for d in ch]
            else:
                dets = None
            pending.append(_ccs_prep(mega, dets))
            prog.update(min(49, int(50 * (mi + 1) / max(1, len(megas)))))
        results = []
        for pi, (preps, handle) in enumerate(pending):
            results.append(_ccs_finish(preps, handle))
            prog.update(min(99, 50 + int(50 * (pi + 1) /
                                         max(1, len(pending)))))
        return results
    finally:
        if own_pool:
            pool.close()
            pool.join()


def device_screen(items, batch=256):
    """Run the device tandem pre-screen over (read_id, seq) items; returns
    the set of read ids PROVEN non-periodic (safe to skip).  Reads longer
    than the bucket ladder are auto-kept.

    The whole screen (lag counts + support election) runs as one fused
    device program per batch (ops/period.py::screen_keep) so only a [B]
    bool crosses the device->host link; batches are SUBMITTED for every
    bucket before any is fetched, overlapping device execution with host
    staging (jax dispatch is async)."""
    import numpy as np

    from ciri_long_tpu.ops.period import screen_keep
    from ciri_long_tpu.utils.seq import encode_seq

    skip = set()
    by_bucket = {}
    for rid, seq in items:
        L = len(seq)
        if L < 2 * MIN_PERIOD:
            continue                     # host path rejects these anyway
        if L > SCREEN_MAX_LEN:
            continue                     # outside the ladder: auto-keep
        for b in SCREEN_BUCKETS:
            if L <= b:
                by_bucket.setdefault(b, []).append((rid, seq))
                break

    pending = []
    for b, rows in by_bucket.items():
        max_lag = b // 2
        for i in range(0, len(rows), batch):
            part = rows[i:i + batch]
            # pad the remainder batch to the full batch shape: one compiled
            # program per bucket instead of one per (bucket, remainder) --
            # remote compiles cost minutes each on the tunnel
            mat = np.full((batch, b), 5, np.int8)
            lens = np.zeros(batch, np.int32)
            for t, (rid, seq) in enumerate(part):
                codes = encode_seq(seq)
                mat[t, :len(codes)] = codes
                lens[t] = len(codes)
            pending.append(
                (part, screen_keep(mat, lens, max_lag, K,
                                   MIN_PERIOD, MIN_UNITS)))

    for part, keep_dev in pending:
        keep = np.asarray(keep_dev)
        for t, (rid, seq) in enumerate(part):
            if not keep[t]:
                skip.add(rid)
    return skip


def find_ccs_reads(in_file, out_dir, prefix, threads=1, debugging=False,
                   use_device_screen=None):
    """Detect rolling-circle reads; returns (total_reads, ro_reads,
    ccs_seq) with ccs_seq[read_id] = [segments, ccs, raw].

    On an accelerator backend the center-star unit alignments run as
    megabatched device NW programs (submit-all/collect-all, detection
    pooled when threads > 1); on CPU, threads > 1 fans the 250-read
    chunks over a fork pool, the direct analog of the reference's worker
    pool (find_ccs.py:11-26,62).  Either way results re-merge in input
    order so the output files are byte-identical across paths and thread
    counts.

    use_device_screen: None = auto (screen only on low-RTT device links,
    see the rationale inline); True/False forces.
    """
    prog = ProgressBar()
    prog.update(0)

    total_reads = 0
    ro_reads = 0
    ccs_seq = {}
    raw = dict(read_fastx(in_file))

    ccs_path = '{}/tmp/{}.ccs.fa'.format(out_dir, prefix)
    raw_path = '{}/tmp/{}.raw.fa'.format(out_dir, prefix)
    os.makedirs(os.path.dirname(ccs_path), exist_ok=True)

    items = list(raw.items())

    if use_device_screen is None:
        env_flag = os.environ.get('CIRI_CCS_SCREEN')
        if env_flag is not None:
            use_device_screen = env_flag not in ('0', 'false', '')
        else:
            # auto: only when the accelerator link is LOCAL-grade.  The
            # screen's own device cost is small (~0.8 s / 6250 reads once
            # compiled), but what it saves -- host detection on the
            # screened-out reads -- is ~1 ms/read C++, so a high-RTT
            # tunnel link (30-200 ms/dispatch measured here) never
            # amortises the ~20 dispatch+fetch pairs.  Measured on this
            # box 2026-08-19: screen 0.8-3 s vs ~1.3 s host detection
            # saved at 6250 reads -- net loss; a locally attached chip
            # (<2 ms RTT) turns it net-positive at the same sizes.
            # condition order matters: the size check is free; the RTT
            # check uses the persisted value when fresh; the LIVE probe
            # (which initialises the backend, ~10 s through the tunnel)
            # only runs when a backend is already up -- on a cold cache
            # with no backend the gate conservatively stays host-side
            # rather than paying a synchronous init to find out
            use_device_screen = (len(items) >= 2000
                                 and _low_rtt_device_ready())
    skip = device_screen(items) if use_device_screen else set()

    work = [(rid, seq) for rid, seq in items if rid not in skip]
    chunks = [work[i:i + CHUNK_SIZE] for i in range(0, len(work), CHUNK_SIZE)]

    env_nw = os.environ.get('CIRI_CCS_DEVICE')
    if env_nw is not None:
        use_nw = env_nw not in ('0', 'false', '')
    else:
        # auto: offload the center-star unit alignments when the device
        # link is local-grade, at ANY thread count (detection still
        # pools).  The megabatched submit-all/collect-all path needs only
        # ~#buckets dispatches per MEGA_CHUNK reads (measured: 20 kernel
        # calls + 2 collects at 5k reads), but its serial host side
        # (job staging + column votes) cannot undercut the pure-host
        # C++ pool when each fetch also pays 30-200 ms tunnel RTT --
        # measured 2026-08-19 at 5k reads -t4: device path 65 s vs host
        # pool 4.5 s on the tunnel.  CIRI_CCS_DEVICE=1/0 forces.
        use_nw = _low_rtt_device_ready()

    if use_nw:
        results = _ccs_device_all(work, threads, prog)
    elif threads > 1 and len(chunks) > 1:
        # fork only after the CLI's backend warm-up thread (if any) has
        # finished: forking while it may hold import-machinery or
        # PJRT-plugin locks can deadlock the children (ADVICE r3)
        from ciri_long_tpu.utils.dispatch import wait_backend_warm
        wait_backend_warm()
        ctx = multiprocessing.get_context('fork')
        with ctx.Pool(threads) as pool:
            if _ccs_hybrid_enabled():
                # work-steal split (parallel/hybrid.py, same machinery
                # as the scan stage): the pool drains chunks from the
                # front while the main process's batched device-NW path
                # steals from the back; the adaptive throttle stops
                # stealing on links where a device chunk runs slower
                # than ~3x a pool chunk, and the pool races any slow or
                # failed steal, so the device can only ADD throughput
                from ciri_long_tpu.parallel.hybrid import HybridDrain
                payloads = [(ci, c) for ci, c in enumerate(chunks)]
                hd = HybridDrain(pool, threads, _ccs_chunk,
                                 _ccs_chunk_batched, payloads)
                results = _drain((hd.result(ci)
                                  for ci in range(len(chunks))),
                                 prog, len(chunks))
                if hd.stolen:
                    import logging
                    logging.getLogger('CIRI-long').info(
                        'hybrid ccs: device stole %d/%d chunks'
                        % (hd.stolen, len(chunks)))
            else:
                result_iter = pool.imap(_ccs_chunk, chunks)
                results = _drain(result_iter, prog, len(chunks))
    else:
        # serial (-t 1) runs still own every core: find_consensus is
        # dominated by GIL-releasing C++ (tandem detect + center-star,
        # ~70% of its wall), so a thread pool over reads gets real
        # parallelism without fork/spawn cost.  CIRI_SELECT_THREADS is
        # the CLI's idle-core budget (cli/main.py: cpu_count at -t 1,
        # 1 inside worker pools).
        host_threads = int(os.environ.get('CIRI_SELECT_THREADS', '1') or 1)
        if host_threads > 1 and len(work) > 1:
            from concurrent.futures import ThreadPoolExecutor

            def _one(item):
                rid, seq = item
                return rid, find_consensus(seq)

            with ThreadPoolExecutor(min(host_threads, 8)) as tp:
                results = _drain((list(tp.map(_one, c)) for c in chunks),
                                 prog, len(chunks))
        else:
            results = _drain((_ccs_chunk(c) for c in chunks), prog,
                             len(chunks))

    total_reads = len(items)
    with open(ccs_path, 'w') as out, open(raw_path, 'w') as trimmed:
        # merge screened-out reads back in input order so the output files
        # are byte-identical to an unscreened run
        res_by_id = {rid: r for chunk_res in results for rid, r in chunk_res}
        for rid, _seq in items:
            segments, ccs = res_by_id.get(rid, (None, None))
            if segments is None or ccs is None:
                continue
            ro_reads += 1
            out.write('>{}\t{}\t{}\n{}\n'.format(
                rid, segments, len(ccs), ccs))
            trimmed.write('>{}\n{}\n'.format(rid, raw[rid]))
            ccs_seq[rid] = [segments, ccs, raw[rid]]
    prog.update(100)

    return total_reads, ro_reads, ccs_seq


def _drain(result_iter, prog, n_chunks):
    """Collect chunk results in submission order, ticking the bar."""
    results = []
    for i, res in enumerate(result_iter):
        results.append(res)
        prog.update(min(99, int(100 * (i + 1) / max(1, n_chunks))))
    return results


def load_ccs_reads(out_dir, prefix):
    """Reload a previous run's CCS calls (find_ccs.py:106-120)."""
    ccs_seq = {}
    with open('{}/tmp/{}.ccs.fa'.format(out_dir, prefix), 'r') as f:
        for line in f:
            content = line.rstrip().split()
            seq = f.readline().rstrip()
            ccs_seq[content[0].lstrip('>')] = [content[1], seq]

    with open('{}/tmp/{}.raw.fa'.format(out_dir, prefix), 'r') as f:
        for line in f:
            read_id = line.rstrip().split()[0].lstrip('>')
            seq = f.readline().rstrip()
            ccs_seq[read_id].append(seq)
    return ccs_seq
