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
from ciri_long_tpu.utils.logger import ProgressBar

CHUNK_SIZE = 250  # reference job granularity (find_ccs.py:62)

# device-screen shape ladder: reads pad to the smallest bucket, lags cover
# the full candidate period range (<= L/2) so the screen stays sound
SCREEN_BUCKETS = (512, 1024, 2048, 4096)
SCREEN_MAX_LEN = SCREEN_BUCKETS[-1]


def _ccs_chunk(chunk):
    """Worker: run find_consensus over one chunk of (id, seq) pairs.
    Pure host code (numpy + C++ extensions) -- no jax in workers."""
    return [(rid, find_consensus(seq)) for rid, seq in chunk]


def _ccs_prep(chunk):
    """First half of the device chunk path: host detection + job staging +
    ASYNC device dispatch.  Returns (preps, handle) for _ccs_finish."""
    from ciri_long_tpu.ops.ccs import (MAX_POA_UNITS, detect_units,
                                       star_rep_index)
    from ciri_long_tpu.ops.nw_tb_batch import nw_traceback_submit
    from ciri_long_tpu.utils.seq import encode_seq

    preps = []
    qs, rs = [], []
    for rid, seq in chunk:
        codes = encode_seq(seq) if isinstance(seq, str) else seq
        det = detect_units(codes)
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


def _ccs_chunk_batched(chunk):
    """Device path: every center-star unit-vs-representative alignment in
    the chunk runs as ONE batched banded-NW program with on-device
    traceback (ops/nw_tb_batch.py); detection and the column vote stay on
    host.  Byte-identical to _ccs_chunk (the kernel falls back to the
    host aligner pair-by-pair whenever its band-stability rule fails)."""
    preps, handle = _ccs_prep(chunk)
    return _ccs_finish(preps, handle)


def _ccs_pipeline(chunks, prog):
    """One-chunk-lookahead software pipeline: chunk i+1's host detection +
    device dispatch run while chunk i's device programs execute, and
    chunk i's voting overlaps chunk i+1's execution.  Results identical
    to mapping _ccs_chunk_batched."""
    results = []
    prev = None
    for ci, chunk in enumerate(chunks):
        cur = _ccs_prep(chunk)
        if prev is not None:
            results.append(_ccs_finish(*prev))
            prog.update(min(99, int(100 * len(results) /
                                    max(1, len(chunks)))))
        prev = cur
    if prev is not None:
        results.append(_ccs_finish(*prev))
    return results


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
            mat = np.full((len(part), b), 5, np.int8)
            lens = np.zeros(len(part), np.int32)
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

    threads > 1 fans the 250-read chunks over a fork pool, the direct
    analog of the reference's worker pool (find_ccs.py:11-26,62);
    results are consumed in submission order so output files stay
    byte-deterministic.

    use_device_screen: None = auto (screen on non-CPU backends, where the
    bulk lag program amortises onto the accelerator); True/False forces.
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
            # auto: only when an accelerator is attached AND the batch is
            # big enough to amortise its dispatch + compile latency (this
            # box's TPU sits behind a 50-200 ms RTT tunnel; a real local
            # chip amortises far sooner, but small inputs are fast on host
            # either way)
            import jax
            use_device_screen = (jax.default_backend() != 'cpu'
                                 and len(items) >= 2000)
    skip = device_screen(items) if use_device_screen else set()

    work = [(rid, seq) for rid, seq in items if rid not in skip]
    chunks = [work[i:i + CHUNK_SIZE] for i in range(0, len(work), CHUNK_SIZE)]

    if threads > 1 and len(chunks) > 1:
        ctx = multiprocessing.get_context('fork')
        with ctx.Pool(threads) as pool:
            result_iter = pool.imap(_ccs_chunk, chunks)
            results = _drain(result_iter, prog, len(chunks))
    else:
        # single-process: on an accelerator backend batch each chunk's
        # unit alignments into one device NW program (byte-identical)
        env_nw = os.environ.get('CIRI_CCS_DEVICE')
        if env_nw is not None:
            use_nw = env_nw not in ('0', 'false', '')
        else:
            import jax
            use_nw = jax.default_backend() != 'cpu'
        if use_nw:
            # chunk partition does not affect results (outputs re-merge in
            # input order below), so the device path uses 4x chunks: each
            # batched NW program costs a dispatch RTT, fuller is better
            chunks = [work[i:i + 4 * CHUNK_SIZE]
                      for i in range(0, len(work), 4 * CHUNK_SIZE)]
        if use_nw:
            results = _ccs_pipeline(chunks, prog)
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
