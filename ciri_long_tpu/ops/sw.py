"""Batched affine-gap local alignment (Smith-Waterman) for TPU.

Replaces the reference's vendored striped-SSW C library
(libs/striped_smith_waterman/ssw.c: sw_sse2_byte ssw.c:123, sw_sse2_word
ssw.c:371, reverse-pass begin search ssw.c:836-849) with a fixed-shape,
batched JAX program.

TPU-first dataflow
------------------
The SSE2 "striped" lane trick (ssw.c:95-98) exists because a CPU vector is
128 bits.  On TPU the whole *reference axis* is the vector: we scan over
query rows (the short sequence) and update an entire [B, Lr] row of DP
cells per step on the VPU.  The within-row affine-gap dependency
(E[j] = max(E[j-1]-gE, H[j-1]-gO)) is resolved without a serial loop using
the prefix-max identity

    E[j] = max_{k<j} (H'[k] + k*gE) - gO - (j-1)*gE

which is a single ``lax.cummax``.  Restricting E donors to H' (the row
values *before* adding E) is exact whenever gap_open >= gap_extend: routing
a gap through another gap's endpoint always costs an extra (gO - gE) >= 0
compared to extending the original gap.  All scoring schemes used by the
pipeline (1/1/1/1 clip re-alignment, 10/4/8/2 junction curation) satisfy
this; it is asserted at trace time.

Scoring semantics match ssw_wrap.py:150-161: match/mismatch over A,C,G,T;
N (code 4) scores 0 against everything.  PAD (code 5) rows/columns are
poisoned with a large negative score so padded batch elements never win.

A gap of length L costs gap_open + (L-1)*gap_extend (ssw.c:229-239).

Returned coordinates use the SSW convention: ``*_begin``/``*_end`` are
0-based inclusive indices of the first/last aligned base.
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# plain python int: a module-level jnp constant would initialise the XLA
# backend at import time, which breaks jax.distributed.initialize ordering
NEG = -(1 << 28)


from ciri_long_tpu.utils.dispatch import count_dispatch as _count_dispatch

class SWParams(NamedTuple):
    match: int = 1
    mismatch: int = 1
    gap_open: int = 1
    gap_extend: int = 1


def _pair_score(q_codes, r_codes, match, mismatch):
    """Score of aligning query base codes against ref base codes.

    q_codes: [B, 1] broadcast against r_codes [B, Lr].
    N (4) scores 0; PAD (5) poisons the cell.
    """
    is_n = (q_codes == 4) | (r_codes == 4)
    is_pad = (q_codes >= 5) | (r_codes >= 5)
    s = jnp.where(q_codes == r_codes, jnp.int32(match), jnp.int32(-mismatch))
    s = jnp.where(is_n, jnp.int32(0), s)
    return jnp.where(is_pad, jnp.int32(NEG), s)


@functools.partial(jax.jit, static_argnames=("params",))
def sw_score_ends(query, ref, params: SWParams):
    """Batched SW score + end coordinates.

    Args:
      query: int8/int32 [B, Lq] encoded (A0 C1 G2 T3 N4 PAD5).
      ref:   int8/int32 [B, Lr].
      params: SWParams (static).

    Returns:
      score [B] int32, q_end [B] int32, r_end [B] int32 -- inclusive end
      positions of the optimal local alignment; (-1, -1) and score 0 when no
      positive-scoring cell exists.  Ties resolved by smallest r_end, then
      smallest q_end (the reference SSW keeps the earliest reference end,
      ssw.c:262-270).
    """
    assert params.gap_open >= params.gap_extend, (
        "prefix-scan affine-gap formulation requires gap_open >= gap_extend")
    B, Lq = query.shape
    _, Lr = ref.shape
    q = query.astype(jnp.int32)
    r = ref.astype(jnp.int32)
    gO = jnp.int32(params.gap_open)
    gE = jnp.int32(params.gap_extend)

    j_idx = jax.lax.broadcasted_iota(jnp.int32, (B, Lr), 1)

    def row_step(carry, q_col):
        H_prev, F_prev, best, best_j, best_i, i = carry
        s = _pair_score(q_col[:, None], r, params.match, params.mismatch)

        # F: gap consuming query chars (vertical), from previous row.
        F = jnp.maximum(F_prev - gE, H_prev - gO)

        # Diagonal: H_prev shifted right by one (j=0 sees empty prefix = 0).
        H_diag = jnp.pad(H_prev[:, :-1], ((0, 0), (1, 0)))
        H0 = jnp.maximum(jnp.maximum(H_diag + s, F), 0)

        # E: gap consuming ref chars (horizontal), within this row, via
        # prefix max of (H0[k] + k*gE).
        p = jax.lax.cummax(H0 + j_idx * gE, axis=1)
        p_shift = jnp.pad(p[:, :-1], ((0, 0), (1, 0)), constant_values=int(NEG))
        E = p_shift - gO - (j_idx - 1) * gE
        H = jnp.maximum(H0, E)

        # Track best (score desc, r_end asc, q_end asc).
        row_best = jnp.max(H, axis=1)
        row_j = jnp.argmax(H == row_best[:, None], axis=1).astype(jnp.int32)
        better = (row_best > best) | ((row_best == best) & (row_j < best_j))
        best_new = jnp.where(better, row_best, best)
        best_j_new = jnp.where(better, row_j, best_j)
        best_i_new = jnp.where(better, i, best_i)
        return (H, F, best_new, best_j_new, best_i_new, i + 1), None

    H0 = jnp.zeros((B, Lr), jnp.int32)
    F0 = jnp.full((B, Lr), NEG, jnp.int32)
    init = (H0, F0, jnp.zeros(B, jnp.int32),
            jnp.full(B, Lr, jnp.int32), jnp.full(B, -1, jnp.int32),
            jnp.int32(0))
    (_, _, best, best_j, best_i, _), _ = jax.lax.scan(
        row_step, init, jnp.transpose(q))

    none = best <= 0
    score = jnp.where(none, 0, best)
    q_end = jnp.where(none, -1, best_i)
    r_end = jnp.where(none, -1, best_j)
    return score, q_end, r_end


def _on_tpu():
    """Device-compute gate shared by the batched SW/edit dispatchers.
    False routes to the native C++ host cores -- on the CPU backend, or
    when CIRI_PREFER_HOST_COMPUTE is set (the collapse stage sets it when
    the measured dispatch RTT says per-cluster batches cannot amortise a
    remote tunnel; pipeline/collapse.py::correct_reads)."""
    import os
    if os.environ.get('CIRI_PREFER_HOST_COMPUTE', '') not in \
            ('', '0', 'false'):
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def _ref_no_n(ref):
    """True iff ``ref`` is a HOST array provably free of N codes (4) AND
    the no-N kernel specialisation is enabled (CIRI_SW_NON=1).

    Default OFF: the leaner scoring measured FLAT on hardware (126.4 vs
    126.8 GCUPS -- the wave7 step is not ALU-bound at the margin,
    benchmarks/KERNEL_SOL.md round-4), while per-shape compile-cache
    entries would double (a single N-containing batch forces a fresh
    multi-minute remote compile of the generic variant on tunnel-grade
    links).  The kernels stay exact either way; False is always safe.
    Tracers and device arrays return False (checking them would either
    fail or cost a device fetch)."""
    import os
    if os.environ.get('CIRI_SW_NON', '0') in ('0', 'false', ''):
        return False
    if isinstance(ref, np.ndarray):
        return not (ref == 4).any()
    return False


def sw_score_ends_auto(query, ref, params: SWParams, wave=None, no_n=False):
    """Dispatch: fused Pallas kernel on TPU, XLA scan elsewhere (tests run
    on the virtual CPU mesh where Mosaic is unavailable).  ``wave`` pins
    the Pallas kernel choice; None routes by shape/env at trace time
    (see sw_pallas.wave_route for the trace-cache caveat).  ``no_n`` is
    the caller's host-side proof that ``ref`` has no N codes (static;
    resolve it OUTSIDE any jit via _ref_no_n)."""
    if _on_tpu():
        from ciri_long_tpu.ops.sw_pallas import sw_score_ends_pallas
        return sw_score_ends_pallas(query, ref, params, wave=wave,
                                    no_n=no_n)
    return sw_score_ends(query, ref, params)


class SWResult(NamedTuple):
    """Mirrors the fields of the reference PyAlignRes (ssw_wrap.py:267-379)."""
    score: np.ndarray
    query_begin: np.ndarray
    query_end: np.ndarray
    ref_begin: np.ndarray
    ref_end: np.ndarray


@functools.partial(jax.jit, static_argnames=("params", "wave", "no_n"))
def _sw_align_fused(query, ref, params: SWParams, wave=None, no_n=False):
    """Forward ends + reverse-pass begins in ONE jitted program (one
    dispatch -- on remote-tunnel devices every dispatch costs an RTT).
    ``wave`` and ``no_n`` are resolved by the caller OUTSIDE this jit so
    the CIRI_SW_WAVE override can never hit a stale cached trace (and
    the N-free check runs on host data, not a tracer).  The reverse pass
    inherits ``no_n``: rr is a gathered prefix of ref (pad fill PAD=5),
    so ref N-free implies rr N-free."""
    B, Lq = query.shape
    _, Lr = ref.shape
    score, q_end, r_end = sw_score_ends_auto(query, ref, params, wave=wave,
                                             no_n=no_n)
    rq = _reverse_prefix(query, q_end, Lq)
    rr = _reverse_prefix(ref, r_end, Lr)
    _, q_off, r_off = sw_score_ends_auto(rq, rr, params, wave=wave,
                                         no_n=no_n)
    q_begin = q_end - q_off
    r_begin = r_end - r_off
    none = score <= 0
    return (score, jnp.where(none, -1, q_begin), q_end,
            jnp.where(none, -1, r_begin), r_end)


_ALNCORE = None


def _alncore():
    global _ALNCORE
    if _ALNCORE is None:
        try:
            from ciri_long_tpu import _alncore as core
            _ALNCORE = core
        except ImportError:
            _ALNCORE = False
    return _ALNCORE or None


def _real_lens(arr):
    """Per-row real length of PAD(5)-suffixed code arrays."""
    is_pad = arr == 5
    lens = np.where(is_pad.any(axis=1),
                    np.argmax(is_pad, axis=1), arr.shape[1])
    return lens.astype(np.int32)


@_count_dispatch('sw_align_batch')
def sw_align_batch(query, ref, params: SWParams) -> SWResult:
    """Batched SW with begin *and* end coordinates.

    Forward pass finds score and (q_end, r_end); a second pass on the
    reversed prefixes finds the begins -- the same strategy as the
    reference's reverse-pass (ssw.c:836-849), but batched: all reversals
    happen as one gather on device, and both passes run in one dispatch.

    Inputs are [B, Lq] / [B, Lr] padded arrays (np or jnp).

    On the CPU backend the same math runs through the native C++ core
    (native/alncore.cpp) over the real (unpadded) lengths -- bit-identical
    outputs (tests/test_alncore.py), ~padding-factor faster.
    """
    core = _alncore()
    if core is not None and not _on_tpu():
        assert params.gap_open >= params.gap_extend
        q = np.ascontiguousarray(np.asarray(query, np.int8))
        r = np.ascontiguousarray(np.asarray(ref, np.int8))
        B = q.shape[0]
        out = np.frombuffer(core.sw_align_many(
            q, r, B, q.shape[1], r.shape[1],
            np.ascontiguousarray(_real_lens(q)),
            np.ascontiguousarray(_real_lens(r)),
            params.match, params.mismatch, params.gap_open,
            params.gap_extend), np.int32).reshape(B, 5)
        return SWResult(score=out[:, 0].copy(),
                        query_begin=out[:, 1].copy(),
                        query_end=out[:, 2].copy(),
                        ref_begin=out[:, 3].copy(),
                        ref_end=out[:, 4].copy())

    wave = None
    no_n = False
    if _on_tpu():
        from ciri_long_tpu.ops.sw_pallas import wave_route
        wave = wave_route(np.asarray(query).shape[1],
                          np.asarray(ref).shape[1])
        no_n = _ref_no_n(ref)
    score, q_begin, q_end, r_begin, r_end = _sw_align_fused(
        jnp.asarray(query), jnp.asarray(ref), params, wave=wave, no_n=no_n)
    return SWResult(
        score=np.asarray(score),
        query_begin=np.asarray(q_begin),
        query_end=np.asarray(q_end),
        ref_begin=np.asarray(r_begin),
        ref_end=np.asarray(r_end),
    )


def sw_align_batch_submit(query, ref, params: SWParams):
    """Async half of sw_align_batch: DISPATCH the device program (or run
    the host core eagerly) and return a handle for
    sw_align_batch_collect.  Lets callers with several independent
    batches (e.g. the collapse fuser's per-shape groups) overlap device
    execution and host<->device transfer instead of serialising a fetch
    behind every dispatch."""
    if _alncore() is not None and not _on_tpu():
        return ('host', sw_align_batch(query, ref, params))
    wave = None
    no_n = False
    if _on_tpu():
        from ciri_long_tpu.ops.sw_pallas import wave_route
        wave = wave_route(np.asarray(query).shape[1],
                          np.asarray(ref).shape[1])
        no_n = _ref_no_n(ref)
    out = _sw_align_fused(jnp.asarray(query), jnp.asarray(ref), params,
                          wave=wave, no_n=no_n)
    return ('dev', out)


def sw_align_batch_collect(handle) -> SWResult:
    kind, payload = handle
    if kind == 'host':
        return payload
    score, q_begin, q_end, r_begin, r_end = payload
    return SWResult(score=np.asarray(score),
                    query_begin=np.asarray(q_begin),
                    query_end=np.asarray(q_end),
                    ref_begin=np.asarray(r_begin),
                    ref_end=np.asarray(r_end))


def sw_window_align(query, ref, params: SWParams, chunk=16384):
    """Local alignment of one query against a very long reference window
    (the reference's +-200 kb SSW clip re-alignment, find_bsj.py:196-215).

    TPU-native reformulation: instead of a 400k-step sequential scan, the
    window is tiled into overlapping chunks that become the *batch* axis of
    one kernel call.  The overlap exceeds the maximum reference span a
    positive-scoring local alignment can reach (span < Lq * (1 + match /
    gap_extend)), so the optimum is fully contained in some chunk and the
    result is exact.

    Returns (score, q_begin, q_end, r_begin, r_end) as python ints with
    reference coordinates global to ``ref``; score 0 => (-1 ...) coords.
    """
    query = np.asarray(query)
    ref = np.asarray(ref)
    Lq = len(query)
    Lr = len(ref)
    span_bound = Lq * (1 + params.match // max(1, params.gap_extend)) + 128
    if Lr <= max(chunk, 2 * span_bound):
        res = sw_align_batch(query[None, :], ref[None, :], params)
        return (int(res.score[0]), int(res.query_begin[0]),
                int(res.query_end[0]), int(res.ref_begin[0]),
                int(res.ref_end[0]))

    overlap = span_bound
    chunk = max(chunk, 4 * overlap)
    stride = chunk - overlap
    starts = list(range(0, max(1, Lr - overlap), stride))
    if starts[-1] + chunk < Lr:
        starts.append(Lr - chunk)

    K = len(starts)
    refs = np.full((K, chunk), 5, np.int8)
    for t, s in enumerate(starts):
        piece = ref[s:s + chunk]
        refs[t, :len(piece)] = piece
    queries = np.broadcast_to(query[None, :], (K, Lq))

    no_n = _ref_no_n(refs)
    score, q_end, r_end = map(np.asarray,
                              sw_score_ends_auto(jnp.asarray(queries),
                                                 jnp.asarray(refs), params,
                                                 no_n=no_n))
    if score.max() <= 0:
        return 0, -1, -1, -1, -1
    g_end = np.where(score > 0, np.asarray(starts) + r_end, 1 << 60)
    # pick: max score, then smallest global r_end, then smallest q_end
    order = np.lexsort((q_end, g_end, -score))
    w = order[0]

    # begins via reverse pass restricted to the winning chunk
    sub_r = refs[w, :r_end[w] + 1][::-1].copy()
    sub_q = query[:q_end[w] + 1][::-1].copy()
    s2, q_off, r_off = map(np.asarray,
                           sw_score_ends_auto(jnp.asarray(sub_q[None, :]),
                                              jnp.asarray(sub_r[None, :]),
                                              params,
                                              no_n=_ref_no_n(sub_r)))
    q_begin = int(q_end[w]) - int(q_off[0])
    r_begin = int(r_end[w]) - int(r_off[0])
    return (int(score[w]), q_begin, int(q_end[w]),
            int(starts[w]) + r_begin, int(starts[w]) + int(r_end[w]))


_WINDOW_ROW_BUCKETS = (4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048)


def sw_window_align_many(pairs, params: SWParams, chunk=16384):
    """Batched sw_window_align: EVERY pair's window chunks stack into one
    SW batch (cross-read chaining of the reference's +-200 kb clip
    windows, find_bsj.py:196-215).  A single read's window only yields
    ~25 chunk rows -- too few to fill the device or engage the chained
    wavefront route -- but a whole scan chunk's long-window rows together
    form hundreds, amortising one dispatch over all reads.

    Per-pair results are identical to sw_window_align(query, ref,
    params): rows are independent, PAD(5)-padding cannot change a row's
    outcome, and the per-item winner rule (max score, then smallest
    global r_end, then smallest q_end) is the same.  sw_align_batch
    fuses the forward ends and reverse-pass begins per row, so the
    winner's begins come out of the same single dispatch (the per-item
    code reverse-passes only the winner; same math, same result).

    Returns a list of (score, q_begin, q_end, r_begin, r_end) int
    tuples, reference coordinates global to each pair's ``ref``.
    """
    if not pairs:
        return []
    rows_q, rows_r, row_item, row_gstart = [], [], [], []
    chunked = []  # did this item take the multi-chunk route?
    for item, (query, ref) in enumerate(pairs):
        query = np.asarray(query)
        ref = np.asarray(ref)
        Lq, Lr = len(query), len(ref)
        span_bound = Lq * (1 + params.match // max(1, params.gap_extend)) + 128
        if Lr <= max(chunk, 2 * span_bound):
            starts, csize = [0], Lr
            chunked.append(False)
        else:
            overlap = span_bound
            csize = max(chunk, 4 * overlap)
            stride = csize - overlap
            starts = list(range(0, max(1, Lr - overlap), stride))
            if starts[-1] + csize < Lr:
                starts.append(Lr - csize)
            chunked.append(True)
        for s in starts:
            rows_q.append(query)
            rows_r.append(ref[s:s + csize])
            row_item.append(item)
            row_gstart.append(s)

    n_rows = len(rows_q)
    wq = max(len(x) for x in rows_q)
    wr = max(len(x) for x in rows_r)
    rows = next((b for b in _WINDOW_ROW_BUCKETS if n_rows <= b), n_rows)
    qpad = np.full((rows, wq), 5, np.int8)
    rpad = np.full((rows, wr), 5, np.int8)
    for t in range(n_rows):
        qpad[t, :len(rows_q[t])] = rows_q[t]
        rpad[t, :len(rows_r[t])] = rows_r[t]
    res = sw_align_batch(qpad, rpad, params)
    score = np.asarray(res.score)[:n_rows]
    q_begin = np.asarray(res.query_begin)[:n_rows]
    q_end = np.asarray(res.query_end)[:n_rows]
    r_begin = np.asarray(res.ref_begin)[:n_rows]
    r_end = np.asarray(res.ref_end)[:n_rows]
    gstart = np.asarray(row_gstart, np.int64)
    g_end = np.where(score > 0, gstart + r_end, 1 << 60)

    out = []
    row_item = np.asarray(row_item)
    for item in range(len(pairs)):
        mine = np.flatnonzero(row_item == item)
        order = np.lexsort((q_end[mine], g_end[mine], -score[mine]))
        w = mine[order[0]]
        if chunked[item] and score[w] <= 0:
            out.append((0, -1, -1, -1, -1))
            continue
        out.append((int(score[w]), int(q_begin[w]), int(q_end[w]),
                    int(gstart[w]) + int(r_begin[w]),
                    int(gstart[w]) + int(r_end[w])))
    return out


@functools.partial(jax.jit, static_argnames=("L",))
def _reverse_prefix(x, end, L):
    """x[b, end[b] - t] for t in [0, L); positions past the prefix -> PAD."""
    t = jnp.arange(L)[None, :]
    idx = end[:, None] - t
    valid = idx >= 0
    gathered = jnp.take_along_axis(x, jnp.clip(idx, 0, L - 1), axis=1)
    return jnp.where(valid, gathered, jnp.asarray(5, x.dtype))
