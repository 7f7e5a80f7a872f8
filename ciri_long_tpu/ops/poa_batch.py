"""Batched device POA: sequence-to-graph alignment on the TPU.

The spoa role (reference collapse.py:267,504) is served by ops/poa.py's
graph POA; its hot inner loop -- one two-piece affine sequence-to-graph
DP per fused sequence -- runs here as a fixed-shape jitted program so a
whole round of independent alignments (one per active cluster job, see
ops/poa.py::poa_consensus_many) is a single device dispatch.

Semantics are bit-identical to native/poacore.cpp (and the numpy twin in
ops/poa.py::_align_to_graph): same two-piece ("convex") gap model with
the within-row prefix-max E resolution, same free-overhang (kOV)
boundaries, and the same traceback tie order -- stored E first, then M
with predecessors tried in caller order before the virtual source, then
F, else stop.  The traceback itself also runs on device: the DP records
2-plane direction codes (case + predecessor index), and a while_loop
walks them, so only the O(V+n) alignment path crosses back to the host
-- never the DP matrices (critical over a remote-dispatch link).

Graph layout per job (rank space, produced by ops/poa.py::_flatten_graph):
  bases[V]      node base codes in topological order
  preds[V, P]   predecessor DP-row indices (rank+1; row 0 = source);
                empty predecessor lists are normalised to [0] (the C++
                core substitutes the source row in that case)
  npred[V]      live predecessor count (>= 1 after normalisation)
Jobs whose in-degree exceeds P fall back to the native core for that
alignment (ops/poa.py handles the dispatch).
"""

import numpy as np

NEG = -(1 << 28)

# traceback case codes
STOP, GAPSEQ, MATCH, GAPGRAPH = 0, 1, 2, 3


from ciri_long_tpu.utils.dispatch import count_dispatch as _count_dispatch

def _align_one(bases, nv, preds, npred, seq, n, scores):
    """Single-job DP + direction planes + device traceback.

    Shapes: bases[Vmax] i32, preds[Vmax, P] i32, npred[Vmax] i32,
    seq[Wmax-1] i32; nv/n scalars.  Returns (score, aln[CAP, 2], acnt)
    with aln pairs (rank|-1, pos|-1) packed at the END of the buffer in
    forward alignment order (host slices aln[CAP-acnt:]).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    m, x, o1, e1, o2, e2 = scores
    Vmax, P = preds.shape
    W = seq.shape[0] + 1
    CAP = Vmax + W

    jj = jnp.arange(W, dtype=jnp.int32)

    # Row 0 = virtual source: seq prefix as one two-piece gap
    # (poacore.cpp:57-62).
    h0 = jnp.maximum(o1 + (jj - 1) * e1, o2 + (jj - 1) * e2).at[0].set(0)
    H = jnp.full((Vmax + 1, W), NEG, jnp.int32).at[0].set(h0)
    F1 = jnp.full((Vmax + 1, W), NEG, jnp.int32)
    F2 = jnp.full((Vmax + 1, W), NEG, jnp.int32)
    case = jnp.zeros((Vmax + 1, W), jnp.int8)
    pidx = jnp.zeros((Vmax + 1, W), jnp.int8)

    kidx = jnp.arange(P, dtype=jnp.int32)

    def row(i, carry):
        H, F1, F2, case, pidx = carry
        b = bases[i - 1]
        np_i = npred[i - 1]
        pr = preds[i - 1]                       # [P] row indices
        kmask = kidx < np_i                     # [P]

        Hp = jnp.where(kmask[:, None], H[pr], NEG)      # [P, W]
        F1g = jnp.where(kmask[:, None], F1[pr], NEG)
        F2g = jnp.where(kmask[:, None], F2[pr], NEG)

        hmax = Hp.max(axis=0)
        F1p = jnp.maximum(F1g.max(axis=0) + e1, hmax + o1)
        F2p = jnp.maximum(F2g.max(axis=0) + e2, hmax + o2)

        # M over preds then source (poacore.cpp:89-98; try-order preserved
        # for the first-tie argmax below).
        Hm_all = jnp.concatenate([Hp, H[0][None]], axis=0)   # [P+1, W]
        hp_prev = Hm_all[:, :-1]                             # [P+1, W-1]
        s = jnp.where(seq == b, m, x).astype(jnp.int32)
        Mrow = jnp.concatenate(
            [jnp.array([NEG], jnp.int32), hp_prev.max(axis=0) + s])
        pidxM = jnp.concatenate(
            [jnp.zeros(1, jnp.int32),
             jnp.argmax(hp_prev, axis=0).astype(jnp.int32)])

        Hpre = jnp.maximum(Mrow, jnp.maximum(F1p, F2p))
        Hpre = Hpre.at[0].max(0)                 # free leading overhang

        # E via the prefix-max affine identity (poacore.cpp:105-119).
        c1 = lax.associative_scan(jnp.maximum, Hpre - jj * e1)
        c2 = lax.associative_scan(jnp.maximum, Hpre - jj * e2)
        E1r = jnp.concatenate(
            [jnp.array([NEG], jnp.int32),
             c1[:-1] + o1 + (jj[1:] - 1) * e1])
        E2r = jnp.concatenate(
            [jnp.array([NEG], jnp.int32),
             c2[:-1] + o2 + (jj[1:] - 1) * e2])

        Hrow = jnp.maximum(Hpre, jnp.maximum(E1r, E2r))

        # Traceback case priority mirrors poacore.cpp:132-183: stored E
        # first, then M, then F per-pred, else stop.
        isE = (Hrow == E1r) | (Hrow == E2r)
        isM = Hrow == Mrow
        valk = jnp.maximum(
            jnp.maximum(F1g + e1, Hp + o1),
            jnp.maximum(F2g + e2, Hp + o2))          # [P, W]
        hitk = valk == Hrow[None, :]
        anyF = hitk.any(axis=0)
        pidxF = jnp.argmax(hitk, axis=0).astype(jnp.int32)
        isF = ((Hrow == F1p) | (Hrow == F2p)) & anyF

        crow = jnp.where(
            isE, GAPSEQ,
            jnp.where(isM, MATCH, jnp.where(isF, GAPGRAPH, STOP)))
        prow = jnp.where(isM & ~isE, pidxM, pidxF)

        live = i <= nv
        H = H.at[i].set(jnp.where(live, Hrow, NEG))
        F1 = F1.at[i].set(jnp.where(live, F1p, NEG))
        F2 = F2.at[i].set(jnp.where(live, F2p, NEG))
        case = case.at[i].set(jnp.where(live, crow, STOP).astype(jnp.int8))
        pidx = pidx.at[i].set(jnp.where(live, prow, 0).astype(jnp.int8))
        return H, F1, F2, case, pidx

    H, F1, F2, case, pidx = lax.fori_loop(
        1, Vmax + 1, row, (H, F1, F2, case, pidx))

    # Free trailing overhang: best H[., n], first max (poacore.cpp:125-130).
    Hcol = lax.dynamic_index_in_dim(H, n, axis=1, keepdims=False)
    end_rank = jnp.argmax(Hcol).astype(jnp.int32)
    score = Hcol[end_rank]

    # Traceback walk over the stored planes.  Pairs are written from the
    # end of the buffer backwards, leaving forward alignment order.
    aln0 = jnp.full((CAP, 2), -2, jnp.int32)

    def tb_cond(st):
        _, j, _, _, _ = st
        return j > 0

    def tb_body(st):
        i, j, t, stopped, aln = st
        c = case[i, j].astype(jnp.int32)
        k = pidx[i, j].astype(jnp.int32)
        flush = stopped | (i == 0)
        c = jnp.where(flush, GAPSEQ, c)

        is_stop = c == STOP
        is_seq = c == GAPSEQ
        is_match = c == MATCH

        np_i = npred[jnp.maximum(i - 1, 0)]
        pred_k = preds[jnp.maximum(i - 1, 0), jnp.minimum(k, preds.shape[1] - 1)]
        # MATCH pred slot np_i == virtual source (row 0)
        pr_match = jnp.where(k < np_i, pred_k, 0)

        pair = jnp.where(
            is_seq,
            jnp.stack([jnp.int32(-1), j - 1]),
            jnp.where(
                is_match,
                jnp.stack([i - 1, j - 1]),
                jnp.stack([i - 1, jnp.int32(-1)])))   # GAPGRAPH
        ni = jnp.where(is_seq, i, jnp.where(is_match, pr_match, pred_k))
        nj = jnp.where(is_match | is_seq, j - 1, j)

        emit = ~is_stop
        aln = lax.cond(
            emit,
            lambda a: lax.dynamic_update_slice(a, pair[None, :],
                                               (CAP - 1 - t, 0)),
            lambda a: a, aln)
        return (jnp.where(is_stop, i, ni),
                jnp.where(is_stop, j, nj),
                t + jnp.where(emit, 1, 0),
                stopped | is_stop,
                aln)

    _, _, acnt, _, aln = lax.while_loop(
        tb_cond, tb_body, (end_rank, n, jnp.int32(0), False, aln0))
    return score, aln, acnt


def _align_one_win(bases, nv, preds, npred, seq, n, scores, L):
    """Bounded-lookback variant of _align_one (round-5 SOL work): every
    live predecessor must satisfy pr == 0 (source) or i - pr <= L
    (host-checked; ops/poa.py routes overflow jobs to the general
    kernel).  The vmapped H/F1/F2 ROW GATHERS -- measured as the general
    kernel's bottleneck (58 M cells/s flat in B, i.e. gather-throughput
    bound, benchmarks/kernel_sol_probe.py) -- become select trees over a
    carried [L, W] ring of the last L rows, and the full [V+1, W]
    H/F1/F2 planes disappear entirely (only case/pidx persist for the
    traceback).  Scores, tie-breaks and the traceback walk are
    bit-identical to _align_one (tests/test_poa_batch.py)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    m, x, o1, e1, o2, e2 = scores
    Vmax, P = preds.shape
    W = seq.shape[0] + 1
    CAP = Vmax + W

    jj = jnp.arange(W, dtype=jnp.int32)

    h0 = jnp.maximum(o1 + (jj - 1) * e1, o2 + (jj - 1) * e2).at[0].set(0)
    case = jnp.zeros((Vmax + 1, W), jnp.int8)
    pidx = jnp.zeros((Vmax + 1, W), jnp.int8)

    # ring rows represent DP rows i-L .. i-1; slot L-1 = row i-1.
    # Row 0 (the virtual source) starts in the last slot.
    Hwin = jnp.full((L, W), NEG, jnp.int32).at[L - 1].set(h0)
    F1win = jnp.full((L, W), NEG, jnp.int32)
    F2win = jnp.full((L, W), NEG, jnp.int32)

    kidx = jnp.arange(P, dtype=jnp.int32)

    # running free-trailing-overhang best over column n (first max wins,
    # matching the general kernel's argmax over H[:, n])
    best0 = h0[n]

    def row(i, carry):
        Hwin, F1win, F2win, case, pidx, best, argbest = carry
        b = bases[i - 1]
        np_i = npred[i - 1]
        pr = preds[i - 1]                       # [P] row indices
        kmask = kidx < np_i                     # [P]

        delta = i - pr                          # 1..L for non-source preds
        widx = L - delta                        # ring slot, 0..L-1
        is_src = pr == 0

        def win_sel(win):
            # [P, W] select of ring rows by slot index (depth-L where
            # chain; L is small and static).  Rows with is_src or out of
            # range never reach a real slot read: the caller overrides.
            out = jnp.full((P, W), NEG, jnp.int32)
            for t in range(L):
                out = jnp.where((widx == t)[:, None], win[t][None], out)
            return out

        Hp = jnp.where(is_src[:, None], h0[None], win_sel(Hwin))
        Hp = jnp.where(kmask[:, None], Hp, NEG)
        F1g = jnp.where(is_src[:, None], NEG, win_sel(F1win))
        F1g = jnp.where(kmask[:, None], F1g, NEG)
        F2g = jnp.where(is_src[:, None], NEG, win_sel(F2win))
        F2g = jnp.where(kmask[:, None], F2g, NEG)

        hmax = Hp.max(axis=0)
        F1p = jnp.maximum(F1g.max(axis=0) + e1, hmax + o1)
        F2p = jnp.maximum(F2g.max(axis=0) + e2, hmax + o2)

        Hm_all = jnp.concatenate([Hp, h0[None]], axis=0)     # [P+1, W]
        hp_prev = Hm_all[:, :-1]                             # [P+1, W-1]
        s = jnp.where(seq == b, m, x).astype(jnp.int32)
        Mrow = jnp.concatenate(
            [jnp.array([NEG], jnp.int32), hp_prev.max(axis=0) + s])
        pidxM = jnp.concatenate(
            [jnp.zeros(1, jnp.int32),
             jnp.argmax(hp_prev, axis=0).astype(jnp.int32)])

        Hpre = jnp.maximum(Mrow, jnp.maximum(F1p, F2p))
        Hpre = Hpre.at[0].max(0)

        c1 = lax.associative_scan(jnp.maximum, Hpre - jj * e1)
        c2 = lax.associative_scan(jnp.maximum, Hpre - jj * e2)
        E1r = jnp.concatenate(
            [jnp.array([NEG], jnp.int32),
             c1[:-1] + o1 + (jj[1:] - 1) * e1])
        E2r = jnp.concatenate(
            [jnp.array([NEG], jnp.int32),
             c2[:-1] + o2 + (jj[1:] - 1) * e2])

        Hrow = jnp.maximum(Hpre, jnp.maximum(E1r, E2r))

        isE = (Hrow == E1r) | (Hrow == E2r)
        isM = Hrow == Mrow
        valk = jnp.maximum(
            jnp.maximum(F1g + e1, Hp + o1),
            jnp.maximum(F2g + e2, Hp + o2))          # [P, W]
        hitk = valk == Hrow[None, :]
        anyF = hitk.any(axis=0)
        pidxF = jnp.argmax(hitk, axis=0).astype(jnp.int32)
        isF = ((Hrow == F1p) | (Hrow == F2p)) & anyF

        crow = jnp.where(
            isE, GAPSEQ,
            jnp.where(isM, MATCH, jnp.where(isF, GAPGRAPH, STOP)))
        prow = jnp.where(isM & ~isE, pidxM, pidxF)

        live = i <= nv
        Hlive = jnp.where(live, Hrow, NEG)
        case = case.at[i].set(jnp.where(live, crow, STOP).astype(jnp.int8))
        pidx = pidx.at[i].set(jnp.where(live, prow, 0).astype(jnp.int8))

        hn = Hlive[n]
        better = hn > best
        best = jnp.where(better, hn, best)
        argbest = jnp.where(better, i, argbest)

        Hwin = jnp.concatenate([Hwin[1:], Hlive[None]], axis=0)
        F1win = jnp.concatenate(
            [F1win[1:], jnp.where(live, F1p, NEG)[None]], axis=0)
        F2win = jnp.concatenate(
            [F2win[1:], jnp.where(live, F2p, NEG)[None]], axis=0)
        return Hwin, F1win, F2win, case, pidx, best, argbest

    _, _, _, case, pidx, score, end_rank = lax.fori_loop(
        1, Vmax + 1, row,
        (Hwin, F1win, F2win, case, pidx, best0, jnp.int32(0)))

    aln0 = jnp.full((CAP, 2), -2, jnp.int32)

    def tb_cond(st):
        _, j, _, _, _ = st
        return j > 0

    def tb_body(st):
        i, j, t, stopped, aln = st
        c = case[i, j].astype(jnp.int32)
        k = pidx[i, j].astype(jnp.int32)
        flush = stopped | (i == 0)
        c = jnp.where(flush, GAPSEQ, c)

        is_stop = c == STOP
        is_seq = c == GAPSEQ
        is_match = c == MATCH

        np_i = npred[jnp.maximum(i - 1, 0)]
        pred_k = preds[jnp.maximum(i - 1, 0),
                       jnp.minimum(k, preds.shape[1] - 1)]
        pr_match = jnp.where(k < np_i, pred_k, 0)

        pair = jnp.where(
            is_seq,
            jnp.stack([jnp.int32(-1), j - 1]),
            jnp.where(
                is_match,
                jnp.stack([i - 1, j - 1]),
                jnp.stack([i - 1, jnp.int32(-1)])))   # GAPGRAPH
        ni = jnp.where(is_seq, i, jnp.where(is_match, pr_match, pred_k))
        nj = jnp.where(is_match | is_seq, j - 1, j)

        emit = ~is_stop
        aln = lax.cond(
            emit,
            lambda a: lax.dynamic_update_slice(a, pair[None, :],
                                               (CAP - 1 - t, 0)),
            lambda a: a, aln)
        return (jnp.where(is_stop, i, ni),
                jnp.where(is_stop, j, nj),
                t + jnp.where(emit, 1, 0),
                stopped | is_stop,
                aln)

    _, _, acnt, _, aln = lax.while_loop(
        tb_cond, tb_body, (end_rank, n, jnp.int32(0), False, aln0))
    return score, aln, acnt


def _build_batch_fn(scores, lookback=None):
    import jax

    if lookback is None:
        def one(b, v, p, q, s, n):
            return _align_one(b, v, p, q, s, n, scores)
    else:
        def one(b, v, p, q, s, n):
            return _align_one_win(b, v, p, q, s, n, scores, lookback)

    def fn(bases, nv, preds, npred, seqs, ns):
        return jax.vmap(one)(bases, nv, preds, npred, seqs, ns)

    return jax.jit(fn)


_FN_CACHE = {}


@_count_dispatch('poa_align_batch')
def poa_align_batch(bases, nv, preds, npred, seqs, ns, scores,
                    lookback=None):
    """Batched graph alignments, one device dispatch.

    bases[B, Vmax] i32, nv[B] i32, preds[B, Vmax, P] i32,
    npred[B, Vmax] i32, seqs[B, Wmax-1] i32, ns[B] i32;
    scores = (m, x, o1, e1, o2, e2) Python ints (static).

    ``lookback`` (static int) selects the bounded-lookback kernel: every
    job must satisfy pr == 0 or i - pr <= lookback for all live preds
    (callers check via max_lookback); it replaces the row gathers with
    ring-buffer selects and drops the full H/F1/F2 planes -- the
    measured 30x SOL win (benchmarks/KERNEL_SOL.md round 5).

    Returns host numpy (score[B], aln[B, CAP, 2], acnt[B]).
    """
    key = (bases.shape, preds.shape, seqs.shape, tuple(scores), lookback)
    fn = _FN_CACHE.get(key)
    if fn is None:
        fn = _build_batch_fn(tuple(int(v) for v in scores),
                             lookback=lookback)
        _FN_CACHE[key] = fn
    score, aln, acnt = fn(bases, nv, preds, npred, seqs, ns)
    return (np.asarray(score), np.asarray(aln), np.asarray(acnt))


def max_lookback(preds, npred):
    """Largest i - pr over live non-source predecessors of ONE flattened
    graph (preds[V, P] rank+1 indices, npred[V]); 0 for pure-source
    graphs.  Host-side gate for poa_align_batch(lookback=...)."""
    V, P = preds.shape
    if V == 0:
        return 0
    rows = np.arange(1, V + 1, dtype=np.int64)[:, None]
    live = (np.arange(P)[None, :] < npred[:, None]) & (preds > 0)
    delta = np.where(live, rows - preds, 0)
    return int(delta.max(initial=0))
