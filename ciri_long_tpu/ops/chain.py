"""Batched colinear chaining on device.

The device-side counterpart of native/chaincore.cpp: the windowed chaining
DP over sorted anchors, vectorised over a batch of reads (one row per
read, anchors padded to a fixed count).  This is the building block for
the fully batched `call` pipeline (ROADMAP item 2/3): minimizer lookups
produce [B, A] anchor tables, this kernel chains them all in one program,
and only the per-read backtrack stays on host.

Scoring matches models/aligner.py::_chain_dp exactly (same constants, same
anti-spiral penalty); float32 on device vs float64 on host can flip exact
ties, which the backtrack treats as equivalent chains.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

NEG_F = -1e30


from ciri_long_tpu.utils.dispatch import count_dispatch as _count_dispatch

def _chain_dp(r, q, ctg, valid, k: int, window: int,
              max_gap_r: int, max_gap_q: int):
    """Traceable DP body shared by chain_scores_batch/_compact."""
    B, A = r.shape
    W = window
    # int32 positions: pass CONTIG-LOCAL coordinates (+ ctg ids) -- global
    # human-genome coordinates overflow int32 and x64 is off on device
    r = r.astype(jnp.int32)
    q = q.astype(jnp.int32)
    ctg = ctg.astype(jnp.int32)

    def step(carry, xs):
        rw, qw, cw, fw, iw, ok_w = carry
        ri, qi, ci, vi, idx = xs
        dr = ri[:, None] - rw
        dq = qi[:, None] - qw
        okay = ok_w & (dr > 0) & (dq > 0) & (dq <= max_gap_q) & \
            (dr <= max_gap_r) & (cw == ci[:, None])
        alpha = jnp.minimum(jnp.minimum(dq, dr), k).astype(jnp.float32)
        g = jnp.abs(dr - dq).astype(jnp.float32)
        skip = 0.1 * jnp.maximum(0.0, dq.astype(jnp.float32) - 2.0 * k)
        pen = jnp.where(dr >= dq,
                        jnp.log2(g + 1.0) + skip,
                        0.5 * g + 0.5 * jnp.log2(g + 1.0) + skip)
        cand = jnp.where(okay, fw + alpha - pen, NEG_F)
        best = jnp.max(cand, axis=1)
        slot = jnp.argmax(cand, axis=1)
        take = best > float(k)
        fi = jnp.where(take, best, float(k)).astype(jnp.float32)
        pre_i = jnp.where(take, jnp.take_along_axis(iw, slot[:, None],
                                                    axis=1)[:, 0], -1)
        pre_i = jnp.where(vi, pre_i, -1).astype(jnp.int32)
        fi = jnp.where(vi, fi, float(k))

        # rotate the window and append this anchor
        rw = jnp.concatenate([rw[:, 1:], ri[:, None]], axis=1)
        qw = jnp.concatenate([qw[:, 1:], qi[:, None]], axis=1)
        cw = jnp.concatenate([cw[:, 1:], ci[:, None]], axis=1)
        fw = jnp.concatenate([fw[:, 1:], fi[:, None]], axis=1)
        iw = jnp.concatenate([iw[:, 1:], jnp.full((B, 1), idx, jnp.int32)],
                             axis=1)
        ok_w = jnp.concatenate([ok_w[:, 1:], vi[:, None]], axis=1)
        return (rw, qw, cw, fw, iw, ok_w), (fi, pre_i)

    init = (jnp.zeros((B, W), jnp.int32),
            jnp.zeros((B, W), jnp.int32),
            jnp.full((B, W), -1, jnp.int32),
            jnp.full((B, W), NEG_F, jnp.float32),
            jnp.full((B, W), -1, jnp.int32),
            jnp.zeros((B, W), bool))
    xs = (jnp.transpose(r), jnp.transpose(q), jnp.transpose(ctg),
          jnp.transpose(valid), jnp.arange(A, dtype=jnp.int32))
    _, (f, pre) = jax.lax.scan(step, init, xs)
    return jnp.transpose(f), jnp.transpose(pre)


@_count_dispatch('chain_scores_batch')
@functools.partial(jax.jit, static_argnames=("k", "window", "max_gap_r",
                                             "max_gap_q"))
def chain_scores_batch(r, q, ctg, valid, k: int, window: int = 64,
                       max_gap_r: int = 200_000, max_gap_q: int = 5_000):
    """Chaining DP over [B, A] anchor tables.

    Args:
      r, q: int32 [B, A] anchor positions sorted by (r, q) per row
            (contig-local coordinates; int32 only).
      ctg:  int32 [B, A] contig ids (chains may not cross contigs).
      valid: bool [B, A] anchor mask (padding rows False).
      k: minimizer length (chain score unit).

    Returns (f [B, A] float32, pre [B, A] int32) with pre = -1 for chain
    starts; invalid anchors keep f = k, pre = -1.
    """
    return _chain_dp(r, q, ctg, valid, k, window, max_gap_r, max_gap_q)


@_count_dispatch('chain_scores_compact')
@functools.partial(jax.jit, static_argnames=("k", "window", "max_gap_r",
                                              "max_gap_q", "topk"))
def chain_scores_compact(r, q, ctg, valid, min_score, k: int,
                         window: int = 64, max_gap_r: int = 200_000,
                         max_gap_q: int = 5_000, topk: int = 256):
    """chain_scores_batch + on-device compaction of the backtrack inputs.

    Over the remote-tunnel TPU the [B, A] f/pre fetch dominates map_batch
    (1-16 MB/s tunnel; 34 MB at [512, 8192]).  The greedy backtrack only
    ever *starts* chains at valid anchors with f >= min_score, and every
    predecessor link is within `window` anchors, so it needs:

      kv, ki:  top-`topk` chain scores + anchor indices per read (f32/i32,
               XLA top_k ties break to the lower index = np.argsort(-f,
               kind='stable') order)
      delta:   pre encoded as int8 window offsets (0 = chain start) --
               4 bytes/anchor -> 1
      count:   #(valid & f >= min_score) per read; a row falls back to its
               full f row only when count > topk AND the prefix greedy did
               not already reach max_chains (see backtrack_chains_compact)
               -- and fallback rows are fetched in one batched gather

    Returns (kv, ki, delta, count, f); f stays on device unless a
    fallback row materialises it.
    """
    f, pre = _chain_dp(r, q, ctg, valid, k, window, max_gap_r, max_gap_q)
    A = f.shape[1]
    idx = jnp.arange(A, dtype=jnp.int32)[None, :]
    delta = jnp.where(pre < 0, 0, idx - pre).astype(jnp.int8)
    f_m = jnp.where(valid, f, NEG_F)
    kv, ki = jax.lax.top_k(f_m, min(topk, A))
    count = jnp.sum((f_m >= min_score), axis=1, dtype=jnp.int32)
    # return the MASKED scores: the fallback path sorts this row directly,
    # and invalid/padding anchors must never rank as candidates
    return kv, ki, delta, count, f_m


def _greedy_chains(order, scores, delta_b, used, min_score, min_anchors,
                   max_chains):
    """One row's greedy walk over candidates in descending-f order."""
    chains = []
    for oi in range(len(order)):
        idx = int(order[oi])
        if used[idx] or scores[oi] < min_score:
            continue
        path = []
        v = idx
        while v != -1 and not used[v]:
            path.append(v)
            used[v] = True
            d = int(delta_b[v])
            v = v - d if d > 0 else -1
        if len(path) < min_anchors:
            continue
        path.reverse()
        chains.append((np.array(path, np.int64), float(scores[oi])))
        if len(chains) >= max_chains:
            break
    return chains


@_count_dispatch('chain.fallback_gather')
def _fetch_fallback_rows(f_dev, rows):
    """One batched gather+fetch for every fallback row of a group."""
    return np.asarray(f_dev[rows])


def backtrack_chains_compact(kv, ki, delta, count, f_dev, min_score,
                             min_anchors, max_chains=10):
    """Greedy chain extraction from the compact device outputs; identical
    results to backtrack_chains on (f, pre) -- see chain_scores_compact.

    The top-k prefix is a prefix of the full descending-f candidate order
    (XLA top_k and np.argsort(-f, kind='stable') share the lower-index
    tie-break), so a row is EXACT from the prefix alone when either
      - all its candidates fit in the prefix (count <= topk), or
      - the greedy walk reached max_chains within the prefix (the full
        walk would have stopped at the same point).
    Only rows failing both need the full f row; those are fetched in ONE
    batched device gather -- per-row np.asarray fetches each pay a full
    remote-tunnel RTT and dominated scan wall time before this."""
    kv = np.asarray(kv)
    ki = np.asarray(ki)
    delta = np.asarray(delta)
    count = np.asarray(count)
    B, K = kv.shape
    A = delta.shape[1]
    out = [[] for _ in range(B)]
    need_full = []
    for b in range(B):
        n = int(count[b])
        if n == 0:
            continue
        m = min(n, K)
        used = np.zeros(A, bool)
        chains = _greedy_chains(ki[b, :m], kv[b, :m], delta[b], used,
                                min_score, min_anchors, max_chains)
        if n > K and len(chains) < max_chains:
            # candidates remain below the prefix: redo from the full row
            need_full.append(b)
        else:
            out[b] = chains
    if need_full:
        f_rows = _fetch_fallback_rows(f_dev, np.asarray(need_full, np.int32))
        for fb, b in zip(f_rows, need_full):
            order = np.argsort(-fb, kind='stable')
            out[b] = _greedy_chains(order, fb[order], delta[b],
                                    np.zeros(A, bool), min_score,
                                    min_anchors, max_chains)
    return out


@_count_dispatch('chain_extract_batch')
@functools.partial(jax.jit, static_argnames=("k", "window", "max_gap_r",
                                             "max_gap_q", "max_chains",
                                             "min_anchors"))
def chain_extract_batch(r, q, ctg, valid, min_score, k: int,
                        window: int = 64, max_gap_r: int = 200_000,
                        max_gap_q: int = 5_000, max_chains: int = 10,
                        min_anchors: int = 3):
    """Chaining DP + the ENTIRE greedy chain extraction on device.

    The host greedy (backtrack_chains) walks candidates in descending-f
    order, marking anchors used, keeping paths of >= min_anchors, until
    max_chains chains are found.  Run on device this needs NO per-anchor
    score/predecessor fetch at all -- the only outputs are

      chainid [B, A] int8:  which chain (0..max_chains-1) each anchor
                            belongs to, -1 for none.  A chain's anchor
                            path is its ids in ascending index order
                            (predecessors strictly precede successors).
      scores  [B, max_chains] float32, nch [B] int8

    so the tunnel fetch is ~1 byte/anchor with no topk overflow fallback,
    vs 4-8 bytes/anchor for (f, pre) and per-row RTT-bound fallback
    fetches for candidate-rich reads (the previous compact path).

    Per row the extraction is a 3-mode state machine (pick candidate /
    count-walk a path / mark-walk it), one element-step per while_loop
    iteration, vmapped across rows; semantics match backtrack_chains
    exactly (same stable descending-f candidate order, same used-mask
    truncation, rejected-short paths still consume their anchors)."""
    assert max_chains <= 14, "4-bit chain-id packing bounds max_chains"
    f, pre = _chain_dp(r, q, ctg, valid, k, window, max_gap_r, max_gap_q)
    B, A = f.shape
    f_m = jnp.where(valid, f, NEG_F)
    order = jnp.argsort(-f_m, axis=1, stable=True).astype(jnp.int32)

    def row(f_row, pre_row, order_row):
        # state: oi candidate cursor, mode 0/1/2, v walk cursor, plen
        # counted path length, steps mark-walk progress, nch chains found,
        # used/cid per-anchor, scores per-chain, alive
        def cond(s):
            return s[-1]

        def body(s):
            oi, mode, v, plen, steps, nch, used, cid, scores, alive = s
            m0 = mode == 0
            m1 = mode == 1
            m2 = mode == 2

            idx = order_row[jnp.clip(oi, 0, A - 1)]
            f_idx = f_row[idx]
            exhausted = m0 & ((oi >= A) | (f_idx < min_score) |
                              (nch >= max_chains))
            skip = m0 & ~exhausted & used[idx]
            start = m0 & ~exhausted & ~used[idx]

            vc = jnp.clip(v, 0, A - 1)
            walk_ok = m1 & (v >= 0) & ~used[vc]
            end_count = m1 & ~walk_ok
            accept = plen >= min_anchors

            mark = m2 & (steps < plen)
            end_mark = m2 & (steps >= plen)

            pv = jnp.where(pre_row[vc] >= 0, pre_row[vc], -1)

            used = jnp.where(mark, used.at[vc].set(True), used)
            cid = jnp.where(mark & accept,
                            cid.at[vc].set(nch.astype(jnp.int32)), cid)
            scores = jnp.where(end_mark & accept,
                               scores.at[jnp.clip(nch, 0, max_chains - 1)]
                               .set(f_idx), scores)

            n_oi = jnp.where(skip | end_mark, oi + 1, oi)
            n_mode = jnp.where(start, 1,
                               jnp.where(end_count, 2,
                                         jnp.where(end_mark, 0, mode)))
            n_v = jnp.where(start, idx,
                            jnp.where(walk_ok | mark, pv,
                                      jnp.where(end_count, idx, v)))
            n_plen = jnp.where(start, 0,
                               jnp.where(walk_ok, plen + 1, plen))
            n_steps = jnp.where(end_count, 0,
                                jnp.where(mark, steps + 1, steps))
            n_nch = jnp.where(end_mark & accept, nch + 1, nch)
            n_alive = alive & ~exhausted
            return (n_oi, n_mode, n_v, n_plen, n_steps, n_nch, used, cid,
                    scores, n_alive)

        init = (jnp.int32(0), jnp.int32(0), jnp.int32(-1), jnp.int32(0),
                jnp.int32(0), jnp.int32(0), jnp.zeros((A,), bool),
                jnp.full((A,), -1, jnp.int32),
                jnp.zeros((max_chains,), jnp.float32), jnp.bool_(True))
        out = jax.lax.while_loop(cond, body, init)
        return out[7].astype(jnp.int8), out[8], out[5].astype(jnp.int8)

    cid, scores, nch = jax.vmap(row)(f_m, pre, order)
    # pack (cid+1) as 4-bit pairs: halves the dominant fetch (requires
    # max_chains <= 14; A is even by bucketing)
    c4 = (cid.astype(jnp.int32) + 1).astype(jnp.uint8)
    packed = (c4[:, 0::2] | (c4[:, 1::2] << 4)).astype(jnp.uint8)
    return packed, scores, nch


def decode_chains(packed, scores, nch):
    """Host decode of chain_extract_batch outputs into the
    backtrack_chains return shape: per row a list of
    (ascending anchor-index array, float score).  ``packed`` holds two
    4-bit (chain id + 1) values per byte."""
    packed = np.asarray(packed)
    scores = np.asarray(scores)
    nch = np.asarray(nch)
    B, A2 = packed.shape
    cid = np.empty((B, 2 * A2), np.int16)
    cid[:, 0::2] = (packed & 0xF).astype(np.int16)
    cid[:, 1::2] = (packed >> 4).astype(np.int16)
    cid -= 1
    out = []
    for b in range(B):
        chains = []
        for c in range(int(nch[b])):
            idx = np.nonzero(cid[b] == c)[0]
            chains.append((idx.astype(np.int64), float(scores[b, c])))
        out.append(chains)
    return out


@_count_dispatch('chain.backtrack_fetch')
def backtrack_chains(f, pre, valid, min_score, min_anchors, max_chains=10):
    """Greedy per-read chain extraction from (f, pre) -- host side,
    identical to models/aligner.py::_chain's backtrack.  Native C++ core
    when built (native/chaincore.cpp::backtrack, parity fuzz in
    tests/test_chaincore.py); numpy fallback below."""
    f = np.asarray(f)
    pre = np.asarray(pre)
    valid = np.asarray(valid)
    try:
        from ciri_long_tpu import _chaincore
        native = getattr(_chaincore, 'backtrack', None)
    except ImportError:
        native = None
    if native is not None:
        out = []
        for b in range(f.shape[0]):
            rows = native(
                np.ascontiguousarray(f[b], np.float64),
                np.ascontiguousarray(pre[b], np.int64),
                np.ascontiguousarray(valid[b], np.uint8),
                float(min_score), int(min_anchors), int(max_chains))
            out.append([(np.frombuffer(p, np.int64).copy(), s)
                        for p, s in rows])
        return out
    out = []
    for b in range(f.shape[0]):
        order = np.argsort(-f[b], kind='stable')
        used = np.zeros(f.shape[1], bool)
        chains = []
        for idx in order:
            if not valid[b, idx] or used[idx] or f[b, idx] < min_score:
                continue
            path = []
            v = idx
            while v != -1 and not used[v]:
                path.append(v)
                used[v] = True
                v = pre[b, v]
            if len(path) < min_anchors:
                continue
            path.reverse()
            chains.append((np.array(path, np.int64), float(f[b, idx])))
            if len(chains) >= max_chains:
                break
        out.append(chains)
    return out
