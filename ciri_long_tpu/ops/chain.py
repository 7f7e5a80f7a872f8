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

@functools.partial(jax.jit, static_argnames=("k", "window", "max_gap_r",
                                             "max_gap_q"))
@_count_dispatch('chain_scores_batch')
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


def backtrack_chains(f, pre, valid, min_score, min_anchors, max_chains=10):
    """Greedy per-read chain extraction from (f, pre) -- host side,
    identical to models/aligner.py::_chain's backtrack."""
    f = np.asarray(f)
    pre = np.asarray(pre)
    valid = np.asarray(valid)
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
