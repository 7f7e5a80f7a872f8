"""Batched global edit distance (Levenshtein) for TPU.

One code path replaces both of the reference's native edit-distance deps
(utils.py:153-159: python-Levenshtein for <=50 bp, edlib Myers bit-parallel
above).  The pipeline's bulk use is the pairwise distance matrix over
homopolymer-compressed cluster sequences (collapse.py:467-473), which here
becomes a single [P, L] x [P, L] batched kernel call instead of P^2/2
per-pair native calls.

Same wavefront layout as ops/sw.py: scan over rows of the first sequence,
vectorize over [B, L2].  The within-row dependency D[i][j-1]+1 is exact via
a prefix-min: D[i][j] = min_k<=j (C[k] + (j-k)) = cummin(C[k] - k) + j,
valid because insertions cost exactly 1 per base.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

BIG = 1 << 28  # plain int: keep module import free of backend init


from ciri_long_tpu.utils.dispatch import count_dispatch as _count_dispatch

@functools.partial(jax.jit, static_argnames=())
def edit_distance_batch_padded(a, b, alen, blen):
    """Edit distance for padded batches, exact for per-element lengths.

    a: [B, La] int codes, alen: [B]; b: [B, Lb], blen: [B].
    Returns [B] int32 distances between a[i, :alen[i]] and b[i, :blen[i]].
    """
    B, La = a.shape
    _, Lb = b.shape
    a = a.astype(jnp.int32)
    b = b.astype(jnp.int32)

    j_idx = jax.lax.broadcasted_iota(jnp.int32, (B, Lb + 1), 1)
    D0 = j_idx
    # result for alen == 0 rows is blen
    bsub = jnp.pad(b, ((0, 0), (1, 0)), constant_values=-1)

    def row_step(carry, xs):
        D_prev, i = carry
        q = xs
        sub_cost = jnp.where(q[:, None] == bsub, 0, 1)
        diag = jnp.pad(D_prev[:, :-1], ((0, 0), (1, 0)), constant_values=int(BIG))
        C = jnp.minimum(diag + sub_cost, D_prev + 1)
        C = C.at[:, 0].set(i + 1)
        m = jax.lax.cummin(C - j_idx, axis=1)
        D = jnp.minimum(C, m + j_idx)
        # freeze rows past this element's length: if i >= alen, keep D_prev
        D = jnp.where((i < alen)[:, None], D, D_prev)
        return (D, i + 1), None

    (D_last, _), _ = jax.lax.scan(row_step, (D0, jnp.int32(0)), jnp.transpose(a))
    return jnp.take_along_axis(D_last, blen[:, None], axis=1)[:, 0]


_BUCKETS = (16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192)


def _bucket(n):
    for b in _BUCKETS:
        if n <= b:
            return b
    return n


@_count_dispatch('edit_distance_batch')
def edit_distance_batch(a, b, alen=None, blen=None):
    """Host-friendly wrapper: numpy in, numpy out.  Batch and length
    dimensions are padded onto a bucket ladder so varying cluster sizes
    reuse a bounded set of compiled shapes.

    On the CPU backend the distances come from the native Myers blockwise
    bit-parallel core (native/alncore.cpp) over the real lengths --
    bit-identical (tests/test_alncore.py) and ~two orders of magnitude
    faster than the XLA-on-CPU scan."""
    a = np.asarray(a)
    b = np.asarray(b)
    B = a.shape[0]
    if alen is None:
        alen = np.full(B, a.shape[1], np.int32)
    if blen is None:
        blen = np.full(B, b.shape[1], np.int32)

    from ciri_long_tpu.ops.sw import _alncore, _on_tpu
    core = _alncore()
    if core is not None and not _on_tpu():
        ac = np.ascontiguousarray(a, np.int8)
        bc = np.ascontiguousarray(b, np.int8)
        return np.frombuffer(core.edit_many(
            ac, bc, B, ac.shape[1], bc.shape[1],
            np.ascontiguousarray(alen, np.int32),
            np.ascontiguousarray(blen, np.int32)), np.int32).copy()

    Bp = _bucket(B)
    La = _bucket(a.shape[1])
    Lb = _bucket(b.shape[1])
    ap = np.full((Bp, La), 5, a.dtype)
    bp = np.full((Bp, Lb), 5, b.dtype)
    ap[:B, :a.shape[1]] = a
    bp[:B, :b.shape[1]] = b
    al = np.zeros(Bp, np.int32)
    bl = np.zeros(Bp, np.int32)
    al[:B] = alen
    bl[:B] = blen
    out = np.asarray(edit_distance_batch_padded(
        jnp.asarray(ap), jnp.asarray(bp),
        jnp.asarray(al, jnp.int32), jnp.asarray(bl, jnp.int32)))
    return out[:B]


def edit_distance(x: str, y: str) -> int:
    """Scalar edit distance between two strings -- reference parity for
    utils.py:153-159 (`distance`).  Host numpy DP; the batched kernel above
    is the production path."""
    if len(x) == 0:
        return len(y)
    if len(y) == 0:
        return len(x)
    xa = np.frombuffer(x.encode(), np.uint8)
    ya = np.frombuffer(y.encode(), np.uint8)
    prev = np.arange(len(ya) + 1, dtype=np.int32)
    for i, cx in enumerate(xa):
        cur = np.empty_like(prev)
        cur[0] = i + 1
        sub = prev[:-1] + (ya != cx)
        dele = prev[1:] + 1
        np.minimum(sub, dele, out=cur[1:])
        # insertions: prefix-min pass
        np.minimum.accumulate(cur - np.arange(len(ya) + 1), out=cur)
        cur += np.arange(len(ya) + 1)
        prev = cur
    return int(prev[-1])
