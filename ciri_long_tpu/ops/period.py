"""Device-side tandem-period lag profile.

The batched analog of ops/ccs.py's k-mer lag voting (stage 1 of the pyccs
replacement): for a padded batch of reads, compute for every lag d the
fraction of positions whose bases match under a shift of d.  A rolling-
circle read shows a comb of peaks at multiples of its unit length; random
reads stay near 0.25.  The lag axis is embarrassingly parallel and is what
the 'lag' mesh axis shards (parallel/mesh.py).

This is a screening profile: reads flagged periodic here proceed to the
exact host-side segmentation + POA polish.  PAD positions are excluded
from both numerator and denominator.
"""

import functools

import jax
import jax.numpy as jnp


from ciri_long_tpu.utils.dispatch import count_dispatch as _count_dispatch

# lags per static-slice chunk: each chunk takes ONE dynamic slice of
# length L + LAG_CHUNK - 1 and reads its lags at STATIC offsets inside it.
# A vmapped dynamic_slice over the lag axis (the previous formulation)
# lowers to a per-lag gather -- measured ~10 s/batch on v5e for the 4096
# bucket vs ~0.1 s for the static-slice form (200.5 s -> 2.9 s for the
# whole 6250-read screen, /tmp phase probe 2026-08-19).
LAG_CHUNK = 128


def _chunked_lag_sum(mat, valid, L, max_lag, lag_offset, pad_width, reduce):
    """Shared lag loop: for every lag d in 1..max_lag (plus lag_offset)
    compute reduce(mat, mat shifted by d, valid, valid shifted) summed over
    the position axis.  Returns [B, max_lag] int32/float32 stacked lags."""
    B = mat.shape[0]
    n_chunks = -(-max_lag // LAG_CHUNK)
    mpad = jnp.pad(mat, ((0, 0), (0, pad_width)))
    vpad = jnp.pad(valid, ((0, 0), (0, pad_width)))
    out = jnp.zeros((B, n_chunks * LAG_CHUNK), jnp.int32)

    def chunk(c, out):
        base = 1 + lag_offset + c * LAG_CHUNK
        span = L + LAG_CHUNK - 1
        ms = jax.lax.dynamic_slice_in_dim(mpad, base, span, axis=1)
        vs = jax.lax.dynamic_slice_in_dim(vpad, base, span, axis=1)
        cols = [reduce(ms[:, t:t + L], vs[:, t:t + L])
                for t in range(LAG_CHUNK)]
        return jax.lax.dynamic_update_slice(
            out, jnp.stack(cols, axis=1), (0, c * LAG_CHUNK))

    return jax.lax.fori_loop(0, n_chunks, chunk, out)[:, :max_lag]


@functools.partial(jax.jit, static_argnames=("max_lag", "pad_lags"))
def lag_profile(reads, max_lag: int, lag_offset=0, pad_lags=None):
    """reads: [B, L] int8 codes (PAD=5).  Returns [B, max_lag] float32
    match fractions for lags lag_offset+1 .. lag_offset+max_lag.

    ``lag_offset`` may be traced (it is a mesh-axis index under shard_map);
    ``pad_lags`` is the static upper bound on lag_offset + max_lag (defaults
    to max_lag for the unsharded case)."""
    B, L = reads.shape
    x = reads.astype(jnp.int32)
    valid = x < 4
    if pad_lags is None:
        pad_lags = max_lag

    def eq_count(ms, vs):
        return jnp.sum((x == ms) & valid & vs, axis=1, dtype=jnp.int32)

    def ok_count(ms, vs):
        return jnp.sum(valid & vs, axis=1, dtype=jnp.int32)

    pad_width = pad_lags + LAG_CHUNK + 1
    num = _chunked_lag_sum(x, valid, L, max_lag, lag_offset, pad_width,
                           eq_count)
    den = _chunked_lag_sum(x, valid, L, max_lag, lag_offset, pad_width,
                           ok_count)
    return num / jnp.maximum(den, 1).astype(jnp.float32)


@_count_dispatch('tandem_counts')
@functools.partial(jax.jit, static_argnames=("max_lag", "k", "pad_lags"))
def tandem_counts(reads, max_lag: int, k: int = 11, lag_offset=0,
                  pad_lags=None):
    return _tandem_counts_impl(reads, max_lag, k, lag_offset, pad_lags)


def _tandem_counts_impl(reads, max_lag: int, k: int = 11, lag_offset=0,
                        pad_lags=None):
    """Exact k-mer self-match counts per lag: out[b, j] = number of
    positions i in read b whose k-mer equals the k-mer at i + (lag_offset +
    j + 1).  This is the device mirror of the host lag voting in
    ops/ccs.py (_kmer_codes + _lag_votes): every consecutive same-k-mer
    occurrence pair the host counts at distance d is one of these
    positions, so per-lag ``tandem_counts >= host votes`` always -- the
    basis of the sound CCS pre-screen (screen_periodic).

    Positions whose k-mer window touches a non-ACGT base (either copy) do
    not count.  ``lag_offset``/``pad_lags`` follow lag_profile's sharding
    contract (the 'lag' mesh axis, parallel/mesh.py)."""
    B, L = reads.shape
    x = reads.astype(jnp.int32)
    valid = x < 4
    if pad_lags is None:
        pad_lags = max_lag
    if L < k:
        return jnp.zeros((B, max_lag), jnp.int32)

    # exact base-4 k-mer ids (k <= 15 fits int32: 2k bits) -- one [B, L]
    # table computed once, so the per-lag work is a shift + equality + sum
    # instead of a 2x cumsum windowing.  vmap over all lags used to
    # materialise [max_lag, B, L] int32 temps (8.6 GB at the 4096 bucket,
    # an HBM OOM); k-mer ids + lax.map lag chunks bound temps to
    # [chunk, B, L] bool.
    kid = jnp.zeros((B, L), jnp.int32)
    vk = jnp.ones((B, L), bool)
    for j in range(k):
        shifted = jnp.pad(x, ((0, 0), (0, k)),
                          constant_values=5)[:, j:j + L]
        kid = kid * 4 + jnp.where(shifted < 4, shifted, 0)
        vk = vk & (shifted < 4)
    # windows that would run off the read end are invalid
    vk = vk & (jnp.arange(L)[None, :] <= L - k)

    def eq_count(ks, vs):
        return jnp.sum((kid == ks) & vk & vs, axis=1, dtype=jnp.int32)

    return _chunked_lag_sum(kid, vk, L, max_lag, lag_offset,
                            pad_lags + LAG_CHUNK + 1, eq_count)


@_count_dispatch('screen_keep')
@functools.partial(jax.jit,
                   static_argnames=("max_lag", "k", "min_period",
                                    "min_units"))
def screen_keep(reads, lengths, max_lag: int, k: int = 11,
                min_period: int = 30, min_units: float = 2.0):
    """Fused device screen: tandem_counts + the support election of
    screen_periodic in ONE program, returning only keep[B] bool -- the
    full [B, max_lag] lag map never crosses the (slow, remote) device->
    host link.

    The support bar uses exact integer arithmetic (20*sup >= L for the
    0.05*L term), which is infinitesimally MORE permissive than the
    host's float bar at representation boundaries -- keep is a superset,
    so the screen stays sound (over-approximating; see screen_periodic).
    Callers must pre-handle L < 2*min_period and L/min_units > max_lag
    (pipeline/find_ccs.py::device_screen does)."""
    import numpy as np

    counts = _tandem_counts_impl(reads, max_lag, k)      # [B, max_lag]
    # support windows are static in max_lag: sup[l] = sum counts over lags
    # in [0.94*l - 4, 1.06*l + 4] (host windows, screen_periodic)
    lags = np.arange(1, max_lag + 1)
    lo = np.clip(np.ceil(0.94 * lags - 4).astype(np.int64), 1, max_lag + 1)
    hi = np.clip(np.floor(1.06 * lags + 4).astype(np.int64), 0, max_lag)
    cs = jnp.cumsum(counts, axis=1)
    cs_ext = jnp.pad(cs, ((0, 0), (1, 0)))               # cs_ext[0] = 0
    sup = cs_ext[:, hi] - cs_ext[:, lo - 1]              # [B, max_lag]

    L = lengths.astype(jnp.int32)[:, None]
    lag_row = jnp.asarray(lags, jnp.int32)[None, :]
    valid = (lag_row >= min_period) & \
        (lag_row.astype(jnp.float32) * min_units <= L.astype(jnp.float32))
    ok = (sup >= 8) & (20 * sup >= L)
    return jnp.any(valid & ok, axis=1)


def screen_periodic(counts, lengths, min_period=30, min_units=2.0):
    """Host-side election over device tandem_counts: keep[b] is False ONLY
    when no candidate period can clear the host voting bar of
    ops.ccs._elect_period (support >= max(8, 0.05*L) within the relative
    window [0.94*l - 4, 1.06*l + 4], l in [min_period, L/min_units]).

    Because tandem_counts dominates the host vote counts per lag, a False
    here guarantees find_consensus would return (None, None) -- the screen
    never changes which reads get a consensus.  Reads longer than
    2 * max_lag are auto-kept (the screen cannot cover their period
    range)."""
    import numpy as np

    counts = np.asarray(counts)
    max_lag = counts.shape[1]
    lags = np.arange(1, max_lag + 1)
    lo = np.clip(np.ceil(0.94 * lags - 4).astype(np.int64), 1, max_lag + 1)
    hi = np.clip(np.floor(1.06 * lags + 4).astype(np.int64), 0, max_lag)
    keep = np.zeros(len(lengths), bool)
    for b, L in enumerate(lengths):
        if L < 2 * min_period:
            continue                      # host rejects outright
        if L / min_units > max_lag:
            keep[b] = True                # period range not covered: pass
            continue
        cs = np.concatenate([[0], np.cumsum(counts[b])])
        sup = cs[hi] - cs[lo - 1]
        valid_l = (lags >= min_period) & (lags <= L / min_units)
        min_support = max(8, 0.05 * L)
        keep[b] = bool(np.any(sup[valid_l] >= min_support))
    return keep
