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
    # pad so a dynamic slice of static length L exists for every lag
    xpad = jnp.pad(x, ((0, 0), (0, pad_lags + 1)), constant_values=5)

    def one_lag(d):
        d = d + lag_offset + 1
        shifted = jax.lax.dynamic_slice_in_dim(xpad, d, L, axis=1)
        ok = valid & (shifted < 4)
        eq = (x == shifted) & ok
        denom = jnp.maximum(jnp.sum(ok, axis=1), 1)
        return jnp.sum(eq, axis=1) / denom

    lags = jnp.arange(max_lag)
    prof = jax.vmap(one_lag, out_axes=1)(lags)
    return prof.astype(jnp.float32)


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

    kpad = jnp.pad(kid, ((0, 0), (0, pad_lags + 1)))
    vpad = jnp.pad(vk, ((0, 0), (0, pad_lags + 1)))

    def one_lag(j):
        d = j + lag_offset + 1
        ks = jax.lax.dynamic_slice_in_dim(kpad, d, L, axis=1)
        vs = jax.lax.dynamic_slice_in_dim(vpad, d, L, axis=1)
        return jnp.sum((kid == ks) & vk & vs, axis=1, dtype=jnp.int32)

    lags = jnp.arange(max_lag)
    # chunked map keeps the [chunk, B, L] comparison temps bounded
    prof = jax.lax.map(one_lag, lags, batch_size=min(128, max_lag))
    return jnp.transpose(prof).astype(jnp.int32)


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
