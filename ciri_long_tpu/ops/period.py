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
