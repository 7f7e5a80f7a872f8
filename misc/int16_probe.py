"""Re-probe Mosaic int16/int8 vector support on the current toolchain
(ROADMAP r4 #6).  Each probe compiles + runs one tiny Pallas kernel on
the TPU; failures are caught and reported."""
import sys
sys.path.insert(0, "/root/repo")
import traceback
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def probe(name, fn):
    try:
        out = fn()
        print(f"PROBE {name}: OK {np.asarray(out).ravel()[:4]}")
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"PROBE {name}: FAIL {type(e).__name__}: {msg}")

def k_add16(x_ref, o_ref):
    o_ref[...] = x_ref[...] + jnp.int16(1)

def k_max16(x_ref, o_ref):
    o_ref[...] = jnp.maximum(x_ref[...], jnp.int16(3))

def k_where16(x_ref, o_ref):
    o_ref[...] = jnp.where(x_ref[...] > jnp.int16(0), x_ref[...], jnp.int16(-1))

def k_roll16(x_ref, o_ref):
    o_ref[...] = pltpu.roll(x_ref[...], 1, 1)

def k_add8(x_ref, o_ref):
    o_ref[...] = x_ref[...] + jnp.int8(1)

def k_bitcast(x_ref, o_ref):
    v = x_ref[...]
    o_ref[...] = jax.lax.bitcast_convert_type(v, jnp.int32).reshape(v.shape[0], -1)

def run(kern, dt, shape, oshape=None, odt=None):
    x = jnp.arange(np.prod(shape), dtype=dt).reshape(shape) % 7
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(oshape or shape, odt or dt),
    )(x).block_until_ready()

print("backend:", jax.default_backend())
probe("int16 add", lambda: run(k_add16, jnp.int16, (256, 512)))
probe("int16 max", lambda: run(k_max16, jnp.int16, (256, 512)))
probe("int16 where", lambda: run(k_where16, jnp.int16, (256, 512)))
probe("int16 roll", lambda: run(k_roll16, jnp.int16, (256, 512)))
probe("int8 add", lambda: run(k_add8, jnp.int8, (256, 512)))
probe("bitcast16->32", lambda: run(k_bitcast, jnp.int16, (256, 512, 2), (256, 512), jnp.int32))
