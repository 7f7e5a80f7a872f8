#!/usr/bin/env python
"""Benchmark: batched Smith-Waterman throughput (GCUPS) on the default
JAX device (real TPU under the driver).

The SW kernel is the framework's flagship compute path -- it replaces the
reference's vendored striped-SSW C library (ssw.c:123 sw_sse2_byte), whose
SSE2 implementation sustains ~2 GCUPS/core on the CI-class CPUs the
reference targets (Zhao et al. 2013 report 1.5-3 GCUPS/core; the repo
itself publishes no numbers, BASELINE.md).  vs_baseline is measured GCUPS
over that 2.0 GCUPS single-core estimate.

Prints exactly one JSON line:
  {"metric": "sw_gcups", "value": N, "unit": "GCUPS", "vs_baseline": N}
"""

import json
import sys
import time

import numpy as np

BASELINE_GCUPS = 2.0


def main():
    import jax
    from ciri_long_tpu.ops.sw import SWParams, sw_score_ends_auto

    rng = np.random.default_rng(0)
    B, Lq, Lr = 512, 1024, 4096
    q = rng.integers(0, 4, (B, Lq)).astype(np.int8)
    r = rng.integers(0, 4, (B, Lr)).astype(np.int8)
    params = SWParams(10, 4, 8, 2)

    import jax.numpy as jnp

    qd = jax.device_put(q)
    rd = jax.device_put(r)

    # The whole timing loop runs on device in ONE dispatch (iterations
    # serialized through a data dependency), then one host fetch -- the
    # only robust methodology under async/remote dispatch where per-call
    # RTT would otherwise dominate or, worse, never be waited on.
    n_iter = 8

    @jax.jit
    def loop(qx, rx):
        def body(_, carry):
            score, _, _ = sw_score_ends_auto(carry, rx, params)
            return (qx + (score[:, None] * 0).astype(jnp.int8))
        final = jax.lax.fori_loop(0, n_iter, body, qx)
        return sw_score_ends_auto(final, rx, params)[0]

    np.asarray(loop(qd, rd))   # compile + warm up, full round trip

    t0 = time.perf_counter()
    np.asarray(loop(qd, rd))
    dt = time.perf_counter() - t0
    n_iter += 1  # the loop body runs n_iter times plus the final call

    cells = B * Lq * Lr * n_iter
    gcups = cells / dt / 1e9
    print(json.dumps({
        "metric": "sw_gcups",
        "value": round(gcups, 3),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / BASELINE_GCUPS, 2),
    }))


if __name__ == "__main__":
    main()
