#!/usr/bin/env python
"""Benchmark: batched Smith-Waterman throughput (GCUPS) on the default
JAX device (real TPU under the driver).

The SW kernel is the framework's flagship compute path -- it replaces the
reference's vendored striped-SSW C library (ssw.c:123 sw_sse2_byte), whose
SSE2 implementation sustains ~2 GCUPS/core on the CI-class CPUs the
reference targets (Zhao et al. 2013 report 1.5-3 GCUPS/core; the repo
itself publishes no numbers, BASELINE.md).  vs_baseline is measured GCUPS
over that 2.0 GCUPS single-core estimate.

Two kernel families exist (ops/sw_pallas.py): the wavefront route --
whose production form is the op-diet chained kernel, 130.3 GCUPS driver
capture on this shape (progression: scan 48.6 -> wave 70.9 -> wave5
80.9 -> chain/wave6 94.0 -> chain/wave7 130.3, all fixed methodology,
benchmarks/KERNEL_SOL.md) -- and the striped prefix-scan kernel as the
fallback.  The remote "axon" compile service
has been observed to stall for tens of minutes on bad days, so each
variant runs in a child process under a hard timeout and the scan kernel
is the fallback -- a hung compile must degrade the number, not zero it.

Prints exactly one JSON line:
  {"metric": "sw_gcups", "value": N, "unit": "GCUPS", "vs_baseline": N}
"""

import json
import os
import subprocess
import sys
import time

BASELINE_GCUPS = 2.0
WAVE_TIMEOUT_S = int(os.environ.get("CIRI_BENCH_WAVE_TIMEOUT", "1500"))
SCAN_TIMEOUT_S = int(os.environ.get("CIRI_BENCH_SCAN_TIMEOUT", "900"))


def measure():
    """Child-process entry: compile + time one kernel variant, print the
    JSON line.  Which variant runs is set by CIRI_SW_WAVE in the
    environment (ops/sw_pallas.py routing)."""
    import numpy as np
    import jax

    # Persistent compile cache: first remote compile can run minutes;
    # cached executables make repeat runs start in seconds.  The axon
    # plugin misreports compile times as sub-second, so the persist
    # threshold must be zeroed, and the dir is backend-specific (mixed
    # dirs crash jax's deserializer on machine-feature mismatches) --
    # see utils/dispatch.py::ensure_compile_cache.
    from ciri_long_tpu.utils.dispatch import ensure_compile_cache
    ensure_compile_cache(base_dir='/tmp')
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
    # Enough on-device iterations that the single dispatch+fetch RTT
    # (~40-60 ms on the tunnel) is <15% of the wall.
    n_iter = 63

    @jax.jit
    def loop(qx, rx):
        def body(_, carry):
            score, _, _ = sw_score_ends_auto(carry, rx, params)
            # GENUINE data dependency (codes 0-3 xor 1 stay 0-3): the
            # previous `qx + score*0` was strength-reduced by XLA and the
            # whole loop dead-code-eliminated, so every recorded GCUPS
            # number through round 2 actually measured ONE kernel + the
            # dispatch RTT, inflated by the claimed iteration count
            # (discovered 2026-08-19: wall was flat from 1 to 64 iters).
            return carry ^ (score & 1).astype(jnp.int8)[:, None]
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


def run_variant(wave, timeout_s):
    """Run one variant in a child; return its JSON line or None."""
    env = dict(os.environ)
    env["CIRI_SW_WAVE"] = "1" if wave else "0"
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--measure"],
            capture_output=True, text=True, timeout=timeout_s, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)) or ".")
    except subprocess.TimeoutExpired:
        print(f"[bench] {'wave' if wave else 'scan'} variant timed out "
              f"after {timeout_s}s", file=sys.stderr)
        return None
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            parsed = json.loads(line)
        except json.JSONDecodeError:
            continue
        if parsed.get("metric") == "sw_gcups":
            return line
    print(f"[bench] {'wave' if wave else 'scan'} variant failed "
          f"(rc={proc.returncode}):\n{proc.stderr[-2000:]}", file=sys.stderr)
    return None


def main():
    if "--measure" in sys.argv:
        measure()
        return
    line = run_variant(wave=True, timeout_s=WAVE_TIMEOUT_S)
    if line is None:
        line = run_variant(wave=False, timeout_s=SCAN_TIMEOUT_S)
    if line is None:
        print("[bench] all variants failed; device unreachable?",
              file=sys.stderr)
        sys.exit(1)
    print(line)


if __name__ == "__main__":
    main()
