#!/usr/bin/env python
"""Speed-of-light probes for the NON-SW device kernels (VERDICT r4 #4):
chain DP (ops/chain.py), banded-NW traceback (ops/nw_tb_batch.py) and
batched POA (ops/poa_batch.py), measured with the bench.py methodology
-- the whole timing loop on device in ONE dispatch, iterations
serialized through a GENUINE data dependency, one host fetch -- so
tunnel RTT cannot masquerade as kernel time (BASELINE.md round-3
correction).

Each probe prints one JSON line with the measured work rate, the
ops/work-unit estimate from the kernel's source, the v5e ALU roof
(6.8e12 int32 elem-ops/s = (8x128) lanes x 4 ALUs x ~1.67 GHz;
fp32 via the same lanes -- benchmarks/KERNEL_SOL.md methodology) and
the implied occupancy.  Run each subcommand in its own process
(remote-compile stalls must not take down the others):

    python benchmarks/kernel_sol_probe.py chain
    python benchmarks/kernel_sol_probe.py nwtb
    python benchmarks/kernel_sol_probe.py poa

Results land in benchmarks/KERNEL_SOL.md (round-5 section).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VPU_OPS = 6.8e12  # elem-ops/s, v5e, KERNEL_SOL.md "ALU-bound ceiling"


def _setup():
    import numpy as np
    from ciri_long_tpu.utils.dispatch import ensure_compile_cache
    ensure_compile_cache(base_dir='/tmp')
    import jax
    return np, jax


def _time_loop(jax, np, loop, args, n_iter):
    """Compile+warm, then time the single-dispatch chained loop."""
    np.asarray(loop(*args))
    t0 = time.perf_counter()
    np.asarray(loop(*args))
    return (time.perf_counter() - t0) / (n_iter + 1)


def probe_chain(smoke=False, B_override=None):
    """chain_scores_batch: every anchor step examines W=64 predecessors
    per row.  Per (row, window-slot) elem-ops from _chain_dp's step
    (ops/chain.py:37-68): 2 subs, 5 cmps+4 ands, 2 mins, abs, ~6 for the
    log2-based penalty (transcendental lowered to polynomial, counted as
    6), 3 where/max/argmax-tree amortised + 6 window-rotate moves
    ~= 29 elem-ops; plus the B-wide tail (take/select) amortised to ~1.
    Work unit = anchor-window-slot; roof = VPU_OPS / 30."""
    np, jax = _setup()
    import jax.numpy as jnp
    from ciri_long_tpu.ops.chain import chain_scores_batch

    B, A, W = (16, 64, 16) if smoke else (512, 512, 64)
    B = B_override or B
    rng = np.random.default_rng(0)
    r = np.sort(rng.integers(0, 100_000, (B, A)), axis=1).astype(np.int32)
    q = (r % 4096 + rng.integers(0, 50, (B, A))).astype(np.int32)
    ctg = np.zeros((B, A), np.int32)
    valid = np.ones((B, A), bool)
    n_iter = 31

    @jax.jit
    def loop(rr, qq):
        def body(_, carry):
            f, _pre = chain_scores_batch(carry[0], carry[1], ctg, valid,
                                         15, W)
            # genuine dependency: shift anchor positions by the score
            # parity (keeps sortedness: adds 0/1 to EVERY element)
            d = (jnp.sum(f, axis=1).astype(jnp.int32) & 1)[:, None]
            return carry[0] + d, carry[1] + d
        rr, qq = jax.lax.fori_loop(0, n_iter, body, (rr, qq))
        f, _ = chain_scores_batch(rr, qq, ctg, valid, 15, W)
        return f

    dt = _time_loop(jax, np, loop, (jnp.asarray(r), jnp.asarray(q)), n_iter)
    units = B * A * W
    rate = units / dt
    ops_per_unit = 30.0
    print(json.dumps({
        'metric': 'chain_anchor_window_units_per_s', 'value': round(rate / 1e9, 3),
        'unit': 'G units/s', 'wall_per_call_s': round(dt, 5),
        'ops_per_unit_est': ops_per_unit,
        'roof_gunits': round(VPU_OPS / ops_per_unit / 1e9, 1),
        'occupancy': round(rate * ops_per_unit / VPU_OPS, 3)}))


def probe_nwtb(smoke=False, B_override=None):
    """Banded-NW traceback kernel (one (N,W) bucket): two banded passes
    of (N+1) x W cells each (band + band-doubling check) plus the
    traceback walk (O(N+W), negligible).  Per-cell elem-ops from
    _build_kernel's row loop (ops/nw_tb_batch.py): sub/score select ~4,
    H/E/F maxes ~6, prefix-max E recurrence log2(W)x2 ~= 18 at W=256,
    case-code packing ~4 -> ~32 elem-ops/cell.  Work unit = banded cell
    (both passes counted)."""
    np, jax = _setup()
    import jax.numpy as jnp
    from ciri_long_tpu.ops import nw_tb_batch as nwtb

    B, N, W = (8, 128, 64) if smoke else (512, 512, 256)
    B = B_override or B
    rng = np.random.default_rng(1)
    n = N - 8
    m = N - 4
    lo1, hi1 = min(0, m - n) - 20, max(0, m - n) + 20
    lo2, hi2 = min(0, m - n) - 40, max(0, m - n) + 40
    kernel = nwtb._kernel_for(N, W, min(2 * N + W + 8, 256), (2, 4, 4, 2))
    qs = np.full((B, N), 5, np.int8)
    rp1 = np.full((B, N + 2 * W + 2), 5, np.int8)
    rp2 = np.full((B, N + 2 * W + 2), 5, np.int8)
    base = rng.integers(0, 4, (B, m)).astype(np.int8)
    qs[:, :n] = base[:, :n]
    rp1[:, W - lo1:W - lo1 + m] = base
    rp2[:, W - lo2:W - lo2 + m] = base
    nv = np.full(B, n, np.int32)
    mv = np.full(B, m, np.int32)
    n_iter = 15

    @jax.jit
    def loop(qx):
        def body(_, carry):
            s1, _s2, _ops, _pos, _ok = kernel(
                carry, jnp.asarray(rp1), jnp.asarray(rp2),
                jnp.asarray(nv), jnp.asarray(mv),
                jnp.full(B, lo1, jnp.int32), jnp.full(B, hi1, jnp.int32),
                jnp.full(B, lo2, jnp.int32), jnp.full(B, hi2, jnp.int32))
            return carry ^ (s1 & 1).astype(jnp.int8)[:, None]
        final = jax.lax.fori_loop(0, n_iter, body, qx)
        return kernel(final, jnp.asarray(rp1), jnp.asarray(rp2),
                      jnp.asarray(nv), jnp.asarray(mv),
                      jnp.full(B, lo1, jnp.int32), jnp.full(B, hi1, jnp.int32),
                      jnp.full(B, lo2, jnp.int32),
                      jnp.full(B, hi2, jnp.int32))[0]

    dt = _time_loop(jax, np, loop, (jnp.asarray(qs),), n_iter)
    cells = B * (N + 1) * W * 2   # two banded passes
    rate = cells / dt
    ops_per_cell = 32.0
    print(json.dumps({
        'metric': 'nwtb_banded_gcells_per_s', 'value': round(rate / 1e9, 3),
        'unit': 'G cells/s', 'wall_per_call_s': round(dt, 5),
        'ops_per_cell_est': ops_per_cell,
        'roof_gcells': round(VPU_OPS / ops_per_cell / 1e9, 1),
        'occupancy': round(rate * ops_per_cell / VPU_OPS, 3)}))


def probe_poa(smoke=False, B_override=None, win=False, L=16, P=None):
    """poa_align_batch on a linear-chain graph (the dominant real case:
    consensus graphs are near-linear with bubbles).  Work unit =
    (V+1) x (n+1) graph-DP cell.  Per-cell elem-ops from _align_one
    (ops/poa_batch.py): per predecessor slot P=4: 3 maxes + select ~5
    each = 20, plus convex-affine E/F updates ~10, case packing ~4
    -> ~34 elem-ops/cell."""
    np, jax = _setup()
    import jax.numpy as jnp
    from ciri_long_tpu.ops.poa_batch import poa_align_batch

    B, V, n, Pdef = (4, 48, 48, 4) if smoke else (256, 384, 384, 4)
    B = B_override or B
    P = P or Pdef
    rng = np.random.default_rng(2)
    bases = rng.integers(0, 4, (B, V)).astype(np.int32)
    nv = np.full(B, V, np.int32)
    preds = np.full((B, V, P), -1, np.int32)
    preds[:, 1:, 0] = np.arange(V - 1)
    npred = np.ones((B, V), np.int32)
    npred[:, 0] = 0
    seqs = rng.integers(0, 4, (B, n)).astype(np.int32)
    ns = np.full(B, n, np.int32)
    scores = (10, -4, -8, -2, -24, -1)
    n_iter = 15

    # poa_align_batch fetches to host internally; probe the underlying
    # jitted fn with the chained-loop methodology instead
    from ciri_long_tpu.ops.poa_batch import _build_batch_fn
    fn = _build_batch_fn(scores, lookback=L if win else None)

    @jax.jit
    def loop(sx):
        def body(_, carry):
            score, _aln, _acnt = fn(jnp.asarray(bases), jnp.asarray(nv),
                                    jnp.asarray(preds), jnp.asarray(npred),
                                    carry, jnp.asarray(ns))
            return carry ^ (score & 1).astype(jnp.int32)[:, None]
        final = jax.lax.fori_loop(0, n_iter, body, sx)
        return fn(jnp.asarray(bases), jnp.asarray(nv), jnp.asarray(preds),
                  jnp.asarray(npred), final, jnp.asarray(ns))[0]

    dt = _time_loop(jax, np, loop, (jnp.asarray(seqs),), n_iter)
    cells = B * (V + 1) * (n + 1)
    rate = cells / dt
    ops_per_cell = 34.0
    print(json.dumps({
        'metric': ('poa_win_L%d_P%d_gcells_per_s' % (L, P)) if win
                  else 'poa_graph_gcells_per_s',
        'value': round(rate / 1e9, 3),
        'unit': 'G cells/s', 'wall_per_call_s': round(dt, 5),
        'ops_per_cell_est': ops_per_cell,
        'roof_gcells': round(VPU_OPS / ops_per_cell / 1e9, 1),
        'occupancy': round(rate * ops_per_cell / VPU_OPS, 3)}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('probe', choices=['chain', 'nwtb', 'poa'])
    ap.add_argument('--smoke', action='store_true',
                    help='tiny shapes for a CPU correctness pass')
    ap.add_argument('--B', type=int, default=None,
                    help='override the batch dim (occupancy-vs-batch probe)')
    ap.add_argument('--win', action='store_true',
                    help='poa: bounded-lookback ring kernel')
    ap.add_argument('--L', type=int, default=16,
                    help='poa --win: ring depth (production routes 4-16 '
                         'by the batch max back-edge, ops/poa.py)')
    ap.add_argument('--P', type=int, default=None,
                    help='poa: predecessor slots (production pads to the '
                         'group max in-degree bucket)')
    args = ap.parse_args()
    kw = dict(smoke=args.smoke, B_override=args.B)
    if args.probe == 'poa':
        kw['win'] = args.win
        kw['L'] = args.L
        kw['P'] = args.P
    {'chain': probe_chain, 'nwtb': probe_nwtb,
     'poa': probe_poa}[args.probe](**kw)


if __name__ == '__main__':
    main()
