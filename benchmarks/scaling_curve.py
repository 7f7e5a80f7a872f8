#!/usr/bin/env python
"""Virtual-mesh shard-scaling curve for the cohort scan (VERDICT r4 #7).

Real multi-chip hardware is unavailable here (one tunneled v5e), so this
measures the honest decomposition on the 8-device virtual CPU mesh:

  * per-shard scan walls, timed SEQUENTIALLY (no core contention -- the
    4-core VM cannot run 8 shards truly concurrently, so the parallel
    step wall is MODELLED as max(shard walls), which is exact for
    devices that are not oversubscribed);
  * the all_gather candidate merge, timed separately (on a virtual mesh
    this is a memcpy-grade collective -- reported apart precisely so the
    table does not launder it into scan efficiency; on real ICI it costs
    bytes/bandwidth, see parallel/mesh.py::make_candidate_gather).

  T(n)   = max_i(shard_wall_i) + t_gather(n)
  eff(n) = T(1) / (n * T(n))     -- classic strong scaling

Shard imbalance (max/mean of the shard walls) is printed too: with
contiguous near-even read splits it is the ONLY efficiency loss the scan
itself can suffer on real hardware.

Byte-identity across n is asserted on the merged record table (the same
contract tests/test_cohort.py proves at unit scale).

Usage: python benchmarks/scaling_curve.py [--reads 2000] [--loci 16]
Re-execs itself with a clean environment (8 virtual CPU devices).
"""

import argparse
import json
import os
import sys
import time


def reexec_clean():
    """Re-launch under 8 virtual CPU devices with the axon sitecustomize
    stripped (its PYTHONPATH hook re-registers the remote TPU platform
    before main() runs)."""
    if os.environ.get('CIRI_SCALING_CURVE_CHILD') == '1':
        return
    env = dict(os.environ)
    env.pop('PALLAS_AXON_POOL_IPS', None)
    env['PYTHONPATH'] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    env['XLA_FLAGS'] = (env.get('XLA_FLAGS', '')
                        + ' --xla_force_host_platform_device_count=8')
    env['JAX_PLATFORMS'] = 'cpu'
    env['CIRI_SCALING_CURVE_CHILD'] = '1'
    os.execve(sys.executable, [sys.executable,
                               os.path.abspath(__file__)] + sys.argv[1:],
              env)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--reads', type=int, default=2000)
    ap.add_argument('--genome-kb', type=int, default=2000)
    ap.add_argument('--loci', type=int, default=16)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--shards', type=int, nargs='*', default=[1, 2, 4, 8])
    ap.add_argument('--repeat', type=int, default=2,
                    help='sweeps per n; best step wall kept (ambient-load'
                    ' noise on a shared VM dwarfs shard variance)')
    args = ap.parse_args()

    import numpy as np

    from ciri_long_tpu.context import Context
    from ciri_long_tpu.io.genome import Genome
    from ciri_long_tpu.models.aligner import GenomeAligner
    from ciri_long_tpu.ops.ccs import find_consensus
    from ciri_long_tpu.parallel.cohort import _shard_bounds, scan_shard
    from ciri_long_tpu.parallel.mesh import make_mesh, gather_candidates
    from ciri_long_tpu.parallel.records import encode_records
    from ciri_long_tpu.tools.simulate import random_loci, simulate_reads

    rng = np.random.default_rng(args.seed)
    chr1 = "".join(rng.choice(list("ACGT"), size=args.genome_kb * 1000))
    genome = Genome.from_dict({'chr1': chr1})
    ctx = Context(aligner=GenomeAligner(genome), genome=genome)
    loci = random_loci(genome, rng, args.loci)
    depth = max(1, args.reads // args.loci)

    items = []
    for rid, seq, _cid in simulate_reads(genome, loci, rng, depth=depth):
        segments, ccs = find_consensus(seq)
        if ccs is not None:
            items.append([rid, segments, ccs, seq])
    print('# reads with consensus: {}'.format(len(items)), flush=True)

    mesh = make_mesh(8)
    ctg_index = {n: i for i, n in enumerate(ctx.genome.names)}

    # warm every compile (scan + gather) before any timed region; the
    # gather must be warmed at the FULL record-table shape -- a first-run
    # compile inside the n=1 timing inflated t1 by ~1.6 s and produced a
    # bogus superlinear n=2 point
    _, _, warm_recs = scan_shard(ctx, items, 0, len(items), True)
    rows, _ = encode_records(warm_recs, ctg_index)
    for _ in range(2):
        gather_candidates(mesh, rows, np.ones(len(rows), bool))

    results = []
    goldens = {}
    for n in args.shards:
        best = None
        for _rep in range(max(1, args.repeat)):
            walls = []
            all_rows = []
            counters_total = {}
            for lo, hi in _shard_bounds(len(items), n):
                t0 = time.perf_counter()
                cnt, _, recs = scan_shard(ctx, items, lo, hi, True)
                walls.append(time.perf_counter() - t0)
                rows, _ = encode_records(recs, ctg_index)
                all_rows.append(rows)
                for k, v in cnt.items():
                    counters_total[k] = counters_total.get(k, 0) + v
            rows = np.concatenate(all_rows)
            t0 = time.perf_counter()
            merged, n_valid = gather_candidates(mesh, rows,
                                                np.ones(len(rows), bool))
            t_gather = time.perf_counter() - t0
            assert n_valid == len(rows)
            goldens[n] = (merged.tobytes(),
                          tuple(sorted(counters_total.items())))
            step_wall = max(walls) + t_gather
            rec = dict(
                n=n, shard_max_s=round(max(walls), 3),
                shard_mean_s=round(sum(walls) / len(walls), 3),
                imbalance=round(max(walls) * len(walls) / sum(walls), 3),
                gather_s=round(t_gather, 4),
                step_wall_s=round(step_wall, 3))
            if best is None or rec['step_wall_s'] < best['step_wall_s']:
                best = rec
        results.append(best)
        print(json.dumps(best), flush=True)

    # identical merged bytes + counters at every n
    base = goldens[args.shards[0]]
    for n, g in goldens.items():
        assert g == base, 'shard count {} changed outputs'.format(n)

    t1 = results[0]['step_wall_s'] * (args.shards[0])  # n=1 total
    print('\n| n | max shard s | imbalance | gather s | step wall s |'
          ' efficiency |')
    print('|---|---|---|---|---|---|')
    for r in results:
        eff = t1 / (r['n'] * r['step_wall_s'])
        print('| {} | {} | {} | {} | {} | {:.1%} |'.format(
            r['n'], r['shard_max_s'], r['imbalance'], r['gather_s'],
            r['step_wall_s'], eff))


if __name__ == '__main__':
    reexec_clean()
    main()
