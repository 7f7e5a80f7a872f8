#!/usr/bin/env python
"""End-to-end `call` throughput on simulated rolling-circle reads.

Secondary benchmark (bench.py's single JSON line is the SW kernel): builds
a random genome + simulated circRNA reads, runs the full call stage, and
reports reads/s plus per-stage seconds.

  python benchmarks/e2e_bench.py [--reads 200] [--genome-mb 1]
"""

import argparse
import json
import os
import sys
import tempfile
import time
from types import SimpleNamespace

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--reads', type=int, default=120)
    ap.add_argument('--genome-kb', type=int, default=1000)
    ap.add_argument('--loci', type=int, default=8)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--threads', type=int, default=1)
    ap.add_argument('--backend', default=None, choices=['cpu'],
                    help='force the CPU backend (this box pre-registers a '
                         'remote TPU; env vars cannot override it)')
    args = ap.parse_args()
    if args.backend == 'cpu':
        import jax
        jax.config.update('jax_platforms', 'cpu')

    from ciri_long_tpu.cli.main import call
    from ciri_long_tpu.io.genome import Genome
    from ciri_long_tpu.tools.simulate import (random_loci, simulate_linear,
                                              simulate_reads)

    rng = np.random.default_rng(args.seed)
    with tempfile.TemporaryDirectory() as root:
        chr1 = "".join(rng.choice(list("ACGT"), size=args.genome_kb * 1000))
        ref = os.path.join(root, 'genome.fa')
        with open(ref, 'w') as f:
            f.write('>chr1\n{}\n'.format(chr1))
        genome = Genome.from_dict({'chr1': chr1})
        loci = random_loci(genome, rng, args.loci)
        depth = max(1, args.reads // args.loci)
        reads_path = os.path.join(root, 'reads.fa')
        n_circ = 0
        with open(reads_path, 'w') as f:
            for rid, seq, cid in simulate_reads(genome, loci, rng, depth=depth):
                f.write('>{}\n{}\n'.format(rid, seq))
                n_circ += 1
            n_lin = 0
            for rid, seq in simulate_linear(genome, rng, n=args.reads // 4):
                f.write('>{}\n{}\n'.format(rid, seq))
                n_lin += 1

        out_dir = os.path.join(root, 'out')
        t0 = time.perf_counter()
        counts = call(SimpleNamespace(input=reads_path, output=out_dir,
                                      reference=ref, prefix='bench', gtf=None,
                                      circ=None, threads=args.threads,
                                      debug=False))
        dt = time.perf_counter() - t0
        total = n_circ + n_lin
        summary = json.load(open(os.path.join(out_dir, 'bench.json')))
        print(json.dumps({
            'metric': 'call_reads_per_s',
            'value': round(total / dt, 2),
            'unit': 'reads/s',
            'total_reads': total,
            'bsj_called': counts['bsj'],
            'bsj_rate': round(counts['bsj'] / max(1, n_circ), 3),
            'seconds': round(dt, 1),
            'timing': summary.get('timing', {}),
        }))


if __name__ == '__main__':
    main()
