#!/usr/bin/env python
"""End-to-end `collapse` throughput on simulated rolling-circle reads.

Companion to e2e_bench.py (which measures the call stage): builds a
simulated cohort, runs `call` once to produce cand_circ.fa, then times
the collapse stage serially and (optionally) pooled, asserting the
outputs are byte-identical across thread counts.

  python benchmarks/collapse_bench.py [--reads 4000] [--loci 16]
                                      [--threads 4]

NOTE: uses spawn pools at --threads > 1 -- the __main__ guard below is
load-bearing (spawn re-imports __main__).
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

OUT_FILES = ('bench.info', 'bench.reads', 'bench.expression',
             'bench.isoforms')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--reads', type=int, default=4000)
    ap.add_argument('--genome-kb', type=int, default=2000)
    ap.add_argument('--loci', type=int, default=16)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--threads', type=int, default=1)
    ap.add_argument('--backend', default='cpu', choices=['cpu', 'default'])
    args = ap.parse_args()
    if args.backend == 'cpu':
        import jax
        jax.config.update('jax_platforms', 'cpu')

    from ciri_long_tpu.cli.main import call, collapse
    from ciri_long_tpu.io.genome import Genome
    from ciri_long_tpu.tools.simulate import random_loci, simulate_reads

    rng = np.random.default_rng(args.seed)
    with tempfile.TemporaryDirectory() as root:
        chr1 = "".join(rng.choice(list("ACGT"), size=args.genome_kb * 1000))
        ref = os.path.join(root, 'genome.fa')
        with open(ref, 'w') as f:
            f.write('>chr1\n{}\n'.format(chr1))
        genome = Genome.from_dict({'chr1': chr1})
        loci = random_loci(genome, rng, args.loci)
        depth = max(1, args.reads // args.loci)
        rfa = os.path.join(root, 'reads.fa')
        n_reads = 0
        with open(rfa, 'w') as f:
            for rid, seq, _cid in simulate_reads(genome, loci, rng,
                                                 depth=depth):
                f.write('>{}\n{}\n'.format(rid, seq))
                n_reads += 1
        out = os.path.join(root, 'out')
        call(SimpleNamespace(input=rfa, output=out, reference=ref,
                             prefix='bench', gtf=None, circ=None,
                             threads=args.threads, debug=False))
        lst = os.path.join(root, 'samples.lst')
        with open(lst, 'w') as f:
            f.write('bench\t{}\n'.format(
                os.path.join(out, 'bench.cand_circ.fa')))

        def run(threads):
            pkl = os.path.join(out, 'tmp', 'bench.corrected.pkl')
            if os.path.exists(pkl):
                os.remove(pkl)
            t0 = time.perf_counter()
            collapse(SimpleNamespace(input=lst, output=out, reference=ref,
                                     prefix='bench', gtf=None, circ=None,
                                     threads=threads, debug=False))
            dt = time.perf_counter() - t0
            return dt, {f: open(os.path.join(out, f)).read()
                        for f in OUT_FILES}

        t1, out1 = run(1)
        result = {
            'metric': 'collapse_reads_per_s',
            'value': round(n_reads / t1, 2),
            'unit': 'reads/s',
            'reads': n_reads,
            'seconds_t1': round(t1, 2),
        }
        if args.threads > 1:
            tn, outn = run(args.threads)
            result['seconds_t{}'.format(args.threads)] = round(tn, 2)
            result['outputs_identical'] = out1 == outn
            assert out1 == outn, 'pooled collapse diverged from serial'
        print(json.dumps(result))


if __name__ == '__main__':
    main()
