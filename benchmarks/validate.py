#!/usr/bin/env python
"""End-to-end accuracy validation on simulated data.

Simulates circRNA rolling-circle reads (multi-exon, both strands) plus
linear background over a random genome, runs call + collapse, and scores
the final circRNA table against the simulation truth:

  recall    = true loci recovered (BSJ within +-tol)
  precision = reported loci that match a true locus

This is the NanoSim-benchmark role from the reference (misc/NanoSim.ipynb)
as a one-command script.  Prints one JSON line.
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


def run(reads=120, genome_kb=1000, loci=8, depth=None, tol=5, seed=0,
        noise=0.02, threads=1, profile='uniform'):
    from ciri_long_tpu.cli.main import call, collapse
    from ciri_long_tpu.io.genome import Genome
    from ciri_long_tpu.tools.simulate import (random_loci, simulate_linear,
                                              simulate_reads)

    from ciri_long_tpu.tools.simulate import plant_splice_signals

    rng = np.random.default_rng(seed)
    with tempfile.TemporaryDirectory() as root:
        chars = list("".join(rng.choice(list("ACGT"), size=genome_kb * 1000)))
        genome0 = Genome.from_dict({'chr1': "".join(chars)})
        truth_loci = random_loci(genome0, rng, loci)
        chr1 = "".join(plant_splice_signals(chars, truth_loci))
        ref = os.path.join(root, 'genome.fa')
        with open(ref, 'w') as f:
            f.write('>chr1\n{}\n'.format(chr1))
        genome = Genome.from_dict({'chr1': chr1})
        depth = depth or max(2, reads // loci)

        reads_path = os.path.join(root, 'reads.fa')
        truth = {}
        with open(reads_path, 'w') as f:
            for rid, seq, cid in simulate_reads(
                    genome, truth_loci, rng, depth=depth, sub=noise,
                    ins=noise / 2, dele=noise / 2, profile=profile,
                    artifacts=(profile == 'nanopore')):
                f.write('>{}\n{}\n'.format(rid, seq))
                truth[rid] = cid
            for rid, seq in simulate_linear(genome, rng, n=reads // 4,
                                            profile=profile):
                f.write('>{}\n{}\n'.format(rid, seq))

        out_dir = os.path.join(root, 'out')
        t0 = time.perf_counter()
        call(SimpleNamespace(input=reads_path, output=out_dir, reference=ref,
                             prefix='val', gtf=None, circ=None,
                             threads=threads, debug=False))
        lst = os.path.join(root, 's.lst')
        with open(lst, 'w') as f:
            f.write('S\t{}\n'.format(os.path.join(out_dir, 'val.cand_circ.fa')))
        collapse(SimpleNamespace(input=lst, output=out_dir, reference=ref,
                                 prefix='val', gtf=None, circ=None,
                                 threads=threads, debug=False))
        dt = time.perf_counter() - t0

        called = []
        info_path = os.path.join(out_dir, 'val.info')
        if os.path.exists(info_path):
            with open(info_path) as f:
                for line in f:
                    fields = line.rstrip().split('\t')
                    called.append((fields[0], int(fields[3]), int(fields[4])))

        true_set = []
        for contig, exons, strand in truth_loci:
            true_set.append((contig, exons[0][0] + 1, exons[-1][1]))

        def match(a, b):
            return a[0] == b[0] and abs(a[1] - b[1]) <= tol and \
                abs(a[2] - b[2]) <= tol

        tp_true = sum(1 for t in true_set if any(match(c, t) for c in called))
        tp_called = sum(1 for c in called if any(match(c, t) for t in true_set))
        recall = tp_true / max(1, len(true_set))
        precision = tp_called / max(1, len(called))
        return {
            'metric': 'bsj_recall',
            'value': round(recall, 3),
            'unit': 'fraction',
            'precision': round(precision, 3),
            'true_loci': len(true_set),
            'called_loci': len(called),
            'tolerance_bp': tol,
            'profile': profile,
            'seconds': round(dt, 1),
        }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--reads', type=int, default=120)
    ap.add_argument('--genome-kb', type=int, default=1000)
    ap.add_argument('--loci', type=int, default=8)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--backend', default=None, choices=['cpu'],
                    help='force the CPU backend (this box pre-registers a '
                         'remote TPU; env vars cannot override it)')
    ap.add_argument('--noise', type=float, default=0.02)
    ap.add_argument('--tol', type=int, default=5)
    ap.add_argument('--threads', type=int, default=1)
    ap.add_argument('--min-recall', type=float, default=None,
                    help='exit 1 unless recall >= this (CI gate)')
    ap.add_argument('--min-precision', type=float, default=None,
                    help='exit 1 unless precision >= this (CI gate)')
    ap.add_argument('--profile', default='uniform',
                    choices=['uniform', 'nanopore'],
                    help='read error model: uniform substitutions+indels '
                         'or the empirical nanopore profile '
                         '(tools/simulate.py::NANOPORE_PROFILE)')
    args = ap.parse_args()
    if args.backend == 'cpu':
        import jax
        jax.config.update('jax_platforms', 'cpu')
    res = run(reads=args.reads, genome_kb=args.genome_kb,
              loci=args.loci, seed=args.seed, noise=args.noise,
              tol=args.tol, threads=args.threads, profile=args.profile)
    print(json.dumps(res))
    if args.min_recall is not None and res['value'] < args.min_recall:
        sys.exit('FAIL: recall {} < {}'.format(res['value'],
                                               args.min_recall))
    if args.min_precision is not None and \
            res['precision'] < args.min_precision:
        sys.exit('FAIL: precision {} < {}'.format(res['precision'],
                                                  args.min_precision))


if __name__ == '__main__':
    main()
