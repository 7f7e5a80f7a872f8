#!/usr/bin/env python
"""Genome-scale smoke: index build + call on a >=1 Gb synthetic genome.

VERDICT r2 #5: prove the genome/index path at human-genome scale (the
reference serves GRCm38/GRCh38-sized fastas through htslib's lazy Faidx,
align.py:184-223).  Records wall times, peak RSS, and per-read mapping
cost.  Prints one JSON line.

  python benchmarks/scale_smoke.py --genome-mb 1024 --reads 300
"""

import argparse
import json
import os
import resource
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--genome-mb', type=int, default=1024)
    ap.add_argument('--contigs', type=int, default=8)
    ap.add_argument('--reads', type=int, default=300)
    ap.add_argument('--loci', type=int, default=8)
    ap.add_argument('--threads', type=int, default=4)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--keep-dir', default=None,
                    help='reuse this dir across runs (cache warm-start)')
    args = ap.parse_args()

    import jax
    jax.config.update('jax_platforms', 'cpu')

    from ciri_long_tpu.cli.main import call
    from ciri_long_tpu.io.genome import Genome
    from ciri_long_tpu.tools.simulate import (random_loci, simulate_linear,
                                              simulate_reads)
    from types import SimpleNamespace

    rng = np.random.default_rng(args.seed)
    root = args.keep_dir or tempfile.mkdtemp(prefix='scale_smoke_')
    os.makedirs(root, exist_ok=True)
    ref = os.path.join(root, 'genome.fa')
    timing = {}

    t0 = time.perf_counter()
    if not os.path.exists(ref):
        # stream the fasta to disk in 8 Mb blocks (never hold 1 Gb of
        # Python strings); salt in N islands like real assemblies
        per = args.genome_mb * (1 << 20) // args.contigs
        bases = np.frombuffer(b'ACGT', np.uint8)
        with open(ref, 'w') as f:
            for c in range(args.contigs):
                f.write('>ctg{}\n'.format(c))
                left = per
                while left > 0:
                    n = min(left, 8 << 20)
                    blk = bases[rng.integers(0, 4, n)].tobytes().decode()
                    if left == per:  # one N island per contig head region
                        blk = blk[:5000] + 'N' * 500 + blk[5500:]
                    f.write(blk + '\n')
                    left -= n
    timing['genome_gen_s'] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    genome = Genome(ref)
    timing['genome_parse_s'] = round(time.perf_counter() - t0, 1)
    gb = genome.total_len / 1e9
    packed = genome.is_packed
    rss_after_genome = rss_gb()

    loci = random_loci(genome, rng, args.loci)
    reads_path = os.path.join(root, 'reads.fa')
    depth = max(1, args.reads // args.loci)
    n_reads = 0
    with open(reads_path, 'w') as f:
        for rid, seq, cid in simulate_reads(genome, loci, rng, depth=depth):
            f.write('>{}\n{}\n'.format(rid, seq))
            n_reads += 1
        for rid, seq in simulate_linear(genome, rng, n=args.reads // 4):
            f.write('>{}\n{}\n'.format(rid, seq))
            n_reads += 1
    del genome

    out_dir = os.path.join(root, 'out')
    # when reusing --keep-dir, clear prior STAGE artifacts (else `call`
    # resumes from them and measures nothing) but keep the mmap caches
    # (tmp/minidx*, tmp/gcodes) whose reuse is the warm-start being
    # exercised
    tmpdir = os.path.join(out_dir, 'tmp')
    if os.path.isdir(tmpdir):
        import shutil
        for name in os.listdir(tmpdir):
            if name.startswith(('minidx', 'gcodes')):
                continue
            p = os.path.join(tmpdir, name)
            shutil.rmtree(p) if os.path.isdir(p) else os.unlink(p)
        for name in os.listdir(out_dir):
            p = os.path.join(out_dir, name)
            if os.path.isfile(p):
                os.unlink(p)
    t0 = time.perf_counter()
    counts = call(SimpleNamespace(input=reads_path, output=out_dir,
                                  reference=ref, prefix='smoke', gtf=None,
                                  circ=None, threads=args.threads,
                                  debug=False, backend='cpu'))
    call_s = time.perf_counter() - t0
    summary = json.load(open(os.path.join(out_dir, 'smoke.json')))
    timing['call_s'] = round(call_s, 1)
    timing['stage'] = summary.get('timing', {})

    print(json.dumps({
        'metric': 'scale_smoke_reads_per_s',
        'value': round(n_reads / call_s, 2),
        'unit': 'reads/s',
        'genome_gb': round(gb, 3),
        'genome_packed_2bit': packed,
        'reads': n_reads,
        'bsj_called': counts.get('bsj', 0),
        'rss_peak_gb': round(rss_gb(), 2),
        'rss_after_genome_gb': round(rss_after_genome, 2),
        'timing': timing,
        'dir': root,
    }))


if __name__ == '__main__':
    main()
