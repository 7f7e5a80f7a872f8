"""Record real-minimap2 hit fixtures for filter-parity testing.

VERDICT r2 #4: `models/aligner.py` promises mappy-compatible hit
semantics, and the scan stage's keep/drop filters threshold on mlen
ratios (pipeline/find_bsj.py, reference find_bsj.py:243-246) -- so drift
in alignment EXTENT silently changes filter decisions.  This tool runs
real minimap2 (via the mappy wheel, preset='splice', reference
find_bsj.py:336) over a deterministic simulated dataset and records the
primary hit per read; tests/test_mappy_parity.py replays the same
dataset through our aligner and asserts the decisions match.

The mappy wheel is NOT installed in the build environment (no package
installs permitted); run this WHERE MAPPY EXISTS and commit the fixture:

    python -m ciri_long_tpu.tools.mappy_fixtures \
        --out tests/fixtures/mappy_hits.json

The dataset is regenerated bit-identically from the parameters embedded
in the fixture, so only hit records ship."""

import argparse
import json
import os
import sys

import numpy as np

PARAMS = dict(seed=20260819, genome_kb=400, loci=6, depth=12, linear=24)


def build_dataset(params=None):
    """Deterministic dataset shared by the recorder and the parity test."""
    from ciri_long_tpu.io.genome import Genome
    from ciri_long_tpu.tools.simulate import (plant_splice_signals,
                                              random_loci, simulate_linear,
                                              simulate_reads)

    p = dict(PARAMS)
    if params:
        p.update(params)
    rng = np.random.default_rng(p['seed'])
    chars = list("".join(rng.choice(list("ACGT"),
                                    size=p['genome_kb'] * 1000)))
    genome0 = Genome.from_dict({'chr1': "".join(chars)})
    loci = random_loci(genome0, rng, p['loci'])
    chr1 = "".join(plant_splice_signals(chars, loci))
    genome = Genome.from_dict({'chr1': chr1})
    reads = []
    for rid, seq, cid in simulate_reads(genome, loci, rng,
                                        depth=p['depth']):
        reads.append((rid, seq))
    for rid, seq in simulate_linear(genome, rng, n=p['linear']):
        reads.append((rid, seq))
    return p, genome, chr1, reads


def hit_row(h):
    return dict(ctg=h.ctg, strand=int(h.strand), q_st=int(h.q_st),
                q_en=int(h.q_en), r_st=int(h.r_st), r_en=int(h.r_en),
                mlen=int(h.mlen), blen=int(h.blen), mapq=int(h.mapq))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', default='tests/fixtures/mappy_hits.json')
    args = ap.parse_args()
    try:
        import mappy
    except ImportError:
        sys.exit('mappy is not installed here; run this tool in an '
                 'environment with the minimap2 wheel (pip install mappy) '
                 'and commit the resulting fixture.')

    import tempfile
    params, genome, chr1, reads = build_dataset()
    with tempfile.NamedTemporaryFile('w', suffix='.fa') as fa:
        fa.write('>chr1\n{}\n'.format(chr1))
        fa.flush()
        al = mappy.Aligner(fa.name, preset='splice')
        rows = {}
        for rid, seq in reads:
            hits = [h for h in al.map(seq)]
            prim = None
            for h in hits:
                if getattr(h, 'is_primary', True):
                    prim = h
                    break
            rows[rid] = dict(read_len=len(seq),
                             primary=hit_row(prim) if prim else None,
                             n_hits=len(hits))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, 'w') as f:
        json.dump(dict(params=params, minimap2=mappy.__version__,
                       hits=rows), f, indent=1)
    print('wrote', args.out, 'with', len(rows), 'reads')


if __name__ == '__main__':
    main()
