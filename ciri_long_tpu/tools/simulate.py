"""circRNA rolling-circle read simulator.

Stand-in for the reference's NanoSim-based notebook (misc/NanoSim.ipynb,
used for the paper's benchmarking): given a genome and circRNA loci (or
random loci), emit Nanopore-like rolling-circle reads -- each read is
several noisy tandem copies of the (possibly multi-exon) circular
transcript starting at a random rotation -- plus optional linear
background reads.  Used by the integration tests and the end-to-end bench.
"""

import argparse
import sys

import numpy as np

from ciri_long_tpu.io.genome import Genome
from ciri_long_tpu.utils.seq import revcomp


def mutate(rng, s, sub=0.03, ins=0.02, dele=0.02):
    out = []
    bases = "ACGT"
    for c in s:
        r = rng.random()
        if r < dele:
            continue
        if r < dele + sub:
            out.append(bases[int(rng.integers(0, 4))])
        else:
            out.append(c)
        if rng.random() < ins:
            out.append(bases[int(rng.integers(0, 4))])
    return "".join(out)


def circ_sequence(genome, contig, exons, strand):
    """Spliced circular transcript sequence from [(start, end), ...]
    (0-based half-open, genomic order)."""
    seq = "".join(genome.seq(contig, st, en) for st, en in exons)
    return revcomp(seq) if strand == '-' else seq


def simulate_reads(genome, loci, rng, depth=10, min_copies=2.2,
                   max_copies=8.0, sub=0.03, ins=0.015, dele=0.015):
    """Yield (read_id, seq, circ_id) rolling-circle reads."""
    for li, (contig, exons, strand) in enumerate(loci):
        unit = circ_sequence(genome, contig, exons, strand)
        circ_id = '{}:{}-{}'.format(contig, exons[0][0] + 1, exons[-1][1])
        for d in range(depth):
            copies = float(rng.uniform(min_copies, max_copies))
            rot = int(rng.integers(0, len(unit)))
            unit_rot = unit[rot:] + unit[:rot]
            n_full = int(copies)
            parts = [mutate(rng, unit_rot, sub, ins, dele)
                     for _ in range(n_full)]
            frac = copies - n_full
            if frac > 0.05:
                parts.append(mutate(rng, unit_rot[:int(len(unit) * frac)],
                                    sub, ins, dele))
            yield 'circ{}_read{}'.format(li, d), "".join(parts), circ_id


def simulate_linear(genome, rng, n=20, length=1200, sub=0.03, ins=0.015,
                    dele=0.015):
    contigs = genome.names
    for i in range(n):
        ctg = contigs[int(rng.integers(0, len(contigs)))]
        clen = genome.contig_len[ctg]
        if clen <= length + 1:
            continue
        st = int(rng.integers(0, clen - length))
        yield 'lin_read{}'.format(i), mutate(rng, genome.seq(ctg, st, st + length),
                                             sub, ins, dele)


def random_loci(genome, rng, n=5, n_exons=(1, 3), exon_len=(120, 400),
                intron_len=(200, 2000)):
    """Non-overlapping random circRNA loci: the genome's largest contig is
    divided into n slots, one locus per slot."""
    ctg = max(genome.names, key=lambda c: genome.contig_len[c])
    clen = genome.contig_len[ctg]
    slot = (clen - 2000) // max(1, n)
    loci = []
    for t in range(n):
        k = int(rng.integers(n_exons[0], n_exons[1] + 1))
        span_max = k * exon_len[1] + (k - 1) * intron_len[1]
        lo = 1000 + t * slot
        hi = max(lo + 1, lo + slot - span_max - 100)
        pos = int(rng.integers(lo, hi))
        exons = []
        for _ in range(k):
            el = int(rng.integers(exon_len[0], exon_len[1]))
            exons.append((pos, pos + el))
            pos += el + int(rng.integers(intron_len[0], intron_len[1]))
        strand = '+' if rng.random() < 0.5 else '-'
        loci.append((ctg, exons, strand))
    return loci


def plant_splice_signals(chars, loci):
    """Write canonical splice signals into a mutable genome (list of chars)
    so the simulated loci carry GT-AG introns and BSJ signals on their
    strand: '+' exons get AG|exon|GT, '-' exons get AC|exon|CT (the
    plus-strand image of a minus-strand GT-AG)."""
    for ctg, exons, strand in loci:
        before, after = ('AG', 'GT') if strand == '+' else ('AC', 'CT')
        for st, en in exons:
            chars[st - 2:st] = list(before)
            chars[en:en + 2] = list(after)
    return chars


def main():
    ap = argparse.ArgumentParser('ciri-long-tpu-simulate')
    ap.add_argument('-r', '--ref', required=True)
    ap.add_argument('-o', '--out', required=True)
    ap.add_argument('-n', '--loci', type=int, default=5)
    ap.add_argument('-d', '--depth', type=int, default=10)
    ap.add_argument('--linear', type=int, default=20)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--truth', default=None,
                    help='write true circ_ids to this file')
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    genome = Genome(args.ref)
    loci = random_loci(genome, rng, args.loci)

    truth = open(args.truth, 'w') if args.truth else None
    with open(args.out, 'w') as out:
        for read_id, seq, circ_id in simulate_reads(genome, loci, rng,
                                                    depth=args.depth):
            out.write('>{}\n{}\n'.format(read_id, seq))
            if truth:
                truth.write('{}\t{}\n'.format(read_id, circ_id))
        for read_id, seq in simulate_linear(genome, rng, args.linear):
            out.write('>{}\n{}\n'.format(read_id, seq))
    if truth:
        truth.close()


if __name__ == '__main__':
    main()
