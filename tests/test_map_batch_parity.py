"""Cross-path determinism fuzz: GenomeAligner.map() vs map_batch() on the
same reads (VERDICT round-1 weak #6).

The production scan runs every alignment through _map_many, which picks
map_batch for multi-read lists and map() for singletons, so list-size
changes flip which code path runs.  This fuzz pins the guarantee: for
every read, both paths must return identical hits (coords, cigar, mlen/blen, primary
flags) -- chain scores may differ in float32 rounding, so the score field
itself is excluded from the comparison.
"""

import numpy as np
import pytest

from ciri_long_tpu.io.genome import Genome
from ciri_long_tpu.models.aligner import GenomeAligner
from ciri_long_tpu.utils.seq import revcomp
from tests.test_poa import mutate


def rand_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


@pytest.fixture(scope="module")
def toy(module_rng):
    rng = module_rng
    genome = Genome.from_dict({"chrA": rand_seq(rng, 80_000),
                               "chrB": rand_seq(rng, 30_000)})
    return genome, GenomeAligner(genome)


def _reads(rng, genome, n):
    """Mixed difficulty: clean, noisy, revcomp, spliced, chimeric-ish,
    random (unmappable), across both contigs."""
    out = []
    chrA = genome.seq("chrA", 0, genome.contig_len["chrA"])
    chrB = genome.seq("chrB", 0, genome.contig_len["chrB"])
    for i in range(n):
        kind = i % 6
        if kind == 0:
            st = int(rng.integers(0, len(chrA) - 1200))
            out.append(chrA[st:st + int(rng.integers(300, 1200))])
        elif kind == 1:
            st = int(rng.integers(0, len(chrA) - 1500))
            out.append(mutate(rng, chrA[st:st + 800],
                              sub=0.05, ins=0.04, dele=0.04))
        elif kind == 2:
            st = int(rng.integers(0, len(chrB) - 900))
            out.append(revcomp(chrB[st:st + 600]))
        elif kind == 3:
            st = int(rng.integers(0, len(chrA) - 6000))
            gap = int(rng.integers(200, 3000))
            out.append(chrA[st:st + 400] + chrA[st + 400 + gap:st + 800 + gap])
        elif kind == 4:
            a = int(rng.integers(0, len(chrA) - 600))
            b = int(rng.integers(0, len(chrB) - 600))
            out.append(chrA[a:a + 400] + chrB[b:b + 400])
        else:
            out.append(rand_seq(rng, int(rng.integers(200, 600))))
    return out


def _hit_key(h):
    return (h.ctg, h.strand, h.q_st, h.q_en, h.r_st, h.r_en, h.mlen,
            h.blen, h.is_primary, tuple(tuple(c) for c in h.cigar))


@pytest.mark.parametrize("batch", [8, 33, 64])
def test_map_vs_map_batch_identical(toy, rng, batch):
    genome, aligner = toy
    reads = _reads(rng, genome, batch)
    serial = [[_hit_key(h) for h in aligner.map(s)] for s in reads]
    batched = [[_hit_key(h) for h in hits]
               for hits in aligner.map_batch(reads)]
    assert serial == batched


def test_map_batch_chunk_size_invariance(toy, rng):
    """The same read set split into different batch sizes yields
    identical hits for every read."""
    genome, aligner = toy
    reads = _reads(rng, genome, 40)
    whole = [[_hit_key(h) for h in hits]
             for hits in aligner.map_batch(reads)]
    in_two = [[_hit_key(h) for h in hits]
              for hits in (aligner.map_batch(reads[:13])
                           + aligner.map_batch(reads[13:]))]
    assert whole == in_two


@pytest.mark.parametrize("batch", [8, 40])
def test_map_vs_device_chain_batch(toy, rng, batch):
    """The DEVICE chain branch (chain_scores_batch float32 DP + backtrack,
    the production path on TPU) against serial map().  Float32 chain-score
    rounding may in principle reorder equal-score chains; the assertion
    pins that the emitted hits are nevertheless identical -- any future
    divergence must be triaged for BSJ-call impact before weakening this."""
    genome, aligner = toy
    reads = _reads(rng, genome, batch)
    serial = [[_hit_key(h) for h in aligner.map(s)] for s in reads]
    aligner.force_device_chain = True
    try:
        device = [[_hit_key(h) for h in hits]
                  for hits in aligner.map_batch(reads)]
    finally:
        aligner.force_device_chain = False
    assert serial == device


def test_map_batch_short_mode(toy, rng):
    """Recovery-pass (short_mode) engine: same cross-path guarantee."""
    genome, _ = toy
    aligner = GenomeAligner(genome, short_mode=True)
    reads = []
    chrA = genome.seq("chrA", 0, genome.contig_len["chrA"])
    for _ in range(36):
        st = int(rng.integers(0, len(chrA) - 300))
        reads.append(mutate(rng, chrA[st:st + int(rng.integers(60, 150))],
                            sub=0.03, ins=0.02, dele=0.02))
    serial = [[_hit_key(h) for h in aligner.map(s)] for s in reads]
    batched = [[_hit_key(h) for h in hits]
               for hits in aligner.map_batch(reads)]
    assert serial == batched
