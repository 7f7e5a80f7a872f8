"""Seed-chain-extend aligner tests against a synthetic genome (replaces
minimap2/mappy + BWA roles, reference find_bsj.py:336,457,659)."""

import numpy as np
import pytest

from ciri_long_tpu.io.genome import Genome
from ciri_long_tpu.models.aligner import GenomeAligner
from ciri_long_tpu.models.hits import get_blocks, get_primary_alignment
from ciri_long_tpu.utils.seq import revcomp
from tests.test_poa import mutate


def rand_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


@pytest.fixture(scope="module")
def toy(module_rng):
    rng = module_rng
    chr1 = rand_seq(rng, 60_000)
    chr2 = rand_seq(rng, 20_000)
    genome = Genome.from_dict({"chr1": chr1, "chr2": chr2})
    aligner = GenomeAligner(genome)
    return genome, aligner, chr1, chr2


def test_exact_substring(toy):
    genome, aligner, chr1, chr2 = toy
    read = chr1[10_000:10_500]
    hits = aligner.map(read)
    assert hits
    h = hits[0]
    assert h.ctg == "chr1" and h.strand == 1
    assert h.q_st == 0 and h.q_en == 500
    assert h.r_st == 10_000 and h.r_en == 10_500
    assert h.mlen == 500
    assert h.cigar == [(500, 0)]
    assert h.is_primary


def test_revcomp_read(toy):
    genome, aligner, chr1, chr2 = toy
    read = revcomp(chr1[20_000:20_400])
    hits = aligner.map(read)
    assert hits
    h = hits[0]
    assert h.ctg == "chr1" and h.strand == -1
    assert h.r_st == 20_000 and h.r_en == 20_400
    assert h.q_st == 0 and h.q_en == 400
    assert h.mlen == 400


def test_noisy_read(toy, rng):
    genome, aligner, chr1, chr2 = toy
    read = mutate(rng, chr1[30_000:31_000], sub=0.04, ins=0.03, dele=0.03)
    hits = aligner.map(read)
    assert hits
    h = hits[0]
    assert h.ctg == "chr1"
    assert h.q_st <= 20 and h.q_en >= len(read) - 20
    assert abs(h.r_st - 30_000) <= 20 and abs(h.r_en - 31_000) <= 20
    assert h.mlen >= 0.75 * len(read)


def test_spliced_read(toy, rng):
    genome, aligner, chr1, chr2 = toy
    exon1 = chr1[5_000:5_300]
    exon2 = chr1[7_300:7_600]
    read = exon1 + exon2
    hits = aligner.map(read)
    assert hits
    h = hits[0]
    assert h.ctg == "chr1"
    assert h.r_st == 5_000 and h.r_en == 7_600
    blocks = get_blocks(h)
    assert len(blocks) == 2
    assert abs(blocks[0][0] - 5_000) <= 2 and abs(blocks[0][1] - 5_300) <= 10
    assert abs(blocks[1][0] - 7_300) <= 10 and abs(blocks[1][1] - 7_600) <= 2
    n_ops = [l for l, op in h.cigar if op == 3]
    assert len(n_ops) == 1 and abs(n_ops[0] - 2_000) <= 20


def test_second_contig(toy):
    genome, aligner, chr1, chr2 = toy
    read = chr2[3_000:3_600]
    hits = aligner.map(read)
    assert hits
    h = hits[0]
    assert h.ctg == "chr2"
    assert h.r_st == 3_000 and h.r_en == 3_600


def test_unmappable_read(toy, rng):
    genome, aligner, chr1, chr2 = toy
    read = rand_seq(rng, 500)
    hits = aligner.map(read)
    # a random 500-mer almost surely has no credible chain
    assert not hits or hits[0].mlen < 100


def test_chimeric_read_two_primary_hits(toy):
    """Two distant arms -> two primary hits (scan_raw_chunk geometry,
    find_bsj.py:528-539)."""
    genome, aligner, chr1, chr2 = toy
    arm1 = chr1[40_000:40_400]
    arm2 = chr1[45_000:45_400]
    read = arm2 + arm1  # tail precedes head on the genome: circ-like
    hits = aligner.map(read)
    assert len(hits) >= 2
    spans = sorted((h.r_st, h.r_en) for h in hits[:2])
    assert abs(spans[0][0] - 40_000) <= 20 and abs(spans[1][0] - 45_000) <= 20


def test_get_primary_alignment_roundtrip(toy):
    genome, aligner, chr1, chr2 = toy
    read = chr1[12_000:12_800]
    hit = get_primary_alignment(aligner.map(read))
    assert hit is not None
    assert hit.r_st == 12_000 and hit.r_en == 12_800


def test_short_mode(toy):
    genome, _, chr1, chr2 = toy
    short_aligner = GenomeAligner(genome, short_mode=True)
    read = chr1[8_000:8_090]   # 90 bp, below the long-mode comfort zone
    hits = short_aligner.map(read)
    assert hits
    h = hits[0]
    assert h.ctg == "chr1" and h.r_st == 8_000 and h.r_en == 8_090


def test_map_batch_matches_map(toy, rng):
    genome, aligner, chr1, chr2 = toy
    reads = [
        chr1[10_000:10_500],
        revcomp(chr1[20_000:20_400]),
        mutate(rng, chr1[30_000:31_000], sub=0.04, ins=0.02, dele=0.02),
        "ACGT",                      # below k: no hits
        chr2[3_000:3_600],
        chr1[5_000:5_300] + chr1[7_300:7_600],   # spliced
    ]
    batched = aligner.map_batch(reads)
    for read, hits_b in zip(reads, batched):
        hits_s = aligner.map(read)
        assert len(hits_b) == len(hits_s), read[:30]
        for hb, hs in zip(hits_b, hits_s):
            assert (hb.ctg, hb.strand, hb.q_st, hb.q_en, hb.r_st, hb.r_en,
                    hb.mlen) == \
                (hs.ctg, hs.strand, hs.q_st, hs.q_en, hs.r_st, hs.r_en,
                 hs.mlen)


def test_mapq_unique_vs_repeat(rng):
    """minimap2-style mapq model (mm_mapq analog): a unique placement
    keeps mapq 60; a read from a duplicated segment is discounted by the
    masked competitor chain (VERDICT r1 missing-5)."""
    body = rand_seq(rng, 30_000)
    repeat = rand_seq(rng, 600)
    chr1 = body[:8_000] + repeat + body[8_000:20_000] + repeat + body[20_000:]
    genome = Genome.from_dict({"chr1": chr1})
    aligner = GenomeAligner(genome)

    unique = aligner.map(chr1[25_000 + 600:25_600 + 600])
    assert unique and unique[0].mapq == 60

    dup = aligner.map(repeat)
    assert dup and dup[0].is_primary
    assert dup[0].mapq < 10       # two equal placements: near-zero mapq


def test_secondary_hits_on_request(rng):
    """map(secondary=True) reports the masked alternative placement with
    is_primary=0 and mapq 0 (mappy's secondary-alignment surface); the
    default call stays primary-only so pipeline semantics are unchanged."""
    body = rand_seq(rng, 30_000)
    repeat = rand_seq(rng, 600)
    chr1 = body[:8_000] + repeat + body[8_000:20_000] + repeat + body[20_000:]
    genome = Genome.from_dict({"chr1": chr1})
    aligner = GenomeAligner(genome)

    primary_only = aligner.map(repeat)
    assert all(h.is_primary for h in primary_only)

    with_sec = aligner.map(repeat, secondary=True)
    secs = [h for h in with_sec if not h.is_primary]
    assert secs, "expected a secondary hit at the duplicate placement"
    assert all(h.mapq == 0 for h in secs)
    prim = [h for h in with_sec if h.is_primary]
    assert [str(h.__dict__ if hasattr(h, '__dict__') else
               [getattr(h, s) for s in h.__slots__]) for h in prim] == \
           [str([getattr(h, s) for s in h.__slots__]) for h in primary_only]
    # the two placements cover the same read span at different loci
    assert abs(secs[0].r_st - prim[0].r_st) > 5_000


def test_chimeric_two_primaries(rng):
    """A chimeric read (two distant segments) yields two primary hits,
    both with high mapq -- the geometry scan_raw_chunk keys on
    (reference find_bsj.py:515-581)."""
    chr1 = rand_seq(rng, 40_000)
    genome = Genome.from_dict({"chr1": chr1})
    aligner = GenomeAligner(genome)
    # BSJ-style geometry: the later genome segment comes FIRST on the
    # read, so no colinear spliced chain exists and two split primaries
    # must be reported
    read = chr1[30_000:30_700] + chr1[5_000:5_700]
    hits = aligner.map(read)
    prim = [h for h in hits if h.is_primary]
    assert len(prim) == 2
    assert all(h.mapq == 60 for h in prim)
    assert {h.r_st for h in prim} == {5_000, 30_000}
    assert {(h.q_st, h.q_en) for h in prim} == {(0, 700), (700, 1400)}


def test_index_cache_roundtrip(rng, tmp_path):
    """Mmap index cache (the minimap2 .mmi role): cached loads reproduce
    the built table exactly, stale fingerprints rebuild, and mapping
    through a cached index is byte-identical."""
    import os
    import time
    from ciri_long_tpu.io.genome import Genome
    from ciri_long_tpu.models.aligner import GenomeAligner
    from ciri_long_tpu.models.minimizer import MinimizerIndex
    from ciri_long_tpu.utils.seq import encode_seq

    g = "".join(rng.choice(list("ACGT"), 60_000))
    ref = tmp_path / "g.fa"
    ref.write_text(">c1\n{}\n>c2\n{}\n".format(g[:40_000], g[40_000:]))
    genome = Genome(str(ref))
    cache = str(tmp_path / "minidx")

    a1 = GenomeAligner(genome, index_cache=cache)      # builds + saves
    assert os.path.isdir(cache)
    a2 = GenomeAligner(genome, index_cache=cache)      # mmap load
    for f in ('codes', 'pos', 'strand', 'buckets'):
        np.testing.assert_array_equal(getattr(a1.index, f),
                                      getattr(a2.index, f))
    assert isinstance(a2.index.codes, np.memmap)

    read = g[5_000:6_500]
    h1 = a1.map(read)
    h2 = a2.map(read)
    key = ('ctg', 'r_st', 'r_en', 'q_st', 'q_en', 'strand', 'mlen',
           'blen', 'mapq', 'cigar')
    assert [[getattr(h, f, None) for f in key] for h in h1] == \
        [[getattr(h, f, None) for f in key] for h in h2]
    assert len(h1) >= 1

    # wrong k/w -> rebuild, not a bogus load
    a3 = GenomeAligner(genome, short_mode=True, index_cache=cache)
    assert not isinstance(a3.index.codes, np.memmap)

    # stale fingerprint (touch the fasta) -> rebuild + fresh save
    t = time.time() + 5
    os.utime(ref, (t, t))
    genome2 = Genome(str(ref))
    a4 = GenomeAligner(genome2, index_cache=cache)
    assert not isinstance(a4.index.codes, np.memmap)
    a5 = GenomeAligner(genome2, index_cache=cache)
    assert isinstance(a5.index.codes, np.memmap)
