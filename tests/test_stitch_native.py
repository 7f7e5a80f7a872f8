"""Parity: native chain stitcher (native/nwcore.cpp::stitch) vs the Python
path it replaces (models/aligner.py::_stitch_py).

The stitcher decides cigars / extents / mlen for every hit, which feed the
mlen-ratio keep/drop filters (reference find_bsj.py:243-246) and the
byte-exact cand_circ.fa records -- so the native path must be identical,
not merely equivalent.
"""

import numpy as np
import pytest

from ciri_long_tpu.io.genome import Genome
from ciri_long_tpu.models.aligner import GenomeAligner
import ciri_long_tpu.models.aligner as aligner_mod

if aligner_mod._STITCH_NATIVE is None:
    pytest.skip("native stitch unavailable", allow_module_level=True)

BASES = "ACGT"


def _rand_genome(rng, n=60_000, contigs=2):
    return Genome.from_dict(
        {f"chr{c + 1}": "".join(rng.choice(list(BASES), size=n))
         for c in range(contigs)})


def _mutate(rng, seq, sub=0.05, ind=0.02):
    out = []
    for ch in seq:
        r = rng.random()
        if r < ind / 2:
            continue                              # deletion
        if r < ind:
            out.append(BASES[rng.integers(0, 4)])  # insertion
        if r < sub + ind:
            out.append(BASES[rng.integers(0, 4)])  # substitution
        else:
            out.append(ch)
    return "".join(out)


def _hits_equal(a, b):
    if a is None or b is None:
        return a is b
    return (a.ctg == b.ctg and a.strand == b.strand and a.q_st == b.q_st
            and a.q_en == b.q_en and a.r_st == b.r_st and a.r_en == b.r_en
            and a.mlen == b.mlen and a.blen == b.blen
            and list(a.cigar) == list(b.cigar))


def test_stitch_native_matches_python(rng, monkeypatch):
    genome = _rand_genome(rng)
    al = GenomeAligner(genome)
    contigs = list(genome.contig_len)

    checked = 0
    for trial in range(120):
        ctg = contigs[int(rng.integers(0, len(contigs)))]
        off = genome.offsets[ctg]
        clen = genome.contig_len[ctg]
        # build a read: 1-3 "exons" separated by intron-sized ref gaps,
        # with indel/substitution noise (exercises the splice path, the
        # gap NW and both end extensions)
        nex = int(rng.integers(1, 4))
        pos = int(rng.integers(0, clen - 6000))
        parts = []
        spans = []
        for _ in range(nex):
            elen = int(rng.integers(80, 400))
            elen = min(elen, clen - pos - 1)
            spans.append((pos, pos + elen))
            s = "".join(BASES[c] for c in np.asarray(
                genome.codes[off + pos:off + pos + elen]))
            parts.append(_mutate(rng, s))
            pos += elen + int(rng.integers(40, 800))   # intron
            if pos >= clen - 500:
                break
        read = "".join(parts)
        if len(read) < al.k + 10:
            continue

        hits_nat = al.map(read)
        monkeypatch.setenv('CIRI_NATIVE_STITCH', '0')
        hits_py = al.map(read)
        monkeypatch.delenv('CIRI_NATIVE_STITCH')

        assert len(hits_nat) == len(hits_py), f"trial {trial}"
        for hn, hp in zip(hits_nat, hits_py):
            assert _hits_equal(hn, hp), (
                f"trial {trial}: {hn}\n  vs {hp}")
        checked += len(hits_nat)
    assert checked > 60  # the fuzz actually exercised the stitcher


def test_stitch_native_short_mode(rng, monkeypatch):
    genome = _rand_genome(rng, n=30_000, contigs=1)
    al = GenomeAligner(genome, short_mode=True)
    off = genome.offsets["chr1"]
    checked = 0
    for _ in range(60):
        pos = int(rng.integers(0, 29_000))
        elen = int(rng.integers(60, 160))
        s = "".join(BASES[c] for c in np.asarray(
            genome.codes[off + pos:off + pos + elen]))
        read = _mutate(rng, s)
        hits_nat = al.map(read)
        monkeypatch.setenv('CIRI_NATIVE_STITCH', '0')
        hits_py = al.map(read)
        monkeypatch.delenv('CIRI_NATIVE_STITCH')
        assert len(hits_nat) == len(hits_py)
        for hn, hp in zip(hits_nat, hits_py):
            assert _hits_equal(hn, hp)
        checked += len(hits_nat)
    assert checked > 30
