"""Parity: native whole-chunk selection+stitching
(native/nwcore.cpp::select_stitch_batch) vs the per-read Python path
(models/aligner.py::_select_and_stitch).

The selection loop decides WHICH chains become hits, their mapq (the
uniqueness model feeding mappy-compatible downstream filters) and their
order -- all of it must be byte-identical to the per-read path, not
merely equivalent (reference roles: minimap2 mm_set_parent/mm_mapq).
"""

import numpy as np
import pytest

from ciri_long_tpu.io.genome import Genome
from ciri_long_tpu.models.aligner import GenomeAligner
import ciri_long_tpu.models.aligner as aligner_mod

if aligner_mod._SELECT_NATIVE is None:
    pytest.skip("native select_stitch_batch unavailable",
                allow_module_level=True)

BASES = "ACGT"


def _mutate(rng, seq, sub=0.04, ind=0.02):
    out = []
    for ch in seq:
        r = rng.random()
        if r < ind / 2:
            continue
        if r < ind:
            out.append(BASES[rng.integers(0, 4)])
        if r < sub + ind:
            out.append(BASES[rng.integers(0, 4)])
        else:
            out.append(ch)
    return "".join(out)


def _revcomp(s):
    comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
    return "".join(comp[c] for c in reversed(s))


def _hits_equal(a, b):
    return (a.ctg == b.ctg and a.strand == b.strand and a.q_st == b.q_st
            and a.q_en == b.q_en and a.r_st == b.r_st and a.r_en == b.r_en
            and a.mlen == b.mlen and a.blen == b.blen and a.mapq == b.mapq
            and a.is_primary == b.is_primary and a.score == b.score
            and list(a.cigar) == list(b.cigar))


def _assert_batch_parity(al, reads, monkeypatch):
    hits_nat = al.map_batch(reads)
    monkeypatch.setenv('CIRI_NATIVE_SELECT', '0')
    hits_py = al.map_batch(reads)
    monkeypatch.delenv('CIRI_NATIVE_SELECT')
    checked = 0
    for bi, (hn_list, hp_list) in enumerate(zip(hits_nat, hits_py)):
        assert len(hn_list) == len(hp_list), f"read {bi}"
        for hn, hp in zip(hn_list, hp_list):
            assert _hits_equal(hn, hp), f"read {bi}: {hn}\n  vs {hp}"
        checked += len(hn_list)
    return checked


def test_select_native_matches_python(rng, monkeypatch):
    """Multi-exon plus/minus-strand reads over two contigs."""
    genome = Genome.from_dict(
        {f"chr{c + 1}": "".join(rng.choice(list(BASES), size=60_000))
         for c in range(2)})
    al = GenomeAligner(genome)
    contigs = list(genome.contig_len)

    reads = []
    for _ in range(60):
        ctg = contigs[int(rng.integers(0, len(contigs)))]
        off = genome.offsets[ctg]
        clen = genome.contig_len[ctg]
        nex = int(rng.integers(1, 4))
        pos = int(rng.integers(0, clen - 6000))
        parts = []
        for _ in range(nex):
            elen = int(rng.integers(80, 400))
            elen = min(elen, clen - pos - 1)
            s = "".join(BASES[c] for c in np.asarray(
                genome.codes[off + pos:off + pos + elen]))
            parts.append(_mutate(rng, s))
            pos += elen + int(rng.integers(40, 800))
            if pos >= clen - 500:
                break
        read = "".join(parts)
        if len(read) < al.k + 10:
            continue
        if rng.random() < 0.5:
            read = _revcomp(read)
        reads.append(read)

    checked = _assert_batch_parity(al, reads, monkeypatch)
    assert checked > 40


def test_select_native_repeats_and_chimeras(rng, monkeypatch):
    """Duplicated segments force masked candidates (mapq < 60 via the
    credit/sub_best path) and chimeric reads force multiple primaries;
    both must select and score identically."""
    base = "".join(rng.choice(list(BASES), size=40_000))
    seg = base[5_000:6_200]
    # plant the same segment at three loci (one on chr2) -> ambiguity
    gs = base[:20_000] + seg + base[20_000 + len(seg):]
    genome = Genome.from_dict({"chr1": gs, "chr2": seg + base[30_000:34_000]})
    al = GenomeAligner(genome)

    reads = []
    for _ in range(40):
        kind = rng.random()
        if kind < 0.5:
            st = int(rng.integers(0, len(seg) - 300))
            ln = int(rng.integers(250, len(seg) - st))
            reads.append(_mutate(rng, seg[st:st + ln]))
        else:
            # chimera: two distant loci glued together
            a = int(rng.integers(0, 15_000))
            b = int(rng.integers(24_000, 36_000))
            la = int(rng.integers(200, 600))
            lb = int(rng.integers(200, 600))
            left = gs[a:a + la]
            right = gs[b:b + lb]
            if rng.random() < 0.5:
                right = _revcomp(right)
            reads.append(_mutate(rng, left + right))

    checked = _assert_batch_parity(al, reads, monkeypatch)
    assert checked > 30
    # the fuzz must actually hit the masked-mapq path
    hits = [h for hl in al.map_batch(reads) for h in hl]
    assert any(h.mapq < 60 for h in hits)


def test_select_native_empty_and_tiny(rng, monkeypatch):
    genome = Genome.from_dict(
        {"chr1": "".join(rng.choice(list(BASES), size=20_000))})
    al = GenomeAligner(genome)
    s = "".join(BASES[c] for c in np.asarray(genome.codes[500:900]))
    reads = ["A", "ACGTACGT", "N" * 300, s]
    checked = _assert_batch_parity(al, reads, monkeypatch)
    assert checked >= 1
