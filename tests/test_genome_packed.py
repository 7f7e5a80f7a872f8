"""2-bit + N-interval genome storage (SURVEY §7 step 1).

The packed representation must be invisible through the Genome API and
through the aligner: identical seq()/codes_of()/codes_window() and
identical mapping results (the native stitcher and its Python oracle both
read decoded windows when the genome is packed)."""

import numpy as np
import pytest

from ciri_long_tpu.io.genome import Genome
from ciri_long_tpu.utils.seq import decode_seq, pack_codes, unpack_codes


def test_pack_roundtrip_fuzz(rng):
    for _ in range(40):
        L = int(rng.integers(1, 700))
        codes = rng.integers(0, 5, L).astype(np.int8)
        # salt in N runs
        for _ in range(int(rng.integers(0, 4))):
            s = int(rng.integers(0, L))
            e = min(L, s + int(rng.integers(1, 30)))
            codes[s:e] = 4
        packed, nint = pack_codes(codes)
        assert np.array_equal(unpack_codes(packed, nint, 0, L), codes)
        for _ in range(10):
            a = int(rng.integers(0, L + 1))
            b = int(rng.integers(a, L + 1))
            assert np.array_equal(unpack_codes(packed, nint, a, b),
                                  codes[a:b])


def _mk_genome(rng, forced_pack, monkeypatch):
    monkeypatch.setenv('CIRI_PACK_GENOME', '1' if forced_pack else '0')
    seqs = {}
    state = np.random.default_rng(7)
    for name, L in (('c1', 9000), ('c2', 4213)):
        s = "".join(state.choice(list("ACGT"), size=L))
        # an N island on c1
        if name == 'c1':
            s = s[:500] + 'N' * 37 + s[537:]
        seqs[name] = s
    return Genome.from_dict(seqs), seqs


def test_genome_api_parity(rng, monkeypatch):
    gp, seqs = _mk_genome(rng, True, monkeypatch)
    gu, _ = _mk_genome(rng, False, monkeypatch)
    assert gp.is_packed and not gu.is_packed
    for _ in range(60):
        ctg = 'c1' if rng.random() < 0.6 else 'c2'
        L = gp.contig_len[ctg]
        a = int(rng.integers(-20, L))
        b = int(rng.integers(a, L + 40))
        assert gp.seq(ctg, a, b) == gu.seq(ctg, a, b)
        assert np.array_equal(gp.codes_of(ctg, a, b), gu.codes_of(ctg, a, b))
    total = gp.total_len
    for _ in range(20):
        a = int(rng.integers(0, total))
        b = int(rng.integers(a, total + 10))
        assert np.array_equal(gp.codes_window(a, b), gu.codes_window(a, b))
    assert np.array_equal(gp.dense_codes(), gu.dense_codes())


def test_packed_cache_roundtrip(rng, tmp_path, monkeypatch):
    monkeypatch.setenv('CIRI_PACK_GENOME', '1')
    state = np.random.default_rng(3)
    seq = "".join(state.choice(list("ACGT"), size=6000))
    seq = seq[:100] + 'N' * 11 + seq[111:]
    fa = tmp_path / 'g.fa'
    fa.write_text('>cA\n{}\n'.format(seq))
    g = Genome(str(fa))
    assert g.is_packed
    g.save_cache(str(tmp_path / 'cache'))
    g2 = Genome.from_cache(str(tmp_path / 'cache'), str(fa))
    assert g2 is not None and g2.is_packed
    assert g2.seq('cA', 0, 6000) == g.seq('cA', 0, 6000)
    # unpacked genomes keep using the int8 cache format
    monkeypatch.setenv('CIRI_PACK_GENOME', '0')
    g3 = Genome(str(fa))
    g3.save_cache(str(tmp_path / 'cache2'))
    g4 = Genome.from_cache(str(tmp_path / 'cache2'), str(fa))
    assert g4 is not None and not g4.is_packed
    assert g4.seq('cA', 50, 150) == g.seq('cA', 50, 150)


def test_stale_cache_versions_rebuild(rng, tmp_path, monkeypatch):
    """Round-2 caches (genome fmt v1, index v1 / fixed 16-bit buckets)
    must be treated as stale -- loaders return None and callers rebuild,
    never misread the old layout."""
    import json

    from ciri_long_tpu.models.minimizer import MinimizerIndex

    monkeypatch.setenv('CIRI_PACK_GENOME', '0')
    state = np.random.default_rng(5)
    seq = "".join(state.choice(list("ACGT"), size=3000))
    fa = tmp_path / 'g.fa'
    fa.write_text('>c\n{}\n'.format(seq))
    g = Genome(str(fa))
    g.save_cache(str(tmp_path / 'gc'))
    # downgrade the meta to the round-2 version
    meta_p = tmp_path / 'gc' / 'meta.json'
    meta = json.loads(meta_p.read_text())
    meta['version'] = 1
    meta.pop('fmt', None)
    meta_p.write_text(json.dumps(meta))
    assert Genome.from_cache(str(tmp_path / 'gc'), str(fa)) is None

    idx = MinimizerIndex.build(g, k=15, w=10)
    fp = dict(ref='x', size=1, mtime=2)
    idx.save(str(tmp_path / 'ic'), fp)
    meta_p = tmp_path / 'ic' / 'meta.json'
    meta = json.loads(meta_p.read_text())
    meta['version'] = 1
    meta.pop('bucket_bits', None)
    meta_p.write_text(json.dumps(meta))
    assert MinimizerIndex.load(str(tmp_path / 'ic'), 15, 10, fp) is None


def test_aligner_parity_packed_vs_unpacked(rng, monkeypatch):
    """Full mapping parity: hits from a packed genome equal hits from the
    int8 genome, through BOTH the native stitcher and the Python oracle."""
    from ciri_long_tpu.models.aligner import GenomeAligner
    from ciri_long_tpu.utils.seq import revcomp

    state = np.random.default_rng(11)
    chr1 = "".join(state.choice(list("ACGT"), size=60000))
    reads = []
    for i in range(12):
        st = int(state.integers(0, 55000))
        ln = int(state.integers(500, 2500))
        s = chr1[st:st + ln]
        if i % 3 == 2:
            s = revcomp(s)
        reads.append(s)

    def hits_of(packed, native):
        monkeypatch.setenv('CIRI_PACK_GENOME', '1' if packed else '0')
        monkeypatch.setenv('CIRI_NATIVE_STITCH', '1' if native else '0')
        g = Genome.from_dict({'chr1': chr1})
        assert g.is_packed == packed
        al = GenomeAligner(g)
        out = []
        for s in reads:
            out.append([(h.ctg, h.strand, h.q_st, h.q_en, h.r_st, h.r_en,
                         h.mlen, h.blen, tuple(map(tuple, h.cigar)))
                        for h in al.map(s)])
        return out

    base = hits_of(False, True)
    assert hits_of(True, True) == base        # native stitcher, packed
    assert hits_of(True, False) == base       # python oracle, packed
