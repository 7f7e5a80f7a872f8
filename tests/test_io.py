"""IO layer tests: fastx streaming, genome packing, native codec parity."""

import gzip
import os

import numpy as np
import pytest

from ciri_long_tpu.io.fastx import read_fastx
from ciri_long_tpu.io.genome import Genome
from ciri_long_tpu.utils.seq import (compress_seq, decode_seq, encode_seq,
                                     get_junc_seq, revcomp, revcomp_encoded,
                                     transform_seq)


def test_encode_decode_roundtrip():
    s = "ACGTNACGT"
    codes = encode_seq(s)
    assert list(codes) == [0, 1, 2, 3, 4, 0, 1, 2, 3]
    assert decode_seq(codes) == s
    assert decode_seq(revcomp_encoded(codes)) == "ACGTNACGT"[::-1].translate(
        str.maketrans("ACGT", "TGCA"))


def test_revcomp_matches_reference_convention():
    # reference translates only ATCG; N passes through (utils.py:118-120)
    assert revcomp("ACGTN") == "NACGT"
    assert revcomp("AATT") == "AATT"
    assert revcomp("GC") == "GC"


def test_seq_utils():
    assert transform_seq("ABCDEF", 2) == "CDEFAB"
    assert compress_seq("AAACCGGT") == "ACGT"
    assert get_junc_seq("ABCDEFGHIJ", 5, 2) == "DEFG"
    # wraparound
    assert get_junc_seq("ABCDEFGHIJ", 1, 3) == "IJABCD"


def test_fastx_reader(tmp_path):
    fa = tmp_path / "x.fa"
    fa.write_text(">r1 extra\nACGT\nACGT\n>r2\nTTTT\n")
    recs = list(read_fastx(str(fa)))
    assert recs == [("r1", "ACGTACGT"), ("r2", "TTTT")]

    fq = tmp_path / "x.fq.gz"
    with gzip.open(fq, "wt") as f:
        f.write("@q1 d\nACGT\n+\n!!!!\n@q2\nGGGG\n+\n!!!!\n")
    recs = list(read_fastx(str(fq)))
    assert recs == [("q1", "ACGT"), ("q2", "GGGG")]


def test_genome_load_and_fetch(tmp_path):
    fa = tmp_path / "g.fa"
    fa.write_text(">c1\nACGTACGTAC\n>c2 desc\nTTTTGGGG\n")
    g = Genome(str(fa))
    assert g.names == ["c1", "c2"]
    assert g.contig_len == {"c1": 10, "c2": 8}
    assert g.seq("c1", 2, 6) == "GTAC"
    assert g.seq("c2", 0, 4) == "TTTT"
    assert g.seq("missing", 0, 4) is None
    assert g.locate(g.global_pos("c2", 3)) == ("c2", 3)
    # clamping
    assert g.seq("c1", -5, 100) == "ACGTACGTAC"


def test_native_codec_parity(tmp_path):
    fx = pytest.importorskip("ciri_long_tpu._fastxcodec")
    s = "ACGTNRYacgtn"
    np.testing.assert_array_equal(
        np.frombuffer(fx.encode(s.encode()), np.int8), encode_seq(s))

    fa = tmp_path / "n.fa.gz"
    with gzip.open(fa, "wt") as f:
        f.write(">a 1\nACGT\nGG\n>b\nNNN\n")
    recs = fx.parse_fastx(str(fa))
    assert recs[0][0] == b"a" and recs[0][2] == b"ACGTGG"
    assert list(np.frombuffer(recs[1][1], np.int8)) == [4, 4, 4]

    # Genome loader should produce identical state through either path
    g = Genome(str(fa))
    assert g.seq("a", 0, 6) == "ACGTGG"


def test_index_circ_bed(tmp_path):
    from ciri_long_tpu.annot.gtf import index_circ
    bed = tmp_path / "circ.bed"
    bed.write_text("chr1\t100\t500\t+\nchr1\tbroken\tx\t+\nchr2\t50\t90\t-\n")
    idx = index_circ(str(bed), None)
    assert idx['chr1'][100]['+']['start'] == 1
    assert idx['chr1'][500]['+']['end'] == 1
    assert idx['chr2'][50]['-']['start'] == 1


def test_index_circ_gtf(tmp_path):
    from ciri_long_tpu.annot.gtf import index_circ
    gtf = tmp_path / "circ.gtf"
    gtf.write_text('chr3\tx\tcircRNA\t10\t90\t.\t-\t.\tcirc_id "c";\n')
    idx = index_circ(str(gtf), None)
    assert idx['chr3'][10]['-']['start'] == 1
    assert idx['chr3'][90]['-']['end'] == 1


def test_genome_cache_roundtrip(rng, tmp_path):
    """Packed-genome mmap cache: identical names/offsets/codes via cache,
    string/codes APIs work over the memmap, stale caches rebuild."""
    import os
    import time
    from ciri_long_tpu.io.genome import Genome

    g = "".join(rng.choice(list("ACGTN"), 5_000))
    ref = tmp_path / "g.fa"
    ref.write_text(">a\n{}\n>b\n{}\n".format(g[:3_000], g[3_000:]))
    g1 = Genome(str(ref))
    cdir = str(tmp_path / "gcodes")
    g1.save_cache(cdir)
    g2 = Genome.from_cache(cdir, str(ref))
    assert g2 is not None and isinstance(g2.codes, np.memmap)
    assert g2.names == g1.names
    assert g2.offsets == g1.offsets and g2.contig_len == g1.contig_len
    np.testing.assert_array_equal(np.asarray(g2.codes), g1.codes)
    assert g2.seq('a', 10, 50) == g1.seq('a', 10, 50)
    assert g2.locate(g1.global_pos('b', 7)) == ('b', 7)

    t = time.time() + 5
    os.utime(ref, (t, t))
    assert Genome.from_cache(cdir, str(ref)) is None
