"""Additional end-to-end coverage: minus-strand circRNAs and multi-sample
collapse (expression matrix across samples, collapse.py:968-986)."""

import shutil
from types import SimpleNamespace

import numpy as np
import pytest

from ciri_long_tpu.utils.seq import revcomp
from tests.test_pipeline_call import make_rolling_read
from tests.test_e2e import rand_seq

CIRC_START, CIRC_END = 15_000, 15_450


@pytest.fixture(scope="module")
def minus_world(module_rng, tmp_path_factory):
    rng = module_rng
    root = tmp_path_factory.mktemp("minus")
    chr1 = list(rand_seq(rng, 40_000))
    # canonical GT-AG signals for a '-' strand circRNA: the de novo scan
    # probes genome[start-2:start] == 'AC' and genome[end:end+2] == 'CT'
    chr1[CIRC_START - 2:CIRC_START] = list("AC")
    chr1[CIRC_END:CIRC_END + 2] = list("CT")
    chr1 = "".join(chr1)
    unit_plus = chr1[CIRC_START:CIRC_END]
    unit = revcomp(unit_plus)          # the transcribed circular unit

    ref = root / "genome.fa"
    with open(ref, "w") as f:
        f.write(">chr1\n{}\n".format(chr1))

    reads = root / "reads.fa"
    with open(reads, "w") as f:
        for i in range(8):
            rot = (i * 71) % len(unit)
            read = make_rolling_read(rng, unit, copies=3.4 + 0.3 * i,
                                     rot=rot, noise=0.02)
            f.write(">m_read_{}\n{}\n".format(i, read))
    return root, ref, reads


def test_minus_strand_call(minus_world):
    from ciri_long_tpu.cli.main import call

    root, ref, reads = minus_world
    out_dir = root / "out"
    args = SimpleNamespace(input=str(reads), output=str(out_dir),
                           reference=str(ref), prefix="minus", gtf=None,
                           circ=None, threads=2, debug=False)
    counts = call(args)
    assert counts['bsj'] >= 5

    minus_called = 0
    with open(out_dir / "minus.cand_circ.fa") as f:
        for line in f:
            header = line.rstrip().lstrip('>').split('\t')
            f.readline()
            circ_id, strand = header[1], header[2]
            ctg, span = circ_id.split(':')
            st, en = map(int, span.split('-'))
            assert abs(st - (CIRC_START + 1)) <= 30
            assert abs(en - CIRC_END) <= 30
            if strand == '-':
                minus_called += 1
    assert minus_called >= 4


def test_partial_raw_read_path(rng, tmp_path_factory):
    """A ~1.2-copy read has no CCS; the raw-read pass must call it as a
    partial BSJ into low_confidence.fa (find_bsj.py:499-620)."""
    from ciri_long_tpu.cli.main import call

    root = tmp_path_factory.mktemp("partial")
    chr1 = list(rand_seq(rng, 30_000))
    st, en = 12_000, 12_600
    chr1[st - 2:st] = list("AG")
    chr1[en:en + 2] = list("GT")
    chr1 = "".join(chr1)
    unit = chr1[st:en]
    ref = root / "genome.fa"
    ref.write_text(">chr1\n{}\n".format(chr1))

    reads = root / "reads.fa"
    with open(reads, "w") as f:
        # exactly one rotated circle: two chimeric arms around the BSJ
        for i, cut in enumerate((100, 200, 310)):
            read = unit[cut:] + unit[:cut]
            f.write(">p_read_{}\n{}\n".format(i, read))
    out_dir = root / "out"
    args = SimpleNamespace(input=str(reads), output=str(out_dir),
                           reference=str(ref), prefix="part", gtf=None,
                           circ=None, threads=2, debug=False)
    counts = call(args)
    assert counts['partial'] >= 2

    lc = (out_dir / "part.low_confidence.fa").read_text().strip().split('\n')
    recs = [lc[i].lstrip('>').split('\t') for i in range(0, len(lc), 2)]
    for rec in recs:
        circ_id, segments = rec[1], rec[6]
        assert segments == 'partial'
        ctg, span = circ_id.split(':')
        s, e = map(int, span.split('-'))
        assert abs(s - (st + 1)) <= 15 and abs(e - en) <= 15


def test_multi_sample_collapse(rng, tmp_path_factory):
    """Two samples sharing one circRNA: per-sample expression columns."""
    from ciri_long_tpu.cli.main import call, collapse

    root = tmp_path_factory.mktemp("multi")
    chr1 = list(rand_seq(rng, 30_000))
    st, en = 10_000, 10_400
    chr1[st - 2:st] = list("AG")
    chr1[en:en + 2] = list("GT")
    chr1 = "".join(chr1)
    unit = chr1[st:en]
    ref = root / "genome.fa"
    ref.write_text(">chr1\n{}\n".format(chr1))

    reads = root / "reads.fa"
    with open(reads, "w") as f:
        for i in range(6):
            read = make_rolling_read(rng, unit, copies=3.5 + 0.4 * i,
                                     rot=(i * 61) % len(unit), noise=0.02)
            f.write(">s1_read_{}\n{}\n".format(i, read))
    out_dir = root / "out"
    args = SimpleNamespace(input=str(reads), output=str(out_dir),
                           reference=str(ref), prefix="s1", gtf=None,
                           circ=None, threads=2, debug=False)
    counts = call(args)
    assert counts['bsj'] >= 4

    # fabricate sample 2 from sample 1 with renamed reads
    cand1 = out_dir / "s1.cand_circ.fa"
    cand2 = out_dir / "s2.cand_circ.fa"
    cand2.write_text(cand1.read_text().replace('s1_read', 's2_read'))
    lc1 = out_dir / "s1.low_confidence.fa"
    (out_dir / "s2.low_confidence.fa").write_text(
        lc1.read_text() if lc1.exists() else "")

    lst = root / "samples.lst"
    lst.write_text("SAMPLE_A\t{}\nSAMPLE_B\t{}\n".format(cand1, cand2))
    cargs = SimpleNamespace(input=str(lst), output=str(out_dir),
                            reference=str(ref), prefix="multi", gtf=None,
                            circ=None, threads=2, debug=False)
    circ_cnt, iso_cnt = collapse(cargs)
    assert circ_cnt == 1

    exp = (out_dir / "multi.expression").read_text().strip().split('\n')
    header = exp[0].split('\t')
    assert set(header[1:]) == {"SAMPLE_A", "SAMPLE_B"}
    vals = exp[1].split('\t')
    a = float(vals[header.index("SAMPLE_A")])
    b = float(vals[header.index("SAMPLE_B")])
    assert a >= 3 and b >= 3

    iso = (out_dir / "multi.isoforms").read_text().strip().split('\n')
    assert len(iso) >= 2
    # isoform usage is a per-sample fraction in [0, 1]
    for row in iso[1:]:
        for v in row.split('\t')[1:]:
            assert 0.0 <= float(v) <= 1.0


def test_four_sample_cohort_collapse(rng, tmp_path_factory):
    """4-sample cohort (SURVEY §6 measurement point: cohort configs incl.
    4+ samples): two loci with sample-specific presence; the expression
    matrix must carry one column per sample with zeros where a sample
    lacks the circRNA (reference collapse.py:968-972 exp format)."""
    from ciri_long_tpu.cli.main import call, collapse

    root = tmp_path_factory.mktemp("cohort4")
    chr1 = list(rand_seq(rng, 40_000))
    loci = [(10_000, 10_400), (25_000, 25_520)]
    for st, en in loci:
        chr1[st - 2:st] = list("AG")
        chr1[en:en + 2] = list("GT")
    chr1 = "".join(chr1)
    ref = root / "genome.fa"
    ref.write_text(">chr1\n{}\n".format(chr1))
    out_dir = root / "out"

    # sample A: locus 0 only; sample B: both loci (separate call runs)
    def run_sample(name, which):
        reads = root / ("%s.fa" % name)
        with open(reads, "w") as f:
            for li in which:
                st, en = loci[li]
                unit = chr1[st:en]
                for i in range(5):
                    read = make_rolling_read(
                        rng, unit, copies=3.4 + 0.3 * i,
                        rot=(i * 67) % len(unit), noise=0.02)
                    f.write(">{}_l{}_r{}\n{}\n".format(name, li, i, read))
        args = SimpleNamespace(input=str(reads), output=str(out_dir),
                               reference=str(ref), prefix=name, gtf=None,
                               circ=None, threads=1, debug=True)
        counts = call(args)
        assert counts['bsj'] >= 3 * len(which)

    run_sample("sA", [0])
    run_sample("sB", [0, 1])
    # samples C/D: renamed copies of A and B (distinct cohort members)
    for src, dst in (("sA", "sC"), ("sB", "sD")):
        (out_dir / ("%s.cand_circ.fa" % dst)).write_text(
            (out_dir / ("%s.cand_circ.fa" % src)).read_text()
            .replace(src + "_", dst + "_"))
        (out_dir / ("%s.low_confidence.fa" % dst)).write_text("")

    lst = root / "samples.lst"
    lst.write_text("".join("{}\t{}\n".format(
        s, out_dir / ("%s.cand_circ.fa" % s)) for s in
        ("sA", "sB", "sC", "sD")))
    cargs = SimpleNamespace(input=str(lst), output=str(out_dir),
                            reference=str(ref), prefix="cohort", gtf=None,
                            circ=None, threads=2, debug=False)
    circ_cnt, iso_cnt = collapse(cargs)
    assert circ_cnt == 2

    exp = (out_dir / "cohort.expression").read_text().strip().split('\n')
    header = exp[0].split('\t')
    assert set(header[1:]) == {"sA", "sB", "sC", "sD"}
    by_circ = {row.split('\t')[0]: row.split('\t') for row in exp[1:]}
    assert len(by_circ) == 2
    for circ_id, row in by_circ.items():
        st = int(circ_id.split(':')[1].split('-')[0])
        vals = {h: float(v) for h, v in zip(header[1:], row[1:])}
        if abs(st - (loci[1][0] + 1)) <= 15:     # locus 1: only B and D
            assert vals["sA"] == 0 and vals["sC"] == 0
            assert vals["sB"] >= 3 and vals["sD"] >= 3
        else:                                    # locus 0: all samples
            assert min(vals.values()) >= 3
