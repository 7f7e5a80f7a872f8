"""Annotated multi-exon circRNA end-to-end: spliced alignment across
introns, GTF splice-site index, annotated-signal BSJ correction, exon-level
isoform reconstruction, gene-level annotation, and the BED12 converter."""

import json
from types import SimpleNamespace

import numpy as np
import pytest

from ciri_long_tpu.tools.simulate import mutate, simulate_reads


def rand_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


# 0-based half-open exons of the planted circRNA (+ strand)
EXONS = [(5_000, 5_300), (7_300, 7_600), (9_600, 9_900)]


@pytest.fixture(scope="module")
def world(module_rng, tmp_path_factory):
    rng = module_rng
    root = tmp_path_factory.mktemp("annot")
    chr1 = list(rand_seq(rng, 40_000))
    # intron splice signals (GT donors after exon ends, AG acceptors before
    # exon starts)
    for (_, e_en), (n_st, _) in zip(EXONS[:-1], EXONS[1:]):
        chr1[e_en:e_en + 2] = list("GT")
        chr1[n_st - 2:n_st] = list("AG")
    # back-splice signals around the circRNA
    chr1[EXONS[-1][1]:EXONS[-1][1] + 2] = list("GT")
    chr1[EXONS[0][0] - 2:EXONS[0][0]] = list("AG")
    chr1 = "".join(chr1)

    ref = root / "genome.fa"
    with open(ref, "w") as f:
        f.write(">chr1\n")
        for i in range(0, len(chr1), 80):
            f.write(chr1[i:i + 80] + "\n")

    gtf = root / "anno.gtf"
    with open(gtf, "w") as f:
        attrs = 'gene_id "G1"; gene_name "TestG"; gene_type "protein_coding";'
        f.write('#comment\n')
        f.write('\t'.join(['chr1', 'test', 'gene', str(EXONS[0][0] + 1),
                           str(EXONS[-1][1]), '.', '+', '.', attrs]) + '\n')
        for st, en in EXONS:
            f.write('\t'.join([
                'chr1', 'test', 'exon', str(st + 1), str(en), '.', '+', '.',
                attrs + ' transcript_id "T1";']) + '\n')

    rng2 = np.random.default_rng(7)
    reads = root / "reads.fa"
    with open(reads, "w") as f:
        for read_id, seq, circ_id in simulate_reads(
                Genome_of(chr1), [("chr1", EXONS, '+')], rng2, depth=8,
                min_copies=3.0, max_copies=6.0, sub=0.02, ins=0.01, dele=0.01):
            f.write('>{}\n{}\n'.format(read_id, seq))
    return root, ref, gtf, reads


def Genome_of(chr1):
    from ciri_long_tpu.io.genome import Genome
    return Genome.from_dict({"chr1": chr1})


def test_annotated_call_collapse(world):
    from ciri_long_tpu.cli.main import call, collapse
    from ciri_long_tpu.tools.convert_bed import convert

    root, ref, gtf, reads = world
    out_dir = root / "out"
    args = SimpleNamespace(input=str(reads), output=str(out_dir),
                           reference=str(ref), prefix="anno", gtf=str(gtf),
                           circ=None, threads=2, debug=False)
    counts = call(args)
    assert counts['consensus'] >= 6
    assert counts['bsj'] >= 5
    assert counts['signal'] >= 4

    # cand_circ: multi-exon cirexons at the planted locus
    good = 0
    with open(out_dir / "anno.cand_circ.fa") as f:
        for line in f:
            header = line.rstrip().lstrip('>').split('\t')
            f.readline()
            circ_id, cirexons = header[1], header[3]
            ctg, span = circ_id.split(':')
            st, en = map(int, span.split('-'))
            if abs(st - (EXONS[0][0] + 1)) <= 10 and \
                    abs(en - EXONS[-1][1]) <= 10 and \
                    len(cirexons.split(',')) == 3:
                good += 1
    assert good >= 4

    # collapse with annotation
    lst = root / "samples.lst"
    lst.write_text("S1\t{}\n".format(out_dir / "anno.cand_circ.fa"))
    cargs = SimpleNamespace(input=str(lst), output=str(out_dir),
                            reference=str(ref), prefix="anno", gtf=str(gtf),
                            circ=None, threads=2, debug=False)
    circ_cnt, iso_cnt = collapse(cargs)
    assert circ_cnt == 1

    info = (out_dir / "anno.info").read_text().strip().split('\n')
    assert len(info) == 1
    fields = info[0].split('\t')
    assert int(fields[3]) == EXONS[0][0] + 1
    assert int(fields[4]) == EXONS[-1][1]
    assert fields[6] == '+'
    attr = fields[8]
    assert 'circ_type "exon"' in attr
    assert 'gene_id "G1"' in attr
    assert 'gene_name "TestG"' in attr
    assert 'isoform "' in attr
    # the major isoform must be the 3-exon structure
    iso = attr.split('isoform "')[1].split('"')[0]
    major = iso.split('|')[0]
    exp = ','.join('{}-{}'.format(st + 1, en) for st, en in EXONS)
    assert major == exp, (major, exp)

    # BED12 conversion (misc/convert_bed.py parity)
    bed = root / "out.bed"
    convert(str(out_dir / "anno.info"), str(bed))
    rows = bed.read_text().strip().split('\n')
    assert len(rows) >= 1
    cols = rows[0].split('\t')
    assert cols[0] == 'chr1'
    assert int(cols[9]) == 3         # blockCount
    sizes = [int(x) for x in cols[10].split(',')]
    # reference convert_bed computes blockSize = en - st on the 1-based
    # inclusive isoform coords (misc/convert_bed.py:29), i.e. length - 1
    assert sizes == [en - st - 1 for st, en in EXONS]
