"""Intronic circRNA (lariat) classification and circ_attr gene annotation
(reference collapse.py:314-352, 1019-1138)."""

import numpy as np
import pytest

from ciri_long_tpu.annot.gtf import index_annotation
from ciri_long_tpu.context import Context
from ciri_long_tpu.io.genome import Genome
from ciri_long_tpu.pipeline.collapse import READ, circ_attr, correct_cluster


def rand_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


@pytest.fixture()
def gene_world(rng, tmp_path):
    """Two-exon gene; the intron hosts a lariat-derived circRNA."""
    chr1 = list(rand_seq(rng, 12_000))
    # gene: exon1 [1000,1200), exon2 [5000,5200) (0-based half open)
    # scrub G/A near the lariat BSJ so no chance GT-AG pair rescues it
    i_st, i_en = 1_200, 5_000          # intron (0-based)
    bp = 4_960                          # lariat branchpoint (circ end)
    # different letters per region: identical scrub letters would create
    # BSJ homology (free-sliding) and widen the de novo search window
    for p in list(range(i_st - 14, i_st + 14)) + list(range(i_en - 14, i_en + 14)):
        chr1[p] = 'C'
    for p in range(bp - 14, bp + 14):
        chr1[p] = 'T'
    chr1 = "".join(chr1)
    genome = Genome.from_dict({"chr1": chr1})

    gtf = tmp_path / "g.gtf"
    attrs = 'gene_id "G9"; gene_name "LariatG"; gene_type "lncRNA";'
    rows = [
        ['chr1', 't', 'gene', '1001', '5200', '.', '+', '.', attrs],
        ['chr1', 't', 'exon', '1001', '1200', '.', '+', '.',
         attrs + ' transcript_id "T9";'],
        ['chr1', 't', 'exon', '5001', '5200', '.', '+', '.',
         attrs + ' transcript_id "T9";'],
    ]
    gtf.write_text("".join('\t'.join(r) + '\n' for r in rows))
    gtf_idx, intron_idx, ss_idx = index_annotation(str(gtf))
    ctx = Context(genome=genome, gtf_index=gtf_idx, intron_index=intron_idx,
                  ss_index=ss_idx)
    return ctx, chr1, (i_st, i_en)


def test_lariat_classification(gene_world):
    ctx, chr1, (i_st, i_en) = gene_world
    # a lariat circle runs from the intron's donor to the BRANCHPOINT
    # (upstream of the acceptor), so the downstream end is unannotated and
    # the annotated/canonical passes fail -> lariat logic takes over
    bp = 4_960
    unit = chr1[1_200:bp]
    circ_id = 'chr1:{}-{}'.format(1_201, bp)
    cirexon = '{}-{}|{}'.format(1_201, bp, bp - 1_200)
    cluster = [READ('r%d' % i, circ_id, '+', cirexon, 'NA', '0|0-100', 'seg',
                    unit, 'S', 'full') for i in range(3)]
    ret = correct_cluster(ctx, cluster)
    assert ret is not None
    circ_type, attr = ret
    assert circ_type in ('High confidence lariat', 'Denovo signal',
                         'Unknown signal')
    # with the scrubbed signal region the lariat path must win
    assert circ_type == 'High confidence lariat'
    assert attr[5] == 'lariat'        # ss_id


def test_circ_attr_classes(gene_world):
    ctx, chr1, _ = gene_world
    gtf_idx = ctx.gtf_index

    # exonic: spans exon1..exon2 on the gene strand
    f = circ_attr(gtf_idx, 'chr1', 1_050, 5_100, '+')
    assert f['circ_type'] == 'exon'
    assert f['gene_id'] == 'G9'
    assert f['gene_name'] == 'LariatG'
    assert f['gene_type'] == 'lncRNA'

    # intronic: inside the intron, same strand
    f = circ_attr(gtf_idx, 'chr1', 2_000, 3_000, '+')
    assert f['circ_type'] == 'intron'

    # antisense: overlapping the gene on the other strand
    f = circ_attr(gtf_idx, 'chr1', 1_050, 5_100, '-')
    assert f['circ_type'] == 'antisense'
    assert f.get('gene_id') == 'G9'

    # intergenic: far from the gene
    f = circ_attr(gtf_idx, 'chr1', 9_000, 9_500, '+')
    assert f['circ_type'] == 'intergenic'
