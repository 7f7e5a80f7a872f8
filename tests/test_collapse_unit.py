"""Unit tests of collapse building blocks (reference collapse.py parity)."""

import numpy as np
import pytest

from ciri_long_tpu.context import Context
from ciri_long_tpu.io.genome import Genome
from ciri_long_tpu.pipeline.collapse import (READ, batch_cluster_sequence,
                                             by_circ, by_isoform,
                                             cluster_bins, cluster_reads,
                                             curate_junction,
                                             genome_junction_seq)
from ciri_long_tpu.utils.seq import get_junc_seq, transform_seq


def rand_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


def mk_read(read_id, circ_id, seq, rtype='full'):
    return READ(read_id, circ_id, '+', 'NA', 'NA', '0|0-100', 'seg', seq,
                'S1', rtype)


def test_cluster_reads_tolerance():
    reads = {
        'a': mk_read('a', 'chr1:1000-2000', 'ACGT'),
        'b': mk_read('b', 'chr1:1010-2015', 'ACGTA'),
        'c': mk_read('c', 'chr1:5000-6000', 'ACGTAC'),
        'd': mk_read('d', 'chr2:1000-2000', 'ACGTACG'),
    }
    clusters = cluster_reads(reads)
    sizes = sorted(len(c) for c in clusters)
    assert sizes == [1, 1, 2]


def test_cluster_reads_drops_giant_spans():
    reads = {'a': mk_read('a', 'chr1:1000-900000', 'ACGT')}
    assert cluster_reads(reads) == []


def test_cluster_bins():
    assert cluster_bins([1, 2, 3, 50, 55, 200], dis=10) == \
        [[1, 2, 3], [50, 55], [200]]


def test_by_circ_ordering():
    ids = ['chr2:5-10', 'chr1:5-10', 'chrX:1-2', 'chrM:1-2', 'scaffold7:1-2',
           'chr1:3-9']
    ordered = sorted(ids, key=by_circ)
    assert ordered == ['chr1:3-9', 'chr1:5-10', 'chr2:5-10', 'chrX:1-2',
                       'chrM:1-2', 'scaffold7:1-2']
    assert by_isoform('chr1:5-10|5-10')[-1] == '5-10'


def test_curate_junction_recovers_true_bsj(rng):
    """Plant a circRNA; feed curate_junction reads whose BSJ estimates are
    off by a few bp -- the batched SW scan must elect the true junction."""
    chr1 = rand_seq(rng, 4000)
    genome = Genome.from_dict({'chr1': chr1})
    ctx = Context(genome=genome)
    st, en = 1500, 2100
    junc = genome_junction_seq(ctx, 'chr1', st, en, width=25)
    scores = curate_junction(ctx, 'chr1', [st + 3, st - 2], [en + 4, en - 1],
                             junc)
    assert scores
    best = scores[0]
    # junction homology can make (st+d, en+d) slides score-identical; any
    # pure slide within 2 bp is the same circular sequence
    slide = best[0] - st
    assert abs(slide) <= 2 and best[1] - en == slide, best
    assert best[2] <= 0.05


def test_batch_cluster_sequence_groups_similar(rng):
    base = rand_seq(rng, 300)
    other = rand_seq(rng, 300)
    seqs = [('r%d' % i, base) for i in range(4)] + \
        [('x%d' % i, other) for i in range(3)]
    res = batch_cluster_sequence('chr1:1-300', seqs)
    assert len(res) == 2
    groups = sorted(len(ids) for _, ids in res)
    assert groups == [3, 4]
