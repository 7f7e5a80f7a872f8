"""End-to-end `call` path on a synthetic genome with planted circRNAs
(the minimum slice of SURVEY.md §7 build order step 2)."""

import json
import os
from types import SimpleNamespace

import numpy as np
import pytest

from ciri_long_tpu.context import Context
from ciri_long_tpu.io.genome import Genome
from ciri_long_tpu.models.aligner import GenomeAligner
from ciri_long_tpu.ops.ccs import find_consensus
from ciri_long_tpu.pipeline.find_bsj import find_bsj, scan_ccs_chunk
from tests.test_poa import mutate


def rand_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


CIRC_START, CIRC_END = 20_000, 20_520   # 0-based [start, end)


@pytest.fixture(scope="module")
def world(module_rng):
    rng = module_rng
    """Genome with a planted + strand circRNA at chr1:20001-20520 (1-based)
    flanked by canonical AG | ... | GT splice signals."""
    chr1 = list(rand_seq(rng, 50_000))
    chr1[CIRC_START - 2:CIRC_START] = list("AG")   # acceptor upstream
    chr1[CIRC_END:CIRC_END + 2] = list("GT")       # donor downstream
    chr1 = "".join(chr1)
    genome = Genome.from_dict({"chr1": chr1})
    aligner = GenomeAligner(genome)
    ctx = Context(aligner=aligner, genome=genome)
    unit = chr1[CIRC_START:CIRC_END]
    return ctx, chr1, unit


def make_rolling_read(rng, unit, copies=3.5, rot=0, noise=0.02):
    unit_rot = unit[rot:] + unit[:rot]
    n_full = int(copies)
    frac = copies - n_full
    parts = [mutate(rng, unit_rot, sub=noise, ins=noise / 2, dele=noise / 2)
             for _ in range(n_full)]
    if frac > 0:
        parts.append(mutate(rng, unit_rot[:int(len(unit) * frac)], sub=noise,
                            ins=noise / 2, dele=noise / 2))
    return "".join(parts)


def test_find_bsj_rotation(world, rng):
    ctx, chr1, unit = world
    rot = 137
    read = make_rolling_read(rng, unit, copies=3.2, rot=rot, noise=0.01)
    segments, ccs = find_consensus(read)
    assert ccs is not None
    circ, junc = find_bsj(ctx, ccs)
    assert circ is not None
    hit = ctx.aligner.map(circ)[0]
    # after rotation the circ should align end-to-end at the locus
    assert hit.ctg == "chr1"
    assert abs(hit.r_st - CIRC_START) <= 5
    assert abs(hit.r_en - CIRC_END) <= 5
    assert hit.q_st <= 3 and len(circ) - hit.q_en <= 3


def test_scan_ccs_chunk_calls_circ(world, rng):
    ctx, chr1, unit = world
    chunk = []
    for i, rot in enumerate([0, 101, 202, 307]):
        read = make_rolling_read(rng, unit, copies=3.0 + 0.3 * i, rot=rot,
                                 noise=0.02)
        segments, ccs = find_consensus(read)
        assert ccs is not None, rot
        chunk.append(("read_%d" % i, segments, ccs, read))

    cnt, short_reads, ret = scan_ccs_chunk(ctx, chunk, True)
    assert cnt['ccs_mapped'] >= 3
    assert cnt['bsj'] >= 3
    assert len(ret) >= 3
    for rec in ret:
        read_id, circ_id, strand, cirexons, ss_id, clip_info, segments, circ_seq = rec
        ctg, span = circ_id.split(':')
        st, en = map(int, span.split('-'))
        assert ctg == 'chr1'
        # 1-based circ_id must hit the planted locus (within call-stage
        # jitter; collapse curation tightens this to +-1)
        assert abs(st - (CIRC_START + 1)) <= 8
        assert abs(en - CIRC_END) <= 8
    # with canonical signals planted, the splice signal should be found
    assert cnt['signal'] >= 2
    called_ss = [rec[4] for rec in ret]
    assert any(s.startswith('AG-GT') or s.startswith('GT-AG') for s in called_ss)


def test_linear_read_is_filtered(world, rng):
    ctx, chr1, unit = world
    # a linear (non-circular) read whose 'ccs' is bogus: scan must drop it
    lin = chr1[30_000:31_200]
    seg = "0-600;600-1200"
    cnt, short_reads, ret = scan_ccs_chunk(
        ctx, [("lin", seg, lin[:600], lin)], True)
    assert len(ret) == 0
