"""Short-CCS recovery pass (SURVEY.md §2 component 4; reference
find_bsj.py:375-490): consensus under 150 bp, called through the
short-read-parameterised aligner."""

import numpy as np
import pytest

from ciri_long_tpu.context import Context
from ciri_long_tpu.io.genome import Genome
from ciri_long_tpu.models.aligner import GenomeAligner
from ciri_long_tpu.pipeline.find_bsj import recover_ccs_chunk


def rand_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


def test_recover_short_ccs(rng):
    chr1 = list(rand_seq(rng, 20_000))
    st, en = 8_000, 8_100           # 100 bp circRNA
    chr1[st - 2:st] = list("AG")
    chr1[en:en + 2] = list("GT")
    chr1 = "".join(chr1)
    genome = Genome.from_dict({"chr1": chr1})
    short_ctx = Context(aligner=GenomeAligner(genome, short_mode=True),
                        genome=genome)

    unit = chr1[st:en]
    raw = unit * 6
    segments = ";".join("{}-{}".format(i * 100, (i + 1) * 100)
                        for i in range(6))
    chunk = [("short_read", segments, unit, raw)]
    cnt, ret = recover_ccs_chunk(short_ctx, chunk, True)
    assert cnt['ccs_mapped'] == 1
    assert cnt['bsj'] == 1
    assert len(ret) == 1
    read_id, circ_id, strand, cirexons, ss_id, clip, segs, circ_seq = ret[0]
    ctg, span = circ_id.split(':')
    s, e = map(int, span.split('-'))
    assert ctg == 'chr1'
    assert abs(s - (st + 1)) <= 5 and abs(e - en) <= 5
    assert len(circ_seq) == 100
