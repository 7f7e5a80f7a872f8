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


def _write_fa(path, contigs):
    with open(path, "w") as f:
        for name, seq in contigs.items():
            f.write(">{}\n{}\n".format(name, seq))


def test_recover_pool_byte_identical(rng, tmp_path):
    """Pooled (-t 2) recovery must produce byte-identical cand_circ.fa and
    counters vs serial (VERDICT round-1 item 8; reference pools this pass
    at find_bsj.py:462)."""
    from dataclasses import replace

    from ciri_long_tpu.config import DEFAULT
    from ciri_long_tpu.pipeline.find_bsj import recover_ccs_reads

    chr1 = list(rand_seq(rng, 30_000))
    short_reads = []
    for t in range(12):
        st = 2_000 + t * 2_000
        en = st + 90 + (t % 3) * 10
        chr1[st - 2:st] = list("AG")
        chr1[en:en + 2] = list("GT")
    chr1 = "".join(chr1)
    genome = Genome.from_dict({"chr1": chr1})
    for t in range(12):
        st = 2_000 + t * 2_000
        en = st + 90 + (t % 3) * 10
        unit = chr1[st:en]
        raw = unit * 6
        segments = ";".join(
            "{}-{}".format(i * len(unit), (i + 1) * len(unit))
            for i in range(6))
        short_reads.append(("sr_{}".format(t), segments, unit, raw))

    ref_fa = tmp_path / "genome.fa"
    _write_fa(ref_fa, {"chr1": chr1})

    cfg = replace(DEFAULT.call, ccs_chunk_size=3)   # 4 chunks -> pool engages
    ctx = Context(aligner=GenomeAligner(genome, short_mode=True),
                  genome=genome)

    serial_dir = tmp_path / "serial"
    pooled_dir = tmp_path / "pooled"
    for d in (serial_dir, pooled_dir):
        d.mkdir()
        (d / "p.cand_circ.fa").write_text("")

    cnt_serial = recover_ccs_reads(ctx, short_reads, True, str(serial_dir),
                                   "p", cfg)
    cnt_pooled = recover_ccs_reads(ctx, short_reads, True, str(pooled_dir),
                                   "p", cfg, threads=2,
                                   ref_fasta=str(ref_fa))

    assert dict(cnt_serial) == dict(cnt_pooled)
    assert cnt_serial["bsj"] >= 8
    assert (serial_dir / "p.cand_circ.fa").read_bytes() == \
        (pooled_dir / "p.cand_circ.fa").read_bytes()
