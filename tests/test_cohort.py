"""Mesh-sharded call scan (parallel/cohort.py): candidate records packed
into fixed-size rows, merged with one all_gather, written byte-identical
to the serial scan (VERDICT round-1 item 5)."""

import numpy as np
import pytest

from ciri_long_tpu.context import Context
from ciri_long_tpu.io.genome import Genome
from ciri_long_tpu.models.aligner import GenomeAligner
from ciri_long_tpu.ops.ccs import find_consensus
from ciri_long_tpu.parallel.cohort import scan_ccs_sharded
from ciri_long_tpu.parallel.mesh import make_mesh
from ciri_long_tpu.parallel.records import (decode_record, encode_record)
from ciri_long_tpu.pipeline.find_bsj import scan_ccs_reads
from tests.test_pipeline_call import make_rolling_read


def rand_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


@pytest.fixture(scope="module")
def cohort_world(module_rng):
    rng = module_rng
    chr1 = list(rand_seq(rng, 60_000))
    loci = []
    for t in range(4):
        st = 8_000 + t * 12_000
        en = st + 300 + 60 * t
        chr1[st - 2:st] = list("AG")
        chr1[en:en + 2] = list("GT")
        loci.append((st, en))
    chr1 = "".join(chr1)
    genome = Genome.from_dict({"chr1": chr1})
    ctx = Context(aligner=GenomeAligner(genome), genome=genome)

    ccs_seq = {}
    n = 0
    for st, en in loci:
        unit = chr1[st:en]
        for d in range(5):
            read = make_rolling_read(rng, unit, copies=3.0 + 0.4 * d,
                                     rot=(d * 97) % len(unit), noise=0.02)
            segments, ccs = find_consensus(read)
            if segments is None:
                continue
            ccs_seq['read_{:03d}'.format(n)] = [segments, ccs, read]
            n += 1
    assert n >= 12
    return ctx, ccs_seq


def test_record_roundtrip_on_real_records(cohort_world, tmp_path):
    """encode/decode must reproduce every scan record exactly."""
    from ciri_long_tpu.pipeline.find_bsj import scan_ccs_chunk

    ctx, ccs_seq = cohort_world
    items = [[rid] + ccs_seq[rid] for rid in ccs_seq]
    _, _, ret = scan_ccs_chunk(ctx, items, True)
    assert len(ret) >= 10
    read_ids = [it[0] for it in items]
    ctg_index = {n: i for i, n in enumerate(ctx.genome.names)}
    for t, rec in enumerate(ret):
        row = encode_record(rec, t, ctg_index)
        back = decode_record(row, {t: rec[0] for t, rec in
                                   enumerate(ret)}, ctx.genome.names)
        assert back == rec, rec


def test_record_roundtrip_edge_fields():
    """Synthetic records exercising negative shifts, denovo/annotated ss,
    open-ended exons and the partial tag."""
    recs = [
        ('r0', 'chr1:100-200', '+', '100-150|51,160-200|41',
         'AG-GT*|-3--5', '17|2-300', '0-150;150-290', 'ACGTN' * 10),
        ('r1', 'chrX:5-9', 'NA', '5-9|*-', 'NA', '0|0-NA'.replace('NA', '7'),
         'partial', 'A'),
        ('r2', 'scaffold_9:1-2', '-', '1-2|-*', 'AT-AC|10-0', '3|1-2',
         '0-1', 'GG'),
    ]
    names = ['chr1', 'chrX', 'scaffold_9']
    idx = {n: i for i, n in enumerate(names)}
    ids = {0: 'r0', 1: 'r1', 2: 'r2'}
    for t, rec in enumerate(recs):
        row = encode_record(rec, t, idx)
        assert decode_record(row, ids, names) == rec


@pytest.mark.parametrize("n_devices", [1, 8])
def test_sharded_scan_byte_identical(cohort_world, tmp_path, n_devices):
    ctx, ccs_seq = cohort_world

    serial_dir = tmp_path / 'serial{}'.format(n_devices)
    sharded_dir = tmp_path / 'sharded{}'.format(n_devices)
    serial_dir.mkdir()
    sharded_dir.mkdir()

    cnt_a, short_a = scan_ccs_reads(ctx, ccs_seq, True, str(serial_dir), 'p')
    mesh = make_mesh(n_devices, lag_parallel=1)
    cnt_b, short_b = scan_ccs_sharded(mesh, ctx, ccs_seq, True,
                                      str(sharded_dir), 'p')

    assert dict(cnt_a) == dict(cnt_b)
    assert [s[0] for s in short_a] == [s[0] for s in short_b]
    a = (serial_dir / 'p.cand_circ.fa').read_bytes()
    b = (sharded_dir / 'p.cand_circ.fa').read_bytes()
    assert a == b and len(a) > 0
