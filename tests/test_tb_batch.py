"""Device SW-with-traceback (ops/sw_tb_batch.py) parity vs the host DP.

The batched kernel must be BYTE-identical to ops/traceback.py::sw_traceback
-- score, begin/end coordinates and the full cigar, including every
tie-break (end-cell lexsort, diag>E>F traceback priority, gap stay rules)
-- since the collapse rotation step (reference collapse.py:373-382) keys
read rotations off these cigars and the pipeline's outputs are golden-
snapshot tested.
"""

import numpy as np

from ciri_long_tpu.pipeline.collapse import JUNC_SW
from ciri_long_tpu.ops.sw_tb_batch import sw_traceback_batch
from ciri_long_tpu.ops.traceback import sw_traceback
from ciri_long_tpu.utils.seq import encode_seq
from tests.test_poa import mutate


def _check(qs, rs, scores):
    got = sw_traceback_batch(qs, rs, *scores)
    for i, (q, r) in enumerate(zip(qs, rs)):
        want = sw_traceback(q, r, *scores)
        assert got[i] == want, (i, scores, got[i], want)


def test_tb_batch_random_fuzz(rng):
    qs, rs = [], []
    for _ in range(40):
        qs.append(rng.integers(0, 5, int(rng.integers(1, 400))).astype(np.int8))
        rs.append(rng.integers(0, 5, int(rng.integers(1, 60))).astype(np.int8))
    for scores in [(10, 4, 8, 2), (1, 1, 1, 1), (2, 4, 4, 2)]:
        _check(qs, rs, scores)


def test_tb_batch_junction_like(rng):
    """Realistic shape: doubled reads containing a mutated copy of the
    50 bp junction window (the collapse rotation workload)."""
    qs, rs = [], []
    for _ in range(25):
        junc = "".join(rng.choice(list("ACGT"), size=50))
        read = mutate(rng, "".join(rng.choice(list("ACGT"), size=150))
                      + junc + "".join(rng.choice(list("ACGT"), size=150)),
                      sub=0.05, ins=0.03, dele=0.03)
        qs.append(encode_seq(read * 2))
        rs.append(encode_seq(junc))
    _check(qs, rs, (JUNC_SW.match, JUNC_SW.mismatch,
                    JUNC_SW.gap_open, JUNC_SW.gap_extend))


def test_tb_batch_no_hit_and_empty(rng):
    """Score<=0 jobs must come back None exactly like the host path."""
    qs = [np.zeros(30, np.int8),            # all-A vs all-C: no positive cell
          np.zeros(0, np.int8),             # empty query
          encode_seq("ACGTACGT")]
    rs = [np.full(20, 1, np.int8),
          encode_seq("ACGT"),
          np.zeros(0, np.int8)]
    got = sw_traceback_batch(qs, rs, 1, 1, 1, 1)
    for q, r, g in zip(qs, rs, got):
        assert g == sw_traceback(q, r, 1, 1, 1, 1)
        if len(q) == 0 or len(r) == 0:
            assert g is None
    assert got[0] is None


def test_tb_batch_n_bases(rng):
    """N (code 4) scores 0 against everything -- tie-heavy territory."""
    qs, rs = [], []
    for _ in range(15):
        q = rng.choice([0, 1, 2, 3, 4], size=int(rng.integers(20, 200)),
                       p=[0.2, 0.2, 0.2, 0.2, 0.2]).astype(np.int8)
        r = rng.choice([0, 1, 2, 3, 4], size=int(rng.integers(5, 50)),
                       p=[0.22, 0.22, 0.22, 0.22, 0.12]).astype(np.int8)
        qs.append(q)
        rs.append(r)
    _check(qs, rs, (10, 4, 8, 2))


def test_tb_batch_mixed_buckets(rng):
    """Jobs spanning several query-length buckets in one call."""
    qs, rs = [], []
    for n in (10, 100, 300, 600, 1500, 3000):
        qs.append(rng.integers(0, 4, n).astype(np.int8))
        rs.append(rng.integers(0, 4, 50).astype(np.int8))
    _check(qs, rs, (10, 4, 8, 2))


def test_collapse_rotation_device_parity(rng):
    """The collapse call-site contract: rotations computed through the
    batched device path equal the host path read-for-read."""
    from ciri_long_tpu.models.hits import find_alignment_pos
    from ciri_long_tpu.ops.traceback import cigar_to_string
    from ciri_long_tpu.pipeline.collapse import _AlnView

    junc = "".join(rng.choice(list("ACGT"), size=50))
    reads = []
    for k in range(30):
        body = mutate(rng, "".join(rng.choice(list("ACGT"), size=100))
                      + junc + "".join(rng.choice(list("ACGT"), size=100)),
                      sub=0.06, ins=0.03, dele=0.03)
        reads.append(body)
    qs = [encode_seq(s * 2) for s in reads]
    rs = [encode_seq(junc)] * len(reads)
    args = (JUNC_SW.match, JUNC_SW.mismatch, JUNC_SW.gap_open,
            JUNC_SW.gap_extend)
    dev = sw_traceback_batch(qs, rs, *args)
    for q, r, seq, tb_dev in zip(qs, rs, reads, dev):
        tb_host = sw_traceback(q, r, *args)
        assert tb_dev == tb_host
        if tb_host is None:
            continue
        _, qb, _, rb, _, cigar = tb_host
        aln = _AlnView(ref_begin=rb, query_begin=qb,
                       cigar_string=cigar_to_string(cigar))
        pos = find_alignment_pos(aln, len(junc) // 2)
        _, qb2, _, rb2, _, cigar2 = tb_dev
        aln2 = _AlnView(ref_begin=rb2, query_begin=qb2,
                        cigar_string=cigar_to_string(cigar2))
        assert find_alignment_pos(aln2, len(junc) // 2) == pos
