"""Aligner-decision parity at the minimap2 filter boundaries.

SURVEY.md §7 names minimap2 keep/drop parity the #1 hard part: the scan
stages threshold on alignment EXTENT (mlen ratios, clip geometry), so two
aligners that disagree slightly near a threshold diverge in calls.  The
real minimap2 wheel is uninstallable here, so this module proves the next
strongest property: given the SAME hits, the repo's decision glue and the
REFERENCE's decision glue (run in-process via tests/ref_inject.py) make
identical keep/drop decisions with every threshold exercised on BOTH
sides of its boundary.

A ScriptedAligner returns prescribed Hit objects per query string, which
pins mlen/coords to exact boundary values (something engineered reads
cannot do reliably):

  * linear-read filters: mlen > max(0.8*len, len-200), mlen > 1.5*|ccs|
    (reference find_bsj.py:243-246)
  * segment-intersection filter (find_bsj.py:254-256)
  * the 150 bp short-CCS recovery queue (find_bsj.py:260-261)
  * CCS-span dominance filter (find_bsj.py:262)
  * raw-pass 1-hit gates: 0.45*len / len-50 mlen window, both-ends
    anchoring, circ-vs-raw mlen, 30 bp junction margin, junction
    containment, 20 bp clip cap (find_bsj.py:515-556)
  * raw-pass 2-hit chimera geometry: q_st+0.45*mlen ordering, back-splice
    reference order (r_en-20), 50/20 bp query-gap caps, the +-10 junction
    window, and the 2-hit circ variant (find_bsj.py:528-581)

Together with tests/test_stage_differential.py (real reads, real
aligner), this replaces the never-runnable recorded-mappy-fixture test;
ciri_long_tpu/tools/mappy_fixtures.py remains for offline recording where
a minimap2 wheel exists.
"""

import numpy as np
import pytest

from ciri_long_tpu.context import Context
from ciri_long_tpu.io.genome import Genome
from ciri_long_tpu.models.hits import Hit

from tests.ref_inject import load_reference


def rand_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


class ScriptedAligner:
    """mappy-interface aligner returning prescribed hits per exact query
    string.  No map_batch attribute on purpose: both pipelines fall back
    to their per-read map path, so the scripted hits reach the decision
    glue unchanged."""

    def __init__(self, table):
        self.table = dict(table)

    def map(self, seq, secondary=False):
        return list(self.table.get(seq, []))


def _hit(q_st, q_en, r_st=None, r_en=None, mlen=None, ctg='chrT', strand=1):
    """All-M hit: blen == q/r span, coords self-consistent, mlen free."""
    span = q_en - q_st
    if r_st is None:
        r_st = 2000
    if r_en is None:
        r_en = r_st + span
    if mlen is None:
        mlen = span
    return Hit(ctg, strand, q_st, q_en, r_st, r_en, mlen, span,
               [(span, 0)], is_primary=1)


def rot(seq, junc):
    return seq[junc:] + seq[:junc]


@pytest.fixture(scope='module')
def world(module_rng):
    genome = Genome.from_dict({'chrT': rand_seq(module_rng, 60_000)})
    return genome


def _run_scan_row(genome, table, row):
    """One (read_id, segments, ccs, raw) chunk through both glues."""
    from ciri_long_tpu.pipeline.find_bsj import scan_ccs_chunk
    ctx = Context(aligner=ScriptedAligner(table), genome=genome)
    ref = load_reference(ctx)
    r_cnt, r_short, r_ret = ref.find_bsj.scan_ccs_chunk([list(row)], True)
    o_cnt, o_short, o_ret = scan_ccs_chunk(ctx, [row], True)
    assert dict(o_cnt) == dict(r_cnt), row[0]
    assert [tuple(s) for s in o_short] == [tuple(s) for s in r_short], row[0]
    assert [tuple(x) for x in o_ret] == [tuple(x) for x in r_ret], row[0]
    return dict(o_cnt), o_short, o_ret


# ---------------------------------------------------------------------------
# linear-read filters (find_bsj.py:243-246) + segment/ccs-span/short gates
# ---------------------------------------------------------------------------

# NOTE on effective mlen: get_primary_alignment feeds every hit through
# remove_long_insert (align.py:463-471), which rebuilds it as a SubHit
# whose mlen is the cigar's M+I total (align.py:149-156) -- i.e. the
# QUERY SPAN, not the aligner-reported matching-base count.  The linear
# filters therefore gate on q_en - q_st for all-M hits; the rows below
# pin the span to the boundary values.
#
# (name, L_raw, C_ccs, segments, raw_hit(q_st, q_en) or None,
#  ccs2_hit(q_st, q_en) or None, expect)
SCAN_ROWS = [
    # 0.8*len boundary at L=1000 (0.8L == L-200 == 800); strict >
    ('f1_under', 1000, 600, '0-600;600-1200', (0, 799), None,
     dict(raw_unmapped=1, short=0)),
    ('f1_at', 1000, 600, '0-600;600-1200', (0, 800), None,
     dict(raw_unmapped=1, short=0)),
    ('f1_over', 1000, 600, '0-600;600-1200', (0, 801), None,
     dict(raw_unmapped=0, short=0)),
    # len-200 dominates at L=2000 (bound 1800 > 0.8L=1600); C sized so
    # 1.5C=1953 stays above the probe spans
    ('f1m_under', 2000, 1302, '0-1302;1302-2604', (0, 1799), None,
     dict(raw_unmapped=1, short=0)),
    ('f1m_over', 2000, 1302, '0-1302;1302-2604', (0, 1801), None,
     dict(raw_unmapped=0, short=0)),
    # 1.5*|ccs| boundary: C=200 -> bound 300 (filter-1 bound 800 inactive)
    ('f2_under', 1000, 200, '0-200;200-400', (0, 299), None,
     dict(raw_unmapped=1, short=0)),
    ('f2_over', 1000, 200, '0-200;200-400', (0, 301), None,
     dict(raw_unmapped=0, short=0)),
    # segment intersection (find_bsj.py:254-256): raw_en < seg_st exits
    # after the raw_unmapped counter but before the ccs map; the ccs2
    # entry makes the surviving side observable via ccs_mapped
    ('seg_disjoint', 1000, 600, '100-700', (0, 99), (10, 310),
     dict(raw_unmapped=1, ccs_mapped=0, short=0)),
    ('seg_touch', 1000, 600, '99-700', (0, 99), (10, 310),
     dict(raw_unmapped=1, ccs_mapped=1, short=0)),
    # short-CCS recovery queue: ccs unmapped, |ccs| < 150
    ('short_under', 1000, 149, '0-149;149-298', None, None,
     dict(raw_unmapped=1, short=1)),
    ('short_at', 1000, 150, '0-150;150-300', None, None,
     dict(raw_unmapped=1, short=0)),
    # ccs-span dominance (find_bsj.py:262): seg span < ccs2 hit span drops
    ('span_under', 1000, 300, '0-299', None, (10, 310),
     dict(raw_unmapped=1, ccs_mapped=0, short=0)),
    ('span_at', 1000, 300, '0-300', None, (10, 310),
     dict(raw_unmapped=1, ccs_mapped=1, short=0)),
]


@pytest.mark.parametrize('row', SCAN_ROWS, ids=[r[0] for r in SCAN_ROWS])
def test_scan_filter_boundaries(world, rng, row):
    name, L, C, segments, raw_spec, ccs2_spec, expect = row
    raw = rand_seq(rng, L)
    ccs = rand_seq(rng, C)
    table = {}
    if raw_spec is not None:
        q_st, q_en = raw_spec
        table[raw] = [_hit(q_st, q_en)]
    if ccs2_spec is not None:
        q_st, q_en = ccs2_spec
        table[ccs * 2] = [_hit(q_st, q_en)]
        # the BSJ rotation then maps rot(ccs, q_st % C): leave it unmapped
        # so the read exits after ccs_mapped (circ_hit None)
    cnt, short, ret = _run_scan_row(world, table,
                                    ('r_' + name, segments, ccs, raw))
    assert cnt.get('raw_unmapped', 0) == expect['raw_unmapped'], name
    assert len(short) == expect['short'], name
    if 'ccs_mapped' in expect:
        assert cnt.get('ccs_mapped', 0) == expect['ccs_mapped'], name


# ---------------------------------------------------------------------------
# raw-pass geometry (find_bsj.py:499-620)
# ---------------------------------------------------------------------------

def _run_raw_row(genome, table, read_id, seq):
    from ciri_long_tpu.pipeline.find_bsj import scan_raw_chunk
    ctx = Context(aligner=ScriptedAligner(table), genome=genome)
    ref = load_reference(ctx)
    r_cnt, r_ret, r_short = ref.find_bsj.scan_raw_chunk(
        [(read_id, seq)], True, {})
    o_cnt, o_ret, o_short = scan_raw_chunk(ctx, [(read_id, seq)], True, {})
    assert dict(o_cnt) == dict(r_cnt), read_id
    assert [tuple(x) for x in o_ret] == [tuple(x) for x in r_ret], read_id
    assert [tuple(s) for s in o_short] == [tuple(s) for s in r_short]
    return dict(o_cnt), o_ret, o_short


L = 1000
JUNC = 400
PERFECT_CIRC = dict(q_st=0, q_en=L, r_st=2000)


def _one_hit_case(raw_hit_kw, circ_hit_kw=None, junc=JUNC, with_bsj=True):
    """Table builder for the 1-raw-hit geometry.  The circ-vs-raw mlen
    gate (find_bsj.py:549) reads the PRISTINE raw hit's mlen but the
    SubHit-rebuilt circ hit's (== circ query span); raw_hit_kw's ``mlen``
    therefore controls that gate directly while the 0.45/len-50 window
    gates on the raw hit's query span."""
    def build(rng):
        seq = rand_seq(rng, L)
        table = {seq: [_hit(**raw_hit_kw)]}
        if with_bsj:
            table[seq * 2] = [_hit(junc, junc + 600, r_st=2000)]
            if circ_hit_kw is not None:
                table[rot(seq, junc)] = [_hit(**circ_hit_kw)]
        return seq, table
    return build


RAW_ROWS = [
    # read-length gate (find_bsj.py:510-512): < 300 queues as short
    ('len_299', lambda rng: (rand_seq(rng, 299), {}),
     dict(partial=0, short=1)),
    ('len_301', lambda rng: (rand_seq(rng, 301), {}),
     dict(partial=0, short=0)),
    # 1-hit span window: [0.45L, L-50] = [450, 950] on the SubHit span
    ('span_449', _one_hit_case(dict(q_st=100, q_en=549),
                               with_bsj=False), dict(partial=0, short=0)),
    ('span_451', _one_hit_case(dict(q_st=100, q_en=551),
                               dict(**PERFECT_CIRC)), dict(partial=1, short=0)),
    ('span_949', _one_hit_case(dict(q_st=51, q_en=1000),
                               dict(**PERFECT_CIRC)), dict(partial=1, short=0)),
    ('span_951', _one_hit_case(dict(q_st=40, q_en=991),
                               with_bsj=False), dict(partial=0, short=0)),
    # both-ends anchoring (q_st < 50 and q_en > L-50 drops)
    ('anchored', _one_hit_case(dict(q_st=49, q_en=951),
                               with_bsj=False), dict(partial=0, short=0)),
    ('left_only', _one_hit_case(dict(q_st=50, q_en=951),
                                dict(**PERFECT_CIRC)), dict(partial=1, short=0)),
    # circ-vs-raw mlen gate (strict >, find_bsj.py:549): pristine raw
    # mlen 985 vs circ span 985/986
    ('circ_mlen_eq', _one_hit_case(dict(q_st=100, q_en=980, mlen=985),
                                   dict(q_st=0, q_en=985, r_st=2000)),
     dict(partial=0, short=0)),
    ('circ_mlen_gt', _one_hit_case(dict(q_st=100, q_en=980, mlen=985),
                                   dict(q_st=0, q_en=986, r_st=2000)),
     dict(partial=1, short=0)),
    # 30 bp junction margin (find_bsj.py:551)
    ('junc_29', _one_hit_case(dict(q_st=100, q_en=980),
                              dict(**PERFECT_CIRC), junc=29),
     dict(partial=0, short=0)),
    ('junc_30', _one_hit_case(dict(q_st=100, q_en=980),
                              dict(**PERFECT_CIRC), junc=30),
     dict(partial=1, short=0)),
    # junction containment: junc + q_en must exceed L (find_bsj.py:553);
    # the keep side also needs clip = L - q_en <= 20
    ('contain_eq', _one_hit_case(dict(q_st=100, q_en=980),
                                 dict(q_st=0, q_en=970, r_st=2000),
                                 junc=30), dict(partial=0, short=0)),
    ('contain_gt', _one_hit_case(dict(q_st=100, q_en=981),
                                 dict(q_st=0, q_en=981, r_st=2000),
                                 junc=30), dict(partial=1, short=0)),
    # 20 bp clip cap (find_bsj.py:580: clip = q_st + L - q_en)
    ('clip_19', _one_hit_case(dict(q_st=100, q_en=980),
                              dict(q_st=4, q_en=L - 15, r_st=2000)),
     dict(partial=1, short=0)),
    ('clip_21', _one_hit_case(dict(q_st=100, q_en=980),
                              dict(q_st=6, q_en=L - 15, r_st=2000)),
     dict(partial=0, short=0)),
]


@pytest.mark.parametrize('row', RAW_ROWS, ids=[r[0] for r in RAW_ROWS])
def test_raw_one_hit_boundaries(world, rng, row):
    name, build, expect = row
    seq, table = build(rng)
    cnt, ret, short = _run_raw_row(world, table, 'r_' + name, seq)
    assert cnt.get('partial', 0) == expect['partial'], name
    assert len(short) == expect['short'], name


# 2-raw-hit chimera geometry (find_bsj.py:528-539).  After
# remove_long_insert, head.mlen == its query span, so the ordering gate
# head.q_st + head.mlen*0.45 < tail.q_st depends only on head's span.
def _two_hit_case(tail_q_st, tail_r_st=2000, head_q=(0, 400), junc=390,
                  with_bsj=True):
    def build(rng):
        seq = rand_seq(rng, L)
        head = _hit(head_q[0], head_q[1], r_st=5000)
        tail = _hit(tail_q_st, L, r_st=tail_r_st)
        table = {seq: [head, tail]}
        if with_bsj:
            table[seq * 2] = [_hit(junc, junc + 600, r_st=2000)]
            table[rot(seq, junc)] = [_hit(q_st=0, q_en=L, r_st=2000)]
        return seq, table
    return build


TWO_HIT_ROWS = [
    # ordering gate with head q 370..400: bound 370 + 0.45*30 = 383.5;
    # the junction window [head.q_en-10, tail.q_st+10] then admits 390
    ('order_at', _two_hit_case(383, head_q=(370, 400), with_bsj=False),
     dict(partial=0)),
    ('order_over', _two_hit_case(384, head_q=(370, 400)), dict(partial=1)),
    # back-splice reference order: head.r_en - 20 < tail.r_st DROPS
    # (head.r_en = 5400 -> bound 5380)
    ('rorder_keep', _two_hit_case(420, tail_r_st=5380), dict(partial=1)),
    ('rorder_drop', _two_hit_case(420, tail_r_st=5381, with_bsj=False),
     dict(partial=0)),
    # query gap cap: head.q_en < tail.q_st - 50 DROPS (head.q_en=400)
    ('qgap_keep', _two_hit_case(450), dict(partial=1)),
    ('qgap_drop', _two_hit_case(451, with_bsj=False), dict(partial=0)),
    # junction window: head.q_en-10 <= junc <= tail.q_st+10 (400/420)
    ('junc_low_out', _two_hit_case(420, junc=389), dict(partial=0)),
    ('junc_low_in', _two_hit_case(420, junc=390), dict(partial=1)),
    ('junc_high_in', _two_hit_case(420, junc=430), dict(partial=1)),
    ('junc_high_out', _two_hit_case(420, junc=431), dict(partial=0)),
]


@pytest.mark.parametrize('row', TWO_HIT_ROWS, ids=[r[0] for r in TWO_HIT_ROWS])
def test_raw_two_hit_boundaries(world, rng, row):
    name, build, expect = row
    seq, table = build(rng)
    cnt, ret, short = _run_raw_row(world, table, 'r2_' + name, seq)
    assert cnt.get('partial', 0) == expect['partial'], name


# 2-hit CIRC geometry after the rotation (find_bsj.py:558-569): raw maps
# as one mid-read hit, the rotated circ maps as head+tail.
def _circ_two_hit_case(tail_q_st, tail_r_st=2000, head_strand=1,
                       head_q_en=500):
    def build(rng):
        seq = rand_seq(rng, L)
        junc = 400
        table = {
            seq: [_hit(100, 980)],
            seq * 2: [_hit(junc, junc + 600, r_st=2000)],
            rot(seq, junc): [
                _hit(0, head_q_en, r_st=5000, strand=head_strand),
                _hit(tail_q_st, L, r_st=tail_r_st)],
        }
        return seq, table
    return build


CIRC_TWO_HIT_ROWS = [
    # strand concordance (find_bsj.py:560)
    ('strand_mismatch', _circ_two_hit_case(510, head_strand=-1),
     dict(partial=0)),
    # half-overlap ordering: head.q_st + 0.5*(q_en-q_st) < tail.q_st
    # (bound 250 for head q 0..500; 130 for head q 0..260)
    ('half_at', _circ_two_hit_case(250), dict(partial=0)),
    ('half_over', _circ_two_hit_case(251, head_q_en=260), dict(partial=1)),
    # query gap cap (20 bp): head.q_en < tail.q_st - 20 DROPS
    ('gap20_keep', _circ_two_hit_case(520), dict(partial=1)),
    ('gap20_drop', _circ_two_hit_case(521), dict(partial=0)),
    # clip cap: |tail.q_st - head.q_en| > 20 DROPS (head.q_en=500);
    # the overlapping side (tail.q_st=479) passes the gap gate but
    # exceeds the clip cap
    ('clip2_keep', _circ_two_hit_case(510), dict(partial=1)),
    ('clip2_drop', _circ_two_hit_case(479), dict(partial=0)),
]


@pytest.mark.parametrize('row', CIRC_TWO_HIT_ROWS,
                         ids=[r[0] for r in CIRC_TWO_HIT_ROWS])
def test_raw_circ_two_hit_boundaries(world, rng, row):
    name, build, expect = row
    seq, table = build(rng)
    cnt, ret, short = _run_raw_row(world, table, 'c2_' + name, seq)
    assert cnt.get('partial', 0) == expect['partial'], name
