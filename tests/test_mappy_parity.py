"""Filter-decision parity vs recorded real-minimap2 hits.

Loads tests/fixtures/mappy_hits.json (recorded offline by
ciri_long_tpu/tools/mappy_fixtures.py where the mappy wheel exists),
regenerates the identical dataset, maps every read with our
GenomeAligner, and asserts the scan stage's keep/drop DECISIONS
(reference find_bsj.py:243-246 mlen thresholds) and the primary hit's
locus agree.  Skips with a pointer when the fixture has not been
recorded yet -- this environment cannot install the wheel."""

import json
import os

import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), 'fixtures',
                       'mappy_hits.json')


def linear_decisions(read_len, mlen, cfg):
    """The two raw-read filter decisions of pipeline/find_bsj.py
    (reference find_bsj.py:243-246).  ccs length enters filter 2; the
    fixture parity uses a fixed representative ccs_len = read_len / 3
    (rolling-circle reads carry >= 2.2 copies) for BOTH sides, so only
    the mlen value under test varies."""
    ccs_len = read_len / 3
    f1 = mlen is not None and mlen > max(read_len * cfg.linear_frac,
                                         read_len - cfg.linear_margin)
    f2 = mlen is not None and mlen > cfg.linear_vs_ccs * ccs_len
    return f1, f2


@pytest.mark.skipif(not os.path.exists(FIXTURE),
                    reason='mappy fixture not recorded (needs the minimap2 '
                           'wheel; see ciri_long_tpu/tools/mappy_fixtures.py)')
def test_filter_decisions_match_real_minimap2():
    from ciri_long_tpu.config import DEFAULT
    from ciri_long_tpu.models.aligner import GenomeAligner
    from ciri_long_tpu.models.hits import get_primary_alignment
    from ciri_long_tpu.tools.mappy_fixtures import build_dataset

    with open(FIXTURE) as f:
        fx = json.load(f)
    params, genome, _chr1, reads = build_dataset(fx['params'])
    al = GenomeAligner(genome)
    cfg = DEFAULT.call

    mismatched = []
    for rid, seq in reads:
        rec = fx['hits'][rid]
        ours = get_primary_alignment(al.map(seq))
        theirs = rec['primary']
        d_ours = linear_decisions(len(seq), ours.mlen if ours else None, cfg)
        d_them = linear_decisions(len(seq),
                                  theirs['mlen'] if theirs else None, cfg)
        if d_ours != d_them:
            mismatched.append((rid, d_ours, d_them,
                               ours.mlen if ours else None,
                               theirs['mlen'] if theirs else None))
            continue
        # locus agreement for kept linear reads (strand + rough position)
        if theirs and ours and d_them[0]:
            assert ours.ctg == theirs['ctg']
            assert ours.strand == theirs['strand']
            assert abs(ours.r_st - theirs['r_st']) < 50
    assert not mismatched, (
        'filter decisions diverged from real minimap2 on {} of {} reads: '
        '{}'.format(len(mismatched), len(reads), mismatched[:5]))
