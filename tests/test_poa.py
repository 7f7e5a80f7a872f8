"""POA consensus quality tests (replaces pyspoa; reference usage
collapse.py:267,504 and contract test tests/test_poa.py:6-32)."""

import numpy as np
import pytest

from ciri_long_tpu.ops.edit import edit_distance
from ciri_long_tpu.ops.poa import poa

# The six tandem segments from the reference's own POA contract test
# (tests/test_poa.py:8-15) -- public test data, reproduced as a fixture.
SEGMENTS = [
    'TCCCGGTCATCATAACCCCGATCGTACCCTCTGTCATAATAGTCTCGGCGGCGAGAACTGCCACTGTAAATCTGATCCCTGTCTTGAGCTGCTCTCCATCCACCTCCCTCCACCACCTCCTCCTCTGTATGATCTGCTGTAATAG',
    'TCCCGGTCATCATAACCCCGATCATTGCCACCTGTCATAGTCTCGGCGGCGAGAACTGCCACTGTAAATCCCCTGATCCCTGTCTTGAGCTGCTCTCCATCCCCTCCTCCACCACCTCCTCCTCTGTATGATCTGCTGTAATAG',
    'TCCCGGTCATCATAACCCCGATCGTACCCTCTGTCATAATGGTCTCGGCGGCGAGAACTGCCACTGTAAATCTGATCCCTGTCTTGAGCTGCTCTCCATCCACCTCCTCCACCACCTCCTCCTCTGTATGATCTGCTGTAATAG',
    'TCCCGGTCATCATAACCCCGATCGTACTCTGTCATAATAGTCTCGGCGGCGAGAGGCGCCACTGTAAATCTGATCCCTGTCTTGAGCTGCTCTCCATCCACCTCCTCCACCACCTCCTCCCCTCTGTATGATCTGCTGTAATAG',
    'TCCCGGTCATCATAACCCCGATCGTACCCATAATAGTCTCGGCGAGAACTGCCACTGTAAATCCTGATCCCTGTCTTGAGCTGCTCTCCATCCACCTCCTCCACCACCTCCTCCTCTGTATGATCTGCTGTAATAG',
    'TCCGGTCATCATAACCCCGATCCATAATAGTCTCGGCG',
]


def mutate(rng, s, sub=0.03, ins=0.02, dele=0.02):
    out = []
    for c in s:
        r = rng.random()
        if r < dele:
            continue
        if r < dele + sub:
            out.append("ACGT"[int(rng.integers(0, 4))])
        else:
            out.append(c)
        if rng.random() < ins:
            out.append("ACGT"[int(rng.integers(0, 4))])
    return "".join(out)


def test_poa_identical_copies():
    s = "ACGTACGTTGCAGGGCATCGATCG"
    cons, _ = poa([s] * 5)
    assert cons == s


def test_poa_recovers_template(rng):
    template = "".join(rng.choice(list("ACGT"), size=120))
    reads = [mutate(rng, template) for _ in range(9)]
    cons, _ = poa(reads)
    d = edit_distance(cons, template)
    assert d <= 4, (d, cons, template)


def test_poa_reference_segments():
    """The reference asserts len(pyccs consensus) == len(spoa consensus) of
    these segments (tests/test_poa.py:30-32).  Here: the POA consensus of
    the segments must be within a couple of edits of their mutual
    'center' -- segment 0 -- and must have a consistent length."""
    cons, _ = poa(SEGMENTS)
    assert abs(len(cons) - 144) <= 4
    d = min(edit_distance(cons, s) for s in SEGMENTS[:5])
    assert d <= 8


def test_poa_codes_roundtrip():
    seqs = [np.array([0, 1, 2, 3, 0, 1, 2, 3], np.int8)] * 3
    cons, _ = poa(seqs)
    assert isinstance(cons, np.ndarray)
    assert np.array_equal(cons, seqs[0])
