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


def test_native_poa_matches_numpy(rng):
    """poacore.align_graph vs the numpy graph DP: identical (score, aln)
    through incremental graph fusion (native/poacore.cpp)."""
    import importlib

    poa_mod = importlib.import_module('ciri_long_tpu.ops.poa')
    sc = (10, -4, -8, -2, -24, -1)
    for _ in range(15):
        base = rng.integers(0, 4, rng.integers(10, 120)).astype(np.int8)
        g = poa_mod._Graph()
        prev = None
        for b in base:
            cur = g.new_node(int(b))
            g.support[cur] += 1
            if prev is not None:
                g.add_edge(prev, cur)
            prev = cur
        for _ in range(int(rng.integers(1, 6))):
            s = base.copy()
            idx = rng.integers(0, len(s), max(1, len(s) // 12))
            s[idx] = rng.integers(0, 4, len(idx))
            if rng.random() < .4 and len(s) > 5:
                s = np.delete(s, rng.integers(1, len(s) - 1))
            nat = poa_mod._align_to_graph_native(g, s.astype(np.int8), *sc)
            saved = poa_mod._align_to_graph_native
            poa_mod._align_to_graph_native = \
                lambda *a, **k: (_ for _ in ()).throw(ImportError())
            try:
                ref = poa_mod._align_to_graph(g, s.astype(np.int8), *sc)
            finally:
                poa_mod._align_to_graph_native = saved
            assert nat == ref
            poa_mod._fuse(g, s.astype(np.int8), nat[1])
