"""Tandem-repeat / cyclic-consensus detection tests (pyccs contract,
reference find_ccs.py:14-17 and tests/test_poa.py:19-32)."""

import numpy as np

from ciri_long_tpu.ops.ccs import find_consensus
from ciri_long_tpu.ops.edit import edit_distance
from tests.test_poa import SEGMENTS, mutate


def rand_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


def test_reference_tandem_read():
    """The reference's own 6-segment rolling-circle read: consensus length
    must match the unit length (~144) and the segments must span the read
    (find_bsj.py:254-256 uses first/last span extents)."""
    raw = "".join(SEGMENTS)
    segments, ccs = find_consensus(raw)
    assert segments is not None and ccs is not None
    spans = [tuple(map(int, s.split('-'))) for s in segments.split(';')]
    assert spans[0][0] == 0
    assert spans[-1][1] >= len(raw) - 20
    assert all(b > a for a, b in spans)
    assert all(spans[i][1] == spans[i + 1][0] for i in range(len(spans) - 1))
    assert abs(len(ccs) - 144) <= 7
    d = min(edit_distance(ccs, s) for s in SEGMENTS[:5])
    assert d <= 10


def test_random_read_is_not_a_repeat(rng):
    for n in (200, 1000, 5000):
        seq = rand_seq(rng, n)
        segments, ccs = find_consensus(seq)
        assert segments is None and ccs is None, n


def test_two_copy_repeat_detected(rng):
    unit = rand_seq(rng, 300)
    read = unit + unit
    segments, ccs = find_consensus(read)
    assert segments is not None
    assert abs(len(ccs) - 300) <= 5
    assert edit_distance(ccs, unit) <= 3


def test_noisy_rolling_circle(rng):
    unit = rand_seq(rng, 180)
    read = "".join(mutate(rng, unit, sub=0.03, ins=0.02, dele=0.02)
                   for _ in range(6))
    segments, ccs = find_consensus(read)
    assert segments is not None
    assert abs(len(ccs) - 180) <= 12
    assert edit_distance(ccs, unit) <= 15


def test_rotated_phase(rng):
    """Reads rarely start at a unit boundary; the consensus is then a
    rotation of the unit -- its doubled self must contain the unit well."""
    unit = rand_seq(rng, 150)
    read = unit[73:] + unit * 4 + unit[:50]
    segments, ccs = find_consensus(read)
    assert segments is not None
    assert abs(len(ccs) - 150) <= 5
    doubled = ccs + ccs
    best = min(edit_distance(doubled[i:i + 150], unit) for i in range(151))
    assert best <= 3


def test_linear_mrna_like_read(rng):
    """A read with a single internal duplication must NOT become a CCS call
    spanning the read."""
    a, b, c = rand_seq(rng, 400), rand_seq(rng, 60), rand_seq(rng, 400)
    read = a + b + c
    segments, ccs = find_consensus(read)
    assert segments is None


def test_short_read_rejected():
    assert find_consensus("ACGT" * 10) == (None, None)


def test_native_detect_parity(rng):
    """C++ detect (ccscore.cpp) vs the numpy cascade: identical
    period/segments/units (or identical None) across rolling-circle,
    linear, noisy and N-bearing reads."""
    import builtins
    from ciri_long_tpu.ops import ccs as ccs_mod

    orig = builtins.__import__

    def block(name, *a, **k):
        if name == 'ciri_long_tpu' and a and a[2] and \
                '_ccscore' in (a[2] or ()):
            raise ImportError
        return orig(name, *a, **k)

    def make_read(case):
        if case == 0:    # clean rolling circle
            unit = rng.integers(0, 4, int(rng.integers(40, 400)))
            reps = float(rng.uniform(2.2, 8.0))
            seq = np.tile(unit, int(np.ceil(reps)))[:int(len(unit) * reps)]
        elif case == 1:  # noisy rolling circle (subs + indels)
            unit = rng.integers(0, 4, int(rng.integers(60, 300)))
            parts = []
            for _ in range(int(rng.integers(2, 7))):
                u = unit.copy()
                sub = rng.random(len(u)) < 0.04
                u[sub] = rng.integers(0, 4, int(sub.sum()))
                keep = rng.random(len(u)) > 0.02
                parts.append(u[keep])
            seq = np.concatenate(parts)
        elif case == 2:  # linear random
            seq = rng.integers(0, 4, int(rng.integers(30, 1500)))
        else:            # rolling circle with N stretches
            unit = rng.integers(0, 4, int(rng.integers(50, 200)))
            seq = np.tile(unit, 4).copy()
            ii = rng.integers(0, len(seq), max(1, len(seq) // 40))
            seq[ii] = 4
        return seq.astype(np.int8)

    for t in range(60):
        seq = make_read(t % 4)
        nat = ccs_mod.detect_units(seq)
        builtins.__import__ = block
        try:
            ref = ccs_mod.detect_units(seq)
        finally:
            builtins.__import__ = orig
        if ref is None or nat is None:
            assert ref is None and nat is None, (t, ref, nat)
            continue
        assert nat[0] == ref[0], (t, nat[0], ref[0])
        assert [tuple(map(int, s)) for s in nat[1]] == \
            [tuple(map(int, s)) for s in ref[1]]
        assert [tuple(map(int, s)) for s in nat[2]] == \
            [tuple(map(int, s)) for s in ref[2]]


def test_native_center_star_parity(rng):
    """C++ whole-star consensus (nwcore.cpp::py_center_star) vs the Python
    implementation: identical bytes across clean/noisy/indel units,
    insertion-slot majorities and degenerate shapes."""
    import builtins
    from ciri_long_tpu.ops import ccs as ccs_mod

    orig = builtins.__import__

    def block(name, *a, **k):
        if name == 'ciri_long_tpu' and a and a[2] and \
                '_nwcore' in (a[2] or ()):
            raise ImportError
        return orig(name, *a, **k)

    for t in range(30):
        base = rng.integers(0, 4, int(rng.integers(30, 400))).astype(np.int8)
        U = int(rng.integers(2, 9))
        units = []
        for _ in range(U):
            u = base.copy()
            sub = rng.random(len(u)) < 0.06
            u[sub] = rng.integers(0, 5, int(sub.sum()))
            if rng.random() < 0.7:     # deletions
                u = u[rng.random(len(u)) > 0.03]
            if rng.random() < 0.7:     # insertions
                ii = int(rng.integers(0, len(u)))
                ins = rng.integers(0, 4, int(rng.integers(1, 6)))
                u = np.concatenate([u[:ii], ins, u[ii:]]).astype(np.int8)
            units.append(u)
        nat = ccs_mod.center_star_consensus(units)
        builtins.__import__ = block
        try:
            ref = ccs_mod.center_star_consensus(units)
        finally:
            builtins.__import__ = orig
        np.testing.assert_array_equal(nat, ref), t
