"""Edit-distance kernel parity (reference: utils.py:153-159 `distance`)."""

import numpy as np
import pytest

from ciri_long_tpu.ops.edit import edit_distance, edit_distance_batch
from ciri_long_tpu.utils.seq import pad_encoded
from tests.oracles import edit_oracle


def test_edit_distance_scalar(rng):
    alpha = "ACGT"
    for _ in range(20):
        x = "".join(rng.choice(list(alpha), size=int(rng.integers(0, 40))))
        y = "".join(rng.choice(list(alpha), size=int(rng.integers(0, 40))))
        assert edit_distance(x, y) == edit_oracle(x, y)


def test_edit_distance_batch(rng):
    xs = [rng.integers(0, 4, int(rng.integers(1, 50))).astype(np.int8) for _ in range(20)]
    ys = [rng.integers(0, 4, int(rng.integers(1, 60))).astype(np.int8) for _ in range(20)]
    a, alen = pad_encoded(xs)
    b, blen = pad_encoded(ys)
    d = edit_distance_batch(a, b, alen, blen)
    for i in range(20):
        assert int(d[i]) == edit_oracle(list(xs[i]), list(ys[i])), i


def test_edit_distance_batch_empty_rows():
    a, alen = pad_encoded([np.array([], np.int8), np.array([0, 1], np.int8)], max_len=4)
    b, blen = pad_encoded([np.array([0, 1, 2], np.int8), np.array([], np.int8)], max_len=4)
    d = edit_distance_batch(a, b, alen, blen)
    assert int(d[0]) == 3
    assert int(d[1]) == 2


def test_banded_native_extend_matches_fallback(rng):
    """nwcore.extend (128-banded) vs the Python extend DP: identical
    (score, q_used, r_used) while the optimal path stays in band."""
    import builtins

    import ciri_long_tpu.ops.traceback as tb

    orig = builtins.__import__

    def block(name, *a, **k):
        if name == 'ciri_long_tpu' and a and a[2] and '_nwcore' in (a[2] or ()):
            raise ImportError
        return orig(name, *a, **k)

    for _ in range(40):
        n = int(rng.integers(1, 180))
        m = int(rng.integers(1, 180))
        q = rng.integers(0, 4, n).astype(np.uint8)
        r = q.copy() if rng.random() < .3 else \
            rng.integers(0, 4, m).astype(np.uint8)
        if len(r) and rng.random() < .5:
            idx = rng.integers(0, len(r), max(1, len(r) // 10))
            r = r.copy()
            r[idx] = rng.integers(0, 4, len(idx))
        nat = tb.extend_align(q, r)
        builtins.__import__ = block
        try:
            py = tb.extend_align(q, r)
        finally:
            builtins.__import__ = orig
        assert nat[:3] == py[:3]
