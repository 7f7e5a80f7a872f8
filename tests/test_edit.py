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
