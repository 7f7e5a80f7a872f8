"""Native CPU alignment cores (native/alncore.cpp) vs the device kernels:
bit-identical outputs on fuzzed padded batches including N bases, empty
rows and tie-heavy scoring (match 1/1/1/1 produces many equal-score
cells, stressing the lexicographic tie-break contract)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ciri_long_tpu.ops.sw import SWParams, _sw_align_fused, sw_align_batch

pytest.importorskip("ciri_long_tpu._alncore")
from ciri_long_tpu import _alncore


def _rand_batch(rng, B, Lmax, n_frac=0.05):
    arr = np.full((B, Lmax), 5, np.int8)
    lens = np.zeros(B, np.int32)
    for b in range(B):
        n = int(rng.integers(0, Lmax + 1))
        row = rng.integers(0, 4, n).astype(np.int8)
        row[rng.random(n) < n_frac] = 4
        arr[b, :n] = row
        lens[b] = n
    return arr, lens


def _plant_homology(rng, q, r):
    """Copy substrings of q into r so positive alignments are common."""
    B = q.shape[0]
    for b in range(B):
        qn = int((q[b] != 5).sum())
        rn = int((r[b] != 5).sum())
        if qn < 8 or rn < 8:
            continue
        L = int(rng.integers(4, min(qn, rn)))
        qs = int(rng.integers(0, qn - L + 1))
        rs = int(rng.integers(0, rn - L + 1))
        r[b, rs:rs + L] = q[b, qs:qs + L]


@pytest.mark.parametrize("params", [SWParams(1, 1, 1, 1),
                                    SWParams(10, 4, 8, 2),
                                    SWParams(2, 3, 5, 2)])
def test_sw_align_native_vs_device(rng, params):
    for trial in range(4):
        B = int(rng.integers(1, 24))
        q, _ = _rand_batch(rng, B, int(rng.integers(8, 96)))
        r, _ = _rand_batch(rng, B, int(rng.integers(8, 160)))
        _plant_homology(rng, q, r)

        dev = _sw_align_fused(jnp.asarray(q), jnp.asarray(r), params)
        dev = [np.asarray(x) for x in dev]
        nat = sw_align_batch(q, r, params)   # cpu backend -> native path

        np.testing.assert_array_equal(nat.score, dev[0], err_msg=str(trial))
        np.testing.assert_array_equal(nat.query_begin, dev[1])
        np.testing.assert_array_equal(nat.query_end, dev[2])
        np.testing.assert_array_equal(nat.ref_begin, dev[3])
        np.testing.assert_array_equal(nat.ref_end, dev[4])


def test_edit_native_vs_device(rng):
    from ciri_long_tpu.ops.edit import (edit_distance,
                                        edit_distance_batch,
                                        edit_distance_batch_padded)

    for trial in range(4):
        B = int(rng.integers(1, 24))
        a, alen = _rand_batch(rng, B, int(rng.integers(4, 200)))
        b, blen = _rand_batch(rng, B, int(rng.integers(4, 200)))
        _plant_homology(rng, a, b)

        dev = np.asarray(edit_distance_batch_padded(
            jnp.asarray(a), jnp.asarray(b),
            jnp.asarray(alen), jnp.asarray(blen)))
        nat = edit_distance_batch(a, b, alen, blen)  # cpu -> native path
        np.testing.assert_array_equal(nat, dev, err_msg=str(trial))


def test_edit_native_long_multiblock(rng):
    """> 64-base (multi-word) and > 128-base (3-word) Myers blocks vs the
    scalar oracle."""
    from ciri_long_tpu.ops.edit import edit_distance, edit_distance_batch
    from ciri_long_tpu.utils.seq import decode_seq

    for L in (70, 130, 400):
        B = 8
        a, alen = _rand_batch(rng, B, L, n_frac=0.0)
        b, blen = _rand_batch(rng, B, L + 37, n_frac=0.0)
        _plant_homology(rng, a, b)
        nat = edit_distance_batch(a, b, alen, blen)
        for t in range(B):
            sa = decode_seq(a[t, :alen[t]])
            sb = decode_seq(b[t, :blen[t]])
            assert nat[t] == edit_distance(sa, sb), (L, t)


def test_sw_traceback_native_vs_python(rng):
    """Native traceback vs the numpy implementation (same module, forced
    fallback) -- identical tuples including the cigar walk."""
    import ciri_long_tpu.ops.traceback as tb

    for trial in range(40):
        n = int(rng.integers(1, 120))
        m = int(rng.integers(1, 120))
        q = rng.integers(0, 4, n).astype(np.int8)
        r = rng.integers(0, 4, m).astype(np.int8)
        if n >= 10 and m >= 10:
            L = int(rng.integers(5, min(n, m)))
            r[:L] = q[:L]
        q[rng.random(n) < 0.03] = 4

        native = tb.sw_traceback(q, r, 10, 4, 8, 2)

        saved = tb._NATIVE
        tb._NATIVE = None           # force the numpy fallback
        try:
            legacy = tb.sw_traceback(q, r, 10, 4, 8, 2)
        finally:
            tb._NATIVE = saved
        if native is None or legacy is None:
            assert native is None and legacy is None
            continue
        assert native[:5] == legacy[:5], trial
        assert [tuple(x) for x in native[5]] == \
            [tuple(x) for x in legacy[5]], trial
