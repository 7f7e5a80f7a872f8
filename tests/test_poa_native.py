"""Parity: native full-POA pipeline (_poacore.poa_all) vs the Python graph
path it replaces (ops/poa.py::_poa_python).

The native path must be byte-identical -- it serves the reference's spoa
calls (collapse.py:267,504) and the 2-unit CCS consensus (ops/ccs.py), all
of which feed byte-exact golden outputs.
"""

import numpy as np
import pytest

import importlib

poa_mod = importlib.import_module("ciri_long_tpu.ops.poa")

_poacore = pytest.importorskip("ciri_long_tpu._poacore")

SCORES = (10, -4, -8, -2, -24, -1)   # spoa-parity scoring (collapse.py:267)


def _native(codes, scores=SCORES):
    lens = np.array([len(c) for c in codes], np.int32)
    concat = (np.concatenate([np.ascontiguousarray(c, np.uint8)
                              for c in codes if len(c)])
              if lens.sum() else np.zeros(0, np.uint8))
    buf = _poacore.poa_all(concat.tobytes(), lens.tobytes(), *scores)
    return np.frombuffer(buf, np.uint8).astype(np.int8)


def _mutate(rng, base, err):
    out = base.tolist()
    nmut = rng.binomial(len(out), err)
    for _ in range(nmut):
        p = int(rng.integers(0, max(1, len(out))))
        r = rng.random()
        if r < 0.5:
            out[p % len(out)] = int(rng.integers(0, 4))
        elif r < 0.75 and len(out) > 5:
            del out[p % len(out)]
        else:
            out.insert(p % (len(out) + 1), int(rng.integers(0, 4)))
    return np.array(out, np.int8)


def test_poa_all_matches_python_on_unit_sets(rng):
    for _ in range(60):
        L = int(rng.integers(20, 400))
        base = rng.integers(0, 4, L).astype(np.int8)
        U = int(rng.integers(2, 8))
        codes = [_mutate(rng, base, err=0.05) for _ in range(U)]
        got = _native(codes)
        want = poa_mod._poa_python(codes, *SCORES)
        assert np.array_equal(got, want)


def test_poa_all_matches_python_with_partials(rng):
    # the CCS 2-unit path: full units + short head/tail fragments
    for _ in range(40):
        L = int(rng.integers(60, 500))
        base = rng.integers(0, 4, L).astype(np.int8)
        codes = [_mutate(rng, base, 0.08), _mutate(rng, base, 0.08)]
        for _ in range(int(rng.integers(1, 4))):
            cut = int(rng.integers(L // 5, L))
            frag = _mutate(rng, base, 0.08)
            codes.append(frag[:cut] if rng.random() < 0.5 else frag[-cut:])
        got = _native(codes)
        want = poa_mod._poa_python(codes, *SCORES)
        assert np.array_equal(got, want)


def test_poa_all_unrelated_and_edges(rng):
    # unrelated sequences, empties, single input
    for _ in range(20):
        codes = [rng.integers(0, 5, int(rng.integers(0, 80))).astype(np.int8)
                 for _ in range(int(rng.integers(1, 6)))]
        got = _native(codes)
        want = poa_mod._poa_python(codes, *SCORES)
        assert np.array_equal(got, want)
    assert len(_native([np.zeros(0, np.int8)])) == 0


def test_poa_entrypoint_uses_native(rng, monkeypatch):
    # the public poa() must produce identical output with the native path
    # forced off (CIRI_NATIVE_POA=0) and on
    base = rng.integers(0, 4, 120).astype(np.int8)
    codes = [_mutate(rng, base, 0.06) for _ in range(5)]
    on, _ = poa_mod.poa(codes)
    monkeypatch.setenv('CIRI_NATIVE_POA', '0')
    off, _ = poa_mod.poa(codes)
    assert np.array_equal(on, off)
