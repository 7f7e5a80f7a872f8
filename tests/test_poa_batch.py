"""Device POA (ops/poa_batch.py) parity vs the sequential host/native path.

The lockstep driver (ops/poa.py::poa_consensus_many with use_device=True)
must produce byte-identical consensus to per-job poa() -- the same
contract the pipeline relies on when the device path engages on the TPU
backend (collapse cluster consensus, reference collapse.py:504).
"""

import numpy as np
import pytest

from ciri_long_tpu.ops.poa import poa, poa_consensus_many
from tests.test_poa import SEGMENTS, mutate


def _jobs_equal(jobs):
    want = [poa(seqs, 2, False, 10, -4, -8, -2, -24, -1)[0] for seqs in jobs]
    got = poa_consensus_many(jobs, use_device=True)
    assert got == want, [
        (i, g, w) for i, (g, w) in enumerate(zip(got, want)) if g != w][:3]


def test_device_poa_identical_copies():
    _jobs_equal([["ACGTACGTTGCAGGGCATCGATCG"] * 5])


def test_device_poa_reference_segments():
    _jobs_equal([SEGMENTS])


def test_device_poa_single_and_empty():
    _jobs_equal([["ACGT"], ["ACGTAC", ""], [""], ["", "GGGT", "GGAT"]])


def test_device_poa_fuzz_batch(rng):
    jobs = []
    for _ in range(12):
        template = "".join(rng.choice(list("ACGTN"),
                                      size=int(rng.integers(20, 220))))
        k = int(rng.integers(2, 9))
        sub = float(rng.uniform(0.0, 0.12))
        jobs.append([mutate(rng, template, sub=sub, ins=sub / 2,
                            dele=sub / 2) for _ in range(k)])
    _jobs_equal(jobs)


def test_device_poa_fuzz_indel_heavy(rng):
    jobs = []
    for _ in range(6):
        template = "".join(rng.choice(list("ACGT"),
                                      size=int(rng.integers(30, 120))))
        jobs.append([mutate(rng, template, sub=0.05, ins=0.12, dele=0.12)
                     for _ in range(int(rng.integers(2, 6)))])
    _jobs_equal(jobs)


def test_device_poa_mixed_lengths(rng):
    """Jobs landing in different shape buckets within one lockstep round."""
    t1 = "".join(rng.choice(list("ACGT"), size=40))
    t2 = "".join(rng.choice(list("ACGT"), size=500))
    jobs = [[mutate(rng, t1) for _ in range(3)],
            [mutate(rng, t2) for _ in range(4)],
            [mutate(rng, t1) for _ in range(7)]]
    _jobs_equal(jobs)
