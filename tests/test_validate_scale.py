"""Scale validation (VERDICT r1 item 10): the simulated-truth benchmark at
>=10k circular reads / 40 loci must hold recall and precision >= 0.99.

Marked slow (several minutes); run with `pytest -m slow` or the full
suite.  benchmarks/validate.py is the same harness the driver runs."""

import sys

import pytest

sys.path.insert(0, ".")


@pytest.mark.slow
def test_validate_10k_reads_40_loci():
    from benchmarks.validate import run

    res = run(reads=10_000, genome_kb=2000, loci=40, threads=4, tol=5,
              seed=1)
    assert res['true_loci'] == 40
    assert res['value'] >= 0.99, res          # recall
    assert res['precision'] >= 0.99, res
