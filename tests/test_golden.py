"""Byte-exact snapshot regression over the full call + collapse pipeline.

The reference's judge-facing contract is output equivalence at the file
level (SURVEY.md §4); this test freezes our own outputs the same way so
refactors that silently change records are caught.  After an INTENTIONAL
behavior change, regenerate with ``python -m tests.goldengen`` and review
the diff.
"""

import os

import pytest

from tests.goldengen import GOLDEN_DIR, OUTPUTS, run_pipeline


@pytest.mark.skipif(not os.path.isdir(GOLDEN_DIR),
                    reason="golden outputs not generated yet")
def test_pipeline_outputs_byte_stable(tmp_path):
    out = run_pipeline(str(tmp_path))
    for name in OUTPUTS:
        got = open(os.path.join(out, name)).read()
        want = open(os.path.join(GOLDEN_DIR, name)).read()
        assert got == want, (
            "{} drifted from tests/golden/ -- if the change is intentional, "
            "regenerate with `python -m tests.goldengen` and review the "
            "diff".format(name))
