"""In-process reference-stage injection harness (stage-level differential).

Imports /root/reference/CIRI_long (read-only) with the repo's compute
kernels injected into every native dependency surface the reference's
algorithmic stages touch:

  * ``env.ALIGNER``              -> a repo GenomeAligner (models/aligner.py)
  * ``env.GENOME``/``CONTIG_LEN``-> the repo Genome (io/genome.py), duck-typed
                                    to the reference Fasta surface
                                    (align.py:210-223)
  * ``libs.striped_smith_waterman.ssw_wrap.Aligner``
                                 -> repo SW kernels: ops/sw.py score+ends
                                    (ssw_wrap.py:174-230 contract) and
                                    ops/traceback.py when report_cigar
  * ``spoa.poa``                 -> ops/poa.py::poa (pyspoa signature,
                                    collapse.py:267,504)
  * ``edlib`` / ``Levenshtein``  -> ops/edit.py::edit_distance
                                    (utils.py:153-159 contract)
  * ``pysam``                    -> inert stub (genome access is injected)

With the kernels and data access held fixed, a record-level diff between
a reference stage (scan_ccs_chunk find_bsj.py:236-325, recover_ccs_chunk
find_bsj.py:375-448, scan_raw_chunk find_bsj.py:499-620, correct_cluster
collapse.py:235-417) and the repo's rebuilt stage validates the GLUE:
filter thresholds, chimera geometry, signal-correction decisions,
cirexon assembly and record formatting.

Determinism: the reference's ``sort_ss`` iterates ``set(sites)`` whose
order is hash-seed dependent (align.py:710-728), so equal-key ties are
nondeterministic in the reference itself.  ``pin_deterministic_ties``
replaces it with the repo's deterministic twin, whose key-level parity
is proven independently by tests/test_refparity.py::test_sort_ss_parity.
Every other decision path in the reference stages is deterministic given
fixed kernels (site enumeration is loop-ordered; the only other set
iterations -- host-strand sets in align.py:587,642 and retained-intron
sets in collapse.py:318-320 -- feed either the pinned sort or an
explicit score sort that the differential triages on ties).
"""

import sys
import types

import numpy as np

REF_ROOT = '/root/reference'


# ---------------------------------------------------------------------------
# kernel-injection stubs
# ---------------------------------------------------------------------------

class _SSWAlignRes:
    """PyAlignRes surface (ssw_wrap.py:267-379): inclusive end coords."""

    __slots__ = ('score', 'ref_begin', 'ref_end', 'query_begin', 'query_end',
                 'cigar_string')

    def __init__(self, score, rb, re_, qb, qe, cigar_string=None):
        self.score = score
        self.ref_begin = rb
        self.ref_end = re_
        self.query_begin = qb
        self.query_end = qe
        self.cigar_string = cigar_string


class InjectedSSWAligner:
    """ssw_wrap.Aligner twin over the repo's SW kernels.

    Constructor/align signatures follow ssw_wrap.py:40-230: the
    constructor takes the REFERENCE sequence, ``align`` the query; score
    parameters are positive magnitudes; end coordinates are inclusive.
    ``report_cigar`` routes through the repo's full-traceback kernel
    (ops/traceback.py::sw_traceback), exactly the path the repo's own
    collapse stage uses -- so a differential run exercises identical
    alignments on both sides and diffs only the surrounding glue.
    """

    def __init__(self, ref_seq="", match=2, mismatch=2, gap_open=3,
                 gap_extend=1, report_secondary=False, report_cigar=False):
        from ciri_long_tpu.ops.sw import SWParams
        from ciri_long_tpu.utils.seq import encode_seq
        self.ref_seq = ref_seq
        self.ref_codes = encode_seq(ref_seq)
        self.params = SWParams(match, mismatch, gap_open, gap_extend)
        self.report_cigar = report_cigar

    def align(self, query_seq, min_score=0, min_len=0):
        from ciri_long_tpu.ops.traceback import cigar_to_string, sw_traceback
        from ciri_long_tpu.pipeline.find_bsj import ssw_align
        from ciri_long_tpu.utils.seq import encode_seq

        q = encode_seq(query_seq)
        if self.report_cigar:
            tb = sw_traceback(q, self.ref_codes, self.params.match,
                              self.params.mismatch, self.params.gap_open,
                              self.params.gap_extend)
            if tb is None:
                # zero-score alignment: empty cigar makes
                # find_alignment_pos return None (align.py:803-820)
                res = _SSWAlignRes(0, 0, 0, 0, 0, cigar_string='')
            else:
                score, qb, qe, rb, re_, cigar = tb
                res = _SSWAlignRes(score, rb, re_, qb, qe,
                                   cigar_string=cigar_to_string(cigar))
        else:
            r = ssw_align(q, self.ref_codes, self.params)
            res = _SSWAlignRes(r.score, r.ref_begin, r.ref_end,
                               r.query_begin, r.query_end)
        match_len = res.query_end - res.query_begin + 1
        if res.score >= min_score and match_len >= min_len:
            return res
        return None


class RefGenome:
    """Reference align.Fasta duck (align.py:210-223) over a repo Genome."""

    def __init__(self, genome):
        self._genome = genome
        self.contig_len = dict(genome.contig_len)

    def seq(self, contig, start, end):
        return self._genome.seq(contig, start, end)


def _install_stubs():
    """Install kernel-backed stub modules for every wheel the reference
    stages import lazily.  Idempotent."""
    if 'libs.striped_smith_waterman.ssw_wrap' in sys.modules:
        return

    pysam = types.ModuleType('pysam')
    pysam.FastaFile = object
    sys.modules.setdefault('pysam', pysam)

    libs = types.ModuleType('libs')
    ssw_pkg = types.ModuleType('libs.striped_smith_waterman')
    ssw_wrap = types.ModuleType('libs.striped_smith_waterman.ssw_wrap')
    ssw_wrap.Aligner = InjectedSSWAligner
    libs.striped_smith_waterman = ssw_pkg
    ssw_pkg.ssw_wrap = ssw_wrap
    sys.modules['libs'] = libs
    sys.modules['libs.striped_smith_waterman'] = ssw_pkg
    sys.modules['libs.striped_smith_waterman.ssw_wrap'] = ssw_wrap

    spoa = types.ModuleType('spoa')

    def _poa(seqs, algorithm=2, genmsa=False, m=10, x=-4, o1=-8, e1=-2,
             o2=-24, e2=-1):
        from ciri_long_tpu.ops.poa import poa
        return poa(list(seqs), algorithm, genmsa, m, x, o1, e1, o2, e2)

    spoa.poa = _poa
    sys.modules['spoa'] = spoa

    edlib = types.ModuleType('edlib')

    def _edlib_align(x, y, *args, **kwargs):
        from ciri_long_tpu.ops.edit import edit_distance
        return {'editDistance': edit_distance(x, y)}

    edlib.align = _edlib_align
    sys.modules['edlib'] = edlib

    lev = types.ModuleType('Levenshtein')

    def _lev_distance(x, y):
        from ciri_long_tpu.ops.edit import edit_distance
        return edit_distance(x, y)

    lev.distance = _lev_distance
    sys.modules['Levenshtein'] = lev


_REF_CACHE = None


def reference_modules():
    """Import the reference package once with all stubs installed.

    Returns a namespace with align / collapse / find_bsj / env / utils.
    """
    global _REF_CACHE
    if _REF_CACHE is not None:
        return _REF_CACHE
    _install_stubs()
    sys.path.insert(0, REF_ROOT)
    try:
        from CIRI_long import align as ref_align
        from CIRI_long import collapse as ref_collapse
        from CIRI_long import env as ref_env
        from CIRI_long import find_bsj as ref_find_bsj
        from CIRI_long import utils as ref_utils
    finally:
        sys.path.remove(REF_ROOT)
    _REF_CACHE = types.SimpleNamespace(
        align=ref_align, collapse=ref_collapse, env=ref_env,
        find_bsj=ref_find_bsj, utils=ref_utils)
    return _REF_CACHE


def pin_deterministic_ties(ref):
    """Replace the reference's hash-order-dependent sort_ss with the
    repo's deterministic, key-parity-proven twin (see module docstring).

    find_annotated_signal / find_denovo_signal / search_splice_signal all
    resolve ``sort_ss`` through align.py's module globals, so patching
    the align module covers every caller."""
    from ciri_long_tpu.annot.signal import sort_ss
    ref.align.sort_ss = sort_ss
    # find_bsj.py did `from CIRI_long.align import *`, binding its own
    # copy of the name (used by the legacy search_splice_signal only)
    ref.find_bsj.sort_ss = sort_ss


def set_reference_env(ref, ctx):
    """Point the reference's worker globals (env.py:1-21) at the repo's
    Context: same aligner instance, same genome bytes, same indices."""
    ref.env.ALIGNER = ctx.aligner
    ref.env.GENOME = RefGenome(ctx.genome)
    ref.env.CONTIG_LEN = dict(ctx.genome.contig_len)
    ref.env.GTF_INDEX = ctx.gtf_index
    ref.env.INTRON_INDEX = ctx.intron_index
    ref.env.SS_INDEX = ctx.ss_index


def load_reference(ctx, deterministic_ties=True):
    """One-call setup: import, inject, env-bind.  Returns the namespace."""
    ref = reference_modules()
    if deterministic_ties:
        pin_deterministic_ties(ref)
    set_reference_env(ref, ctx)
    return ref
