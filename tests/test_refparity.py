"""Cross-implementation parity fuzz: the reference's pure-Python host glue
(/root/reference/CIRI_long) imported directly and compared against the
repo's rebuilt twins on random inputs.

The reference modules import cleanly once ``pysam`` is stubbed (it is only
used for genome file access, which these tests replace with in-memory
genomes).  Native wheels (mappy/spoa/edlib/...) are imported lazily inside
functions the tests never call.

Deliberate, documented deviations (asserted explicitly where they bite):
  * sort_ss / find_*_signal: the reference sorts a ``set(sites)`` whose
    iteration order is hash-seed dependent; ties under the sort keys are
    therefore nondeterministic in the reference.  Our twin presorts, so on
    a tie both answers must carry identical sort keys.
  * cluster_reads: within-cluster read order on equal-length sequences is
    set-iteration dependent in the reference; cluster membership must
    match exactly.
"""

import random
import string
import sys
import types

import numpy as np
import pytest


REF_ROOT = '/root/reference'


@pytest.fixture(scope='module')
def ref():
    """Import the reference package (read-only) with a pysam stub."""
    created_stub = False
    if 'pysam' not in sys.modules:
        stub = types.ModuleType('pysam')
        stub.FastaFile = object
        sys.modules['pysam'] = stub
        created_stub = True
    sys.path.insert(0, REF_ROOT)
    try:
        from CIRI_long import align as ref_align
        from CIRI_long import collapse as ref_collapse
        from CIRI_long import env as ref_env
        from CIRI_long import utils as ref_utils
        yield types.SimpleNamespace(align=ref_align, collapse=ref_collapse,
                                    env=ref_env, utils=ref_utils)
    finally:
        sys.path.remove(REF_ROOT)
        if created_stub:
            del sys.modules['pysam']


def _rand_seq(rng, n):
    return ''.join(rng.choice(list('ACGT'), size=n))


def _repeaty_genome(rng, n, period=37):
    """Genome with planted tandem structure so free-sliding homology around
    junctions is frequently nonzero."""
    unit = _rand_seq(rng, period)
    reps = (n // period) + 2
    seq = (unit * reps)[:n]
    # sprinkle point mutations so homology runs terminate
    arr = list(seq)
    for p in rng.integers(0, n, size=n // 12):
        arr[p] = 'ACGT'[rng.integers(0, 4)]
    return ''.join(arr)


class _RefFasta:
    """Duck-type of reference align.Fasta (align.py:210-223)."""

    def __init__(self, contigs):
        self.genome = dict(contigs)
        self.contig_len = {k: len(v) for k, v in contigs.items()}

    def seq(self, contig, start, end):
        if contig not in self.genome:
            return None
        return self.genome[contig][start:end]


def _setup_env(ref, contigs, ss_index=None, gtf_index=None,
               intron_index=None):
    ref.env.GENOME = _RefFasta(contigs)
    ref.env.CONTIG_LEN = {k: len(v) for k, v in contigs.items()}
    ref.env.SS_INDEX = ss_index
    ref.env.GTF_INDEX = gtf_index
    ref.env.INTRON_INDEX = intron_index


def _our_ctx(contigs, ss_index=None, gtf_index=None, intron_index=None):
    from ciri_long_tpu.context import Context
    from ciri_long_tpu.io.genome import Genome
    genome = Genome.from_dict(contigs)
    return Context(aligner=None, genome=genome, gtf_index=gtf_index,
                   intron_index=intron_index, ss_index=ss_index)


# ---------------------------------------------------------------------------
# utils parity
# ---------------------------------------------------------------------------

def test_utils_parity(ref, rng):
    from ciri_long_tpu.utils.misc import min_sorted_items
    from ciri_long_tpu.utils.seq import (compress_seq, get_junc_seq, revcomp,
                                         transform_seq)

    for _ in range(200):
        s = _rand_seq(rng, int(rng.integers(1, 120)))
        assert revcomp(s) == ref.utils.revcomp(s)
        assert compress_seq(s) == ref.utils.compress_seq(s)
        bsj = int(rng.integers(0, len(s)))
        assert transform_seq(s, bsj) == ref.utils.transform_seq(s, bsj)
        width = int(rng.integers(1, 30))
        assert get_junc_seq(s, bsj, width) == \
            ref.utils.get_junc_seq(s, bsj, width), (s, bsj, width)
        # negative bsj (used by correct_cluster with -max(head_pos) // 2)
        assert get_junc_seq(s, -bsj, width) == \
            ref.utils.get_junc_seq(s, -bsj, width), (s, -bsj, width)

    for _ in range(100):
        items = [tuple(int(x) for x in rng.integers(0, 5, size=4))
                 for _ in range(int(rng.integers(1, 12)))]
        key = int(rng.integers(0, 4))
        for rev in (False, True):
            assert min_sorted_items(items, key, rev) == \
                ref.utils.min_sorted_items(items, key, rev)


# ---------------------------------------------------------------------------
# splice-signal machinery
# ---------------------------------------------------------------------------

def _rand_ss_index(rng, tree_factory, contig, positions):
    idx = tree_factory()
    for pos in positions:
        strand = '+-'[rng.integers(0, 2)]
        kind = ('start', 'end')[rng.integers(0, 2)]
        idx[contig][int(pos)][strand][kind] = 1
    return idx


def _ss_keys(site_tuples, picked):
    """Sort keys (weight, altered_len, clip_altered, altered_total) of the
    site tuples matching a sort_ss result (id, strand, i, j)."""
    for t in site_tuples:
        if (t[0], t[1], t[2], t[3]) == tuple(picked):
            return t[4:]
    return None


def test_sort_ss_parity(ref, rng):
    from ciri_long_tpu.annot.signal import get_ss_altered_length, sort_ss
    n_tie_checked = 0
    for _ in range(400):
        us, ds = int(rng.integers(0, 6)), int(rng.integers(0, 6))
        clip = int(rng.integers(0, 8))
        sites = []
        for _ in range(int(rng.integers(1, 10))):
            i, j = int(rng.integers(-10, 10)), int(rng.integers(-10, 10))
            w = int(rng.integers(0, 4))
            ss_id = 'S{}-{}'.format(i, j)
            sites.append((ss_id, '+-'[rng.integers(0, 2)], i, j, w,
                          *get_ss_altered_length(i, j, us, ds, clip)))
        ours = sort_ss(list(sites), us, ds, clip)
        theirs = ref.align.sort_ss(list(sites), us, ds, clip)
        assert ref.align.get_ss_altered_length(1, 2, us, ds, clip) == \
            get_ss_altered_length(1, 2, us, ds, clip)
        if ours == theirs:
            continue
        # reference ties are hash-order dependent: keys must match
        assert _ss_keys(sites, ours) == _ss_keys(sites, theirs), \
            (sites, us, ds, clip, ours, theirs)
        n_tie_checked += 1
    # sanity: differences must be rare tie cases, not systematic
    assert n_tie_checked < 60


def test_annotated_signal_parity(ref, rng):
    from ciri_long_tpu.annot.signal import find_annotated_signal
    from ciri_long_tpu.utils.misc import tree

    for trial in range(60):
        glen = 4000
        g = {'chr1': _repeaty_genome(rng, glen)}
        start = int(rng.integers(200, glen - 600))
        end = start + int(rng.integers(60, 400))
        clip = int(rng.integers(0, 6))
        # annotated sites clustered around the junctions
        positions = np.concatenate([
            rng.integers(start - 12, start + 12, size=4),
            rng.integers(end - 12, end + 12, size=4)])
        ss = _rand_ss_index(rng, tree, 'chr1', positions)

        _setup_env(ref, g, ss_index=ss)
        ctx = _our_ctx(g, ss_index=ss)

        r_site, r_us, r_ds, r_sig = ref.align.find_annotated_signal(
            'chr1', start, end, clip)
        o_site, o_us, o_ds, o_sig = find_annotated_signal(
            ctx, 'chr1', start, end, clip)

        assert (o_us, o_ds) == (r_us, r_ds), (trial, start, end)
        assert o_sig == r_sig
        if o_site == r_site:
            continue
        assert o_site is not None and r_site is not None, \
            (trial, start, end, o_site, r_site)
        # tie under the reference's nondeterministic set ordering:
        # reconstruct keys via get_ss_altered_length and compare
        from ciri_long_tpu.annot.signal import get_ss_altered_length
        ko = get_ss_altered_length(o_site[2], o_site[3], o_us, o_ds, clip)
        kr = get_ss_altered_length(r_site[2], r_site[3], r_us, r_ds, clip)
        assert ko == kr, (trial, o_site, r_site)


def test_denovo_signal_parity(ref, rng):
    from ciri_long_tpu.annot.signal import (find_annotated_signal,
                                            find_denovo_signal,
                                            get_ss_altered_length)

    for trial in range(60):
        glen = 4000
        g = {'chr1': _repeaty_genome(rng, glen)}
        start = int(rng.integers(200, glen - 600))
        end = start + int(rng.integers(60, 400))
        clip = int(rng.integers(0, 6))
        host = ({}, {'+': [1]}, {'-': [1]},
                {'+': [1], '-': [1]})[rng.integers(0, 4)] or None
        is_canon = bool(rng.integers(0, 2))

        _setup_env(ref, g, ss_index=None)
        ctx = _our_ctx(g)

        # reuse each side's own annotated pass to produce tmp_signal
        _, r_us, r_ds, r_sig = ref.align.find_annotated_signal(
            'chr1', start, end, clip)
        _, o_us, o_ds, o_sig = find_annotated_signal(
            ctx, 'chr1', start, end, clip)
        assert (o_us, o_ds, o_sig) == (r_us, r_ds, r_sig)

        r_site = ref.align.find_denovo_signal(
            'chr1', start, end, host, r_sig, r_us, r_ds, clip, 10, 3,
            is_canon)
        o_site = find_denovo_signal(
            ctx, 'chr1', start, end, host, o_sig, o_us, o_ds, clip, 10, 3,
            is_canon)

        if o_site == r_site:
            continue
        assert o_site is not None and r_site is not None, \
            (trial, start, end, o_site, r_site)
        ko = get_ss_altered_length(o_site[2], o_site[3], o_us, o_ds, clip)
        kr = get_ss_altered_length(r_site[2], r_site[3], r_us, r_ds, clip)
        assert ko == kr, (trial, o_site, r_site)


def test_equivalent_seq_parity(ref, rng):
    from ciri_long_tpu.annot.signal import equivalent_seq
    from ciri_long_tpu.io.genome import Genome

    for _ in range(80):
        glen = 3000
        g = {'chrX': _repeaty_genome(rng, glen, period=11)}
        genome = Genome.from_dict(g)
        rf = _RefFasta(g)
        start = int(rng.integers(150, glen - 500))
        end = start + int(rng.integers(50, 300))
        for strand in ('+', '-', None):
            assert equivalent_seq(genome, 'chrX', start, end, strand) == \
                ref.collapse.equivalent_seq(rf, 'chrX', start, end, strand)


# ---------------------------------------------------------------------------
# annotation index + gtf parsing
# ---------------------------------------------------------------------------

def _write_gtf(path, rng, n_genes=6):
    lines = ['#!genebuild test']
    pos = 100
    for gi in range(n_genes):
        glen = int(rng.integers(600, 3000))
        strand = '+-'[rng.integers(0, 2)]
        gid = 'G{:03d}'.format(gi)
        attrs = ('gene_id "{}"; gene_name "NM_{}"; gene_type "protein_coding";'
                 .format(gid, gi))
        lines.append('\t'.join(['chr1', 'test', 'gene', str(pos),
                                str(pos + glen), '.', strand, '.', attrs]))
        # exons of one transcript
        epos = pos
        for ti in range(int(rng.integers(1, 3))):
            tid = '{}.t{}'.format(gid, ti)
            epos = pos
            for _ in range(int(rng.integers(1, 5))):
                elen = int(rng.integers(60, 300))
                if epos + elen > pos + glen:
                    break
                ea = attrs + ' transcript_id "{}";'.format(tid)
                lines.append('\t'.join(
                    ['chr1', 'test', 'exon', str(epos), str(epos + elen),
                     '.', strand, '.', ea]))
                epos += elen + int(rng.integers(50, 400))
        pos += glen + int(rng.integers(200, 800))
    path.write_text('\n'.join(lines) + '\n')
    return pos + 1000


def _norm_gtf_index(idx):
    out = {}
    for ctg, bins in idx.items():
        out[ctg] = {
            b: [(f.contig, f.type, f.start, f.end, f.strand,
                 tuple(sorted(f.attr.items()))) for f in feats]
            for b, feats in bins.items()}
    return out


def _norm_tree(t):
    if isinstance(t, dict):
        return {k: _norm_tree(v) for k, v in t.items()}
    return t


def test_index_annotation_parity(ref, rng, tmp_path):
    from ciri_long_tpu.annot.gtf import index_annotation

    gtf = tmp_path / 'test.gtf'
    _write_gtf(gtf, rng)

    r_gtf, r_intron, r_ss = ref.align.index_annotation(str(gtf))
    o_gtf, o_intron, o_ss = index_annotation(str(gtf))

    assert _norm_gtf_index(o_gtf) == _norm_gtf_index(r_gtf)
    assert {k: dict(v) for k, v in o_intron.items()} == \
        {k: dict(v) for k, v in r_intron.items()}
    assert _norm_tree(o_ss) == _norm_tree(r_ss)


def test_index_circ_parity(ref, rng, tmp_path):
    from ciri_long_tpu.annot.gtf import index_circ

    bed = tmp_path / 'circ.bed'
    rows = []
    for i in range(20):
        st = int(rng.integers(100, 100000))
        rows.append('chr{}\t{}\t{}\t{}'.format(
            rng.integers(1, 3), st, st + int(rng.integers(100, 5000)),
            '+-'[rng.integers(0, 2)]))
    rows.append('chr1\tnot_an_int\t5\t+')
    bed.write_text('\n'.join(rows) + '\n')

    assert _norm_tree(index_circ(str(bed), None)) == \
        _norm_tree(ref.align.index_circ(str(bed), None))


def test_find_host_gene_and_overlaps_parity(ref, rng, tmp_path):
    from ciri_long_tpu.annot.gtf import index_annotation
    from ciri_long_tpu.annot.signal import (find_host_gene,
                                            find_overlap_exons,
                                            find_retained_introns)

    gtf = tmp_path / 'host.gtf'
    glen = _write_gtf(gtf, rng)
    o_gtf, o_intron, _ = index_annotation(str(gtf))
    r_gtf, r_intron, _ = ref.align.index_annotation(str(gtf))

    g = {'chr1': 'A' * glen}
    _setup_env(ref, g, gtf_index=r_gtf, intron_index=r_intron)
    ctx = _our_ctx(g, gtf_index=o_gtf, intron_index=o_intron)

    def norm_host(h):
        if h is None:
            return None
        return {s: [(e.start, e.end, e.type) for e in v]
                for s, v in h.items()}

    for _ in range(120):
        start = int(rng.integers(0, glen - 2000))
        end = start + int(rng.integers(100, 2000))
        assert norm_host(find_host_gene(ctx, 'chr1', start, end)) == \
            norm_host(ref.align.find_host_gene('chr1', start, end))
        assert find_retained_introns(ctx, 'chr1', start, end) == \
            ref.align.find_retained_introns('chr1', start, end)
        assert find_overlap_exons(ctx, 'chr1', start, end) == \
            ref.align.find_overlap_exons('chr1', start, end)


def test_circ_attr_parity(ref, rng, tmp_path):
    from ciri_long_tpu.annot.gtf import index_annotation
    from ciri_long_tpu.pipeline.collapse import circ_attr

    gtf = tmp_path / 'attr.gtf'
    glen = _write_gtf(gtf, rng)
    o_gtf, _, _ = index_annotation(str(gtf))
    r_gtf, _, _ = ref.align.index_annotation(str(gtf))

    for _ in range(120):
        start = int(rng.integers(0, glen - 2000))
        end = start + int(rng.integers(100, 2000))
        strand = ('+', '-', 'None')[rng.integers(0, 3)]
        assert circ_attr(o_gtf, 'chr1', start, end, strand) == \
            ref.collapse.circ_attr(r_gtf, 'chr1', start, end, strand)


# ---------------------------------------------------------------------------
# collapse host glue
# ---------------------------------------------------------------------------

def _rand_reads(rng, n):
    """Reads drawn around a handful of loci with +-15 bp junction jitter so
    BSJ clusters genuinely share start/end groups (the 20 bp-tolerance and
    bin-index paths of cluster_reads are only exercised by collisions)."""
    from ciri_long_tpu.pipeline.collapse import READ
    n_loci = max(2, n // 8)
    loci = []
    for _ in range(n_loci):
        ctg = 'chr{}'.format(rng.integers(1, 3))
        st = int(rng.integers(1000, 40000))
        loci.append((ctg, st, st + int(rng.integers(100, 3000))))
    reads = {}
    for i in range(n):
        ctg, st, en = loci[rng.integers(0, n_loci)]
        st += int(rng.integers(-15, 16))
        en += int(rng.integers(-15, 16))
        rid = 'read{:04d}'.format(i)
        reads[rid] = READ(rid, '{}:{}-{}'.format(ctg, st, en), '+', 'NA',
                          'NA', '0|0-100', 'seg', 'A' * int(rng.integers(50, 400)),
                          's1', 'full')
    return reads


def test_cluster_reads_parity(ref, rng):
    from ciri_long_tpu.pipeline.collapse import cluster_reads

    for _ in range(10):
        reads = _rand_reads(rng, int(rng.integers(5, 80)))
        ours = cluster_reads(reads)
        theirs = ref.collapse.cluster_reads(reads)
        assert [sorted(r.read_id for r in cl) for cl in ours] == \
            [sorted(r.read_id for r in cl) for cl in theirs]


def test_cluster_bins_merge_cirexons_parity(ref, rng):
    from ciri_long_tpu.pipeline.collapse import (Exon, cluster_bins,
                                                 merge_cirexons)

    for _ in range(100):
        pos = list(rng.integers(0, 500, size=int(rng.integers(1, 40))))
        assert cluster_bins(pos, 10) == ref.collapse.cluster_bins(pos, 10)

    for _ in range(100):
        n = int(rng.integers(1, 8))
        sts = np.sort(rng.integers(0, 2000, size=n))
        ours_ex = [Exon(int(s), int(s) + int(rng.integers(10, 300)))
                   for s in sts]
        ref_ex = [ref.collapse.Exon(e.start, e.end) for e in ours_ex]
        assert [str(e) for e in merge_cirexons(ours_ex)] == \
            [str(e) for e in ref.collapse.merge_cirexons(ref_ex)]


def test_by_circ_by_isoform_parity(ref, rng):
    from ciri_long_tpu.pipeline.collapse import by_circ, by_isoform

    ctgs = ['chr1', 'chr22', 'chrX', 'chrY', 'chrM', 'scaffold_12', '5', 'x']
    for ctg in ctgs:
        cid = '{}:{}-{}'.format(ctg, int(rng.integers(1, 10000)),
                                int(rng.integers(10000, 20000)))
        assert by_circ(cid) == ref.collapse.by_circ(cid)
        iso = cid + '|100-200,300-400'
        assert by_isoform(iso) == ref.collapse.by_isoform(iso)


def test_curate_cirexons_parity(ref, rng):
    from ciri_long_tpu.pipeline.collapse import CIRC, READ, curate_cirexons

    for trial in range(30):
        glen = 6000
        g = {'chr1': _rand_seq(rng, glen)}
        circ_start = int(rng.integers(500, 2000))
        circ_end = circ_start + int(rng.integers(500, 3000))
        strand = '+-'[rng.integers(0, 2)]
        circ = CIRC('chr1', circ_start, circ_end, strand)
        ref_circ = ref.collapse.Circ('chr1', circ_start, circ_end, strand)

        cluster = []
        for i in range(int(rng.integers(2, 10))):
            n_ex = int(rng.integers(1, 4))
            bounds = np.sort(rng.integers(circ_start - 12, circ_end + 12,
                                          size=2 * n_ex))
            exs = []
            for e in range(n_ex):
                st, en = int(bounds[2 * e]), int(bounds[2 * e + 1])
                if en <= st:
                    en = st + 1
                exs.append('{}-{}|{}'.format(st, en, en - st + 1))
            rtype = 'full' if rng.integers(0, 4) else 'partial'
            cluster.append(READ('r{}'.format(i), 'chr1:{}-{}'.format(
                circ_start, circ_end), strand, ','.join(exs), 'NA',
                '0|0-100', 'seg', 'ACGT', 's1', rtype))

        _setup_env(ref, g)
        ctx = _our_ctx(g)
        ours = curate_cirexons(ctx, circ, cluster)
        theirs = ref.collapse.curate_cirexons(ref_circ, cluster)
        if ours is None or theirs is None:
            assert ours is None and theirs is None
            continue
        assert {k: [str(e) for e in v] for k, v in ours.items()} == \
            {k: [str(e) for e in v] for k, v in theirs.items()}, trial


def test_check_isoforms_parity(ref, rng):
    from ciri_long_tpu.pipeline.collapse import CIRC, check_isoforms

    for _ in range(60):
        glen = 4000
        g = {'chr1': _rand_seq(rng, glen)}
        strand = '+-'[rng.integers(0, 2)]
        circ = CIRC('chr1', 100, 3900, strand)
        ref_circ = ref.collapse.Circ('chr1', 100, 3900, strand)
        isoforms = []
        for _ in range(int(rng.integers(1, 4))):
            n_ex = int(rng.integers(1, 4))
            bounds = np.sort(rng.integers(100, 3900, size=2 * n_ex))
            isoforms.append(','.join(
                '{}-{}'.format(int(bounds[2 * e]),
                               max(int(bounds[2 * e + 1]),
                                   int(bounds[2 * e]) + 1))
                for e in range(n_ex)))
        _setup_env(ref, g)
        ctx = _our_ctx(g)
        assert check_isoforms(ctx, circ, isoforms) == \
            ref.collapse.check_isoforms(ref_circ, isoforms)


# ---------------------------------------------------------------------------
# hit / block utilities
# ---------------------------------------------------------------------------

def _rand_cigar(rng):
    """Realistic cigar: M-anchored, with I/D/N in between."""
    ops = [(int(rng.integers(5, 80)), 0)]
    for _ in range(int(rng.integers(0, 6))):
        kind = int(rng.integers(0, 3))
        if kind == 0:
            ops.append((int(rng.integers(1, 40)), 1))   # I (some > 20)
        elif kind == 1:
            ops.append((int(rng.integers(1, 30)), 2))   # D
        else:
            ops.append((int(rng.integers(30, 500)), 3))  # N
        ops.append((int(rng.integers(5, 80)), 0))
    return ops


class _DuckHit:
    def __init__(self, ctg, strand, r_st, q_st, cigar):
        self.ctg = ctg
        self.strand = strand
        self.r_st = r_st
        self.q_st = q_st
        self.cigar = list(cigar)
        self.is_primary = 1
        r_en, q_en = r_st, q_st
        for l, op in cigar:
            if op == 0:
                r_en += l
                q_en += l
            elif op == 1:
                q_en += l
            elif op in (2, 3):
                r_en += l
        self.r_en, self.q_en = r_en, q_en
        self.mlen = sum(l for l, op in cigar if op == 0)
        self.blen = sum(l for l, op in cigar if op in (0, 2, 3))


def _hit_key(h):
    return (h.ctg, h.strand, h.r_st, h.r_en, h.q_st, h.q_en, h.mlen,
            h.blen, list(h.cigar))


def test_blocks_and_long_insert_parity(ref, rng):
    from ciri_long_tpu.models.hits import (get_blocks, get_parital_blocks,
                                           merge_exons, remove_long_insert)

    for _ in range(150):
        cigar = _rand_cigar(rng)
        hit = _DuckHit('chr1', 1, int(rng.integers(0, 10000)),
                       int(rng.integers(0, 50)), cigar)
        ref_hit = _DuckHit('chr1', 1, hit.r_st, hit.q_st, cigar)

        assert get_blocks(hit) == ref.align.get_blocks(ref_hit)
        junc = int(rng.integers(0, hit.q_en + 20))
        assert get_parital_blocks(hit, junc) == \
            ref.align.get_parital_blocks(ref_hit, junc)

        ours = remove_long_insert(hit)
        theirs = ref.align.remove_long_insert(ref_hit)
        assert (ours.ctg, ours.strand, ours.r_st, ours.r_en, ours.q_st,
                ours.q_en, ours.mlen, ours.blen, list(ours.cigar)) == \
            (theirs.ctg, theirs.strand, theirs.r_st, theirs.r_en,
             theirs.q_st, theirs.q_en, theirs.mlen, theirs.blen,
             list(theirs.cigar))

    # merge_exons on random block lists
    for _ in range(100):
        def blocks():
            n = int(rng.integers(1, 4))
            sts = np.sort(rng.integers(0, 5000, size=n))
            return [[int(s), int(s) + int(rng.integers(20, 400)),
                     int(rng.integers(20, 400))] for s in sts]
        tail, head = blocks(), blocks()
        import copy
        ours = merge_exons(copy.deepcopy(tail), copy.deepcopy(head))
        theirs = ref.align.merge_exons(copy.deepcopy(tail),
                                       copy.deepcopy(head))
        assert ours == theirs


def test_find_alignment_pos_parity(ref, rng):
    from ciri_long_tpu.models.hits import cigar_string, find_alignment_pos

    sys.path.insert(0, REF_ROOT)
    try:
        from CIRI_long.align import find_alignment_pos as ref_fap
    finally:
        sys.path.remove(REF_ROOT)

    class Aln:
        def __init__(self, rb, qb, cs):
            self.ref_begin = rb
            self.query_begin = qb
            self.cigar_string = cs

    for _ in range(150):
        cigar = [(int(l), int(op)) for l, op in _rand_cigar(rng)
                 if op in (0, 1, 2)]
        aln = Aln(int(rng.integers(0, 100)), int(rng.integers(0, 100)),
                  cigar_string(cigar))
        pos = int(rng.integers(0, 400))
        assert find_alignment_pos(aln, pos) == ref_fap(aln, pos)
