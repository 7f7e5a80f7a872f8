"""Stage `collapse`: cluster per-read BSJ calls into circRNA loci, polish
junctions, reconstruct isoforms, emit expression matrices.

Reference behavior: collapse.py (cluster_reads :74, correct_cluster :235,
curate_junction :161, cluster_sequence :458, curate_cirexons :557,
merge_isoforms :709, cal_exp_mtx :903).

TPU-first redesign of the hot paths (SURVEY.md §7):
  * curate_junction -- the reference's hottest loop (~2500 SSW calls per
    cluster, collapse.py:161-173) becomes ONE batched [pairs] SW tensor on
    device plus one batched edit-distance call.
  * head-anchor / template / junction scoring SSW calls are batched per
    cluster instead of per read.
  * the pairwise HPC distance matrix (collapse.py:467-473) is one batched
    edit-distance call over all i<j pairs.

Deliberate, documented deviations from the reference:
  * collapse.py:377 samples clusters > 200 reads with random.sample; we
    keep the 200 longest reads (deterministic, multi-host reproducible --
    SURVEY.md §7 'hard parts').
  * collapse.py:295-299 resets circ_type to None after the annotated pass
    sets it (an upstream counter bug); we keep the assignment so the
    Annotated/Denovo counters are truthful.
"""

import os
import logging
from collections import Counter, defaultdict, namedtuple
from pathlib import Path

import numpy as np

from ciri_long_tpu.annot.signal import (equivalent_seq, find_annotated_signal,
                                        find_denovo_signal, find_host_gene,
                                        find_overlap_exons,
                                        find_retained_introns)
from ciri_long_tpu.config import DEFAULT, JUNC_SCORE
from ciri_long_tpu.models.hits import find_alignment_pos
from ciri_long_tpu.ops.edit import edit_distance, edit_distance_batch
from ciri_long_tpu.ops.poa import poa, poa_consensus_many
from ciri_long_tpu.ops.sw import SWParams, sw_align_batch
from ciri_long_tpu.ops.traceback import cigar_to_string, sw_traceback
from ciri_long_tpu.utils.logger import ProgressBar
from ciri_long_tpu.utils.misc import flatten, grouper, min_sorted_items, pairwise
from ciri_long_tpu.utils.seq import (compress_seq, encode_seq, get_junc_seq,
                                     pad_encoded, revcomp, transform_seq)

LOGGER = logging.getLogger('CIRI-long')

READ = namedtuple('READ', 'read_id circ_id strand cirexon ss clip segments seq sample type')
CIRC = namedtuple('CIRC', 'contig start end strand')
# typenames must match the attribute names for spawn-pool pickling;
# aliases keep corrected.pkl files from before the rename loadable
Read = READ
Circ = CIRC

JUNC_SW = SWParams(JUNC_SCORE.match, JUNC_SCORE.mismatch,
                   JUNC_SCORE.gap_open, JUNC_SCORE.gap_extend)

_BUCKETS = (64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384, 32768)


def _bucket(n):
    for b in _BUCKETS:
        if n <= b:
            return b
    return n


def _pad_rows(arr, rows):
    """Pad the batch dimension with PAD-only rows so batch sizes land on a
    bounded bucket ladder -- every distinct shape is a fresh XLA/Mosaic
    compile, and cluster sizes vary per cluster."""
    if arr.shape[0] >= rows:
        return arr
    pad = np.full((rows - arr.shape[0], arr.shape[1]), 5, arr.dtype)
    return np.concatenate([arr, pad], axis=0)


def _sw_many_vs_many(queries, refs, params=JUNC_SW):
    """Batched SW of per-row (query, ref) code pairs; returns SWResult.
    On a registered fuser worker thread (parallel/fuser.py) the job is
    FUSED with every other cluster's pending SW into one device batch;
    otherwise it dispatches directly."""
    from ciri_long_tpu.parallel.fuser import current_fuser
    fuser = current_fuser()
    if fuser is not None:
        return fuser.call('sw', (queries, refs, params))
    return _sw_many_vs_many_direct(queries, refs, params)


def _sw_many_vs_many_direct(queries, refs, params=JUNC_SW):
    """The dispatching body: both the length and the batch dimensions
    are bucketed."""
    B = len(queries)
    Bp = _bucket(B)
    q, _ = pad_encoded(queries, max_len=_bucket(max(len(x) for x in queries)))
    r, _ = pad_encoded(refs, max_len=_bucket(max(len(x) for x in refs)))
    res = sw_align_batch(_pad_rows(q, Bp), _pad_rows(r, Bp), params)
    from ciri_long_tpu.ops.sw import SWResult
    # materialise to host numpy ONCE: downstream code indexes these
    # element-by-element, and per-element np.asarray on jax arrays was
    # 70% of collapse wall time (50k sub-ms device fetches)
    return SWResult(score=np.asarray(res.score[:B]),
                    query_begin=np.asarray(res.query_begin[:B]),
                    query_end=np.asarray(res.query_end[:B]),
                    ref_begin=np.asarray(res.ref_begin[:B]),
                    ref_end=np.asarray(res.ref_end[:B]))


def _fused_sw(jobs):
    """Fused executor: group pending (queries, refs, params) jobs by
    their OWN shape buckets, pad each group to its bucket, submit every
    group's device program before fetching any (async dispatch), then
    collect and slice rows back out.

    Per-shape grouping matters on bandwidth-limited links: one global
    batch would pad every 64-wide junction row out to the largest job's
    4096-wide bucket -- measured 2.9 s/round on the tunnel, pure padded-
    byte transfer.  Row independence + padding invariance keep fused
    results bit-identical to per-job dispatches
    (tests/test_collapse_fuser.py)."""
    from ciri_long_tpu.ops.sw import (SWResult, sw_align_batch_collect,
                                      sw_align_batch_submit)
    out = [None] * len(jobs)
    groups = {}
    for t, (q, r, p) in enumerate(jobs):
        key = (p, _bucket(max(len(x) for x in q)),
               _bucket(max(len(x) for x in r)))
        groups.setdefault(key, []).append(t)
    handles = []
    for (p, lq, lr), idxs in groups.items():
        allq, allr, cuts = [], [], [0]
        for t in idxs:
            allq.extend(jobs[t][0])
            allr.extend(jobs[t][1])
            cuts.append(cuts[-1] + len(jobs[t][0]))
        B = len(allq)
        q, _ = pad_encoded(allq, max_len=lq)
        r, _ = pad_encoded(allr, max_len=lr)
        # COARSE batch buckets: fuser round composition is timing-
        # dependent, so the fine ladder kept minting fresh (B, Lq, Lr)
        # shapes -- each a remote compile on tunnel links.  Three B
        # buckets bound the shape space; row padding is compute the
        # device doesn't notice
        Bp = next((b for b in (128, 512, 2048) if B <= b), B)
        h = sw_align_batch_submit(_pad_rows(q, Bp), _pad_rows(r, Bp), p)
        handles.append((idxs, cuts, B, h))
    for idxs, cuts, B, h in handles:
        res = sw_align_batch_collect(h)
        res = SWResult(*[np.asarray(f)[:B] for f in res])
        for k, t in enumerate(idxs):
            sl = slice(cuts[k], cuts[k + 1])
            out[t] = SWResult(score=res.score[sl],
                              query_begin=res.query_begin[sl],
                              query_end=res.query_end[sl],
                              ref_begin=res.ref_begin[sl],
                              ref_end=res.ref_end[sl])
    return out


def _edit_many(a_codes, b_codes):
    """Batched edit distances of per-row (a, b) code pairs; fused across
    clusters like _sw_many_vs_many."""
    from ciri_long_tpu.parallel.fuser import current_fuser
    fuser = current_fuser()
    if fuser is not None:
        return fuser.call('edit', (a_codes, b_codes))
    return _edit_many_direct(a_codes, b_codes)


def _edit_many_direct(a_codes, b_codes):
    amax = max(1, max(len(x) for x in a_codes))
    bmax = max(1, max(len(x) for x in b_codes))
    apad, alen = pad_encoded(a_codes, max_len=_bucket(amax))
    bpad, blen = pad_encoded(b_codes, max_len=_bucket(bmax))
    return edit_distance_batch(apad, bpad, alen, blen)


def _fused_edit(jobs):
    cuts = [0]
    alla, allb = [], []
    for a, b in jobs:
        alla.extend(a)
        allb.extend(b)
        cuts.append(cuts[-1] + len(a))
    d = _edit_many_direct(alla, allb)
    return [d[cuts[k]:cuts[k + 1]] for k in range(len(jobs))]


def _sw_one_vs_many(query, refs, params=JUNC_SW):
    return _sw_many_vs_many([query] * len(refs), refs, params)


def _sw_many_vs_one(queries, ref, params=JUNC_SW):
    return _sw_many_vs_many(queries, [ref] * len(queries), params)


class Segment(object):
    def __init__(self, start, end):
        self.start = start
        self.end = end

    def __str__(self):
        return '{}-{}'.format(self.start, self.end)


class Exon(Segment):
    def __init__(self, start, end):
        self.start = int(start)
        self.end = int(end)


def load_cand_circ(in_file):
    """Load cand_circ.fa + sibling low_confidence.fa for every sample in
    the input list (collapse.py:37-71)."""
    sample_attr = {}
    with open(in_file, 'r') as f:
        for line in f:
            content = line.rstrip().split()
            if content:
                sample, fname = content
                sample_attr[sample] = fname

    cand_reads = {}
    for sample, fname in sample_attr.items():
        cand_circ = Path(fname)
        with open(cand_circ, 'r') as f:
            for line in f:
                content = line.rstrip().lstrip('>').split('\t')
                clip_base = int(content[5].split('|')[1].split('-')[0])
                seq = f.readline().rstrip()
                if clip_base > 20:
                    continue
                cand_reads[content[0]] = READ(*content, seq, sample, 'full')

        prefix = cand_circ.name.split('.')[0]
        low_conf = cand_circ.parent / (prefix + '.low_confidence.fa')
        if low_conf.exists():
            with open(low_conf) as f:
                for line in f:
                    content = line.rstrip().lstrip('>').split('\t')
                    clip_base = int(content[5].split('|')[1].split('-')[0])
                    seq = f.readline().rstrip()
                    if clip_base > 20:
                        continue
                    cand_reads[content[0]] = READ(*content, seq, sample, 'partial')

    return cand_reads


def cluster_reads(cand_reads, cfg=DEFAULT.collapse):
    """BSJ clustering with 20 bp tolerance over 500 bp bins
    (collapse.py:74-149)."""
    import re
    from operator import itemgetter

    circ_reads = defaultdict(list)
    circ_start = defaultdict(dict)
    circ_end = defaultdict(dict)

    for read_id, read in cand_reads.items():
        contig, start, end = re.split('[:-]', read.circ_id)
        start, end = int(start), int(end)
        if end - start > cfg.max_circ_len:
            continue
        circ_reads[contig].append((start, end, read.read_id))
        circ_start[contig].setdefault(start, []).append(read.read_id)
        circ_end[contig].setdefault(end, []).append(read.read_id)

    reads_cluster = []
    for contig in circ_reads:
        circ_start_index = {}
        circ_end_index = {}

        for target, index in ((circ_start, circ_start_index),
                              (circ_end, circ_end_index)):
            tmp = [[]]
            for x in sorted(target[contig]):
                if not tmp[-1]:
                    tmp[-1].append(x)
                elif x > tmp[-1][-1] + cfg.bsj_tolerance:
                    tmp.append([x])
                else:
                    tmp[-1].append(x)
            for x in tmp:
                if not x:
                    continue
                for i in range(min(x) // cfg.bin_size, max(x) // cfg.bin_size + 1):
                    index.setdefault(i, []).append(x)

        reads_itered = {}
        for (start, end, read_id) in sorted(circ_reads[contig], key=itemgetter(0, 1)):
            if read_id in reads_itered:
                continue
            tmp_reads = []
            p = [i for i in circ_start_index[start // cfg.bin_size] if start in i][0]
            q = [i for i in circ_end_index[end // cfg.bin_size] if end in i][0]
            for i in p:
                tmp_start = circ_start[contig][i]
                for j in q:
                    tmp_end = circ_end[contig][j]
                    tmp = set(tmp_start) & set(tmp_end)
                    if tmp:
                        # sorted: set iteration order is hash-seed dependent
                        # (reference collapse.py:140-142 is nondeterministic
                        # here); deterministic order is a stated goal
                        tmp_reads += sorted(tmp)
            for i in tmp_reads:
                reads_itered[i] = 1
            reads_cluster.append(sorted([cand_reads[i] for i in tmp_reads],
                                        key=lambda x: len(x.seq), reverse=True))

    return reads_cluster


def genome_junction_seq(ctx, contig, start, end, width=25):
    return ctx.genome.seq(contig, end - width, end) + \
        ctx.genome.seq(contig, start, start + width)


def curate_junction(ctx, ctg, st, en, junc, cfg=DEFAULT.collapse):
    """Exhaustive junction scan (collapse.py:161-173) as ONE batched device
    SW + edit-distance call over all (i, j) shift pairs.

    Score per pair: edit_distance(junction_seq, junc[qb:qe]) / 20 -- the
    reference's avg_score (collapse.py:156-158), including its slice
    convention junc[query_begin:query_end] (end-exclusive on an inclusive
    coordinate)."""
    pairs = []
    refs = []
    width = cfg.curate_width
    clen = ctx.contig_len[ctg]
    junc_codes = encode_seq(junc)
    for i in range(max(0, min(st) - 25), max(st) + 25):
        for j in range(min(en) - 25, min(max(en) + 25, clen)):
            if j <= i:
                continue
            ref = np.concatenate([
                ctx.genome.codes_of(ctg, j - width, j),
                ctx.genome.codes_of(ctg, i, i + width)])
            pairs.append((i, j))
            refs.append(ref)
    if not pairs:
        return []

    queries = [junc_codes] * len(pairs)
    res = _sw_many_vs_many(queries, refs, JUNC_SW)

    # matched query substrings junc[qb:qe] vs the genomic junction
    K = len(pairs)
    qb = res.query_begin
    qe = res.query_end
    xs = [junc_codes[qb[t]:qe[t]] if qe[t] > qb[t]
          else np.zeros(0, np.int8) for t in range(K)]
    rlen = np.array([len(r) for r in refs], np.int32)
    dists = _edit_many(refs, xs)

    junc_scores = [(pairs[t][0], pairs[t][1], dists[t] / rlen[t])
                   for t in range(K)]
    return sorted(junc_scores, key=lambda x: x[2])


def annotated_hit(ctx, contig, scores):
    """Weight candidate junctions by annotated splice sites
    (collapse.py:176-207)."""
    if ctx.ss_index is None or contig not in ctx.ss_index:
        return None
    idx = ctx.ss_index[contig]
    weighted = []
    for st, en, score in scores:
        w = 0
        if st + 1 in idx:
            tmp = set(flatten([p for _, p in idx[st + 1].items()]))
            if 'start' in tmp:
                w += 1
        elif st in idx:
            tmp = set(flatten([p for _, p in idx[st].items()]))
            if 'end' in tmp:
                w += 1

        if en in idx:
            tmp = set(flatten([p for _, p in idx[en].items()]))
            if 'end' in tmp:
                w += 1
        elif en + 1 in idx:
            tmp = set(flatten([p for _, p in idx[en + 1].items()]))
            if 'start' in tmp:
                w += 1

        weighted.append([st, en, w])
    return min_sorted_items(weighted, 2, True)


def junc_score(ctx, ctg, junc, junc_seqs):
    """Mean SW score of the cluster's junction windows against the doubled
    candidate circular sequence (collapse.py:210-215), batched."""
    ref = np.concatenate([ctx.genome.codes_of(ctg, junc[0], junc[1])] * 2)
    res = _sw_many_vs_one([encode_seq(s) for s in junc_seqs], ref, JUNC_SW)
    return float(np.mean(res.score))


def junc_scores_sorted(ctx, ctg, juncs, junc_seqs):
    """Sort candidate junctions by mean junction-window SW score,
    descending (the reference sorts with one SSW round per sorted() key
    evaluation, collapse.py:268-275); here ALL (junction, window) pairs
    run as ONE batch.  Stable on ties exactly like sorted(key=junc_score,
    reverse=True): equal means keep their input order."""
    queries = [encode_seq(s) for s in junc_seqs]
    refs = [np.concatenate([ctx.genome.codes_of(ctg, j[0], j[1])] * 2)
            for j in juncs]
    Q = len(queries)
    res = _sw_many_vs_many(queries * len(juncs),
                           [r for r in refs for _ in range(Q)], JUNC_SW)
    means = np.asarray(res.score, np.float64).reshape(len(juncs), Q) \
        .mean(axis=1)
    order = np.argsort(-means, kind='stable')
    return [juncs[int(i)] for i in order]


_FUSER_TOTALS = [0, 0]            # fused rounds, fused jobs (telemetry)
_FUSER_TOTALS_LOCK = __import__('threading').Lock()


def correct_chunk(ctx, chunk, max_cluster=200, exec_threads=1,
                  fuse=None):
    """Correct every cluster of a chunk.

    ``exec_threads > 1`` runs the clusters on a thread pool -- the device
    compute path's per-cluster SW/edit dispatches then overlap their
    tunnel round-trips (each thread blocks in a device fetch while the
    others dispatch; correct_cluster is pure in (ctx, cluster) and every
    shared dependency is read-only or thread_local, so results are
    identical).  The fold runs in submission (index) order either way,
    keeping counters and corrected_reads byte-identical to a serial run.
    """
    results = [None] * len(chunk)
    if fuse is None:
        # fuse only for DEVICE dispatch: on the host path the workers'
        # native SW/POA calls release the GIL and parallelise on their
        # own -- funnelling them through one dispatcher (plus the fuse
        # linger) SERIALISES them (measured 211 -> 139 reads/s at 1k)
        from ciri_long_tpu.ops.sw import _on_tpu
        fuse = _on_tpu()
    if exec_threads > 1 and sum(c is not None for c in chunk) > 1 \
            and not fuse:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(min(exec_threads, len(chunk))) as ex:
            futs = {i: ex.submit(correct_cluster, ctx, c,
                                 max_cluster=max_cluster)
                    for i, c in enumerate(chunk) if c is not None}
            for i, fut in futs.items():
                results[i] = fut.result()
    elif exec_threads > 1 and sum(c is not None for c in chunk) > 1:
        from concurrent.futures import ThreadPoolExecutor

        from ciri_long_tpu.parallel.fuser import DeviceFuser

        # every cluster's device ops funnel through ONE dispatcher
        # (parallel/fuser.py): the link sees k fused rounds instead of
        # clusters x k round-trips, and never a concurrent dispatch
        # (16 dispatch threads livelocked the axon tunnel, round 5)
        #
        # degraded-link bail-out: the RTT gate cannot catch a link whose
        # PROBE answers in 37 ms while real kernel calls take 15 s
        # (observed on the axon tunnel, round-5); after two fused rounds
        # over budget, pin the remaining compute to the native host
        # cores (the fuser keeps fusing -- sw_align_batch just routes
        # host once CIRI_PREFER_HOST_COMPUTE is set)
        try:
            budget = float(os.environ.get('CIRI_COLLAPSE_ROUND_BUDGET_S',
                                          '5'))
        except ValueError:
            budget = 5.0
        slow_rounds = [0]

        def _guard(exec_fn):
            import time as _time

            def wrapped(jobs):
                t0 = _time.perf_counter()
                try:
                    return exec_fn(jobs)
                finally:
                    if (_time.perf_counter() - t0 > budget
                            and os.environ.get(
                                'CIRI_PREFER_HOST_COMPUTE', '')
                            in ('', '0', 'false')):
                        slow_rounds[0] += 1
                        if slow_rounds[0] >= 2:
                            os.environ['CIRI_PREFER_HOST_COMPUTE'] = '1'
                            LOGGER.warning(
                                'collapse device rounds exceeded %.1fs '
                                'twice; pinning compute to host cores',
                                budget)
            return wrapped

        fuser = DeviceFuser({'sw': _guard(_fused_sw),
                             'edit': _guard(_fused_edit)})

        def run_one(c):
            fuser.register()
            try:
                return correct_cluster(ctx, c, max_cluster=max_cluster)
            finally:
                fuser.unregister()

        try:
            with ThreadPoolExecutor(min(exec_threads, len(chunk))) as ex:
                futs = {i: ex.submit(run_one, c)
                        for i, c in enumerate(chunk) if c is not None}
                for i, fut in futs.items():
                    results[i] = fut.result()
        finally:
            fuser.close()
            with _FUSER_TOTALS_LOCK:
                _FUSER_TOTALS[0] += fuser.rounds
                _FUSER_TOTALS[1] += fuser.jobs
    else:
        for i, cluster in enumerate(chunk):
            if cluster is None:
                continue
            results[i] = correct_cluster(ctx, cluster,
                                         max_cluster=max_cluster)

    cs_cluster = []
    cnt = defaultdict(int)
    for ret in results:
        if ret is None:
            continue
        circ_type, circ_attr_ = ret
        cnt[circ_type] += 1
        cs_cluster.append(circ_attr_)
    return cs_cluster, cnt


def correct_cluster(ctx, cluster, is_debug=False, max_cluster=200,
                    cfg=DEFAULT.collapse):
    """Polish one BSJ cluster (collapse.py:235-417)."""
    if cluster is None or len(cluster) <= 1:
        return None
    if 'full' not in set(i.type for i in cluster):
        return None

    counter = Counter([i.circ_id for i in cluster if i.type == 'full']).most_common(n=1)
    ref = sorted([i for i in cluster if i.circ_id == counter[0][0] and i.type == 'full'],
                 key=lambda x: len(x.seq), reverse=True)[0]

    # head-anchor: where does each read's alignment start on the reference
    # read's first 50 bp?  (collapse.py:251-256, batched)
    others = cluster[1:]
    ref50 = encode_seq(ref.seq[:50])
    if others:
        res = _sw_many_vs_one([encode_seq(q.seq) for q in others], ref50, JUNC_SW)
        head_pos = [int(x) for x in res.ref_begin]
    else:
        head_pos = [0]

    template = transform_seq(ref.seq, max(head_pos))
    junc_seqs = [get_junc_seq(template, -max(head_pos) // 2, cfg.junc_width)]
    if others:
        tcodes = encode_seq(template)
        res = _sw_many_vs_one([encode_seq(q.seq) for q in others], tcodes, JUNC_SW)
        for q, qb in zip(others, res.query_begin):
            tmp = transform_seq(q.seq, int(qb))
            junc_seqs.append(get_junc_seq(tmp, -max(head_pos) // 2, cfg.junc_width))

    cs_junc, _ = poa(junc_seqs, 2, False, 10, -4, -8, -2, -24, -1)

    ctg = Counter([i.circ_id.split(':')[0] for i in cluster]).most_common()[0][0]
    tmp_st = [int(i.circ_id.split(':')[1].split('-')[0]) for i in cluster]
    tmp_en = [int(i.circ_id.split(':')[1].split('-')[1]) for i in cluster]

    scores = curate_junction(ctx, ctg, tmp_st, tmp_en, cs_junc, cfg)
    aval_junc = min_sorted_items(scores, 2) if scores else None
    if aval_junc:
        anno_junc = annotated_hit(ctx, ctg, aval_junc)
        if anno_junc:
            anno_junc = junc_scores_sorted(ctx, ctg, anno_junc, junc_seqs)
            circ_start, circ_end, circ_score = anno_junc[0]
        else:
            aval_junc = junc_scores_sorted(ctx, ctg, aval_junc, junc_seqs)
            circ_start, circ_end, circ_score = aval_junc[0]
    else:
        circ_start, circ_end = counter[0][0].split(':')[1].split('-')
        circ_start, circ_end = int(circ_start), int(circ_end)

    # annotated splice sites with widening shift thresholds
    circ_type = None
    ss_site = None
    us_free = ds_free = 0
    tmp_signal = {}
    for shift_threshold in (5, 10):
        ss_site, us_free, ds_free, tmp_signal = find_annotated_signal(
            ctx, ctg, circ_start, circ_end, 0, 10, shift_threshold)
        if ss_site is not None:
            ss_id, strand, us_shift, ds_shift = ss_site
            circ_start += us_shift
            circ_end += ds_shift
            circ_type = 'Annotated'
            break

    host_strand = find_host_gene(ctx, ctg, circ_start, circ_end)

    if ss_site is None:
        for shift_threshold in (5, 10):
            ss_site = find_denovo_signal(ctx, ctg, circ_start, circ_end,
                                         host_strand, tmp_signal, us_free,
                                         ds_free, 0, 10, shift_threshold, True)
            if ss_site is not None:
                ss_id, strand, us_shift, ds_shift = ss_site
                circ_start += us_shift
                circ_end += ds_shift
                circ_type = 'Annotated'
                break

    if ss_site is None:
        retained_introns = find_retained_introns(ctx, ctg, circ_start + 1, circ_end)
        overlap_exons = find_overlap_exons(ctx, ctg, circ_start + 1, circ_end)

        is_lariat = 0
        if retained_introns is not None and overlap_exons is None:
            is_lariat = 1
            retained_introns = sorted(
                set(sum([i for _, i in retained_introns.items()], [])))
            retained_strand = sorted(set(i[2] for i in retained_introns))
            tmp_circ = []
            for intron_start, intron_end, intron_strand in retained_introns:
                if abs(intron_start - circ_start) > 50 or abs(intron_end - circ_end) > 50:
                    continue
                if intron_strand == '+':
                    tmp_site = [i for i in scores if i[0] == intron_start]
                else:
                    tmp_site = [i for i in scores if i[1] == intron_end]
                if tmp_site:
                    tmp_circ.append([*tmp_site[0], intron_strand])

            ss_id = 'lariat'
            if tmp_circ:
                circ_start, circ_end, circ_score, strand = \
                    sorted(tmp_circ, key=lambda x: x[2])[0]
                circ_type = 'High confidence lariat'
            else:
                is_lariat = 0
                tmp_circ = []
                for tmp_strand in retained_strand:
                    tmp_start, tmp_end, tmp_score = recursive_splice_site(
                        ctx, scores, ctg, tmp_strand)
                    if tmp_score is not None:
                        tmp_circ.append([tmp_start, tmp_end, tmp_score, tmp_strand])
                if tmp_circ:
                    circ_start, circ_end, circ_score, strand = \
                        sorted(tmp_circ, key=lambda x: x[2])[0]
                else:
                    strand = 'None'

        if is_lariat == 0 and circ_type is None:
            ss_site = find_denovo_signal(ctx, ctg, circ_start, circ_end,
                                         host_strand, tmp_signal, us_free,
                                         ds_free, 5, 10, 3, False)
            if ss_site is not None:
                ss_id, strand, us_shift, ds_shift = ss_site
                circ_start += us_shift
                circ_end += ds_shift
                circ_type = 'Denovo signal'
            else:
                ss_id = 'None'
                strand = 'None'
                circ_type = 'Unknown signal'

    circ_id = '{}:{}-{}'.format(ctg, circ_start + 1, circ_end)

    # rotate full-length reads to the curated junction; cluster by sequence
    cluster_seq = []
    circ_junc_seq = genome_junction_seq(ctx, ctg, circ_start, circ_end)
    junc_ref = encode_seq(circ_junc_seq)

    tmp_cluster = [i for i in cluster if i.type == 'full']
    if len(tmp_cluster) > max_cluster:
        # deterministic stand-in for random.sample (collapse.py:377)
        tmp_cluster = sorted(tmp_cluster, key=lambda x: len(x.seq),
                             reverse=True)[:max_cluster]
    tmp_cluster = sorted(tmp_cluster, key=lambda x: len(x.seq), reverse=True)

    # rotation alignments: on the TPU backend the whole cluster runs as
    # ONE batched device SW-with-traceback dispatch (ops/sw_tb_batch.py);
    # on CPU the native host core is faster -- byte-identical either way
    # (tests/test_tb_batch.py)
    from ciri_long_tpu.ops.sw_tb_batch import (device_tb_enabled,
                                               sw_traceback_batch)
    if tmp_cluster and device_tb_enabled():
        tb_all = sw_traceback_batch(
            [encode_seq(q.seq * 2) for q in tmp_cluster],
            [junc_ref] * len(tmp_cluster),
            JUNC_SW.match, JUNC_SW.mismatch,
            JUNC_SW.gap_open, JUNC_SW.gap_extend)
    else:
        tb_all = [sw_traceback(encode_seq(q.seq * 2), junc_ref,
                               JUNC_SW.match, JUNC_SW.mismatch,
                               JUNC_SW.gap_open, JUNC_SW.gap_extend)
                  for q in tmp_cluster]

    for query, tb in zip(tmp_cluster, tb_all):
        if tb is None:
            cluster_seq.append((query.read_id, query.seq))
            continue
        score, qb, qe, rb, re_, cigar = tb
        aln = _AlnView(ref_begin=rb, query_begin=qb,
                       cigar_string=cigar_to_string(cigar))
        tmp_pos = find_alignment_pos(aln, len(circ_junc_seq) // 2)
        if tmp_pos is None:
            cluster_seq.append((query.read_id, query.seq))
        else:
            tmp_seq = transform_seq(query.seq, tmp_pos % len(query.seq))
            cluster_seq.append((query.read_id, tmp_seq))

    cluster_res = batch_cluster_sequence(circ_id, cluster_seq)
    cluster_res = sorted(cluster_res, key=lambda x: len(x[1]), reverse=True)

    circ = CIRC(ctg, circ_start + 1, circ_end, strand)
    circ_id = '{}:{}-{}'.format(circ.contig, circ.start, circ.end)

    if len(cluster_res) > 2 and \
            len(cluster_res[0][1]) >= 0.5 * max(len(tmp_cluster), 10):
        tmp_res = correct_cluster(
            ctx, [i for i in cluster if i.read_id in cluster_res[0][1]], True)
        if tmp_res is not None:
            circ = tmp_res
            circ_id = '{}:{}-{}'.format(circ.contig, circ.start, circ.end)

    curated_exons = curate_cirexons(ctx, circ, cluster)
    if curated_exons is None:
        return None
    isoforms, isoform_reads, circ_len = curate_isoform(ctx, circ,
                                                       curated_exons, cluster_res)
    if isoforms is None:
        return None
    if not check_isoforms(ctx, circ, isoforms):
        return None

    if is_debug:
        return circ

    return circ_type, ([i.read_id for i in cluster], isoform_reads,
                       cluster_seq, circ_id, circ.strand, ss_id, us_free,
                       ds_free, circ_len, isoforms)


class _AlnView:
    """Duck-typed SW alignment view for find_alignment_pos."""

    def __init__(self, ref_begin, query_begin, cigar_string):
        self.ref_begin = ref_begin
        self.query_begin = query_begin
        self.cigar_string = cigar_string


def batch_cluster_sequence(circ_id, x):
    """(collapse.py:419-436)"""
    sequence = {}
    hpc_freq = []
    for read_id, read_seq in x:
        sequence[read_id] = read_seq
        hpc_freq.append((compress_seq(read_seq), [read_id]))

    res = iter_cluster_sequence(circ_id, hpc_freq, sequence)

    for _ in range(10):
        n_res = cluster_sequence(res, sequence)
        if len(n_res) == len(res):
            break
        res = n_res
    else:
        LOGGER.warning('Sequence not consensus for circRNA: {}'.format(circ_id))
    return res


def iter_cluster_sequence(circ_id, hpc_freq, sequence, batch=50):
    """(collapse.py:439-455)"""
    if len(hpc_freq) <= batch:
        return cluster_sequence(hpc_freq, sequence)

    res = []
    for tmp in grouper(hpc_freq, batch):
        chunk = [i for i in tmp if i is not None]
        res = cluster_sequence(chunk + res, sequence)
        for _ in range(10):
            n_res = cluster_sequence(res, sequence)
            if len(n_res) == len(res):
                break
            res = n_res
        else:
            LOGGER.warning('Sequence not consensus for circRNA: {}'.format(circ_id))
    return res


def cluster_sequence(hpc_freq, sequence, cfg=DEFAULT.collapse):
    """Ward-linkage clustering over the pairwise HPC edit-distance matrix
    (collapse.py:458-506); the distance matrix is one batched device
    call."""
    from scipy.cluster.hierarchy import leaves_list, linkage
    from scipy.spatial.distance import squareform

    if len(hpc_freq) == 1:
        return hpc_freq

    P = len(hpc_freq)
    codes = [encode_seq(h[0]) for h in hpc_freq]
    pairs = [(i, j) for i in range(P) for j in range(P) if i < j]
    a = [codes[i] for i, _ in pairs]
    b = [codes[j] for _, j in pairs]
    d = _edit_many(a, b)

    dist = np.zeros((P, P))
    for t, (i, j) in enumerate(pairs):
        dist[i][j] = d[t] / max(len(codes[i]), len(codes[j]))
    dist = dist + dist.T

    if dist.sum() != 0:
        z = leaves_list(linkage(squareform(dist), 'ward', optimal_ordering=True))
    else:
        z = list(range(P))

    clusters = [[z[0]]]
    for i, j in pairwise(z):
        if i > j:
            if dist[j][i] < cfg.cluster_dist_threshold:
                clusters[-1].append(j)
            else:
                clusters.append([j])
        else:
            if dist[i][j] < cfg.cluster_dist_threshold:
                clusters[-1].append(j)
            else:
                clusters.append([j])

    # multi-read sub-clusters run as ONE batched POA: on the TPU backend
    # each lockstep alignment round is a single device dispatch
    # (ops/poa_batch.py); on CPU it falls back to the sequential native
    # path -- byte-identical either way (tests/test_poa_batch.py)
    jobs = []
    slots = []
    ccs_seq = []
    for cluster in clusters:
        if len(cluster) == 1:
            ccs_seq.append(hpc_freq[cluster[0]])
            continue
        cluster_reads = flatten([hpc_freq[i][1] for i in cluster])
        jobs.append([sequence[i] for i in cluster_reads])
        slots.append(len(ccs_seq))
        ccs_seq.append((None, cluster_reads))
    if jobs:
        for slot, ccs in zip(slots, poa_consensus_many(jobs)):
            ccs_seq[slot] = (ccs, ccs_seq[slot][1])
    return ccs_seq


def recursive_splice_site(ctx, scores, ctg, strand):
    """(collapse.py:548-554)"""
    for st, en, scr in scores:
        if strand == '+' and ctx.genome.seq(ctg, st - 2, st) == 'AG' \
                and ctx.genome.seq(ctg, st, st + 2) == 'GT':
            return st, en, scr
        if strand == '-' and ctx.genome.seq(ctg, en, en + 2) == 'CT' \
                and ctx.genome.seq(ctg, en - 2, en) == 'CA':
            return st, en, scr
    return None, None, None


def parse_cirexons(circ, read):
    """(collapse.py:777-783)"""
    exons = []
    for x in read.cirexon.split(','):
        st, en = x.split('|')[0].split('-')
        exons.append([Exon(st, en), x.split('|')[1]])
    return exons


def cluster_bins(pos, dis=10):
    """(collapse.py:786-799)"""
    clustered = []
    last_i = None
    for i in sorted(pos):
        if last_i is None:
            last_i = [i]
            continue
        if i > last_i[-1] + dis:
            clustered.append(last_i)
            last_i = [i]
        else:
            last_i.append(i)
    if last_i is not None:
        clustered.append(last_i)
    return clustered


def curate_cirexons(ctx, circ, cluster, cfg=DEFAULT.collapse):
    """Canonical-site voting over exon boundaries (collapse.py:557-665)."""
    isoforms = {}
    starts = []
    ends = []
    for read in cluster:
        if read.cirexon == 'NA':
            continue
        try:
            exons = parse_cirexons(circ, read)
        except ValueError:
            continue
        if len(exons) == 0:
            continue
        for exon, exon_type in exons:
            if exon_type != '*-':
                starts.append(exon.start)
            if exon_type != '-*':
                ends.append(exon.end)
        if read.type == 'partial':
            continue
        isoforms[read.read_id] = [i[0] for i in exons]

    if len(isoforms) == 0:
        return None

    tmp_starts = cluster_bins(starts, dis=cfg.exon_cluster_dist)
    tmp_ends = cluster_bins(ends, dis=cfg.exon_cluster_dist)

    convert_st = {}
    for tmp_st in tmp_starts:
        if circ.start in tmp_st:
            for i in tmp_st:
                convert_st[i] = circ.start
        aval_st = []
        for i in sorted(set(tmp_st)):
            i_ss = ctx.genome.seq(circ.contig, i - 3, i - 1)
            if circ.strand == '+' and i_ss == 'AG':
                aval_st.append(i)
            elif circ.strand == '-' and revcomp(i_ss) == 'GT':
                aval_st.append(i)
        tmp_counter = Counter(tmp_st)
        if aval_st:
            final_st = sorted(aval_st, key=lambda x: tmp_counter[x], reverse=True)[0]
        else:
            final_st = tmp_counter.most_common(n=1)[0][0]
        for i in tmp_st:
            convert_st[i] = final_st

    convert_en = {}
    for tmp_en in tmp_ends:
        if circ.end in tmp_en:
            for i in tmp_en:
                convert_en[i] = circ.end
        aval_en = []
        for i in sorted(set(tmp_en)):
            i_ss = ctx.genome.seq(circ.contig, i, i + 2)
            if circ.strand == '+' and i_ss == 'GT':
                aval_en.append(i)
            elif circ.strand == '-' and revcomp(i_ss) == 'AG':
                aval_en.append(i)
        tmp_counter = Counter(tmp_en)
        if aval_en:
            final_en = sorted(aval_en, key=lambda x: tmp_counter[x], reverse=True)[0]
        else:
            final_en = tmp_counter.most_common(n=1)[0][0]
        for i in tmp_en:
            convert_en[i] = final_en

    curated_exons = {}
    for read_id, exons in isoforms.items():
        tmp_exons = [Exon(convert_st[exon.start], convert_en[exon.end])
                     for exon in exons]
        while tmp_exons and tmp_exons[0].end <= circ.start:
            tmp_exons = tmp_exons[1:]
        if not tmp_exons:
            continue
        while tmp_exons and tmp_exons[-1].start >= circ.end:
            tmp_exons = tmp_exons[:-1]
        if not tmp_exons:
            continue

        tmp_exons = merge_cirexons(tmp_exons)
        if tmp_exons[0].start <= circ.start + 15 and \
                tmp_exons[-1].end >= circ.end - 15:
            tmp_exons[0].start = circ.start
            tmp_exons[-1].end = circ.end
        else:
            continue
        curated_exons[read_id] = tmp_exons

    return curated_exons


def merge_cirexons(exons):
    """(collapse.py:668-682)"""
    if len(exons) == 1:
        return exons
    last_exon = exons[0]
    merged = []
    for exon in exons[1:]:
        if exon.start <= last_exon.end + 10:
            last_exon = Exon(last_exon.start, exon.end)
        else:
            merged.append(last_exon)
            last_exon = exon
    merged.append(last_exon)
    return merged


def curate_isoform(ctx, circ, curated_exons, cluster_res):
    """(collapse.py:685-706)"""
    final_isoforms = {}
    for tmp_seq, tmp_ids in cluster_res:
        tmp_isoform, tmp_len = merge_isoforms(ctx, circ, curated_exons,
                                              tmp_seq, tmp_ids)
        if tmp_isoform is None:
            continue
        if tmp_isoform in final_isoforms:
            final_isoforms[tmp_isoform][1] += tmp_ids
        else:
            final_isoforms[tmp_isoform] = [tmp_len, tmp_ids]
    if len(final_isoforms) == 0:
        return None, None, None

    total_cnt = sum(len(i[1]) for i in final_isoforms.values())
    ret = sorted(list(final_isoforms),
                 key=lambda x: (len(final_isoforms[x][1]), final_isoforms[x][0]),
                 reverse=True)
    major_len = final_isoforms[ret[0]][0]
    major_isoforms = [i for i in ret if len(final_isoforms[i][1]) >= 0.1 * total_cnt]
    major_reads = [final_isoforms[i][1] for i in major_isoforms]
    return major_isoforms, major_reads, major_len


def merge_isoforms(ctx, circ, curated_exons, seq, ids):
    """Max-flow walk over the exon graph (collapse.py:709-741); the
    exon-pair SW scores are batched."""
    seq_codes = encode_seq(seq)

    tmp = [i for i in ids if i in curated_exons]
    exons = sorted(set(str(j) for i in tmp for j in curated_exons[i]))
    if len(exons) == 0:
        return None, None

    exons = ['st'] + exons + ['en']
    edges = np.zeros([len(exons), len(exons)])
    for i in tmp:
        tmp_exons = [str(j) for j in curated_exons[i]]
        edges[exons.index('st')][exons.index(tmp_exons[0])] += 1
        edges[exons.index(tmp_exons[-1])][exons.index('en')] += 1
        for l_exon, n_exon in pairwise(tmp_exons):
            edges[exons.index(l_exon)][exons.index(n_exon)] += 1

    scorer = _ExonScorer(ctx, circ, seq_codes)

    cand_st, cand_en = np.where(edges == np.amax(edges))
    cand_score = [scorer.score(exons[i], exons[j])
                  for i, j in zip(cand_st, cand_en)]
    cand_idx = np.where(cand_score == np.amax(cand_score))[0][0]

    max_flow = []
    max_flow += iter_flow(scorer, exons, edges, cand_st[cand_idx], -1)
    max_flow += iter_flow(scorer, exons, edges, cand_en[cand_idx], 1)

    isoform = [exons[i] for i in max_flow]
    isoform_id = ','.join(isoform[1:-1])
    isoform_len = sum(int(i.split('-')[1]) - int(i.split('-')[0]) + 1
                      for i in isoform[1:-1])
    return isoform_id, isoform_len


class _ExonScorer:
    """Caches SW scores of exon-pair genomic sequences against a cluster
    consensus (collapse.py:760-774)."""

    def __init__(self, ctx, circ, seq_codes):
        self.ctx = ctx
        self.circ = circ
        self.seq_codes = seq_codes
        self.cache = {}

    def score(self, l_exon, n_exon):
        key = (l_exon, n_exon)
        if key in self.cache:
            return self.cache[key]
        ctx, circ = self.ctx, self.circ
        parts = []
        if l_exon != 'st':
            l_st, l_en = l_exon.split('-')
            parts.append(ctx.genome.codes_of(circ.contig, int(l_st) - 1, int(l_en)))
        if n_exon != 'en':
            n_st, n_en = n_exon.split('-')
            parts.append(ctx.genome.codes_of(circ.contig, int(n_st), int(n_en)))
        if parts:
            query = np.concatenate(parts)
        else:
            query = np.zeros(0, np.int8)
        if circ.strand == '-':
            from ciri_long_tpu.utils.seq import revcomp_encoded
            query = revcomp_encoded(query)
        if len(query) == 0:
            val = 0
        else:
            res = _sw_many_vs_many([query], [self.seq_codes], JUNC_SW)
            val = int(res.ref_end[0] - res.ref_begin[0])
        self.cache[key] = val
        return val


def iter_flow(scorer, exons, edges, coord, direction=-1):
    """(collapse.py:744-757)"""
    if coord == 0 or coord == edges.shape[0] - 1:
        return [coord]
    if direction == -1:
        max_l = np.where(edges[:, coord] == np.amax(edges[:, coord]))[0]
        max_score = [scorer.score(exons[i], exons[coord]) for i in max_l]
        max_idx = max_l[np.where(max_score == np.amax(max_score))[0][0]]
        return iter_flow(scorer, exons, edges, max_idx, direction) + [coord]
    max_n = np.where(edges[coord] == np.amax(edges[coord]))[0]
    max_score = [scorer.score(exons[coord], exons[i]) for i in max_n]
    max_idx = max_n[np.where(max_score == np.amax(max_score))[0][0]]
    return [coord] + iter_flow(scorer, exons, edges, max_idx, direction)


def check_isoforms(ctx, circ, isoforms):
    """Splice concordance of reconstructed isoforms (collapse.py:817-839)."""
    concordance = []
    for iso_str in isoforms:
        exons = iso_str.split(',')
        if len(exons) == 1:
            concordance.append(True)
            continue
        introns = []
        for l_str, n_str in pairwise(exons):
            l_st, l_en = l_str.split('-')
            n_st, n_en = n_str.split('-')
            l_ss = ctx.genome.seq(circ.contig, int(l_en), int(l_en) + 2)
            n_ss = ctx.genome.seq(circ.contig, int(n_st) - 3, int(n_st) - 1)
            if circ.strand == '+' and l_ss == 'GT' and n_ss == 'AG':
                introns.append(1)
            elif circ.strand == '-' and revcomp(n_ss) == 'GT' and revcomp(l_ss) == 'AG':
                introns.append(1)
            else:
                introns.append(0)
        concordance.append(sum(introns) == len(introns))
    return sum(concordance) > 0


_COLLAPSE_CTX = None


def _collapse_worker_init(ref_fasta, idx_file, gcache=None):
    """Spawn-pool initializer for the correction pass (the reference
    pools correct_chunk at collapse.py:848); workers force the CPU jax
    backend and share the persistent compile cache."""
    global _COLLAPSE_CTX
    import pickle

    import jax
    jax.config.update('jax_platforms', 'cpu')
    os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')
    try:
        jax.config.update('jax_compilation_cache_dir',
                          os.environ['JAX_COMPILATION_CACHE_DIR'])
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.1)
    except AttributeError:
        pass

    from ciri_long_tpu.context import Context
    from ciri_long_tpu.io.genome import Genome

    genome = Genome.from_cache(gcache, ref_fasta) if gcache else None
    if genome is None:
        genome = Genome(ref_fasta)
    gtf_idx = intron_idx = ss_idx = None
    if idx_file and os.path.exists(idx_file):
        with open(idx_file, 'rb') as f:
            gtf_idx, intron_idx, ss_idx = pickle.load(f)
    _COLLAPSE_CTX = Context(aligner=None, genome=genome, gtf_index=gtf_idx,
                            intron_index=intron_idx, ss_index=ss_idx)


def _collapse_worker_chunk(payload):
    chunk, max_cluster = payload
    return correct_chunk(_COLLAPSE_CTX, chunk, max_cluster)


def _collapse_device_threads():
    """Thread-pool width for the device-compute cluster executor: wide
    enough that dependent per-cluster dispatch chains overlap their
    tunnel round-trips, narrow enough that the GIL-bound Python glue
    between dispatches stays off the critical path."""
    try:
        return max(1, int(os.environ.get('CIRI_COLLAPSE_DEVICE_THREADS',
                                         '16')))
    except ValueError:
        return 16


def _collapse_device_enabled():
    """Whether the MAIN process should run its clusters through the
    fused device compute path (threaded workers + single-dispatcher
    fuser) instead of pinning CIRI_PREFER_HOST_COMPUTE.
    CIRI_COLLAPSE_DEVICE=0/1 pins; auto engages only on LOCAL-grade
    links (<5 ms RTT).  Measured reason (round 5, BASELINE.md): the
    collapse stage's device bytes are irreducible -- even with all
    dispatches fused and shape-grouped, a remote tunnel's bandwidth
    floors the stage at many seconds that the 4-core host path finishes
    in under five; on a locally attached chip the same fused rounds are
    transfer-free and the device path wins.  The round-budget guard in
    correct_chunk covers links whose RTT probe lies."""
    env = os.environ.get('CIRI_COLLAPSE_DEVICE', 'auto')
    if env in ('0', 'false'):
        return False
    if env in ('1', 'true'):
        return True
    if os.environ.get('CIRI_PREFER_HOST_COMPUTE', '') not in \
            ('', '0', 'false'):
        return False
    from ciri_long_tpu.utils.dispatch import low_rtt_device_ready
    return low_rtt_device_ready(threshold_ms=5.0)


def correct_reads(ctx, reads_cluster, cfg=DEFAULT.collapse, threads=1,
                  ref_fasta=None, idx_file=None, gcache=None):
    """Cluster-correction driver (collapse.py:842-868).  threads > 1
    fans cluster chunks over a spawn pool (reference collapse.py:848);
    results drain in submission order so corrected_reads ordering and
    the counters match a serial run exactly.

    Device-compute routing (round-5): when an accelerator backend is
    configured the main process runs its clusters through a THREADED
    executor (correct_chunk exec_threads) so per-cluster device dispatch
    chains overlap their tunnel round-trips; with a worker pool the main
    process additionally STEALS chunks from the back of the queue while
    the pool drains the front (parallel/hybrid.py, same split as the
    scan stage).  When the device path is disabled (CIRI_COLLAPSE_DEVICE
    =0 or a catastrophic link), compute pins to the native host cores
    via CIRI_PREFER_HOST_COMPUTE exactly as in round 3."""
    import os
    use_device = _collapse_device_enabled()
    if not use_device and 'CIRI_PREFER_HOST_COMPUTE' not in os.environ:
        try:
            import jax

            from ciri_long_tpu.utils.dispatch import device_rtt_ms
            if jax.default_backend() != 'cpu' and device_rtt_ms() >= 5.0:
                os.environ['CIRI_PREFER_HOST_COMPUTE'] = '1'
        except Exception:
            pass

    prog = ProgressBar()
    prog.update(0)
    circ_num = defaultdict(int)
    corrected_reads = []
    n = len(reads_cluster)
    # individual clusters are heavy (batched POA + SW curation), so when
    # pooling use finer chunks (~4 per worker) for load balance
    cs = cfg.cluster_chunk_size
    if threads > 1:
        cs = max(1, min(cs, -(-n // (4 * threads))))
    chunks = [reads_cluster[i:i + cs] for i in range(0, n, cs)]
    if use_device:
        exec_threads = _collapse_device_threads()
    elif threads <= 1 and n and \
            sum(len(c) for c in reads_cluster) / n >= 100:
        # serial runs over BIG clusters: thread them over the idle
        # cores -- the hot work is GIL-released native POA/SW (63% of
        # the serial wall, round-5 profile), same convention as
        # CIRI_SELECT_THREADS in the scan stage.  Gated on mean cluster
        # size: measured 203 -> 297 reads/s at 4k/250-read clusters but
        # 211 -> 136 at 1k/62-read clusters (small clusters spend
        # proportionally more time in XLA-jit edit calls whose intra-op
        # pools contend across threads).  Pooled runs keep per-worker
        # chunks serial (the spawn pool already owns the cores).
        try:
            exec_threads = max(1, int(os.environ.get(
                'CIRI_COLLAPSE_HOST_THREADS', str(os.cpu_count() or 1))))
        except ValueError:
            exec_threads = 1
    else:
        exec_threads = 1

    pool = result_iter = hybrid = None
    if threads > 1 and ref_fasta is not None and len(chunks) > 1:
        import multiprocessing
        ctx_mp = multiprocessing.get_context('spawn')
        pool = ctx_mp.Pool(min(threads, len(chunks)), _collapse_worker_init,
                           (ref_fasta, idx_file, gcache))
        payloads = [(ci, (c, cfg.max_cluster))
                    for ci, c in enumerate(chunks)]
        if use_device:
            from ciri_long_tpu.parallel.fuser import DeviceFuser
            from ciri_long_tpu.parallel.hybrid import HybridDrain

            # ONE fuser shared by every stealer thread: their clusters'
            # device ops fuse across chunks and the link never sees a
            # concurrent dispatch (stealer threads each dispatching
            # directly is exactly the livelock pattern, BASELINE r5)
            steal_fuser = DeviceFuser({'sw': _fused_sw,
                                       'edit': _fused_edit})

            def _steal_chunk(p):
                steal_fuser.register()
                try:
                    return correct_chunk(ctx, p[0], p[1],
                                         exec_threads=1)
                finally:
                    steal_fuser.unregister()

            hybrid = HybridDrain(
                pool, getattr(pool, '_processes', threads),
                _collapse_worker_chunk, _steal_chunk,
                payloads, device_width=exec_threads)
        else:
            result_iter = pool.imap(_collapse_worker_chunk,
                                    [p for _, p in payloads])

    done = 0
    try:
        for ci, chunk in enumerate(chunks):
            if hybrid is not None:
                tmp_cluster, tmp_num = hybrid.result(ci)
            elif result_iter is not None:
                tmp_cluster, tmp_num = next(result_iter)
            else:
                tmp_cluster, tmp_num = correct_chunk(
                    ctx, chunk, cfg.max_cluster, exec_threads=exec_threads,
                    fuse=use_device)
            corrected_reads += tmp_cluster
            for key in tmp_num:
                circ_num[key] += tmp_num[key]
            done += len(chunk)
            prog.update(100 * done // max(1, n))
    finally:
        if pool is not None:
            pool.terminate()
            pool.join()
        if hybrid is not None and use_device:
            steal_fuser.close()
            with _FUSER_TOTALS_LOCK:
                _FUSER_TOTALS[0] += steal_fuser.rounds
                _FUSER_TOTALS[1] += steal_fuser.jobs
    prog.update(100)
    if hybrid is not None:
        LOGGER.info('hybrid collapse: device stole %d/%d chunks'
                    % (hybrid.stolen, len(chunks)))
    with _FUSER_TOTALS_LOCK:
        rounds, jobs = _FUSER_TOTALS
        _FUSER_TOTALS[0] = _FUSER_TOTALS[1] = 0
    if jobs:
        LOGGER.info('collapse fuser: %d device ops fused into %d rounds'
                    % (jobs, rounds))
    return circ_num, corrected_reads


def circ_pos(x):
    ctg, pos = x.split(':')
    st, en = pos.split('-')
    return ctg, int(st), int(en)


def by_circ(x):
    """Chromosome-aware sort key (collapse.py:877-894)."""
    ctg, pos = x.split(':')
    if ctg.startswith('chr'):
        ctg = ctg.lstrip('chr')
    try:
        idx = '{:02d}'.format(int(ctg))
    except ValueError:
        if ctg in ('X', 'x', 'Y', 'y'):
            idx = 'a'
        elif ctg in ('M', 'm'):
            idx = 'b'
        else:
            idx = 'c'
    st, en = pos.split('-')
    return idx, ctg, int(st), int(en)


def by_isoform(x):
    circ_id, iso_id = x.split('|')
    idx, ctg, st, en = by_circ(circ_id)
    return idx, ctg, st, en, iso_id


def cal_exp_mtx(ctx, cand_reads, corrected_reads, out_dir, prefix,
                cfg=DEFAULT.collapse):
    """Expression / isoform matrices and the .info GTF
    (collapse.py:903-987)."""
    import pandas as pd

    circ_reads = defaultdict(list)
    isoform_reads = defaultdict(dict)
    circ_info = {}
    reads_df = []

    for reads, tmp_iso_reads, seqs, circ_id, strand, ss_id, us_free, \
            ds_free, circ_len, isoforms in corrected_reads:
        ctg, st, en = circ_pos(circ_id)
        if en - st < cfg.min_circ_len:
            continue

        field = circ_attr(ctx.gtf_index, ctg, st, en, strand)

        tmp_attr = ('circ_id "{}"; splice_site "{}"; equivalent_seq "{}"; '
                    'circ_type "{}"; circ_len "{}";').format(
            circ_id, ss_id,
            equivalent_seq(ctx.genome, ctg, st, en, strand),
            field['circ_type'] if field else 'Unknown',
            circ_len)
        if isoforms:
            tmp_attr += ' isoform "{}";'.format('|'.join(isoforms))
        for key in ('gene_id', 'gene_name', 'gene_type'):
            if key in field:
                tmp_attr += ' {} "{}";'.format(key, field[key])
        circ_info[circ_id] = [ctg, 'CIRI-long', 'circRNA', st, en,
                              len(reads), strand, '.', tmp_attr]

        circ_reads[circ_id] += reads
        for i, j in zip(isoforms, tmp_iso_reads):
            isoform_reads[circ_id][i] = isoform_reads[circ_id].setdefault(i, []) + j

        for read_id in reads:
            read = cand_reads[read_id]
            reads_df.append([read_id, circ_id, read.circ_id, read.strand,
                             read.cirexon, read.ss, read.clip, read.segments,
                             read.sample, read.type])

    reads_df = pd.DataFrame(
        reads_df, columns=['read_id', 'circ_id', 'tmp_id', 'strand',
                           'cirexons', 'signal', 'alignment', 'segments',
                           'sample', 'type'])
    reads_df.to_csv('{}/{}.reads'.format(out_dir, prefix), sep='\t', index=False)

    sorted_circ = sorted(list(circ_info), key=by_circ)
    with open('{}/{}.info'.format(out_dir, prefix), 'w') as out:
        for circ_id in sorted_circ:
            out.write('\t'.join(str(x) for x in circ_info[circ_id]) + '\n')

    exp_df = {}
    for circ_id, reads in circ_reads.items():
        exp_df[circ_id] = Counter([cand_reads[i].sample for i in reads])
    exp_df = pd.DataFrame.from_dict(exp_df).transpose().fillna(0).reindex(sorted_circ)
    exp_df.to_csv('{}/{}.expression'.format(out_dir, prefix), sep='\t',
                  index_label='circ_ID')

    isoform_df = {}
    for circ_id in isoform_reads:
        tmp_total = []
        for _, reads in isoform_reads[circ_id].items():
            tmp_total += [cand_reads[i].sample for i in reads]
        tmp_total = Counter(tmp_total)
        for iso_id, reads in isoform_reads[circ_id].items():
            tmp_counter = Counter([cand_reads[i].sample for i in reads])
            isoform_df['{}|{}'.format(circ_id, iso_id)] = \
                {i: j / tmp_total[i] for i, j in tmp_counter.items()}
    sorted_iso = sorted(list(isoform_df), key=by_isoform)
    isoform_df = pd.DataFrame.from_dict(isoform_df).transpose().fillna(0).reindex(sorted_iso)
    isoform_df.to_csv('{}/{}.isoforms'.format(out_dir, prefix), sep='\t',
                      index_label='isoform_ID')
    return len(sorted_circ), len(sorted_iso)


def circ_attr(gtf_index, ctg, start, end, strand):
    """Gene-level annotation of a circRNA (collapse.py:1019-1138)."""
    if gtf_index is None or ctg not in gtf_index:
        return {}
    start_div, end_div = start // 500, end // 500

    host_gene = {}
    start_element = defaultdict(list)
    end_element = defaultdict(list)

    for x in range(start_div, end_div + 1):
        if x not in gtf_index[ctg]:
            continue
        for element in gtf_index[ctg][x]:
            if element.start <= start <= element.end and \
                    (element.strand == strand or strand is None):
                start_element[element.type].append(element)
            if element.start <= end <= element.end and \
                    (element.strand == strand or strand is None):
                end_element[element.type].append(element)
            if element.end < start or end < element.start:
                continue
            gid = element.attr.get('gene_id')
            if gid is not None and gid not in host_gene:
                host_gene[gid] = element

    circ_type = {}
    forward_host_gene = []
    antisense_host_gene = []

    if host_gene:
        for gene_id in host_gene:
            if strand == 'None' or host_gene[gene_id].strand == strand:
                forward_host_gene.append(host_gene[gene_id])
                if 'exon' in start_element and 'exon' in end_element:
                    circ_type['exon'] = 1
                else:
                    circ_type['intron'] = 1
            else:
                antisense_host_gene.append(host_gene[gene_id])
                circ_type['antisense'] = 1
    else:
        circ_type['intergenic'] = 1

    if len(forward_host_gene) > 1:
        circ_type['gene_intergenic'] = 1

    field = {}
    if 'exon' in circ_type:
        field['circ_type'] = 'exon'
    elif 'intron' in circ_type:
        field['circ_type'] = 'intron'
    elif 'antisense' in circ_type:
        field['circ_type'] = 'antisense'
    else:
        field['circ_type'] = 'intergenic'

    def collect(genes):
        ids, names, types = [], [], []
        for x in genes:
            attr = x.attr
            if 'gene_id' in attr:
                ids.append(attr['gene_id'])
            if 'gene_name' in attr:
                names.append(attr['gene_name'])
            if 'gene_type' in attr:
                types.append(attr['gene_type'])
            elif 'gene_biotype' in attr:
                types.append(attr['gene_biotype'])
        return ids, names, types

    if len(forward_host_gene) >= 1:
        ids, names, types = collect(forward_host_gene)
        if ids:
            field['gene_id'] = ','.join(ids)
        if names:
            field['gene_name'] = ','.join(names)
        if types:
            field['gene_type'] = ','.join(types)
    elif field['circ_type'] == 'antisense' and antisense_host_gene:
        ids, names, types = collect(antisense_host_gene)
        if ids:
            field['gene_id'] = ','.join(ids)
        if names:
            field['gene_name'] = ','.join(names)
        if types:
            field['gene_type'] = ','.join(types)

    return field
