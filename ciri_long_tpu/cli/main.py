"""CIRI-long compatible command line.

Subcommands, flags, stage sequencing, tmp/-file resume and the run-summary
JSON mirror the reference driver (main.py:9-268); the counters keep the
exact reference names (total/consensus/raw_unmapped/ccs_mapped/bsj/signal/
partial, main.py:96-100) so downstream tooling and parity checks work
unchanged.  A `timing` section with per-stage wall clock and reads/s is
added (SURVEY.md §5).
"""

import json
import os
import pickle
import sys
from collections import defaultdict


def _build_context(ref_fasta, gtf_idx, intron_idx, ss_idx, short_mode=False,
                   index_cache=None, build_threads=1):
    from ciri_long_tpu.context import Context
    from ciri_long_tpu.io.genome import Genome
    from ciri_long_tpu.models.aligner import GenomeAligner

    gdir = (os.path.join(os.path.dirname(index_cache), 'gcodes')
            if index_cache else None)
    genome = Genome.from_cache(gdir, ref_fasta) if gdir else None
    if genome is None:
        genome = Genome(ref_fasta)
        if gdir:
            try:
                genome.save_cache(gdir)
            except (OSError, ValueError):
                pass
    aligner = GenomeAligner(genome, short_mode=short_mode,
                            index_cache=index_cache,
                            build_threads=build_threads)
    return Context(aligner=aligner, genome=genome, gtf_index=gtf_idx,
                   intron_index=intron_idx, ss_index=ss_idx)


def _load_or_build_index(out_dir, gtf_file, circ_file, logger):
    from ciri_long_tpu.annot.gtf import index_annotation, index_circ

    if gtf_file is None and circ_file is None:
        logger.warning("No annotation provided, entering 'De novo' mode")
        return None, None, None

    idx_file = out_dir + '/tmp/ss.idx'
    if os.path.exists(idx_file):
        logger.info('reusing splice-site index: {}'.format(idx_file))
        with open(idx_file, 'rb') as idx:
            gtf_idx, intron_idx, ss_idx = pickle.load(idx)
        return gtf_idx, intron_idx, ss_idx

    if gtf_file is not None:
        gtf_idx, intron_idx, ss_idx = index_annotation(gtf_file)
    else:
        gtf_idx, intron_idx, ss_idx = None, None, None
    if circ_file is not None:
        ss_idx = index_circ(circ_file, ss_idx)

    with open(idx_file, 'wb') as idx:
        pickle.dump([gtf_idx, intron_idx, ss_idx], idx, -1)
    return gtf_idx, intron_idx, ss_idx


def _backend_initialized() -> bool:
    """Whether any jax backend has already initialised in this process
    (without triggering initialisation).  Conservative: unknown -> True."""
    from ciri_long_tpu.utils.dispatch import backend_initialized
    return backend_initialized()


def _apply_backend(args):
    """--backend cpu forces the CPU jax backend before any device
    is touched (this box pre-registers a remote TPU platform that env vars
    alone cannot override; the config update works because backends
    initialise lazily).  Also enables jax's persistent compilation cache:
    the batched kernels compile once per (bucketed) shape and every later
    run -- including the spawn-pool workers, which share the same dir --
    reuses them, which matters doubly on backends where compilation is
    remote/minutes-long."""
    import jax

    from ciri_long_tpu.utils.dispatch import (cached_rtt_ms,
                                              ensure_compile_cache,
                                              resolved_platform)
    if getattr(args, 'backend', None) == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    elif getattr(args, 'prefer_host_on_high_rtt', False) and \
            getattr(args, 'backend', None) in (None, 'default'):
        # Data-driven per-stage default (VERDICT r2 #7): the collapse
        # stage's device offloads lose to the host path when every
        # dispatch pays a remote-tunnel RTT (measured 2026-08-19 at 4k
        # reads: 88.5 reads/s on the tunnel TPU vs 232.7 on host).  The
        # RTT persisted by a previous run (e.g. the call stage) decides
        # BEFORE any device initialises; a locally attached chip
        # (<5 ms) keeps the accelerator.  --backend forces either way.
        rtt = cached_rtt_ms()
        if rtt is not None and rtt >= 5.0 and not _backend_initialized():
            # flipping jax_platforms is only safe BEFORE the first
            # backend initialisation; a same-process call->collapse
            # sequence (benches, validate.py) keeps whatever backend
            # call used -- its in-stage RTT gates still protect it
            jax.config.update('jax_platforms', 'cpu')
    cache = ensure_compile_cache()
    # spawn-pool workers inherit the resolved dir through the environment
    os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', cache)
    if resolved_platform() != 'cpu':
        # the zero persist threshold exists for REMOTE backends that
        # misreport compile times (see ensure_compile_cache); exporting
        # it to CPU-backend workers would persist every trivial CPU
        # executable, defeating the deliberate 1 s CPU bar (ADVICE r3)
        os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS',
                              '0')


def call(args):
    _apply_backend(args)
    from ciri_long_tpu.utils.logger import get_logger, StageTimer
    from ciri_long_tpu.utils.misc import check_dir, check_file
    from ciri_long_tpu.pipeline.find_ccs import find_ccs_reads, load_ccs_reads
    from ciri_long_tpu.pipeline.find_bsj import (recover_ccs_reads,
                                                 scan_ccs_reads,
                                                 scan_raw_reads)

    if args.input is None or args.output is None:
        sys.exit('Please provide input and output file, run CIRI-long using '
                 '-h or --help for detailed information.')
    if args.reference is None:
        sys.exit('Please specific FASTA of reference genome')

    in_file = check_file(args.input)
    gtf_file = None if args.gtf is None else check_file(args.gtf)
    circ_file = None if args.circ is None else check_file(args.circ)
    out_dir = check_dir(args.output)
    ref_fasta = check_file(args.reference)
    check_dir(out_dir + '/tmp')
    prefix = args.prefix
    debugging = args.debug
    is_canonical = True

    # Connect the accelerator CONCURRENTLY with input parsing + index
    # build: initialising a remote (tunnel) backend takes ~5-10 s that
    # would otherwise serialise in front of the first device use at the
    # scan stage.  Pure host backends no-op in microseconds.  Every
    # fork-context Pool creation waits on this thread first
    # (dispatch.wait_backend_warm): fork safety depends on the locks held
    # AT FORK TIME, so "children never touch jax" is not a defense.  In
    # practice the index + aligner build below outlasts the warm-up, so
    # the wait is free.
    from ciri_long_tpu.utils.dispatch import warm_backend_async
    warm_backend_async()

    # Serial (-t 1) runs hand the idle cores to the native select+stitch
    # batch core (nwcore.cpp threads across reads inside one GIL-released
    # call); pooled runs keep it single-threaded per worker -- the spawn
    # pool already owns the cores.  User-set values are respected.
    if 'CIRI_SELECT_THREADS' not in os.environ:
        os.environ['CIRI_SELECT_THREADS'] = str(
            max(1, (os.cpu_count() or 1)) if args.threads <= 1 else 1)

    logger = get_logger('CIRI-long', fname='{}/{}.log'.format(out_dir, prefix),
                        verbosity=debugging)
    logger.info('=== run configuration ===')
    logger.info('reads: ' + os.path.basename(in_file))
    logger.info('output dir: ' + os.path.basename(out_dir))
    logger.info('Device batch size: {}'.format(args.threads))
    logger.info('=== call stage ===')

    timer = StageTimer()
    reads_count = defaultdict(int)

    # splice-site / annotation index (built before the CCS stage so the
    # scan pool below can be pre-spawned with its file path)
    gtf_idx, intron_idx, ss_idx = _load_or_build_index(
        out_dir, gtf_file, circ_file, logger)
    idx_file = out_dir + '/tmp/ss.idx'
    idx_file = idx_file if os.path.exists(idx_file) else None

    # Build the aligner context (and persist its minimizer table, the
    # minimap2 .mmi role) BEFORE the worker pool spawns: workers then
    # np.memmap one shared page-cached index instead of re-sketching the
    # genome per process.
    index_cache = out_dir + '/tmp/minidx'
    ctx = _build_context(ref_fasta, gtf_idx, intron_idx, ss_idx,
                         index_cache=index_cache,
                         build_threads=max(1, args.threads))

    # Pre-spawn the scan-stage worker pool: spawn workers pay ~3 s of
    # interpreter + sitecustomize(jax) startup each, which overlaps the
    # CCS stage for free (Pool() initialises workers asynchronously).
    # The same pool serves scan_ccs and scan_raw (identical initializer).
    # Skipped on mesh-dispatch runs and on CCS-stage resumes (nothing to
    # overlap; each worker also loads the full genome + index, so an
    # unused pool is a threads x genome-size memory spike) -- the stage
    # functions then create their own pool on demand as before.
    scan_pool = None
    resuming_ccs = (not debugging
                    and os.path.exists('{}/tmp/{}.ccs.fa'.format(out_dir,
                                                                 prefix))
                    and os.path.exists('{}/tmp/{}.raw.fa'.format(out_dir,
                                                                 prefix)))
    if (args.threads > 1 and ref_fasta is not None and not resuming_ccs
            and getattr(args, 'dist', None) != 'mesh'):
        import multiprocessing
        from ciri_long_tpu.pipeline.find_bsj import _scan_worker_init
        ctx_mp = multiprocessing.get_context('spawn')
        # spawn at low priority (children inherit the parent's niceness)
        # so worker warmup yields the cores to the CCS stage's own pool
        # and only soaks up idle slices; restore before CCS forks.  Only
        # applied when the renice-back is guaranteed to succeed (root, or
        # RLIMIT_NICE admits the current level) -- otherwise the whole
        # run would be stuck deprioritised.
        nice_delta = 0
        try:
            import resource
            cur = os.nice(0)
            floor = 20 - resource.getrlimit(resource.RLIMIT_NICE)[0]
            if os.geteuid() == 0 or floor <= cur:
                os.nice(5)
                nice_delta = 5
        except (OSError, AttributeError):
            pass
        try:
            scan_pool = ctx_mp.Pool(args.threads, _scan_worker_init,
                                    (ref_fasta, idx_file, False,
                                     index_cache))
        finally:
            if nice_delta:
                os.nice(-nice_delta)

    # Step 1: cyclic consensus
    try:
        _call_stages(args, logger, timer, reads_count, in_file, out_dir,
                     prefix, ref_fasta, is_canonical, debugging, gtf_idx,
                     intron_idx, ss_idx, idx_file, scan_pool, ctx,
                     index_cache)
    finally:
        if scan_pool is not None:
            scan_pool.terminate()
            scan_pool.join()
    return _finish_call(args, logger, timer, reads_count, out_dir, prefix)


def _call_stages(args, logger, timer, reads_count, in_file, out_dir, prefix,
                 ref_fasta, is_canonical, debugging, gtf_idx, intron_idx,
                 ss_idx, idx_file, scan_pool, ctx, index_cache):
    from ciri_long_tpu.pipeline.find_ccs import find_ccs_reads, load_ccs_reads
    from ciri_long_tpu.pipeline.find_bsj import (recover_ccs_reads,
                                                 scan_ccs_reads,
                                                 scan_raw_reads)

    ccs_fa = '{}/tmp/{}.ccs.fa'.format(out_dir, prefix)
    raw_fa = '{}/tmp/{}.raw.fa'.format(out_dir, prefix)
    if not debugging and os.path.exists(ccs_fa) and os.path.exists(raw_fa):
        logger.info('[1/4] consensus: resuming from tmp/ ccs artifacts')
        ccs_seq = load_ccs_reads(out_dir, prefix)
        reads_count['consensus'] = len(ccs_seq)
    else:
        with timer.stage('ccs'):
            total_reads, ro_reads, ccs_seq = find_ccs_reads(
                in_file, out_dir, prefix, args.threads, debugging)
        reads_count['total'] = total_reads
        reads_count['consensus'] = ro_reads

    if 'total' in reads_count:
        logger.info('reads in: {}'.format(reads_count['total']))
    logger.info('reads with cyclic consensus: {}'.format(reads_count['consensus']))

    profile_dir = getattr(args, 'profile', None)
    if profile_dir:
        import jax
        jax.profiler.start_trace(profile_dir)

    logger.info('[2/4] scanning consensus reads for BSJs')
    with timer.stage('scan_ccs', items=len(ccs_seq)):
        if getattr(args, 'dist', None) == 'mesh':
            # device-mesh data parallelism: reads sharded over the
            # 'reads' axis, candidates merged with one all_gather
            # (parallel/cohort.py); byte-identical to the pool path
            from ciri_long_tpu.parallel.cohort import scan_ccs_sharded
            from ciri_long_tpu.parallel.mesh import make_mesh
            tmp_cnt, short_seq = scan_ccs_sharded(
                make_mesh(lag_parallel=1), ctx, ccs_seq, is_canonical,
                out_dir, prefix)
        else:
            tmp_cnt, short_seq = scan_ccs_reads(
                ctx, ccs_seq, is_canonical, out_dir, prefix,
                threads=args.threads, ref_fasta=ref_fasta,
                idx_file=idx_file, pool=scan_pool,
                index_cache=index_cache)
    for key, value in tmp_cnt.items():
        reads_count[key] += value

    logger.info('[3/4] recovering short consensus reads')
    with timer.stage('recover_ccs', items=len(short_seq)):
        if short_seq:
            from ciri_long_tpu.models.aligner import GenomeAligner
            from ciri_long_tpu.context import Context
            # reuse the packed genome; only the denser short-read index is
            # built, and only when there is anything to recover
            short_ctx = Context(
                aligner=GenomeAligner(ctx.genome, short_mode=True,
                                      index_cache=index_cache + '_s'),
                genome=ctx.genome, gtf_index=gtf_idx,
                intron_index=intron_idx, ss_index=ss_idx)
            tmp_cnt = recover_ccs_reads(
                short_ctx, short_seq, is_canonical, out_dir, prefix,
                threads=args.threads, ref_fasta=ref_fasta,
                idx_file=idx_file, index_cache=index_cache + '_s')
        else:
            # the reference still truncates/creates nothing here; keep the
            # append semantics by ensuring the file exists
            open('{}/{}.cand_circ.fa'.format(out_dir, prefix), 'a').close()
            tmp_cnt = {}
    for key, value in tmp_cnt.items():
        reads_count[key] += value

    logger.info('[4/4] scanning raw reads for partial BSJs')
    with timer.stage('scan_raw'):
        tmp_cnt, _short = scan_raw_reads(
            ctx, in_file, is_canonical, out_dir, prefix,
            threads=args.threads, ref_fasta=ref_fasta,
            idx_file=idx_file, pool=scan_pool,
            index_cache=index_cache)
    for key, value in tmp_cnt.items():
        reads_count[key] += value

    if profile_dir:
        import jax
        jax.profiler.stop_trace()
        logger.info('Device trace written to {}'.format(profile_dir))


def _finish_call(args, logger, timer, reads_count, out_dir, prefix):
    logger.info('non-linear raw reads: {}'.format(reads_count['raw_unmapped']))
    logger.info('mapped consensus reads: {}'.format(reads_count['ccs_mapped']))
    logger.info('BSJ calls: {}'.format(reads_count['bsj']))
    logger.info('calls with splice signal: {}'.format(reads_count['signal']))
    logger.info('partial calls from raw reads: {}'.format(reads_count['partial']))

    summary = dict(reads_count)
    summary['timing'] = timer.as_dict()
    with open('{}/{}.json'.format(out_dir, prefix), 'w') as f:
        json.dump(summary, f)

    logger.info('call stage done')
    return reads_count


def collapse(args):
    args.prefer_host_on_high_rtt = True
    _apply_backend(args)
    from ciri_long_tpu.utils.logger import get_logger, StageTimer
    from ciri_long_tpu.utils.misc import check_dir, check_file
    from ciri_long_tpu.pipeline import collapse as collapse_mod

    if args.input is None or args.output is None:
        sys.exit('Please provide input and output file, run CIRI-long using '
                 '-h or --help for detailed information.')

    in_file = check_file(args.input)
    out_dir = check_dir(args.output)
    check_dir(out_dir + '/tmp')
    prefix = args.prefix

    gtf_file = None if args.gtf is None else check_file(args.gtf)
    circ_file = None if args.circ is None else check_file(args.circ)
    ref_fasta = check_file(args.reference)
    debugging = args.debug

    logger = get_logger('CIRI-long', fname='{}/{}.log'.format(out_dir, prefix),
                        verbosity=debugging)
    logger.info('=== run configuration ===')
    logger.info('reads: ' + os.path.basename(in_file))
    logger.info('output dir: ' + os.path.basename(out_dir))
    logger.info('=== collapse stage ===')

    timer = StageTimer()
    gtf_idx, intron_idx, ss_idx = _load_or_build_index(
        out_dir, gtf_file, circ_file, logger)

    cand_reads = collapse_mod.load_cand_circ(in_file)

    from ciri_long_tpu.context import Context
    from ciri_long_tpu.io.genome import Genome
    genome = Genome.from_cache(out_dir + '/tmp/gcodes', ref_fasta)
    if genome is None:
        genome = Genome(ref_fasta)
    ctx = Context(aligner=None, genome=genome, gtf_index=gtf_idx,
                  intron_index=intron_idx, ss_index=ss_idx)

    corrected_file = '{}/tmp/{}.corrected.pkl'.format(out_dir, prefix)
    if not debugging and os.path.exists(corrected_file):
        logger.info('[1/2] resuming corrected clusters from tmp/')
        with open(corrected_file, 'rb') as pkl:
            circ_num, corrected_reads = pickle.load(pkl)
    else:
        logger.info('[1/2] clustering + correcting candidate reads')
        with timer.stage('cluster', items=len(cand_reads)):
            reads_cluster = collapse_mod.cluster_reads(cand_reads)
            logger.info('BSJ clusters: {}'.format(len(reads_cluster)))
            idx_file = out_dir + '/tmp/ss.idx'
            # refresh the packed-genome cache whenever the current run
            # could not load it (absent OR stale)
            import numpy as np
            gcache = out_dir + '/tmp/gcodes'
            backing = (ctx.genome.codes if ctx.genome.codes is not None
                       else ctx.genome.packed)
            if ref_fasta and not isinstance(backing, np.memmap):
                try:
                    ctx.genome.save_cache(gcache)
                except (OSError, ValueError):
                    gcache = None
            circ_num, corrected_reads = collapse_mod.correct_reads(
                ctx, reads_cluster, threads=args.threads,
                ref_fasta=ref_fasta,
                idx_file=idx_file if os.path.exists(idx_file) else None,
                gcache=gcache)
        with open(corrected_file, 'wb') as pkl:
            pickle.dump([circ_num, corrected_reads], pkl, -1)
        logger.info('Corrected clusters: {}, {}/{}/{}/{} annotated/denovo/'
                    'lariat/unknown'.format(
                        len(corrected_reads), circ_num['Annotated'],
                        circ_num['Denovo signal'],
                        circ_num['High confidence lariat'],
                        circ_num['Unknown signal']))

    logger.info('[2/2] writing expression / isoform matrices')
    with timer.stage('exp_mtx'):
        circ_cnt, iso_cnt = collapse_mod.cal_exp_mtx(
            ctx, cand_reads, corrected_reads, out_dir, prefix)
    logger.info('circRNAs: {}  isoforms: {}'.format(circ_cnt, iso_cnt))
    logger.info('collapse stage done')
    return circ_cnt, iso_cnt


def main():
    import argparse
    from ciri_long_tpu.version import __version__

    parser = argparse.ArgumentParser('CIRI-long-tpu')
    parser.add_argument('-v', '--version', action='version',
                        version='%(prog)s v{}'.format(__version__))
    subparsers = parser.add_subparsers(help='commands')

    call_parser = subparsers.add_parser('call')
    call_parser.add_argument('-i', '--in', dest='input', metavar='READS',
                             default=None, help='Input reads.fq.gz')
    call_parser.add_argument('-o', '--out', dest='output', metavar='DIR',
                             default=None, help='Output directory, default: ./')
    call_parser.add_argument('-r', '--ref', dest='reference', metavar='REF',
                             default=None, help='Reference genome FASTA file')
    call_parser.add_argument('-p', '--prefix', dest='prefix', metavar='PREFIX',
                             default='CIRI-long',
                             help='Output sample prefix, (default: %(default)s)')
    call_parser.add_argument('-a', '--anno', dest='gtf', metavar='GTF',
                             default=None, help='Genome reference gtf, (optional)')
    call_parser.add_argument('-c', '--circ', dest='circ', metavar='CIRC',
                             default=None,
                             help='Additional circRNA annotation in bed/gtf format, (optional)')
    call_parser.add_argument('-t', '--threads', dest='threads', metavar='INT',
                             type=int, default=os.cpu_count(),
                             help='Device batch size / host worker threads')
    call_parser.add_argument('--debug', dest='debug', default=False,
                             action='store_true',
                             help='Run in debugging mode, (default: %(default)s)')
    call_parser.add_argument('--dist', dest='dist', default=None,
                             choices=['mesh'],
                             help='Distribute the scan over the jax device '
                                  'mesh (all_gather candidate merge) '
                                  'instead of host worker pools')
    call_parser.add_argument('--backend', dest='backend', default=None,
                             choices=['cpu'],
                             help='Force the CPU jax backend (skip any '
                                  'attached accelerator)')
    call_parser.add_argument('--profile', dest='profile', metavar='DIR',
                             default=None,
                             help='Write a jax.profiler device trace of the '
                                  'scan stages to DIR (optional)')
    call_parser.set_defaults(func=call)

    collapse_parser = subparsers.add_parser('collapse')
    collapse_parser.add_argument('-i', '--in', dest='input', metavar='LIST',
                                 default=None,
                                 help='Input list of CIRI-long results')
    collapse_parser.add_argument('-o', '--out', dest='output', metavar='DIR',
                                 default=None, help='Output directory, default: ./')
    collapse_parser.add_argument('-p', '--prefix', dest='prefix',
                                 metavar='PREFIX', default='CIRI-long',
                                 help='Output sample prefix, (default: %(default)s)')
    collapse_parser.add_argument('-r', '--ref', dest='reference', metavar='REF',
                                 default=None, help='Reference genome FASTA file')
    collapse_parser.add_argument('-a', '--anno', dest='gtf', metavar='GTF',
                                 default=None, help='Genome reference gtf, (optional)')
    collapse_parser.add_argument('-c', '--circ', dest='circ', metavar='CIRC',
                                 default=None,
                                 help='Additional circRNA annotation in bed/gtf format, (optional)')
    collapse_parser.add_argument('-t', '--threads', dest='threads',
                                 metavar='INT', type=int,
                                 default=os.cpu_count(),
                                 help='Device batch size / host worker threads')
    collapse_parser.add_argument('--backend', dest='backend', default=None,
                                 choices=['cpu'],
                                 help='Force the CPU jax backend (skip any '
                                      'attached accelerator)')
    collapse_parser.add_argument('--debug', dest='debug', default=False,
                                 action='store_true',
                                 help='Run in debugging mode, (default: %(default)s)')
    collapse_parser.set_defaults(func=collapse)

    args = parser.parse_args()
    try:
        func = args.func
    except AttributeError:
        parser.error('too few arguments')
    func(args)


if __name__ == '__main__':
    main()
