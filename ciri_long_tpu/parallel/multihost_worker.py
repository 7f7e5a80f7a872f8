"""Multi-host smoke worker: run under jax.distributed with N processes.

Each process contributes its local read batch; the sharded SW counter must
psum to the same global value on every host (the cross-host analog of the
reference's in-driver counter accumulation, main.py:81-94).

Usage (one invocation per process):
  python -m ciri_long_tpu.parallel.multihost_worker \
      --coordinator 127.0.0.1:PORT --num-processes N --process-id I
"""

import argparse
import os


def build_demo_world(seed=20260817, n_loci=3, depth=4):
    """Deterministic mini world shared by every process (and by the test's
    serial reference run): genome with planted circRNAs + consensus reads.
    numpy-only -- safe to call before jax.distributed.initialize.

    Defaults give the small fixed world the 2-process test asserts on;
    benchmarks/scaling.py scales it up via n_loci/depth."""
    import numpy as np

    from ciri_long_tpu.context import Context
    from ciri_long_tpu.io.genome import Genome
    from ciri_long_tpu.models.aligner import GenomeAligner
    from ciri_long_tpu.ops.ccs import find_consensus

    rng = np.random.default_rng(seed)
    size = max(40_000, 6_000 + n_loci * 11_000 + 6_000)
    chr1 = list(''.join(rng.choice(list('ACGT'), size=size)))
    loci = []
    for t in range(n_loci):
        st = 6_000 + t * 11_000
        en = st + 250 + 80 * (t % 5)
        chr1[st - 2:st] = list('AG')
        chr1[en:en + 2] = list('GT')
        loci.append((st, en))
    chr1 = ''.join(chr1)
    genome = Genome.from_dict({'chr1': chr1})
    ctx = Context(aligner=GenomeAligner(genome), genome=genome)

    def mutate(s, noise):
        out = []
        for c in s:
            r = rng.random()
            if r < noise / 2:
                continue
            out.append('ACGT'[int(rng.integers(0, 4))] if r < noise else c)
            if rng.random() < noise / 2:
                out.append('ACGT'[int(rng.integers(0, 4))])
        return ''.join(out)

    ccs_seq = {}
    n = 0
    for st, en in loci:
        unit = chr1[st:en]
        for d in range(depth):
            rot = (d * 71) % len(unit)
            u = unit[rot:] + unit[:rot]
            read = ''.join(mutate(u, 0.02) for _ in range(3 + d % 2))
            segments, ccs = find_consensus(read)
            if segments is None:
                continue
            ccs_seq['read_{:03d}'.format(n)] = [segments, ccs, read]
            n += 1
    return ctx, ccs_seq


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--coordinator', required=True)
    ap.add_argument('--num-processes', type=int, required=True)
    ap.add_argument('--process-id', type=int, required=True)
    ap.add_argument('--devices-per-process', type=int, default=2)
    ap.add_argument('--scan-out', default=None,
                    help='run the e2e cohort scan and write the merged '
                         'cand_circ.fa here (one file per process)')
    ap.add_argument('--bench-loci', type=int, default=3,
                    help='demo-world loci (benchmarks/scaling.py scale-up)')
    ap.add_argument('--bench-depth', type=int, default=4,
                    help='reads per locus in the demo world')
    args = ap.parse_args()

    os.environ['JAX_PLATFORMS'] = 'cpu'
    flags = os.environ.get('XLA_FLAGS', '')
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count={}'.format(
        args.devices_per_process)).strip()

    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.distributed.initialize(coordinator_address=args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.process_id)

    import functools
    import numpy as np
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ciri_long_tpu.ops.sw import SWParams, sw_score_ends

    devs = np.array(jax.devices())
    mesh = Mesh(devs, ('reads',))
    n_global = len(devs)
    per_dev = 4
    B = n_global * per_dev

    rng = np.random.default_rng(0)   # same data on every host
    q = rng.integers(0, 4, (B, 64)).astype(np.int8)
    r = rng.integers(0, 4, (B, 96)).astype(np.int8)
    params = SWParams(1, 1, 1, 1)

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P('reads', None), P('reads', None)),
                       out_specs=P(), check_rep=False)
    def count_positive(qs, rs):
        score, _, _ = sw_score_ends(qs, rs, params)
        return jax.lax.psum(jnp.sum((score > 0).astype(jnp.int32)), 'reads')

    sharding = NamedSharding(mesh, P('reads', None))
    # each process contributes its LOCAL batch as one shard of the global
    # array; with identical data per host the global counter is the local
    # count times the number of processes
    qg = jax.make_array_from_process_local_data(sharding, q)
    rg = jax.make_array_from_process_local_data(sharding, r)
    total = jax.jit(count_positive)(qg, rg)
    exp_score, _, _ = sw_score_ends(q, r, params)
    expected = args.num_processes * int((np.asarray(exp_score) > 0).sum())
    got = int(np.asarray(jax.device_get(total)).reshape(-1)[0])
    print('MULTIHOST_RESULT pid={} got={} expected={}'.format(
        args.process_id, got, expected), flush=True)
    assert got == expected

    # --- candidate-record merge across processes (ROADMAP 5): each
    # process contributes DISTINCT records; after the all_gather every
    # process must hold the full replicated table (the cross-host analog
    # of the reference's shared cand_circ.fa append, find_bsj.py:473) ---
    from ciri_long_tpu.parallel.mesh import (CAND_FIELDS, READS_AXIS,
                                             make_candidate_gather,
                                             make_mesh)
    gmesh = make_mesh(lag_parallel=1)
    rows_local = 6
    rec = np.zeros((rows_local, CAND_FIELDS), np.int32)
    rec[:, 0] = 1000 * args.process_id + np.arange(rows_local)
    rec[:, 5] = 7 + args.process_id
    valid = np.ones(rows_local, bool)
    valid[-1] = False
    gshard = NamedSharding(gmesh, P(READS_AXIS, None))
    vshard = NamedSharding(gmesh, P(READS_AXIS))
    rec_g = jax.make_array_from_process_local_data(gshard, rec)
    val_g = jax.make_array_from_process_local_data(vshard, valid)
    all_rec, all_valid, n = make_candidate_gather(gmesh)(rec_g, val_g)
    merged = np.asarray(all_rec)[np.asarray(all_valid)]
    ids = sorted(merged[:, 0].tolist())
    want = sorted([1000 * p + i for p in range(args.num_processes)
                   for i in range(rows_local - 1)])
    print('MULTIHOST_GATHER pid={} n={} ids_ok={}'.format(
        args.process_id, int(np.asarray(n).reshape(-1)[0]),
        ids == want), flush=True)
    assert ids == want

    # --- full cohort scan e2e (VERDICT round-1 item 5): each process
    # scans its own shard of the shared read set, records merge via the
    # device all_gather, every process writes the identical file ---
    if args.scan_out:
        import hashlib
        import time
        from ciri_long_tpu.parallel.cohort import (_shard_bounds,
                                                   scan_ccs_cohort_step,
                                                   write_records)
        from ciri_long_tpu.parallel.mesh import make_mesh as mk

        ctx, ccs_seq = build_demo_world(n_loci=args.bench_loci,
                                        depth=args.bench_depth)
        items = [[rid] + ccs_seq[rid] for rid in ccs_seq]
        read_ids = [it[0] for it in items]
        smesh = mk(lag_parallel=1)
        lo, hi = _shard_bounds(len(items), args.num_processes)[args.process_id]
        t0 = time.monotonic()
        merged, counters, _short = scan_ccs_cohort_step(
            smesh, ctx, items, lo, hi, read_ids, True)
        wall = time.monotonic() - t0
        write_records(args.scan_out, merged, read_ids,
                      list(ctx.genome.names))
        md5 = hashlib.md5(open(args.scan_out, 'rb').read()).hexdigest()
        print('MULTIHOST_SCAN pid={} n_rec={} md5={} n_reads={} '
              'wall_s={:.3f}'.format(args.process_id, len(merged), md5,
                                     len(items), wall), flush=True)

    jax.distributed.shutdown()


if __name__ == '__main__':
    main()
