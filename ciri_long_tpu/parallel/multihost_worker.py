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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--coordinator', required=True)
    ap.add_argument('--num-processes', type=int, required=True)
    ap.add_argument('--process-id', type=int, required=True)
    ap.add_argument('--devices-per-process', type=int, default=2)
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
    gmesh = make_mesh()
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
    jax.distributed.shutdown()


if __name__ == '__main__':
    main()
