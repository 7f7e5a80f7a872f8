"""Device mesh and sharded batch runners.

The reference's only parallelism is a fork-based multiprocessing.Pool over
read chunks (SURVEY.md §2: pools at find_ccs.py:26, find_bsj.py:340,462,662,
collapse.py:848).  The TPU equivalent is a 2-D device mesh:

  * 'reads' axis -- data parallelism over read batches (the analog of the
    reference's chunked pools); per-host genome/index state is replicated.
  * 'lag' axis   -- intra-op sharding of the tandem-period lag profile
    (ops/period.py), the one bulk op whose non-batch axis is wide enough to
    split; its reduction rides an all-gather over ICI.

Cross-device reductions (read counters) use psum, candidate-record merges
use all_gather -- XLA collectives, not host gathers (SURVEY.md §2 table).
Multi-host entry: init_distributed() wraps jax.distributed.initialize.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ciri_long_tpu.ops.sw import SWParams, sw_score_ends
from ciri_long_tpu.ops.period import lag_profile, tandem_counts

READS_AXIS = 'reads'
LAG_AXIS = 'lag'


def make_mesh(n_devices=None, lag_parallel=None):
    """Build a (reads, lag) mesh over the available devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if lag_parallel is None:
        lag_parallel = 2 if n % 2 == 0 and n >= 4 else 1
    dp = n // lag_parallel
    grid = np.array(devs[:dp * lag_parallel]).reshape(dp, lag_parallel)
    return Mesh(grid, (READS_AXIS, LAG_AXIS))


def init_distributed(coordinator=None, num_processes=None, process_id=None):
    """Multi-host bring-up (no-op when single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def pad_to_multiple(x, m, axis=0, fill=5):
    n = x.shape[axis]
    pad = (-n) % m
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(x, widths, constant_values=fill)


def sharded_sw(mesh, query, ref, params: SWParams):
    """Batched SW sharded over the 'reads' axis; counters psum-reduced.

    Returns (score, q_end, r_end, n_positive) with n_positive the global
    count of positive-scoring pairs (the reference accumulates such
    counters in-driver, main.py:81-94; here it is a device-side psum).
    """
    n_dp = mesh.shape[READS_AXIS]
    q = pad_to_multiple(np.asarray(query), n_dp)
    r = pad_to_multiple(np.asarray(ref), n_dp)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(READS_AXIS, None), P(READS_AXIS, None)),
        out_specs=(P(READS_AXIS), P(READS_AXIS), P(READS_AXIS), P()),
        check_rep=False)
    def step(q_shard, r_shard):
        score, q_end, r_end = sw_score_ends(q_shard, r_shard, params)
        n_pos = jax.lax.psum(jnp.sum((score > 0).astype(jnp.int32)),
                             READS_AXIS)
        return score, q_end, r_end, n_pos

    score, q_end, r_end, n_pos = jax.jit(step)(jnp.asarray(q), jnp.asarray(r))
    B = np.asarray(query).shape[0]
    return (np.asarray(score)[:B], np.asarray(q_end)[:B],
            np.asarray(r_end)[:B], int(np.asarray(n_pos).reshape(-1)[0]))


def make_pipeline_step(mesh, params: SWParams, max_lag: int):
    """The jittable multi-chip device step used by the driver's dry run:
    reads DP-sharded, the lag axis of the period profile model-sharded,
    counters psum-reduced across the whole mesh.

    Returns a function (reads [B, L], query [B, Lq], ref [B, Lr]) ->
    (lag profile [B, max_lag], sw scores [B], global positive count).
    """
    lag_shards = mesh.shape[LAG_AXIS]
    assert max_lag % lag_shards == 0

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(READS_AXIS, None), P(READS_AXIS, None), P(READS_AXIS, None)),
        out_specs=(P(READS_AXIS, LAG_AXIS), P(READS_AXIS), P()),
        check_rep=False)
    def step(reads_shard, q_shard, r_shard):
        # tandem screen counts (the production CCS pre-screen,
        # pipeline/find_ccs.py): each lag shard computes its slice of lags
        lag_idx = jax.lax.axis_index(LAG_AXIS)
        lo = lag_idx * (max_lag // lag_shards)
        prof = tandem_counts(reads_shard, max_lag // lag_shards,
                             lag_offset=lo, pad_lags=max_lag)
        # SW scoring: pure data parallel
        score, _, _ = sw_score_ends(q_shard, r_shard, params)
        n_pos = jax.lax.psum(jnp.sum((score > 0).astype(jnp.int32)),
                             (READS_AXIS, LAG_AXIS))
        return prof, score, n_pos

    return jax.jit(step)


def sharded_pipeline_step(mesh, reads, query, ref, params=SWParams(),
                          max_lag=128):
    step = make_pipeline_step(mesh, params, max_lag)
    return step(jnp.asarray(reads), jnp.asarray(query), jnp.asarray(ref))


# ----------------------------------------------------------------------
# Candidate-record merge.  The reference appends per-chunk candidate
# circRNAs to a shared file from pool workers (find_bsj.py:473) and the
# driver accumulates counters (main.py:81-94); the TPU-native equivalent
# keeps fixed-shape candidate records on device and merges them with one
# all_gather over the reads axis -- every host then holds the full
# replicated record table, and the host-side pipeline filters the valid
# rows (SURVEY.md §2 parallelism table, ROADMAP item 5).

CAND_FIELDS = 6  # read_id, ctg_id, start, end, strand, score


def make_candidate_gather(mesh):
    """Jitted (records [B, CAND_FIELDS] i32, valid [B] bool) ->
    (all_records [B_total, CAND_FIELDS], all_valid [B_total], n_valid):
    records DP-sharded in, replicated out via all_gather riding ICI."""

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(READS_AXIS, None), P(READS_AXIS)),
        out_specs=(P(), P(), P()),
        check_rep=False)
    def gather(rec_shard, valid_shard):
        all_rec = jax.lax.all_gather(rec_shard, READS_AXIS, tiled=True)
        all_valid = jax.lax.all_gather(valid_shard, READS_AXIS, tiled=True)
        n = jax.lax.psum(jnp.sum(valid_shard.astype(jnp.int32)), READS_AXIS)
        # replicate across the lag axis too so the outputs are truly
        # unsharded on the full mesh
        n = jax.lax.pmax(n, LAG_AXIS)
        return all_rec, all_valid, n

    return jax.jit(gather)


def gather_candidates(mesh, records, valid):
    """Merge per-shard candidate records into one replicated table and
    return the valid rows on host (read-id sorted for determinism).
    Batches that do not divide the reads axis are padded with invalid
    rows (same bucketing contract as sharded_sw)."""
    dp = mesh.shape[READS_AXIS]
    records = np.asarray(records, np.int32)
    valid = np.asarray(valid, bool)
    pad = (-len(records)) % dp
    if pad:
        records = np.pad(records, ((0, pad), (0, 0)))
        valid = np.pad(valid, (0, pad))
    rec = jnp.asarray(records, jnp.int32)
    val = jnp.asarray(valid, bool)
    all_rec, all_valid, n = make_candidate_gather(mesh)(rec, val)
    rec_h = np.asarray(all_rec)[np.asarray(all_valid)]
    order = np.lexsort(tuple(rec_h[:, c] for c in
                             range(rec_h.shape[1] - 1, -1, -1)))
    return rec_h[order], int(n)
