"""Pallas TPU kernel for batched affine-gap Smith-Waterman.

The performance path behind ops/sw.py.  One kernel invocation processes a
[bTile, Lr] stripe of DP state entirely in VMEM for all Lq rows -- no
per-row XLA dispatch, no HBM round-trips for the carry.  This is the role
the SSE2 'striped' loop plays in the reference's vendored SSW
(ssw.c:123-370); on TPU the whole padded reference axis is the vector and
the within-row affine dependency is a log-shift prefix max (see ops/sw.py
for the exactness argument; requires gap_open >= gap_extend).

Layout:
  grid    = (B / BTILE,)           one program per batch stripe
  q, r    = int32 [B, Lq/Lr] VMEM blocks (padded: PAD=5 poisons cells)
  out     = int32 [B, 128]: lane 0 = score, 1 = q_end, 2 = r_end
  scratch = H, F, best_val, best_i  int32 [BTILE, LrP] VMEM

Tie-break matches ops/sw.py: max score, then smallest r_end, then smallest
q_end; (0, -1, -1) when no positive cell.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(1 << 28)
BIG = 1 << 28
# 64-row stripes won the v5e sweep (32: 244.8 / 64: 260.9 GCUPS on the
# B=512 x 1024 x 4096 bench config; 128 hit multi-minute Mosaic compiles)
BTILE = 64
LANES = 128


def _round_up(x, m):
    return (x + m - 1) // m * m


def _shift_right(x, is_lane0, fill):
    rolled = pltpu.roll(x, 1, axis=1)
    return jnp.where(is_lane0, fill, rolled)


def _cummax_lanes(x, masks):
    """Inclusive running max along the lane axis via log-shifts; ``masks``
    are the precomputed (j_idx >= k) wrap guards, hoisted out of the row
    loop."""
    k = 1
    for m in masks:
        sh = pltpu.roll(x, k, axis=1)
        x = jnp.maximum(x, jnp.where(m, sh, NEG))
        k *= 2
    return x


def _sw_kernel(q_ref, r_ref, out_ref, H, F, best_val, best_i, qblk,
               *, btile, lqp, lrp, match, mismatch, gap_open, gap_extend):
    r = r_ref[:]
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (btile, lrp), 1)

    H[:] = jnp.zeros((btile, lrp), jnp.int32)
    F[:] = jnp.full((btile, lrp), NEG, jnp.int32)
    best_val[:] = jnp.zeros((btile, lrp), jnp.int32)
    best_i[:] = jnp.full((btile, lrp), -1, jnp.int32)

    # loop-invariant hoists: reference-only masks, gap ramps, and the
    # cummax wrap guards (one bool array per log-shift level)
    r_is_n = r == 4
    r_is_pad = r >= 5
    jge = j_idx * gap_extend
    e_bias = gap_open + (j_idx - 1) * gap_extend
    is_lane0 = j_idx == 0
    masks = []
    k = 1
    while k < lrp:
        masks.append(j_idx >= k)
        k *= 2

    def step(i, q_col):
        # q_col: [BTILE, 1] current query base codes
        is_n = (q_col == 4) | r_is_n
        is_pad = (q_col >= 5) | r_is_pad
        s = jnp.where(q_col == r, match, -mismatch)
        s = jnp.where(is_n, 0, s)
        s = jnp.where(is_pad, NEG, s)

        Hp = H[:]
        Fv = jnp.maximum(F[:] - gap_extend, Hp - gap_open)
        Hdiag = _shift_right(Hp, is_lane0, 0)
        H0 = jnp.maximum(jnp.maximum(Hdiag + s, Fv), 0)

        P = _cummax_lanes(H0 + jge, masks)
        Ps = _shift_right(P, is_lane0, NEG)
        E = Ps - e_bias
        Hn = jnp.maximum(H0, E)

        better = Hn > best_val[:]
        best_val[:] = jnp.where(better, Hn, best_val[:])
        best_i[:] = jnp.where(better, i, best_i[:])
        H[:] = Hn
        F[:] = Fv

    # Mosaic cannot index a single dynamic lane, so the query is staged in
    # 128-lane chunks; the chunk register rotates one lane left per step so
    # the current base is always at (static) lane 0.
    def chunk_body(c, _):
        base = pl.multiple_of(c * LANES, LANES)
        qblk[:] = q_ref[:, pl.ds(base, LANES)]

        def inner(t, _):
            step(c * LANES + t, qblk[:, 0:1])
            qblk[:] = pltpu.roll(qblk[:], LANES - 1, axis=1)
            return 0

        jax.lax.fori_loop(0, LANES, inner, 0)
        return 0

    jax.lax.fori_loop(0, lqp // LANES, chunk_body, 0)

    bv = best_val[:]
    best = jnp.max(bv, axis=1, keepdims=True)
    isbest = bv == best
    jstar = jnp.min(jnp.where(isbest, j_idx, BIG), axis=1, keepdims=True)
    istar = jnp.min(jnp.where(isbest & (j_idx == jstar), best_i[:], BIG),
                    axis=1, keepdims=True)

    found = best > 0
    score = jnp.where(found, best, 0)
    iout = jnp.where(found, istar, -1)
    jout = jnp.where(found, jstar, -1)

    lane = jax.lax.broadcasted_iota(jnp.int32, (btile, LANES), 1)
    out = jnp.where(lane == 0, score,
                    jnp.where(lane == 1, iout,
                              jnp.where(lane == 2, jout, 0)))
    out_ref[:] = out


def _sw_wave_kernel(q_ref, r_ref, out_ref, Hd1, Hd2, H0d1, Ed1, Fd1,
                    best_val, best_d, r_diag, rblk,
                    *, btile, lqp, lrpw, match, mismatch, gap_open,
                    gap_extend):
    """Anti-diagonal wavefront layout: lanes = QUERY positions, one step
    per diagonal d (cell (i, j=d-i) lives at lane i on step d).

    The within-row E dependency that costs the striped kernel its
    log-shift prefix scan becomes a same-lane read of the previous
    diagonal (E[i,j-1] and H0[i,j-1] both sit at lane i, diag d-1); the F
    and match-diagonal dependencies are single-lane rolls.  Per-step
    vector cost ~30 ops on [btile, lqp] vs ~55 on [btile, lrp] for the
    scan kernel, at lr/(lq+lr) lane utilisation -- honest measurement
    70.9 vs the scan kernel's 48.6 GCUPS on the 1024x4096 bench shape
    (fixed methodology; benchmarks/KERNEL_SOL.md round-3 correction).

    The reference base enters at lane 0 and shifts one lane per step
    (r_diag[i] = r[d-i]); lanes ahead of their start column hold H=0 and
    E,F<0, reproducing the scan kernel's boundary conditions exactly.
    Results (score / q_end / r_end incl. tie-breaks) are identical --
    tests/test_sw_pallas.py fuzzes both against the oracle."""
    q = q_ref[:]
    i_idx = jax.lax.broadcasted_iota(jnp.int32, (btile, lqp), 1)
    is_lane0 = i_idx == 0
    q_is_n = q == 4
    q_is_pad = q >= 5

    Hd1[:] = jnp.zeros((btile, lqp), jnp.int32)
    Hd2[:] = jnp.zeros((btile, lqp), jnp.int32)
    H0d1[:] = jnp.zeros((btile, lqp), jnp.int32)
    Ed1[:] = jnp.full((btile, lqp), NEG, jnp.int32)
    Fd1[:] = jnp.full((btile, lqp), NEG, jnp.int32)
    best_val[:] = jnp.zeros((btile, lqp), jnp.int32)
    best_d[:] = jnp.full((btile, lqp), -1, jnp.int32)
    r_diag[:] = jnp.full((btile, lqp), 5, jnp.int32)

    def step(d, r_col):
        rd = jnp.where(is_lane0, r_col, pltpu.roll(r_diag[:], 1, axis=1))
        r_diag[:] = rd
        s = jnp.where(q == rd, match, -mismatch)
        s = jnp.where(q_is_n | (rd == 4), 0, s)
        s = jnp.where(q_is_pad | (rd >= 5), NEG, s)

        h1 = Hd1[:]
        h1s = pltpu.roll(h1, 1, axis=1)
        f1s = pltpu.roll(Fd1[:], 1, axis=1)
        Fv = jnp.where(is_lane0, NEG,
                       jnp.maximum(f1s - gap_extend, h1s - gap_open))

        h2s = jnp.where(is_lane0, 0, pltpu.roll(Hd2[:], 1, axis=1))
        H0 = jnp.maximum(jnp.maximum(h2s + s, Fv), 0)

        E = jnp.maximum(Ed1[:] - gap_extend, H0d1[:] - gap_open)
        Hn = jnp.maximum(H0, E)

        better = Hn > best_val[:]
        best_val[:] = jnp.where(better, Hn, best_val[:])
        best_d[:] = jnp.where(better, d, best_d[:])

        Hd2[:] = h1
        Hd1[:] = Hn
        H0d1[:] = H0
        Ed1[:] = E
        Fd1[:] = Fv

    def chunk_body(c, _):
        base = pl.multiple_of(c * LANES, LANES)
        rblk[:] = r_ref[:, pl.ds(base, LANES)]

        def inner(t, _):
            step(c * LANES + t, rblk[:, 0:1])
            rblk[:] = pltpu.roll(rblk[:], LANES - 1, axis=1)
            return 0

        jax.lax.fori_loop(0, LANES, inner, 0)
        return 0

    jax.lax.fori_loop(0, lrpw // LANES, chunk_body, 0)

    # tie-break identical to the scan kernel: max score, then smallest
    # r_end (= best_d - i), then smallest q_end (= i)
    bv = best_val[:]
    best = jnp.max(bv, axis=1, keepdims=True)
    isbest = bv == best
    j_of = best_d[:] - i_idx
    jstar = jnp.min(jnp.where(isbest, j_of, BIG), axis=1, keepdims=True)
    istar = jnp.min(jnp.where(isbest & (j_of == jstar), i_idx, BIG),
                    axis=1, keepdims=True)
    found = best > 0
    score = jnp.where(found, best, 0)
    iout = jnp.where(found, istar, -1)
    jout = jnp.where(found, jstar, -1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (btile, LANES), 1)
    out = jnp.where(lane == 0, score,
                    jnp.where(lane == 1, iout,
                              jnp.where(lane == 2, jout, 0)))
    out_ref[:] = out


def _sw_wave5_kernel(q_ref, r_ref, out_ref, Hd1, Hd2, Ed1, Fd1, best_pack,
                     r_diag, rblk,
                     *, btile, lqp, lrpw, match, mismatch, gap_open,
                     gap_extend, unroll, lb, no_n=False):
    """Lean wavefront (the round-3 production kernel): _sw_wave_kernel
    plus four exact transforms; honest measurement 80.9 vs the r2 wave
    kernel's 70.9 GCUPS on the bench shape (fixed methodology,
    misc/kexp.py --wave5 --btile 64 --unroll 2):

    1. Pad-6 scoring: the caller remaps REFERENCE pads to code 6 (query
       pads stay 5), so q == rd is impossible at any pad and the NEG
       select row disappears.  A pad cell can only carry or lose value,
       so it never strictly exceeds the running best; the one hazard --
       a genuine r N column adjacent to the best cell would score 0 in a
       q-pad lane and TIE the best with a smaller j -- is closed by
       masking the N-zero rule to real query lanes (hoisted mask).
    2. E from full H: max(E - ge, H - go) == max(E - ge, H0 - go) for
       go >= ge, dropping the H0 carry row (one scratch + one write).
    3. Diag-only packed best: the global SW max is never an E/F-derived
       or 0-floor cell and its Hn tie set equals the tie set of
       dval = Hdiag + s, so best = max(best, dval << LB | (span1 - d))
       -- one shift+add+max replacing cmp+2 selects, with the smallest-d
       tie preference encoded in the complemented low bits (the wave2
       experiment's packing, with the regressive multiply replaced by a
       shift).  Requires match * min(lq, lr) << LB < 2^31 (caller
       routes to the wave kernel otherwise).
    4. UNROLL diagonals per inner loop step: one rblk rotate + loop
       bookkeeping per UNROLL steps.

    Contract, tie-breaks and oracle parity identical to _sw_wave_kernel
    (tests/test_sw_pallas.py fuzzes all routes)."""
    import jax
    import jax.numpy as jnp

    span1 = (1 << lb) - 1
    q = q_ref[:]
    i_idx = jax.lax.broadcasted_iota(jnp.int32, (btile, lqp), 1)
    is_lane0 = i_idx == 0
    q_is_n = q == 4
    lane_real = q < 5

    Hd1[:] = jnp.zeros((btile, lqp), jnp.int32)
    Hd2[:] = jnp.zeros((btile, lqp), jnp.int32)
    Ed1[:] = jnp.full((btile, lqp), NEG, jnp.int32)
    Fd1[:] = jnp.full((btile, lqp), NEG, jnp.int32)
    best_pack[:] = jnp.zeros((btile, lqp), jnp.int32)
    r_diag[:] = jnp.full((btile, lqp), 6, jnp.int32)

    # no_n (static): the caller proved the reference rows N-free, so the
    # rd==4 test is constant-false and the N-zero mask hoists to a
    # per-lane constant (2 fewer vector ops per step)
    zn_mask = q_is_n & lane_real

    def step(d, r_col):
        rd = jnp.where(is_lane0, r_col, pltpu.roll(r_diag[:], 1, axis=1))
        r_diag[:] = rd
        s = jnp.where(q == rd, match, -mismatch)
        if no_n:
            s = jnp.where(zn_mask, 0, s)
        else:
            s = jnp.where((q_is_n | (rd == 4)) & lane_real, 0, s)

        h1 = Hd1[:]
        h1s = pltpu.roll(h1, 1, axis=1)
        f1s = pltpu.roll(Fd1[:], 1, axis=1)
        Fv = jnp.where(is_lane0, NEG,
                       jnp.maximum(f1s - gap_extend, h1s - gap_open))
        h2s = jnp.where(is_lane0, 0, pltpu.roll(Hd2[:], 1, axis=1))
        dval = h2s + s
        best_pack[:] = jnp.maximum(best_pack[:],
                                   (dval << lb) + (span1 - d))
        H0 = jnp.maximum(jnp.maximum(dval, Fv), 0)
        E = jnp.maximum(Ed1[:] - gap_extend, h1 - gap_open)
        Hn = jnp.maximum(H0, E)

        Hd2[:] = h1
        Hd1[:] = Hn
        Ed1[:] = E
        Fd1[:] = Fv

    def chunk_body(c, _):
        base = pl.multiple_of(c * LANES, LANES)
        rblk[:] = r_ref[:, pl.ds(base, LANES)]

        def inner(t, _):
            for u in range(unroll):
                step(c * LANES + t * unroll + u, rblk[:, u:u + 1])
            rblk[:] = pltpu.roll(rblk[:], LANES - unroll, axis=1)
            return 0

        jax.lax.fori_loop(0, LANES // unroll, inner, 0)
        return 0

    jax.lax.fori_loop(0, lrpw // LANES, chunk_body, 0)

    bp = best_pack[:]
    bv = bp >> lb
    bd = span1 - (bp & span1)
    best = jnp.max(bv, axis=1, keepdims=True)
    isbest = bv == best
    j_of = bd - i_idx
    jstar = jnp.min(jnp.where(isbest, j_of, BIG), axis=1, keepdims=True)
    istar = jnp.min(jnp.where(isbest & (j_of == jstar), i_idx, BIG),
                    axis=1, keepdims=True)
    found = best > 0
    score = jnp.where(found, best, 0)
    iout = jnp.where(found, istar, -1)
    jout = jnp.where(found, jstar, -1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (btile, LANES), 1)
    out = jnp.where(lane == 0, score,
                    jnp.where(lane == 1, iout,
                              jnp.where(lane == 2, jout, 0)))
    out_ref[:] = out


def _sw_chain_kernel(q_ref, r_ref, out_ref, Hd1, Hd2r, Ed1, Fd1, best_pack,
                     capB, r_diag, rblk,
                     *, btile, lqp, lrp, C, match, mismatch, gap_open,
                     gap_extend, lb, no_n=False):
    """Op-diet chained wavefront (round-4 'wave7'): C same-bucket jobs
    per lane-row stream back-to-back; a reset/capture wave rides each
    job boundary, so the ramp-down of job k overlaps the ramp-up of job
    k+1 and lane utilisation goes from lr/(lq+lr) to ~lr/(lr+1).
    Honest measurements (benchmarks/KERNEL_SOL.md): 127.2 vs the wave6
    formulation's 92.8 GCUPS on the 1024x4096 bench shape (same
    session, fixed methodology).

    Stream layout (host contract, sw_score_ends_chain): slot k*(lrp+1)
    is job k's boundary, slots [o_k, o_k + lrp) its reference codes
    (o_k = k*(lrp+1) + 1, pads code 6); slot t enters lane 0 at step t,
    so job k's cell (i, j) computes at lane i on step o_k + i + j --
    phase 0 for every job, keeping the plain wave kernel's lane-0 column
    boundary and circular-roll semantics.  Requirements: lrp + 1 and lqp
    multiples of LANES, lrp >= lqp - 1, match * lqp << lb < 2^31 (lb
    spans the GLOBAL step count).

    Phase A_k (lqp steps from t0 = k*(lrp+1)): the boundary lane
    b = t - t0 captures job k-1's packed best and resets its DP state;
    lanes <= b already score against job k's query (per-lane selects
    between the two jobs' hoisted score vectors).  Phase B_k: plain
    steps.  After A_k a static drain reduces job k-1's captures into
    output slot k-1.  Oracle parity incl. tie-breaks:
    tests/test_sw_pallas.py.

    Three exact op-diet transforms over the round-3 wave6 step
    (~26 -> ~20 vector ops per phase-B diagonal):

    1. Two-select scoring over hoisted constant vectors SM/SX/ZN, which
       fold the query-lane N-zero rule and the frame constants below
       into per-lane constants: s = sel(q==rd, SM, SX); s = sel(rd==4,
       ZN, s).  No or/and chain (6 -> 4 ops).
    2. Shared H roll: hc = H'(d-1) - (go-ge) is subtracted once; its
       roll feeds BOTH this step's F update and -- stored as Hd2r --
       the next step's match diagonal.  One roll less per step, and the
       old Hd2 boundary reset disappears (the only reader of the
       boundary lane's stored value is the next boundary lane, whose
       computed cell the reset selects discard anyway).
    3. Gap-extend frame: every DP state value carries a +d*ge bias
       (d = global step), turning the E update into max(E', hc) and the
       F update into max(roll(F'), roll(hc)) -- both per-step gap
       subtracts vanish.  The 0-floor becomes the scalar d*ge, the
       lane-0 diagonal fill the scalar (d-2)*ge - (go-ge), and the
       packed-best scalar absorbs the un-biasing exactly:
       (dval' << lb) + (span1 - d - (d*ge << lb)) == the real
       (dval << lb) + (span1 - d) mod 2^32, whose true value fits int31
       by the chain_plan precondition -- int32 wraparound in the
       intermediates cancels exactly.  NEG sentinels drift by +d*ge
       (<< |NEG|, harmless); pre-reset junk lanes stay bounded because
       the d*ge floor pins their real value at 0, and their packed
       bests are discarded by the boundary reset before any drained
       capture.

    ``no_n`` (static): the caller proved the reference stream contains
    no N codes (rd==4 never occurs -- boundary and pad slots are code
    6), so the ZN select and its phase-A blend are identities and drop
    (~2 fewer vector ops per step).  Exactness is structural: the
    dropped select only ever fires on rd==4.
    """
    import jax
    import jax.numpy as jnp

    span1 = (1 << lb) - 1
    c_go = gap_open - gap_extend     # >= 0 by the affine-trick contract
    s_base = gap_open + gap_extend   # c_go + 2*ge, folded into SM/SX/ZN
    i_idx = jax.lax.broadcasted_iota(jnp.int32, (btile, lqp), 1)
    is_lane0 = i_idx == 0

    Hd1[:] = jnp.zeros((btile, lqp), jnp.int32)
    Hd2r[:] = jnp.zeros((btile, lqp), jnp.int32)
    Ed1[:] = jnp.full((btile, lqp), NEG, jnp.int32)
    Fd1[:] = jnp.full((btile, lqp), NEG, jnp.int32)
    best_pack[:] = jnp.zeros((btile, lqp), jnp.int32)
    capB[:] = jnp.zeros((btile, lqp), jnp.int32)
    r_diag[:] = jnp.full((btile, lqp), 6, jnp.int32)

    def svecs(q):
        q_is_n = q == 4
        lane_real = q < 5
        SM = jnp.where(q_is_n, s_base, match + s_base)
        SX = jnp.where(q_is_n, s_base, -mismatch + s_base)
        ZN = jnp.where(lane_real, s_base, -mismatch + s_base)
        return q, SM, SX, ZN

    def dp_step(d, r_col, qsv, boundary_lane=None, qsv_prev=None):
        rd = jnp.where(is_lane0, r_col, pltpu.roll(r_diag[:], 1, axis=1))
        r_diag[:] = rd
        q, SM, SX, ZN = qsv
        if boundary_lane is not None:
            is_b = i_idx == boundary_lane
            le_b = i_idx <= boundary_lane
            qp, SMp, SXp, ZNp = qsv_prev
            q = jnp.where(le_b, q, qp)
            SM = jnp.where(le_b, SM, SMp)
            SX = jnp.where(le_b, SX, SXp)
            if not no_n:
                ZN = jnp.where(le_b, ZN, ZNp)
        else:
            is_b = None
        s = jnp.where(q == rd, SM, SX)
        if not no_n:
            s = jnp.where(rd == 4, ZN, s)

        h1 = Hd1[:]
        hc = h1 - c_go
        hcs = pltpu.roll(hc, 1, axis=1)
        f1s = pltpu.roll(Fd1[:], 1, axis=1)
        Fv = jnp.where(is_lane0, NEG, jnp.maximum(f1s, hcs))
        h2s = jnp.where(is_lane0, (d - 2) * gap_extend - c_go, Hd2r[:])
        dval = h2s + s
        K = span1 - d - ((d * gap_extend) << lb)
        bp = jnp.maximum(best_pack[:], (dval << lb) + K)
        H0 = jnp.maximum(jnp.maximum(dval, Fv), d * gap_extend)
        E = jnp.maximum(Ed1[:], hc)
        Hn = jnp.maximum(H0, E)

        Hd2r[:] = hcs
        if is_b is not None:
            capB[:] = jnp.where(is_b, best_pack[:], capB[:])
            best_pack[:] = jnp.where(is_b, 0, bp)
            Hd1[:] = jnp.where(is_b, d * gap_extend, Hn)
            Ed1[:] = jnp.where(is_b, NEG, E)
            Fd1[:] = jnp.where(is_b, NEG, Fv)
        else:
            best_pack[:] = bp
            Hd1[:] = Hn
            Ed1[:] = E
            Fd1[:] = Fv

    def run_phase(c0, n_chunks, body):
        # 8 diagonals per inner iteration: one rblk rotate + loop
        # bookkeeping per 8 steps (kexp sweep on the bench shape:
        # unroll 2 = 127.2, 4 = 131.9, 8 = 134.4 GCUPS)
        unroll = 8

        def chunk(c, _):
            base = pl.multiple_of(c * LANES, LANES)
            rblk[:] = r_ref[:, pl.ds(base, LANES)]

            def inner(u, _):
                for v in range(unroll):
                    body(c * LANES + u * unroll + v, rblk[:, v:v + 1])
                rblk[:] = pltpu.roll(rblk[:], LANES - unroll, axis=1)
                return 0

            jax.lax.fori_loop(0, LANES // unroll, inner, 0)
            return 0

        jax.lax.fori_loop(c0, c0 + n_chunks, chunk, 0)

    def drain(k):
        bp = capB[:]
        bv = bp >> lb
        bd = span1 - (bp & span1)
        o_k = k * (lrp + 1) + 1
        best = jnp.max(bv, axis=1, keepdims=True)
        isbest = bv == best
        j_of = bd - o_k - i_idx
        jstar = jnp.min(jnp.where(isbest, j_of, BIG), axis=1,
                        keepdims=True)
        istar = jnp.min(jnp.where(isbest & (j_of == jstar), i_idx, BIG),
                        axis=1, keepdims=True)
        found = best > 0
        score = jnp.where(found, best, 0)
        iout = jnp.where(found, istar, -1)
        jout = jnp.where(found, jstar, -1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (btile, LANES), 1)
        out = jnp.where(lane == 0, score,
                        jnp.where(lane == 1, iout,
                                  jnp.where(lane == 2, jout, 0)))
        out_ref[:, k * LANES:(k + 1) * LANES] = out

    per_job_chunks = (lrp + 1) // LANES
    a_chunks = lqp // LANES
    for k in range(C + 1):
        t0 = k * (lrp + 1)
        qsv_cur = svecs(q_ref[:, min(k, C - 1) * lqp:
                              (min(k, C - 1) + 1) * lqp])
        qsv_prev = svecs(q_ref[:, max(k - 1, 0) * lqp:max(k, 1) * lqp])

        def a_body(t, r_col, t0=t0, qc=qsv_cur, qp=qsv_prev):
            dp_step(t, r_col, qc, boundary_lane=t - t0, qsv_prev=qp)

        run_phase(t0 // LANES, a_chunks, a_body)
        if k > 0:
            drain(k - 1)
        if k < C:
            def b_body(t, r_col, qc=qsv_cur):
                dp_step(t, r_col, qc)

            run_phase(t0 // LANES + a_chunks,
                      per_job_chunks - a_chunks, b_body)


CHAIN_C = 8
# bench-shape sweep (fixed methodology): btile 64: 91.6, 128: 91.5,
# 32: 85-87, 24: 74, 16: 71 GCUPS; C: 8 > 4 (87.1) > 16 (71.1)
CHAIN_BTILE = 64
# measured envelope: btile 128 at the bench shape (double-buffer-counted
# ~48 MB) still compiles and runs on v5e, so the conservative 20 MB
# budget was rejecting the best tiles; 40 MB keeps a 20% margin under
# the worst configuration proven to work
CHAIN_VMEM_BUDGET = 40 * 1024 * 1024


def chain_plan(B, Lq, Lr, params):
    """(C, btile, lrp, T) for the chained kernel, or None when the shape
    can't chain: needs LrP >= LqP - 1, the global-step packing to fit
    int31, enough jobs to fill a chain, and the blocks to fit VMEM."""
    LqP = _round_up(Lq, LANES)
    lrp = max(_round_up(Lr + 1, LANES) - 1, LqP - 1)
    C = min(CHAIN_C, max(1, B))
    while C > 1:
        T = C * (lrp + 1) + LqP
        lb = 1
        while (1 << lb) < T + 1:
            lb += 1
        if params.match * LqP << lb < 2 ** 31:
            Tp = _round_up(T, LANES)
            btile = CHAIN_BTILE
            while btile >= 8:
                # in/out blocks are double-buffered by the pallas grid
                # pipeline; scratch is single-buffered
                need = 4 * btile * (2 * (C * LqP + Tp + C * LANES)
                                    + 7 * LqP + LANES)
                if need <= CHAIN_VMEM_BUDGET:
                    return C, btile, lrp, Tp, lb
                btile //= 2
        C //= 2
    return None


@functools.partial(jax.jit, static_argnames=("params", "interpret", "plan",
                                              "no_n"))
def sw_score_ends_chain(query, ref, params, plan, interpret=False,
                        no_n=False):
    """sw_score_ends contract on the chained kernel; ``plan`` from
    chain_plan (static).  Rows whose job count doesn't divide C are
    padded with all-pad jobs, which report (0, -1, -1) like any all-pad
    row.  ``no_n`` (static) asserts the REFERENCE rows carry no N codes
    and compiles the leaner scoring (see _sw_chain_kernel)."""
    assert params.gap_open >= params.gap_extend
    C, btile, lrp, Tp, lb = plan
    B, Lq = query.shape
    _, Lr = ref.shape
    LqP = _round_up(Lq, LANES)
    rows = -(-B // C)
    Bp = rows * C

    q = jnp.pad(query.astype(jnp.int32), ((0, Bp - B), (0, LqP - Lq)),
                constant_values=5)
    qrows = q.reshape(rows, C * LqP)
    r = jnp.pad(ref.astype(jnp.int32), ((0, Bp - B), (0, lrp - Lr)),
                constant_values=6)
    r = jnp.where(r >= 5, 6, r)
    bcol = jnp.full((Bp, 1), 6, jnp.int32)
    stream = jnp.concatenate([bcol, r], axis=1).reshape(rows, -1)
    stream = jnp.pad(stream, ((0, 0), (0, Tp - C * (lrp + 1))),
                     constant_values=6)

    Rt = _round_up(rows, btile)
    qrows = jnp.pad(qrows, ((0, Rt - rows), (0, 0)), constant_values=5)
    stream = jnp.pad(stream, ((0, Rt - rows), (0, 0)), constant_values=6)

    kernel = functools.partial(
        _sw_chain_kernel, btile=btile, lqp=LqP, lrp=lrp, C=C,
        match=params.match, mismatch=params.mismatch,
        gap_open=params.gap_open, gap_extend=params.gap_extend, lb=lb,
        no_n=no_n)

    out = pl.pallas_call(
        kernel,
        grid=(Rt // btile,),
        in_specs=[
            pl.BlockSpec((btile, C * LqP), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((btile, Tp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((btile, C * LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rt, C * LANES), jnp.int32),
        scratch_shapes=(
            [pltpu.VMEM((btile, LqP), jnp.int32)] * 7
            + [pltpu.VMEM((btile, LANES), jnp.int32)]),
        cost_estimate=pl.CostEstimate(
            flops=int(30 * Rt * LqP * Tp), bytes_accessed=int(
                4 * Rt * (C * LqP + Tp + C * LANES)), transcendentals=0),
        interpret=interpret,
    )(qrows, stream)

    out = out[:rows].reshape(rows, C, LANES).reshape(Bp, LANES)
    return out[:B, 0], out[:B, 1], out[:B, 2]


# wave5 tile/unroll: btile 64-128 / unroll 2 measure equal within noise
# under the fixed methodology (80.9/80.7 GCUPS; unroll 4: 79.4); 64/2
# kept from the sweep
WAVE5_BTILE = 64
WAVE5_UNROLL = 2

# 128-row stripes won the round-2 wavefront sweep (256 hit a
# multi-minute Mosaic compile, same cliff as the scan kernel at 128)
WAVE_BTILE = 128


def _fit_btile_wave(lqp, lrpw, requested):
    """Largest wave batch tile in budget: 8 scratch rows + q + r blocks
    (double-buffered) + ~4 step-live temporaries, all [*, lqp] except r."""
    per_row = 4 * (14 * lqp + 2 * lrpw + 2 * LANES)
    fit = max(8, (VMEM_BUDGET // per_row) // 8 * 8)
    return int(min(requested, fit))


@functools.partial(jax.jit, static_argnames=("params", "interpret", "btile",
                                              "unroll", "no_n"))
def sw_score_ends_wave5(query, ref, params, interpret=False,
                        btile=WAVE5_BTILE, unroll=WAVE5_UNROLL,
                        no_n=False):
    """sw_score_ends contract on the lean (wave5) wavefront kernel.
    Callers must ensure match * LqP << LB fits int31 (wave5_fits).
    ``no_n`` (static) asserts the reference rows carry no N codes."""
    assert params.gap_open >= params.gap_extend
    B, Lq = query.shape
    _, Lr = ref.shape
    LqP = _round_up(Lq, LANES)
    LrP = _round_up(Lr, LANES)
    LrPW = _round_up(LqP + LrP, LANES)
    lb = 1
    while (1 << lb) < LrPW + 1:
        lb += 1
    assert params.match * LqP << lb < 2 ** 31
    btile = _fit_btile_wave(LqP, LrPW, btile)
    Bp = _round_up(B, btile)

    q = jnp.pad(query.astype(jnp.int32), ((0, Bp - B), (0, LqP - Lq)),
                constant_values=5)
    r = jnp.pad(ref.astype(jnp.int32), ((0, Bp - B), (0, LrPW - Lr)),
                constant_values=5)
    r = jnp.where(r >= 5, 6, r)            # pad-6 scoring contract

    kernel = functools.partial(
        _sw_wave5_kernel, btile=btile, lqp=LqP, lrpw=LrPW,
        match=params.match, mismatch=params.mismatch,
        gap_open=params.gap_open, gap_extend=params.gap_extend,
        unroll=unroll, lb=lb, no_n=no_n)

    out = pl.pallas_call(
        kernel,
        grid=(Bp // btile,),
        in_specs=[
            pl.BlockSpec((btile, LqP), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((btile, LrPW), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((btile, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, LANES), jnp.int32),
        scratch_shapes=(
            [pltpu.VMEM((btile, LqP), jnp.int32)] * 6
            + [pltpu.VMEM((btile, LANES), jnp.int32)]),
        cost_estimate=pl.CostEstimate(
            flops=int(26 * Bp * LqP * LrPW), bytes_accessed=int(
                4 * Bp * (LqP + LrPW + LANES)), transcendentals=0),
        interpret=interpret,
    )(q, r)

    score = out[:B, 0]
    q_end = out[:B, 1]
    r_end = out[:B, 2]
    return score, q_end, r_end


def wave5_fits(Lq, Lr, params):
    """wave5's packed-best precondition: max score << LB fits int31."""
    LqP = _round_up(Lq, LANES)
    LrPW = _round_up(LqP + _round_up(Lr, LANES), LANES)
    lb = 1
    while (1 << lb) < LrPW + 1:
        lb += 1
    return params.match * LqP << lb < 2 ** 31


@functools.partial(jax.jit, static_argnames=("params", "interpret", "btile"))
def sw_score_ends_wave(query, ref, params, interpret=False,
                       btile=WAVE_BTILE):
    """sw_score_ends contract on the wavefront kernel."""
    assert params.gap_open >= params.gap_extend
    B, Lq = query.shape
    _, Lr = ref.shape
    LqP = _round_up(Lq, LANES)
    LrP = _round_up(Lr, LANES)
    LrPW = _round_up(LqP + LrP, LANES)   # diagonals = lq + lr steps
    btile = _fit_btile_wave(LqP, LrPW, btile)
    Bp = _round_up(B, btile)

    q = jnp.pad(query.astype(jnp.int32), ((0, Bp - B), (0, LqP - Lq)),
                constant_values=5)
    r = jnp.pad(ref.astype(jnp.int32), ((0, Bp - B), (0, LrPW - Lr)),
                constant_values=5)

    kernel = functools.partial(
        _sw_wave_kernel, btile=btile, lqp=LqP, lrpw=LrPW,
        match=params.match, mismatch=params.mismatch,
        gap_open=params.gap_open, gap_extend=params.gap_extend)

    out = pl.pallas_call(
        kernel,
        grid=(Bp // btile,),
        in_specs=[
            pl.BlockSpec((btile, LqP), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((btile, LrPW), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((btile, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, LANES), jnp.int32),
        scratch_shapes=(
            [pltpu.VMEM((btile, LqP), jnp.int32)] * 8
            + [pltpu.VMEM((btile, LANES), jnp.int32)]),
        cost_estimate=pl.CostEstimate(
            flops=int(30 * Bp * LqP * LrPW), bytes_accessed=int(
                4 * Bp * (LqP + LrPW + LANES)), transcendentals=0),
        interpret=interpret,
    )(q, r)

    score = out[:B, 0]
    q_end = out[:B, 1]
    r_end = out[:B, 2]
    return score, q_end, r_end


VMEM_BUDGET = 20 * 1024 * 1024


def _fit_btile(lqp, lrp, requested):
    """Largest batch tile whose working set fits the VMEM budget; long
    references shrink the tile.  Accounts for the 4 scratch rows, the
    double-buffered in/out blocks AND ~6 step-live temporaries (the
    compiler allocates those on the same scoped stack)."""
    per_row = 4 * (12 * lrp + 2 * lqp + 4 * LANES)
    fit = max(8, (VMEM_BUDGET // per_row) // 8 * 8)
    return int(min(requested, fit))


def wave_route(Lq, Lr):
    """Kernel routing decision for a (Lq, Lr) shape.  Round 3: the lean
    wave5 kernel beats the scan kernel down to SQUARE shapes (measured
    1024x1024: wave5 129.7 vs scan 112.2 vs r2-wave 102.4 GCUPS, same
    session), so the wave route now engages whenever LrP >= LqP -- the
    cost model crossover 26*(lq+lr)/lr < 55 puts scan ahead only when
    the QUERY axis dominates (lr < ~0.9 lq), which no production shape
    hits (clips/junctions align against wider windows).
    CIRI_SW_WAVE=0/1 forces a path.

    CAVEAT: when the caller is itself inside a jit trace (e.g.
    ops/sw.py::_sw_align_fused), the env var is read at trace time and
    the choice is baked into that trace's cache entry -- flipping
    CIRI_SW_WAVE mid-process does not invalidate already-compiled outer
    jits.  Callers that need a runtime toggle must resolve this OUTSIDE
    their jit (sw_align_batch does)."""
    import os
    flag = os.environ.get('CIRI_SW_WAVE')
    if flag in (None, ''):
        return _round_up(Lr, LANES) >= _round_up(Lq, LANES)
    return flag not in ('0', 'false')


def sw_score_ends_pallas(query, ref, params, interpret=False, btile=None,
                         wave=None, no_n=False):
    """Same contract as ops.sw.sw_score_ends, on the Pallas TPU kernels.

    ``wave`` pins the kernel (None = route by shape/env, see wave_route);
    ``btile`` overrides the batch tile of WHICHEVER kernel runs (their
    defaults differ: scan BTILE vs WAVE_BTILE).  ``no_n`` (static) is the
    caller's proof that ``ref`` contains no N codes (code 4) -- resolved
    host-side BEFORE any outer jit (ops/sw.py::_ref_no_n), it compiles
    the leaner chain/wave5 scoring; False is always safe."""
    import os
    B, Lq = query.shape
    _, Lr = ref.shape
    if wave is None:
        wave = wave_route(Lq, Lr)
    if wave:
        if os.environ.get('CIRI_SW_CHAIN', '1') not in ('0', 'false', ''):
            plan = chain_plan(B, Lq, Lr, params)
            # chain only when at least 2 full chains form (the +1 drain
            # block amortises over jobs; tiny batches stay on wave5)
            if plan is not None and plan[0] >= 4 and B >= 2 * plan[0]:
                return sw_score_ends_chain(query, ref, params, plan,
                                           interpret=interpret, no_n=no_n)
        use5 = (os.environ.get('CIRI_SW_WAVE5', '1') not in
                ('0', 'false', '') and wave5_fits(Lq, Lr, params))
        if use5:
            return sw_score_ends_wave5(
                query, ref, params, interpret=interpret,
                btile=WAVE5_BTILE if btile is None else btile, no_n=no_n)
        if _round_up(Lr, LANES) >= 2 * _round_up(Lq, LANES):
            # wave5 unavailable (packed-best overflow): the r2 wave
            # kernel only beats scan on reference-dominated shapes
            return sw_score_ends_wave(
                query, ref, params, interpret=interpret,
                btile=WAVE_BTILE if btile is None else btile)
    return _sw_score_ends_scan(query, ref, params, interpret=interpret,
                               btile=BTILE if btile is None else btile)


@functools.partial(jax.jit, static_argnames=("params", "interpret", "btile"))
def _sw_score_ends_scan(query, ref, params, interpret=False, btile=BTILE):
    """The striped/prefix-scan kernel path (original formulation)."""
    assert params.gap_open >= params.gap_extend
    B, Lq = query.shape
    _, Lr = ref.shape
    LqP = _round_up(Lq, LANES)
    LrP = _round_up(Lr, LANES)
    btile = _fit_btile(LqP, LrP, btile)
    Bp = _round_up(B, btile)

    q = jnp.pad(query.astype(jnp.int32), ((0, Bp - B), (0, LqP - Lq)),
                constant_values=5)
    r = jnp.pad(ref.astype(jnp.int32), ((0, Bp - B), (0, LrP - Lr)),
                constant_values=5)

    kernel = functools.partial(
        _sw_kernel, btile=btile, lqp=LqP, lrp=LrP,
        match=params.match, mismatch=params.mismatch,
        gap_open=params.gap_open, gap_extend=params.gap_extend)

    out = pl.pallas_call(
        kernel,
        grid=(Bp // btile,),
        in_specs=[
            pl.BlockSpec((btile, LqP), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((btile, LrP), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((btile, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, LANES), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((btile, LrP), jnp.int32),
            pltpu.VMEM((btile, LrP), jnp.int32),
            pltpu.VMEM((btile, LrP), jnp.int32),
            pltpu.VMEM((btile, LrP), jnp.int32),
            pltpu.VMEM((btile, LANES), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(25 * Bp * LqP * LrP), bytes_accessed=int(
                4 * Bp * (LqP + LrP + LANES)), transcendentals=0),
        interpret=interpret,
    )(q, r)

    score = out[:B, 0]
    q_end = out[:B, 1]
    r_end = out[:B, 2]
    return score, q_end, r_end
