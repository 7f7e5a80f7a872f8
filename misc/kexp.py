"""SW Pallas kernel experiment harness (GCUPS tuning, ROADMAP #4).

Runs ONE variant configuration on the default device with the same
on-device fori_loop timing methodology as bench.py, then prints a JSON
line.  Variants are flag-composable so winners can be combined:

  python misc/kexp.py --btile 64                 # tile sweep
  python misc/kexp.py --nomask7 --btile 32       # drop 7 wrap masks
  python misc/kexp.py --packbest --tworow ...

Correctness of every variant is asserted against ops/sw.py's oracle
scan implementation on a small random batch before timing.
"""

import argparse
import functools
import json
import time

import numpy as np

NEG = -(1 << 28)
BIG = 1 << 28
LANES = 128


def _round_up(x, m):
    return (x + m - 1) // m * m


def build_kernel_r3(jnp, jax, pl, pltpu, *, btile, lqp, lrp, match, mismatch,
                    gap_open, gap_extend):
    """Rank-3 layout [btile, NB, 128]: the r axis split block-major so the
    within-block prefix max uses in-register lane rotates (no cross-tile
    blends) and the cross-block carry is a short scan along the sublane
    axis.  Same contract as the rank-2 kernel."""
    NB = lrp // LANES

    def bcast(x2, shape, dims):
        # rank-2 -> rank-3 without ever materialising a unit-minor rank-3
        # value (those crash this Mosaic's layout inference)
        return jax.lax.broadcast_in_dim(x2, shape, dims)

    def kernel(q_ref, r_ref, out_ref, H, F, best_val, best_i, qblk):
        r = r_ref[:]   # pre-shaped [btile, NB, LANES] block
        l_idx = jax.lax.broadcasted_iota(jnp.int32, (btile, NB, LANES), 2)
        b_idx = jax.lax.broadcasted_iota(jnp.int32, (btile, NB, LANES), 1)
        j_idx = b_idx * LANES + l_idx

        H[:] = jnp.zeros((btile, NB, LANES), jnp.int32)
        F[:] = jnp.full((btile, NB, LANES), NEG, jnp.int32)
        best_val[:] = jnp.zeros((btile, NB, LANES), jnp.int32)
        best_i[:] = jnp.full((btile, NB, LANES), -1, jnp.int32)

        r_is_n = r == 4
        r_is_pad = r >= 5
        jge = j_idx * gap_extend
        e_bias = gap_open + (j_idx - 1) * gap_extend
        is_j0 = j_idx == 0
        is_l0 = l_idx == 0
        lane_masks = [l_idx >= k for k in (1, 2, 4, 8, 16, 32, 64)]
        block_masks = []
        k = 1
        while k < NB:
            block_masks.append(b_idx >= k)
            k *= 2

        def shift1(x, fill):
            # global shift right by one j: in-tile rotate, block-boundary
            # lane fixed from the previous block's lane 127
            t = pltpu.roll(x, 1, axis=2)
            tb = pltpu.roll(t, 1, axis=1)
            y = jnp.where(is_l0, tb, t)
            return jnp.where(is_j0, fill, y)

        def prefix_max(y):
            # inclusive cummax over the flattened (NB*128) axis
            for k, m in zip((1, 2, 4, 8, 16, 32, 64), lane_masks):
                sh = pltpu.roll(y, k, axis=2)
                y = jnp.maximum(y, jnp.where(m, sh, NEG))
            # block max broadcast to all lanes, staying rank-2 until the
            # final full-shape broadcast
            bmax = bcast(jnp.max(y, axis=2), (btile, NB, LANES), (0, 1))
            k = 1
            for m in block_masks:
                sh = pltpu.roll(bmax, k, axis=1)
                bmax = jnp.maximum(bmax, jnp.where(m, sh, NEG))
            # bmax is now the inclusive block-scan; carry for block b is
            # the scan value at b-1
            carry = pltpu.roll(bmax, 1, axis=1)
            carry = jnp.where(b_idx == 0, NEG, carry)
            return jnp.maximum(y, carry)

        def step(i, q_col):
            qc = bcast(q_col, (btile, NB, LANES), (0, 1))
            is_n = (qc == 4) | r_is_n
            is_pad = (qc >= 5) | r_is_pad
            s = jnp.where(qc == r, match, -mismatch)
            s = jnp.where(is_n, 0, s)
            s = jnp.where(is_pad, NEG, s)

            Hp = H[:]
            Fv = jnp.maximum(F[:] - gap_extend, Hp - gap_open)
            Hdiag = shift1(Hp, 0)
            H0 = jnp.maximum(jnp.maximum(Hdiag + s, Fv), 0)

            P = prefix_max(H0 + jge)
            Ps = shift1(P, NEG)
            E = Ps - e_bias
            Hn = jnp.maximum(H0, E)

            better = Hn > best_val[:]
            best_val[:] = jnp.where(better, Hn, best_val[:])
            best_i[:] = jnp.where(better, i, best_i[:])
            H[:] = Hn
            F[:] = Fv

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
        bi = best_i[:]
        best = jnp.max(jnp.max(bv, axis=1), axis=1, keepdims=True)  # [bt,1]
        isbest = bv == bcast(best, (btile, NB, LANES), (0, 2))
        jstar = jnp.min(jnp.min(jnp.where(isbest, j_idx, BIG), axis=1),
                        axis=1, keepdims=True)                       # [bt,1]
        jstar3 = bcast(jstar, (btile, NB, LANES), (0, 2))
        istar = jnp.min(jnp.min(
            jnp.where(isbest & (j_idx == jstar3), bi, BIG), axis=1),
            axis=1, keepdims=True)                                   # [bt,1]

        found = best > 0
        score = jnp.where(found, best, 0)
        iout = jnp.where(found, istar, -1)
        jout = jnp.where(found, jstar, -1)

        lane = jax.lax.broadcasted_iota(jnp.int32, (btile, LANES), 1)
        out = jnp.where(lane == 0, score,
                        jnp.where(lane == 1, iout,
                                  jnp.where(lane == 2, jout, 0)))
        out_ref[:] = out

    return kernel


def build_kernel_wave(jnp, jax, pl, pltpu, *, btile, lqp, lrpw, match,
                      mismatch, gap_open, gap_extend):
    """Anti-diagonal wavefront layout: lanes = QUERY positions, one step
    per diagonal d (cell (i, j=d-i) at lane i).  The within-row E
    dependency that costs the rank-2 kernel its 12-level prefix scan
    becomes a same-lane read of the previous diagonal (E[i,j-1] / H0[i,j-1]
    both live at lane i, diag d-1); F and the match diagonal are one-lane
    rolls.  Per-step vector cost ~30 ops on [btile, lqp] vs ~55 on
    [btile, lrp] for the scan kernel, at lr/(lq+lr) lane utilisation
    (80% on the 1024x4096 bench shape).

    The reference base enters at lane 0 and shifts one lane per step
    (r_diag[i] = r[d-i]); cells before their start hold H=0 / E,F<0, which
    reproduces the scan kernel's boundary conditions exactly (see
    the 0-fill / NEG-fill wheres)."""

    def kernel(q_ref, r_ref, out_ref, Hd1, Hd2, H0d1, Ed1, Fd1,
               best_val, best_d, r_diag, rblk):
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

    return kernel


def build_kernel_wave3(jnp, jax, pl, pltpu, *, btile, lqp, lrpw, match,
                       mismatch, gap_open, gap_extend):
    """wave2's transforms 1+2 (pad-6 scoring, E from full H) with the
    original unpacked best_val/best_d tracking -- isolates the packed-
    best multiply as the suspect for wave2's regression."""

    def kernel(q_ref, r_ref, out_ref, Hd1, Hd2, Ed1, Fd1, best_val,
               best_d, r_diag, rblk):
        q = q_ref[:]
        i_idx = jax.lax.broadcasted_iota(jnp.int32, (btile, lqp), 1)
        is_lane0 = i_idx == 0
        q_is_n = q == 4

        Hd1[:] = jnp.zeros((btile, lqp), jnp.int32)
        Hd2[:] = jnp.zeros((btile, lqp), jnp.int32)
        Ed1[:] = jnp.full((btile, lqp), NEG, jnp.int32)
        Fd1[:] = jnp.full((btile, lqp), NEG, jnp.int32)
        best_val[:] = jnp.zeros((btile, lqp), jnp.int32)
        best_d[:] = jnp.full((btile, lqp), -1, jnp.int32)
        r_diag[:] = jnp.full((btile, lqp), 6, jnp.int32)

        def step(d, r_col):
            rd = jnp.where(is_lane0, r_col, pltpu.roll(r_diag[:], 1, axis=1))
            r_diag[:] = rd
            s = jnp.where(q == rd, match, -mismatch)
            s = jnp.where(q_is_n | (rd == 4), 0, s)

            h1 = Hd1[:]
            h1s = pltpu.roll(h1, 1, axis=1)
            f1s = pltpu.roll(Fd1[:], 1, axis=1)
            Fv = jnp.where(is_lane0, NEG,
                           jnp.maximum(f1s - gap_extend, h1s - gap_open))
            h2s = jnp.where(is_lane0, 0, pltpu.roll(Hd2[:], 1, axis=1))
            H0 = jnp.maximum(jnp.maximum(h2s + s, Fv), 0)
            E = jnp.maximum(Ed1[:] - gap_extend, h1 - gap_open)
            Hn = jnp.maximum(H0, E)

            better = Hn > best_val[:]
            best_val[:] = jnp.where(better, Hn, best_val[:])
            best_d[:] = jnp.where(better, d, best_d[:])
            Hd2[:] = h1
            Hd1[:] = Hn
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

    return kernel


def build_kernel_wave2(jnp, jax, pl, pltpu, *, btile, lqp, lrpw, match,
                       mismatch, gap_open, gap_extend):
    """Leaner wavefront: three exact transformations over build_kernel_wave.

    1. No PAD select row in scoring: the caller pads/remaps the REFERENCE
       to code 6 (query keeps 5), so q==rd is impossible at any pad and a
       pad cell scores -mismatch (or 0 against a genuine N).  Every path
       that enters a pad row/column can only hold (N) or lose value and
       can never re-enter the real region, so no pad cell ever STRICTLY
       exceeds a lane's running best; ties don't update best (strict >)
       and can't steal the final tie-break (their j = d - i is >= lr,
       larger than any real candidate).  Outputs are bit-identical.
    2. E reads the full H of the previous diagonal instead of a separate
       H0 carry: max(E-ge, max(H0,E)-go) == max(E-ge, H0-go) whenever
       go >= ge (E-go <= E-ge) -- kills one scratch row and one write.
    3. Packed best tracking: best = max(best, Hn*DSPAN + (DSPAN-1-d))
       replaces cmp+2x select+2 writes; max picks the highest score and,
       on ties, the smallest d = first occurrence, exactly the strict
       '>' update order.  Requires match*min(lq,lr)*DSPAN < 2^31.
    """
    DSPAN = 1
    while DSPAN < lrpw + 1:
        DSPAN *= 2
    dspan1 = DSPAN - 1

    def kernel(q_ref, r_ref, out_ref, Hd1, Hd2, Ed1, Fd1, best_pack,
               r_diag, rblk):
        q = q_ref[:]
        i_idx = jax.lax.broadcasted_iota(jnp.int32, (btile, lqp), 1)
        is_lane0 = i_idx == 0
        q_is_n = q == 4

        Hd1[:] = jnp.zeros((btile, lqp), jnp.int32)
        Hd2[:] = jnp.zeros((btile, lqp), jnp.int32)
        Ed1[:] = jnp.full((btile, lqp), NEG, jnp.int32)
        Fd1[:] = jnp.full((btile, lqp), NEG, jnp.int32)
        # score 0 / d undefined floor; masked by found at the end
        best_pack[:] = jnp.zeros((btile, lqp), jnp.int32)
        r_diag[:] = jnp.full((btile, lqp), 6, jnp.int32)

        def step(d, r_col):
            rd = jnp.where(is_lane0, r_col, pltpu.roll(r_diag[:], 1, axis=1))
            r_diag[:] = rd
            s = jnp.where(q == rd, match, -mismatch)
            s = jnp.where(q_is_n | (rd == 4), 0, s)

            h1 = Hd1[:]
            h1s = pltpu.roll(h1, 1, axis=1)
            f1s = pltpu.roll(Fd1[:], 1, axis=1)
            Fv = jnp.where(is_lane0, NEG,
                           jnp.maximum(f1s - gap_extend, h1s - gap_open))
            h2s = jnp.where(is_lane0, 0, pltpu.roll(Hd2[:], 1, axis=1))
            H0 = jnp.maximum(jnp.maximum(h2s + s, Fv), 0)
            E = jnp.maximum(Ed1[:] - gap_extend, h1 - gap_open)
            Hn = jnp.maximum(H0, E)

            best_pack[:] = jnp.maximum(best_pack[:],
                                       Hn * DSPAN + (dspan1 - d))
            Hd2[:] = h1
            Hd1[:] = Hn
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

        bp = best_pack[:]
        bv = bp // DSPAN
        bd = dspan1 - (bp & dspan1)
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

    return kernel


def build_kernel_wave5(jnp, jax, pl, pltpu, *, btile, lqp, lrpw, match,
                       mismatch, gap_open, gap_extend, unroll=2):
    """wave3 + three further exact transforms:

    1. Diag-only best tracking: the global SW max is never an E/F-derived
       or 0-floor cell (appending a gap strictly decreases score; the
       0-floor only matters when nothing positive exists), and the argmax
       TIE SET over Hn equals the tie set over dval = Hdiag + s, so best
       tracks max(best, dval<<LB | (span1-d)) -- the packed compare from
       wave2 but with a SHIFT instead of the multiply (the suspected
       wave2 regression) and available one max earlier in the chain.
    2. UNROLL steps per loop iteration: one rblk rotate + loop bookkeeping
       per UNROLL diagonals instead of per diagonal.
    3. wave2's pad-6 scoring + E-from-full-H (go >= ge) transforms.
    Requires match * min(lq, lr) << LB to fit int31 (asserted by caller).
    """
    LB = 1
    while (1 << LB) < lrpw + 1:
        LB += 1
    span1 = (1 << LB) - 1

    def kernel(q_ref, r_ref, out_ref, Hd1, Hd2, Ed1, Fd1, best_pack,
               r_diag, rblk):
        q = q_ref[:]
        i_idx = jax.lax.broadcasted_iota(jnp.int32, (btile, lqp), 1)
        is_lane0 = i_idx == 0
        q_is_n = q == 4
        # pad lanes (q code 5) must never SCORE 0 against a genuine r N --
        # an N column adjacent to the best cell would otherwise let the
        # first pad lane tie the best with a smaller j and steal the
        # tie-break (real-lane guard hoisted; +1 op/step)
        lane_real = q < 5

        Hd1[:] = jnp.zeros((btile, lqp), jnp.int32)
        Hd2[:] = jnp.zeros((btile, lqp), jnp.int32)
        Ed1[:] = jnp.full((btile, lqp), NEG, jnp.int32)
        Fd1[:] = jnp.full((btile, lqp), NEG, jnp.int32)
        best_pack[:] = jnp.zeros((btile, lqp), jnp.int32)
        r_diag[:] = jnp.full((btile, lqp), 6, jnp.int32)

        def step(d, r_col):
            rd = jnp.where(is_lane0, r_col, pltpu.roll(r_diag[:], 1, axis=1))
            r_diag[:] = rd
            s = jnp.where(q == rd, match, -mismatch)
            s = jnp.where((q_is_n | (rd == 4)) & lane_real, 0, s)

            h1 = Hd1[:]
            h1s = pltpu.roll(h1, 1, axis=1)
            f1s = pltpu.roll(Fd1[:], 1, axis=1)
            Fv = jnp.where(is_lane0, NEG,
                           jnp.maximum(f1s - gap_extend, h1s - gap_open))
            h2s = jnp.where(is_lane0, 0, pltpu.roll(Hd2[:], 1, axis=1))
            dval = h2s + s
            best_pack[:] = jnp.maximum(best_pack[:],
                                       (dval << LB) + (span1 - d))
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
        bv = bp >> LB
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

    return kernel


def build_kernel_chain(jnp, jax, pl, pltpu, *, btile, lqp, lrp, C, match,
                       mismatch, gap_open, gap_extend):
    """Chained wavefront (wave6): C jobs per row stream back-to-back
    through the same lanes, a reset/capture wave riding each job
    boundary.  Lane utilisation goes from lr/(lq+lr) to ~lr/(lr+1):
    the ramp-down of job k overlaps the ramp-up of job k+1.

    Layout requirements (host-enforced):
      - all C jobs share the padded shape (lqp lanes, lrp r slots)
      - lrp + 1 multiple of LANES (phases stay chunk-aligned)
      - lrp >= lqp - 1 (a boundary fully passes before the next arrives)
    Stream: slot k*(lrp+1) is job k's boundary; slots [o_k, o_k+lrp) its
    r codes (o_k = k*(lrp+1) + 1); slot t enters lane 0 at step t.  Job
    k's cell (i, j) computes at lane i on step o_k + i + j -- phase 0
    for every job, so the lane-0 column boundary and the circular roll
    semantics of the plain wave kernel carry over unchanged.

    Phase A_k (lqp steps from t0 = k*(lrp+1)): boundary at lane
    b = t - t0; that lane captures job k-1's packed best and resets its
    DP state; lanes < b already run job k's query (per-lane select
    between the two static query slices).  Phase B_k (lrp+1-lqp steps):
    plain wave5 steps on job k's query.  After A_k, job k-1's captures
    reduce and write output slot k-1 (static python-level drain).
    """
    LB = 1
    T = C * (lrp + 1) + lqp
    while (1 << LB) < T + 1:
        LB += 1
    span1 = (1 << LB) - 1
    assert (lrp + 1) % LANES == 0 and lqp % LANES == 0
    assert lrp >= lqp - 1
    assert match * lqp << LB < 2 ** 31

    def kernel(q_ref, r_ref, out_ref, Hd1, Hd2, Ed1, Fd1, best_pack,
               capB, r_diag, rblk):
        i_idx = jax.lax.broadcasted_iota(jnp.int32, (btile, lqp), 1)
        is_lane0 = i_idx == 0

        Hd1[:] = jnp.zeros((btile, lqp), jnp.int32)
        Hd2[:] = jnp.zeros((btile, lqp), jnp.int32)
        Ed1[:] = jnp.full((btile, lqp), NEG, jnp.int32)
        Fd1[:] = jnp.full((btile, lqp), NEG, jnp.int32)
        best_pack[:] = jnp.zeros((btile, lqp), jnp.int32)
        capB[:] = jnp.zeros((btile, lqp), jnp.int32)
        r_diag[:] = jnp.full((btile, lqp), 6, jnp.int32)

        def dp_step(d, r_col, q, q_is_n, lane_real, boundary_lane=None,
                    q_prev=None):
            """One diagonal.  boundary_lane (traced scalar) engages the
            reset/capture/q-select transition ops (phase A only)."""
            rd = jnp.where(is_lane0, r_col,
                           pltpu.roll(r_diag[:], 1, axis=1))
            r_diag[:] = rd
            if boundary_lane is not None:
                is_b = i_idx == boundary_lane
                q_eff = jnp.where(i_idx <= boundary_lane, q, q_prev)
                q_is_n = q_eff == 4
                lane_real = q_eff < 5
            else:
                is_b = None
                q_eff = q
            s = jnp.where(q_eff == rd, match, -mismatch)
            s = jnp.where((q_is_n | (rd == 4)) & lane_real, 0, s)

            h1 = Hd1[:]
            h1s = pltpu.roll(h1, 1, axis=1)
            f1s = pltpu.roll(Fd1[:], 1, axis=1)
            Fv = jnp.where(is_lane0, NEG,
                           jnp.maximum(f1s - gap_extend, h1s - gap_open))
            h2s = jnp.where(is_lane0, 0, pltpu.roll(Hd2[:], 1, axis=1))
            dval = h2s + s
            bp = jnp.maximum(best_pack[:], (dval << LB) + (span1 - d))
            H0 = jnp.maximum(jnp.maximum(dval, Fv), 0)
            E = jnp.maximum(Ed1[:] - gap_extend, h1 - gap_open)
            Hn = jnp.maximum(H0, E)

            if is_b is not None:
                capB[:] = jnp.where(is_b, best_pack[:], capB[:])
                best_pack[:] = jnp.where(is_b, 0, bp)
                Hd2[:] = jnp.where(is_b, 0, h1)
                Hd1[:] = jnp.where(is_b, 0, Hn)
                Ed1[:] = jnp.where(is_b, NEG, E)
                Fd1[:] = jnp.where(is_b, NEG, Fv)
            else:
                best_pack[:] = bp
                Hd2[:] = h1
                Hd1[:] = Hn
                Ed1[:] = E
                Fd1[:] = Fv

        def run_phase(c0, n_chunks, body):
            """fori over n_chunks 128-slot chunks starting at chunk c0;
            body(c, t, r_col) runs per step (t traced)."""
            def chunk(c, _):
                base = pl.multiple_of(c * LANES, LANES)
                rblk[:] = r_ref[:, pl.ds(base, LANES)]

                def inner(u, _):
                    for v in range(2):
                        t = c * LANES + u * 2 + v
                        body(t, rblk[:, v:v + 1])
                    rblk[:] = pltpu.roll(rblk[:], LANES - 2, axis=1)
                    return 0

                jax.lax.fori_loop(0, LANES // 2, inner, 0)
                return 0

            jax.lax.fori_loop(c0, c0 + n_chunks, chunk, 0)

        def drain(k):
            """Reduce job k's captured packed bests -> output slot k."""
            bp = capB[:]
            bv = bp >> LB
            bd = span1 - (bp & span1)
            o_k = k * (lrp + 1) + 1
            best = jnp.max(bv, axis=1, keepdims=True)
            isbest = bv == best
            j_of = bd - o_k - i_idx
            jstar = jnp.min(jnp.where(isbest, j_of, BIG), axis=1,
                            keepdims=True)
            istar = jnp.min(jnp.where(isbest & (j_of == jstar), i_idx,
                                      BIG), axis=1, keepdims=True)
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
            q_cur = q_ref[:, min(k, C - 1) * lqp:
                          (min(k, C - 1) + 1) * lqp]
            q_prev = q_ref[:, max(k - 1, 0) * lqp:max(k, 1) * lqp]

            def a_body(t, r_col, t0=t0, q=q_cur, qp=q_prev):
                dp_step(t, r_col, q, None, None, boundary_lane=t - t0,
                        q_prev=qp)

            run_phase(t0 // LANES, a_chunks, a_body)
            if k > 0:
                drain(k - 1)
            if k < C:
                q_is_n = q_cur == 4
                lane_real = q_cur < 5

                def b_body(t, r_col, q=q_cur, qn=q_is_n, lr_=lane_real):
                    dp_step(t, r_col, q, qn, lr_)

                run_phase(t0 // LANES + a_chunks,
                          per_job_chunks - a_chunks, b_body)

    return kernel


def build_kernel_chain7(jnp, jax, pl, pltpu, *, btile, lqp, lrp, C, match,
                        mismatch, gap_open, gap_extend, unroll=2,
                        assume_no_n=False, noroll=False):
    """Op-diet chained wavefront (wave7): three exact transforms over
    build_kernel_chain, ~26 -> ~20 vector ops per phase-B step.  Stream
    layout, phase structure, drain and output contract are identical to
    build_kernel_chain.

    1. Two-select scoring over hoisted constant vectors: SM/SX/ZN fold
       the query-lane N-zero rule (and the frame constants of transform
       3) into per-lane constants, so scoring is cmp+sel (q==rd) plus
       cmp+sel (rd==4) with no or/and chain (6 -> 4 ops).
    2. Shared H roll: hc = H'(d-1) - (go-ge) is subtracted once; its
       roll feeds BOTH this step's F update and -- stored as Hd2r --
       the next step's match diagonal.  One roll less per step, and the
       phase-A Hd2 reset select disappears (the only reader of the
       boundary lane's stored value is the next boundary lane, whose
       computed cell is discarded by the reset selects anyway).
    3. Gap-extend frame: every DP state value carries a +d*ge bias
       (d = global step).  E update: max(E', hc); F update:
       max(roll(F'), roll(hc)) -- the two per-step gap-extend subtracts
       vanish.  The 0-floor becomes the scalar d*ge, the lane-0
       diagonal fill the scalar (d-2)*ge - (go-ge), and the packed-best
       scalar term absorbs the un-biasing exactly:
       pack = (dval' << LB) + (span1 - d - (d*ge << LB)) == the real
       (dval << LB) + (span1 - d) mod 2^32, and the true value fits
       int31 by the chain_plan precondition, so int32 wraparound in the
       intermediates cancels exactly.  NEG sentinels drift by +d*ge
       (<< |NEG|, harmless); pre-reset junk lanes stay bounded because
       the d*ge floor pins their real value at 0 and their packed bests
       are discarded by the boundary reset before any drained capture.
    """
    LB = 1
    T = C * (lrp + 1) + lqp
    while (1 << LB) < T + 1:
        LB += 1
    span1 = (1 << LB) - 1
    assert (lrp + 1) % LANES == 0 and lqp % LANES == 0
    assert lrp >= lqp - 1
    assert match * lqp << LB < 2 ** 31
    c_go = gap_open - gap_extend     # >= 0 by the affine-trick contract
    s_base = gap_open + gap_extend   # c_go + 2*ge, folded into SM/SX/ZN

    def kernel(q_ref, r_ref, out_ref, Hd1, Hd2r, Ed1, Fd1, best_pack,
               capB, r_diag, rblk):
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

        def roll1(x):
            # timing-only probe: --noroll replaces every per-step lane
            # roll with identity (results WRONG) to measure how much of
            # the step cost the three rolls are
            return x if noroll else pltpu.roll(x, 1, axis=1)

        def dp_step(d, r_col, qsv, boundary_lane=None, qsv_prev=None):
            rd = jnp.where(is_lane0, r_col, roll1(r_diag[:]))
            r_diag[:] = rd
            q, SM, SX, ZN = qsv
            if boundary_lane is not None:
                is_b = i_idx == boundary_lane
                le_b = i_idx <= boundary_lane
                qp, SMp, SXp, ZNp = qsv_prev
                q = jnp.where(le_b, q, qp)
                SM = jnp.where(le_b, SM, SMp)
                SX = jnp.where(le_b, SX, SXp)
                if not assume_no_n:
                    ZN = jnp.where(le_b, ZN, ZNp)
            else:
                is_b = None
            s = jnp.where(q == rd, SM, SX)
            if not assume_no_n:
                # reference N columns score 0 at real query lanes; a
                # host-proven N-free stream drops this cmp+select
                s = jnp.where(rd == 4, ZN, s)

            h1 = Hd1[:]
            hc = h1 - c_go
            hcs = roll1(hc)
            f1s = roll1(Fd1[:])
            Fv = jnp.where(is_lane0, NEG, jnp.maximum(f1s, hcs))
            h2s = jnp.where(is_lane0, (d - 2) * gap_extend - c_go,
                            Hd2r[:])
            dval = h2s + s
            K = span1 - d - ((d * gap_extend) << LB)
            bp = jnp.maximum(best_pack[:], (dval << LB) + K)
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
            bv = bp >> LB
            bd = span1 - (bp & span1)
            o_k = k * (lrp + 1) + 1
            best = jnp.max(bv, axis=1, keepdims=True)
            isbest = bv == best
            j_of = bd - o_k - i_idx
            jstar = jnp.min(jnp.where(isbest, j_of, BIG), axis=1,
                            keepdims=True)
            istar = jnp.min(jnp.where(isbest & (j_of == jstar), i_idx,
                                      BIG), axis=1, keepdims=True)
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
            qsv_prev = svecs(q_ref[:, max(k - 1, 0) * lqp:
                                   max(k, 1) * lqp])

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

    return kernel


def build_kernel_chain9(jnp, jax, pl, pltpu, *, btile, lqp, lrp, C, match,
                        mismatch, gap_open, gap_extend, unroll=8,
                        nobp=False):
    """Traffic-diet chained wavefront (chain9): two VMEM-traffic
    transforms over build_kernel_chain7, motivated by the round-4
    finding that further ALU op removal (--non, --noroll) does NOT
    speed the wave7 step -- the marginal bound is the per-step scratch
    traffic (12 array accesses/step), not vector ALU:

    1. Ping-pong H buffers.  wave7 stores BOTH Hn (Hd1) and the rolled
       hc (Hd2r) every step.  chain9 stores only Hn, alternating
       between HA/HB by step parity (static under unroll: parity == v
       % 2 since LANES and unroll are even), and re-derives the match
       diagonal as roll(H(d-2)) with the -c_go fold moved into the
       hoisted score constants (s_base' = s_base - c_go = 2*ge, and the
       lane-0 diagonal fill loses its -c_go).  Net: -1 store, +1 roll
       (ALU is free at the margin).  Values are bit-identical: wave7's
       h2s = roll(H(d-2) - c_go) and chain9's dval = roll(H(d-2)) +
       (s - c_go) agree term for term.

    2. Group-accumulated packed best (phase B only).  The per-step
       best_pack read-modify-write becomes a running register max over
       the unroll group's packed candidates, folded into best_pack once
       per group: -(unroll-1)/unroll loads AND stores per step.  Exact:
       max is associative, phase B has no captures, and phases start
       and end chunk-aligned so every group is complete.  Phase A keeps
       the per-step update (the boundary capture must see bp current at
       its exact step).

    ``nobp`` is a TIMING-ONLY probe (results wrong): skip the best_pack
    accumulation entirely to measure its share of the step cost.
    """
    LB = 1
    T = C * (lrp + 1) + lqp
    while (1 << LB) < T + 1:
        LB += 1
    span1 = (1 << LB) - 1
    assert (lrp + 1) % LANES == 0 and lqp % LANES == 0
    assert lrp >= lqp - 1
    assert match * lqp << LB < 2 ** 31
    assert unroll % 2 == 0 and LANES % unroll == 0
    c_go = gap_open - gap_extend
    s_base = 2 * gap_extend          # wave7's s_base - c_go fold

    def kernel(q_ref, r_ref, out_ref, HA, HB, Ed1, Fd1, best_pack,
               capB, r_diag, rblk):
        i_idx = jax.lax.broadcasted_iota(jnp.int32, (btile, lqp), 1)
        is_lane0 = i_idx == 0

        HA[:] = jnp.zeros((btile, lqp), jnp.int32)
        HB[:] = jnp.zeros((btile, lqp), jnp.int32)
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

        # W(d) = HA if d even else HB; step d reads h1 = W(d-1),
        # h2 = W(d-2) = W(d), writes Hn -> W(d) (read-before-write)
        def bufs(parity):
            return (HA, HB) if parity == 0 else (HB, HA)

        def dp_step(d, parity, r_col, qsv, boundary_lane=None,
                    qsv_prev=None, defer_bp=False):
            hout, hprev = bufs(parity)
            rd = jnp.where(is_lane0, r_col,
                           pltpu.roll(r_diag[:], 1, axis=1))
            r_diag[:] = rd
            q, SM, SX, ZN = qsv
            if boundary_lane is not None:
                is_b = i_idx == boundary_lane
                le_b = i_idx <= boundary_lane
                qp, SMp, SXp, ZNp = qsv_prev
                q = jnp.where(le_b, q, qp)
                SM = jnp.where(le_b, SM, SMp)
                SX = jnp.where(le_b, SX, SXp)
                ZN = jnp.where(le_b, ZN, ZNp)
            else:
                is_b = None
            s = jnp.where(q == rd, SM, SX)
            s = jnp.where(rd == 4, ZN, s)

            h1 = hprev[:]
            hc = h1 - c_go
            hcs = pltpu.roll(hc, 1, axis=1)
            f1s = pltpu.roll(Fd1[:], 1, axis=1)
            Fv = jnp.where(is_lane0, NEG, jnp.maximum(f1s, hcs))
            h2roll = jnp.where(is_lane0, (d - 2) * gap_extend,
                               pltpu.roll(hout[:], 1, axis=1))
            dval = h2roll + s
            K = span1 - d - ((d * gap_extend) << LB)
            pval = (dval << LB) + K
            H0 = jnp.maximum(jnp.maximum(dval, Fv), d * gap_extend)
            E = jnp.maximum(Ed1[:], hc)
            Hn = jnp.maximum(H0, E)

            if is_b is not None:
                bp = (best_pack[:] if nobp
                      else jnp.maximum(best_pack[:], pval))
                capB[:] = jnp.where(is_b, best_pack[:], capB[:])
                best_pack[:] = jnp.where(is_b, 0, bp)
                hout[:] = jnp.where(is_b, d * gap_extend, Hn)
                Ed1[:] = jnp.where(is_b, NEG, E)
                Fd1[:] = jnp.where(is_b, NEG, Fv)
            else:
                hout[:] = Hn
                Ed1[:] = E
                Fd1[:] = Fv
            return pval

        def run_phase(c0, n_chunks, body, defer_bp):
            def chunk(c, _):
                base = pl.multiple_of(c * LANES, LANES)
                rblk[:] = r_ref[:, pl.ds(base, LANES)]

                def inner(u, _):
                    acc = None
                    for v in range(unroll):
                        pval = body(c * LANES + u * unroll + v, v % 2,
                                    rblk[:, v:v + 1])
                        if defer_bp:
                            acc = pval if acc is None else \
                                jnp.maximum(acc, pval)
                    if defer_bp and not nobp:
                        best_pack[:] = jnp.maximum(best_pack[:], acc)
                    rblk[:] = pltpu.roll(rblk[:], LANES - unroll, axis=1)
                    return 0

                jax.lax.fori_loop(0, LANES // unroll, inner, 0)
                return 0

            jax.lax.fori_loop(c0, c0 + n_chunks, chunk, 0)

        def drain(k):
            bp = capB[:]
            bv = bp >> LB
            bd = span1 - (bp & span1)
            o_k = k * (lrp + 1) + 1
            best = jnp.max(bv, axis=1, keepdims=True)
            isbest = bv == best
            j_of = bd - o_k - i_idx
            jstar = jnp.min(jnp.where(isbest, j_of, BIG), axis=1,
                            keepdims=True)
            istar = jnp.min(jnp.where(isbest & (j_of == jstar), i_idx,
                                      BIG), axis=1, keepdims=True)
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
            qsv_prev = svecs(q_ref[:, max(k - 1, 0) * lqp:
                                   max(k, 1) * lqp])

            def a_body(t, parity, r_col, t0=t0, qc=qsv_cur, qp=qsv_prev):
                return dp_step(t, parity, r_col, qc,
                               boundary_lane=t - t0, qsv_prev=qp)

            run_phase(t0 // LANES, a_chunks, a_body, defer_bp=False)
            if k > 0:
                drain(k - 1)
            if k < C:
                def b_body(t, parity, r_col, qc=qsv_cur):
                    return dp_step(t, parity, r_col, qc)

                run_phase(t0 // LANES + a_chunks,
                          per_job_chunks - a_chunks, b_body,
                          defer_bp=True)

    return kernel


def build_kernel(jnp, jax, pl, pltpu, *, btile, lqp, lrp, match, mismatch,
                 gap_open, gap_extend, nomask7, packbest, tworow,
                 levels=None):
    def _shift_right(x, is_lane0, fill):
        rolled = pltpu.roll(x, 1, axis=1)
        return jnp.where(is_lane0, fill, rolled)

    def kernel(q_ref, r_ref, out_ref, H, F, best_val, best_i, qblk):
        r = r_ref[:]
        j_idx = jax.lax.broadcasted_iota(jnp.int32, (btile, lrp), 1)

        H[:] = jnp.zeros((btile, lrp), jnp.int32)
        F[:] = jnp.full((btile, lrp), NEG, jnp.int32)
        if packbest:
            # packed (score << 13) | (8191 - i); score>=0 so 0-init is the
            # "no positive cell" floor with i undefined (masked later)
            best_val[:] = jnp.zeros((btile, lrp), jnp.int32)
        else:
            best_val[:] = jnp.zeros((btile, lrp), jnp.int32)
            best_i[:] = jnp.full((btile, lrp), -1, jnp.int32)

        r_is_n = r == 4
        r_is_pad = r >= 5
        jge = j_idx * gap_extend
        e_bias = gap_open + (j_idx - 1) * gap_extend
        is_lane0 = j_idx == 0

        if nomask7:
            # poison pad lanes in the prefix-scan input so levels 1..64
            # wrap harmlessly (requires >=64 trailing pad lanes); the
            # poison rides the existing bias add for free
            jge_pois = jnp.where(r_is_pad, NEG, jge)
            masks = []
            k = 128
            while k < lrp:
                masks.append(j_idx >= k)
                k *= 2
        else:
            jge_pois = jge
            masks = []
            k = 1
            while k < lrp:
                masks.append(j_idx >= k)
                k *= 2

        def cummax(x):
            if levels is not None:
                # TIMING-ONLY variant: truncate the prefix scan to the
                # first `levels` log-shift levels (bounds gap propagation
                # to 2^levels lanes; results inexact) -- used to measure
                # how roll-bound the kernel is for the SOL analysis
                k = 1
                for m in masks[:levels]:
                    sh = pltpu.roll(x, k, axis=1)
                    x = jnp.maximum(x, jnp.where(m, sh, NEG))
                    k *= 2
                return x
            if nomask7:
                k = 1
                while k < 128:
                    x = jnp.maximum(x, pltpu.roll(x, k, axis=1))
                    k *= 2
                k = 128
                for m in masks:
                    sh = pltpu.roll(x, k, axis=1)
                    x = jnp.maximum(x, jnp.where(m, sh, NEG))
                    k *= 2
            else:
                k = 1
                for m in masks:
                    sh = pltpu.roll(x, k, axis=1)
                    x = jnp.maximum(x, jnp.where(m, sh, NEG))
                    k *= 2
            return x

        def step(i, q_col):
            is_n = (q_col == 4) | r_is_n
            is_pad = (q_col >= 5) | r_is_pad
            s = jnp.where(q_col == r, match, -mismatch)
            s = jnp.where(is_n, 0, s)
            s = jnp.where(is_pad, NEG, s)

            Hp = H[:]
            Fv = jnp.maximum(F[:] - gap_extend, Hp - gap_open)
            Hdiag = _shift_right(Hp, is_lane0, 0)
            H0 = jnp.maximum(jnp.maximum(Hdiag + s, Fv), 0)

            P = cummax(H0 + jge_pois)
            Ps = _shift_right(P, is_lane0, NEG)
            E = Ps - e_bias
            Hn = jnp.maximum(H0, E)

            if packbest:
                pack = Hn * 8192 + (8191 - i)
                best_val[:] = jnp.maximum(best_val[:], pack)
            else:
                better = Hn > best_val[:]
                best_val[:] = jnp.where(better, Hn, best_val[:])
                best_i[:] = jnp.where(better, i, best_i[:])
            H[:] = Hn
            F[:] = Fv

        if tworow:
            def chunk_body(c, _):
                base = pl.multiple_of(c * LANES, LANES)
                qblk[:] = q_ref[:, pl.ds(base, LANES)]

                def inner(t, _):
                    step(c * LANES + 2 * t, qblk[:, 0:1])
                    step(c * LANES + 2 * t + 1, qblk[:, 1:2])
                    qblk[:] = pltpu.roll(qblk[:], LANES - 2, axis=1)
                    return 0

                jax.lax.fori_loop(0, LANES // 2, inner, 0)
                return 0
        else:
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

        if packbest:
            pk = best_val[:]
            bv = pk // 8192
            bi = 8191 - (pk & 8191)
        else:
            bv = best_val[:]
            bi = best_i[:]
        best = jnp.max(bv, axis=1, keepdims=True)
        isbest = bv == best
        jstar = jnp.min(jnp.where(isbest, j_idx, BIG), axis=1, keepdims=True)
        istar = jnp.min(jnp.where(isbest & (j_idx == jstar), bi, BIG),
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

    return kernel


def build_kernel_chain10(jnp, jax, pl, pltpu, *, btile, lqp, lrp, C, match,
                         mismatch, gap_open, gap_extend, unroll=8):
    """Square-shape probe (VERDICT r4 #8): chain7 with a PERSISTENT
    blended-query scratch instead of the per-step le_b 4-vector blend.

    On near-square jobs (lrp ~ lqp) every step is phase A, so the
    boundary premium (~10 ops: le_b + 4 blend selects + is_b + 4 reset
    selects + capture) applies to ~100% of steps -- the measured 86 vs
    127 GCUPS square gap (KERNEL_SOL.md round-4).  The only removable
    part without changing the reset semantics is the query blend: keep
    q/SM/SX/ZN in VMEM scratch, initialise to job 0's vectors, and at
    each phase-A step overwrite ONLY the boundary lane with the new
    job's value (1 select each) -- dp_step then reads the scratch
    directly.  Trades 1+4 blend ops for 4 scratch read-modify-writes
    per phase-A step and adds 4 scratch reads to phase B (whose qsv
    chain7 keeps hoisted); strictly a square-shape bet, and a test of
    the round-4 'traffic is the margin' hypothesis from the other side.
    Exact (same values as chain7 -- the blend and the incremental
    update agree lane-for-lane in phase A: lanes <= b have been
    overwritten by steps <= b of this job's phase A, lanes > b still
    hold the previous job's values)."""
    LB = 1
    T = C * (lrp + 1) + lqp
    while (1 << LB) < T + 1:
        LB += 1
    span1 = (1 << LB) - 1
    assert (lrp + 1) % LANES == 0 and lqp % LANES == 0
    assert lrp >= lqp - 1
    assert match * lqp << LB < 2 ** 31
    c_go = gap_open - gap_extend
    s_base = gap_open + gap_extend

    def kernel(q_ref, r_ref, out_ref, Hd1, Hd2r, Ed1, Fd1, best_pack,
               capB, r_diag, Qs, SMs, SXs, ZNs, rblk):
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

        # persistent blended query state, starts as job 0's vectors
        q0, SM0, SX0, ZN0 = svecs(q_ref[:, 0:lqp])
        Qs[:] = q0
        SMs[:] = SM0
        SXs[:] = SX0
        ZNs[:] = ZN0

        def dp_step(d, r_col, qsv_new=None, boundary_lane=None):
            rd = jnp.where(is_lane0, r_col, pltpu.roll(r_diag[:], 1,
                                                       axis=1))
            r_diag[:] = rd
            if boundary_lane is not None:
                is_b = i_idx == boundary_lane
                qn, SMn, SXn, ZNn = qsv_new
                Qs[:] = jnp.where(is_b, qn, Qs[:])
                SMs[:] = jnp.where(is_b, SMn, SMs[:])
                SXs[:] = jnp.where(is_b, SXn, SXs[:])
                ZNs[:] = jnp.where(is_b, ZNn, ZNs[:])
            else:
                is_b = None
            s = jnp.where(Qs[:] == rd, SMs[:], SXs[:])
            s = jnp.where(rd == 4, ZNs[:], s)

            h1 = Hd1[:]
            hc = h1 - c_go
            hcs = pltpu.roll(hc, 1, axis=1)
            f1s = pltpu.roll(Fd1[:], 1, axis=1)
            Fv = jnp.where(is_lane0, NEG, jnp.maximum(f1s, hcs))
            h2s = jnp.where(is_lane0, (d - 2) * gap_extend - c_go,
                            Hd2r[:])
            dval = h2s + s
            K = span1 - d - ((d * gap_extend) << LB)
            bp = jnp.maximum(best_pack[:], (dval << LB) + K)
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
            bv = bp >> LB
            bd = span1 - (bp & span1)
            o_k = k * (lrp + 1) + 1
            best = jnp.max(bv, axis=1, keepdims=True)
            isbest = bv == best
            j_of = bd - o_k - i_idx
            jstar = jnp.min(jnp.where(isbest, j_of, BIG), axis=1,
                            keepdims=True)
            istar = jnp.min(jnp.where(isbest & (j_of == jstar), i_idx,
                                      BIG), axis=1, keepdims=True)
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
            qsv_new = svecs(q_ref[:, min(k, C - 1) * lqp:
                                  (min(k, C - 1) + 1) * lqp])

            def a_body(t, r_col, t0=t0, qn=qsv_new):
                dp_step(t, r_col, qsv_new=qn, boundary_lane=t - t0)

            run_phase(t0 // LANES, a_chunks, a_body)
            if k > 0:
                drain(k - 1)
            if k < C:
                def b_body(t, r_col):
                    dp_step(t, r_col)

                run_phase(t0 // LANES + a_chunks,
                          per_job_chunks - a_chunks, b_body)

    return kernel


def make_call(args, params):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    match, mismatch, gap_open, gap_extend = params
    btile = args.btile

    @functools.partial(jax.jit, static_argnames=())
    def call(query, ref):
        B, Lq = query.shape
        _, Lr = ref.shape
        LqP = _round_up(Lq, LANES)
        LrP = _round_up(Lr, LANES)
        # levels 1..64 cumulatively shift real values 127 lanes into the
        # tail, so the unmasked wrap needs >=127 poisoned trailing lanes
        if args.nomask7 and LrP - Lr < 127:
            LrP += LANES
        Bp = _round_up(B, btile)

        q = jnp.pad(query.astype(jnp.int32), ((0, Bp - B), (0, LqP - Lq)),
                    constant_values=5)
        r = jnp.pad(ref.astype(jnp.int32), ((0, Bp - B), (0, LrP - Lr)),
                    constant_values=5)

        if args.chain or args.chain7 or args.chain9 or args.chain10:
            C = args.chain or args.chain7 or args.chain9 or args.chain10
            assert B % C == 0, "batch must divide by --chain"
            rows = B // C
            lrp = max(_round_up(Lr + 1, LANES) - 1, LqP - 1)
            T = C * (lrp + 1) + LqP
            Tp = _round_up(T, LANES)

            qj = jnp.pad(query.astype(jnp.int32),
                         ((0, 0), (0, LqP - Lq)), constant_values=5)
            qrows = qj.reshape(rows, C * LqP)
            rj = jnp.pad(ref.astype(jnp.int32),
                         ((0, 0), (0, lrp - Lr)), constant_values=6)
            rj = jnp.where(rj >= 5, 6, rj)
            # stream: [boundary][job r codes] per job, then drain pads
            bcol = jnp.full((rows, C, 1), 6, jnp.int32)
            stream = jnp.concatenate(
                [bcol, rj.reshape(rows, C, lrp)], axis=2).reshape(rows, -1)
            stream = jnp.pad(stream, ((0, 0), (0, Tp - C * (lrp + 1))),
                             constant_values=6)

            bt = min(btile, rows)
            Rp = _round_up(rows, bt)
            qrows = jnp.pad(qrows, ((0, Rp - rows), (0, 0)),
                            constant_values=5)
            stream = jnp.pad(stream, ((0, Rp - rows), (0, 0)),
                             constant_values=6)

            if args.chain10:
                kernel = build_kernel_chain10(
                    jnp, jax, pl, pltpu, btile=bt, lqp=LqP, lrp=lrp, C=C,
                    match=match, mismatch=mismatch, gap_open=gap_open,
                    gap_extend=gap_extend, unroll=args.unroll)
            elif args.chain9:
                kernel = build_kernel_chain9(
                    jnp, jax, pl, pltpu, btile=bt, lqp=LqP, lrp=lrp, C=C,
                    match=match, mismatch=mismatch, gap_open=gap_open,
                    gap_extend=gap_extend, unroll=args.unroll,
                    nobp=args.nobp)
            elif args.chain7:
                kernel = build_kernel_chain7(
                    jnp, jax, pl, pltpu, btile=bt, lqp=LqP, lrp=lrp, C=C,
                    match=match, mismatch=mismatch, gap_open=gap_open,
                    gap_extend=gap_extend, unroll=args.unroll,
                    assume_no_n=args.non, noroll=args.noroll)
            else:
                kernel = build_kernel_chain(
                    jnp, jax, pl, pltpu, btile=bt, lqp=LqP, lrp=lrp, C=C,
                    match=match, mismatch=mismatch, gap_open=gap_open,
                    gap_extend=gap_extend)
            out = pl.pallas_call(
                kernel,
                grid=(Rp // bt,),
                in_specs=[
                    pl.BlockSpec((bt, C * LqP), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((bt, Tp), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((bt, C * LANES), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((Rp, C * LANES), jnp.int32),
                scratch_shapes=(
                    [pltpu.VMEM((bt, LqP), jnp.int32)]
                    * (11 if args.chain10 else 7)
                    + [pltpu.VMEM((bt, LANES), jnp.int32)]),
                cost_estimate=pl.CostEstimate(
                    flops=int(30 * Rp * LqP * Tp),
                    bytes_accessed=int(4 * Rp * (C * LqP + Tp + C * LANES)),
                    transcendentals=0),
                interpret=args.interpret,
            )(qrows, stream)
            out = out[:rows].reshape(rows, C, LANES).reshape(B, LANES)
            return out[:, 0], out[:, 1], out[:, 2]
        if args.wave or args.wave2 or args.wave3 or args.wave5:
            LrPW = _round_up(LqP + LrP, LANES)
            r = jnp.pad(r, ((0, 0), (0, LrPW - LrP)), constant_values=5)
            if args.wave5:
                lb = 1
                while (1 << lb) < LrPW + 1:
                    lb += 1
                if match * LqP << lb >= 2 ** 31:
                    raise SystemExit("wave5 packed-best overflow at this "
                                     "shape; use --wave3")
                r = jnp.where(r >= 5, 6, r)
                kernel = build_kernel_wave5(
                    jnp, jax, pl, pltpu, btile=btile, lqp=LqP, lrpw=LrPW,
                    match=match, mismatch=mismatch, gap_open=gap_open,
                    gap_extend=gap_extend, unroll=args.unroll)
                n_scratch = 6
            elif args.wave3:
                r = jnp.where(r >= 5, 6, r)
                kernel = build_kernel_wave3(
                    jnp, jax, pl, pltpu, btile=btile, lqp=LqP, lrpw=LrPW,
                    match=match, mismatch=mismatch, gap_open=gap_open,
                    gap_extend=gap_extend)
                n_scratch = 7
            elif args.wave2:
                # wave2 contract: reference pads are code 6 (query keeps
                # 5) so the kernel needs no PAD select in scoring
                dspan = 1
                while dspan < LrPW + 1:
                    dspan *= 2
                # packed-best precondition: best = Hn*DSPAN + (DSPAN-1-d)
                # must fit int32 (max score <= match * LqP)
                if match * LqP * dspan >= 2 ** 31:
                    raise SystemExit(
                        "wave2 packed-best overflow: match*LqP*DSPAN = "
                        f"{match * LqP * dspan} >= 2^31 at Lq={Lq} Lr={Lr};"
                        " use --wave3 for this shape")
                r = jnp.where(r >= 5, 6, r)
                kernel = build_kernel_wave2(
                    jnp, jax, pl, pltpu, btile=btile, lqp=LqP, lrpw=LrPW,
                    match=match, mismatch=mismatch, gap_open=gap_open,
                    gap_extend=gap_extend)
                n_scratch = 6
            else:
                kernel = build_kernel_wave(
                    jnp, jax, pl, pltpu, btile=btile, lqp=LqP, lrpw=LrPW,
                    match=match, mismatch=mismatch, gap_open=gap_open,
                    gap_extend=gap_extend)
                n_scratch = 8
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
                    [pltpu.VMEM((btile, LqP), jnp.int32)] * n_scratch
                    + [pltpu.VMEM((btile, LANES), jnp.int32)]),
                cost_estimate=pl.CostEstimate(
                    flops=int(30 * Bp * LqP * LrPW),
                    bytes_accessed=int(4 * Bp * (LqP + LrPW + LANES)),
                    transcendentals=0),
                interpret=args.interpret,
            )(q, r)
            return out[:B, 0], out[:B, 1], out[:B, 2]
        if args.r3:
            kernel = build_kernel_r3(
                jnp, jax, pl, pltpu, btile=btile, lqp=LqP, lrp=LrP,
                match=match, mismatch=mismatch, gap_open=gap_open,
                gap_extend=gap_extend)
            st = (btile, LrP // LANES, LANES)
        else:
            kernel = build_kernel(
                jnp, jax, pl, pltpu, btile=btile, lqp=LqP, lrp=LrP,
                match=match, mismatch=mismatch, gap_open=gap_open,
                gap_extend=gap_extend, nomask7=args.nomask7,
                packbest=args.packbest, tworow=args.tworow,
                levels=args.levels)
            st = (btile, LrP)

        scratch = [
            pltpu.VMEM(st, jnp.int32),   # H
            pltpu.VMEM(st, jnp.int32),   # F
            pltpu.VMEM(st, jnp.int32),   # best_val / pack
            pltpu.VMEM(st, jnp.int32),   # best_i (unused if pack)
            pltpu.VMEM((btile, LANES), jnp.int32),
        ]
        if args.r3:
            r = r.reshape(Bp, LrP // LANES, LANES)
            r_spec = pl.BlockSpec((btile, LrP // LANES, LANES),
                                  lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
        else:
            r_spec = pl.BlockSpec((btile, LrP), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=(Bp // btile,),
            in_specs=[
                pl.BlockSpec((btile, LqP), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                r_spec,
            ],
            out_specs=pl.BlockSpec((btile, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Bp, LANES), jnp.int32),
            scratch_shapes=scratch,
            cost_estimate=pl.CostEstimate(
                flops=int(25 * Bp * LqP * LrP),
                bytes_accessed=int(4 * Bp * (LqP + LrP + LANES)),
                transcendentals=0),
            interpret=args.interpret,
        )(q, r)
        return out[:B, 0], out[:B, 1], out[:B, 2]

    return call


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--btile", type=int, default=32)
    ap.add_argument("--nomask7", action="store_true")
    ap.add_argument("--packbest", action="store_true")
    ap.add_argument("--tworow", action="store_true")
    ap.add_argument("--r3", action="store_true")
    ap.add_argument("--wave", action="store_true")
    ap.add_argument("--wave2", action="store_true")
    ap.add_argument("--wave3", action="store_true")
    ap.add_argument("--wave5", action="store_true")
    ap.add_argument("--unroll", type=int, default=2,
                    help="wave5 diagonals per inner loop iteration")
    ap.add_argument("--chain", type=int, default=0,
                    help="chained wavefront: jobs per lane-row (wave6)")
    ap.add_argument("--chain7", type=int, default=0,
                    help="op-diet chained wavefront (wave7): jobs per row")
    ap.add_argument("--non", action="store_true",
                    help="chain7: assume reference stream has no N codes "
                         "(drops the rd==4 select; check data excludes N)")
    ap.add_argument("--noroll", action="store_true",
                    help="chain7 TIMING-ONLY: identity instead of lane "
                         "rolls (results wrong; implies --skipcheck)")
    ap.add_argument("--chain10", type=int, default=0,
                    help="square-shape probe: chain7 with persistent "
                    "blended-query scratch (VERDICT r4 #8)")
    ap.add_argument("--chain9", type=int, default=0,
                    help="traffic-diet chained wavefront (ping-pong H + "
                         "group-accumulated best): jobs per row")
    ap.add_argument("--nobp", action="store_true",
                    help="chain9 TIMING-ONLY: skip the packed-best "
                         "accumulation (results wrong; implies "
                         "--skipcheck)")
    ap.add_argument("--interpret", action="store_true",
                    help="pallas interpret mode (CPU correctness checks)")
    ap.add_argument("--B", type=int, default=512)
    ap.add_argument("--Lq", type=int, default=1024)
    ap.add_argument("--Lr", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--skipcheck", action="store_true")
    ap.add_argument("--levels", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from ciri_long_tpu.ops.sw import SWParams, sw_score_ends

    params = (10, 4, 8, 2)
    call = make_call(args, params)

    rng = np.random.default_rng(0)

    if args.noroll or args.nobp:
        args.skipcheck = True
    if not args.skipcheck:
        # correctness vs the XLA-scan oracle: once at a fixed small shape
        # (fast; odd lengths exercise the N/pad lanes) and once at the
        # TIMED --Lq/--Lr shape with a small batch, so shape-dependent
        # failures (DSPAN packing, padding geometry) in the benchmark
        # configuration are caught before timing
        check_shapes = [(300, 517)]
        timed = (max(64, args.Lq - 7), max(64, args.Lr - 3))
        if timed != check_shapes[0]:
            check_shapes.append(timed)
        for lq_c, lr_c in check_shapes:
            qs = rng.integers(0, 5, (args.btile, lq_c)).astype(np.int8)
            # --non's contract: the caller proved the reference N-free
            rhi = 4 if args.non else 5
            rs = rng.integers(0, rhi, (args.btile, lr_c)).astype(np.int8)
            got = [np.asarray(x) for x in call(qs, rs)]
            want = [np.asarray(x) for x in
                    sw_score_ends(jnp.asarray(qs), jnp.asarray(rs),
                                  SWParams(*params))]
            for g, w, name in zip(got, want, ("score", "q_end", "r_end")):
                if not np.array_equal(g, w):
                    bad = np.nonzero(g != w)[0][:5]
                    raise SystemExit(
                        f"MISMATCH {name} ({lq_c}x{lr_c}) at rows {bad}: "
                        f"got {g[bad]} want {w[bad]}")

    B, Lq, Lr = args.B, args.Lq, args.Lr
    q = rng.integers(0, 4, (B, Lq)).astype(np.int8)
    r = rng.integers(0, 4, (B, Lr)).astype(np.int8)
    qd = jax.device_put(q)
    rd = jax.device_put(r)
    n_iter = args.iters

    @jax.jit
    def loop(qx, rx):
        def body(_, carry):
            score, _, _ = call(carry, rx)
            # GENUINE data dependency: fold the scores back into the
            # query (codes 0-3 xor 1 stay 0-3).  The previous
            # `qx + score*0` was strength-reduced by XLA and the whole
            # loop dead-code-eliminated -- every iteration count gave the
            # same ~(1 kernel + dispatch RTT) wall, inflating GCUPS
            # linearly with n_iter (discovered 2026-08-19; wall was flat
            # from --iters 1 to 64).
            return carry ^ (score & 1).astype(jnp.int8)[:, None]
        final = jax.lax.fori_loop(0, n_iter, body, qx)
        return call(final, rx)[0]

    np.asarray(loop(qd, rd))
    t0 = time.perf_counter()
    np.asarray(loop(qd, rd))
    dt = time.perf_counter() - t0
    total = n_iter + 1

    cells = B * Lq * Lr * total
    gcups = cells / dt / 1e9
    print(json.dumps({
        "variant": {k: getattr(args, k) for k in
                    ("btile", "nomask7", "packbest", "tworow", "r3",
                     "wave", "wave2", "wave3", "wave5", "unroll",
                     "chain", "chain7", "chain9", "chain10", "non", "noroll",
                     "nobp")},
        "gcups": round(gcups, 2),
        "seconds": round(dt, 3),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
