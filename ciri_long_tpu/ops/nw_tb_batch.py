"""Batched device banded GLOBAL alignment (NW) with traceback.

The device twin of ops/traceback.py::banded_global_cigar's native core
(native/nwcore.cpp::py_nw_banded) -- the hot host path of CCS unit
polishing (center_star_consensus aligns every tandem unit to the
median-length representative, reference analog: pyccs's POA of unit
segments) and of inter-anchor stitching.  A whole chunk of unit
alignments runs as ONE device program; only the O(path) op strings cross
the tunnel, never DP matrices.

Semantics are bit-identical to the C++ core:

  - sheared band around the length-difference diagonal:
    lo = min(0, m-n) - band, hi = max(0, m-n) + band, W = hi - lo + 1;
    cells outside keep value NEG (no clamping of NEG - gap arithmetic).
  - affine gaps with the prefix-max identity for the within-row E
    recurrence (exact for gap_open >= gap_extend, ops/sw.py).
  - traceback priority at H: E first, then F, then diagonal; gap runs
    continue on exact-value stay checks (E[i,j]==E[i,j-1]-ge resp.
    F[i,j]==F[i-1,j]-ge) with the same in-band guards.
  - band doubling: scores at band and min(2*band, max(n,m)) must agree,
    else the pair falls back to the host implementation (identical to
    _nw_native's loop, which also returns the SMALLER band's cigar).

Per-cell 4-bit codes (case in bits 0-1: 1=E, 2=F, 3=diag; stay flags in
bits 2-3) are stored in an [N+1, W] uint8 plane per pair and walked on
device in a vmapped while_loop, mirroring the C++ 3-state machine.
"""

import functools
from typing import List, Sequence, Tuple

import numpy as np

from ciri_long_tpu.utils.dispatch import count_dispatch as _count_dispatch

NEG = -(1 << 28)

N_BUCKETS = (128, 256, 512, 1024, 2048)
W_BUCKETS = (64, 128, 256, 512)
B_BUCKETS = (8, 32, 128, 512, 2048)
MAX_N = N_BUCKETS[-1]
MAX_W = W_BUCKETS[-1]


def _bucket(n, ladder):
    for b in ladder:
        if n <= b:
            return b
    return None


def _build_kernel(N, W, CAP, scores):
    import jax
    import jax.numpy as jnp
    from jax import lax

    match, mismatch, go, ge = scores

    def sub_row(qi, r_slice):
        """cell_score(q[i-1], r[j-1]) along the band row (nwcore.cpp:32)."""
        bad = (qi >= 5) | (r_slice >= 5)
        anyn = (qi == 4) | (r_slice == 4)
        s = jnp.where(qi == r_slice, match, -mismatch)
        return jnp.where(bad, NEG, jnp.where(anyn, 0, s))

    def forward(q, rpad, n, m, lo, hi, emit_planes):
        """Row loop in band coordinates c = j - i - lo; returns
        (planes|None, score at (n, m)).

        ``rpad`` must hold r pre-shifted so that rpad[W + i - 1 + c] ==
        r[c + i + lo - 1] (host places r at offset W - lo).  This makes
        the per-row slice start SHARED across the vmapped batch -- a
        per-job traced start would lower to a one-hot-matmul gather on
        every row (~600 us/row measured on v5e, 10x the whole row's
        arithmetic)."""
        idx = jnp.arange(W, dtype=jnp.int32)

        # row 0: H[0,j] = -go-(j-1)*ge for j>=1 (E=H), H[0,0]=0
        j0 = idx + lo                      # j at i=0
        row0_valid = (j0 >= 0) & (j0 <= m) & (idx <= hi - lo)
        H0 = jnp.where(
            row0_valid,
            jnp.where(j0 == 0, 0, -go - (j0 - 1) * ge), NEG).astype(jnp.int32)
        E0 = jnp.where(row0_valid & (j0 >= 1), H0, NEG).astype(jnp.int32)
        F0 = jnp.full((W,), NEG, jnp.int32)

        if emit_planes:
            # row-0 codes: every j>=1 cell is an E-enter with E-stay
            e_stay0 = (j0 > 1) & (idx >= 1) & \
                jnp.where(idx >= 1, E0 == jnp.roll(E0, 1) - ge, False)
            code0 = jnp.where(row0_valid & (j0 >= 1),
                              1 | (e_stay0.astype(jnp.int32) << 2), 0)
            planes0 = jnp.zeros((N + 1, W), jnp.uint8)
            planes0 = planes0.at[0].set(code0.astype(jnp.uint8))
        else:
            planes0 = None

        c_nm = m - n - lo                  # band column of (n, m)

        def row(i, carry):
            if emit_planes:
                Hp, Ep, Fp, planes, Hn = carry
            else:
                Hp, Ep, Fp, Hn = carry
            j = idx + i + lo
            jlo = jnp.maximum(0, i + lo)
            jhi = jnp.minimum(m, i + hi)
            live = i <= n
            valid = (j >= jnp.maximum(1, jlo)) & (j <= jhi) & live

            # diagonal + vertical from previous row (shared slice start:
            # the lo offset is baked into rpad's host-side placement)
            qi = q[jnp.clip(i - 1, 0, N - 1)]
            r_slice = lax.dynamic_slice_in_dim(rpad, W + i - 1, W)
            d = Hp + sub_row(qi, r_slice)
            Hp_up = jnp.concatenate([Hp[1:], jnp.array([NEG], jnp.int32)])
            Fp_up = jnp.concatenate([Fp[1:], jnp.array([NEG], jnp.int32)])
            F = jnp.maximum(Fp_up - ge, Hp_up - go)

            Htmp = jnp.maximum(d, F)
            # j == 0 edge cell (only when jlo == 0): H = F = -go-(i-1)*ge
            edge = -go - (i - 1) * ge
            is_j0 = (j == 0) & (jlo == 0) & live
            Htmp = jnp.where(valid, Htmp, NEG)
            Htmp = jnp.where(is_j0, edge, Htmp)
            F = jnp.where(valid, F, NEG)
            F = jnp.where(is_j0, edge, F)

            # within-row E by prefix-max (exact for go >= ge)
            g = jnp.where(Htmp > NEG // 2, Htmp + ge * idx, NEG)
            p = lax.cummax(g, axis=0)
            p_shift = jnp.concatenate([jnp.array([NEG], jnp.int32), p[:-1]])
            E = jnp.where(p_shift > NEG // 2,
                          p_shift - go - (idx - 1) * ge, NEG)
            E = jnp.where(valid, E, NEG)
            H = jnp.maximum(Htmp, E)
            H = jnp.where(is_j0, edge, H)
            H = jnp.where(valid | is_j0, H, NEG)
            E = jnp.where(is_j0, NEG, E)

            # capture the final row; (n, m) extraction happens ONCE after
            # the loop (a per-job gather per row costs a one-hot matmul)
            Hn = jnp.where(live & (i == n), H, Hn)

            if emit_planes:
                in_cell = valid | is_j0
                case = jnp.where(
                    (H == E) & (j > 0) & in_cell, 1,
                    jnp.where((H == F) & in_cell, 2, 3))
                E_l = jnp.concatenate([jnp.array([NEG], jnp.int32), E[:-1]])
                e_stay = (j > 1) & (idx >= 1) & (E == E_l - ge) & \
                    (E_l > NEG // 2)
                f_stay = (i > 1) & (idx <= W - 2) & (F == Fp_up - ge) & \
                    (Fp_up > NEG // 2)
                code = jnp.where(
                    in_cell,
                    case | (e_stay.astype(jnp.int32) << 2) |
                    (f_stay.astype(jnp.int32) << 3), 0).astype(jnp.uint8)
                planes = planes.at[jnp.clip(i, 0, N)].set(
                    jnp.where(live, code, planes[jnp.clip(i, 0, N)]))
                return H, E, F, planes, Hn
            return H, E, F, Hn

        Hn0 = jnp.where(n == 0, H0, jnp.full((W,), NEG, jnp.int32))
        if emit_planes:
            init = (H0, E0, F0, planes0, Hn0)
            out = lax.fori_loop(1, N + 1, row, init)
            planes, Hn = out[3], out[4]
        else:
            init = (H0, E0, F0, Hn0)
            out = lax.fori_loop(1, N + 1, row, init)
            planes, Hn = None, out[3]
        score = Hn[jnp.clip(c_nm, 0, W - 1)]
        return planes, score

    def walk(planes, n, m, lo):
        """Device 3-state traceback over the code plane, RUN-COMPRESSED on
        device: each u16 entry is op | (runlen << 2) (op 0=M, 1=I, 2=D),
        written backwards so the fetched buffer reads in forward order.
        Near-identical pairs have tens of runs, so the tunnel fetch is
        ~CAP*2 bytes instead of one byte per aligned column; a path with
        more than CAP runs (wildly divergent pair) sets ok=False and the
        host aligner takes that pair."""
        import jax.numpy as jnp
        flat = planes.reshape(-1).astype(jnp.int32)
        MAXLEN = (1 << 14) - 1

        def cond(st):
            i, j, state, cur_op, cur_len, runs, pos, ok = st
            return ok & ((i > 0) | (j > 0))

        def body(st):
            i, j, state, cur_op, cur_len, runs, pos, ok = st
            c = j - i - lo
            code = flat[jnp.clip(i * W + c, 0, (N + 1) * W - 1)]
            case = code & 3
            e_stay = (code >> 2) & 1
            f_stay = (code >> 3) & 1

            at_h = state == 0
            enter_e = at_h & (case == 1)
            enter_f = at_h & (case == 2)
            do_m = at_h & (case == 3)
            do_e = state == 1
            do_f = state == 2
            bad = at_h & (case == 0)

            push = do_m | do_e | do_f
            op = jnp.where(do_m, 0, jnp.where(do_e, 2, 1))
            # extend the current run or flush it and start a new one
            same = push & (op == cur_op) & (cur_len > 0) & \
                (cur_len < MAXLEN)
            flush = push & ~same & (cur_len > 0)
            npos = jnp.where(flush, pos - 1, pos)
            entry = (cur_op | (cur_len << 2)).astype(jnp.uint16)
            runs = jnp.where(flush,
                             runs.at[jnp.clip(npos, 0, CAP - 1)].set(entry),
                             runs)
            n_op = jnp.where(push, op, cur_op)
            n_len = jnp.where(same, cur_len + 1,
                              jnp.where(push, 1, cur_len))

            ni = jnp.where(do_m | do_f, i - 1, i)
            nj = jnp.where(do_m | do_e, j - 1, j)
            nstate = jnp.where(
                enter_e, 1,
                jnp.where(enter_f, 2,
                          jnp.where(do_e, jnp.where(e_stay == 1, 1, 0),
                                    jnp.where(do_f,
                                              jnp.where(f_stay == 1, 2, 0),
                                              0))))
            return (ni, nj, nstate, n_op, n_len, runs, npos,
                    ok & ~bad & (npos > 0))

        init = (n, m, jnp.int32(0), jnp.int32(-1), jnp.int32(0),
                jnp.zeros((CAP,), jnp.uint16), jnp.int32(CAP),
                jnp.bool_(True))
        i, j, _st, cur_op, cur_len, runs, pos, ok = jax.lax.while_loop(
            cond, body, init)
        # flush the final (earliest) run
        fpos = jnp.where(cur_len > 0, pos - 1, pos)
        runs = jnp.where(cur_len > 0,
                         runs.at[jnp.clip(fpos, 0, CAP - 1)].set(
                             (cur_op | (cur_len << 2)).astype(jnp.uint16)),
                         runs)
        ok = ok & (fpos >= 0) & (i == 0) & (j == 0)
        return runs, fpos, ok

    @jax.jit
    def kernel(qs, rpads1, rpads2, ns, ms, los, his, los2, his2):
        # inputs arrive int8 (codes): the host->device transfer rides the
        # remote tunnel, so bytes matter 4x more than the on-device cast
        qs = qs.astype(jnp.int32)
        rpads1 = rpads1.astype(jnp.int32)
        rpads2 = rpads2.astype(jnp.int32)

        def one(q, rpad1, rpad2, n, m, lo, hi, lo2, hi2):
            planes, s1 = forward(q, rpad1, n, m, lo, hi, True)
            _, s2 = forward(q, rpad2, n, m, lo2, hi2, False)
            ops, pos, ok = walk(planes, n, m, lo)
            return s1, s2, ops, pos, ok
        return jax.vmap(one)(qs, rpads1, rpads2, ns, ms, los, his, los2,
                             his2)

    return kernel


_KERNELS = {}


def _kernel_for(N, W, CAP, scores):
    key = (N, W, CAP, scores)
    if key not in _KERNELS:
        _KERNELS[key] = _build_kernel(N, W, CAP, scores)
    return _KERNELS[key]


def _decode_runs(entries):
    """u16 run entries (forward order) -> [(len, op)] cigar; adjacent
    same-op entries (MAXLEN splits) merge."""
    cigar = []
    for e in entries:
        e = int(e)
        op, ln = e & 3, e >> 2
        if cigar and cigar[-1][1] == op:
            cigar[-1] = (cigar[-1][0] + ln, op)
        else:
            cigar.append((ln, op))
    return cigar


@_count_dispatch('nw_tb_kernel')
def _invoke_kernel(kernel, *args):
    """One async device program dispatch (counted: the tunnel's RTT floor
    is set by how many of these a stage issues)."""
    return kernel(*args)


def device_nw_enabled() -> bool:
    import jax
    return jax.default_backend() != 'cpu'


def nw_traceback_submit(qs: Sequence[np.ndarray],
                        rs: Sequence[np.ndarray],
                        match=2, mismatch=4, gap_open=4, gap_extend=2):
    """Async half of nw_traceback_batch: stages the buckets and DISPATCHES
    every device program without fetching.  Returns an opaque handle for
    nw_traceback_collect; device execution proceeds while the host does
    other work (the CCS chunk pipeline overlaps chunk i's voting with
    chunk i+1's alignments)."""
    from ciri_long_tpu.ops.traceback import banded_global_cigar

    jobs = []                     # (orig index, q, r, n, m, geometry...)
    results = [None] * len(qs)
    by_bucket = {}
    for t, (q, r) in enumerate(zip(qs, rs)):
        q = np.asarray(q, np.int8)
        r = np.asarray(r, np.int8)
        n, m = len(q), len(r)
        if n == 0 or m == 0:
            results[t] = banded_global_cigar(q, r, match=match,
                                             mismatch=mismatch,
                                             gap_open=gap_open,
                                             gap_extend=gap_extend)
            continue
        band = abs(n - m) + 16
        big = max(n, m)
        Nb = _bucket(big, N_BUCKETS)
        band2 = min(2 * band, big)
        lo1, hi1 = min(0, m - n) - band, max(0, m - n) + band
        lo2, hi2 = min(0, m - n) - band2, max(0, m - n) + band2
        Wn = max(hi1 - lo1, hi2 - lo2) + 1
        Wb = _bucket(Wn, W_BUCKETS)
        if Nb is None or Wb is None:
            results[t] = banded_global_cigar(q, r, match=match,
                                             mismatch=mismatch,
                                             gap_open=gap_open,
                                             gap_extend=gap_extend)
            continue
        by_bucket.setdefault((Nb, Wb), []).append(
            (t, q, r, n, m, band, lo1, hi1, lo2, hi2))

    # merge small groups upward (a job fits any bucket with larger N and
    # W -- lo/hi are traced, padding is free correctness-wise): every
    # kernel invocation costs a full dispatch RTT over the tunnel, so
    # fewer, fuller groups beat tighter padding
    _MIN_GROUP = 64
    merged = {}
    for key in sorted(by_bucket):
        members = by_bucket[key]
        if len(members) >= _MIN_GROUP:
            merged.setdefault(key, []).extend(members)
            continue
        Nb, Wb = key
        host = None
        for N2 in N_BUCKETS:
            if N2 < Nb:
                continue
            for W2 in W_BUCKETS:
                if W2 < Wb:
                    continue
                if (N2, W2) in by_bucket and (N2, W2) != key and \
                        len(by_bucket[(N2, W2)]) >= _MIN_GROUP:
                    host = (N2, W2)
                    break
            if host:
                break
        merged.setdefault(host or key, []).extend(members)

    scores = (match, mismatch, gap_open, gap_extend)
    pending = []
    for (Nb, Wb), members in merged.items():
        CAP = min(2 * Nb + Wb + 8, 256)   # run-compressed entries
        kernel = _kernel_for(Nb, Wb, CAP, scores)
        for i0 in range(0, len(members), B_BUCKETS[-1]):
            part = members[i0:i0 + B_BUCKETS[-1]]
            B = _bucket(len(part), B_BUCKETS)
            qs_p = np.full((B, Nb), 5, np.int8)
            # r placed at offset Wb - lo per pass: the device row slice
            # then uses a batch-SHARED start (see forward's docstring)
            rp1 = np.full((B, Nb + 2 * Wb + 2), 5, np.int8)
            rp2 = np.full((B, Nb + 2 * Wb + 2), 5, np.int8)
            geom = np.zeros((B, 6), np.int32)
            for bt, (t, q, r, n, m, band, lo1, hi1, lo2, hi2) in \
                    enumerate(part):
                qs_p[bt, :n] = q
                rp1[bt, Wb - lo1:Wb - lo1 + m] = r
                rp2[bt, Wb - lo2:Wb - lo2 + m] = r
                geom[bt] = (n, m, lo1, hi1, lo2, hi2)
            out = _invoke_kernel(kernel, qs_p, rp1, rp2,
                                 geom[:, 0], geom[:, 1], geom[:, 2],
                                 geom[:, 3], geom[:, 4], geom[:, 5])
            pending.append((part, out))
    return (results, pending, (match, mismatch, gap_open, gap_extend))


@_count_dispatch('nw_tb_collect')
def nw_traceback_collect(handle) -> List[Tuple[int, list]]:
    """Fetch + decode the other half of nw_traceback_submit."""
    from ciri_long_tpu.ops.traceback import banded_global_cigar

    results, pending, (match, mismatch, gap_open, gap_extend) = handle
    for part, (s1, s2, ops, pos, ok) in pending:
        s1 = np.asarray(s1)
        s2 = np.asarray(s2)
        ops = np.asarray(ops)
        pos = np.asarray(pos)
        ok = np.asarray(ok)
        for bt, (t, q, r, n, m, band, lo1, hi1, lo2, hi2) in \
                enumerate(part):
            big = max(n, m)
            stable = (band >= big) or (int(s1[bt]) == int(s2[bt]))
            if not (stable and bool(ok[bt]) and int(s1[bt]) > NEG // 2):
                results[t] = banded_global_cigar(
                    q, r, match=match, mismatch=mismatch,
                    gap_open=gap_open, gap_extend=gap_extend)
                continue
            cigar = _decode_runs(ops[bt, int(pos[bt]):])
            results[t] = (int(s1[bt]), cigar)
    return results


@_count_dispatch('nw_tb_batch')
def nw_traceback_batch(qs: Sequence[np.ndarray], rs: Sequence[np.ndarray],
                       match=2, mismatch=4, gap_open=4, gap_extend=2
                       ) -> List[Tuple[int, list]]:
    """Batched banded_global_cigar (band=None semantics, including the
    band-doubling stability rule).  Pairs too large for the bucket ladder
    or failing the stability check fall back to the host implementation,
    so results are ALWAYS identical to banded_global_cigar pair by pair
    (fuzz: tests/test_nw_tb_batch.py)."""
    return nw_traceback_collect(nw_traceback_submit(
        qs, rs, match, mismatch, gap_open, gap_extend))
