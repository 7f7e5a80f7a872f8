"""Partial-order alignment (POA) consensus.

Replaces pyspoa (C++ SIMD, reference calls at collapse.py:267,504 and the
pyccs consensus contract exercised by tests/test_poa.py:19-32) with a
self-contained implementation: a DAG of base nodes, sequence-to-graph
alignment with spoa's two-piece ("convex") affine gap model, and a
heaviest-bundle consensus walk.

Scoring matches the reference's invocation
``poa(seqs, 2, False, 10, -4, -8, -2, -24, -1)``: match 10, mismatch -4,
gap piece 1 (open -8, extend -2), gap piece 2 (open -24, extend -1); a gap
of length L scores max over the two pieces -- cheap opening for short gaps,
cheap extension for long ones.

Alignment mode follows spoa's kOV (overlap) semantics as used here: the
sequence is fully consumed, graph overhangs on both sides are free.

The per-sequence DP is laid out like the device kernels (ops/sw.py): one
numpy-vectorized row per graph node in topological order, with the
within-row gap dependency resolved by the prefix-max identity (exact while
|open| >= |extend|, which holds for both pieces).  Graph sizes here are
bounded (junction windows ~50 bp x <=200 reads; cluster consensus a few kb),
so this host implementation keeps up with the pipeline; the batched
junction-window case additionally has a fixed-shape fast path that the
collapse stage calls through ops/sw.py curation scoring.
"""

from typing import List, Optional, Sequence, Tuple

import numpy as np

from ciri_long_tpu.utils.seq import decode_seq, encode_seq

NEG = -(1 << 28)


class _Graph:
    __slots__ = ("base", "ring", "in_edges", "out_edges", "support")

    def __init__(self):
        self.base: List[int] = []
        # ring[v]: list of node ids occupying the same alignment column
        self.ring: List[List[int]] = []
        self.in_edges: List[dict] = []    # v -> {pred: weight}
        self.out_edges: List[dict] = []
        self.support: List[int] = []      # sequences passing through node

    def new_node(self, b: int) -> int:
        v = len(self.base)
        self.base.append(int(b))
        self.ring.append([v])
        self.in_edges.append({})
        self.out_edges.append({})
        self.support.append(0)
        return v

    def add_edge(self, p: int, v: int):
        self.in_edges[v][p] = self.in_edges[v].get(p, 0) + 1
        self.out_edges[p][v] = self.out_edges[p].get(v, 0) + 1

    def topo_order(self) -> List[int]:
        n = len(self.base)
        indeg = np.zeros(n, np.int32)
        for v in range(n):
            indeg[v] = len(self.in_edges[v])
        order = []
        stack = sorted([v for v in range(n) if indeg[v] == 0])
        indeg_l = indeg.tolist()
        while stack:
            v = stack.pop()
            order.append(v)
            for w in self.out_edges[v]:
                indeg_l[w] -= 1
                if indeg_l[w] == 0:
                    stack.append(w)
        return order


def _gap_row(n, o1, e1, o2, e2):
    """max of the two affine pieces for gap lengths 0..n (index = length)."""
    L = np.arange(n + 1, dtype=np.int64)
    g = np.maximum(o1 + (L - 1) * e1, o2 + (L - 1) * e2)
    g[0] = 0
    return g


def _align_to_graph_native(g: _Graph, seq: np.ndarray, m, x, o1, e1, o2, e2):
    """C++ twin of _align_to_graph (native/poacore.cpp): same DP, same
    traceback tie order, rank indices mapped back to node ids here."""
    from ciri_long_tpu import _poacore

    order = g.topo_order()
    rank = {v: i for i, v in enumerate(order)}
    bases = bytes(bytearray(g.base[v] for v in order))
    offs = np.zeros(len(order) + 1, np.int32)
    preds: List[int] = []
    for i, v in enumerate(order):
        for p in g.in_edges[v]:
            preds.append(rank[p] + 1)
        offs[i + 1] = len(preds)
    score, buf = _poacore.align_graph(
        bases, offs.tobytes(), np.asarray(preds, np.int32).tobytes(),
        np.ascontiguousarray(seq, np.uint8).tobytes(),
        m, x, o1, e1, o2, e2)
    pairs = np.frombuffer(buf, np.int32).reshape(-1, 2)
    aln = [(order[r] if r >= 0 else None, int(j) if j >= 0 else None)
           for r, j in pairs]
    return int(score), aln


def _align_to_graph(g: _Graph, seq: np.ndarray, m, x, o1, e1, o2, e2):
    """Align seq (codes) to graph; returns the alignment as a list of
    (node_or_None, seqpos_or_None) pairs in order."""
    try:
        return _align_to_graph_native(g, seq, m, x, o1, e1, o2, e2)
    except ImportError:
        pass
    order = g.topo_order()
    rank = {v: i for i, v in enumerate(order)}
    V = len(order)
    n = len(seq)

    # DP matrices over [V+1, n+1]; row 0 = virtual source.
    H = np.full((V + 1, n + 1), NEG, np.int64)
    M = np.full((V + 1, n + 1), NEG, np.int64)
    F1 = np.full((V + 1, n + 1), NEG, np.int64)
    F2 = np.full((V + 1, n + 1), NEG, np.int64)
    E1s = np.full((V + 1, n + 1), NEG, np.int64)
    E2s = np.full((V + 1, n + 1), NEG, np.int64)

    H[0] = _gap_row(n, o1, e1, o2, e2)      # consume seq prefix before graph
    jj = np.arange(n + 1, dtype=np.int64)

    seq_arr = np.asarray(seq, np.int64)
    for v in order:
        i = rank[v] + 1
        preds = list(g.in_edges[v].keys())
        pred_rows = [rank[p] + 1 for p in preds] if preds else [0]
        # also allow starting fresh from the virtual source (free graph
        # overhang): source row 0 is an implicit predecessor of every node
        if 0 not in pred_rows:
            pred_rows_all = pred_rows + [0]
        else:
            pred_rows_all = pred_rows

        Hp = H[pred_rows_all]               # [P, n+1]
        F1p = np.maximum(F1[pred_rows, :].max(axis=0) + e1,
                         H[pred_rows, :].max(axis=0) + o1)
        F2p = np.maximum(F2[pred_rows, :].max(axis=0) + e2,
                         H[pred_rows, :].max(axis=0) + o2)

        s = np.where(seq_arr == g.base[v], m, x)
        Mrow = np.full(n + 1, NEG, np.int64)
        Mrow[1:] = Hp[:, :-1].max(axis=0) + s

        Hpre = np.maximum(Mrow, np.maximum(F1p, F2p))
        # free leading graph overhang: starting at this node with nothing
        # consumed
        Hpre[0] = max(Hpre[0], 0)

        # E within row via prefix-max (restricted donors exact for |o|>=|e|)
        p1 = np.maximum.accumulate(Hpre - jj * e1)
        E1r = np.full(n + 1, NEG, np.int64)
        E1r[1:] = p1[:-1] + o1 + (jj[1:] - 1) * e1
        p2 = np.maximum.accumulate(Hpre - jj * e2)
        E2r = np.full(n + 1, NEG, np.int64)
        E2r[1:] = p2[:-1] + o2 + (jj[1:] - 1) * e2

        Hrow = np.maximum(Hpre, np.maximum(E1r, E2r))
        H[i] = Hrow
        M[i] = Mrow
        F1[i] = F1p
        F2[i] = F2p
        E1s[i] = E1r
        E2s[i] = E2r

    # Free trailing graph overhang: end at any node with the whole sequence
    # consumed.
    end_rank = int(np.argmax(H[:, n]))
    score = int(H[end_rank, n])

    # Traceback.
    aln: List[Tuple[Optional[int], Optional[int]]] = []
    i, j = end_rank, n
    while j > 0 or (i > 0 and False):
        if i == 0:
            aln.append((None, j - 1))
            j -= 1
            continue
        v = order[i - 1]
        preds = list(g.in_edges[v].keys())
        pred_rows = [rank[p] + 1 for p in preds] if preds else [0]
        pred_rows_all = pred_rows if 0 in pred_rows else pred_rows + [0]
        h = H[i, j]
        if h == E1s[i, j] or h == E2s[i, j]:
            # gap consuming seq chars at this node position: walk left
            aln.append((None, j - 1))
            j -= 1
            continue
        if h == M[i, j]:
            s = m if seq_arr[j - 1] == g.base[v] else x
            took = False
            for pr in pred_rows_all:
                if H[pr, j - 1] + s == h:
                    aln.append((v, j - 1))
                    i, j = pr, j - 1
                    took = True
                    break
            if took:
                continue
        if h == F1[i, j] or h == F2[i, j]:
            took = False
            for pr in pred_rows:
                if max(F1[pr, j] + e1, H[pr, j] + o1) == h or \
                        max(F2[pr, j] + e2, H[pr, j] + o2) == h:
                    aln.append((v, None))
                    i = pr
                    took = True
                    break
            if took:
                continue
        if h == 0 and j == 0:
            break
        # started fresh at this node (free leading overhang) with j == 0
        if j == 0:
            break
        # numerical dead end: treat as fresh start
        break
    while j > 0:
        aln.append((None, j - 1))
        j -= 1
    aln.reverse()
    return score, aln


def _fuse(g: _Graph, seq: np.ndarray, aln) -> None:
    """Integrate an alignment into the graph (spoa-style node merging)."""
    prev = None
    for node, jpos in aln:
        if jpos is None:
            continue  # graph node skipped; no seq char consumed
        b = int(seq[jpos])
        if node is not None and g.base[node] == b:
            cur = node
        elif node is not None:
            # look for a ring partner with this base
            cur = None
            for r in g.ring[node]:
                if g.base[r] == b:
                    cur = r
                    break
            if cur is None:
                cur = g.new_node(b)
                ring = g.ring[node]
                ring.append(cur)
                g.ring[cur] = ring
        else:
            cur = g.new_node(b)
        g.support[cur] += 1
        if prev is not None:
            g.add_edge(prev, cur)
        prev = cur


def _consensus(g: _Graph) -> np.ndarray:
    """Heaviest-bundle walk (spoa's GenerateConsensus idea) with a
    length-bias correction: each edge contributes (2w - 1) so a
    single-support detour (two weight-1 edges, 1+1) can never tie the
    direct backbone edge (weight >= 2) it bypasses -- without the -1
    discount, 3-deep coverage ties its own error branches and the
    consensus drifts long."""
    order = g.topo_order()
    best = {v: (0, 0) for v in order}   # v -> (discounted_weight, support_sum)
    back = {v: None for v in order}
    for v in order:
        for p, w in g.in_edges[v].items():
            cand = (best[p][0] + 2 * w - 1, best[p][1] + g.support[p])
            if cand > best[v]:
                best[v] = cand
                back[v] = p
    if not order:
        return np.zeros(0, np.int8)
    # choose end node maximising total path weight then support
    end = max(order, key=lambda v: (best[v][0], g.support[v]))
    path = []
    v = end
    while v is not None:
        path.append(v)
        v = back[v]
    path.reverse()
    return np.array([g.base[v] for v in path], np.int8)


def _flatten_graph(g: _Graph, pmax: int):
    """Rank-space arrays for the device kernel (ops/poa_batch.py).

    Returns (order, bases_u8, preds_i32[V, pmax], npred_i32[V]) or None
    when some node's in-degree exceeds pmax (caller falls back to the
    native core for that alignment).
    """
    order = g.topo_order()
    rank = {v: i for i, v in enumerate(order)}
    V = len(order)
    bases = np.zeros(V, np.int32)
    preds = np.zeros((V, pmax), np.int32)
    npred = np.ones(V, np.int32)          # empty lists normalise to [0]
    for i, v in enumerate(order):
        bases[i] = g.base[v]
        ps = g.in_edges[v]
        if len(ps) > pmax:
            return None
        if ps:
            npred[i] = len(ps)
            for k, p in enumerate(ps):
                preds[i, k] = rank[p] + 1
    return order, bases, preds, npred


_POA_BUCKETS = (64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384)
_POA_PMAX = 8
# Ring depths of the gather-free kernel (poa_batch).  The ring kernel's
# per-row select tree costs 3*P*L*W elem-ops -- the dominant ALU term --
# so jobs route to the SMALLEST depth that covers their max back-edge
# (consensus graphs are near-linear: backbone rounds are L<=2, bubble
# rounds rarely exceed 4).  Depths below 4 are NOT offered: L=2 measured
# 7x SLOWER than L=16 (0.35 vs 2.59 G cells/s, flat in B -- the [B,L,W]
# ring degenerates below Mosaic's sublane tile; sweep in
# benchmarks/KERNEL_SOL.md round 5 cont.), while L=4 measured 4.24.
_POA_LOOKBACKS = (4, 8, 16)
_POA_LOOKBACK = _POA_LOOKBACKS[-1]   # ring overflow bound
# per-call device memory budget: B * (V+1) * (n+1) * ~14 B (H/F1/F2 i32 +
# case/pidx i8) must stay well under HBM
_POA_MEM_BUDGET = 1 << 30


def _poa_bucket(n):
    for b in _POA_BUCKETS:
        if n <= b:
            return b
    return n


def _poa_lb_bucket(lb):
    """Smallest ring depth covering back-edge span ``lb``; None when the
    job overflows every ring (general gather kernel)."""
    for L in _POA_LOOKBACKS:
        if lb <= L:
            return L
    return None


def _poa_p_bucket(pmax):
    """Predecessor-slot width for a job whose max in-degree is ``pmax``.
    The select tree / gathers scale with P, so low-in-degree rounds (the
    backbone-dominated majority) run at P=4: measured 5.27 vs 4.48
    G cells/s at L=4/B=1024.  P=2 measured 2.3x SLOWER (the same
    sub-4-sublane degeneracy as ring depth L=2) and is not offered."""
    return 4 if pmax <= 4 else _POA_PMAX


def poa_consensus_many(jobs: Sequence[Sequence], m: int = 10, x: int = -4,
                       o1: int = -8, e1: int = -2, o2: int = -24,
                       e2: int = -1, use_device: Optional[bool] = None):
    """A batch of independent ``poa(seqs)`` calls, byte-identical results.

    On the device path the per-job sequential fuse order is preserved, but
    alignment round k of every job runs as ONE batched device dispatch
    (ops/poa_batch.py), with graph fuse + consensus on host.  Jobs whose
    graph in-degree exceeds the kernel's predecessor budget fall back to
    the native core for that alignment only.

    use_device: None = auto (device on non-CPU backends or when
    CIRI_DEVICE_POA is truthy); False = sequential host/native path.
    """
    import os

    if use_device is None:
        flag = os.environ.get('CIRI_DEVICE_POA')
        if flag is not None:
            use_device = flag not in ('0', 'false', '')
        else:
            # RTT-gated like ops/sw_tb_batch.py::device_tb_enabled: the
            # per-cluster POA batches cannot amortise a tunnel round-trip
            try:
                from ciri_long_tpu.utils.dispatch import low_rtt_device_ready
                use_device = low_rtt_device_ready()
            except Exception:
                use_device = False
    if not use_device:
        return [poa(seqs, 2, False, m, x, o1, e1, o2, e2)[0]
                for seqs in jobs]

    from ciri_long_tpu.ops.poa_batch import max_lookback, poa_align_batch

    scores = (m, x, o1, e1, o2, e2)
    as_str = [bool(seqs) and isinstance(seqs[0], str) for seqs in jobs]
    queues = [[encode_seq(s) if isinstance(s, str) else np.asarray(s, np.int8)
               for s in seqs if len(s) > 0] for seqs in jobs]
    graphs: List[Optional[_Graph]] = [None] * len(jobs)
    cursor = [0] * len(jobs)

    # backbone init from each job's first sequence (poa() behaviour)
    for t, q in enumerate(queues):
        if not q:
            continue
        g = _Graph()
        prev = None
        for b in q[0]:
            cur = g.new_node(int(b))
            g.support[cur] += 1
            if prev is not None:
                g.add_edge(prev, cur)
            prev = cur
        graphs[t] = g
        cursor[t] = 1

    while True:
        pending = [t for t in range(len(jobs))
                   if graphs[t] is not None and cursor[t] < len(queues[t])]
        if not pending:
            break
        # flatten every pending graph; overflow -> native this round
        groups: dict = {}
        for t in pending:
            seq = queues[t][cursor[t]]
            flat = _flatten_graph(graphs[t], _POA_PMAX)
            if flat is None:
                _, aln = _align_to_graph(graphs[t], seq, m, x, o1, e1, o2, e2)
                _fuse(graphs[t], seq, aln)
                cursor[t] += 1
                continue
            order, bases, preds, npred = flat
            vb = _poa_bucket(len(order))
            nb = _poa_bucket(len(seq))
            # bounded-lookback jobs take the ring-buffer kernel (the
            # gather-free 30x path) at the smallest depth covering the
            # job's back edges (select-tree ALU scales with L);
            # consensus-graph bubbles are short, so overflow past
            # _POA_LOOKBACK into the general kernel is rare
            Lb = _poa_lb_bucket(max_lookback(preds, npred))
            Pb = _poa_p_bucket(int(npred.max(initial=1)))
            groups.setdefault((vb, nb, Lb, Pb), []).append(
                (t, order, bases, preds, npred, seq))

        for (vb, nb, Lb, Pb), items in groups.items():
            per_job = (vb + 1) * (nb + 1) * 14
            bmax = max(1, _POA_MEM_BUDGET // per_job)
            if Lb is not None:
                # the ring kernel's carried [B, L, W] windows must stay
                # VMEM-resident: measured 2.55 G cells/s at B=256/L=16
                # vs 1.58 at B=1024 (ring ~76 MB -> HBM streaming).
                # Per-depth caps are MEASURED, not derived: widening pays
                # only at L=4 (5.25 G at B=1024 vs 4.24 at 256) and hurts
                # at L=8 (3.11 at 512 vs 3.74 at 256) -- KERNEL_SOL.md.
                bmax = min(bmax, 1024 if Lb == 4 else 256)
            for lo in range(0, len(items), bmax):
                part = items[lo:lo + bmax]
                B = len(part)
                bases_a = np.zeros((B, vb), np.int32)
                nv_a = np.zeros(B, np.int32)
                preds_a = np.zeros((B, vb, Pb), np.int32)
                npred_a = np.ones((B, vb), np.int32)
                seqs_a = np.full((B, nb), 5, np.int32)
                ns_a = np.zeros(B, np.int32)
                for bi, (t, order, bases, preds, npred, seq) in enumerate(part):
                    V, n = len(order), len(seq)
                    bases_a[bi, :V] = bases
                    nv_a[bi] = V
                    # slots past the group's max in-degree are dead
                    # padding (npred masks them in-kernel): slice them off
                    preds_a[bi, :V] = preds[:, :Pb]
                    npred_a[bi, :V] = npred
                    seqs_a[bi, :n] = seq
                    ns_a[bi] = n
                _, aln_a, acnt_a = poa_align_batch(
                    bases_a, nv_a, preds_a, npred_a, seqs_a, ns_a, scores,
                    lookback=Lb)
                cap = aln_a.shape[1]
                for bi, (t, order, bases, preds, npred, seq) in enumerate(part):
                    pairs = aln_a[bi, cap - int(acnt_a[bi]):]
                    aln = [(order[r] if r >= 0 else None,
                            int(p) if p >= 0 else None) for r, p in pairs]
                    _fuse(graphs[t], seq, aln)
                    cursor[t] += 1

    out = []
    for t, g in enumerate(graphs):
        if g is None:
            # no non-empty sequence ever fused: match poa()'s empty result
            out.append("" if (not jobs[t] or as_str[t])
                       else np.zeros(0, np.int8))
            continue
        cons = _consensus(g)
        out.append(decode_seq(cons) if as_str[t] else cons)
    return out


def poa(seqs: Sequence, algorithm: int = 2, genmsa: bool = False,
        m: int = 10, x: int = -4, o1: int = -8, e1: int = -2,
        o2: int = -24, e2: int = -1):
    """pyspoa-compatible entry point: returns (consensus, msa_or_None).

    ``seqs`` may be ASCII strings or int8 code arrays; the consensus is
    returned in the same representation as the inputs.
    """
    if len(seqs) == 0:
        return ("", None) if not seqs or isinstance(seqs, list) else (np.zeros(0, np.int8), None)
    as_str = isinstance(seqs[0], str)
    codes = [encode_seq(s) if isinstance(s, str) else np.asarray(s, np.int8)
             for s in seqs]

    import os
    try:
        from ciri_long_tpu import _poacore
        poa_all = _poacore.poa_all
    except ImportError:
        poa_all = None
    if poa_all is not None and \
            os.environ.get('CIRI_NATIVE_POA', '1') not in ('0', 'false', ''):
        # full-native pipeline (graph build + fuse + consensus), a twin of
        # the Python graph path; parity fuzz: tests/test_poa_native.py
        lens = np.array([len(c) for c in codes], np.int32)
        concat = (np.concatenate([np.ascontiguousarray(c, np.uint8)
                                  for c in codes if len(c)])
                  if lens.sum() else np.zeros(0, np.uint8))
        buf = poa_all(concat.tobytes(), lens.tobytes(),
                      m, x, o1, e1, o2, e2)
        cons = np.frombuffer(buf, np.uint8).astype(np.int8)
    else:
        cons = _poa_python(codes, m, x, o1, e1, o2, e2)
    out = decode_seq(cons) if as_str else cons
    return out, None


def _poa_python(codes, m, x, o1, e1, o2, e2):
    """The host-graph poa() path (kept as the parity oracle for poa_all and
    as the fallback when the extension is unavailable)."""
    g = _Graph()
    for seq in codes:
        if len(seq) == 0:
            continue
        if not g.base:
            prev = None
            for b in seq:
                cur = g.new_node(int(b))
                g.support[cur] += 1
                if prev is not None:
                    g.add_edge(prev, cur)
                prev = cur
            continue
        _, aln = _align_to_graph(g, seq, m, x, o1, e1, o2, e2)
        _fuse(g, seq, aln)
    return _consensus(g)
