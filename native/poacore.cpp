// _poacore: native POA (partial-order alignment) cores.
//
// Two entry points:
//   align_graph(...)  -- the DP + traceback behind ops/poa.py::
//                        _align_to_graph (the spoa role, reference
//                        collapse.py:267,504).
//   poa_all(...)      -- the WHOLE poa() pipeline (graph backbone, per-
//                        sequence align + fuse with ring merging, heaviest-
//                        bundle consensus) in one call, byte-identical to
//                        the Python graph code in ops/poa.py.
//
// Semantics mirror the numpy implementation exactly -- same two-piece
// ("convex") affine gap model, same free-overhang (kOV) boundary rules,
// same tie order in traceback, same dict-insertion-order edge iteration,
// same LIFO topological order -- so the Python wrapper can fall back
// transparently and parity fuzz tests can compare paths.
//
// Graph rows are visited in topological order (rank space).  For
// align_graph the caller flattens the predecessor lists (rank+1 row
// indices, dict insertion order preserved) into offsets[V+1] / preds[] so
// no Python objects cross the boundary; poa_all keeps the graph native.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <utility>
#include <vector>

namespace {

constexpr int32_t kNeg = -(1 << 28);

struct Workspace {
  std::vector<int32_t> H, M, F1, F2, E1, E2;
  std::vector<int32_t> Hpre, Mrow, F1p, F2p;
};

// DP + traceback in rank space.  offs/preds use rank+1 row indices (row 0
// is the virtual source).  Appends (rank|-1, pos|-1) pairs in FORWARD
// alignment order to `aln`; returns the score.
int32_t AlignCore(const uint8_t* bases, const int32_t* offs,
                  const int32_t* preds, int64_t V, const uint8_t* seq,
                  int64_t n, int m, int x, int o1, int e1, int o2, int e2,
                  Workspace& ws, std::vector<int32_t>& aln) {
  const int64_t W = n + 1;
  auto& H = ws.H;
  auto& M = ws.M;
  auto& F1 = ws.F1;
  auto& F2 = ws.F2;
  auto& E1 = ws.E1;
  auto& E2 = ws.E2;
  // Rows 1..V are fully written in topological order before any read, so
  // only row 0 needs initialising -- a full-matrix fill would double the
  // memory traffic of the whole DP.
  const size_t cells = static_cast<size_t>((V + 1) * W);
  if (H.size() < cells) {
    H.resize(cells);
    M.resize(cells);
    F1.resize(cells);
    F2.resize(cells);
    E1.resize(cells);
    E2.resize(cells);
  }
  std::fill(M.begin(), M.begin() + W, kNeg);
  std::fill(F1.begin(), F1.begin() + W, kNeg);
  std::fill(F2.begin(), F2.begin() + W, kNeg);
  std::fill(E1.begin(), E1.begin() + W, kNeg);
  std::fill(E2.begin(), E2.begin() + W, kNeg);

  // Row 0 = virtual source: consume a seq prefix as one two-piece gap.
  H[0] = 0;
  for (int64_t j = 1; j <= n; ++j) {
    H[j] = std::max(o1 + static_cast<int32_t>(j - 1) * e1,
                    o2 + static_cast<int32_t>(j - 1) * e2);
  }

  auto& Hpre = ws.Hpre;
  auto& Mrow = ws.Mrow;
  auto& F1p = ws.F1p;
  auto& F2p = ws.F2p;
  Hpre.resize(W);
  Mrow.resize(W);
  F1p.resize(W);
  F2p.resize(W);
  for (int64_t i = 1; i <= V; ++i) {
    const uint8_t base = bases[i - 1];
    const int32_t* p0 = &preds[offs[i - 1]];
    const int64_t np = offs[i] - offs[i - 1];

    // F over real preds only (source stands in when there are none).
    // Per-predecessor row pointers keep the inner loops unit-stride and
    // compiler-vectorizable; max over preds distributes over the +e/+o
    // forms, so values equal the fused per-cell reduction exactly.
    {
      const int64_t pr = (np == 0) ? 0 : p0[0];
      const int32_t* F1r = &F1[pr * W];
      const int32_t* F2r = &F2[pr * W];
      const int32_t* Hr = &H[pr * W];
      for (int64_t j = 0; j <= n; ++j) {
        F1p[j] = std::max(F1r[j] + e1, Hr[j] + o1);
        F2p[j] = std::max(F2r[j] + e2, Hr[j] + o2);
      }
      for (int64_t k = 1; k < np; ++k) {
        const int32_t* F1k = &F1[p0[k] * W];
        const int32_t* F2k = &F2[p0[k] * W];
        const int32_t* Hk = &H[p0[k] * W];
        for (int64_t j = 0; j <= n; ++j) {
          F1p[j] = std::max(F1p[j], std::max(F1k[j] + e1, Hk[j] + o1));
          F2p[j] = std::max(F2p[j], std::max(F2k[j] + e2, Hk[j] + o2));
        }
      }
    }

    // M over preds + source.
    {
      Mrow[0] = kNeg;
      const int32_t* Hs = &H[0];  // source row
      for (int64_t j = 1; j <= n; ++j) Mrow[j] = Hs[j - 1];
      for (int64_t k = 0; k < np; ++k) {
        const int32_t* Hk = &H[p0[k] * W];
        for (int64_t j = 1; j <= n; ++j) {
          Mrow[j] = std::max(Mrow[j], Hk[j - 1]);
        }
      }
      for (int64_t j = 1; j <= n; ++j) {
        Mrow[j] += (seq[j - 1] == base) ? m : x;
      }
    }

    for (int64_t j = 0; j <= n; ++j) {
      Hpre[j] = std::max(Mrow[j], std::max(F1p[j], F2p[j]));
    }
    if (Hpre[0] < 0) Hpre[0] = 0;  // free leading graph overhang

    // E within row via running prefix max (exact for |o| >= |e|).
    int32_t* Hi = &H[i * W];
    int32_t* E1i = &E1[i * W];
    int32_t* E2i = &E2[i * W];
    int32_t p1 = Hpre[0], p2 = Hpre[0];
    Hi[0] = Hpre[0];
    E1i[0] = kNeg;  // never read (traceback stops at j == 0), kept defined
    E2i[0] = kNeg;
    for (int64_t j = 1; j <= n; ++j) {
      E1i[j] = p1 + o1;
      E2i[j] = p2 + o2;
      const int32_t h = std::max(Hpre[j], std::max(E1i[j], E2i[j]));
      Hi[j] = h;
      p1 = std::max(p1 + e1, Hpre[j]);
      p2 = std::max(p2 + e2, Hpre[j]);
    }
    std::memcpy(&M[i * W], Mrow.data(), W * sizeof(int32_t));
    std::memcpy(&F1[i * W], F1p.data(), W * sizeof(int32_t));
    std::memcpy(&F2[i * W], F2p.data(), W * sizeof(int32_t));
  }

  // Free trailing overhang: best H[., n].
  int64_t end_rank = 0;
  for (int64_t i = 0; i <= V; ++i) {
    if (H[i * W + n] > H[end_rank * W + n]) end_rank = i;
  }
  const int32_t score = H[end_rank * W + n];

  // Traceback (same branch order as the numpy version); pairs pushed in
  // reverse, flipped to forward order before returning.
  const size_t aln0 = aln.size();
  int64_t i = end_rank, j = n;
  while (j > 0) {
    if (i == 0) {
      aln.push_back(-1);
      aln.push_back(static_cast<int32_t>(j - 1));
      --j;
      continue;
    }
    const int32_t* p0 = &preds[offs[i - 1]];
    const int64_t np = offs[i] - offs[i - 1];
    const int32_t h = H[i * W + j];
    if (h == E1[i * W + j] || h == E2[i * W + j]) {
      aln.push_back(-1);
      aln.push_back(static_cast<int32_t>(j - 1));
      --j;
      continue;
    }
    if (h == M[i * W + j]) {
      const int32_t s = (seq[j - 1] == bases[i - 1]) ? m : x;
      bool took = false;
      // preds in caller order, then the source row.
      for (int64_t k = 0; k <= np && !took; ++k) {
        const int64_t pr = (np == 0) ? 0 : (k < np ? p0[k] : 0);
        if (H[pr * W + j - 1] + s == h) {
          aln.push_back(static_cast<int32_t>(i - 1));
          aln.push_back(static_cast<int32_t>(j - 1));
          i = pr;
          --j;
          took = true;
        }
        if (np == 0 && k == 0) break;  // sole source row already tried
      }
      if (took) continue;
    }
    if (h == F1[i * W + j] || h == F2[i * W + j]) {
      bool took = false;
      const int64_t nreal = (np == 0) ? 1 : np;
      for (int64_t k = 0; k < nreal && !took; ++k) {
        const int64_t pr = (np == 0) ? 0 : p0[k];
        if (std::max(F1[pr * W + j] + e1, H[pr * W + j] + o1) == h ||
            std::max(F2[pr * W + j] + e2, H[pr * W + j] + o2) == h) {
          aln.push_back(static_cast<int32_t>(i - 1));
          aln.push_back(-1);
          i = pr;
          took = true;
        }
      }
      if (took) continue;
    }
    break;  // fresh start / numerical dead end, matching the fallback
  }
  while (j > 0) {
    aln.push_back(-1);
    aln.push_back(static_cast<int32_t>(j - 1));
    --j;
  }
  // pairs were pushed (rank, pos) in reverse alignment order; reverse by
  // pair within the appended region.
  std::reverse(aln.begin() + aln0, aln.end());
  for (size_t k = aln0; k + 1 < aln.size(); k += 2) {
    std::swap(aln[k], aln[k + 1]);
  }
  return score;
}

PyObject* py_align_graph(PyObject*, PyObject* args) {
  Py_buffer bases_b, offs_b, preds_b, seq_b;
  int m, x, o1, e1, o2, e2;
  if (!PyArg_ParseTuple(args, "y*y*y*y*iiiiii", &bases_b, &offs_b, &preds_b,
                        &seq_b, &m, &x, &o1, &e1, &o2, &e2)) {
    return nullptr;
  }
  const uint8_t* bases = static_cast<const uint8_t*>(bases_b.buf);
  const int32_t* offs = static_cast<const int32_t*>(offs_b.buf);
  const int32_t* preds = static_cast<const int32_t*>(preds_b.buf);
  const uint8_t* seq = static_cast<const uint8_t*>(seq_b.buf);
  const int64_t V = bases_b.len;
  const int64_t n = seq_b.len;

  std::vector<int32_t> aln;
  int32_t score = 0;
  Py_BEGIN_ALLOW_THREADS {
    Workspace ws;
    score = AlignCore(bases, offs, preds, V, seq, n, m, x, o1, e1, o2, e2,
                      ws, aln);
  }
  Py_END_ALLOW_THREADS

  PyBuffer_Release(&bases_b);
  PyBuffer_Release(&offs_b);
  PyBuffer_Release(&preds_b);
  PyBuffer_Release(&seq_b);
  return Py_BuildValue(
      "(iy#)", (int)score, reinterpret_cast<const char*>(aln.data()),
      (Py_ssize_t)(aln.size() * sizeof(int32_t)));
}

// ---------------------------------------------------------------------------
// Full-native POA pipeline (ops/poa.py::poa twin).

// Mirrors ops/poa.py::_Graph.  Edge lists keep INSERTION order (the Python
// dicts' iteration order) because alignment tie-breaking and the consensus
// walk depend on it.  `rings` mirror the shared Python column lists: every
// node in an alignment ring shares one member list.
struct Graph {
  std::vector<uint8_t> base;
  std::vector<int32_t> ring_id;
  std::vector<std::vector<int32_t>> rings;
  std::vector<std::vector<std::pair<int32_t, int32_t>>> in_e, out_e;
  std::vector<int32_t> support;

  int32_t new_node(uint8_t b) {
    const int32_t v = static_cast<int32_t>(base.size());
    base.push_back(b);
    ring_id.push_back(static_cast<int32_t>(rings.size()));
    rings.push_back({v});
    in_e.emplace_back();
    out_e.emplace_back();
    support.push_back(0);
    return v;
  }

  void add_edge(int32_t p, int32_t v) {
    bool found = false;
    for (auto& kv : in_e[v]) {
      if (kv.first == p) {
        ++kv.second;
        found = true;
        break;
      }
    }
    if (!found) in_e[v].push_back({p, 1});
    found = false;
    for (auto& kv : out_e[p]) {
      if (kv.first == v) {
        ++kv.second;
        found = true;
        break;
      }
    }
    if (!found) out_e[p].push_back({v, 1});
  }

  // Python topo_order: stack seeded with zero-indegree ids sorted
  // ascending, list.pop() = LIFO, successors pushed in out-edge insertion
  // order.
  void topo(std::vector<int32_t>& order) const {
    const int64_t nn = static_cast<int64_t>(base.size());
    std::vector<int32_t> indeg(nn);
    for (int64_t v = 0; v < nn; ++v) {
      indeg[v] = static_cast<int32_t>(in_e[v].size());
    }
    std::vector<int32_t> stack;
    for (int64_t v = 0; v < nn; ++v) {
      if (indeg[v] == 0) stack.push_back(static_cast<int32_t>(v));
    }
    order.clear();
    order.reserve(nn);
    while (!stack.empty()) {
      const int32_t v = stack.back();
      stack.pop_back();
      order.push_back(v);
      for (const auto& kv : out_e[v]) {
        if (--indeg[kv.first] == 0) stack.push_back(kv.first);
      }
    }
  }
};

// poa_all(seqs_concat_u8, lens_i32, m, x, o1, e1, o2, e2) -> consensus
// bytes (int8 codes).  Twin of ops/poa.py::poa over code arrays.
PyObject* py_poa_all(PyObject*, PyObject* args) {
  Py_buffer seqs_b, lens_b;
  int m, x, o1, e1, o2, e2;
  if (!PyArg_ParseTuple(args, "y*y*iiiiii", &seqs_b, &lens_b, &m, &x, &o1,
                        &e1, &o2, &e2)) {
    return nullptr;
  }
  const uint8_t* seqs = static_cast<const uint8_t*>(seqs_b.buf);
  const int32_t* lens = static_cast<const int32_t*>(lens_b.buf);
  const int64_t nseq = lens_b.len / static_cast<int64_t>(sizeof(int32_t));

  std::vector<uint8_t> cons;
  Py_BEGIN_ALLOW_THREADS {
    Graph g;
    Workspace ws;
    std::vector<int32_t> order, rank, offs, preds, aln;
    std::vector<uint8_t> bases_r;
    int64_t off = 0;
    for (int64_t si = 0; si < nseq; ++si) {
      const uint8_t* seq = seqs + off;
      const int64_t n = lens[si];
      off += n;
      if (n == 0) continue;
      if (g.base.empty()) {
        // backbone from the first non-empty sequence
        int32_t prev = -1;
        for (int64_t t = 0; t < n; ++t) {
          const int32_t cur = g.new_node(seq[t]);
          ++g.support[cur];
          if (prev >= 0) g.add_edge(prev, cur);
          prev = cur;
        }
        continue;
      }
      // flatten to rank space (insertion-order preds, rank+1 indices)
      g.topo(order);
      const int64_t V = static_cast<int64_t>(order.size());
      rank.assign(g.base.size(), 0);
      for (int64_t i = 0; i < V; ++i) rank[order[i]] = static_cast<int32_t>(i);
      bases_r.resize(V);
      offs.assign(V + 1, 0);
      preds.clear();
      for (int64_t i = 0; i < V; ++i) {
        const int32_t v = order[i];
        bases_r[i] = g.base[v];
        for (const auto& kv : g.in_e[v]) {
          preds.push_back(rank[kv.first] + 1);
        }
        offs[i + 1] = static_cast<int32_t>(preds.size());
      }
      aln.clear();
      AlignCore(bases_r.data(), offs.data(), preds.data(), V, seq, n, m, x,
                o1, e1, o2, e2, ws, aln);
      // fuse (ops/poa.py::_fuse): ring-merge matched columns
      int32_t prev = -1;
      for (size_t k = 0; k + 1 < aln.size(); k += 2) {
        const int32_t r = aln[k];
        const int32_t jp = aln[k + 1];
        if (jp < 0) continue;  // graph node skipped, no seq char
        const uint8_t b = seq[jp];
        const int32_t node = (r >= 0) ? order[r] : -1;
        int32_t cur;
        if (node >= 0 && g.base[node] == b) {
          cur = node;
        } else if (node >= 0) {
          cur = -1;
          for (const int32_t r2 : g.rings[g.ring_id[node]]) {
            if (g.base[r2] == b) {
              cur = r2;
              break;
            }
          }
          if (cur < 0) {
            cur = g.new_node(b);
            g.rings[g.ring_id[node]].push_back(cur);
            g.ring_id[cur] = g.ring_id[node];
          }
        } else {
          cur = g.new_node(b);
        }
        ++g.support[cur];
        if (prev >= 0) g.add_edge(prev, cur);
        prev = cur;
      }
    }

    // consensus (ops/poa.py::_consensus): heaviest-bundle walk with the
    // (2w - 1) length-bias discount; ties by accumulated support, end node
    // = first maximum in topological order.
    if (!g.base.empty()) {
      g.topo(order);
      std::vector<std::pair<int64_t, int64_t>> best(g.base.size(), {0, 0});
      std::vector<int32_t> back(g.base.size(), -1);
      for (const int32_t v : order) {
        for (const auto& kv : g.in_e[v]) {
          const int32_t p = kv.first;
          const std::pair<int64_t, int64_t> cand{
              best[p].first + 2 * static_cast<int64_t>(kv.second) - 1,
              best[p].second + g.support[p]};
          if (cand > best[v]) {
            best[v] = cand;
            back[v] = p;
          }
        }
      }
      int32_t end = -1;
      std::pair<int64_t, int64_t> bk{INT64_MIN, INT64_MIN};
      for (const int32_t v : order) {
        const std::pair<int64_t, int64_t> key{
            best[v].first, static_cast<int64_t>(g.support[v])};
        if (key > bk) {
          bk = key;
          end = v;
        }
      }
      std::vector<uint8_t> rev;
      for (int32_t v = end; v >= 0; v = back[v]) rev.push_back(g.base[v]);
      cons.assign(rev.rbegin(), rev.rend());
    }
  }
  Py_END_ALLOW_THREADS

  PyBuffer_Release(&seqs_b);
  PyBuffer_Release(&lens_b);
  static const char kEmpty[] = "";
  const char* data =
      cons.empty() ? kEmpty : reinterpret_cast<const char*>(cons.data());
  return Py_BuildValue("y#", data, (Py_ssize_t)cons.size());
}

PyMethodDef kMethods[] = {
    {"align_graph", py_align_graph, METH_VARARGS,
     "align_graph(bases, pred_offsets_i32, preds_i32, seq, m, x, o1, e1, "
     "o2, e2) -> (score, aln_rank_pos_i32_pairs)"},
    {"poa_all", py_poa_all, METH_VARARGS,
     "poa_all(seqs_concat_u8, lens_i32, m, x, o1, e1, o2, e2) -> consensus "
     "codes (bytes)"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "_poacore",
    "Native POA sequence-to-graph alignment core", -1, kMethods,
};

}  // namespace

PyMODINIT_FUNC PyInit__poacore() { return PyModule_Create(&kModule); }
