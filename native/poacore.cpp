// _poacore: native sequence-to-graph alignment for POA consensus.
//
// The DP + traceback behind ops/poa.py::_align_to_graph (the spoa role,
// collapse.py:267,504 in the reference).  Semantics mirror the numpy
// implementation exactly -- same two-piece ("convex") affine gap model,
// same free-overhang (kOV) boundary rules, same tie order in traceback --
// so the Python wrapper can fall back transparently.
//
// Graph rows are visited in topological order (rank space).  The caller
// flattens the predecessor lists (rank+1 row indices, dict insertion
// order preserved) into offsets[V+1] / preds[] so no Python objects cross
// the boundary.
//
// Returns (score, aln_int32_pairs): pairs of (node_rank | -1, seqpos | -1)
// in alignment order; rank -1 = seq char unaligned (gap in graph), pos -1
// = graph node skipped by a deletion.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int32_t kNeg = -(1 << 28);

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
  const int64_t W = n + 1;

  std::vector<int32_t> H, M, F1, F2, E1, E2;
  std::vector<int32_t> aln;  // flattened (rank, pos) pairs, reversed
  int32_t score = 0;

  Py_BEGIN_ALLOW_THREADS
  H.assign((V + 1) * W, kNeg);
  M.assign((V + 1) * W, kNeg);
  F1.assign((V + 1) * W, kNeg);
  F2.assign((V + 1) * W, kNeg);
  E1.assign((V + 1) * W, kNeg);
  E2.assign((V + 1) * W, kNeg);

  // Row 0 = virtual source: consume a seq prefix as one two-piece gap.
  H[0] = 0;
  for (int64_t j = 1; j <= n; ++j) {
    H[j] = std::max(o1 + static_cast<int32_t>(j - 1) * e1,
                    o2 + static_cast<int32_t>(j - 1) * e2);
  }

  std::vector<int32_t> Hpre(W), Mrow(W), F1p(W), F2p(W);
  for (int64_t i = 1; i <= V; ++i) {
    const uint8_t base = bases[i - 1];
    const int32_t* p0 = &preds[offs[i - 1]];
    const int64_t np = offs[i] - offs[i - 1];

    // F over real preds only (source stands in when there are none).
    for (int64_t j = 0; j <= n; ++j) {
      int32_t f1 = kNeg, f2 = kNeg, hmax = kNeg;
      if (np == 0) {
        f1 = F1[j];
        f2 = F2[j];
        hmax = H[j];
      } else {
        for (int64_t k = 0; k < np; ++k) {
          const int64_t pr = p0[k];
          f1 = std::max(f1, F1[pr * W + j]);
          f2 = std::max(f2, F2[pr * W + j]);
          hmax = std::max(hmax, H[pr * W + j]);
        }
      }
      F1p[j] = std::max(f1 + e1, hmax + o1);
      F2p[j] = std::max(f2 + e2, hmax + o2);
    }

    // M over preds + source.
    Mrow[0] = kNeg;
    for (int64_t j = 1; j <= n; ++j) {
      const int32_t s = (seq[j - 1] == base) ? m : x;
      int32_t hp = H[j - 1];  // source row
      for (int64_t k = 0; k < np; ++k) {
        hp = std::max(hp, H[p0[k] * W + j - 1]);
      }
      Mrow[j] = hp + s;
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
    for (int64_t j = 1; j <= n; ++j) {
      E1i[j] = p1 + o1;
      E2i[j] = p2 + o2;
      const int32_t h =
          std::max(Hpre[j], std::max(E1i[j], E2i[j]));
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
  score = H[end_rank * W + n];

  // Traceback (same branch order as the numpy version).
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
        const int64_t pr =
            (np == 0) ? 0 : (k < np ? p0[k] : 0);
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
  // pair.
  std::reverse(aln.begin(), aln.end());
  for (size_t k = 0; k + 1 < aln.size(); k += 2) {
    std::swap(aln[k], aln[k + 1]);
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

PyMethodDef kMethods[] = {
    {"align_graph", py_align_graph, METH_VARARGS,
     "align_graph(bases, pred_offsets_i32, preds_i32, seq, m, x, o1, e1, "
     "o2, e2) -> (score, aln_rank_pos_i32_pairs)"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "_poacore",
    "Native POA sequence-to-graph alignment core", -1, kMethods,
};

}  // namespace

PyMODINIT_FUNC PyInit__poacore() { return PyModule_Create(&kModule); }
