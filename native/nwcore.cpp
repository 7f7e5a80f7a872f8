// _nwcore: native banded global alignment with traceback.
//
// The host-side pairwise workhorse behind ops/traceback.py: unit-vs-
// representative consensus alignment (CCS stage), inter-anchor stitching
// and the splice flank matrices all reduce to small global affine-gap
// alignments.  The numpy row-vectorised DP pays ~20 us of interpreter
// overhead per row; this core runs the sheared-band DP at C++ speed.
//
// Semantics mirror ops/traceback.py::_banded_nw / _nw_full_vec exactly:
//   - scores: match / -mismatch over codes 0..3, N (4) scores 0,
//     PAD (5) poisons; gap of length L costs open + (L-1)*extend
//   - global alignment of ALL of q to ALL of r
//   - returns None (Py_None) when the band cannot connect the corners,
//     so the Python wrapper can double the band and retry.
//
// Cigar ops: 0=M 1=I (consumes q) 2=D (consumes r), encoded as
// uint32 (length << 4 | op).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <memory>
#include <vector>

namespace {

constexpr int32_t kNeg = -(1 << 28);

inline int32_t cell_score(uint8_t a, uint8_t b, int32_t match,
                          int32_t mismatch) {
  if (a >= 5 || b >= 5) return kNeg;
  if (a == 4 || b == 4) return 0;
  return a == b ? match : -mismatch;
}

// Sheared band: for row i, valid columns j in [lo(i), hi(i)] with
// |j - i*m/n| bounded; we use the simple |j - i| <= band + |n - m| window
// around the main diagonal, matching the numpy fallback's reachability.
PyObject* py_nw_banded(PyObject*, PyObject* args) {
  Py_buffer qb, rb;
  int band;
  int match, mismatch, gap_open, gap_extend;
  if (!PyArg_ParseTuple(args, "y*y*iiiii", &qb, &rb, &band, &match,
                        &mismatch, &gap_open, &gap_extend)) {
    return nullptr;
  }
  const uint8_t* q = static_cast<const uint8_t*>(qb.buf);
  const uint8_t* r = static_cast<const uint8_t*>(rb.buf);
  const int64_t n = qb.len;
  const int64_t m = rb.len;

  // band measured around the shifted diagonal (handles n != m)
  const int64_t lo_off = std::min<int64_t>(0, m - n) - band;
  const int64_t hi_off = std::max<int64_t>(0, m - n) + band;
  const int64_t W = hi_off - lo_off + 1;

  std::vector<int32_t> H, E, F;
  bool feasible = true;
  Py_BEGIN_ALLOW_THREADS
  H.assign((n + 1) * W, kNeg);
  E.assign((n + 1) * W, kNeg);
  F.assign((n + 1) * W, kNeg);
  auto T = [&](int64_t i, int64_t j) { return i * W + (j - i - lo_off); };
  auto in_band = [&](int64_t i, int64_t j) {
    return j >= 0 && j <= m && (j - i) >= lo_off && (j - i) <= hi_off;
  };

  H[T(0, 0)] = 0;
  for (int64_t j = 1; j <= m && in_band(0, j); ++j) {
    H[T(0, j)] = -gap_open - static_cast<int32_t>(j - 1) * gap_extend;
    E[T(0, j)] = H[T(0, j)];
  }
  for (int64_t i = 1; i <= n; ++i) {
    const int64_t jlo = std::max<int64_t>(0, i + lo_off);
    const int64_t jhi = std::min<int64_t>(m, i + hi_off);
    if (jlo > jhi) { feasible = false; break; }
    if (jlo == 0) {
      H[T(i, 0)] = -gap_open - static_cast<int32_t>(i - 1) * gap_extend;
      F[T(i, 0)] = H[T(i, 0)];
    }
    for (int64_t j = std::max<int64_t>(1, jlo); j <= jhi; ++j) {
      const int32_t hl = in_band(i, j - 1) ? H[T(i, j - 1)] : kNeg;
      const int32_t el = in_band(i, j - 1) ? E[T(i, j - 1)] : kNeg;
      const int32_t hu = in_band(i - 1, j) ? H[T(i - 1, j)] : kNeg;
      const int32_t fu = in_band(i - 1, j) ? F[T(i - 1, j)] : kNeg;
      const int32_t hd = in_band(i - 1, j - 1) ? H[T(i - 1, j - 1)] : kNeg;
      const int32_t e = std::max(el - gap_extend, hl - gap_open);
      const int32_t f = std::max(fu - gap_extend, hu - gap_open);
      const int32_t d = hd + cell_score(q[i - 1], r[j - 1], match, mismatch);
      E[T(i, j)] = e;
      F[T(i, j)] = f;
      H[T(i, j)] = std::max(d, std::max(e, f));
    }
  }
  Py_END_ALLOW_THREADS

  auto T2 = [&](int64_t i, int64_t j) { return i * W + (j - i - lo_off); };
  auto in_band2 = [&](int64_t i, int64_t j) {
    return j >= 0 && j <= m && (j - i) >= lo_off && (j - i) <= hi_off;
  };

  if (!feasible || !in_band2(n, m) || H[T2(n, m)] <= kNeg / 2) {
    PyBuffer_Release(&qb);
    PyBuffer_Release(&rb);
    Py_RETURN_NONE;
  }
  const int32_t score = H[T2(n, m)];

  // traceback (same 3-state machine as the numpy fallback)
  std::vector<uint32_t> ops;
  auto push = [&](uint32_t op) {
    if (!ops.empty() && (ops.back() & 0xfu) == op) {
      ops.back() += 1u << 4;
    } else {
      ops.push_back((1u << 4) | op);
    }
  };
  int64_t i = n, j = m;
  int state = 0;  // 0=H 1=E 2=F
  while (i > 0 || j > 0) {
    if (state == 0) {
      if (j > 0 && in_band2(i, j) && H[T2(i, j)] == E[T2(i, j)]) {
        state = 1;
      } else if (i > 0 && in_band2(i, j) && H[T2(i, j)] == F[T2(i, j)]) {
        state = 2;
      } else if (i > 0 && j > 0) {
        push(0); --i; --j;
      } else if (j > 0) {
        push(2); --j;
      } else {
        push(1); --i;
      }
    } else if (state == 1) {
      push(2);
      const bool stay = j > 1 && in_band2(i, j - 1) &&
          E[T2(i, j)] == E[T2(i, j - 1)] - gap_extend;
      --j;
      if (!stay) state = 0;
    } else {
      push(1);
      const bool stay = i > 1 && in_band2(i - 1, j) &&
          F[T2(i, j)] == F[T2(i - 1, j)] - gap_extend;
      --i;
      if (!stay) state = 0;
    }
  }
  std::reverse(ops.begin(), ops.end());

  PyObject* cig = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(ops.data()),
      static_cast<Py_ssize_t>(ops.size() * sizeof(uint32_t)));
  PyBuffer_Release(&qb);
  PyBuffer_Release(&rb);
  if (cig == nullptr) return nullptr;
  PyObject* out = Py_BuildValue("(iN)", score, cig);
  return out;
}

// Extension alignment anchored at (0,0) with z-drop; returns
// (best, q_used, r_used, cigar) -- the C++ twin of
// ops/traceback.py::extend_align (same tie/state semantics).
//
// Banded: row i computes columns [max(1, i-W), min(m, i+drift+W)] with
// drift = max(0, m-n) and W = kExtBand; kNeg sentinels one cell outside
// each band edge stand in for the uncomputed region, so no full-matrix
// initialisation is needed (the memset used to cost as much as the DP).
// Exact whenever the optimal path drifts < W off the main diagonal --
// always true for the clip re-alignments this serves (<=10% indel noise
// over <=~1 kb clips).
constexpr int64_t kExtBand = 128;

PyObject* py_extend(PyObject*, PyObject* args) {
  Py_buffer qb, rb;
  int match, mismatch, gap_open, gap_extend, zdrop;
  if (!PyArg_ParseTuple(args, "y*y*iiiii", &qb, &rb, &match, &mismatch,
                        &gap_open, &gap_extend, &zdrop)) {
    return nullptr;
  }
  const uint8_t* q = static_cast<const uint8_t*>(qb.buf);
  const uint8_t* r = static_cast<const uint8_t*>(rb.buf);
  const int64_t n = qb.len;
  const int64_t m = rb.len;

  const int64_t Wm = m + 1;
  std::unique_ptr<int32_t[]> Hb(new int32_t[(n + 1) * Wm]);
  std::unique_ptr<int32_t[]> Eb(new int32_t[(n + 1) * Wm]);
  std::unique_ptr<int32_t[]> Fb(new int32_t[(n + 1) * Wm]);
  int32_t* H = Hb.get();
  int32_t* E = Eb.get();
  int32_t* F = Fb.get();
  int32_t best = 0;
  int64_t bi = 0, bj = 0;
  int64_t last_row = 0;
  Py_BEGIN_ALLOW_THREADS
  const int64_t drift = std::max<int64_t>(0, m - n);
  auto hi_of = [&](int64_t i) { return std::min(m, i + drift + kExtBand); };

  const int64_t hi0 = hi_of(0);
  H[0] = 0;
  E[0] = kNeg;
  F[0] = kNeg;
  for (int64_t j = 1; j <= hi0; ++j) {
    H[j] = -gap_open - static_cast<int32_t>(j - 1) * gap_extend;
    E[j] = H[j];
    F[j] = kNeg;
  }
  if (hi0 < m) {
    H[hi0 + 1] = kNeg;
    E[hi0 + 1] = kNeg;
    F[hi0 + 1] = kNeg;
  }
  for (int64_t i = 1; i <= n; ++i) {
    const int64_t lo = std::max<int64_t>(1, i - kExtBand);
    const int64_t hi = hi_of(i);
    int32_t* Hi = &H[i * Wm];
    int32_t* Ei = &E[i * Wm];
    int32_t* Fi = &F[i * Wm];
    const int32_t* Hp = &H[(i - 1) * Wm];
    const int32_t* Fp = &F[(i - 1) * Wm];
    int32_t row_best;
    if (lo == 1) {
      Hi[0] = -gap_open - static_cast<int32_t>(i - 1) * gap_extend;
      Fi[0] = Hi[0];
      Ei[0] = kNeg;
      row_best = Hi[0];
    } else {
      Hi[lo - 1] = kNeg;
      Ei[lo - 1] = kNeg;
      Fi[lo - 1] = kNeg;
      row_best = kNeg;
    }
    for (int64_t j = lo; j <= hi; ++j) {
      const int32_t e = std::max(Ei[j - 1] - gap_extend, Hi[j - 1] - gap_open);
      const int32_t f = std::max(Fp[j] - gap_extend, Hp[j] - gap_open);
      const int32_t d =
          Hp[j - 1] + cell_score(q[i - 1], r[j - 1], match, mismatch);
      Ei[j] = e;
      Fi[j] = f;
      Hi[j] = std::max(d, std::max(e, f));
      if (Hi[j] > row_best) row_best = Hi[j];
    }
    if (hi < m) {
      Hi[hi + 1] = kNeg;
      Ei[hi + 1] = kNeg;
      Fi[hi + 1] = kNeg;
    }
    last_row = i;
    if (row_best > best) {
      best = row_best;
      bi = i;
      for (int64_t j = (lo == 1 ? 0 : lo); j <= hi; ++j) {
        if (Hi[j] == row_best) { bj = j; break; }
      }
    } else if (best - row_best > zdrop) {
      break;
    }
  }
  (void)last_row;
  Py_END_ALLOW_THREADS

  if (best <= 0) {
    PyBuffer_Release(&qb);
    PyBuffer_Release(&rb);
    return Py_BuildValue("(iiiy#)", 0, 0, 0, "", (Py_ssize_t)0);
  }

  std::vector<uint32_t> ops;
  auto push = [&](uint32_t op) {
    if (!ops.empty() && (ops.back() & 0xfu) == op) {
      ops.back() += 1u << 4;
    } else {
      ops.push_back((1u << 4) | op);
    }
  };
  int64_t i = bi, j = bj;
  int state = 0;
  while (i > 0 || j > 0) {
    if (state == 0) {
      if (j > 0 && H[i * Wm + j] == E[i * Wm + j]) {
        state = 1;
      } else if (i > 0 && H[i * Wm + j] == F[i * Wm + j]) {
        state = 2;
      } else if (i > 0 && j > 0) {
        push(0); --i; --j;
      } else if (j > 0) {
        push(2); --j;
      } else {
        push(1); --i;
      }
    } else if (state == 1) {
      push(2);
      const bool stay =
          j > 1 && E[i * Wm + j] == E[i * Wm + j - 1] - gap_extend;
      --j;
      if (!stay) state = 0;
    } else {
      push(1);
      const bool stay =
          i > 1 && F[i * Wm + j] == F[(i - 1) * Wm + j] - gap_extend;
      --i;
      if (!stay) state = 0;
    }
  }
  std::reverse(ops.begin(), ops.end());
  PyBuffer_Release(&qb);
  PyBuffer_Release(&rb);
  return Py_BuildValue("(iLLy#)", (int)best, (long long)bi, (long long)bj,
                       reinterpret_cast<const char*>(ops.data()),
                       (Py_ssize_t)(ops.size() * sizeof(uint32_t)));
}

// Global-alignment prefix-score matrix H[(n+1)*(m+1)] as int32 bytes
// (ops/traceback.py::_nw_matrix twin, for splice_junction_align).
PyObject* py_prefix_matrix(PyObject*, PyObject* args) {
  Py_buffer qb, rb;
  int match, mismatch, gap_open, gap_extend;
  if (!PyArg_ParseTuple(args, "y*y*iiii", &qb, &rb, &match, &mismatch,
                        &gap_open, &gap_extend)) {
    return nullptr;
  }
  const uint8_t* q = static_cast<const uint8_t*>(qb.buf);
  const uint8_t* r = static_cast<const uint8_t*>(rb.buf);
  const int64_t n = qb.len;
  const int64_t m = rb.len;
  const int64_t Wm = m + 1;

  PyObject* out = PyBytes_FromStringAndSize(
      nullptr, (Py_ssize_t)((n + 1) * Wm * sizeof(int32_t)));
  if (out == nullptr) {
    PyBuffer_Release(&qb);
    PyBuffer_Release(&rb);
    return nullptr;
  }
  int32_t* H = reinterpret_cast<int32_t*>(PyBytes_AS_STRING(out));
  Py_BEGIN_ALLOW_THREADS
  std::vector<int32_t> Erow(Wm, kNeg), Fcol((size_t)n + 1, kNeg);
  std::vector<int32_t> Fprev(Wm, kNeg), Fcur(Wm, kNeg);
  H[0] = 0;
  for (int64_t j = 1; j <= m; ++j) {
    H[j] = -gap_open - static_cast<int32_t>(j - 1) * gap_extend;
  }
  std::vector<int32_t> Eprev(Wm, kNeg);
  for (int64_t j = 1; j <= m; ++j) Eprev[j] = H[j];
  for (int64_t i = 1; i <= n; ++i) {
    int32_t* Hi = &H[i * Wm];
    const int32_t* Hp = &H[(i - 1) * Wm];
    Hi[0] = -gap_open - static_cast<int32_t>(i - 1) * gap_extend;
    Fcur[0] = Hi[0];
    int32_t e = kNeg;
    for (int64_t j = 1; j <= m; ++j) {
      e = std::max(e - gap_extend, Hi[j - 1] - gap_open);
      const int32_t f = std::max(Fprev[j] - gap_extend, Hp[j] - gap_open);
      Fcur[j] = f;
      const int32_t d =
          Hp[j - 1] + cell_score(q[i - 1], r[j - 1], match, mismatch);
      Hi[j] = std::max(d, std::max(e, f));
    }
    std::swap(Fprev, Fcur);
  }
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&qb);
  PyBuffer_Release(&rb);
  return out;
}

PyMethodDef kMethods[] = {
    {"nw_banded", py_nw_banded, METH_VARARGS,
     "nw_banded(q, r, band, match, mismatch, gap_open, gap_extend) -> "
     "(score, cigar_u32_bytes) or None if the band is infeasible"},
    {"extend", py_extend, METH_VARARGS,
     "extend(q, r, match, mismatch, gap_open, gap_extend, zdrop) -> "
     "(score, q_used, r_used, cigar_u32_bytes)"},
    {"prefix_matrix", py_prefix_matrix, METH_VARARGS,
     "prefix_matrix(q, r, match, mismatch, gap_open, gap_extend) -> "
     "int32 H[(n+1)*(m+1)] bytes"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "_nwcore",
    "native banded global alignment with traceback", -1, kMethods,
    nullptr, nullptr, nullptr, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit__nwcore() { return PyModule_Create(&kModule); }
