// _alncore: native CPU fallbacks for the batched device alignment kernels.
//
// On the TPU backend ops/sw.py and ops/edit.py run as single-dispatch
// batched XLA programs; on the CPU backend (pool workers, laptops, CI) the
// same math here runs at C++ speed over the REAL sequence lengths instead
// of padded buckets.  Outputs are bit-identical to the device kernels --
// the tie-break contracts are replicated exactly and fuzz-tested
// (tests/test_alncore.py):
//
//   sw_align_many: affine-gap local alignment, forward ends + reverse-pass
//     begins (ops/sw.py::_sw_align_fused; reference analog ssw.c:779-849).
//     Tie-break: max score, then smallest r_end, then smallest q_end; the
//     reverse pass shares the rule in reversed coordinates.
//     The within-row gap (E) uses the same prefix-max-over-H0 formulation
//     as the kernel (exact for gap_open >= gap_extend, see ops/sw.py).
//
//   edit_many: unit-cost global edit distance via Myers/Hyyro blockwise
//     bit-parallel DP (the role edlib/Levenshtein play in the reference,
//     utils.py:153-159).  Each code value is its own symbol (N==N matches,
//     as in ops/edit.py where cost = (a != b)).
//
//   sw_traceback: full H/E/F local alignment with cigar walk, mirroring
//     ops/traceback.py::sw_traceback (reference banded_sw, ssw.c:548-735).
//     Cigar encoded as uint32 (length << 4 | op), ops 0=M 1=I 2=D.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

#include "simd_scan.h"

namespace {

constexpr int32_t kNeg = -(1 << 28);

inline int32_t cell_score(uint8_t a, uint8_t b, int32_t match,
                          int32_t mismatch) {
  if (a >= 5 || b >= 5) return kNeg;
  if (a == 4 || b == 4) return 0;
  return a == b ? match : -mismatch;
}

// Forward pass of ops/sw.py::sw_score_ends on one pair; returns
// (best, i_end, j_end) with the kernel's exact lexicographic tie-break
// (score desc, j asc, i asc).  H/F are scratch rows of size >= m.
void sw_forward(const uint8_t* q, int n, const uint8_t* r, int m,
                int32_t match, int32_t mismatch, int32_t gO, int32_t gE,
                int32_t* best_out, int32_t* i_out, int32_t* j_out,
                std::vector<int32_t>& H, std::vector<int32_t>& F,
                std::vector<int32_t>& tmp) {
  H.assign(m, 0);
  F.assign(m, kNeg);
  if (tmp.size() < static_cast<size_t>(m)) tmp.resize(m);
  int32_t* Hv = H.data();
  int32_t* Fv_ = F.data();
  int32_t* T = tmp.data();
  // SIMD pass-2 fast path: exact whenever the int64 clamp is provably
  // unreachable (H0 <= n*match; x = H0 + j*gE stays far below 2^31)
  const bool i32ok =
      static_cast<int64_t>(n) * std::max(match, 1) +
          static_cast<int64_t>(m) * std::max(gE, 1) <
      (int64_t{1} << 30);
  static thread_local std::vector<int32_t> pbuf, rampv;
  static thread_local int32_t ramp_ge = -1;
  const int32_t* ramp = nullptr;
  if (i32ok) {
    if (static_cast<int64_t>(pbuf.size()) < m) pbuf.resize(m);
    if (ramp_ge != gE || static_cast<int64_t>(rampv.size()) < m) {
      rampv.resize(std::max<int64_t>(m, 1024));
      for (size_t t = 0; t < rampv.size(); ++t) {
        rampv[t] = static_cast<int32_t>(t) * gE;
      }
      ramp_ge = gE;
    }
    ramp = rampv.data();
  }
  int32_t best = 0;
  int32_t best_i = -1;
  int32_t best_j = m;  // kernel init: best_j = Lr
  for (int i = 0; i < n; ++i) {
    const uint8_t qi = q[i];
    // pass 1 (vectorizable): F update + diagonal into tmp = H0; the diag
    // reads H[j-1] of the PREVIOUS row, which pass 1 never overwrites.
    {
      const int32_t f0 = std::max(Fv_[0] - gE, Hv[0] - gO);
      Fv_[0] = f0;
      T[0] = std::max(std::max(cell_score(qi, r[0], match, mismatch), f0),
                      0);  // j = 0 sees the empty prefix (diag = 0)
    }
    for (int j = 1; j < m; ++j) {
      const uint8_t b = r[j];
      int32_t s = (qi == b) ? match : -mismatch;
      s = (qi == 4 || b == 4) ? 0 : s;
      s = (qi >= 5 || b >= 5) ? kNeg : s;
      const int32_t f = std::max(Fv_[j] - gE, Hv[j] - gO);
      Fv_[j] = f;
      T[j] = std::max(std::max(Hv[j - 1] + s, f), 0);
    }
    // pass 2: the prefix-max E chain (ops/sw.py's cummax identity).
    // SIMD scan in int32 when the clamp is provably unreachable;
    // int64 serial with clamping otherwise (bit-identical contract).
    if (i32ok) {
      int32_t* P = pbuf.data();
      for (int j = 0; j < m; ++j) P[j] = T[j] + ramp[j];  // vectorizes
      prefix_max_i32_inplace(P, m);
      Hv[0] = T[0];  // E(0) is kNeg-derived, never beats T[0] >= 0
      for (int j = 1; j < m; ++j) {  // vectorizes
        Hv[j] = std::max(T[j], P[j - 1] - gO - ramp[j - 1]);
      }
    } else {
      int64_t pmax = kNeg;  // running max of H0[k] + k*gE, k < j
      for (int j = 0; j < m; ++j) {
        const int64_t E = pmax - gO - static_cast<int64_t>(j - 1) * gE;
        const int64_t hn = std::max<int64_t>(T[j], E);
        pmax = std::max<int64_t>(
            pmax, static_cast<int64_t>(T[j]) + static_cast<int64_t>(j) * gE);
        Hv[j] = hn > INT32_MAX ? INT32_MAX : static_cast<int32_t>(hn);
      }
    }
    // pass 3 (vectorizable): row max; the argmax scan only runs when the
    // row can actually improve the running best.
    int32_t row_best = INT32_MIN;
    for (int j = 0; j < m; ++j) row_best = std::max(row_best, Hv[j]);
    if (row_best >= best) {
      int row_j = 0;
      while (Hv[row_j] != row_best) ++row_j;
      if (row_best > best || row_j < best_j) {
        best = row_best;
        best_j = row_j;
        best_i = i;
      }
    }
  }
  *best_out = best;
  *i_out = best_i;
  *j_out = best_j;
}

// sw_align_many(q, r, B, Lq, Lr, qlens, rlens, match, mismatch, gO, gE)
//   q/r: int8 [B, Lq] / [B, Lr] row-major buffers (PAD ignored: per-row
//   real lengths come from qlens/rlens int32 buffers)
// returns bytes(int32 [B, 5]): score, q_begin, q_end, r_begin, r_end
PyObject* py_sw_align_many(PyObject*, PyObject* args) {
  Py_buffer qb, rb, qlb, rlb;
  int B, Lq, Lr, match, mismatch, gO, gE;
  if (!PyArg_ParseTuple(args, "y*y*iiiy*y*iiii", &qb, &rb, &B, &Lq, &Lr,
                        &qlb, &rlb, &match, &mismatch, &gO, &gE)) {
    return nullptr;
  }
  const uint8_t* q = static_cast<const uint8_t*>(qb.buf);
  const uint8_t* r = static_cast<const uint8_t*>(rb.buf);
  const int32_t* qlens = static_cast<const int32_t*>(qlb.buf);
  const int32_t* rlens = static_cast<const int32_t*>(rlb.buf);

  std::vector<int32_t> out(static_cast<size_t>(B) * 5);
  std::vector<int32_t> H, F, tmp;
  std::vector<uint8_t> rq, rr;

  for (int b = 0; b < B; ++b) {
    const uint8_t* qs = q + static_cast<size_t>(b) * Lq;
    const uint8_t* rs = r + static_cast<size_t>(b) * Lr;
    const int n = qlens[b];
    const int m = rlens[b];
    int32_t best, ie, je;
    if (n <= 0 || m <= 0) {
      best = 0;
      ie = je = -1;
    } else {
      sw_forward(qs, n, rs, m, match, mismatch, gO, gE, &best, &ie, &je, H,
                 F, tmp);
    }
    int32_t* o = out.data() + static_cast<size_t>(b) * 5;
    if (best <= 0) {
      o[0] = 0;
      o[1] = o[2] = o[3] = o[4] = -1;
      continue;
    }
    // reverse pass on the reversed prefixes for the begin coordinates
    rq.assign(qs, qs + ie + 1);
    std::reverse(rq.begin(), rq.end());
    rr.assign(rs, rs + je + 1);
    std::reverse(rr.begin(), rr.end());
    int32_t s2, io, jo;
    sw_forward(rq.data(), ie + 1, rr.data(), je + 1, match, mismatch, gO,
               gE, &s2, &io, &jo, H, F, tmp);
    o[0] = best;
    o[1] = ie - io;  // q_begin
    o[2] = ie;       // q_end
    o[3] = je - jo;  // r_begin
    o[4] = je;       // r_end
  }
  PyBuffer_Release(&qb);
  PyBuffer_Release(&rb);
  PyBuffer_Release(&qlb);
  PyBuffer_Release(&rlb);
  return PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(out.data()), out.size() * sizeof(int32_t));
}

// ---------------------------------------------------------------------------
// Myers/Hyyro blockwise bit-parallel edit distance.

int edit_distance_pair(const uint8_t* a, int n, const uint8_t* b, int m) {
  if (n == 0) return m;
  if (m == 0) return n;
  const int W = 64;
  const int blocks = (n + W - 1) / W;
  const int n_sym = 8;  // codes 0..7

  static thread_local std::vector<uint64_t> peq;
  static thread_local std::vector<uint64_t> VP, VN;
  peq.assign(static_cast<size_t>(n_sym) * blocks, 0);
  for (int i = 0; i < n; ++i) {
    const int sym = a[i] & 7;
    peq[static_cast<size_t>(sym) * blocks + i / W] |= 1ULL << (i % W);
  }
  VP.assign(blocks, ~0ULL);
  VN.assign(blocks, 0);
  // bits beyond n in the top block are "don't care": keep VP 1s there
  // (they never feed the score bit at position (n-1) % W of the top block)
  const uint64_t top_bit = 1ULL << ((n - 1) % W);
  int score = n;

  for (int j = 0; j < m; ++j) {
    const uint64_t* eq_row = peq.data() + static_cast<size_t>(b[j] & 7) * blocks;
    int hin = 1;  // boundary row D[0][j] = j increments per text char
    for (int blk = 0; blk < blocks; ++blk) {
      uint64_t Eq = eq_row[blk];
      const uint64_t Pv = VP[blk];
      const uint64_t Mv = VN[blk];
      const uint64_t Xv = Eq | Mv;
      if (hin < 0) Eq |= 1ULL;
      const uint64_t Xh = (((Eq & Pv) + Pv) ^ Pv) | Eq;
      uint64_t Ph = Mv | ~(Xh | Pv);
      uint64_t Mh = Pv & Xh;
      const uint64_t high = (blk == blocks - 1) ? top_bit : (1ULL << 63);
      int hout = 0;
      if (Ph & high) hout = 1;
      else if (Mh & high) hout = -1;
      Ph <<= 1;
      Mh <<= 1;
      if (hin > 0) Ph |= 1ULL;
      else if (hin < 0) Mh |= 1ULL;
      VP[blk] = Mh | ~(Xv | Ph);
      VN[blk] = Ph & Xv;
      hin = hout;
    }
    score += hin;
  }
  return score;
}

// edit_many(a, b, B, La, Lb, alens, blens) -> bytes(int32 [B])
PyObject* py_edit_many(PyObject*, PyObject* args) {
  Py_buffer ab, bb, alb, blb;
  int B, La, Lb;
  if (!PyArg_ParseTuple(args, "y*y*iiiy*y*", &ab, &bb, &B, &La, &Lb, &alb,
                        &blb)) {
    return nullptr;
  }
  const uint8_t* a = static_cast<const uint8_t*>(ab.buf);
  const uint8_t* b = static_cast<const uint8_t*>(bb.buf);
  const int32_t* alens = static_cast<const int32_t*>(alb.buf);
  const int32_t* blens = static_cast<const int32_t*>(blb.buf);
  std::vector<int32_t> out(B);
  for (int i = 0; i < B; ++i) {
    out[i] = edit_distance_pair(a + static_cast<size_t>(i) * La, alens[i],
                                b + static_cast<size_t>(i) * Lb, blens[i]);
  }
  PyBuffer_Release(&ab);
  PyBuffer_Release(&bb);
  PyBuffer_Release(&alb);
  PyBuffer_Release(&blb);
  return PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(out.data()), out.size() * sizeof(int32_t));
}

// ---------------------------------------------------------------------------
// Full local alignment with traceback (ops/traceback.py::sw_traceback).

// sw_traceback(q, r, match, mismatch, gO, gE)
// -> None | (score, q_begin, q_end, r_begin, r_end, cigar_bytes)
PyObject* py_sw_traceback(PyObject*, PyObject* args) {
  Py_buffer qb, rb;
  int match, mismatch, gO, gE;
  if (!PyArg_ParseTuple(args, "y*y*iiii", &qb, &rb, &match, &mismatch, &gO,
                        &gE)) {
    return nullptr;
  }
  const uint8_t* q = static_cast<const uint8_t*>(qb.buf);
  const uint8_t* r = static_cast<const uint8_t*>(rb.buf);
  const int n = static_cast<int>(qb.len);
  const int m = static_cast<int>(rb.len);
  if (n == 0 || m == 0) {
    PyBuffer_Release(&qb);
    PyBuffer_Release(&rb);
    Py_RETURN_NONE;
  }

  const size_t stride = m + 1;
  std::vector<int32_t> H(static_cast<size_t>(n + 1) * stride, 0);
  std::vector<int32_t> E(static_cast<size_t>(n + 1) * stride, kNeg);
  std::vector<int32_t> F(static_cast<size_t>(n + 1) * stride, kNeg);

  std::vector<int32_t> tmp(m + 1);
  for (int i = 1; i <= n; ++i) {
    int32_t* Hrow = H.data() + i * stride;
    const int32_t* Hprev = H.data() + (i - 1) * stride;
    int32_t* Erow = E.data() + i * stride;
    int32_t* Frow = F.data() + i * stride;
    const int32_t* Fprev = F.data() + (i - 1) * stride;
    const uint8_t qi = q[i - 1];
    // pass 1 (vectorizable): F + diagonal into tmp = h0
    for (int j = 1; j <= m; ++j) {
      const uint8_t b = r[j - 1];
      int32_t s = (qi == b) ? match : -mismatch;
      s = (qi == 4 || b == 4) ? 0 : s;
      s = (qi >= 5 || b >= 5) ? kNeg : s;
      const int32_t f = std::max(Fprev[j] - gE, Hprev[j] - gO);
      Frow[j] = f;
      tmp[j] = std::max(std::max(Hprev[j - 1] + s, f), 0);
    }
    // pass 2 (serial): the prefix-max E chain
    int64_t pmax = kNeg;
    for (int j = 1; j <= m; ++j) {
      const int64_t e =
          (j == 1) ? kNeg : pmax - gO - static_cast<int64_t>(j - 2) * gE;
      Erow[j] = static_cast<int32_t>(std::max<int64_t>(e, kNeg));
      pmax = std::max<int64_t>(pmax, static_cast<int64_t>(tmp[j]) +
                                         static_cast<int64_t>(j - 1) * gE);
      Hrow[j] = std::max<int64_t>(tmp[j], Erow[j]);
    }
  }

  int32_t score = 0;
  for (const int32_t v : H) score = std::max(score, v);
  if (score <= 0) {
    PyBuffer_Release(&qb);
    PyBuffer_Release(&rb);
    Py_RETURN_NONE;
  }
  // earliest ref end, then earliest query end among max cells
  int ie = -1, je = -1;
  for (int j = 0; j <= m && ie < 0; ++j) {
    for (int i = 0; i <= n; ++i) {
      if (H[static_cast<size_t>(i) * stride + j] == score) {
        ie = i;
        je = j;
        break;
      }
    }
  }

  // traceback walk -- mirrors ops/traceback.py exactly
  std::vector<uint32_t> cigar;  // (len << 4 | op), built reversed
  auto push = [&cigar](int op) {
    if (!cigar.empty() && static_cast<int>(cigar.back() & 0xF) == op) {
      cigar.back() += 1 << 4;
    } else {
      cigar.push_back((1u << 4) | op);
    }
  };
  int i = ie, j = je;
  char state = 'H';
  while (i > 0 && j > 0) {
    const size_t c = static_cast<size_t>(i) * stride + j;
    if (state == 'H') {
      if (H[c] == 0) break;
      const int32_t s = cell_score(q[i - 1], r[j - 1], match, mismatch);
      if (H[c] == H[c - stride - 1] + s) {
        push(0);
        --i;
        --j;
      } else if (H[c] == E[c]) {
        state = 'E';
      } else if (H[c] == F[c]) {
        state = 'F';
      } else {
        break;
      }
    } else if (state == 'E') {
      push(2);
      const bool stay = j > 1 && E[c] == E[c - 1] - gE &&
                        E[c] != H[c - 1] - gO;
      --j;
      if (!stay) state = 'H';
    } else {
      push(1);
      const bool stay = i > 1 && F[c] == F[c - stride] - gE &&
                        F[c] != H[c - stride] - gO;
      --i;
      if (!stay) state = 'H';
    }
  }
  std::reverse(cigar.begin(), cigar.end());

  PyBuffer_Release(&qb);
  PyBuffer_Release(&rb);
  PyObject* cig = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(cigar.data()),
      cigar.size() * sizeof(uint32_t));
  PyObject* ret = Py_BuildValue("iiiiiN", score, i, ie - 1, j, je - 1, cig);
  return ret;
}

PyMethodDef kMethods[] = {
    {"sw_align_many", py_sw_align_many, METH_VARARGS,
     "Batched affine local alignment (score + begins/ends)."},
    {"edit_many", py_edit_many, METH_VARARGS,
     "Batched unit-cost edit distance (Myers blockwise)."},
    {"sw_traceback", py_sw_traceback, METH_VARARGS,
     "Local alignment with cigar traceback."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {PyModuleDef_HEAD_INIT, "_alncore",
                       "Native CPU alignment cores", -1, kMethods};

}  // namespace

PyMODINIT_FUNC PyInit__alncore() { return PyModule_Create(&kModule); }
