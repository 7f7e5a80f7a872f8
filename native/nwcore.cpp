// _nwcore: native banded global alignment with traceback + the chain
// stitcher built from it.
//
// The host-side pairwise workhorse behind ops/traceback.py: unit-vs-
// representative consensus alignment (CCS stage), inter-anchor stitching
// and the splice flank matrices all reduce to small global affine-gap
// alignments.  The numpy row-vectorised DP pays ~20 us of interpreter
// overhead per row; these cores run the DP at C++ speed.
//
// Entry points:
//   nw_banded / extend / prefix_matrix -- pairwise primitives (twins of
//     ops/traceback.py::_banded_nw / extend_align / _nw_matrix).
//   stitch -- the whole GenomeAligner._stitch inner loop (the role ksw2
//     gap filling plays for minimap2's chains): inter-anchor gap cigars,
//     gapped splice-junction placement with the GT-AG bonus, both-end
//     z-drop extensions and match counting, byte-identical to the Python
//     path (models/aligner.py::_stitch_py; parity fuzz in
//     tests/test_stitch_native.py).
//
// Semantics mirror ops/traceback.py exactly:
//   - scores: match / -mismatch over codes 0..3, N (4) scores 0,
//     PAD (5) poisons; gap of length L costs open + (L-1)*extend
//   - global alignment of ALL of q to ALL of r
//   - nw_banded returns None (Py_None) when the band cannot connect the
//     corners, so callers can double the band and retry.
//
// Cigar ops: 0=M 1=I (consumes q) 2=D 3=N (consume r), encoded as
// uint32 (length << 4 | op).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <memory>
#include <thread>
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

// run-length cigar with merging append (uint32 length<<4|op)
struct Cigar {
  std::vector<uint32_t> ops;
  void emit(uint32_t op, int64_t len) {
    if (len <= 0) return;
    if (!ops.empty() && (ops.back() & 0xfu) == op) {
      ops.back() += static_cast<uint32_t>(len) << 4;
    } else {
      ops.push_back((static_cast<uint32_t>(len) << 4) | op);
    }
  }
  void emit_runs(const std::vector<uint32_t>& runs) {
    for (uint32_t r : runs) emit(r & 0xfu, r >> 4);
  }
};

// ---------------------------------------------------------------------------
// Banded global NW cores (twin of py_nw_banded's DP).
//
// Banded storage: row i keeps relative columns c = j - i - lo_off + 1 in
// [1, W]; c = 0 and c = W + 1 hold kNeg sentinels so the inner loop reads
// out-of-band neighbours without any in_band branching (a read one past a
// row's valid range always lands on a sentinel -- band edges move by at
// most one column per row).  With stride = W + 2 the neighbours sit at
// fixed offsets: left = idx - 1, diag(i-1, j-1) = idx - stride,
// up(i-1, j) = idx - stride + 1.
//
// Semantics (scores, traceback preference order, tie-breaks) are
// byte-identical to the original in_band-guarded formulation: a sentinel
// kNeg is exactly what the old code substituted for out-of-band reads,
// and on any feasible path traceback equality tests against kNeg-derived
// values can never fire (path cells score > kNeg/2; kNeg-derived values
// stay below it).
struct NWScratch {
  std::vector<int32_t> H, E, F;          // traceback matrices
  std::vector<int32_t> h0, h1, f0, f1;   // score-only rolling rows
  std::vector<int32_t> tmp;              // dp_row pass-1 staging
  std::vector<int32_t> echain;           // dp_row_score E-chain staging
  std::vector<int32_t> ramp;             // t * gap_extend, cached per ge
  int32_t ramp_ge = -1;
};
NWScratch& nw_scratch() {
  static thread_local NWScratch s;
  return s;
}

inline void grow(std::vector<int32_t>& v, size_t need) {
  if (v.size() < need) v.resize(need);
}

inline const int32_t* ramp_for(NWScratch& s, int32_t ge, int64_t len) {
  if (s.ramp_ge != ge || static_cast<int64_t>(s.ramp.size()) < len) {
    const int64_t n = std::max<int64_t>(len, 1024);
    s.ramp.resize(n);
    for (int64_t t = 0; t < n; ++t) {
      s.ramp[t] = static_cast<int32_t>(t) * ge;
    }
    s.ramp_ge = ge;
  }
  return s.ramp.data();
}

inline void prefix_max_i32(int32_t* y, int64_t len) {
  prefix_max_i32_inplace(y, len);
}

// The E chain e[t] = max(e[t-1] - ge, tmp[t-1] - go) as a prefix max of
// the ge-deskewed series: with y[t] = e[t] + t*ge and x[t] = tmp[t-1] -
// go + t*ge (x[0] = e0), y = prefix_max(x) -- the same affine identity
// as the TPU kernel's cummax, now also scanned in SIMD on host.  All
// intermediates stay well inside int32 (|values| <= ~2^29 + len*ge).
inline void e_chain(const int32_t* tmp, int64_t len, int32_t e0,
                    int32_t go, const int32_t* ramp, int32_t* E) {
  E[0] = e0;
  for (int64_t t = 1; t < len; ++t) {  // vectorizes
    E[t] = tmp[t - 1] - go + ramp[t];
  }
  prefix_max_i32(E, len);
  for (int64_t t = 1; t < len; ++t) E[t] -= ramp[t];  // vectorizes
}

// One DP row, split into compiler-vectorizable passes.  Exact splitting
// of the E recurrence needs gap_open >= gap_extend (the repo-wide kernel
// convention; callers assert/fall back):
//   E[j] = max(E[j-1] - ge, H[j-1] - go),  H[j-1] = max(tmp[j-1], E[j-1])
//        = max(E[j-1] - ge, tmp[j-1] - go)         since go >= ge,
// a first-order recurrence over the precomputed tmp = max(diag, F) --
// the same affine identity the TPU prefix-scan kernel rests on
// (ops/sw.py).  Values produced are bit-identical to the fused loop.
//
// Pointers are pre-offset so index t is column j0 + t: Hd = diag(i-1,
// j-1), Hu/Fu = up(i-1, j).  e0_E / e0_H are the left neighbour of the
// first column (border cell or kNeg sentinel).
inline void dp_row(uint8_t qi, const uint8_t* rrow, int64_t len,
                   const int32_t* Hd, const int32_t* Hu, const int32_t* Fu,
                   int32_t* H, int32_t* E, int32_t* F, int32_t* tmp,
                   int32_t e0_E, int32_t e0_H, int match, int mismatch,
                   int gap_open, int gap_extend, const int32_t* ramp) {
  // pass 1 (vectorizes): diagonal + vertical, no intra-row dependency
  for (int64_t t = 0; t < len; ++t) {
    const uint8_t b = rrow[t];
    int32_t sc = (qi == b) ? match : -mismatch;
    sc = (qi == 4 || b == 4) ? 0 : sc;
    sc = (qi >= 5 || b >= 5) ? kNeg : sc;
    const int32_t f = std::max(Fu[t] - gap_extend, Hu[t] - gap_open);
    F[t] = f;
    tmp[t] = std::max(Hd[t] + sc, f);
  }
  // pass 2: the E chain as a SIMD prefix-max scan
  const int32_t e0 = std::max(e0_E - gap_extend, e0_H - gap_open);
  e_chain(tmp, len, e0, gap_open, ramp, E);
  // pass 3 (vectorizes): fold E into H
  for (int64_t t = 0; t < len; ++t) H[t] = std::max(tmp[t], E[t]);
}

// Score-only variant: E stays scalar, fold fused into the chain.
inline void dp_row_score(uint8_t qi, const uint8_t* rrow, int64_t len,
                         const int32_t* Hd, const int32_t* Hu,
                         const int32_t* Fu, int32_t* H, int32_t* F,
                         int32_t* tmp, int32_t e0_E, int32_t e0_H,
                         int match, int mismatch, int gap_open,
                         int gap_extend, const int32_t* ramp,
                         int32_t* escratch) {
  for (int64_t t = 0; t < len; ++t) {
    const uint8_t b = rrow[t];
    int32_t sc = (qi == b) ? match : -mismatch;
    sc = (qi == 4 || b == 4) ? 0 : sc;
    sc = (qi >= 5 || b >= 5) ? kNeg : sc;
    const int32_t f = std::max(Fu[t] - gap_extend, Hu[t] - gap_open);
    F[t] = f;
    tmp[t] = std::max(Hd[t] + sc, f);
  }
  const int32_t e0 = std::max(e0_E - gap_extend, e0_H - gap_open);
  e_chain(tmp, len, e0, gap_open, ramp, escratch);
  for (int64_t t = 0; t < len; ++t) {
    H[t] = std::max(tmp[t], escratch[t]);
  }
}

// Fused fallbacks for the (unused in production) gap_open < gap_extend
// case, where the split E recurrence is not exact: the original direct
// formulation.
inline void dp_row_fused(uint8_t qi, const uint8_t* rrow, int64_t len,
                         const int32_t* Hd, const int32_t* Hu,
                         const int32_t* Fu, int32_t* H, int32_t* E,
                         int32_t* F, int32_t e0_E, int32_t e0_H,
                         int match, int mismatch, int gap_open,
                         int gap_extend) {
  int32_t eprev = e0_E, hprev = e0_H;
  for (int64_t t = 0; t < len; ++t) {
    const int32_t e = std::max(eprev - gap_extend, hprev - gap_open);
    const int32_t f = std::max(Fu[t] - gap_extend, Hu[t] - gap_open);
    const int32_t d =
        Hd[t] + cell_score(qi, rrow[t], match, mismatch);
    const int32_t h = std::max(d, std::max(e, f));
    E[t] = e;
    F[t] = f;
    H[t] = h;
    eprev = e;
    hprev = h;
  }
}

// Score-only pass: two rolling rows, no traceback storage.  Returns false
// when the band cannot connect the corners.
bool nw_banded_score(const uint8_t* q, int64_t n, const uint8_t* r,
                     int64_t m, int64_t band, int match, int mismatch,
                     int gap_open, int gap_extend, int32_t* score_out) {
  const int64_t lo_off = std::min<int64_t>(0, m - n) - band;
  const int64_t hi_off = std::max<int64_t>(0, m - n) + band;
  const int64_t W = hi_off - lo_off + 1;
  const int64_t stride = W + 2;

  NWScratch& s = nw_scratch();
  grow(s.h0, stride); grow(s.h1, stride);
  grow(s.f0, stride); grow(s.f1, stride);
  int32_t* hp = s.h0.data();
  int32_t* hc = s.h1.data();
  int32_t* fp = s.f0.data();
  int32_t* fc = s.f1.data();

  // row 0: j in [0, min(m, hi_off)], c = j - lo_off + 1
  {
    const int64_t jhi = std::min<int64_t>(m, hi_off);
    const int64_t cl = -lo_off + 1;           // c at j = 0
    hp[cl - 1] = kNeg; fp[cl - 1] = kNeg;
    hp[cl] = 0; fp[cl] = kNeg;
    for (int64_t j = 1; j <= jhi; ++j) {
      hp[cl + j] = -gap_open - static_cast<int32_t>(j - 1) * gap_extend;
      fp[cl + j] = kNeg;
    }
    hp[cl + jhi + 1] = kNeg; fp[cl + jhi + 1] = kNeg;
  }
  NWScratch& scr = s;
  grow(scr.tmp, stride);
  grow(scr.echain, stride);
  int32_t* tmp = scr.tmp.data();
  int32_t* esc = scr.echain.data();
  const int32_t* ramp = ramp_for(scr, gap_extend, stride);
  for (int64_t i = 1; i <= n; ++i) {
    const int64_t jlo = std::max<int64_t>(0, i + lo_off);
    const int64_t jhi = std::min<int64_t>(m, i + hi_off);
    if (jlo > jhi) return false;
    const int64_t cl = jlo - i - lo_off + 1;
    int64_t c = cl;
    hc[c - 1] = kNeg; fc[c - 1] = kNeg;
    if (jlo == 0) {
      hc[c] = -gap_open - static_cast<int32_t>(i - 1) * gap_extend;
      fc[c] = hc[c];
      ++c;
    }
    const int64_t j0 = std::max<int64_t>(1, jlo);
    const int64_t len = jhi - j0 + 1;
    if (len > 0) {
      // e0: E of the left neighbour is kNeg (border E / sentinel); its H
      // is the border ramp or the kNeg sentinel just written.
      if (gap_open >= gap_extend) {
        dp_row_score(q[i - 1], r + j0 - 1, len, hp + c, hp + c + 1,
                     fp + c + 1, hc + c, fc + c, tmp, kNeg, hc[c - 1],
                     match, mismatch, gap_open, gap_extend, ramp, esc);
      } else {
        dp_row_fused(q[i - 1], r + j0 - 1, len, hp + c, hp + c + 1,
                     fp + c + 1, hc + c, tmp, fc + c, kNeg, hc[c - 1],
                     match, mismatch, gap_open, gap_extend);
      }
      c += len;
    }
    hc[c] = kNeg; fc[c] = kNeg;
    std::swap(hp, hc);
    std::swap(fp, fc);
  }
  const int32_t score = hp[m - n - lo_off + 1];
  if (score <= kNeg / 2) return false;
  *score_out = score;
  return true;
}

// Full pass with traceback.  OVERWRITES `ops_out` with the merged runs
// (the band ladder re-invokes this with the same vector at escalated
// bands and relies on replace semantics); score-only when ops_out is
// null, kept for the direct py_nw_banded entry.
bool nw_banded_core(const uint8_t* q, int64_t n, const uint8_t* r, int64_t m,
                    int64_t band, int match, int mismatch, int gap_open,
                    int gap_extend, int32_t* score_out,
                    std::vector<uint32_t>* ops_out) {
  if (ops_out == nullptr) {
    return nw_banded_score(q, n, r, m, band, match, mismatch, gap_open,
                           gap_extend, score_out);
  }
  const int64_t lo_off = std::min<int64_t>(0, m - n) - band;
  const int64_t hi_off = std::max<int64_t>(0, m - n) + band;
  const int64_t W = hi_off - lo_off + 1;
  const int64_t stride = W + 2;

  NWScratch& s = nw_scratch();
  const size_t need = static_cast<size_t>((n + 1) * stride);
  grow(s.H, need); grow(s.E, need); grow(s.F, need);
  grow(s.tmp, stride);
  int32_t* H = s.H.data();
  int32_t* E = s.E.data();
  int32_t* F = s.F.data();
  int32_t* tmp = s.tmp.data();
  const int32_t* ramp = ramp_for(s, gap_extend, stride);
  auto T = [&](int64_t i, int64_t j) {
    return i * stride + (j - i - lo_off) + 1;
  };

  // row 0
  {
    const int64_t jhi = std::min<int64_t>(m, hi_off);
    const int64_t cl = -lo_off + 1;
    H[cl - 1] = kNeg; E[cl - 1] = kNeg; F[cl - 1] = kNeg;
    H[cl] = 0; E[cl] = kNeg; F[cl] = kNeg;
    for (int64_t j = 1; j <= jhi; ++j) {
      const int32_t v = -gap_open - static_cast<int32_t>(j - 1) * gap_extend;
      H[cl + j] = v; E[cl + j] = v; F[cl + j] = kNeg;
    }
    H[cl + jhi + 1] = kNeg; E[cl + jhi + 1] = kNeg; F[cl + jhi + 1] = kNeg;
  }
  for (int64_t i = 1; i <= n; ++i) {
    const int64_t jlo = std::max<int64_t>(0, i + lo_off);
    const int64_t jhi = std::min<int64_t>(m, i + hi_off);
    if (jlo > jhi) return false;
    const int64_t base = i * stride;
    int64_t c = jlo - i - lo_off + 1;
    H[base + c - 1] = kNeg; E[base + c - 1] = kNeg; F[base + c - 1] = kNeg;
    if (jlo == 0) {
      const int32_t v = -gap_open - static_cast<int32_t>(i - 1) * gap_extend;
      H[base + c] = v; F[base + c] = v; E[base + c] = kNeg;
      ++c;
    }
    int32_t* Hc = H + base;
    int32_t* Ec = E + base;
    int32_t* Fc = F + base;
    const int64_t j0 = std::max<int64_t>(1, jlo);
    const int64_t len = jhi - j0 + 1;
    if (len > 0) {
      const int32_t* Hp = Hc - stride;  // prev row, same relative column
      const int32_t* Fp = Fc - stride;
      if (gap_open >= gap_extend) {
        dp_row(q[i - 1], r + j0 - 1, len, Hp + c, Hp + c + 1, Fp + c + 1,
               Hc + c, Ec + c, Fc + c, tmp, Ec[c - 1], Hc[c - 1],
               match, mismatch, gap_open, gap_extend, ramp);
      } else {
        dp_row_fused(q[i - 1], r + j0 - 1, len, Hp + c, Hp + c + 1,
                     Fp + c + 1, Hc + c, Ec + c, Fc + c, Ec[c - 1],
                     Hc[c - 1], match, mismatch, gap_open, gap_extend);
      }
      c += len;
    }
    Hc[c] = kNeg; Ec[c] = kNeg; Fc[c] = kNeg;
  }
  if (H[T(n, m)] <= kNeg / 2) return false;
  *score_out = H[T(n, m)];

  // traceback (same 3-state machine as the numpy fallback; sentinel reads
  // reproduce the old in_band == false branches exactly)
  Cigar cig;
  int64_t i = n, j = m;
  int state = 0;  // 0=H 1=E 2=F
  while (i > 0 || j > 0) {
    if (state == 0) {
      if (j > 0 && H[T(i, j)] == E[T(i, j)]) {
        state = 1;
      } else if (i > 0 && H[T(i, j)] == F[T(i, j)]) {
        state = 2;
      } else if (i > 0 && j > 0) {
        cig.emit(0, 1); --i; --j;
      } else if (j > 0) {
        cig.emit(2, 1); --j;
      } else {
        cig.emit(1, 1); --i;
      }
    } else if (state == 1) {
      cig.emit(2, 1);
      const bool stay = j > 1 &&
          E[T(i, j)] == E[T(i, j - 1)] - gap_extend;
      --j;
      if (!stay) state = 0;
    } else {
      cig.emit(1, 1);
      const bool stay = i > 1 &&
          F[T(i, j)] == F[T(i - 1, j)] - gap_extend;
      --i;
      if (!stay) state = 0;
    }
  }
  std::reverse(cig.ops.begin(), cig.ops.end());
  *ops_out = std::move(cig.ops);
  return true;
}

// banded_global_cigar driver (ops/traceback.py::banded_global_cigar +
// _nw_native): default band |n-m|+16, doubled until the score is stable;
// returns the SMALLER band's cigar when two consecutive bands agree.
// The band ladder runs on cheap score-only rolling passes; the full
// traceback DP runs exactly once, at the confirmed band -- the DP is
// deterministic, so its cigar equals what a traceback pass at that band
// in the ladder would have produced (outputs byte-identical to the
// two-full-passes formulation this replaces).
void nw_cigar_driver(const uint8_t* q, int64_t n, const uint8_t* r,
                     int64_t m, int match, int mismatch, int gap_open,
                     int gap_extend, int32_t* score_out,
                     std::vector<uint32_t>* runs) {
  runs->clear();
  if (n == 0) {
    *score_out = 0;
    if (m) runs->push_back((static_cast<uint32_t>(m) << 4) | 2u);
    return;
  }
  if (m == 0) {
    *score_out = 0;
    runs->push_back((static_cast<uint32_t>(n) << 4) | 1u);
    return;
  }
  int64_t band = std::llabs(n - m) + 16;
  const int64_t big = std::max(n, m);
  // traceback-first ladder: run the full pass at the current band, then
  // confirm with one cheap score-only pass at the doubled band; in the
  // common no-escalation case this is one full + one rolling pass (the
  // score-score-traceback ordering paid an extra score pass every call).
  // Escalations re-run the full pass at the wider band -- same final
  // (band, cigar, score) as the all-score ladder, since both stop at the
  // first band whose score the doubled band confirms.
  bool have = nw_banded_core(q, n, r, m, band, match, mismatch, gap_open,
                             gap_extend, score_out, runs);
  while (band < big) {
    const int64_t nxt = std::min(2 * band, big);
    int32_t s2 = 0;
    const bool have2 = nw_banded_score(q, n, r, m, nxt, match, mismatch,
                                       gap_open, gap_extend, &s2);
    if (have && have2 && s2 == *score_out) return;  // smaller band wins
    band = nxt;
    have = nw_banded_core(q, n, r, m, band, match, mismatch, gap_open,
                          gap_extend, score_out, runs);
  }
  if (!have) {
    // full band is always feasible (band == big here)
    nw_banded_core(q, n, r, m, big, match, mismatch, gap_open, gap_extend,
                   score_out, runs);
  }
}

// ---------------------------------------------------------------------------
// Extension core (twin of py_extend / ops/traceback.py::extend_align).
// Banded: row i computes columns [max(1, i-W), min(m, i+drift+W)] with
// drift = max(0, m-n) and W = kExtBand; kNeg sentinels one cell outside
// each band edge stand in for the uncomputed region.  Exact whenever the
// optimal path drifts < W off the main diagonal.
constexpr int64_t kExtBand = 128;

void extend_core(const uint8_t* q, int64_t n, const uint8_t* r, int64_t m,
                 int match, int mismatch, int gap_open, int gap_extend,
                 int zdrop, int32_t* best_out, int64_t* qi_out,
                 int64_t* rj_out, std::vector<uint32_t>* runs) {
  runs->clear();
  *best_out = 0;
  *qi_out = 0;
  *rj_out = 0;
  if (n == 0 || m == 0) return;

  // Banded storage (row i keeps c = j - i + kExtBand + 2; sentinels one
  // past each row's written range) -- the DP only ever touches a
  // (2*kExtBand + drift)-wide stripe, so storing the full m+1 columns per
  // row (the previous layout) paid ~Wm/stride times the memory traffic.
  // Index arithmetic matches the nw cores: left = idx-1, diag = idx -
  // stride, up = idx - stride + 1.  Outputs are byte-identical: the same
  // cells are computed, with the same sentinel semantics at band edges.
  const int64_t drift = std::max<int64_t>(0, m - n);
  const int64_t B = kExtBand;
  const int64_t stride = drift + 2 * B + 4;
  auto hi_of = [&](int64_t i) { return std::min(m, i + drift + B); };
  auto C = [&](int64_t i, int64_t j) { return j - i + B + 2; };

  NWScratch& s = nw_scratch();
  const size_t need = static_cast<size_t>((n + 1) * stride);
  grow(s.H, need); grow(s.E, need); grow(s.F, need);
  grow(s.tmp, stride);
  int32_t* H = s.H.data();
  int32_t* E = s.E.data();
  int32_t* F = s.F.data();
  int32_t* tmp = s.tmp.data();
  const int32_t* ramp = ramp_for(s, gap_extend, stride);
  auto T = [&](int64_t i, int64_t j) { return i * stride + C(i, j); };

  int32_t best = 0;
  int64_t bi = 0, bj = 0;

  const int64_t hi0 = hi_of(0);
  {
    const int64_t c0 = C(0, 0);
    H[c0 - 1] = kNeg; E[c0 - 1] = kNeg; F[c0 - 1] = kNeg;
    H[c0] = 0; E[c0] = kNeg; F[c0] = kNeg;
    for (int64_t j = 1; j <= hi0; ++j) {
      const int32_t v = -gap_open - static_cast<int32_t>(j - 1) * gap_extend;
      H[c0 + j] = v; E[c0 + j] = v; F[c0 + j] = kNeg;
    }
    H[c0 + hi0 + 1] = kNeg; E[c0 + hi0 + 1] = kNeg; F[c0 + hi0 + 1] = kNeg;
  }
  for (int64_t i = 1; i <= n; ++i) {
    const int64_t lo = std::max<int64_t>(1, i - B);
    const int64_t hi = hi_of(i);
    const int64_t base = i * stride;
    int64_t c = C(i, lo) - 1;  // border column (j = lo-1 = 0) or sentinel
    int32_t* Hc = H + base;
    int32_t* Ec = E + base;
    int32_t* Fc = F + base;
    const int32_t* Hu = Hc - stride + 1;
    const int32_t* Fu = Fc - stride + 1;
    const int32_t* Hd = Hc - stride;
    int32_t row_best;
    if (lo == 1) {
      const int32_t v = -gap_open - static_cast<int32_t>(i - 1) * gap_extend;
      Hc[c - 1] = kNeg; Ec[c - 1] = kNeg; Fc[c - 1] = kNeg;
      Hc[c] = v; Fc[c] = v; Ec[c] = kNeg;
      row_best = v;
    } else {
      Hc[c] = kNeg; Ec[c] = kNeg; Fc[c] = kNeg;
      row_best = kNeg;
    }
    ++c;
    const int64_t len = hi - lo + 1;
    if (len > 0) {
      if (gap_open >= gap_extend) {
        dp_row(q[i - 1], r + lo - 1, len, Hd + c, Hu + c, Fu + c,
               Hc + c, Ec + c, Fc + c, tmp, Ec[c - 1], Hc[c - 1],
               match, mismatch, gap_open, gap_extend, ramp);
      } else {
        dp_row_fused(q[i - 1], r + lo - 1, len, Hd + c, Hu + c, Fu + c,
                     Hc + c, Ec + c, Fc + c, Ec[c - 1], Hc[c - 1],
                     match, mismatch, gap_open, gap_extend);
      }
      for (int64_t t = 0; t < len; ++t) {  // vectorizable row max
        if (Hc[c + t] > row_best) row_best = Hc[c + t];
      }
      c += len;
    }
    Hc[c] = kNeg; Ec[c] = kNeg; Fc[c] = kNeg;
    if (row_best > best) {
      best = row_best;
      bi = i;
      for (int64_t j = (lo == 1 ? 0 : lo); j <= hi; ++j) {
        if (Hc[C(i, j)] == row_best) { bj = j; break; }
      }
    } else if (best - row_best > zdrop) {
      break;
    }
  }
  if (best <= 0) return;

  Cigar cig;
  int64_t i = bi, j = bj;
  int state = 0;
  while (i > 0 || j > 0) {
    if (state == 0) {
      if (j > 0 && H[T(i, j)] == E[T(i, j)]) {
        state = 1;
      } else if (i > 0 && H[T(i, j)] == F[T(i, j)]) {
        state = 2;
      } else if (i > 0 && j > 0) {
        cig.emit(0, 1); --i; --j;
      } else if (j > 0) {
        cig.emit(2, 1); --j;
      } else {
        cig.emit(1, 1); --i;
      }
    } else if (state == 1) {
      cig.emit(2, 1);
      const bool stay =
          j > 1 && E[T(i, j)] == E[T(i, j - 1)] - gap_extend;
      --j;
      if (!stay) state = 0;
    } else {
      cig.emit(1, 1);
      const bool stay =
          i > 1 && F[T(i, j)] == F[T(i - 1, j)] - gap_extend;
      --i;
      if (!stay) state = 0;
    }
  }
  std::reverse(cig.ops.begin(), cig.ops.end());
  *best_out = best;
  *qi_out = bi;
  *rj_out = bj;
  *runs = std::move(cig.ops);
}

// ---------------------------------------------------------------------------
// Global-alignment prefix-score matrix H[(n+1)*(m+1)] (twin of
// ops/traceback.py::_nw_matrix, for splice_junction_align).
void prefix_matrix_core(const uint8_t* q, int64_t n, const uint8_t* r,
                        int64_t m, int match, int mismatch, int gap_open,
                        int gap_extend, int32_t* H) {
  const int64_t Wm = m + 1;
  std::vector<int32_t> Fprev(Wm, kNeg), Fcur(Wm, kNeg);
  H[0] = 0;
  for (int64_t j = 1; j <= m; ++j) {
    H[j] = -gap_open - static_cast<int32_t>(j - 1) * gap_extend;
  }
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
}

// Gapped splice-junction placement (twin of ops/traceback.py::
// splice_junction_align): place an intron of length G inside ref_gap
// while aligning qg across it with gaps; canonical GT..AG / CT..AC
// motifs earn `bonus`.  Appends the cigar (incl. the N op) to `out`.
void splice_junction_core(const uint8_t* qg, int64_t L, const uint8_t* ref_gap,
                          int64_t G, int match, int mismatch, int gap_open,
                          int gap_extend, int bonus, Cigar& out) {
  if (L == 0) {
    if (G) out.emit(3, G);
    return;
  }
  const uint8_t* ref_left = ref_gap;       // [0, L)
  const uint8_t* ref_right = ref_gap + G;  // [G, G+L)
  const int64_t Wm = L + 1;
  std::vector<int32_t> Hl(Wm * Wm), Hr(Wm * Wm);
  std::vector<uint8_t> qrev(L), rrev(L);
  for (int64_t t = 0; t < L; ++t) {
    qrev[t] = qg[L - 1 - t];
    rrev[t] = ref_right[L - 1 - t];
  }
  prefix_matrix_core(qg, L, ref_left, L, match, mismatch, gap_open,
                     gap_extend, Hl.data());
  prefix_matrix_core(qrev.data(), L, rrev.data(), L, match, mismatch,
                     gap_open, gap_extend, Hr.data());

  // M[a, j] = Hl[a, j] + Hr[L-a, L-j]; col_best[j] = max_a M[a, j]
  // (+ motif bonus); j_star / a_star = first maxima (numpy argmax order).
  std::vector<int64_t> col_best(Wm, INT64_MIN);
  for (int64_t j = 0; j <= L; ++j) {
    for (int64_t a = 0; a <= L; ++a) {
      const int64_t v = static_cast<int64_t>(Hl[a * Wm + j]) +
                        Hr[(L - a) * Wm + (L - j)];
      if (v > col_best[j]) col_best[j] = v;
    }
  }
  if (G >= 4) {
    for (int64_t j = 0; j <= L; ++j) {
      const uint8_t don1 = ref_gap[j], don2 = ref_gap[j + 1];
      const uint8_t acc1 = ref_gap[G - 2 + j], acc2 = ref_gap[G - 1 + j];
      const bool gt_ag = don1 == 2 && don2 == 3 && acc1 == 0 && acc2 == 2;
      const bool ct_ac = don1 == 1 && don2 == 3 && acc1 == 0 && acc2 == 1;
      if (gt_ag || ct_ac) col_best[j] += bonus;
    }
  }
  int64_t j_star = 0;
  for (int64_t j = 1; j <= L; ++j) {
    if (col_best[j] > col_best[j_star]) j_star = j;
  }
  int64_t a_star = 0;
  int64_t a_best = INT64_MIN;
  for (int64_t a = 0; a <= L; ++a) {
    const int64_t v = static_cast<int64_t>(Hl[a * Wm + j_star]) +
                      Hr[(L - a) * Wm + (L - j_star)];
    if (v > a_best) {
      a_best = v;
      a_star = a;
    }
  }

  int32_t sc;
  std::vector<uint32_t> runs;
  if (a_star > 0 || j_star > 0) {
    nw_cigar_driver(qg, a_star, ref_left, j_star, match, mismatch, gap_open,
                    gap_extend, &sc, &runs);
    out.emit_runs(runs);
  }
  out.emit(3, G);
  if (a_star < L || j_star < L) {
    nw_cigar_driver(qg + a_star, L - a_star, ref_right + j_star, L - j_star,
                    match, mismatch, gap_open, gap_extend, &sc, &runs);
    out.emit_runs(runs);
  }
}

// ---------------------------------------------------------------------------
// Python wrappers for the pairwise primitives.

PyObject* py_nw_banded(PyObject*, PyObject* args) {
  Py_buffer qb, rb;
  int band;
  int match, mismatch, gap_open, gap_extend;
  if (!PyArg_ParseTuple(args, "y*y*iiiii", &qb, &rb, &band, &match,
                        &mismatch, &gap_open, &gap_extend)) {
    return nullptr;
  }
  int32_t score = 0;
  std::vector<uint32_t> ops;
  bool ok = false;
  Py_BEGIN_ALLOW_THREADS
  ok = nw_banded_core(static_cast<const uint8_t*>(qb.buf), qb.len,
                      static_cast<const uint8_t*>(rb.buf), rb.len, band,
                      match, mismatch, gap_open, gap_extend, &score, &ops);
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&qb);
  PyBuffer_Release(&rb);
  if (!ok) Py_RETURN_NONE;
  PyObject* cig = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(ops.data()),
      static_cast<Py_ssize_t>(ops.size() * sizeof(uint32_t)));
  if (cig == nullptr) return nullptr;
  return Py_BuildValue("(iN)", score, cig);
}

PyObject* py_extend(PyObject*, PyObject* args) {
  Py_buffer qb, rb;
  int match, mismatch, gap_open, gap_extend, zdrop;
  if (!PyArg_ParseTuple(args, "y*y*iiiii", &qb, &rb, &match, &mismatch,
                        &gap_open, &gap_extend, &zdrop)) {
    return nullptr;
  }
  int32_t best = 0;
  int64_t bi = 0, bj = 0;
  std::vector<uint32_t> ops;
  Py_BEGIN_ALLOW_THREADS
  extend_core(static_cast<const uint8_t*>(qb.buf), qb.len,
              static_cast<const uint8_t*>(rb.buf), rb.len, match, mismatch,
              gap_open, gap_extend, zdrop, &best, &bi, &bj, &ops);
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&qb);
  PyBuffer_Release(&rb);
  static const char kEmpty[] = "";
  const char* data =
      ops.empty() ? kEmpty : reinterpret_cast<const char*>(ops.data());
  return Py_BuildValue("(iLLy#)", (int)best, (long long)bi, (long long)bj,
                       data, (Py_ssize_t)(ops.size() * sizeof(uint32_t)));
}

PyObject* py_prefix_matrix(PyObject*, PyObject* args) {
  Py_buffer qb, rb;
  int match, mismatch, gap_open, gap_extend;
  if (!PyArg_ParseTuple(args, "y*y*iiii", &qb, &rb, &match, &mismatch,
                        &gap_open, &gap_extend)) {
    return nullptr;
  }
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
  prefix_matrix_core(static_cast<const uint8_t*>(qb.buf), n,
                     static_cast<const uint8_t*>(rb.buf), m, match, mismatch,
                     gap_open, gap_extend, H);
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&qb);
  PyBuffer_Release(&rb);
  return out;
}

// ---------------------------------------------------------------------------
// The whole GenomeAligner._stitch inner loop as one reusable core:
// inter-anchor gap cigars, gapped splice-junction placement, both-end
// z-drop extensions and match counting.  Shared by py_stitch (one chain)
// and py_select_stitch_batch (a whole chunk's chains).
struct StitchParams {
  int k, min_intron, bonus, ext_cap;
  int nw_m, nw_x, nw_go, nw_ge;
  int ex_m, ex_x, ex_go, ex_ge, ex_z;
};

struct StitchResult {
  int64_t q_st, r_st, q_en, r_en, mlen, blen;
  Cigar cigar;
};

void stitch_one(const uint8_t* qc, int64_t qlen, const uint8_t* g,
                const int64_t* r, const int64_t* q, int64_t na,
                int64_t ctg_lo, int64_t ctg_hi, const StitchParams& P,
                StitchResult* out) {
  const int k = P.k;
  const int min_intron = P.min_intron;
  const int bonus = P.bonus;
  const int ext_cap = P.ext_cap;
  const int nw_m = P.nw_m, nw_x = P.nw_x, nw_go = P.nw_go, nw_ge = P.nw_ge;
  const int ex_m = P.ex_m, ex_x = P.ex_x, ex_go = P.ex_go, ex_ge = P.ex_ge,
            ex_z = P.ex_z;
  Cigar& cigar = out->cigar;
  cigar.ops.clear();
  int64_t q_st = 0, r_st = 0, q_en = 0, r_en = 0;
  int64_t mlen = 0, blen = 0;
  {
    std::vector<uint32_t> runs;
    int32_t sc;
    int64_t q_cur = q[0], r_cur = r[0];
    for (int64_t t = 1; t < na; ++t) {
      if (q[t] <= q_cur || r[t] <= r_cur) {
        continue;  // anchor swallowed by a widened splice window
      }
      const int64_t dq = q[t] - q_cur;
      const int64_t dr = r[t] - r_cur;
      if (dr - dq >= min_intron) {
        // Widen the junction window past the flanking anchors (see
        // _stitch_py): trim up to k+6 trailing M off the cigar and absorb
        // the next anchor's k-mer, then let the gapped splice aligner
        // decide the boundary.
        int64_t back = 0;
        const int64_t limit = k + 6;
        while (!cigar.ops.empty() && (cigar.ops.back() & 0xfu) == 0 &&
               back < limit) {
          const int64_t l0 = cigar.ops.back() >> 4;
          const int64_t take = std::min(l0, limit - back);
          if (take == l0) {
            cigar.ops.pop_back();
          } else {
            cigar.ops.back() =
                (static_cast<uint32_t>(l0 - take) << 4) | 0u;
          }
          back += take;
        }
        const int64_t q0 = q_cur - back, r0 = r_cur - back;
        const int64_t q1 = q[t] + k, r1 = r[t] + k;
        splice_junction_core(qc + q0, q1 - q0, g + r0, dr - dq, nw_m, nw_x,
                             nw_go, nw_ge, bonus, cigar);
        q_cur = q1;
        r_cur = r1;
        continue;
      }
      if (dq == dr) {
        cigar.emit(0, dq);
      } else if (dq == 0) {
        cigar.emit(2, dr);
      } else if (dr == 0) {
        cigar.emit(1, dq);
      } else {
        nw_cigar_driver(qc + q_cur, dq, g + r_cur, dr, nw_m, nw_x, nw_go,
                        nw_ge, &sc, &runs);
        cigar.emit_runs(runs);
      }
      q_cur = q[t];
      r_cur = r[t];
    }
    if (q_cur <= q[na - 1]) {
      const int64_t tail_m = q[na - 1] + k - q_cur;
      cigar.emit(0, tail_m);
      q_cur += tail_m;
      r_cur += tail_m;
    }

    q_st = q[0];
    r_st = r[0];
    q_en = q_cur;
    r_en = r_cur;

    // right extension
    const int64_t tail_n = std::min<int64_t>(ext_cap, qlen - q_en);
    const int64_t rt_n =
        std::min<int64_t>(ctg_hi, r_en + tail_n + 64) - r_en;
    if (tail_n > 0 && rt_n > 0) {
      int32_t best;
      int64_t qi, rj;
      extend_core(qc + q_en, tail_n, g + r_en, rt_n, ex_m, ex_x, ex_go,
                  ex_ge, ex_z, &best, &qi, &rj, &runs);
      cigar.emit_runs(runs);
      q_en += qi;
      r_en += rj;
    }

    // left extension (on reversed sequences)
    const int64_t head_n = q_st - std::max<int64_t>(0, q_st - ext_cap);
    const int64_t rh_n =
        r_st - std::max<int64_t>(ctg_lo, r_st - head_n - 64);
    if (head_n > 0 && rh_n > 0) {
      std::vector<uint8_t> head(head_n), rhead(rh_n);
      for (int64_t t = 0; t < head_n; ++t) head[t] = qc[q_st - 1 - t];
      for (int64_t t = 0; t < rh_n; ++t) rhead[t] = g[r_st - 1 - t];
      int32_t best;
      int64_t qi, rj;
      extend_core(head.data(), head_n, rhead.data(), rh_n, ex_m, ex_x,
                  ex_go, ex_ge, ex_z, &best, &qi, &rj, &runs);
      std::reverse(runs.begin(), runs.end());
      Cigar merged;
      merged.emit_runs(runs);
      merged.emit_runs(cigar.ops);
      cigar.ops = std::move(merged.ops);
      q_st -= qi;
      r_st -= rj;
    }

    // match counting (models/aligner.py::_count_matches)
    int64_t qi = q_st, ri = r_st;
    for (const uint32_t run : cigar.ops) {
      const int64_t l = run >> 4;
      const uint32_t op = run & 0xfu;
      if (op == 0) {
        for (int64_t t = 0; t < l; ++t) {
          if (qc[qi + t] == g[ri + t]) ++mlen;
        }
        blen += l;
        qi += l;
        ri += l;
      } else if (op == 1) {
        qi += l;
      } else if (op == 2 || op == 3) {
        blen += l;
        ri += l;
      }
    }
  }
  out->q_st = q_st;
  out->r_st = r_st;
  out->q_en = q_en;
  out->r_en = r_en;
  out->mlen = mlen;
  out->blen = blen;
}

// ---------------------------------------------------------------------------
// stitch(qc, gcodes, r_i64, q_i64, k, ctg_lo, ctg_hi, min_intron,
//        splice_bonus, ext_cap,
//        nw_match, nw_mismatch, nw_go, nw_ge,
//        ext_match, ext_mismatch, ext_go, ext_ge, ext_zdrop)
//   -> (q_st, r_st, q_en, r_en, mlen, blen, cigar_u32_bytes)
//
// Native twin of models/aligner.py::_stitch_py: r/q are the chain's
// global-reference / query anchor starts, qc the (strand-oriented) query
// codes, gcodes the whole packed genome; [ctg_lo, ctg_hi) bound the end
// extensions to the anchor contig.  Coordinates returned are global; the
// Python wrapper maps them to contig-local Hit fields.
PyObject* py_stitch(PyObject*, PyObject* args) {
  Py_buffer qc_b, g_b, r_b, q_b;
  StitchParams P;
  long long ctg_lo, ctg_hi;
  if (!PyArg_ParseTuple(args, "y*y*y*y*iLLiii" "iiii" "iiiii", &qc_b, &g_b,
                        &r_b, &q_b, &P.k, &ctg_lo, &ctg_hi, &P.min_intron,
                        &P.bonus, &P.ext_cap, &P.nw_m, &P.nw_x, &P.nw_go,
                        &P.nw_ge, &P.ex_m, &P.ex_x, &P.ex_go, &P.ex_ge,
                        &P.ex_z)) {
    return nullptr;
  }
  StitchResult res;
  Py_BEGIN_ALLOW_THREADS
  stitch_one(static_cast<const uint8_t*>(qc_b.buf), qc_b.len,
             static_cast<const uint8_t*>(g_b.buf),
             static_cast<const int64_t*>(r_b.buf),
             static_cast<const int64_t*>(q_b.buf),
             r_b.len / static_cast<int64_t>(sizeof(int64_t)), ctg_lo, ctg_hi,
             P, &res);
  Py_END_ALLOW_THREADS

  PyBuffer_Release(&qc_b);
  PyBuffer_Release(&g_b);
  PyBuffer_Release(&r_b);
  PyBuffer_Release(&q_b);
  static const char kEmpty[] = "";
  const char* data = res.cigar.ops.empty()
                         ? kEmpty
                         : reinterpret_cast<const char*>(res.cigar.ops.data());
  return Py_BuildValue("(LLLLLLy#)", (long long)res.q_st, (long long)res.r_st,
                       (long long)res.q_en, (long long)res.r_en,
                       (long long)res.mlen, (long long)res.blen, data,
                       (Py_ssize_t)(res.cigar.ops.size() * sizeof(uint32_t)));
}

// ---------------------------------------------------------------------------
// select_stitch_batch: GenomeAligner._select_and_stitch (secondary=False)
// for a whole chunk of reads in one call -- chain selection by query-
// extent overlap, stitching of the survivors via stitch_one, the mapq
// uniqueness model and the final score sort, all at C++ speed with the
// GIL released (reference roles: minimap2's mm_set_parent/mm_mapq +
// ksw2 gap filling; Python oracle models/aligner.py:130-206, parity
// fuzz tests/test_select_native.py).
//
// select_stitch_batch(qcodes, qoff_i64[R+1], gcodes,
//                     ctg_starts_i64[n], ctg_lens_i64[n],
//                     cand_off_i64[R+1], cand_score_f64[C],
//                     cand_qs_i32[C], cand_qe_i32[C], cand_strand_i8[C],
//                     anc_off_i64[C+1], anc_r_i64[sumA], anc_q_i64[sumA],
//                     max_hits, k, ctg-independent stitch params...,
//                     n_threads)
//   -> [ [ (ctg_idx, strand, q_st, q_en, r_st, r_en, mlen, blen,
//           score, mapq, cigar_u32_bytes), ... ]  per read ]
//
// Coordinates in the result are contig-local and strand-oriented,
// exactly the Hit fields; candidate order within a read must match the
// Python path's insertion order (stable sort reproduces CPython's
// list.sort tie behavior).
namespace selstitch {

struct HitRec {
  int ctg;
  int64_t oq_st, oq_en, local_st, local_en1, mlen, blen;
  double score;
  int mapq;
  // pre-stitch winner reference span for the mapq credit test
  int64_t w_lo, w_hi;
  int strand;
  Cigar cigar;
};

struct Inputs {
  const int8_t* qcodes;
  const int64_t* qoff;
  const uint8_t* g;
  const int64_t* ctg_starts;
  const int64_t* ctg_lens;
  int64_t n_ctg;
  const int64_t* cand_off;
  const double* score;
  const int32_t* qs;
  const int32_t* qe;
  const int8_t* strand;
  const int64_t* anc_off;
  const int64_t* anc_r;
  const int64_t* anc_q;
  int max_hits;
  StitchParams P;
};

// genome.locate twin (io/genome.py:250-268): bisect_right(starts)-1
// with the local < contig_len validity check; returns contig index or
// -1, local position via *local (-1 when invalid, matching Python's
// (None, -1) tuple whose local the caller may still consume).
int locate(const Inputs& in, int64_t gpos, int64_t* local) {
  const int64_t* s = in.ctg_starts;
  int64_t i = std::upper_bound(s, s + in.n_ctg, gpos) - s - 1;
  if (i < 0) {
    *local = -1;
    return -1;
  }
  int64_t loc = gpos - s[i];
  if (loc >= in.ctg_lens[i]) {
    *local = -1;
    return -1;
  }
  *local = loc;
  return static_cast<int>(i);
}

void select_read(const Inputs& in, int64_t ri, std::vector<HitRec>* out) {
  const int64_t c0 = in.cand_off[ri], c1 = in.cand_off[ri + 1];
  const int64_t n = c1 - c0;
  if (n <= 0) return;
  const int64_t q0 = in.qoff[ri];
  const int64_t qlen = in.qoff[ri + 1] - q0;
  const uint8_t* qc_fwd = reinterpret_cast<const uint8_t*>(in.qcodes) + q0;
  std::vector<uint8_t> rc;  // lazily-built reverse complement

  // stable sort desc by score == CPython list.sort(reverse=True)
  std::vector<int64_t> order(n);
  for (int64_t i = 0; i < n; ++i) order[i] = c0 + i;
  std::stable_sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    return in.score[a] > in.score[b];
  });

  std::vector<HitRec>& selected = *out;
  std::vector<double> sub_best;
  StitchResult res;

  // credit(): a masked candidate raises the winner's s2 only when it is
  // a genuinely different placement (models/aligner.py:147-160)
  auto credit = [&](size_t si, int64_t ci) {
    const int64_t a0 = in.anc_off[ci];
    const int64_t na = in.anc_off[ci + 1] - a0;
    const int64_t c_lo = in.anc_r[a0];
    const int64_t c_hi = in.anc_r[a0 + na - 1] + in.P.k;
    const HitRec& w = selected[si];
    const bool alt = (in.strand[ci] != w.strand) ||
                     (std::min(c_hi, w.w_hi) <= std::max(c_lo, w.w_lo));
    if (alt) sub_best[si] = std::max(sub_best[si], in.score[ci]);
  };

  for (int64_t oi = 0; oi < n; ++oi) {
    const int64_t ci = order[oi];
    if (static_cast<int>(selected.size()) >= in.max_hits) break;
    const int64_t qs = in.qs[ci], qe = in.qe[ci];
    // pre-stitch extent check against the stitched spans of the winners
    ptrdiff_t clash = -1;
    for (size_t si = 0; si < selected.size(); ++si) {
      const int64_t ov = std::min(qe, selected[si].oq_en) -
                         std::max(qs, selected[si].oq_st);
      if (2 * ov > std::min(qe - qs, selected[si].oq_en - selected[si].oq_st)) {
        clash = static_cast<ptrdiff_t>(si);
        break;
      }
    }
    if (clash >= 0) {
      credit(static_cast<size_t>(clash), ci);
      continue;
    }
    // ---- stitch (models/aligner.py::_stitch native path, g_base 0)
    const int64_t a0 = in.anc_off[ci];
    const int64_t na = in.anc_off[ci + 1] - a0;
    const int64_t* r = in.anc_r + a0;
    const int64_t* q = in.anc_q + a0;
    int64_t unused;
    const int ctg = locate(in, r[0], &unused);
    if (ctg < 0) continue;  // hit is None: skipped with NO credit
    const int64_t ctg_lo = in.ctg_starts[ctg];
    const int64_t ctg_hi = ctg_lo + in.ctg_lens[ctg];
    const uint8_t* qc = qc_fwd;
    if (in.strand[ci] < 0) {
      if (rc.empty() && qlen > 0) {
        static const uint8_t comp[6] = {3, 2, 1, 0, 4, 5};
        rc.resize(qlen);
        for (int64_t i = 0; i < qlen; ++i) rc[i] = comp[qc_fwd[qlen - 1 - i]];
      }
      qc = rc.data();
    }
    stitch_one(qc, qlen, in.g, r, q, na, ctg_lo, ctg_hi, in.P, &res);
    int64_t local_st, local_en;
    const int ctg2 = locate(in, res.r_st, &local_st);
    if (ctg2 != ctg) continue;  // crossed a contig: None, no credit
    locate(in, res.r_en - 1, &local_en);
    const int64_t oq_st = in.strand[ci] > 0 ? res.q_st : qlen - res.q_en;
    const int64_t oq_en = in.strand[ci] > 0 ? res.q_en : qlen - res.q_st;
    // re-check with the stitched (extended) extent
    clash = -1;
    for (size_t si = 0; si < selected.size(); ++si) {
      const int64_t ov =
          std::min(oq_en, selected[si].oq_en) - std::max(oq_st, selected[si].oq_st);
      if (2 * ov >
          std::min(oq_en - oq_st, selected[si].oq_en - selected[si].oq_st)) {
        clash = static_cast<ptrdiff_t>(si);
        break;
      }
    }
    if (clash >= 0) {
      credit(static_cast<size_t>(clash), ci);
      continue;
    }
    HitRec h;
    h.ctg = ctg;
    h.strand = in.strand[ci];
    h.oq_st = oq_st;
    h.oq_en = oq_en;
    h.local_st = local_st;
    h.local_en1 = local_en + 1;
    h.mlen = res.mlen;
    h.blen = res.blen;
    h.score = in.score[ci];
    h.mapq = 60;
    h.w_lo = r[0];
    h.w_hi = r[na - 1] + in.P.k;
    h.cigar.ops.swap(res.cigar.ops);
    selected.push_back(std::move(h));
    sub_best.push_back(0.0);
  }
  // mapq uniqueness model (models/aligner.py:193-196)
  for (size_t si = 0; si < selected.size(); ++si) {
    const double s2 = sub_best[si];
    if (s2 <= 0) {
      selected[si].mapq = 60;
    } else {
      const double s1 = std::max(selected[si].score, 1e-9);
      const int m = static_cast<int>(40.0 * (1.0 - s2 / s1));
      selected[si].mapq = std::max(0, std::min(60, m));
    }
  }
  std::stable_sort(selected.begin(), selected.end(),
                   [](const HitRec& a, const HitRec& b) {
                     return a.score > b.score;
                   });
}

}  // namespace selstitch

PyObject* py_select_stitch_batch(PyObject*, PyObject* args) {
  Py_buffer qc_b, qoff_b, g_b, cs_b, cl_b, co_b, sc_b, qs_b, qe_b, st_b,
      ao_b, ar_b, aq_b;
  selstitch::Inputs in;
  int n_threads;
  if (!PyArg_ParseTuple(
          args, "y*y*y*y*y*y*y*y*y*y*y*y*y*ii" "iii" "iiii" "iiiiii",
          &qc_b, &qoff_b, &g_b, &cs_b, &cl_b, &co_b, &sc_b, &qs_b, &qe_b,
          &st_b, &ao_b, &ar_b, &aq_b, &in.max_hits, &in.P.k,
          &in.P.min_intron, &in.P.bonus, &in.P.ext_cap, &in.P.nw_m,
          &in.P.nw_x, &in.P.nw_go, &in.P.nw_ge, &in.P.ex_m, &in.P.ex_x,
          &in.P.ex_go, &in.P.ex_ge, &in.P.ex_z, &n_threads)) {
    return nullptr;
  }
  in.qcodes = static_cast<const int8_t*>(qc_b.buf);
  in.qoff = static_cast<const int64_t*>(qoff_b.buf);
  in.g = static_cast<const uint8_t*>(g_b.buf);
  in.ctg_starts = static_cast<const int64_t*>(cs_b.buf);
  in.ctg_lens = static_cast<const int64_t*>(cl_b.buf);
  in.n_ctg = cs_b.len / static_cast<int64_t>(sizeof(int64_t));
  in.cand_off = static_cast<const int64_t*>(co_b.buf);
  in.score = static_cast<const double*>(sc_b.buf);
  in.qs = static_cast<const int32_t*>(qs_b.buf);
  in.qe = static_cast<const int32_t*>(qe_b.buf);
  in.strand = static_cast<const int8_t*>(st_b.buf);
  in.anc_off = static_cast<const int64_t*>(ao_b.buf);
  in.anc_r = static_cast<const int64_t*>(ar_b.buf);
  in.anc_q = static_cast<const int64_t*>(aq_b.buf);
  const int64_t n_reads =
      qoff_b.len / static_cast<int64_t>(sizeof(int64_t)) - 1;

  std::vector<std::vector<selstitch::HitRec>> results(
      std::max<int64_t>(n_reads, 0));
  Py_BEGIN_ALLOW_THREADS {
    if (n_threads > 1 && n_reads > 1) {
      std::atomic<int64_t> next(0);
      auto worker = [&]() {
        for (;;) {
          const int64_t ri = next.fetch_add(1);
          if (ri >= n_reads) break;
          selstitch::select_read(in, ri, &results[ri]);
        }
      };
      std::vector<std::thread> pool;
      const int nt = std::min<int64_t>(n_threads, n_reads);
      pool.reserve(nt);
      for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
      for (auto& th : pool) th.join();
    } else {
      for (int64_t ri = 0; ri < n_reads; ++ri) {
        selstitch::select_read(in, ri, &results[ri]);
      }
    }
  }
  Py_END_ALLOW_THREADS

  PyBuffer_Release(&qc_b);
  PyBuffer_Release(&qoff_b);
  PyBuffer_Release(&g_b);
  PyBuffer_Release(&cs_b);
  PyBuffer_Release(&cl_b);
  PyBuffer_Release(&co_b);
  PyBuffer_Release(&sc_b);
  PyBuffer_Release(&qs_b);
  PyBuffer_Release(&qe_b);
  PyBuffer_Release(&st_b);
  PyBuffer_Release(&ao_b);
  PyBuffer_Release(&ar_b);
  PyBuffer_Release(&aq_b);

  PyObject* outer = PyList_New(results.size());
  if (!outer) return nullptr;
  static const char kEmpty[] = "";
  for (size_t ri = 0; ri < results.size(); ++ri) {
    PyObject* inner = PyList_New(results[ri].size());
    if (!inner) {
      Py_DECREF(outer);
      return nullptr;
    }
    for (size_t hi = 0; hi < results[ri].size(); ++hi) {
      const selstitch::HitRec& h = results[ri][hi];
      const char* data =
          h.cigar.ops.empty()
              ? kEmpty
              : reinterpret_cast<const char*>(h.cigar.ops.data());
      PyObject* t = Py_BuildValue(
          "(iiLLLLLLdiy#)", h.ctg, h.strand, (long long)h.oq_st,
          (long long)h.oq_en, (long long)h.local_st, (long long)h.local_en1,
          (long long)h.mlen, (long long)h.blen, h.score, h.mapq, data,
          (Py_ssize_t)(h.cigar.ops.size() * sizeof(uint32_t)));
      if (!t) {
        Py_DECREF(inner);
        Py_DECREF(outer);
        return nullptr;
      }
      PyList_SET_ITEM(inner, hi, t);
    }
    PyList_SET_ITEM(outer, ri, inner);
  }
  return outer;
}

// center_star(units_i8_concat, offsets_i64[U+1], match, mismatch,
//             gap_open, gap_extend) -> consensus int8 bytes
//
// Native twin of ops/ccs.py::center_star_consensus for U >= 2 units on
// the host path (the device path injects precomputed cigars and keeps
// the Python implementation): banded-NW alignment of every unit to the
// median-length representative, per-column {A,C,G,T,N,del} vote with the
// representative's half-vote tie-break, and majority insertion slots
// with Counter.most_common() semantics (max count, ties to the
// first-seen length, donor = first unit holding the modal length).
PyObject* py_center_star(PyObject*, PyObject* args) {
  Py_buffer ub, ob;
  int match, mismatch, go, ge;
  if (!PyArg_ParseTuple(args, "y*y*iiii", &ub, &ob, &match, &mismatch, &go,
                        &ge)) {
    return nullptr;
  }
  const uint8_t* data = static_cast<const uint8_t*>(ub.buf);
  const int64_t* offs = static_cast<const int64_t*>(ob.buf);
  const int64_t U = ob.len / static_cast<Py_ssize_t>(sizeof(int64_t)) - 1;

  std::vector<int8_t> cons;
  Py_BEGIN_ALLOW_THREADS {
    // median-length representative (stable sort by length)
    std::vector<int64_t> order(U);
    for (int64_t t = 0; t < U; ++t) order[t] = t;
    std::stable_sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
      return (offs[a + 1] - offs[a]) < (offs[b + 1] - offs[b]);
    });
    const int64_t rep_i = order[U / 2];
    const uint8_t* rep = data + offs[rep_i];
    const int64_t n = offs[rep_i + 1] - offs[rep_i];

    std::vector<int8_t> base_mat(U * n, -1);
    std::vector<int32_t> ins_len(U * (n + 1), 0);
    std::vector<int64_t> ins_qi(U * (n + 1), -1);
    std::vector<uint32_t> runs;
    int32_t sc;
    for (int64_t ui = 0; ui < U; ++ui) {
      const uint8_t* u = data + offs[ui];
      const int64_t nu = offs[ui + 1] - offs[ui];
      int8_t* row = base_mat.data() + ui * n;
      if (ui == rep_i) {
        for (int64_t j = 0; j < n; ++j) row[j] = static_cast<int8_t>(rep[j]);
        continue;
      }
      nw_cigar_driver(u, nu, rep, n, match, mismatch, go, ge, &sc, &runs);
      int64_t qi = 0, ri = 0;
      for (const uint32_t run : runs) {
        const int64_t l = run >> 4;
        const uint32_t op = run & 0xfu;
        if (op == 0) {
          for (int64_t t = 0; t < l; ++t) {
            row[ri + t] = static_cast<int8_t>(u[qi + t]);
          }
          qi += l;
          ri += l;
        } else if (op == 1) {
          ins_len[ui * (n + 1) + ri] = static_cast<int32_t>(l);
          ins_qi[ui * (n + 1) + ri] = qi;
          qi += l;
        } else {
          ri += l;
        }
      }
    }

    // per-column vote over {A, C, G, T, N, del}; representative's own
    // call gets a half-vote (doubled counts + 1)
    std::vector<int8_t> winner(n);
    std::vector<uint8_t> keep(n);
    for (int64_t j = 0; j < n; ++j) {
      int32_t counts[6] = {0, 0, 0, 0, 0, 0};
      for (int64_t ui = 0; ui < U; ++ui) {
        const int8_t v = base_mat[ui * n + j];
        ++counts[v < 0 ? 5 : v];
      }
      int64_t c2[6];
      for (int t = 0; t < 6; ++t) c2[t] = 2 * counts[t];
      c2[rep[j]] += 1;
      int w = 0;
      for (int t = 1; t < 6; ++t) {
        if (c2[t] > c2[w]) w = t;  // np.argmax: first maximum
      }
      winner[j] = static_cast<int8_t>(w);
      keep[j] = w < 5;
    }

    // majority insertion slots
    std::vector<int64_t> qual;
    for (int64_t p = 0; p <= n; ++p) {
      int sup = 0;
      for (int64_t ui = 0; ui < U; ++ui) {
        if (ins_len[ui * (n + 1) + p] > 0) ++sup;
      }
      if (2 * sup > U) qual.push_back(p);
    }

    if (qual.empty()) {
      bool any = false;
      for (int64_t j = 0; j < n; ++j) any = any || keep[j];
      if (!any) {
        cons.assign(rep, rep + n);
      } else {
        for (int64_t j = 0; j < n; ++j) {
          if (keep[j]) cons.push_back(winner[j]);
        }
      }
    } else {
      int64_t prev = 0;
      for (const int64_t p : qual) {
        for (int64_t j = prev; j < p; ++j) {
          if (keep[j]) cons.push_back(winner[j]);
        }
        // modal insert length: max count, ties to first-seen (the
        // Counter.most_common(1) contract -- sorted() is stable over
        // insertion order)
        std::vector<std::pair<int32_t, int32_t>> freq;  // (len, count)
        for (int64_t ui = 0; ui < U; ++ui) {
          const int32_t l = ins_len[ui * (n + 1) + p];
          if (l <= 0) continue;
          bool seen = false;
          for (auto& f : freq) {
            if (f.first == l) {
              ++f.second;
              seen = true;
              break;
            }
          }
          if (!seen) freq.emplace_back(l, 1);
        }
        int32_t mode = freq[0].first, bestc = freq[0].second;
        for (const auto& f : freq) {
          if (f.second > bestc) {
            mode = f.first;
            bestc = f.second;
          }
        }
        for (int64_t ui = 0; ui < U; ++ui) {
          if (ins_len[ui * (n + 1) + p] == mode) {
            const uint8_t* u = data + offs[ui];
            const int64_t qi = ins_qi[ui * (n + 1) + p];
            for (int32_t t = 0; t < mode; ++t) {
              cons.push_back(static_cast<int8_t>(u[qi + t]));
            }
            break;
          }
        }
        prev = p;
      }
      for (int64_t j = prev; j < n; ++j) {
        if (keep[j]) cons.push_back(winner[j]);
      }
      if (cons.empty()) cons.assign(rep, rep + n);
    }
  }
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&ub);
  PyBuffer_Release(&ob);
  static const char kEmpty[1] = {0};
  const char* out = cons.empty() ? kEmpty
                                 : reinterpret_cast<const char*>(cons.data());
  return Py_BuildValue("y#", out, (Py_ssize_t)cons.size());
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
    {"center_star", py_center_star, METH_VARARGS,
     "center_star(units_i8_concat, offsets_i64, match, mismatch, gap_open, "
     "gap_extend) -> consensus int8 bytes"},
    {"stitch", py_stitch, METH_VARARGS,
     "stitch(qc, gcodes, r_i64, q_i64, k, ctg_lo, ctg_hi, min_intron, "
     "splice_bonus, ext_cap, nw_scores x4, ext_scores x5) -> "
     "(q_st, r_st, q_en, r_en, mlen, blen, cigar_u32_bytes)"},
    {"select_stitch_batch", py_select_stitch_batch, METH_VARARGS,
     "select_stitch_batch(qcodes, qoff, gcodes, ctg_starts, ctg_lens, "
     "cand_off, cand_score, cand_qs, cand_qe, cand_strand, anc_off, "
     "anc_r, anc_q, max_hits, k, min_intron, splice_bonus, ext_cap, "
     "nw_scores x4, ext_scores x5, n_threads) -> per-read hit tuples"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "_nwcore",
    "native banded global alignment with traceback", -1, kMethods,
    nullptr, nullptr, nullptr, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit__nwcore() { return PyModule_Create(&kModule); }
