// _chaincore: native colinear-chaining DP.
//
// The anchor-chaining recurrence (models/aligner.py::_chain) is the one
// host-bound sequential loop of the seed-chain-extend aligner -- the role
// minimap2's mm_chain_dp (C) plays for the reference.  The DP itself is a
// windowed scan over sorted anchors; this extension runs it at C++ speed
// and returns (f, pre) for the Python backtrack.
//
// Scoring must stay bit-identical to the Python fallback:
//   alpha = min(dq, dr, k)
//   skip  = 0.1 * max(0, dq - 2k)          (anti-spiral penalty)
//   pen   = dr >= dq ? log2(g + 1) + skip
//                    : 0.5*g + 0.5*log2(g + 1) + skip     (g = |dr - dq|)
//   f[i]  = max(k, max_j f[j] + alpha - pen)

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

PyObject* py_chain(PyObject*, PyObject* args) {
  Py_buffer rb, qb, cb;
  int k, window;
  long max_gap_r, max_gap_q;
  if (!PyArg_ParseTuple(args, "y*y*y*iill", &rb, &qb, &cb, &k, &window,
                        &max_gap_r, &max_gap_q)) {
    return nullptr;
  }
  const int64_t* r = static_cast<const int64_t*>(rb.buf);
  const int64_t* q = static_cast<const int64_t*>(qb.buf);
  const int64_t* ctg = static_cast<const int64_t*>(cb.buf);
  const Py_ssize_t n = rb.len / static_cast<Py_ssize_t>(sizeof(int64_t));

  std::vector<double> f(n, static_cast<double>(k));
  std::vector<int64_t> pre(n, -1);

  // log2(g+1) table: std::log2 costs ~dozens of cycles per candidate
  // pair and most gaps are small; table entries ARE std::log2 results,
  // so scores stay bit-identical to the direct computation.
  static const std::vector<double>& kLog2 = *[] {
    auto* t = new std::vector<double>(65536);
    for (size_t g = 0; g < t->size(); ++g) {
      (*t)[g] = std::log2(static_cast<double>(g) + 1.0);
    }
    return t;
  }();

  Py_BEGIN_ALLOW_THREADS
  for (Py_ssize_t i = 1; i < n; ++i) {
    const int64_t ri = r[i], qi = q[i], ci = ctg[i];
    double best = f[i];
    int64_t best_j = -1;
    const Py_ssize_t j0 = std::max<Py_ssize_t>(0, i - window);
    for (Py_ssize_t j = j0; j < i; ++j) {
      const int64_t dr = ri - r[j];
      const int64_t dq = qi - q[j];
      if (dr <= 0 || dq <= 0 || dq > max_gap_q || dr > max_gap_r ||
          ctg[j] != ci) {
        continue;
      }
      const double alpha =
          static_cast<double>(std::min<int64_t>(std::min(dq, dr), k));
      const int64_t gi = std::llabs(dr - dq);
      const double lg = gi < 65536
                            ? kLog2[gi]
                            : std::log2(static_cast<double>(gi) + 1.0);
      const double skip =
          0.1 * std::max(0.0, static_cast<double>(dq) - 2.0 * k);
      double pen;
      if (dr >= dq) {
        pen = lg + skip;
      } else {
        pen = 0.5 * static_cast<double>(gi) + 0.5 * lg + skip;
      }
      const double cand = f[j] + alpha - pen;
      if (cand > best) {
        best = cand;
        best_j = static_cast<int64_t>(j);
      }
    }
    f[i] = best;
    pre[i] = best_j;
  }
  Py_END_ALLOW_THREADS

  PyObject* fout = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(f.data()),
      static_cast<Py_ssize_t>(n * sizeof(double)));
  PyObject* pout = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(pre.data()),
      static_cast<Py_ssize_t>(n * sizeof(int64_t)));
  PyBuffer_Release(&rb);
  PyBuffer_Release(&qb);
  PyBuffer_Release(&cb);
  if (fout == nullptr || pout == nullptr) {
    Py_XDECREF(fout);
    Py_XDECREF(pout);
    return nullptr;
  }
  PyObject* tup = PyTuple_Pack(2, fout, pout);
  Py_DECREF(fout);
  Py_DECREF(pout);
  return tup;
}

// Winnowed-minimizer sketch, the C++ twin of models/minimizer.py::
// minimizers (the minimap2 mm_sketch role, all window ties kept).
// Two monotone-deque passes give the numpy semantics in O(n):
//   m[s]  = min(hh[s..s+w-1])            (sliding min over hashes)
//   M[p]  = max(m[s] : window s covers p) (sliding max over window minima)
//   flag[p] = hh[p] != INF && hh[p] == M[p]
// since m[s] <= hh[p] whenever s covers p, equality with the max is
// equivalent to "hh[p] equals SOME covering window's minimum".
//
// sketch_range emits positions in [lo, hi): every window minimum a flag
// depends on reaches at most w-1 hash positions outside the range, so
// chunks computed over [lo-(w-1), hi+(w-1)] extended context are exact --
// py_sketch threads over chunks and concatenates in order, giving output
// byte-identical to (and ~cores x faster than) the serial pass for the
// genome-scale index build.
struct SketchOut {
  std::vector<uint32_t> code;
  std::vector<int64_t> pos;
  std::vector<uint8_t> strand;
};

void sketch_range(const uint8_t* codes, int64_t L, int k, int w,
                  int64_t lo, int64_t hi, SketchOut& out) {
  const int64_t n = L - k + 1;
  if (n <= 0 || lo >= hi) return;
  constexpr uint64_t kInf = ~0ull;
  const int64_t ww = (n < w) ? (n > 0 ? n : 1) : w;
  // hash positions needed: window minima covering [lo, hi) span
  // [lo-ww+1, hi+ww-2]; clamp to [0, n)
  const int64_t elo = std::max<int64_t>(0, lo - ww + 1);
  const int64_t ehi = std::min<int64_t>(n, hi + ww - 1);
  const int64_t en = ehi - elo;

  std::vector<uint64_t> hh(en);
  std::vector<uint32_t> canon(en);
  std::vector<uint8_t> strand(en);
  const uint64_t mask = (k < 32) ? ((1ull << (2 * k)) - 1) : ~0ull;
  uint64_t fwd = 0, rev = 0;
  int64_t last_bad = elo - 1;
  // warm the rolling k-mer over [elo, elo+k-1) before the first hash
  for (int64_t p = elo; p < ehi + k - 1; ++p) {
    const uint8_t b = codes[p];
    const uint64_t bb = (b < 4) ? b : 0;
    if (b >= 4) last_bad = p;
    fwd = ((fwd << 2) | bb) & mask;
    rev = (rev >> 2) | ((3ull - bb) << (2 * (k - 1)));
    const int64_t s = p - k + 1;
    if (s < elo) continue;
    const bool ok = last_bad < s;
    const uint64_t cn = fwd < rev ? fwd : rev;
    canon[s - elo] = static_cast<uint32_t>(cn);
    strand[s - elo] = fwd <= rev ? 0 : 1;
    if (ok) {
      uint64_t x = cn;  // splitmix64 finalizer, same constants as _mix64
      x ^= x >> 33;
      x *= 0xff51afd7ed558ccdull;
      x ^= x >> 33;
      x *= 0xc4ceb9fe1a85ec53ull;
      x ^= x >> 33;
      hh[s - elo] = x;
    } else {
      hh[s - elo] = kInf;
    }
  }

  const int64_t nm = n - ww + 1;
  // window minima indices needed: s in [max(0,lo-ww+1), min(nm, hi))
  const int64_t mlo = std::max<int64_t>(0, lo - ww + 1);
  const int64_t mhi = std::min<int64_t>(nm, hi);
  std::vector<uint64_t> m(std::max<int64_t>(0, mhi - mlo));
  std::vector<int64_t> dq(en);
  {  // sliding min of hh, width ww, over the extended range
    int64_t head = 0, tail = 0;
    for (int64_t p = elo; p < ehi; ++p) {
      while (tail > head && hh[dq[tail - 1] - elo] >= hh[p - elo]) --tail;
      dq[tail++] = p;
      if (dq[head] <= p - ww) ++head;
      const int64_t s = p - ww + 1;
      if (s >= mlo && s < mhi) m[s - mlo] = hh[dq[head] - elo];
    }
  }
  {  // sliding max of m over the covering-window range, then flag
    int64_t head = 0, tail = 0;
    for (int64_t p = mlo; p < hi; ++p) {
      const int64_t s_new = p;
      if (s_new < mhi) {
        while (tail > head && m[dq[tail - 1] - mlo] <= m[s_new - mlo]) {
          --tail;
        }
        dq[tail++] = s_new;
      }
      const int64_t s_min = p - ww + 1;
      while (head < tail && dq[head] < s_min) ++head;
      if (p < lo) continue;  // context only
      if (head < tail && hh[p - elo] != kInf &&
          hh[p - elo] == m[dq[head] - mlo]) {
        out.code.push_back(canon[p - elo]);
        out.pos.push_back(p);
        out.strand.push_back(strand[p - elo]);
      }
    }
  }
}

PyObject* py_sketch(PyObject*, PyObject* args) {
  Py_buffer cb;
  int k, w, n_threads = 0;
  if (!PyArg_ParseTuple(args, "y*ii|i", &cb, &k, &w, &n_threads)) {
    return nullptr;
  }
  const uint8_t* codes = static_cast<const uint8_t*>(cb.buf);
  const int64_t L = cb.len;
  const int64_t n = L - k + 1;

  SketchOut merged;
  Py_BEGIN_ALLOW_THREADS
  if (n > 0) {
    if (n_threads <= 0) {
      n_threads = static_cast<int>(std::thread::hardware_concurrency());
      if (n_threads <= 0) n_threads = 1;
    }
    // threading only pays past ~2M hash positions
    const int64_t chunk_min = 2'000'000;
    int T = static_cast<int>(std::min<int64_t>(
        n_threads, std::max<int64_t>(1, n / chunk_min)));
    if (T <= 1) {
      sketch_range(codes, L, k, w, 0, n, merged);
    } else {
      std::vector<SketchOut> parts(T);
      std::vector<std::thread> threads;
      const int64_t step = (n + T - 1) / T;
      for (int t = 0; t < T; ++t) {
        const int64_t lo = t * step;
        const int64_t hi = std::min<int64_t>(n, lo + step);
        threads.emplace_back([&, t, lo, hi] {
          sketch_range(codes, L, k, w, lo, hi, parts[t]);
        });
      }
      for (auto& th : threads) th.join();
      size_t total = 0;
      for (const auto& p : parts) total += p.code.size();
      merged.code.reserve(total);
      merged.pos.reserve(total);
      merged.strand.reserve(total);
      for (const auto& p : parts) {
        merged.code.insert(merged.code.end(), p.code.begin(), p.code.end());
        merged.pos.insert(merged.pos.end(), p.pos.begin(), p.pos.end());
        merged.strand.insert(merged.strand.end(), p.strand.begin(),
                             p.strand.end());
      }
    }
  }
  Py_END_ALLOW_THREADS
  std::vector<uint32_t>& out_code = merged.code;
  std::vector<int64_t>& out_pos = merged.pos;
  std::vector<uint8_t>& out_strand = merged.strand;

  PyBuffer_Release(&cb);
  // y# with a null pointer (empty vector) builds None, not b"": route
  // empties through a valid zero-length buffer
  static const char kEmpty[1] = {0};
  auto buf = [&](const void* p, size_t sz) {
    return p == nullptr ? kEmpty : static_cast<const char*>(p);
  };
  return Py_BuildValue(
      "(y#y#y#)",
      buf(out_code.data(), out_code.size()),
      (Py_ssize_t)(out_code.size() * sizeof(uint32_t)),
      buf(out_pos.data(), out_pos.size()),
      (Py_ssize_t)(out_pos.size() * sizeof(int64_t)),
      buf(out_strand.data(), out_strand.size()),
      (Py_ssize_t)out_strand.size());
}

// Whole-index-table build (models/minimizer.py::MinimizerIndex.build's
// memory-bounded native twin): two-pass exact-allocation sketch with the
// contig-boundary filter applied in-stream, then a stable LSD radix sort
// of the (code, pos, strand) triple by code.  The python path peaks at
// ~37 GB RSS for a 1 Gb genome (i64 positions, vector-doubling parts,
// a bytes copy per array, the 16 B/minimizer sortperm pair, and the
// fancy-index copies); this path peaks at ~2x the final 9 B/minimizer
// table (+ the 1 B/base dense codes upstream), which is what makes a
// cold human-genome (3 Gb) index build feasible.
//
// Contract: identical bytes to the python build path -- emission order
// is increasing position (chunks in order), the filter drops k-mers
// whose start p satisfies end-k < p < end for any contig end, and the
// LSD radix preserves original order among equal codes exactly like
// np.argsort(kind='stable') / py_sortperm.
template <class Emit>
int64_t sketch_range_tbl(const uint8_t* codes, int64_t L, int k, int w,
                         int64_t lo, int64_t hi, const int64_t* ends,
                         int64_t n_ends, Emit&& emit) {
  const int64_t n = L - k + 1;
  if (n <= 0 || lo >= hi) return 0;
  constexpr uint64_t kInf = ~0ull;
  const int64_t ww = (n < w) ? (n > 0 ? n : 1) : w;
  const int64_t elo = std::max<int64_t>(0, lo - ww + 1);
  const int64_t ehi = std::min<int64_t>(n, hi + ww - 1);
  const int64_t en = ehi - elo;

  std::vector<uint64_t> hh(en);
  std::vector<uint32_t> canon(en);
  std::vector<uint8_t> strand(en);
  const uint64_t mask = (k < 32) ? ((1ull << (2 * k)) - 1) : ~0ull;
  uint64_t fwd = 0, rev = 0;
  int64_t last_bad = elo - 1;
  for (int64_t p = elo; p < ehi + k - 1; ++p) {
    const uint8_t b = codes[p];
    const uint64_t bb = (b < 4) ? b : 0;
    if (b >= 4) last_bad = p;
    fwd = ((fwd << 2) | bb) & mask;
    rev = (rev >> 2) | ((3ull - bb) << (2 * (k - 1)));
    const int64_t s = p - k + 1;
    if (s < elo) continue;
    const bool ok = last_bad < s;
    const uint64_t cn = fwd < rev ? fwd : rev;
    canon[s - elo] = static_cast<uint32_t>(cn);
    strand[s - elo] = fwd <= rev ? 0 : 1;
    if (ok) {
      uint64_t x = cn;
      x ^= x >> 33;
      x *= 0xff51afd7ed558ccdull;
      x ^= x >> 33;
      x *= 0xc4ceb9fe1a85ec53ull;
      x ^= x >> 33;
      hh[s - elo] = x;
    } else {
      hh[s - elo] = kInf;
    }
  }

  const int64_t nm = n - ww + 1;
  const int64_t mlo = std::max<int64_t>(0, lo - ww + 1);
  const int64_t mhi = std::min<int64_t>(nm, hi);
  std::vector<uint64_t> m(std::max<int64_t>(0, mhi - mlo));
  std::vector<int64_t> dq(en);
  {
    int64_t head = 0, tail = 0;
    for (int64_t p = elo; p < ehi; ++p) {
      while (tail > head && hh[dq[tail - 1] - elo] >= hh[p - elo]) --tail;
      dq[tail++] = p;
      if (dq[head] <= p - ww) ++head;
      const int64_t s = p - ww + 1;
      if (s >= mlo && s < mhi) m[s - mlo] = hh[dq[head] - elo];
    }
  }
  int64_t emitted = 0;
  // moving pointer into the sorted contig ends for the boundary filter
  int64_t e = 0;
  {
    int64_t head = 0, tail = 0;
    for (int64_t p = mlo; p < hi; ++p) {
      const int64_t s_new = p;
      if (s_new < mhi) {
        while (tail > head && m[dq[tail - 1] - mlo] <= m[s_new - mlo]) {
          --tail;
        }
        dq[tail++] = s_new;
      }
      const int64_t s_min = p - ww + 1;
      while (head < tail && dq[head] < s_min) ++head;
      if (p < lo) continue;
      if (head < tail && hh[p - elo] != kInf &&
          hh[p - elo] == m[dq[head] - mlo]) {
        while (e < n_ends && p >= ends[e]) ++e;
        if (e < n_ends && p > ends[e] - k) continue;  // spans a boundary
        emit(canon[p - elo], static_cast<uint32_t>(p), strand[p - elo]);
        ++emitted;
      }
    }
  }
  return emitted;
}

PyObject* py_build_table(PyObject*, PyObject* args) {
  Py_buffer cb, eb;
  int k, w, n_threads = 0;
  if (!PyArg_ParseTuple(args, "y*iiy*|i", &cb, &k, &w, &eb, &n_threads)) {
    return nullptr;
  }
  const uint8_t* codes = static_cast<const uint8_t*>(cb.buf);
  const int64_t L = cb.len;
  const int64_t* ends = static_cast<const int64_t*>(eb.buf);
  const int64_t n_ends = eb.len / static_cast<int64_t>(sizeof(int64_t));
  const int64_t n = L - k + 1;

  if (n_threads <= 0) {
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 1;
  }
  // SMALL fixed chunks, dynamically scheduled: the sketch temporaries
  // (hashes + deques, ~29 B per position) scale with chunk length, so
  // n/T-sized chunks would cost ~29 B x n in temps ALONE (~29 GB at a
  // 1 Gb genome -- the round-3 smoke's 37 GB peak, measured).  8M-
  // position chunks bound the temps to ~29 B x 8M x T ~ 1 GB, and the
  // ±(w-1) context overlap makes every chunk exact regardless of split.
  const int64_t kChunk = 8'000'000;
  const int64_t n_chunks = (n > 0) ? (n + kChunk - 1) / kChunk : 0;
  int T = static_cast<int>(std::min<int64_t>(
      n_threads, std::max<int64_t>(1, n_chunks)));

  struct ChunkOut {
    std::vector<uint32_t> code, pos;
    std::vector<uint8_t> strand;
  };
  std::vector<ChunkOut> parts(n_chunks);

  Py_BEGIN_ALLOW_THREADS {
    std::atomic<int64_t> next{0};
    auto worker = [&] {
      for (;;) {
        const int64_t c = next.fetch_add(1);
        if (c >= n_chunks) break;
        const int64_t lo = c * kChunk;
        const int64_t hi = std::min<int64_t>(n, lo + kChunk);
        ChunkOut& out = parts[c];
        // reserve the expected winnowing density (~2/(w+1)) to avoid
        // most doubling; a chunk's overshoot is bounded by chunk size
        out.code.reserve((hi - lo) * 2 / (w + 1) + 1024);
        out.pos.reserve(out.code.capacity());
        out.strand.reserve(out.code.capacity());
        sketch_range_tbl(codes, L, k, w, lo, hi, ends, n_ends,
                         [&](uint32_t cd, uint32_t p, uint8_t s) {
                           out.code.push_back(cd);
                           out.pos.push_back(p);
                           out.strand.push_back(s);
                         });
      }
    };
    if (T <= 1) {
      worker();
    } else {
      std::vector<std::thread> threads;
      for (int t = 0; t < T; ++t) threads.emplace_back(worker);
      for (auto& th : threads) th.join();
    }
  }
  Py_END_ALLOW_THREADS

  int64_t total = 0;
  for (const auto& p : parts) total += (int64_t)p.code.size();

  // exact-size output bytes, filled in place (no copy at the boundary)
  PyObject* code_b = PyBytes_FromStringAndSize(
      nullptr, (Py_ssize_t)(total * sizeof(uint32_t)));
  PyObject* pos_b = PyBytes_FromStringAndSize(
      nullptr, (Py_ssize_t)(total * sizeof(uint32_t)));
  PyObject* strand_b = PyBytes_FromStringAndSize(nullptr,
                                                 (Py_ssize_t)total);
  if (code_b == nullptr || pos_b == nullptr || strand_b == nullptr) {
    Py_XDECREF(code_b);
    Py_XDECREF(pos_b);
    Py_XDECREF(strand_b);
    PyBuffer_Release(&cb);
    PyBuffer_Release(&eb);
    return nullptr;
  }
  uint32_t* code = reinterpret_cast<uint32_t*>(PyBytes_AS_STRING(code_b));
  uint32_t* pos = reinterpret_cast<uint32_t*>(PyBytes_AS_STRING(pos_b));
  uint8_t* strand = reinterpret_cast<uint8_t*>(PyBytes_AS_STRING(strand_b));

  Py_BEGIN_ALLOW_THREADS
  if (total > 0) {
    // concatenate chunks in order, freeing each right after its copy
    // (peak: chunk vectors + the output, falling as parts release)
    int64_t at = 0;
    for (auto& p : parts) {
      const int64_t m_sz = (int64_t)p.code.size();
      std::memcpy(code + at, p.code.data(), m_sz * sizeof(uint32_t));
      std::memcpy(pos + at, p.pos.data(), m_sz * sizeof(uint32_t));
      std::memcpy(strand + at, p.strand.data(), m_sz);
      at += m_sz;
      p = ChunkOut();  // free this chunk's vectors before the next copy
    }
    // stable LSD radix by code (two 16-bit passes), payload carried;
    // lands back in the output buffers, temps freed before return
    {
      std::vector<uint32_t> code2(total), pos2(total);
      std::vector<uint8_t> strand2(total);
      uint32_t* csrc = code;
      uint32_t* psrc = pos;
      uint8_t* ssrc = strand;
      uint32_t* cdst = code2.data();
      uint32_t* pdst = pos2.data();
      uint8_t* sdst = strand2.data();
      for (int shift = 0; shift <= 16; shift += 16) {
        std::vector<int64_t> count(65537, 0);
        for (int64_t i = 0; i < total; ++i) {
          ++count[((csrc[i] >> shift) & 0xffffu) + 1];
        }
        for (int t = 0; t < 65536; ++t) count[t + 1] += count[t];
        for (int64_t i = 0; i < total; ++i) {
          const int64_t d = count[(csrc[i] >> shift) & 0xffffu]++;
          cdst[d] = csrc[i];
          pdst[d] = psrc[i];
          sdst[d] = ssrc[i];
        }
        std::swap(csrc, cdst);
        std::swap(psrc, pdst);
        std::swap(ssrc, sdst);
      }
      // two passes: results are back in the PyBytes buffers already
    }
  }
  Py_END_ALLOW_THREADS

  PyBuffer_Release(&cb);
  PyBuffer_Release(&eb);
  PyObject* out = Py_BuildValue("(OOO)", code_b, pos_b, strand_b);
  Py_DECREF(code_b);
  Py_DECREF(pos_b);
  Py_DECREF(strand_b);
  return out;
}

// Greedy chain extraction (native twin of ops/chain.py::backtrack_chains'
// per-row body): candidates in stable descending-f order, each unused
// survivor walked back through pre[] (marking used), kept when the path
// has >= min_anchors, until max_chains.
PyObject* py_backtrack(PyObject*, PyObject* args) {
  Py_buffer fb, pb, vb;
  double min_score;
  int min_anchors, max_chains;
  if (!PyArg_ParseTuple(args, "y*y*y*dii", &fb, &pb, &vb, &min_score,
                        &min_anchors, &max_chains)) {
    return nullptr;
  }
  const double* f = static_cast<const double*>(fb.buf);
  const int64_t* pre = static_cast<const int64_t*>(pb.buf);
  const uint8_t* valid = static_cast<const uint8_t*>(vb.buf);
  const Py_ssize_t n = fb.len / static_cast<Py_ssize_t>(sizeof(double));

  std::vector<std::pair<std::vector<int64_t>, double>> chains;
  Py_BEGIN_ALLOW_THREADS {
    std::vector<int64_t> order(n);
    for (Py_ssize_t i = 0; i < n; ++i) order[i] = i;
    // np.argsort(-f, kind='stable'): descending f, ties by ascending index
    std::stable_sort(order.begin(), order.end(),
                     [&](int64_t a, int64_t b) { return f[a] > f[b]; });
    std::vector<uint8_t> used(n, 0);
    for (const int64_t idx : order) {
      if (!valid[idx] || used[idx] || f[idx] < min_score) continue;
      std::vector<int64_t> path;
      int64_t v = idx;
      while (v != -1 && !used[v]) {
        path.push_back(v);
        used[v] = 1;
        v = pre[v];
      }
      if (static_cast<int>(path.size()) < min_anchors) continue;
      std::reverse(path.begin(), path.end());
      chains.emplace_back(std::move(path), f[idx]);
      if (static_cast<int>(chains.size()) >= max_chains) break;
    }
  }
  Py_END_ALLOW_THREADS

  PyBuffer_Release(&fb);
  PyBuffer_Release(&pb);
  PyBuffer_Release(&vb);
  PyObject* out = PyList_New(static_cast<Py_ssize_t>(chains.size()));
  if (out == nullptr) return nullptr;
  for (size_t c = 0; c < chains.size(); ++c) {
    PyObject* tup = Py_BuildValue(
        "(y#d)", reinterpret_cast<const char*>(chains[c].first.data()),
        (Py_ssize_t)(chains[c].first.size() * sizeof(int64_t)),
        chains[c].second);
    if (tup == nullptr) {
      Py_DECREF(out);
      return nullptr;
    }
    PyList_SET_ITEM(out, static_cast<Py_ssize_t>(c), tup);
  }
  return out;
}

// Bucketed range lookup into the sorted minimizer table (the mm_idx_get
// role): bstart[b] pre-resolves the top 16 bits of the query code, so
// each query binary-searches a ~dozen-entry bucket instead of the whole
// multi-megabyte table.  Results equal np.searchsorted(codes, q,
// 'left'/'right') exactly (codes sorted; all values with top bits b live
// in [bstart[b], bstart[b+1])).
PyObject* py_lookup(PyObject*, PyObject* args) {
  Py_buffer tb, bb, qb;
  int bits = 16;  // top bits resolved by the bucket table
  if (!PyArg_ParseTuple(args, "y*y*y*|i", &tb, &bb, &qb, &bits)) {
    return nullptr;
  }
  const int shift = 32 - bits;
  const uint32_t* table = static_cast<const uint32_t*>(tb.buf);
  const int64_t* bstart = static_cast<const int64_t*>(bb.buf);
  const uint32_t* q = static_cast<const uint32_t*>(qb.buf);
  const Py_ssize_t nq = qb.len / static_cast<Py_ssize_t>(sizeof(uint32_t));
  const Py_ssize_t nb =
      bb.len / static_cast<Py_ssize_t>(sizeof(int64_t)) - 1;  // 2^bits

  std::vector<int64_t> lo(nq), hi(nq);
  Py_BEGIN_ALLOW_THREADS
  for (Py_ssize_t t = 0; t < nq; ++t) {
    const uint32_t v = q[t];
    const int64_t b = static_cast<int64_t>(v >> shift);
    const uint32_t* first = table + (b < nb ? bstart[b] : 0);
    const uint32_t* last = table + (b < nb ? bstart[b + 1] : 0);
    lo[t] = std::lower_bound(first, last, v) - table;
    hi[t] = std::upper_bound(first, last, v) - table;
  }
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&tb);
  PyBuffer_Release(&bb);
  PyBuffer_Release(&qb);
  static const char kEmpty[1] = {0};
  auto buf = [&](const void* p) {
    return p == nullptr ? kEmpty : static_cast<const char*>(p);
  };
  return Py_BuildValue(
      "(y#y#)", buf(lo.data()), (Py_ssize_t)(nq * sizeof(int64_t)),
      buf(hi.data()), (Py_ssize_t)(nq * sizeof(int64_t)));
}

// Whole-read anchor assembly (models/aligner.py::_anchors): bucketed
// lookup of each query minimizer, occurrence-capped gather of (ref_pos,
// query_pos) pairs split by strand agreement ('-' anchors flip the query
// coordinate into revcomp space), each strand sorted by (r, q) -- the
// np.lexsort((q, r)) order.  One call replaces the per-read numpy
// repeat/cumsum/lexsort cascade.
PyObject* py_anchors(PyObject*, PyObject* args) {
  Py_buffer tb, bb, pb, sb, qh_b, qp_b, qs_b;
  int k;
  long long qlen, max_occ;
  int bits = 16;
  if (!PyArg_ParseTuple(args, "y*y*y*y*y*y*y*iLL|i", &tb, &bb, &pb, &sb,
                        &qh_b, &qp_b, &qs_b, &k, &qlen, &max_occ, &bits)) {
    return nullptr;
  }
  const int shift = 32 - bits;
  const uint32_t* table = static_cast<const uint32_t*>(tb.buf);
  const int64_t* bstart = static_cast<const int64_t*>(bb.buf);
  const uint32_t* tpos = static_cast<const uint32_t*>(pb.buf);
  const uint8_t* tstrand = static_cast<const uint8_t*>(sb.buf);
  const uint32_t* qh = static_cast<const uint32_t*>(qh_b.buf);
  const int64_t* qpos = static_cast<const int64_t*>(qp_b.buf);
  const uint8_t* qstrand = static_cast<const uint8_t*>(qs_b.buf);
  const Py_ssize_t nq = qh_b.len / static_cast<Py_ssize_t>(sizeof(uint32_t));

  std::vector<std::pair<int64_t, int64_t>> plus, minus;
  Py_BEGIN_ALLOW_THREADS {
    for (Py_ssize_t t = 0; t < nq; ++t) {
      const uint32_t v = qh[t];
      const int64_t b = static_cast<int64_t>(v >> shift);
      const uint32_t* first = table + bstart[b];
      const uint32_t* last = table + bstart[b + 1];
      const int64_t lo = std::lower_bound(first, last, v) - table;
      const int64_t hi = std::upper_bound(first, last, v) - table;
      const int64_t occ = hi - lo;
      if (occ == 0 || occ > max_occ) continue;
      for (int64_t e = lo; e < hi; ++e) {
        if (tstrand[e] == qstrand[t]) {
          plus.emplace_back(static_cast<int64_t>(tpos[e]), qpos[t]);
        } else {
          minus.emplace_back(static_cast<int64_t>(tpos[e]),
                             qlen - (qpos[t] + k));
        }
      }
    }
    std::sort(plus.begin(), plus.end());
    std::sort(minus.begin(), minus.end());
  }
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&tb);
  PyBuffer_Release(&bb);
  PyBuffer_Release(&pb);
  PyBuffer_Release(&sb);
  PyBuffer_Release(&qh_b);
  PyBuffer_Release(&qp_b);
  PyBuffer_Release(&qs_b);

  // interleave back into separate r/q arrays per strand
  auto pack = [](const std::vector<std::pair<int64_t, int64_t>>& v,
                 std::vector<int64_t>& r_out, std::vector<int64_t>& q_out) {
    r_out.resize(v.size());
    q_out.resize(v.size());
    for (size_t t = 0; t < v.size(); ++t) {
      r_out[t] = v[t].first;
      q_out[t] = v[t].second;
    }
  };
  std::vector<int64_t> rp, qp, rm, qm;
  pack(plus, rp, qp);
  pack(minus, rm, qm);
  static const char kEmpty[1] = {0};
  auto buf = [&](const std::vector<int64_t>& v) {
    return v.empty() ? kEmpty : reinterpret_cast<const char*>(v.data());
  };
  return Py_BuildValue(
      "(y#y#y#y#)",
      buf(rp), (Py_ssize_t)(rp.size() * sizeof(int64_t)),
      buf(qp), (Py_ssize_t)(qp.size() * sizeof(int64_t)),
      buf(rm), (Py_ssize_t)(rm.size() * sizeof(int64_t)),
      buf(qm), (Py_ssize_t)(qm.size() * sizeof(int64_t)));
}

// Stable sort permutation for u32 keys (np.argsort(kind='stable') twin
// for the index build): LSD radix over two 16-bit digits -- stable and
// deterministic by construction, ~4x faster than comparison sorting at
// minimizer-table sizes.
PyObject* py_sortperm(PyObject*, PyObject* args) {
  Py_buffer kb;
  if (!PyArg_ParseTuple(args, "y*", &kb)) return nullptr;
  const uint32_t* keys = static_cast<const uint32_t*>(kb.buf);
  const int64_t n = kb.len / static_cast<int64_t>(sizeof(uint32_t));
  std::vector<int64_t> perm(n), tmp(n);
  Py_BEGIN_ALLOW_THREADS {
    for (int64_t i = 0; i < n; ++i) perm[i] = i;
    for (int shift = 0; shift <= 16; shift += 16) {
      std::vector<int64_t> count(65537, 0);
      const int64_t* src = (shift == 0) ? perm.data() : tmp.data();
      int64_t* dst = (shift == 0) ? tmp.data() : perm.data();
      for (int64_t i = 0; i < n; ++i) {
        ++count[((keys[src[i]] >> shift) & 0xffffu) + 1];
      }
      for (int t = 0; t < 65536; ++t) count[t + 1] += count[t];
      for (int64_t i = 0; i < n; ++i) {
        dst[count[(keys[src[i]] >> shift) & 0xffffu]++] = src[i];
      }
    }
  }
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&kb);
  static const char kEmpty[1] = {0};
  const char* data =
      perm.empty() ? kEmpty : reinterpret_cast<const char*>(perm.data());
  return Py_BuildValue("y#", data, (Py_ssize_t)(n * sizeof(int64_t)));
}

PyMethodDef kMethods[] = {
    {"chain", py_chain, METH_VARARGS,
     "chain(r, q, ctg, k, window, max_gap_r, max_gap_q) -> (f, pre) bytes"},
    {"sketch", py_sketch, METH_VARARGS,
     "sketch(codes, k, w) -> (canon_u32, pos_i64, strand_u8) bytes"},
    {"backtrack", py_backtrack, METH_VARARGS,
     "backtrack(f_f64, pre_i64, valid_u8, min_score, min_anchors, "
     "max_chains) -> [(path_i64_bytes, score), ...]"},
    {"sortperm", py_sortperm, METH_VARARGS,
     "sortperm(keys_u32) -> stable ascending sort permutation (i64 bytes)"},
    {"build_table", py_build_table, METH_VARARGS,
     "build_table(codes_u8, k, w, contig_ends_i64[, threads]) -> "
     "(code_u32, pos_u32, strand_u8) bytes, sorted stable by code with "
     "boundary-spanning k-mers dropped (memory-bounded index build)"},
    {"lookup", py_lookup, METH_VARARGS,
     "lookup(table_u32_sorted, bucket_starts_i64[65537], queries_u32) -> "
     "(lo_i64, hi_i64) bytes"},
    {"anchors", py_anchors, METH_VARARGS,
     "anchors(table_u32, bstart_i64, pos_u32, strand_u8, qh_u32, qpos_i64, "
     "qstrand_u8, k, qlen, max_occ) -> (r+, q+, r-, q-) i64 bytes"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "_chaincore", "native colinear chaining DP", -1,
    kMethods, nullptr, nullptr, nullptr, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit__chaincore() { return PyModule_Create(&kModule); }
