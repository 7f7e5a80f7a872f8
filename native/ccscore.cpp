// _ccscore: native tandem-repeat period detection -- the numeric core of
// ops/ccs.py::detect_units (the role pyccs' consensus detector plays in
// the reference, CIRI_long/find_ccs.py).  One call replaces the per-read
// numpy cascade (_kmer_codes -> _lag_votes -> _elect_period ->
// _anchor_boundaries), whose ~15 vectorised ops per read cost more in
// dispatch than in work at typical read lengths.
//
// Exact-parity notes (fuzz: tests/test_ccs.py::test_native_detect_parity):
//   - k-mer integer code = sum_t codes[p+t] * 4^t (LSB-first, as the
//     numpy pw ordering);
//   - lag/anchor grouping uses a stable sort by k-mer code, which equals
//     np.lexsort((pos, km)) because pos is ascending in input order;
//   - _elect_period's searchsorted bounds are float64 expressions
//     (0.94*l - 4, 1.06*l + 4) compared against int64 lags -- reproduced
//     with double-valued comparators;
//   - np.median of an even-sized array averages the middle pair in
//     float64; int() then truncates toward zero;
//   - Python round() is half-to-even -> std::nearbyint in the default
//     FE_TONEAREST mode.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

PyObject* py_detect(PyObject*, PyObject* args) {
  Py_buffer cb;
  int k, min_period;
  double min_units;
  if (!PyArg_ParseTuple(args, "y*iid", &cb, &k, &min_period, &min_units)) {
    return nullptr;
  }
  const uint8_t* codes = static_cast<const uint8_t*>(cb.buf);
  const int64_t L = cb.len;

  int64_t period = 0;
  std::vector<int64_t> bs;
  bool found = false;

  Py_BEGIN_ALLOW_THREADS do {
    if (L < 2 * static_cast<int64_t>(min_period) || L < k) break;
    const int64_t n = L - k + 1;

    // ---- k-mer codes at valid (all-ACGT) positions
    std::vector<int64_t> km, pos;
    km.reserve(n);
    pos.reserve(n);
    {
      int64_t last_bad = -1;
      int64_t code = 0;
      const int64_t shift = 2 * (k - 1);
      for (int64_t p = 0; p < L; ++p) {
        const uint8_t b = codes[p];
        if (b >= 4) last_bad = p;
        // LSB-first packing: km(p) = sum_t c[p+t] * 4^t means the base
        // entering at window position k-1 carries weight 4^(k-1); rolling
        // right-shift keeps that orientation.
        code = (code >> 2) |
               (static_cast<int64_t>(b < 4 ? b : 0) << shift);
        const int64_t s = p - k + 1;
        if (s < 0) continue;
        if (last_bad < s) {
          km.push_back(code);
          pos.push_back(s);
        }
      }
    }
    if (km.size() < 2) break;
    const int64_t nk = static_cast<int64_t>(km.size());

    // ---- stable sort by k-mer code (pos ascending within groups)
    std::vector<int32_t> order(nk);
    for (int64_t t = 0; t < nk; ++t) order[t] = static_cast<int32_t>(t);
    std::stable_sort(order.begin(), order.end(),
                     [&](int32_t a, int32_t b) { return km[a] < km[b]; });

    // ---- lag votes (consecutive same-k-mer distances), pre-filtered to
    // [min_period, L / min_units]
    std::vector<int64_t> lags;
    for (int64_t t = 1; t < nk; ++t) {
      if (km[order[t]] != km[order[t - 1]]) continue;
      const int64_t lag = pos[order[t]] - pos[order[t - 1]];
      if (lag >= min_period &&
          static_cast<double>(lag) <= static_cast<double>(L) / min_units) {
        lags.push_back(lag);
      }
    }
    if (lags.empty()) break;

    // ---- period election
    std::sort(lags.begin(), lags.end());
    const int64_t nl = static_cast<int64_t>(lags.size());
    std::vector<int64_t> support(nl);
    int64_t best = 0;
    for (int64_t t = 0; t < nl; ++t) {
      const double lo_v = 0.94 * static_cast<double>(lags[t]) - 4.0;
      const double hi_v = 1.06 * static_cast<double>(lags[t]) + 4.0;
      const auto lo = std::lower_bound(
          lags.begin(), lags.end(), lo_v,
          [](int64_t a, double b) { return static_cast<double>(a) < b; });
      const auto hi = std::upper_bound(
          lags.begin(), lags.end(), hi_v,
          [](double b, int64_t a) { return b < static_cast<double>(a); });
      support[t] = hi - lo;
      if (support[t] > best) best = support[t];
    }
    const double min_support =
        std::max(8.0, 0.05 * static_cast<double>(L));
    if (static_cast<double>(best) < min_support) break;
    const double bar =
        std::max(min_support, 0.55 * static_cast<double>(best));
    int64_t p = -1;
    for (int64_t t = 0; t < nl; ++t) {
      if (static_cast<double>(support[t]) >= bar) {
        p = lags[t];  // lags sorted: first good = smallest cluster
        break;
      }
    }
    // refine: median of the elected cluster
    {
      const double lo_v = 0.94 * static_cast<double>(p) - 4.0;
      const double hi_v = 1.06 * static_cast<double>(p) + 4.0;
      std::vector<int64_t> sel;
      for (const int64_t l : lags) {
        if (static_cast<double>(l) >= lo_v &&
            static_cast<double>(l) <= hi_v) {
          sel.push_back(l);
        }
      }
      const size_t ns = sel.size();  // sel sorted (lags sorted)
      double med;
      if (ns % 2 == 1) {
        med = static_cast<double>(sel[ns / 2]);
      } else {
        med = 0.5 * (static_cast<double>(sel[ns / 2 - 1]) +
                     static_cast<double>(sel[ns / 2]));
      }
      period = static_cast<int64_t>(med);  // int() truncation
    }
    if (static_cast<double>(L) < min_units * static_cast<double>(period)) {
      break;
    }

    // ---- anchor election + boundary layout
    const int64_t tol = std::max<int64_t>(
        6, static_cast<int64_t>(0.08 * static_cast<double>(period)));
    // group boundaries over the sorted order; per-group score = count of
    // within-group deltas landing within tol of the period
    int64_t best_score = -1;
    int64_t best_gi_start = -1, best_gi_end = -1, best_gi_pos0 = 0;
    {
      int64_t gs = 0;
      while (gs < nk) {
        int64_t ge = gs + 1;
        while (ge < nk && km[order[ge]] == km[order[gs]]) ++ge;
        int64_t score = (ge - gs < 2) ? -1 : 0;
        if (score == 0) {
          for (int64_t t = gs + 1; t < ge; ++t) {
            const int64_t d = pos[order[t]] - pos[order[t - 1]];
            if (std::llabs(d - period) <= tol) ++score;
          }
        }
        const int64_t p0 = pos[order[gs]];
        // ties: smallest first-occurrence position, then first group in
        // k-mer order (np.argmin keeps the first minimum)
        if (score > best_score ||
            (score == best_score && score >= 0 && p0 < best_gi_pos0)) {
          best_score = score;
          best_gi_start = gs;
          best_gi_end = ge;
          best_gi_pos0 = p0;
        }
        gs = ge;
      }
    }
    if (best_score < 1) break;

    // longest chain of period-spaced occurrences
    std::vector<int64_t> occ;
    occ.push_back(pos[order[best_gi_start]]);
    for (int64_t t = best_gi_start + 1; t < best_gi_end; ++t) {
      const int64_t x = pos[order[t]];
      const int64_t gap = x - occ.back();
      if (static_cast<double>(gap) < 0.5 * static_cast<double>(period)) {
        continue;
      }
      occ.push_back(x);
    }
    // phase-align to the read origin
    const int64_t shift = occ[0] % period;
    for (int64_t& x : occ) x -= shift;

    // interpolate missing boundaries in big gaps
    bs.push_back(occ[0]);
    for (size_t t = 1; t < occ.size(); ++t) {
      const int64_t x = occ[t];
      const int64_t base = bs.back();
      const int64_t gap = x - base;
      const int64_t m = static_cast<int64_t>(std::nearbyint(
          static_cast<double>(gap) / static_cast<double>(period)));
      if (m >= 2 && std::llabs(gap - m * period) <= m * tol) {
        const double step =
            static_cast<double>(gap) / static_cast<double>(m);
        for (int64_t u = 1; u < m; ++u) {
          bs.push_back(static_cast<int64_t>(std::nearbyint(
              static_cast<double>(base) + static_cast<double>(u) * step)));
        }
      }
      bs.push_back(x);
    }

    // extend to the read edges
    while (static_cast<double>(bs.front()) >=
           0.75 * static_cast<double>(period)) {
      bs.insert(bs.begin(), std::max<int64_t>(0, bs.front() - period));
    }
    if (bs.front() > 0 && static_cast<double>(bs.front()) <
                              0.25 * static_cast<double>(period)) {
      bs.front() = 0;
    } else if (bs.front() > 0) {
      bs.insert(bs.begin(), 0);
    }
    while (static_cast<double>(L - bs.back()) >=
           1.25 * static_cast<double>(period)) {
      bs.push_back(bs.back() + period);
    }
    if (L - bs.back() >= 15) {
      bs.push_back(L);
    } else {
      bs.back() = L;
    }
    found = true;
  } while (false);
  Py_END_ALLOW_THREADS

  PyBuffer_Release(&cb);
  if (!found) Py_RETURN_NONE;
  static const char kEmpty[1] = {0};
  const char* data = bs.empty() ? kEmpty
                                : reinterpret_cast<const char*>(bs.data());
  return Py_BuildValue("(Ly#)", (long long)period, data,
                       (Py_ssize_t)(bs.size() * sizeof(int64_t)));
}

PyMethodDef kMethods[] = {
    {"detect", py_detect, METH_VARARGS,
     "detect(codes_u8, k, min_period, min_units) -> None | "
     "(period, boundaries_i64_bytes)"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "_ccscore",
    "native tandem-repeat period detection", -1, kMethods,
    nullptr, nullptr, nullptr, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit__ccscore() { return PyModule_Create(&kModule); }
