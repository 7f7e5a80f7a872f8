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
#include <cmath>
#include <cstdint>
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
      const double g = static_cast<double>(std::llabs(dr - dq));
      const double skip =
          0.1 * std::max(0.0, static_cast<double>(dq) - 2.0 * k);
      double pen;
      if (dr >= dq) {
        pen = std::log2(g + 1.0) + skip;
      } else {
        pen = 0.5 * g + 0.5 * std::log2(g + 1.0) + skip;
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

PyMethodDef kMethods[] = {
    {"chain", py_chain, METH_VARARGS,
     "chain(r, q, ctg, k, window, max_gap_r, max_gap_q) -> (f, pre) bytes"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "_chaincore", "native colinear chaining DP", -1,
    kMethods, nullptr, nullptr, nullptr, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit__chaincore() { return PyModule_Create(&kModule); }
