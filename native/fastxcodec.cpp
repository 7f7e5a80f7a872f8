// _fastxcodec: native FASTA/FASTQ parsing + base encoding.
//
// The TPU framework's host-bound data path: the reference delegates genome
// and read IO to htslib (pysam, align.py:184-207) and C stdio; here a small
// C++ extension does buffered parsing, gzip inflation (zlib) and ACGT->code
// encoding in one pass, so multi-GB genomes and read files never round-trip
// through per-line Python.  Exposed via the CPython C API (no pybind11):
//
//   encode(bytes) -> bytes            int8 codes A0 C1 G2 T3 other 4
//   parse_fastx(path) -> list[(name: bytes, codes: bytes, raw: bytes)]
//   parse_fastx_encoded(path) -> list[(name: bytes, codes: bytes)]
//
// Python-level fallbacks live in ciri_long_tpu.io.fastx / utils.seq; the
// extension is optional and feature-detected at import.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <zlib.h>

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

int8_t kEncode[256];

void init_tables() {
  for (int i = 0; i < 256; ++i) kEncode[i] = 4;
  kEncode['A'] = kEncode['a'] = 0;
  kEncode['C'] = kEncode['c'] = 1;
  kEncode['G'] = kEncode['g'] = 2;
  kEncode['T'] = kEncode['t'] = 3;
}

// Read a whole file (plain or gzip -- gzread handles both transparently).
bool read_all(const char* path, std::string* out, std::string* err) {
  gzFile f = gzopen(path, "rb");
  if (f == nullptr) {
    *err = std::string("cannot open: ") + path;
    return false;
  }
  gzbuffer(f, 1 << 20);
  char buf[1 << 20];
  int n;
  while ((n = gzread(f, buf, sizeof(buf))) > 0) {
    out->append(buf, static_cast<size_t>(n));
  }
  bool ok = n >= 0;
  if (!ok) *err = std::string("read error in: ") + path;
  gzclose(f);
  return ok;
}

struct Record {
  std::string name;
  std::string seq;  // raw bases
};

// One-pass FASTA/FASTQ parser over an in-memory buffer.
bool parse_records(const std::string& data, std::vector<Record>* out,
                   std::string* err) {
  size_t i = 0;
  const size_t n = data.size();
  auto skip_eol = [&](size_t p) {
    while (p < n && (data[p] == '\n' || data[p] == '\r')) ++p;
    return p;
  };
  auto line_end = [&](size_t p) {
    const void* nl = memchr(data.data() + p, '\n', n - p);
    return nl == nullptr ? n : static_cast<size_t>(
        static_cast<const char*>(nl) - data.data());
  };
  auto token_end = [&](size_t p, size_t end) {
    size_t q = p;
    while (q < end && data[q] != ' ' && data[q] != '\t' && data[q] != '\r') ++q;
    return q;
  };

  i = skip_eol(i);
  if (i >= n) return true;
  const bool fastq = data[i] == '@';
  if (!fastq && data[i] != '>') {
    *err = "not a FASTA/FASTQ stream";
    return false;
  }

  while (i < n) {
    if (data[i] != (fastq ? '@' : '>')) {
      *err = "malformed record header";
      return false;
    }
    size_t hend = line_end(i);
    size_t tend = token_end(i + 1, hend);
    Record rec;
    rec.name.assign(data, i + 1, tend - (i + 1));
    i = skip_eol(hend);

    if (fastq) {
      size_t send = line_end(i);
      size_t strip = send;
      while (strip > i && (data[strip - 1] == '\r')) --strip;
      rec.seq.assign(data, i, strip - i);
      i = skip_eol(send);
      // '+' line
      size_t pend = line_end(i);
      i = skip_eol(pend);
      // quality line
      size_t qend = line_end(i);
      i = skip_eol(qend);
    } else {
      while (i < n && data[i] != '>') {
        size_t send = line_end(i);
        size_t strip = send;
        while (strip > i && data[strip - 1] == '\r') --strip;
        rec.seq.append(data, i, strip - i);
        i = skip_eol(send);
      }
    }
    out->push_back(std::move(rec));
  }
  return true;
}

void encode_inplace(const std::string& raw, std::string* codes) {
  codes->resize(raw.size());
  const unsigned char* src =
      reinterpret_cast<const unsigned char*>(raw.data());
  int8_t* dst = reinterpret_cast<int8_t*>(&(*codes)[0]);
  for (size_t k = 0; k < raw.size(); ++k) dst[k] = kEncode[src[k]];
}

PyObject* py_encode(PyObject*, PyObject* arg) {
  Py_buffer view;
  if (PyObject_GetBuffer(arg, &view, PyBUF_SIMPLE) != 0) return nullptr;
  PyObject* out = PyBytes_FromStringAndSize(nullptr, view.len);
  if (out != nullptr) {
    const unsigned char* src = static_cast<const unsigned char*>(view.buf);
    int8_t* dst = reinterpret_cast<int8_t*>(PyBytes_AS_STRING(out));
    for (Py_ssize_t k = 0; k < view.len; ++k) dst[k] = kEncode[src[k]];
  }
  PyBuffer_Release(&view);
  return out;
}

PyObject* parse_common(PyObject* args, bool with_raw) {
  const char* path;
  if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;
  std::string data, err;
  std::vector<Record> recs;
  {
    bool ok;
    Py_BEGIN_ALLOW_THREADS
    ok = read_all(path, &data, &err) && parse_records(data, &recs, &err);
    Py_END_ALLOW_THREADS
    if (!ok) {
      PyErr_SetString(PyExc_IOError, err.c_str());
      return nullptr;
    }
  }
  PyObject* list = PyList_New(static_cast<Py_ssize_t>(recs.size()));
  if (list == nullptr) return nullptr;
  std::string codes;
  for (size_t k = 0; k < recs.size(); ++k) {
    encode_inplace(recs[k].seq, &codes);
    PyObject* tup;
    if (with_raw) {
      tup = Py_BuildValue("(y#y#y#)",
                          recs[k].name.data(), (Py_ssize_t)recs[k].name.size(),
                          codes.data(), (Py_ssize_t)codes.size(),
                          recs[k].seq.data(), (Py_ssize_t)recs[k].seq.size());
    } else {
      tup = Py_BuildValue("(y#y#)",
                          recs[k].name.data(), (Py_ssize_t)recs[k].name.size(),
                          codes.data(), (Py_ssize_t)codes.size());
    }
    if (tup == nullptr) {
      Py_DECREF(list);
      return nullptr;
    }
    PyList_SET_ITEM(list, static_cast<Py_ssize_t>(k), tup);
  }
  return list;
}

PyObject* py_parse_fastx(PyObject*, PyObject* args) {
  return parse_common(args, /*with_raw=*/true);
}

PyObject* py_parse_fastx_encoded(PyObject*, PyObject* args) {
  return parse_common(args, /*with_raw=*/false);
}

PyMethodDef kMethods[] = {
    {"encode", py_encode, METH_O,
     "encode(bytes) -> bytes of int8 base codes (A0 C1 G2 T3 other 4)"},
    {"parse_fastx", py_parse_fastx, METH_VARARGS,
     "parse_fastx(path) -> [(name, codes, raw)] for FASTA/FASTQ(.gz)"},
    {"parse_fastx_encoded", py_parse_fastx_encoded, METH_VARARGS,
     "parse_fastx_encoded(path) -> [(name, codes)] for FASTA/FASTQ(.gz)"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "_fastxcodec",
    "native FASTA/FASTQ parsing + base encoding", -1, kMethods,
    nullptr, nullptr, nullptr, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit__fastxcodec() {
  init_tables();
  return PyModule_Create(&kModule);
}
