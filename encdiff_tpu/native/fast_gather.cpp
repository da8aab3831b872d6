// Threaded batch-gather for the host input pipeline.
//
// The per-step host work of the TPU input pipeline is one operation:
// gathering B rows (each H*W*C uint8, ~12KB for 64px RGB) from the
// memory-resident dataset array at shuffled indices, into a contiguous
// batch buffer handed to jax.device_put. numpy fancy indexing does this
// single-threaded; this extension fans the row copies across a small
// thread pool and prefetches the next row while copying the current one,
// which matters on many-core TPU hosts feeding multiple steps/second
// (the reference's equivalent is torch DataLoader worker processes,
// main_val.py:243-318 — far heavier machinery for the same memcpy).
//
// Exposed as  encdiff_tpu.native.fast_gather(src, indices, out=None,
// num_threads=0)  via the CPython C API (no pybind11 in this image).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Minimal ndarray accessors through the buffer protocol — avoids a
// compile-time dependency on numpy headers.
struct BufView {
  Py_buffer view{};
  bool ok = false;
  ~BufView() {
    if (ok) PyBuffer_Release(&view);
  }
};

static bool get_buffer(PyObject* obj, BufView* out, int flags) {
  if (PyObject_GetBuffer(obj, &out->view, flags) != 0) return false;
  out->ok = true;
  return true;
}

static PyObject* fast_gather(PyObject* /*self*/, PyObject* args,
                             PyObject* kwargs) {
  static const char* kwlist[] = {"src", "indices", "out", "num_threads",
                                 nullptr};
  PyObject* src_obj = nullptr;
  PyObject* idx_obj = nullptr;
  PyObject* out_obj = Py_None;
  int num_threads = 0;
  if (!PyArg_ParseTupleAndKeywords(
          args, kwargs, "OO|Oi", const_cast<char**>(kwlist), &src_obj,
          &idx_obj, &out_obj, &num_threads))
    return nullptr;

  BufView src;
  if (!get_buffer(src_obj, &src, PyBUF_RECORDS_RO)) return nullptr;
  if (src.view.ndim < 1 || !PyBuffer_IsContiguous(&src.view, 'C')) {
    PyErr_SetString(PyExc_ValueError, "src must be C-contiguous");
    return nullptr;
  }

  BufView idx;
  if (!get_buffer(idx_obj, &idx, PyBUF_RECORDS_RO)) return nullptr;
  if (idx.view.ndim != 1 || !PyBuffer_IsContiguous(&idx.view, 'C') ||
      idx.view.itemsize != 8) {
    PyErr_SetString(PyExc_ValueError,
                    "indices must be a 1-D C-contiguous int64 array");
    return nullptr;
  }
  const int64_t* indices = static_cast<const int64_t*>(idx.view.buf);
  const Py_ssize_t batch = idx.view.shape[0];

  const Py_ssize_t n_rows = src.view.shape[0];
  const Py_ssize_t row_bytes = src.view.len / (n_rows > 0 ? n_rows : 1);

  for (Py_ssize_t i = 0; i < batch; ++i) {
    if (indices[i] < 0 || indices[i] >= n_rows) {
      PyErr_Format(PyExc_IndexError, "index %lld out of range [0, %zd)",
                   static_cast<long long>(indices[i]), n_rows);
      return nullptr;
    }
  }

  // Allocate (or validate) the output as a bytearray-backed numpy-safe
  // buffer: we return a memoryview the caller wraps with
  // np.frombuffer(...).reshape(batch, *src.shape[1:]).
  PyObject* out_bytes = nullptr;
  char* dst = nullptr;
  BufView outb;
  if (out_obj == Py_None) {
    out_bytes = PyByteArray_FromStringAndSize(nullptr, batch * row_bytes);
    if (!out_bytes) return nullptr;
    dst = PyByteArray_AS_STRING(out_bytes);
  } else {
    if (!get_buffer(out_obj, &outb, PyBUF_WRITABLE)) return nullptr;
    if (outb.view.len != batch * row_bytes) {
      PyErr_SetString(PyExc_ValueError, "out buffer has wrong size");
      return nullptr;
    }
    dst = static_cast<char*>(outb.view.buf);
    Py_INCREF(out_obj);
    out_bytes = out_obj;
  }

  const char* base = static_cast<const char*>(src.view.buf);
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  if (num_threads <= 0) num_threads = hw > 1 ? (hw < 8 ? hw : 8) : 1;
  if (num_threads > batch) num_threads = static_cast<int>(batch);

  Py_BEGIN_ALLOW_THREADS;
  if (num_threads <= 1) {
    for (Py_ssize_t i = 0; i < batch; ++i)
      std::memcpy(dst + i * row_bytes, base + indices[i] * row_bytes,
                  row_bytes);
  } else {
    std::atomic<Py_ssize_t> next(0);
    auto worker = [&]() {
      for (;;) {
        Py_ssize_t i = next.fetch_add(1, std::memory_order_relaxed);
        if (i >= batch) break;
        std::memcpy(dst + i * row_bytes, base + indices[i] * row_bytes,
                    row_bytes);
      }
    };
    std::vector<std::thread> threads;
    threads.reserve(num_threads - 1);
    for (int t = 1; t < num_threads; ++t) threads.emplace_back(worker);
    worker();
    for (auto& th : threads) th.join();
  }
  Py_END_ALLOW_THREADS;

  return out_bytes;
}

static PyMethodDef Methods[] = {
    {"fast_gather", reinterpret_cast<PyCFunction>(fast_gather),
     METH_VARARGS | METH_KEYWORDS,
     "fast_gather(src, indices, out=None, num_threads=0) -> bytearray\n"
     "Threaded row gather: dst[i] = src[indices[i]] (row-wise memcpy)."},
    {nullptr, nullptr, 0, nullptr}};

static struct PyModuleDef moduledef = {PyModuleDef_HEAD_INIT, "_fast_gather",
                                       "Threaded batch gather.", -1, Methods};

PyMODINIT_FUNC PyInit__fast_gather(void) {
  return PyModule_Create(&moduledef);
}

}  // extern "C"
