// Native NMS / Soft-NMS kernels (CPython C API, no pybind11).
//
// C++ rebuild of the reference's Cython kernels
// (/root/reference/lib/models/external/nms.pyx:24-391): greedy hard NMS,
// soft-NMS (linear/gaussian) with in-place score decay and tail-swap
// shrinking, and the 39-column keypoint variant. Operates on contiguous
// float32 numpy arrays; exported as _codenet_nms.{nms, soft_nms,
// soft_nms_39, soft_nms_merge}.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <algorithm>
#include <cmath>
#include <vector>

namespace {

// Greedy IoU suppression over (N, 5) [x1 y1 x2 y2 score].
// Returns kept indices (score-descending order).
std::vector<long> nms_impl(const float* d, long n, long stride,
                           float thresh) {
  std::vector<long> order(n);
  for (long i = 0; i < n; ++i) order[i] = i;
  std::stable_sort(order.begin(), order.end(), [&](long a, long b) {
    return d[a * stride + 4] > d[b * stride + 4];
  });
  std::vector<char> suppressed(n, 0);
  std::vector<long> keep;
  std::vector<float> areas(n);
  for (long i = 0; i < n; ++i) {
    const float* b = d + i * stride;
    areas[i] = (b[2] - b[0] + 1.f) * (b[3] - b[1] + 1.f);
  }
  for (long oi = 0; oi < n; ++oi) {
    long i = order[oi];
    if (suppressed[i]) continue;
    keep.push_back(i);
    const float* bi = d + i * stride;
    for (long oj = oi + 1; oj < n; ++oj) {
      long j = order[oj];
      if (suppressed[j]) continue;
      const float* bj = d + j * stride;
      float xx1 = std::max(bi[0], bj[0]);
      float yy1 = std::max(bi[1], bj[1]);
      float xx2 = std::min(bi[2], bj[2]);
      float yy2 = std::min(bi[3], bj[3]);
      float w = std::max(0.f, xx2 - xx1 + 1.f);
      float h = std::max(0.f, yy2 - yy1 + 1.f);
      float inter = w * h;
      float ovr = inter / (areas[i] + areas[j] - inter);
      if (ovr >= thresh) suppressed[j] = 1;
    }
  }
  return keep;
}

// Soft-NMS, in place; returns the shrunk logical count N'.
long soft_nms_impl(float* boxes, long n, long stride, float sigma, float Nt,
                   float threshold, int method) {
  long N = n;
  for (long i = 0; i < N; ++i) {
    // move the max-score box among [i, N) to position i
    long maxpos = i;
    for (long pos = i + 1; pos < N; ++pos)
      if (boxes[pos * stride + 4] > boxes[maxpos * stride + 4]) maxpos = pos;
    if (maxpos != i)
      for (long c = 0; c < stride; ++c)
        std::swap(boxes[i * stride + c], boxes[maxpos * stride + c]);
    const float tx1 = boxes[i * stride + 0], ty1 = boxes[i * stride + 1];
    const float tx2 = boxes[i * stride + 2], ty2 = boxes[i * stride + 3];
    const float tarea = (tx2 - tx1 + 1.f) * (ty2 - ty1 + 1.f);

    for (long pos = i + 1; pos < N; ++pos) {
      float* b = boxes + pos * stride;
      float area = (b[2] - b[0] + 1.f) * (b[3] - b[1] + 1.f);
      float iw = std::min(tx2, b[2]) - std::max(tx1, b[0]) + 1.f;
      if (iw > 0) {
        float ih = std::min(ty2, b[3]) - std::max(ty1, b[1]) + 1.f;
        if (ih > 0) {
          float ua = tarea + area - iw * ih;
          float ov = iw * ih / ua;
          float weight;
          if (method == 1)
            weight = ov > Nt ? 1.f - ov : 1.f;
          else if (method == 2)
            weight = std::exp(-(ov * ov) / sigma);
          else
            weight = ov > Nt ? 0.f : 1.f;
          b[4] *= weight;
          if (b[4] < threshold) {
            for (long c = 0; c < stride; ++c)
              b[c] = boxes[(N - 1) * stride + c];
            --N;
            --pos;
          }
        }
      }
    }
  }
  return N;
}

// Coordinate-merging Soft-NMS over (N, >=7) rows [x1 y1 x2 y2 s ts bs]
// (reference nms.pyx:277-391). Quirks preserved: the max-selection and
// tail-discard swaps move only columns 0-4 (5-6 stay with their rows),
// and the merge accumulators seed from the pre-swap row i's cols 5-6.
long soft_nms_merge_impl(float* boxes, long n, long stride, float sigma,
                         float Nt, float threshold, int method,
                         float weight_exp) {
  long N = n;
  for (long i = 0; i < N; ++i) {
    long maxpos = i;
    for (long pos = i + 1; pos < N; ++pos)
      if (boxes[pos * stride + 4] > boxes[maxpos * stride + 4]) maxpos = pos;
    if (maxpos != i)
      for (long c = 0; c < 5; ++c)
        std::swap(boxes[i * stride + c], boxes[maxpos * stride + c]);
    float* bi = boxes + i * stride;
    float mx1 = bi[0] * bi[5], my1 = bi[1] * bi[5];
    float mx2 = bi[2] * bi[6], my2 = bi[3] * bi[6];
    float mts = bi[5], mbs = bi[6];
    const float tx1 = bi[0], ty1 = bi[1], tx2 = bi[2], ty2 = bi[3];
    const float tarea = (tx2 - tx1 + 1.f) * (ty2 - ty1 + 1.f);

    for (long pos = i + 1; pos < N; ++pos) {
      float* b = boxes + pos * stride;
      float area = (b[2] - b[0] + 1.f) * (b[3] - b[1] + 1.f);
      float iw = std::min(tx2, b[2]) - std::max(tx1, b[0]) + 1.f;
      if (iw > 0) {
        float ih = std::min(ty2, b[3]) - std::max(ty1, b[1]) + 1.f;
        if (ih > 0) {
          float ua = tarea + area - iw * ih;
          float ov = iw * ih / ua;
          float weight;
          if (method == 1)
            weight = ov > Nt ? 1.f - ov : 1.f;
          else if (method == 2)
            weight = std::exp(-(ov * ov) / sigma);
          else
            weight = ov > Nt ? 0.f : 1.f;
          float mw = std::pow(1.f - weight, weight_exp);
          mx1 += b[0] * b[5] * mw;
          my1 += b[1] * b[5] * mw;
          mx2 += b[2] * b[6] * mw;
          my2 += b[3] * b[6] * mw;
          mts += b[5] * mw;
          mbs += b[6] * mw;
          b[4] *= weight;
          if (b[4] < threshold) {
            for (long c = 0; c < 5; ++c)  // cols 5+ stay (quirk)
              b[c] = boxes[(N - 1) * stride + c];
            --N;
            --pos;
          }
        }
      }
    }
    bi[0] = mx1 / mts;
    bi[1] = my1 / mts;
    bi[2] = mx2 / mbs;
    bi[3] = my2 / mbs;
  }
  return N;
}

PyArrayObject* as_f32_2d(PyObject* obj, long min_cols) {
  PyArrayObject* arr = (PyArrayObject*)PyArray_FROM_OTF(
      obj, NPY_FLOAT32, NPY_ARRAY_INOUT_ARRAY2);
  if (!arr) return nullptr;
  if (PyArray_NDIM(arr) != 2 || PyArray_DIM(arr, 1) < min_cols) {
    PyErr_SetString(PyExc_ValueError, "expected (N, >=5) float32 array");
    Py_DECREF(arr);
    return nullptr;
  }
  return arr;
}

PyObject* py_nms(PyObject*, PyObject* args) {
  PyObject* obj;
  float thresh;
  if (!PyArg_ParseTuple(args, "Of", &obj, &thresh)) return nullptr;
  PyArrayObject* arr = as_f32_2d(obj, 5);
  if (!arr) return nullptr;
  long n = PyArray_DIM(arr, 0);
  long stride = PyArray_DIM(arr, 1);
  auto keep = nms_impl((const float*)PyArray_DATA(arr), n, stride, thresh);
  PyArray_ResolveWritebackIfCopy(arr);
  Py_DECREF(arr);
  PyObject* list = PyList_New(keep.size());
  for (size_t i = 0; i < keep.size(); ++i)
    PyList_SET_ITEM(list, i, PyLong_FromLong(keep[i]));
  return list;
}

PyObject* soft_nms_generic(PyObject* args, PyObject* kwargs, long min_cols) {
  PyObject* obj;
  float sigma = 0.5f, Nt = 0.3f, threshold = 0.001f;
  int method = 0;
  static const char* kwlist[] = {"boxes", "sigma", "Nt", "threshold",
                                 "method", nullptr};
  if (!PyArg_ParseTupleAndKeywords(args, kwargs, "O|fffi",
                                   (char**)kwlist, &obj, &sigma, &Nt,
                                   &threshold, &method))
    return nullptr;
  PyArrayObject* arr = as_f32_2d(obj, min_cols);
  if (!arr) return nullptr;
  long n = PyArray_DIM(arr, 0);
  long stride = PyArray_DIM(arr, 1);
  long kept = soft_nms_impl((float*)PyArray_DATA(arr), n, stride, sigma, Nt,
                            threshold, method);
  PyArray_ResolveWritebackIfCopy(arr);
  Py_DECREF(arr);
  PyObject* list = PyList_New(kept);
  for (long i = 0; i < kept; ++i)
    PyList_SET_ITEM(list, i, PyLong_FromLong(i));
  return list;
}

PyObject* py_soft_nms(PyObject*, PyObject* args, PyObject* kwargs) {
  return soft_nms_generic(args, kwargs, 5);
}

PyObject* py_soft_nms_39(PyObject*, PyObject* args, PyObject* kwargs) {
  return soft_nms_generic(args, kwargs, 39);
}

PyObject* py_soft_nms_merge(PyObject*, PyObject* args, PyObject* kwargs) {
  PyObject* obj;
  float sigma = 0.5f, Nt = 0.3f, threshold = 0.001f, weight_exp = 6.f;
  int method = 0;
  static const char* kwlist[] = {"boxes", "sigma",      "Nt",
                                 "threshold", "method", "weight_exp",
                                 nullptr};
  if (!PyArg_ParseTupleAndKeywords(args, kwargs, "O|fffif",
                                   (char**)kwlist, &obj, &sigma, &Nt,
                                   &threshold, &method, &weight_exp))
    return nullptr;
  PyArrayObject* arr = as_f32_2d(obj, 7);
  if (!arr) return nullptr;
  long n = PyArray_DIM(arr, 0);
  long stride = PyArray_DIM(arr, 1);
  long kept = soft_nms_merge_impl((float*)PyArray_DATA(arr), n, stride,
                                  sigma, Nt, threshold, method, weight_exp);
  PyArray_ResolveWritebackIfCopy(arr);
  Py_DECREF(arr);
  PyObject* list = PyList_New(kept);
  for (long i = 0; i < kept; ++i)
    PyList_SET_ITEM(list, i, PyLong_FromLong(i));
  return list;
}

PyMethodDef methods[] = {
    {"nms", (PyCFunction)py_nms, METH_VARARGS,
     "nms(dets (N,5) float32, thresh) -> kept indices"},
    {"soft_nms", (PyCFunction)py_soft_nms, METH_VARARGS | METH_KEYWORDS,
     "soft_nms(boxes, sigma, Nt, threshold, method) -> keep; in-place"},
    {"soft_nms_39", (PyCFunction)py_soft_nms_39,
     METH_VARARGS | METH_KEYWORDS,
     "soft_nms_39(boxes (N,39)) -> keep; in-place"},
    {"soft_nms_merge", (PyCFunction)py_soft_nms_merge,
     METH_VARARGS | METH_KEYWORDS,
     "soft_nms_merge(boxes (N,>=7), ..., weight_exp) -> keep; in-place "
     "coordinate-merging variant"},
    {nullptr, nullptr, 0, nullptr}};

struct PyModuleDef moduledef = {PyModuleDef_HEAD_INIT, "_codenet_nms",
                                "native NMS kernels", -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit__codenet_nms(void) {
  import_array();
  return PyModule_Create(&moduledef);
}
