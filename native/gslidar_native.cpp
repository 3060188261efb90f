/* Native data-path runtime for gslidar_tpu.
 *
 * The reference's ingest hot paths are Python loops: the per-point
 * panorama z-buffer (utils/camera_utils.py:205-212) and per-frame
 * velodyne .bin reads (scene/kitti360_loader.py:180). This module provides
 * compiled equivalents through the CPython C API (no pybind11 in this
 * image):
 *
 *   read_velodyne(path) -> float32 ndarray [N, 4]
 *   project_pano(points [N,3] f32, intensity [N] f32, H, W,
 *                vfov_min, vfov_max, hfov_min, hfov_max)
 *       -> (depth [1,H,W] f32, intensity [1,H,W] f32)
 *
 * The projection keeps the nearest return per pixel, identical to the
 * reference's z-buffer semantics.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <cmath>
#include <cstdio>
#include <vector>

static PyObject *read_velodyne(PyObject *, PyObject *args) {
  const char *path;
  if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;

  FILE *f = fopen(path, "rb");
  if (!f) {
    PyErr_Format(PyExc_FileNotFoundError, "cannot open %s", path);
    return nullptr;
  }
  fseek(f, 0, SEEK_END);
  long bytes = ftell(f);
  fseek(f, 0, SEEK_SET);
  npy_intp n = bytes / (4 * sizeof(float));
  npy_intp dims[2] = {n, 4};
  PyObject *arr = PyArray_SimpleNew(2, dims, NPY_FLOAT32);
  if (!arr) {
    fclose(f);
    return nullptr;
  }
  size_t got = fread(PyArray_DATA((PyArrayObject *)arr), sizeof(float),
                     (size_t)n * 4, f);
  fclose(f);
  if (got != (size_t)n * 4) {
    Py_DECREF(arr);
    PyErr_Format(PyExc_IOError, "short read on %s", path);
    return nullptr;
  }
  return arr;
}

static PyObject *project_pano(PyObject *, PyObject *args) {
  PyArrayObject *pts_o, *inten_o;
  int H, W;
  double vfov_min, vfov_max, hfov_min, hfov_max;
  if (!PyArg_ParseTuple(args, "O!O!iidddd", &PyArray_Type, &pts_o,
                        &PyArray_Type, &inten_o, &H, &W, &vfov_min,
                        &vfov_max, &hfov_min, &hfov_max))
    return nullptr;

  PyArrayObject *pts = (PyArrayObject *)PyArray_FROM_OTF(
      (PyObject *)pts_o, NPY_FLOAT32, NPY_ARRAY_IN_ARRAY);
  PyArrayObject *inten = (PyArrayObject *)PyArray_FROM_OTF(
      (PyObject *)inten_o, NPY_FLOAT32, NPY_ARRAY_IN_ARRAY);
  if (!pts || !inten) {
    Py_XDECREF(pts);
    Py_XDECREF(inten);
    return nullptr;
  }
  npy_intp n = PyArray_DIM(pts, 0);

  npy_intp dims[3] = {1, H, W};
  PyObject *depth_o = PyArray_ZEROS(3, dims, NPY_FLOAT32, 0);
  PyObject *int_o = PyArray_ZEROS(3, dims, NPY_FLOAT32, 0);
  float *depth = (float *)PyArray_DATA((PyArrayObject *)depth_o);
  float *iimg = (float *)PyArray_DATA((PyArrayObject *)int_o);
  const float *P = (const float *)PyArray_DATA(pts);
  const float *I = (const float *)PyArray_DATA(inten);

  const double PI = 3.14159265358979323846;
  const double VFOV_max = PI / 2 - vfov_min * PI / 180;  // note the swap
  const double VFOV_min = PI / 2 - vfov_max * PI / 180;
  const double HFOV_max = hfov_max * PI / 180;
  const double HFOV_min = hfov_min * PI / 180;
  const double sv = H / (VFOV_max - VFOV_min);
  const double sh = W / (HFOV_max - HFOV_min);

  Py_BEGIN_ALLOW_THREADS
  for (npy_intp i = 0; i < n; i++) {
    const double x = P[3 * i], y = P[3 * i + 1], z = P[3 * i + 2];
    const double rxz = sqrt(x * x + z * z);
    const double phi = atan2(x, z);
    const double theta = atan2(rxz, -y);
    const double r = sqrt(x * x + y * y + z * z);
    const double ti = (theta - VFOV_min) * sv;
    const double pj = (phi - HFOV_min) * sh;
    if (ti < -0.5 || ti >= H - 0.5 || pj < -0.5 || pj >= W - 0.5) continue;
    const long u = lround(ti), v = lround(pj);
    float *cell = &depth[u * W + v];
    if (*cell == 0.0f || r < *cell) {
      *cell = (float)r;
      iimg[u * W + v] = I[i];
    }
  }
  Py_END_ALLOW_THREADS

  Py_DECREF(pts);
  Py_DECREF(inten);
  return Py_BuildValue("(NN)", depth_o, int_o);
}

static PyMethodDef Methods[] = {
    {"read_velodyne", read_velodyne, METH_VARARGS,
     "read a KITTI velodyne .bin -> [N,4] float32"},
    {"project_pano", project_pano, METH_VARARGS,
     "z-buffer camera-frame points into range/intensity panoramas"},
    {nullptr, nullptr, 0, nullptr}};

static struct PyModuleDef moddef = {PyModuleDef_HEAD_INIT, "gslidar_native",
                                    nullptr, -1, Methods};

PyMODINIT_FUNC PyInit_gslidar_native(void) {
  import_array();
  return PyModule_Create(&moddef);
}
