// motion_cache — native dataset cache for the motion library.
//
// The reference's motion-data path leans on native code (the Autodesk FBX
// SDK importer, reference ase/poselib/.../fbx_backend.py) and re-parses
// pickled .npy clips on every startup. ase_tpu instead compiles a motion
// dataset once into a flat binary cache (.msc) and memory-maps it on
// subsequent startups: zero-copy, no pickle, O(dataset) -> O(1) load time.
//
// CPython extension (no pybind11): exposes
//   pack(path, names, dtypes, shapes, buffers)  — write cache
//   load(path) -> list[(name, dtype, shape, memoryview)] — mmap + zero-copy views
//
// Format (little endian):
//   magic "MSC1" | u32 n_arrays
//   per array: u32 name_len | name | u32 dtype_len | dtype ("<f4"/"<i4"...)
//              u32 ndim | u64 shape[ndim] | u64 nbytes | pad to 64 | data
//
// The mmap stays alive for the lifetime of the returned capsule; numpy
// wraps the memoryviews with np.frombuffer (no copies).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <string>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr char kMagic[4] = {'M', 'S', 'C', '1'};
constexpr uint64_t kAlign = 64;

uint64_t align_up(uint64_t x) { return (x + kAlign - 1) & ~(kAlign - 1); }

struct MappedFile {
  void* addr = nullptr;
  size_t size = 0;
};

void mapped_file_destructor(PyObject* capsule) {
  auto* mf = static_cast<MappedFile*>(
      PyCapsule_GetPointer(capsule, "ase_tpu.motion_cache.mmap"));
  if (mf != nullptr) {
    if (mf->addr != nullptr) munmap(mf->addr, mf->size);
    delete mf;
  }
}

PyObject* pack(PyObject*, PyObject* args) {
  const char* path;
  PyObject *names, *dtypes, *shapes, *buffers;
  if (!PyArg_ParseTuple(args, "sOOOO", &path, &names, &dtypes, &shapes,
                        &buffers)) {
    return nullptr;
  }
  Py_ssize_t n = PySequence_Length(names);
  if (n < 0) return nullptr;

  FILE* f = fopen(path, "wb");
  if (f == nullptr) {
    PyErr_SetFromErrnoWithFilename(PyExc_OSError, path);
    return nullptr;
  }

  auto write_u32 = [&](uint32_t v) { fwrite(&v, 4, 1, f); };
  auto write_u64 = [&](uint64_t v) { fwrite(&v, 8, 1, f); };

  fwrite(kMagic, 1, 4, f);
  write_u32(static_cast<uint32_t>(n));

  bool ok = true;
  for (Py_ssize_t i = 0; i < n && ok; ++i) {
    PyObject* name = PySequence_GetItem(names, i);
    PyObject* dtype = PySequence_GetItem(dtypes, i);
    PyObject* shape = PySequence_GetItem(shapes, i);
    PyObject* buf_obj = PySequence_GetItem(buffers, i);

    const char* name_s = PyUnicode_AsUTF8(name);
    const char* dtype_s = PyUnicode_AsUTF8(dtype);
    Py_buffer view;
    if (name_s == nullptr || dtype_s == nullptr ||
        PyObject_GetBuffer(buf_obj, &view, PyBUF_C_CONTIGUOUS) != 0) {
      ok = false;
    } else {
      uint32_t name_len = static_cast<uint32_t>(strlen(name_s));
      uint32_t dtype_len = static_cast<uint32_t>(strlen(dtype_s));
      write_u32(name_len);
      fwrite(name_s, 1, name_len, f);
      write_u32(dtype_len);
      fwrite(dtype_s, 1, dtype_len, f);

      Py_ssize_t ndim = PySequence_Length(shape);
      write_u32(static_cast<uint32_t>(ndim));
      for (Py_ssize_t d = 0; d < ndim; ++d) {
        PyObject* dim = PySequence_GetItem(shape, d);
        write_u64(static_cast<uint64_t>(PyLong_AsUnsignedLongLong(dim)));
        Py_XDECREF(dim);
      }
      write_u64(static_cast<uint64_t>(view.len));

      long pos = ftell(f);
      uint64_t padded = align_up(static_cast<uint64_t>(pos));
      std::vector<char> zeros(padded - pos, 0);
      if (!zeros.empty()) fwrite(zeros.data(), 1, zeros.size(), f);
      fwrite(view.buf, 1, view.len, f);
      PyBuffer_Release(&view);
    }
    Py_XDECREF(name);
    Py_XDECREF(dtype);
    Py_XDECREF(shape);
    Py_XDECREF(buf_obj);
  }
  fclose(f);
  if (!ok) {
    if (!PyErr_Occurred()) PyErr_SetString(PyExc_ValueError, "pack failed");
    return nullptr;
  }
  Py_RETURN_NONE;
}

PyObject* load(PyObject*, PyObject* args) {
  const char* path;
  if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;

  int fd = open(path, O_RDONLY);
  if (fd < 0) {
    PyErr_SetFromErrnoWithFilename(PyExc_OSError, path);
    return nullptr;
  }
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    PyErr_SetFromErrnoWithFilename(PyExc_OSError, path);
    return nullptr;
  }
  size_t size = static_cast<size_t>(st.st_size);
  void* addr = mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (addr == MAP_FAILED) {
    PyErr_SetFromErrnoWithFilename(PyExc_OSError, path);
    return nullptr;
  }

  const char* base = static_cast<const char*>(addr);
  size_t off = 0;
  auto avail = [&](size_t n) { return off + n <= size; };

  if (!avail(8) || memcmp(base, kMagic, 4) != 0) {
    munmap(addr, size);
    PyErr_SetString(PyExc_ValueError, "bad motion cache magic");
    return nullptr;
  }
  off = 4;
  uint32_t n_arrays;
  memcpy(&n_arrays, base + off, 4);
  off += 4;

  auto* mf = new MappedFile{addr, size};
  PyObject* capsule =
      PyCapsule_New(mf, "ase_tpu.motion_cache.mmap", mapped_file_destructor);
  PyObject* out = PyList_New(0);

  bool ok = (capsule != nullptr && out != nullptr);
  for (uint32_t i = 0; i < n_arrays && ok; ++i) {
    uint32_t name_len = 0, dtype_len = 0, ndim = 0;
    if (!avail(4)) { ok = false; break; }
    memcpy(&name_len, base + off, 4); off += 4;
    if (!avail(name_len)) { ok = false; break; }
    std::string name(base + off, name_len); off += name_len;
    if (!avail(4)) { ok = false; break; }
    memcpy(&dtype_len, base + off, 4); off += 4;
    if (!avail(dtype_len)) { ok = false; break; }
    std::string dtype(base + off, dtype_len); off += dtype_len;
    if (!avail(4)) { ok = false; break; }
    memcpy(&ndim, base + off, 4); off += 4;

    PyObject* shape = PyTuple_New(ndim);
    for (uint32_t d = 0; d < ndim; ++d) {
      uint64_t dim = 0;
      if (!avail(8)) { ok = false; break; }
      memcpy(&dim, base + off, 8); off += 8;
      PyTuple_SET_ITEM(shape, d, PyLong_FromUnsignedLongLong(dim));
    }
    uint64_t nbytes = 0;
    if (!ok || !avail(8)) { Py_XDECREF(shape); ok = false; break; }
    memcpy(&nbytes, base + off, 8); off += 8;
    off = align_up(off);
    if (!avail(nbytes)) { Py_XDECREF(shape); ok = false; break; }

    PyObject* view = PyMemoryView_FromMemory(
        const_cast<char*>(base + off), static_cast<Py_ssize_t>(nbytes),
        PyBUF_READ);
    off += nbytes;

    PyObject* entry = Py_BuildValue("(s s N N)", name.c_str(), dtype.c_str(),
                                    shape, view);
    if (entry == nullptr || PyList_Append(out, entry) != 0) ok = false;
    Py_XDECREF(entry);
  }

  if (!ok) {
    Py_XDECREF(out);
    Py_XDECREF(capsule);  // destructor unmaps
    if (!PyErr_Occurred())
      PyErr_SetString(PyExc_ValueError, "corrupt motion cache");
    return nullptr;
  }
  PyObject* result = Py_BuildValue("(N N)", out, capsule);
  return result;
}

PyMethodDef methods[] = {
    {"pack", pack, METH_VARARGS,
     "pack(path, names, dtypes, shapes, buffers) — write a motion cache"},
    {"load", load, METH_VARARGS,
     "load(path) -> (entries, mmap_capsule) — zero-copy mapped arrays"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {PyModuleDef_HEAD_INIT, "_motion_cache",
                      "native motion dataset cache", -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit__motion_cache(void) { return PyModule_Create(&module); }
