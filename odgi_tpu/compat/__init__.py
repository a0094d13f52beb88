"""Drop-in compatibility layers for reference odgi bindings.

- ``odgi_tpu.compat.odgi``      — the ``import odgi`` pybind11 class API
  (reference: src/pythonmodule.cpp): a mutable ``graph`` class.
- ``odgi_tpu.compat.odgi_ffi``  — the ``import odgi_ffi`` C-API wrappers
  (reference: src/odgi-api.h, exercised by test/python/odgi_ffi.md).

Both operate on the same mutable graph model backed by GraphTensors
freezing, so reference scripts port without touching the TPU internals.
"""
