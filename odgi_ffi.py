"""Top-level ``odgi_ffi`` shim: the reference's low-level C-API binding
surface (reference: src/odgi-api.h, src/pythonffi.cpp), re-exported from
odgi_tpu.compat.odgi_ffi so the reference's own acceptance doctest
(``/root/reference/test/python/odgi_ffi.md``, wired via
CMakeLists.txt:131-137) runs verbatim against this framework:

    PYTHONPATH=/root/repo python -m doctest python/odgi_ffi.md

(tested in tests/test_reference_doctests.py).
"""

from odgi_tpu.compat.odgi_ffi import *  # noqa: F401,F403
