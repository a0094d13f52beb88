"""Top-level ``odgi`` shim: the reference's high-level pybind11 class
API (reference: src/pythonmodule.cpp), re-exported from
odgi_tpu.compat.odgi so ``import odgi`` / ``from odgi import *`` work
verbatim (used by /root/reference/test/python/odgi_performance.md;
tested in tests/test_reference_doctests.py).
"""

from odgi_tpu.compat.odgi import *  # noqa: F401,F403
from odgi_tpu.compat.odgi import graph  # noqa: F401
