"""Native (C++) runtime components, loaded via ctypes.

The reference implements its ingest/serialization runtime in C++ (src/
gfa_to_handle.cpp, src/odgi.cpp); this package holds our equivalents,
compiled on demand with the system toolchain into ``libodgi_native.so``.
Every consumer falls back to the pure-Python implementation when the
library is unavailable, so the extension is an accelerator, never a
requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libodgi_native.so")
_SRC = [os.path.join(_HERE, "src", "gfa_parse.cpp")]
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


class _GfaResult(ctypes.Structure):
    _fields_ = [
        ("num_nodes", ctypes.c_int64),
        ("num_edges", ctypes.c_int64),
        ("num_paths", ctypes.c_int64),
        ("num_steps", ctypes.c_int64),
        ("seq_total", ctypes.c_int64),
        ("names_total", ctypes.c_int64),
        ("node_id", ctypes.POINTER(ctypes.c_int64)),
        ("node_len", ctypes.POINTER(ctypes.c_int64)),
        ("seq_offset", ctypes.POINTER(ctypes.c_int64)),
        ("seq", ctypes.POINTER(ctypes.c_uint8)),
        ("edge_from", ctypes.POINTER(ctypes.c_int64)),
        ("edge_to", ctypes.POINTER(ctypes.c_int64)),
        ("path_offset", ctypes.POINTER(ctypes.c_int64)),
        ("step_handle", ctypes.POINTER(ctypes.c_int64)),
        ("step_pos", ctypes.POINTER(ctypes.c_int64)),
        ("path_names", ctypes.POINTER(ctypes.c_uint8)),
        ("path_name_offset", ctypes.POINTER(ctypes.c_int64)),
        ("error", ctypes.c_char_p),
    ]


def build(force: bool = False) -> Optional[str]:
    """Compile the native library (idempotent). Returns .so path or None."""
    if not force and os.path.exists(_SO):
        newest = max(os.path.getmtime(s) for s in _SRC)
        if os.path.getmtime(_SO) >= newest:
            return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-o", _SO]
            + _SRC,
            check=True,
            capture_output=True,
            timeout=300,
        )
        return _SO
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        so = build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        lib.odgi_gfa_parse.restype = ctypes.POINTER(_GfaResult)
        lib.odgi_gfa_parse.argtypes = [ctypes.c_char_p]
        lib.odgi_gfa_free.restype = None
        lib.odgi_gfa_free.argtypes = [ctypes.POINTER(_GfaResult)]
        _lib = lib
    return _lib


def parse_gfa_native(path: str):
    """Parse a GFA file with the C++ parser; returns GraphTensors or None
    if the native library is unavailable (caller falls back to Python)."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    res = lib.odgi_gfa_parse(path.encode())
    try:
        r = res.contents
        if r.error:
            raise ValueError(r.error.decode())

        def arr(ptr, n, dtype=np.int64):
            if n == 0:
                return np.empty(0, dtype=dtype)
            return np.ctypeslib.as_array(ptr, shape=(n,)).astype(dtype, copy=True)

        N, E, P, S = r.num_nodes, r.num_edges, r.num_paths, r.num_steps
        names_blob = bytes(
            np.ctypeslib.as_array(r.path_names, shape=(r.names_total,))
        ) if r.names_total else b""
        name_off = arr(r.path_name_offset, P + 1)
        path_names = tuple(
            names_blob[name_off[j] : name_off[j + 1]].decode()
            for j in range(P)
        )
        from ..core.graph import GraphTensors

        return GraphTensors(
            node_len=arr(r.node_len, N),
            seq_offset=arr(r.seq_offset, N + 1),
            seq=arr(r.seq, r.seq_total, np.uint8),
            node_id=arr(r.node_id, N),
            edge_from=arr(r.edge_from, E),
            edge_to=arr(r.edge_to, E),
            path_names=path_names,
            path_circular=np.zeros(P, dtype=bool),
            path_offset=arr(r.path_offset, P + 1),
            step_handle=arr(r.step_handle, S),
            step_pos=arr(r.step_pos, S),
        )
    finally:
        lib.odgi_gfa_free(res)
