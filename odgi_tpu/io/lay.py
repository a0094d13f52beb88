"""Native layout container (.layt): coords + min-value, like odgi's .lay.

The reference .lay is min_value + an sdsl enc_vector of min-shifted doubles
bit-cast to uint64 (reference: src/algorithms/layout.cpp:43-67).  Our native
container stores the same logical content (a (2N, 2) float64 endpoint array)
in a simple tagged binary format; `coords(handle)` indexing follows
2*rank + is_rev (reference: layout.cpp:76-80).
"""

from __future__ import annotations

import struct
from typing import BinaryIO, Union

import numpy as np

MAGIC = b"OTLY0001"


def save_layout(coords: np.ndarray, out: Union[str, BinaryIO]) -> None:
    coords = np.asarray(coords, dtype=np.float64)
    close = False
    if isinstance(out, str):
        out = open(out, "wb")
        close = True
    try:
        out.write(MAGIC)
        out.write(struct.pack("<q", coords.shape[0]))
        out.write(coords.tobytes())
    finally:
        if close:
            out.close()


def load_layout(src: Union[str, BinaryIO]) -> np.ndarray:
    close = False
    if isinstance(src, str):
        src = open(src, "rb")
        close = True
    try:
        magic = src.read(8)
        if magic != MAGIC:
            raise ValueError(f"not an odgi_tpu layout file (magic {magic!r})")
        (n,) = struct.unpack("<q", src.read(8))
        data = np.frombuffer(src.read(n * 2 * 8), dtype=np.float64)
        return data.reshape(n, 2).copy()
    finally:
        if close:
            src.close()
