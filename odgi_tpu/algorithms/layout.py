"""2D layout driver: init modes, PG-SGD layout, component packing, output.

Covers the `odgi layout` command layer (reference:
src/subcommand/layout_main.cpp): the d/r/u/g/h coordinate initializations
(:268-330, Hilbert d2xy from src/algorithms/hilbert.hpp), the 2D PG-SGD run,
and the per-component vertical packing of the final coordinates (:402-435).

Coordinates are (2N, 2): two endpoints per node (start, end) x (x, y),
matching the reference's X[2N], Y[2N] with endpoint index
2*rank + use_other_end (reference: layout_main.cpp:268-269,
src/algorithms/layout.cpp:76-80).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, TextIO, Tuple, Union

import numpy as np

from ..core.graph import GraphTensors
from ..ops.sgd import SgdConfig, derive_config_2d, path_sgd_2d
from .components import weak_component_ids


def hilbert_d2xy(n: int, d: int) -> Tuple[int, int]:
    """Hilbert curve index -> (x, y) (reference: src/algorithms/hilbert.hpp)."""
    rx = ry = 0
    x = y = 0
    t = d
    s = 1
    while s < n:
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        # rotate
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        x += s * rx
        y += s * ry
        t //= 4
        s *= 2
    return x, y


def init_layout(
    g: GraphTensors, mode: str = "d", seed: int = 9399220
) -> np.ndarray:
    """Initial (2N, 2) coordinates (reference: layout_main.cpp:268-330).

    Modes: 'd' (default: X = cumulative bp, Y = gaussian), 'u' (X cumulative,
    Y uniform), 'r' (both uniform in total length), 'g' (both gaussian),
    'h' (Hilbert curve over the endpoint index space).
    """
    n = g.num_nodes
    rng = np.random.default_rng(seed)
    coords = np.zeros((2 * n, 2), dtype=np.float64)
    sd = np.sqrt(2.0 * n)
    total_len = float(g.total_length)
    # endpoint X positions along the pangenome: starts/ends interleaved
    starts = g.node_offset.astype(np.float64)
    ends = starts + g.node_len
    if mode == "g":
        coords[:, 0] = rng.normal(0, sd, 2 * n)
        coords[:, 1] = rng.normal(0, sd, 2 * n)
    elif mode == "u":
        coords[0::2, 0] = starts
        coords[1::2, 0] = ends
        coords[:, 1] = rng.uniform(0, sd, 2 * n)
    elif mode == "r":
        coords[:, 0] = rng.uniform(0, total_len, 2 * n)
        coords[:, 1] = rng.uniform(0, total_len, 2 * n)
    elif mode == "h":
        # square side >= number of endpoint slots, power of two
        side = 1
        while side * side < 2 * n:
            side *= 2
        for pos in range(2 * n):
            x, y = hilbert_d2xy(side, pos)
            coords[pos] = (x, y)
    else:  # 'd'
        coords[0::2, 0] = starts
        coords[1::2, 0] = ends
        coords[:, 1] = rng.normal(0, sd, 2 * n)
    return coords


def pack_components(g: GraphTensors, coords: np.ndarray, border: float = 1000.0) -> np.ndarray:
    """Stack weakly-connected components vertically with a border
    (reference: layout_main.cpp:402-435)."""
    comp = weak_component_ids(g)
    ncomp = int(comp.max()) + 1 if len(comp) else 0
    out = coords.copy()
    ep_comp = np.repeat(comp, 2)
    curr_y_offset = border
    for c in range(ncomp):
        sel = ep_comp == c
        min_x = out[sel, 0].min()
        min_y = out[sel, 1].min()
        max_y = out[sel, 1].max()
        x_offset = min_x - border
        y_offset = curr_y_offset - min_y
        out[sel, 0] -= x_offset
        out[sel, 1] += y_offset
        curr_y_offset += (max_y - min_y) + border
    return out


def layout_graph(
    g: GraphTensors,
    cfg: Optional[SgdConfig] = None,
    init_mode: str = "d",
    seed: int = 9399220,
    pack: bool = True,
    use_paths=None,
    snapshot_cb=None,
) -> np.ndarray:
    """End-to-end `odgi layout`: init, PG-SGD, component packing.

    Requires an optimized graph (reference: layout_main.cpp:148-151,
    layout.cu:318-323)."""
    coords0 = init_layout(g, init_mode, seed)
    coords = path_sgd_2d(
        g, coords0, cfg, use_paths=use_paths, snapshot_cb=snapshot_cb
    )
    if pack:
        coords = pack_components(g, coords)
    return coords


def layout_to_tsv(coords: np.ndarray, out: Union[str, TextIO], g: Optional[GraphTensors] = None) -> None:
    """TSV export (reference: src/algorithms/layout.cpp:68-74 `Layout::to_tsv`):
    one row per endpoint with 17-significant-digit formatting."""
    close = False
    if isinstance(out, str):
        out = open(out, "w")
        close = True
    try:
        out.write("idx\tX\tY\n")
        for i in range(len(coords)):
            out.write(f"{i}\t{_fmt(coords[i, 0])}\t{_fmt(coords[i, 1])}\n")
    finally:
        if close:
            out.close()


def _fmt(v: float) -> str:
    """Mimic std::setprecision(digits10+1) default-float formatting."""
    return np.format_float_positional(v, precision=16, unique=True, trim="-")
