"""1D binned graph raster: the `odgi viz` model, vectorized.

The reference always renders binned (reference: src/subcommand/
viz_main.cpp:583-605 — default bin width makes one pixel column per bin),
with a top band of node rectangles + inter-bin links and one row (or
packed rows) per path colored by strand / depth / inversion
(viz_main.cpp:1025-1214).  The per-path per-bin statistics follow
src/algorithms/bin_path_info.{hpp,cpp}: mean depth, mean inversion, mean
position per bin.

We compute all bin statistics with bincounts over the step tensor and
rasterize into a numpy RGB image (PNG via PIL instead of lodepng).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import numpy as np

from ..core.graph import GraphTensors, handle_is_reverse, handle_rank


@dataclass
class PathBins:
    """Per-path binned statistics (bin_path_info.hpp:24-41 analog)."""

    mean_depth: np.ndarray      # f64[P, B] mean coverage depth per bin
    mean_inv: np.ndarray        # f64[P, B] fraction of reverse coverage
    mean_pos: np.ndarray        # f64[P, B] mean path-position per bin
    first_bin: np.ndarray       # i64[P] first covered bin per path
    last_bin: np.ndarray        # i64[P] last covered bin per path


def bin_paths(g: GraphTensors, num_bins: int) -> PathBins:
    """Bin every path's coverage over the pangenome positions.

    Each step covers [node_offset, node_offset+len) in the linearized
    pangenome; contributions are split across bins at bp granularity
    using prefix sums (no per-bp loops).
    """
    P = g.num_paths
    total = max(1, g.total_length)
    bin_width = total / num_bins
    depth = np.zeros((P, num_bins), dtype=np.float64)
    inv = np.zeros((P, num_bins), dtype=np.float64)
    pos_sum = np.zeros((P, num_bins), dtype=np.float64)

    ranks = handle_rank(g.step_handle)
    revs = handle_is_reverse(g.step_handle)
    starts = g.node_offset[ranks].astype(np.float64)  # pangenome start bp
    lens = g.node_len[ranks].astype(np.float64)
    ends = starts + lens
    b0 = np.minimum((starts / bin_width).astype(np.int64), num_bins - 1)
    b1 = np.minimum(((ends - 1e-9) / bin_width).astype(np.int64), num_bins - 1)
    sp = g.step_path
    ppos = g.step_pos.astype(np.float64)

    # most steps fall in one bin; handle multi-bin spans per extra bin
    span = b1 - b0
    max_span = int(span.max()) if len(span) else 0
    for k in range(max_span + 1):
        sel = span >= k
        if not sel.any():
            break
        b = b0[sel] + k
        # overlap of [start, end) with bin b
        lo = np.maximum(starts[sel], b * bin_width)
        hi = np.minimum(ends[sel], (b + 1) * bin_width)
        frac = np.maximum(hi - lo, 0.0)
        flat = sp[sel] * num_bins + b
        np.add.at(depth.ravel(), flat, frac)
        np.add.at(inv.ravel(), flat, frac * revs[sel])
        np.add.at(pos_sum.ravel(), flat, frac * ppos[sel])

    with np.errstate(invalid="ignore", divide="ignore"):
        mean_inv = np.where(depth > 0, inv / depth, 0.0)
        mean_pos = np.where(depth > 0, pos_sum / depth, 0.0)
    mean_depth = depth / bin_width

    covered = depth > 0
    first_bin = np.where(
        covered.any(axis=1), covered.argmax(axis=1), 0
    ).astype(np.int64)
    last_bin = np.where(
        covered.any(axis=1),
        num_bins - 1 - covered[:, ::-1].argmax(axis=1),
        0,
    ).astype(np.int64)
    return PathBins(mean_depth, mean_inv, mean_pos, first_bin, last_bin)


# simple categorical palette for paths (spectral-ish)
_PATH_COLORS = np.array(
    [
        (158, 1, 66), (213, 62, 79), (244, 109, 67), (253, 174, 97),
        (254, 224, 139), (230, 245, 152), (171, 221, 164), (102, 194, 165),
        (50, 136, 189), (94, 79, 162), (140, 81, 10), (1, 102, 94),
    ],
    dtype=np.uint8,
)


def render_viz(
    g: GraphTensors,
    width: int = 1500,
    path_height: int = 10,
    color_by: str = "path",  # path | strand | depth | gray
    link_band: int = 40,
    paths: Optional[Sequence[int]] = None,
) -> np.ndarray:
    """Render the binned 1D visualization; returns RGB uint8 image.

    Layout mirrors the reference (viz_main.cpp): a top band with node
    marks and inter-bin link arcs, then one row of `path_height` pixels
    per path.
    """
    sel = list(range(g.num_paths)) if paths is None else list(paths)
    bins = bin_paths(g, width)
    P = len(sel)
    H = link_band + 4 + P * path_height
    img = np.full((H, width, 3), 255, dtype=np.uint8)

    # top band: node extent marks
    total = max(1, g.total_length)
    bw = total / width
    node_b0 = np.minimum((g.node_offset / bw).astype(np.int64), width - 1)
    img[link_band : link_band + 2, :, :] = 230
    img[link_band : link_band + 2, node_b0, :] = 60

    # link arcs: edges whose endpoints land in non-adjacent bins
    ef_rank = handle_rank(g.edge_from)
    et_rank = handle_rank(g.edge_to)
    fb = node_b0[ef_rank]
    tb = node_b0[et_rank]
    lo_b = np.minimum(fb, tb)
    hi_b = np.maximum(fb, tb)
    nonadj = hi_b - lo_b > 1
    for a, b in zip(lo_b[nonadj], hi_b[nonadj]):
        h = min(link_band - 1, max(2, int((b - a) / width * link_band * 2)))
        y = link_band - 1 - h
        img[y : link_band, a, :] = 120
        img[y : link_band, b, :] = 120
        img[y, a : b + 1, :] = 120

    # path rows
    for row, p in enumerate(sel):
        y0 = link_band + 4 + row * path_height
        y1 = y0 + max(1, path_height - 1)  # 1px separator
        covered = bins.mean_depth[p] > 0
        if color_by == "strand":
            # forward = black, majority-reverse = red (viz -z analog)
            col = np.where(
                bins.mean_inv[p][:, None] > 0.5,
                np.array([220, 30, 30], np.uint8),
                np.array([40, 40, 40], np.uint8),
            )
        elif color_by == "depth":
            d = bins.mean_depth[p]
            dmax = d.max() if d.max() > 0 else 1.0
            t = np.clip(d / dmax, 0, 1)[:, None]
            cold = np.array([225, 240, 255], np.float64)
            hot = np.array([8, 48, 107], np.float64)
            col = (cold + (hot - cold) * t).astype(np.uint8)
        elif color_by == "gray":
            col = np.tile(np.array([70, 70, 70], np.uint8), (width, 1))
        else:  # per-path categorical
            col = np.tile(_PATH_COLORS[p % len(_PATH_COLORS)], (width, 1))
        rowimg = np.full((width, 3), 255, np.uint8)
        rowimg[covered] = col[covered]
        img[y0:y1, :, :] = rowimg[None, :, :]
    return img


def save_viz_png(
    g: GraphTensors, out_path: str, width: int = 1500, **kwargs
) -> None:
    """Render and write a PNG (the `odgi viz -o` entry point)."""
    from PIL import Image

    img = render_viz(g, width=width, **kwargs)
    Image.fromarray(img, "RGB").save(out_path)
