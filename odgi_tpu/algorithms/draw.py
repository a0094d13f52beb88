"""2D layout rendering: the `odgi draw` model.

The reference rasterizes one line segment per node between its two layout
endpoints, with optional path-rainbow coloring, onto a lock-free RGBA
canvas with Wu antialiased wide lines (reference: src/algorithms/
draw.{hpp,cpp}:201-443, atomic_image.{hpp,cpp}).  We map the same model
onto PIL's C rasterizer: per-node segments from coords[2*rank] to
coords[2*rank+1], scaled to the target resolution.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..core.graph import GraphTensors


def draw_png(
    g: GraphTensors,
    coords: np.ndarray,
    out_path: str,
    width: int = 1000,
    line_width: int = 1,
    color_by: str = "node",  # node | path
    border: float = 0.02,
) -> None:
    """Render the 2D layout to a PNG.

    coords: (2N, 2) endpoint array (layout.py / io.lay).
    """
    from PIL import Image, ImageDraw

    n = g.num_nodes
    xy = np.asarray(coords, dtype=np.float64)
    mn = xy.min(axis=0)
    mx = xy.max(axis=0)
    span = np.maximum(mx - mn, 1e-9)
    aspect = span[1] / span[0]
    height = max(16, int(width * aspect))
    pad = border * width
    scale = (width - 2 * pad) / span[0]
    scale_y = (height - 2 * pad) / span[1]
    s = min(scale, scale_y)
    pts = (xy - mn) * s + pad

    img = Image.new("RGB", (width, height), (255, 255, 255))
    drw = ImageDraw.Draw(img)

    if color_by == "path":
        # color nodes by the first path that visits them (rainbow by
        # position in path; draw.cpp:415-435 analog)
        from .viz import _PATH_COLORS
        from ..core.graph import handle_rank

        node_color = np.full((n, 3), 70, dtype=np.uint8)
        ranks = handle_rank(g.step_handle)
        for p in range(g.num_paths - 1, -1, -1):
            lo, hi = int(g.path_offset[p]), int(g.path_offset[p + 1])
            node_color[ranks[lo:hi]] = _PATH_COLORS[p % len(_PATH_COLORS)]
        colors = node_color
    else:
        colors = np.full((n, 3), 70, dtype=np.uint8)

    a = pts[0::2]
    b = pts[1::2]
    for i in range(n):
        drw.line(
            (a[i, 0], a[i, 1], b[i, 0], b[i, 1]),
            fill=tuple(int(c) for c in colors[i]),
            width=line_width,
        )
    img.save(out_path)
