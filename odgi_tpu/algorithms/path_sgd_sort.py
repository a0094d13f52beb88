"""PG-SGD 1D sort driver and the Ygs pipeline.

The `odgi sort` layer on top of the SGD kernel: run 1D PG-SGD, then order
handles by (weakly-connected component, X position, rank) — reference:
src/algorithms/path_sgd.cpp:503-684 `path_linear_sgd_order` — and the
pipeline driver that chains sort passes like "Ygs"
(reference: src/subcommand/sort_main.cpp:418-506).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from ..core.graph import GraphTensors
from ..ops.sgd import SgdConfig, derive_config_1d, path_sgd_1d
from .components import weak_component_ids
from .groom import apply_groom
from .topological import topological_order


def path_sgd_order(
    g: GraphTensors,
    cfg: Optional[SgdConfig] = None,
    use_paths: Optional[Sequence[int]] = None,
    return_x: bool = False,
    overrides=None,
):
    """1D PG-SGD node order (reference: path_sgd.cpp:503-684).

    Returns the new rank order (i64[N] of old ranks), sorted by
    (component-by-avg-id, X, rank) exactly as path_sgd.cpp:649-658.
    """
    if cfg is None and overrides:
        from ..ops.sgd import derive_config_1d

        cfg = derive_config_1d(g, **overrides)
    X = path_sgd_1d(g, cfg, use_paths)
    comp = weak_component_ids(g)
    ranks = np.arange(g.num_nodes, dtype=np.int64)
    order = np.lexsort((ranks, X, comp))
    if return_x:
        return order, X
    return order


def sort_pipeline(
    g: GraphTensors,
    pipeline: str = "Ygs",
    progress: bool = False,
    sgd_overrides=None,
) -> GraphTensors:
    """Apply a chain of sort passes (reference: sort_main.cpp:418-506).

    Supported codes: Y (1D PG-SGD), g (groom), s (topological from heads),
    n (topological without head seeding), r (random shuffle),
    f (reverse current order), b/z (breadth/depth-first), w (two-way),
    c (cycle breaking), d (dagify).
    """
    for c in pipeline:
        if c == "Y":
            g = g.apply_ordering(
                path_sgd_order(g, overrides=sgd_overrides), compact_ids=True
            )
        elif c == "g":
            g = apply_groom(g)
        elif c == "s":
            g = g.apply_ordering(
                topological_order(g, use_heads=True), compact_ids=True
            )
        elif c == "n":
            g = g.apply_ordering(
                topological_order(g, use_heads=False), compact_ids=True
            )
        elif c == "f":
            g = g.apply_ordering(
                np.arange(g.num_nodes - 1, -1, -1, dtype=np.int64),
                compact_ids=True,
            )
        elif c == "r":
            rng = np.random.default_rng(9399220)
            g = g.apply_ordering(
                rng.permutation(g.num_nodes).astype(np.int64), compact_ids=True
            )
        elif c == "b":
            from .sorts_extra import breadth_first_topological_order

            g = g.apply_ordering(
                breadth_first_topological_order(g), compact_ids=True
            )
        elif c == "z":
            from .sorts_extra import depth_first_topological_order

            g = g.apply_ordering(
                depth_first_topological_order(g), compact_ids=True
            )
        elif c == "w":
            from .sorts_extra import two_way_topological_order

            g = g.apply_ordering(two_way_topological_order(g), compact_ids=True)
        elif c == "c":
            from .sorts_extra import cycle_breaking_order

            g = g.apply_ordering(cycle_breaking_order(g), compact_ids=True)
        elif c == "d":
            from .sorts_extra import dagify_sort_order

            g = g.apply_ordering(dagify_sort_order(g), compact_ids=True)
        else:
            raise ValueError(f"unsupported sort pipeline code {c!r}")
    return g
