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


def order_from_x(g: GraphTensors, X: np.ndarray) -> np.ndarray:
    """(component, X, rank) lexsort of a 1D embedding
    (reference: path_sgd.cpp:649-658)."""
    comp = weak_component_ids(g)
    ranks = np.arange(g.num_nodes, dtype=np.int64)
    return np.lexsort((ranks, X, comp))


def path_sgd_order(
    g: GraphTensors,
    cfg: Optional[SgdConfig] = None,
    use_paths: Optional[Sequence[int]] = None,
    return_x: bool = False,
    overrides=None,
    target_paths: Optional[Sequence[int]] = None,
    snapshot_cb=None,
):
    """1D PG-SGD node order (reference: path_sgd.cpp:503-684).

    Returns the new rank order (i64[N] of old ranks), sorted by
    (component-by-avg-id, X, rank) exactly as path_sgd.cpp:649-658.
    `target_paths` pins their nodes (reference -H, path_sgd.cpp:285-302);
    `snapshot_cb(it, X)` receives per-iteration positions (-u).
    """
    if cfg is None and overrides:
        from ..ops.sgd import derive_config_1d

        cfg = derive_config_1d(g, **overrides)
    pin = None
    if target_paths:
        from ..core.graph import handle_rank

        pin = np.zeros(g.num_nodes, dtype=bool)
        for t in target_paths:
            lo, hi = int(g.path_offset[t]), int(g.path_offset[t + 1])
            pin[handle_rank(g.step_handle[lo:hi])] = True
    X = path_sgd_1d(g, cfg, use_paths, pin_nodes=pin, snapshot_cb=snapshot_cb)
    order = order_from_x(g, X)
    if return_x:
        return order, X
    return order


def sort_pipeline(
    g: GraphTensors,
    pipeline: str = "Ygs",
    progress: bool = False,
    sgd_overrides=None,
    target_paths: Optional[Sequence[int]] = None,
    snapshot_prefix: Optional[str] = None,
    use_paths: Optional[Sequence[int]] = None,
    bfs_chunk: int = 0,
    dfs_chunk: int = 0,
) -> GraphTensors:
    """Apply a chain of sort passes (reference: sort_main.cpp:418-506).

    Supported codes: Y (1D PG-SGD), g (groom), s (topological from heads),
    n (topological without head seeding), r (random shuffle),
    f (reverse current order), b/z (breadth/depth-first), w (two-way),
    c (cycle breaking), d (dagify).
    """
    for c in pipeline:
        if c == "Y":
            snapshot_cb = None
            if progress and not snapshot_prefix:
                from ..ops.sgd import derive_config_1d
                from ..utils.progress import ProgressMeter

                cfg_p = derive_config_1d(g, **(sgd_overrides or {}))
                meter = ProgressMeter(
                    cfg_p.iter_max, "[odgi_tpu::sort] 1D PG-SGD iterations"
                )

                def snapshot_cb(it, X, _m=meter):
                    _m.increment()
                    if it + 1 >= _m.total:
                        _m.finish()

            if snapshot_prefix:
                # write each iteration's graph sorted by that iteration's X
                # (reference: path_sgd.cpp:589-637 snapshot replay)
                from ..io.og_compat import save_og

                g_snap = g

                def snapshot_cb(it, X):
                    g2 = g_snap.apply_ordering(
                        order_from_x(g_snap, X), compact_ids=True
                    )
                    save_og(g2, f"{snapshot_prefix}{it + 1}")

            g = g.apply_ordering(
                path_sgd_order(
                    g,
                    overrides=sgd_overrides,
                    target_paths=target_paths,
                    snapshot_cb=snapshot_cb,
                    use_paths=use_paths,
                ),
                compact_ids=True,
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
                breadth_first_topological_order(g, bfs_chunk),
                compact_ids=True
            )
        elif c == "z":
            from .sorts_extra import depth_first_topological_order

            g = g.apply_ordering(
                depth_first_topological_order(g, dfs_chunk),
                compact_ids=True
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
        elif c == "e":
            # extension: Eades feedback-arc-set heuristic
            # (reference library: eades_algorithm.cpp; no reference CLI code)
            from .graph_misc import eades_order

            g = g.apply_ordering(eades_order(g), compact_ids=True)
        elif c == "l":
            # extension: non-path linear SGD (reference library:
            # linear_sgd.hpp:26-45; no reference CLI code)
            from .graph_misc import linear_sgd_order

            g = g.apply_ordering(linear_sgd_order(g), compact_ids=True)
        else:
            raise ValueError(f"unsupported sort pipeline code {c!r}")
    return g
