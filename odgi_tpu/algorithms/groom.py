"""Groom: re-orient nodes to the dominant strand.

Re-implementation of the reference's traversal-based grooming (reference:
src/algorithms/groom.cpp:13-213): walk the graph rightward from the head
nodes (reference bfs helper, src/algorithms/bfs.cpp:10-70 — a deque that
pops from the back, so effectively depth-first with sources processed in
reverse order); each node's orientation as first visited decides whether it
is flipped.  The node ORDER is unchanged; only orientations flip
(groom.cpp:178-196 emits rank order with flips).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ..core.graph import GraphTensors, handle_rank
from .topological import head_nodes


def groom(
    g: GraphTensors, target_paths: Optional[Sequence[int]] = None
) -> np.ndarray:
    """Return bool[N] flip mask (True = flip node's orientation).

    With `target_paths`, nodes of those paths are forced to the orientation
    that makes their target-path traversal forward (groom.cpp:44-78).
    """
    n = g.num_nodes
    adj = g.adjacency
    unvisited = np.ones(n, dtype=bool)
    flipped = np.zeros(n, dtype=bool)

    is_ref = np.zeros(n, dtype=bool)
    needs_flipping = np.zeros(n, dtype=bool)
    seeds = []
    if target_paths:
        for p in target_paths:
            lo, hi = int(g.path_offset[p]), int(g.path_offset[p + 1])
            for h in g.step_handle[lo:hi]:
                h = int(h)
                r = h >> 1
                if not is_ref[r]:
                    is_ref[r] = True
                    seeds.append(h)
                    if h & 1:
                        needs_flipping[r] = True
    else:
        seeds = [int(r) << 1 for r in head_nodes(g)]

    # The reference pushes sources to the deque front in order and pops from
    # the back, then pushes discovered nodes to the back (bfs.cpp:28-65):
    # i.e. a stack that starts with the FIRST seed on top and explores
    # discovered nodes before the remaining seeds.
    stack = list(reversed(seeds))
    targets = adj.targets
    offsets = adj.offsets
    while True:
        while stack:
            h = stack.pop()
            r = h >> 1
            if not unvisited[r]:
                continue
            unvisited[r] = False
            if is_ref[r]:
                flipped[r] = needs_flipping[r]
            else:
                flipped[r] = bool(h & 1)
            for nb in targets[offsets[h] : offsets[h + 1]]:
                if unvisited[nb >> 1]:
                    stack.append(int(nb))
        rest = np.nonzero(unvisited)[0]
        if len(rest) == 0:
            break
        stack = [int(rest[0]) << 1]
    return flipped


def apply_groom(
    g: GraphTensors, target_paths: Optional[Sequence[int]] = None
) -> GraphTensors:
    """Groom and apply the orientation flips (order unchanged)."""
    return g.apply_orientations(groom(g, target_paths))
