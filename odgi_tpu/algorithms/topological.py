"""Topological ordering of a bidirected graph.

Host-side re-implementation of the reference's modified Kahn algorithm with
cycle-breaking seeds and masked edges (reference:
src/algorithms/topological_sort.cpp:51-330).  Determinism contract matches
the reference: the ready set, seed set, and unvisited fallback all pop the
*minimum node rank* first (the reference uses succinct bitvector select1(0)).

The output is a permutation of node ranks (orientation is not flipped in the
output; the reference emits pack(rank, false) — :201-204).
"""

from __future__ import annotations

import heapq
from typing import List, Set

import numpy as np

from ..core.graph import GraphTensors, SideAdjacency, handle_flip, handle_rank


def head_nodes(g: GraphTensors) -> np.ndarray:
    """Ranks of nodes with no edges on their left (forward) side
    (reference: topological_sort.cpp:8-27)."""
    adj = g.adjacency
    # left edges of forward node rank r = right edges of handle (r<<1)|1
    deg = adj.degree_out()
    return np.nonzero(deg[1::2] == 0)[0]


def tail_nodes(g: GraphTensors) -> np.ndarray:
    """Ranks of nodes with no edges on their right (forward) side
    (reference: topological_sort.cpp:29-48)."""
    deg = g.adjacency.degree_out()
    return np.nonzero(deg[0::2] == 0)[0]


class _MinSet:
    """Set with O(log n) min-pop (mirrors the reference's select1(0))."""

    def __init__(self):
        self._heap: List[int] = []
        self._set: Set[int] = set()

    def add(self, x: int):
        if x not in self._set:
            self._set.add(x)
            heapq.heappush(self._heap, x)

    def discard(self, x: int):
        self._set.discard(x)

    def __contains__(self, x: int) -> bool:
        return x in self._set

    def __bool__(self) -> bool:
        return bool(self._set)

    def pop_min(self) -> int:
        while True:
            x = heapq.heappop(self._heap)
            if x in self._set:
                self._set.remove(x)
                return x

    def peek_min(self) -> int:
        while True:
            x = self._heap[0]
            if x in self._set:
                return x
            heapq.heappop(self._heap)


def _edge_key(a: int, b: int) -> tuple:
    """Canonical directed-edge key (the libhandlegraph edge_handle rule):
    (a, b) and (flip(b), flip(a)) are the same bidirected edge."""
    fa, fb = b ^ 1, a ^ 1
    return (fa, fb) if (fa, fb) < (a, b) else (a, b)


def topological_order(
    g: GraphTensors, use_heads: bool = True, use_tails: bool = False
) -> np.ndarray:
    """Return a topological node-rank order (reference:
    topological_sort.cpp:51).  `use_heads` seeds the ready set with head
    nodes (the `odgi sort` 's' pipeline step); `use_tails` with tails ('n'
    does neither head seeding: reference sort_main.cpp 'n' uses
    use_heads=False)."""
    n = g.num_nodes
    if n == 0:
        return np.empty(0, dtype=np.int64)
    adj = g.adjacency

    masked: Set[tuple] = set()
    sorted_out: List[int] = []

    s = _MinSet()  # oriented, ready to emit (by rank)
    seeds = _MinSet()
    seeds_rev = np.zeros(n, dtype=bool)
    unvisited = _MinSet()

    if use_heads:
        for r in head_nodes(g):
            s.add(int(r))
    elif use_tails:
        for r in tail_nodes(g):
            s.add(int(r))
    for r in range(n):
        if r not in s:
            unvisited.add(r)

    while unvisited or s:
        # refill from seeds, then arbitrary unvisited (reference :160-196)
        while not s and seeds:
            sr = seeds.pop_min()
            if sr in unvisited:
                s.add(sr)
                unvisited.discard(sr)
        if not s:
            r = unvisited.pop_min()
            s.add(r)

        while s:
            i = s.pop_min()
            h = i << 1  # forward orientation, as the reference emits
            sorted_out.append(i)

            # Mask left-side edges into already-visited cycle entry points
            # (reference :215-238): edges from prev -> h where prev visited.
            left_of = h ^ 1  # neighbors right of flip(h) = nodes left of h
            for nb in adj.neighbors(left_of):
                prev_node = int(nb) ^ 1
                if (prev_node >> 1) not in unvisited:
                    key = _edge_key(prev_node, h)
                    if key not in masked:
                        masked.add(key)

            # Follow right-side edges (reference :243-330).
            for nxt in adj.neighbors(h):
                nxt = int(nxt)
                key = _edge_key(h, nxt)
                if key in masked:
                    continue
                masked.add(key)
                nr = nxt >> 1
                if nr in unvisited:
                    # does nxt still have an unmasked incoming edge?
                    unmasked_incoming = False
                    for pb in adj.neighbors(nxt ^ 1):
                        prev_edge = _edge_key(int(pb) ^ 1, nxt)
                        if prev_edge not in masked:
                            unmasked_incoming = True
                            break
                    if not unmasked_incoming:
                        s.add(nr)
                        unvisited.discard(nr)
                    elif nr not in seeds:
                        seeds.add(nr)
                        seeds_rev[nr] = bool(nxt & 1)

    return np.asarray(sorted_out, dtype=np.int64)
