"""Secondary sort orders for the `odgi sort` pipeline codes b/z/w/c/d.

Host-side graph traversals (reference: src/algorithms/topological_sort.hpp
breadth_first/depth_first/two_way variants, cycle_breaking_sort.cpp,
dagify_sort.cpp).  No golden outputs exist for these in the reference test
suite; orders are validated by the same invariants the reference asserts
(a permutation of all nodes) plus sorting-goodness metrics, not byte
equality — tie-breaking inside the traversals may differ.
"""

from __future__ import annotations

from collections import deque
from typing import List

import numpy as np

from ..core.graph import GraphTensors
from .topological import head_nodes, topological_order


def _seeds(g: GraphTensors) -> List[int]:
    heads = list(head_nodes(g))
    if heads:
        return [int(h) for h in heads]
    return list(range(g.num_nodes))


def breadth_first_topological_order(g: GraphTensors, chunk: int = 0) -> np.ndarray:
    """BFS order from head nodes (reference:
    topological_sort.hpp breadth_first_topological_order; 'b' code).
    `chunk` bounds the frontier the reference processes per round — the
    visit order here is plain FIFO, which is the chunk=inf behavior."""
    adj = g.adjacency
    n = g.num_nodes
    seen = np.zeros(n, dtype=bool)
    out: List[int] = []
    q = deque()
    for r in _seeds(g):
        if not seen[r]:
            seen[r] = True
            q.append(r)
        while q:
            cur = q.popleft()
            out.append(cur)
            for side in (cur << 1, (cur << 1) | 1):
                for nb in adj.neighbors(side):
                    nr = int(nb) >> 1
                    if not seen[nr]:
                        seen[nr] = True
                        q.append(nr)
    for r in range(n):
        if not seen[r]:
            out.append(r)
    return np.asarray(out, dtype=np.int64)


def depth_first_topological_order(g: GraphTensors, chunk: int = 0) -> np.ndarray:
    """DFS order from head nodes (reference: 'z' code)."""
    adj = g.adjacency
    n = g.num_nodes
    seen = np.zeros(n, dtype=bool)
    out: List[int] = []
    for r in _seeds(g):
        if seen[r]:
            continue
        stack = [r]
        while stack:
            cur = stack.pop()
            if seen[cur]:
                continue
            seen[cur] = True
            out.append(cur)
            nbs = []
            for side in (cur << 1, (cur << 1) | 1):
                for nb in adj.neighbors(side):
                    nr = int(nb) >> 1
                    if not seen[nr]:
                        nbs.append(nr)
            stack.extend(reversed(nbs))
    for r in range(n):
        if not seen[r]:
            out.append(r)
    return np.asarray(out, dtype=np.int64)


def two_way_topological_order(g: GraphTensors) -> np.ndarray:
    """Two-way topological order (reference: 'w' code /
    two_way_topological_order): average of the head-seeded order and the
    reversed tail-seeded order of the flipped graph — approximated by
    ranking nodes by the mean of forward and reverse topological ranks."""
    fwd = topological_order(g, use_heads=True)
    rev = topological_order(g, use_heads=False)[::-1]
    rank = np.empty(g.num_nodes, dtype=np.float64)
    rank[fwd] = np.arange(g.num_nodes)
    rank2 = np.empty(g.num_nodes, dtype=np.float64)
    rank2[rev] = np.arange(g.num_nodes)
    return np.argsort((rank + rank2) / 2.0, kind="stable").astype(np.int64)


def cycle_breaking_order(g: GraphTensors) -> np.ndarray:
    """DFS-based cycle-breaking sort (reference: cycle_breaking_sort.cpp
    :9-32): run the reference's handle-DFS (dfs.cpp:10-175) from every
    forward handle in rank order; at each handle EXIT record
    (tree_edge_count, postorder_index, node); ascending sort of those
    triples is the order.  Back edges never advance the tree-edge counter,
    which is what breaks cycles."""
    adj = g.adjacency
    N = g.num_nodes
    PRE, CURR, POST = 0, 1, 2
    state = {}
    rank = [None] * N
    i = 0
    j = 0
    for root_rank in range(N):
        root = root_rank << 1
        if state.get(root, PRE) != PRE:
            continue
        state[root] = CURR
        stack = [(root, [int(t) for t in adj.neighbors(root)], 0)]
        while stack:
            h, targets, idx = stack.pop()
            advanced = False
            while idx < len(targets):
                t = targets[idx]
                idx += 1
                if state.get(t, PRE) == PRE:
                    j += 1  # tree edge (tree_fn: ++j)
                    stack.append((h, targets, idx))
                    state[t] = CURR
                    stack.append((t, [int(x) for x in adj.neighbors(t)], 0))
                    advanced = True
                    break
            if not advanced:
                state[h] = POST
                rank[h >> 1] = (j, i, h >> 1)
                i += 1
    order = np.array([r[2] for r in sorted(rank)], dtype=np.int64)
    return order


def dagify_sort_order(g: GraphTensors) -> np.ndarray:
    """Dagify-based sort (reference: dagify.cpp + dagify_sort.cpp, 'd'
    code): the reference unrolls cycles into a DAG, sorts it, and projects
    back.  Equivalent order: condense strongly-connected components, sort
    the condensation topologically (Kahn), and order nodes by (component
    topo rank, in-component BFS rank)."""
    n = g.num_nodes
    if n == 0:
        return np.empty(0, dtype=np.int64)
    # Tarjan SCC over the node digraph (right-side edges only, both
    # orientations collapse onto nodes — matches dagify's cycle notion
    # on the bidirected graph closely enough for ordering purposes).
    adj = g.adjacency
    succ = [[] for _ in range(n)]
    for r in range(n):
        for side in (r << 1, (r << 1) | 1):
            for nb in adj.neighbors(side):
                succ[r].append(int(nb) >> 1)
    index = np.full(n, -1, dtype=np.int64)
    low = np.zeros(n, dtype=np.int64)
    comp = np.full(n, -1, dtype=np.int64)
    on_stack = np.zeros(n, dtype=bool)
    stack: List[int] = []
    counter = 0
    ncomp = 0
    for root in range(n):
        if index[root] != -1:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter
                counter += 1
                stack.append(v)
                on_stack[v] = True
            advanced = False
            while pi < len(succ[v]):
                w = succ[v][pi]
                pi += 1
                if index[w] == -1:
                    work[-1] = (v, pi)
                    work.append((w, 0))
                    advanced = True
                    break
                elif on_stack[w]:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work[-1] = (v, pi)
            if pi >= len(succ[v]):
                if low[v] == index[v]:
                    while True:
                        w = stack.pop()
                        on_stack[w] = False
                        comp[w] = ncomp
                        if w == v:
                            break
                    ncomp += 1
                work.pop()
                if work:
                    u = work[-1][0]
                    low[u] = min(low[u], low[v])
    # Kahn over the condensation
    indeg = np.zeros(ncomp, dtype=np.int64)
    cadj = [set() for _ in range(ncomp)]
    for v in range(n):
        for w in succ[v]:
            a, b = comp[v], comp[w]
            if a != b and b not in cadj[a]:
                cadj[a].add(b)
                indeg[b] += 1
    from heapq import heapify, heappop, heappush

    ready = [c for c in range(ncomp) if indeg[c] == 0]
    heapify(ready)
    crank = np.zeros(ncomp, dtype=np.int64)
    k = 0
    while ready:
        c = heappop(ready)
        crank[c] = k
        k += 1
        for d in sorted(cadj[c]):
            indeg[d] -= 1
            if indeg[d] == 0:
                heappush(ready, d)
    order = np.lexsort((np.arange(n), crank[comp]))
    return order.astype(np.int64)
