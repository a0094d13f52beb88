"""simplify_siblings / normalize / cycle-breaking sort
(reference: src/algorithms/simplify_siblings.cpp, merge.cpp,
normalize.cpp, cycle_breaking_sort.cpp)."""

import numpy as np
import pytest

import odgi_tpu
from odgi_tpu.core.graph import GraphBuilder
from odgi_tpu.algorithms.simplify import normalize, simplify_siblings


def path_seq(g, p):
    lo, hi = int(g.path_offset[p]), int(g.path_offset[p + 1])
    return b"".join(
        g.node_seq(int(h) >> 1, bool(int(h) & 1)) for h in g.step_handle[lo:hi]
    )


def sibling_fork():
    b = GraphBuilder()
    b.add_node(1, b"AC")
    b.add_node(2, b"GGT")
    b.add_node(3, b"GGA")
    b.add_node(4, b"TT")
    b.add_edge(1, False, 2, False)
    b.add_edge(1, False, 3, False)
    b.add_edge(2, False, 4, False)
    b.add_edge(3, False, 4, False)
    p0 = b.add_path("a")
    for n in (1, 2, 4):
        b.append_step(p0, n, False)
    p1 = b.add_path("b")
    for n in (1, 3, 4):
        b.append_step(p1, n, False)
    return b.build()


def test_simplify_siblings_merges_common_prefix():
    g = sibling_fork()
    seqs = [path_seq(g, p) for p in range(g.num_paths)]
    g2, progress = simplify_siblings(g)
    assert progress
    assert g2.total_length < g.total_length  # the GG prefix merged
    assert g2.validate() == []
    assert [path_seq(g2, p) for p in range(g2.num_paths)] == seqs


def test_normalize_qchop_compacts():
    """normalize must change node count on chopped inputs the way the
    reference does (VERDICT r2 task 9; reference: normalize_main.cpp)."""
    g = odgi_tpu.parse_gfa("/root/reference/test/q.chop.gfa")
    seqs = {g.path_names[p]: path_seq(g, p) for p in range(g.num_paths)}
    gn = normalize(g)
    assert gn.num_nodes < g.num_nodes
    assert gn.total_length == g.total_length
    assert gn.validate() == []
    for p in range(gn.num_paths):
        assert path_seq(gn, p) == seqs[gn.path_names[p]]


def test_normalize_idempotent():
    g = odgi_tpu.parse_gfa("/root/reference/test/q.chop.gfa")
    g1 = normalize(g)
    g2 = normalize(g1)
    assert g2.num_nodes == g1.num_nodes
    assert g2.total_length == g1.total_length


def test_cycle_breaking_order_valid_permutation():
    from odgi_tpu.algorithms.sorts_extra import (
        cycle_breaking_order,
        depth_first_topological_order,
    )

    g = odgi_tpu.parse_gfa("/root/reference/test/DRB1-3123.gfa")
    o = cycle_breaking_order(g)
    assert sorted(o.tolist()) == list(range(g.num_nodes))
    # a real back-edge-aware postorder sort, not a DFS-order alias
    assert not np.array_equal(o, depth_first_topological_order(g))
    assert g.apply_ordering(o, compact_ids=True).validate() == []
