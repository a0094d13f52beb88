"""Tests for stats, components, topological sort, and groom."""

import numpy as np
import pytest

from odgi_tpu.algorithms import stats
from odgi_tpu.algorithms.components import (
    num_self_loops,
    weak_component_ids,
    weak_components,
)
from odgi_tpu.algorithms.groom import apply_groom, groom
from odgi_tpu.algorithms.topological import (
    head_nodes,
    tail_nodes,
    topological_order,
)
from odgi_tpu.core.graph import handle_is_reverse, handle_rank
from odgi_tpu import parse_gfa


def test_summary_t(t_gfa):
    s = stats.summary(t_gfa)
    assert s == {
        "length": int(t_gfa.node_len.sum()),
        "nodes": 15,
        "edges": 20,
        "paths": 1,
        "steps": 10,
    }


def test_base_content(t_gfa):
    bc = stats.base_content(t_gfa)
    assert sum(bc.values()) == t_gfa.total_length


def test_components_t(t_gfa):
    labels = weak_component_ids(t_gfa)
    assert (labels == 0).all()  # t.gfa is connected
    assert len(weak_components(t_gfa)) == 1
    assert num_self_loops(t_gfa) == 0


def test_components_two():
    g = parse_gfa(
        b"S\t1\tAA\nS\t2\tCC\nS\t3\tGG\nS\t4\tTT\n"
        b"L\t1\t+\t2\t+\t0M\nL\t3\t+\t4\t+\t0M\n"
    )
    labels = weak_component_ids(g)
    assert labels[0] == labels[1]
    assert labels[2] == labels[3]
    assert labels[0] != labels[2]


def test_heads_tails(t_gfa):
    assert list(head_nodes(t_gfa)) == [0]  # node 1 is the only head
    assert list(tail_nodes(t_gfa)) == [14]  # node 15 the only tail


def test_topological_t(t_gfa):
    order = topological_order(t_gfa)
    assert sorted(order) == list(range(15))
    # t.gfa is a DAG in id order; a valid topo order puts every edge forward
    pos = np.empty(15, dtype=int)
    pos[order] = np.arange(15)
    for a, b in zip(t_gfa.edge_from, t_gfa.edge_to):
        if not (a & 1) and not (b & 1):
            assert pos[a >> 1] < pos[b >> 1]


def test_topological_cycle():
    # 1->2->3->1 cycle; sort must still emit all nodes exactly once
    g = parse_gfa(
        b"S\t1\tA\nS\t2\tC\nS\t3\tG\n"
        b"L\t1\t+\t2\t+\t0M\nL\t2\t+\t3\t+\t0M\nL\t3\t+\t1\t+\t0M\n"
    )
    order = topological_order(g)
    assert sorted(order) == [0, 1, 2]


def test_groom_fixes_inversion():
    # node 2 stored reverse-complemented: 1+ -> 2- -> 3+ chain
    g = parse_gfa(
        b"S\t1\tAA\nS\t2\tCC\nS\t3\tGG\n"
        b"L\t1\t+\t2\t-\t0M\nL\t2\t-\t3\t+\t0M\n"
        b"P\tx\t1+,2-,3+\t*\n"
    )
    flip = groom(g)
    assert flip.tolist() == [False, True, False]
    g2 = apply_groom(g)
    assert not handle_is_reverse(g2.step_handle).any()
    assert g2.validate() == []
    # underlying path sequence unchanged
    assert g2.node_seq_str(1) == "GG"  # revcomp of CC


def test_mean_links_length_perfect_chain():
    # perfectly sorted chain: every link length is 0 in nt space
    g = parse_gfa(
        b"S\t1\tAA\nS\t2\tCC\nS\t3\tGG\n"
        b"L\t1\t+\t2\t+\t0M\nL\t2\t+\t3\t+\t0M\n"
        b"P\tx\t1+,2+,3+\t*\n"
    )
    m = stats.mean_links_length(g)
    assert m.all_num_links == 2
    assert m.all_nt_space == 0.0
    assert m.all_node_space == 0.0


def test_mean_links_length_with_skip():
    # path skips node 2: link from end(1) to start(3) spans node 2
    g = parse_gfa(
        b"S\t1\tAA\nS\t2\tCCCC\nS\t3\tGG\n"
        b"L\t1\t+\t2\t+\t0M\nL\t2\t+\t3\t+\t0M\nL\t1\t+\t3\t+\t0M\n"
        b"P\tx\t1+,3+\t*\n"
    )
    m = stats.mean_links_length(g)
    assert m.all_num_links == 1
    assert m.all_nt_space == 4.0  # spans the 4bp of node 2
    assert m.all_node_space == 1.0


def test_sum_path_node_distances_chain():
    g = parse_gfa(
        b"S\t1\tAA\nS\t2\tCC\nS\t3\tGG\n"
        b"L\t1\t+\t2\t+\t0M\nL\t2\t+\t3\t+\t0M\n"
        b"P\tx\t1+,2+,3+\t*\n"
    )
    d = stats.sum_of_path_node_distances(g)
    # distances: (0->2)=2nt,1node + (2->4)=2nt,1node + sentinel (+2nt,+1node)
    assert d.all_num_penalties == 0
    assert d.all_node_space == 3 / 3
    assert d.all_nt_space == 6 / 6


def test_sum_path_node_distances_backward_penalty():
    g = parse_gfa(
        b"S\t1\tAA\nS\t2\tCC\n"
        b"L\t1\t+\t2\t+\t0M\nL\t2\t+\t1\t+\t0M\n"
        b"P\tx\t2+,1+\t*\n"
    )
    d = stats.sum_of_path_node_distances(g)
    assert d.all_num_penalties == 1
    # backward pair weighted 3x: 3*(2-0)=6nt + sentinel len(1)=2 -> 8/4
    assert d.all_nt_space == 8 / 4
    assert d.all_node_space == (3 * 1 + 1) / 2


def test_feedback_arcs_and_reversing_joins():
    g = parse_gfa(
        b"S\t1\tAA\nS\t2\tCC\n"
        b"L\t1\t+\t2\t+\t0M\nL\t2\t+\t1\t+\t0M\nL\t2\t+\t1\t-\t0M\n"
        b"P\tx\t1+,2+\t*\nP\ty\t2+,1+\t*\nP\tz\t2+,1-\t*\n"
    )
    per_fa, total_fa = stats.weighted_feedback_arcs(g)
    assert per_fa.tolist() == [0, 1, 0]
    assert total_fa == 1
    per_rj, total_rj = stats.weighted_reversing_joins(g)
    assert per_rj.tolist() == [0, 0, 1]
    assert total_rj == 1


def test_stats_2d():
    g = parse_gfa(
        b"S\t1\tAA\nS\t2\tCC\n"
        b"L\t1\t+\t2\t+\t0M\n"
        b"P\tx\t1+,2+\t*\n"
    )
    # endpoints: node0 start (0,0) end (1,0); node1 start (4,0) end (5,0)
    X = np.array([0.0, 1.0, 4.0, 5.0])
    Y = np.zeros(4)
    m = stats.mean_links_length(g, xy=(X, Y))
    # link measured between the two step *start* endpoints (fwd: idx 2r+0)
    assert m.all_2d == 4.0
    d = stats.sum_of_path_node_distances(g, xy=(X, Y))
    assert d.all_2d_by_nodes == 4.0 / 2


# ---------------------------------------------------------------------------
# Round-5: vg helper algorithms, mondriaan sort, linear index
# (reference: src/algorithms/{distance_to_head,distance_to_tail,
# find_shortest_paths,sorted_id_ranges,extend,a_star,mondriaan_sort,
# linear_index})
# ---------------------------------------------------------------------------


def _chain_graph(n=6, seqlen=3):
    from odgi_tpu.core.graph import GraphBuilder

    b = GraphBuilder()
    for i in range(1, n + 1):
        b.add_node(i, b"A" * seqlen)
    for i in range(1, n):
        b.add_edge(i, False, i + 1, False)
    p = b.add_path("p")
    for i in range(1, n + 1):
        b.append_step(p, i, False)
    return b.build()


def test_distance_to_head_and_tail():
    from odgi_tpu.algorithms import vg_algos as va

    g = _chain_graph(n=5, seqlen=4)
    h3 = 2 << 1  # rank 2 = node 3
    # two nodes of 4nt between node 3 and the head
    assert va.distance_to_head(g, h3, 1000) == 8
    assert va.distance_to_tail(g, h3, 1000) == 8
    assert va.distance_to_head(g, h3, 5) == -1  # limit too small
    assert va.distance_to_head(g, 0, 1000) == 0  # node 1 IS the head
    assert va.is_head_node(g, 0) and not va.is_tail_node(g, 0)


def test_find_shortest_paths():
    from odgi_tpu.algorithms import vg_algos as va

    g = _chain_graph(n=4, seqlen=5)
    d = va.find_shortest_paths(g, 0)
    # distance from END of node 1: node2 at 0, node3 at 5, node4 at 10
    assert d[0] == 0 and d[1 << 1] == 0
    assert d[2 << 1] == 5 and d[3 << 1] == 10
    dl = va.find_shortest_paths(g, 3 << 1, traverse_leftward=True)
    assert dl[2 << 1] == 0 and dl[0] == 10


def test_sorted_id_ranges():
    from odgi_tpu.algorithms import vg_algos as va
    from odgi_tpu.core.graph import GraphBuilder

    b = GraphBuilder()
    for i in (1, 2, 3, 7, 8, 11):
        b.add_node(i, b"A")
    g = b.build()
    assert va.sorted_id_ranges(g) == [(1, 3), (7, 8), (11, 11)]


def test_extend_copies_missing():
    from odgi_tpu.algorithms import vg_algos as va
    from odgi_tpu.compat import odgi as codgi

    src = _chain_graph(n=4)
    into = codgi.graph()
    into.create_handle("AAA", 1)  # node 1 already present
    va.extend(src, into)
    assert into.get_node_count() == 4
    assert into.has_edge(into.get_handle(2), into.get_handle(3))


def test_a_star_min_path():
    from odgi_tpu.algorithms import vg_algos as va
    from odgi_tpu.core.graph import GraphBuilder

    # diamond: 1 -> {2 (10nt), 3 (2nt)} -> 4
    b = GraphBuilder()
    b.add_node(1, b"AAAA")
    b.add_node(2, b"A" * 10)
    b.add_node(3, b"AA")
    b.add_node(4, b"AAAA")
    b.add_edge(1, False, 2, False)
    b.add_edge(1, False, 3, False)
    b.add_edge(2, False, 4, False)
    b.add_edge(3, False, 4, False)
    g = b.build()
    path = va.a_star(g, (0, 1), (3 << 1, 2))
    assert [h >> 1 for h in path] == [0, 2, 3]  # via the short branch
    # unreachable: leftward positions never connect
    assert va.a_star(g, (3 << 1, 0), (0, 0)) == []


def test_mondriaan_sort_partitions():
    from odgi_tpu.algorithms.mondriaan import mondriaan_sort

    # two 10-node cliques joined by one edge: the bisection must not
    # split a clique
    from odgi_tpu.core.graph import GraphBuilder

    b = GraphBuilder()
    for i in range(1, 21):
        b.add_node(i, b"A")
    for base in (1, 11):
        for i in range(base, base + 9):
            for j in range(i + 1, base + 10):
                b.add_edge(i, False, j, False)
    b.add_edge(10, False, 11, False)
    g = b.build()
    order = mondriaan_sort(g, n_parts=2, weight_by_edge_depth=False)
    assert sorted(order.tolist()) == list(range(20))
    first_half = set(order[:10].tolist())
    assert first_half in ({*range(10)}, {*range(10, 20)})


def test_linear_index():
    from odgi_tpu.core.index import LinearIndex

    g = _chain_graph(n=4, seqlen=3)
    li = LinearIndex.build(g)
    assert li.graph_seq == b"AAA" * 4
    assert li.position_of_handle(2 << 1) == 6
    assert li.position_of_handle((2 << 1) | 1) == 6
