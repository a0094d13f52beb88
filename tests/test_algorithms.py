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
