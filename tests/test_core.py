"""Core GraphTensors + GFA IO tests.

Expected values for t.gfa cross-checked against the reference's own fixture
(15 nodes / 18 edges / 1 path of 10 steps; see /root/reference/test/t.gfa).
"""

import io

import numpy as np
import pytest

from odgi_tpu import GraphBuilder, parse_gfa, write_gfa, save_graph, load_graph
from odgi_tpu.core.graph import (
    handle_flip,
    handle_is_reverse,
    handle_rank,
    pack_handle,
    revcomp_bytes,
)


def test_handle_packing():
    h = pack_handle(5, True)
    assert handle_rank(h) == 5
    assert handle_is_reverse(h)
    assert handle_flip(h) == pack_handle(5, False)


def test_revcomp():
    seq = np.frombuffer(b"ACGTN", dtype=np.uint8)
    assert revcomp_bytes(seq).tobytes() == b"NACGT"


def test_parse_t_gfa(t_gfa):
    g = t_gfa
    assert g.num_nodes == 15
    assert g.num_edges == 20
    assert g.num_paths == 1
    assert g.num_steps == 10
    assert g.node_seq_str(0) == "CAAATAAG"
    assert g.path_names == ("x",)
    # path x visits nodes 1,3,5,6,8,9,11,12,14,15 all forward
    expect = np.array([1, 3, 5, 6, 8, 9, 11, 12, 14, 15]) - 1
    assert np.array_equal(handle_rank(g.step_handle), expect)
    assert not handle_is_reverse(g.step_handle).any()
    # step positions are cumulative node lengths along the path
    lens = g.node_len[expect]
    assert np.array_equal(g.step_pos, np.cumsum(lens) - lens)
    assert g.validate() == []


def test_gfa_roundtrip(t_gfa):
    buf = io.StringIO()
    write_gfa(t_gfa, buf)
    g2 = parse_gfa(buf.getvalue().encode())
    assert g2.num_nodes == t_gfa.num_nodes
    assert np.array_equal(g2.step_handle, t_gfa.step_handle)
    assert np.array_equal(g2.node_len, t_gfa.node_len)
    assert g2.seq.tobytes() == t_gfa.seq.tobytes()
    # edges as canonical sets
    e1 = set(zip(t_gfa.edge_from.tolist(), t_gfa.edge_to.tolist()))
    e2 = set(zip(g2.edge_from.tolist(), g2.edge_to.tolist()))
    assert e1 == e2


def test_og_roundtrip(tmp_path, t_gfa):
    p = str(tmp_path / "t.otg")
    save_graph(t_gfa, p)
    g2 = load_graph(p)
    assert g2.num_nodes == t_gfa.num_nodes
    assert np.array_equal(g2.step_handle, t_gfa.step_handle)
    assert g2.path_names == t_gfa.path_names
    assert g2.seq.tobytes() == t_gfa.seq.tobytes()


def test_apply_ordering_identity(t_gfa):
    g2 = t_gfa.apply_ordering(np.arange(t_gfa.num_nodes))
    assert np.array_equal(g2.step_handle, t_gfa.step_handle)
    assert g2.is_optimized()


def test_apply_ordering_reverse(t_gfa):
    g = t_gfa
    order = np.arange(g.num_nodes)[::-1]
    g2 = g.apply_ordering(order)
    # node content preserved under permutation
    assert g2.node_seq_str(g.num_nodes - 1) == g.node_seq_str(0)
    assert g2.validate() == []
    # path sequence identical
    def path_seq(gr):
        out = []
        for h in gr.step_handle:
            out.append(gr.node_seq(int(h) >> 1, bool(h & 1)))
        return b"".join(out)

    assert path_seq(g2) == path_seq(g)


def test_apply_orientations(t_gfa):
    g = t_gfa
    mask = np.zeros(g.num_nodes, dtype=bool)
    mask[0] = True
    g2 = g.apply_orientations(mask)
    assert g2.node_seq_str(0) == "CTTATTTG"  # revcomp of CAAATAAG
    # step through node 0 is now reverse
    assert bool(g2.step_handle[0] & 1)
    assert g2.validate() == []


def test_builder_duplicate_node():
    b = GraphBuilder()
    b.add_node(1, b"A")
    with pytest.raises(ValueError):
        b.add_node(1, b"C")


def test_drb_parse(drb_graph):
    # DRB1-3123.gfa has 4955 segments and 12 paths; the 3214-node figure in
    # the reference docs refers to DRB1-3123_unsorted.gfa / the sorted .og.
    g = drb_graph
    assert g.num_nodes == 4955
    assert g.num_paths == 12
    assert g.validate() == []
