"""Reference .og container compatibility (io/og_compat.py)."""

import io

import numpy as np
import pytest

from odgi_tpu.io.og_compat import load_og, save_og

OG_FIXTURE = "/root/reference/test/DRB1-3123_sorted.og"


@pytest.fixture(scope="module")
def og_graph():
    return load_og(OG_FIXTURE)


def test_load_reference_fixture(og_graph):
    g = og_graph
    # counts straight from the fixture header (reverse-engineered layout;
    # 3214 nodes / 12 paths also stated in test/python/odgi_ffi.md:27-33)
    assert g.num_nodes == 3214
    assert g.num_edges == 4380
    assert g.num_paths == 12
    assert g.num_steps == int(g.path_step_count.sum())
    assert g.validate() == []
    assert g.path_names[0] == "gi|568815592:32578768-32589835"
    # the fixture is the Ygs-sorted graph: ids are compacted 1..N
    assert g.is_optimized()


def test_sorted_fixture_is_well_sorted(og_graph):
    from odgi_tpu.algorithms import stats

    d = stats.sum_of_path_node_distances(og_graph)
    # a well-sorted graph has small normalized path-node distance
    assert d.all_nt_space < 10.0


def test_roundtrip(og_graph):
    g = og_graph
    buf = io.BytesIO()
    save_og(g, buf)
    g2 = load_og(buf.getvalue())
    for attr in [
        "node_len",
        "seq",
        "seq_offset",
        "node_id",
        "path_offset",
        "step_handle",
        "step_pos",
    ]:
        assert np.array_equal(getattr(g, attr), getattr(g2, attr)), attr
    assert g.path_names == g2.path_names
    edges = set(zip(g.edge_from.tolist(), g.edge_to.tolist()))
    edges2 = set(zip(g2.edge_from.tolist(), g2.edge_to.tolist()))
    assert edges == edges2


def test_gfa_to_og_roundtrip(t_gfa):
    buf = io.BytesIO()
    save_og(t_gfa, buf)
    g2 = load_og(buf.getvalue())
    assert g2.num_nodes == t_gfa.num_nodes
    assert g2.num_edges == t_gfa.num_edges
    assert np.array_equal(g2.step_handle, t_gfa.step_handle)
    assert g2.validate() == []


def test_cli_sniffs_og(tmp_path):
    from odgi_tpu.cli.main import load_any

    g = load_any(OG_FIXTURE)
    assert g.num_nodes == 3214


def test_reencode_byte_identical(og_graph):
    """save_og(load_og(fixture)) must be BYTE-IDENTICAL to the fixture --
    the writer replays the reference's construction history, including the
    reverse-engineered dyn::hacked_vector capacity growth (see
    io/og_compat._HackedVector; reference: src/odgi.cpp:1636-1686,
    src/node.cpp:422-436)."""
    buf = io.BytesIO()
    save_og(og_graph, buf)
    with open(OG_FIXTURE, "rb") as f:
        assert buf.getvalue() == f.read()
