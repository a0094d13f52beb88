"""Tests for graph-edit operations: chop, unchop, and analytics."""

import numpy as np
import pytest

from odgi_tpu import parse_gfa
from odgi_tpu.algorithms.chop import chop
from odgi_tpu.algorithms.coverage import (
    node_degree,
    node_depth,
    node_depth_unique,
    path_windows_bed,
)
from odgi_tpu.algorithms.unchop import unchop
from odgi_tpu.algorithms import stats


def path_seqs(g):
    out = []
    for p in range(g.num_paths):
        lo, hi = int(g.path_offset[p]), int(g.path_offset[p + 1])
        out.append(
            b"".join(
                g.node_seq(int(h) >> 1, bool(h & 1))
                for h in g.step_handle[lo:hi]
            )
        )
    return out


def test_chop_t(t_gfa):
    g2 = chop(t_gfa, 3)
    assert g2.node_len.max() <= 3
    assert g2.validate() == []
    assert path_seqs(g2) == path_seqs(t_gfa)
    assert g2.total_length == t_gfa.total_length


def test_chop_identity_when_short(t_gfa):
    g2 = chop(t_gfa, 100)
    assert g2.num_nodes == t_gfa.num_nodes
    assert path_seqs(g2) == path_seqs(t_gfa)


def test_unchop_merges_simple_chain():
    g = parse_gfa(
        b"S\t1\tAA\nS\t2\tCC\nS\t3\tGG\n"
        b"L\t1\t+\t2\t+\t0M\nL\t2\t+\t3\t+\t0M\n"
        b"P\tx\t1+,2+,3+\t*\n"
    )
    g2 = unchop(g)
    assert g2.num_nodes == 1
    assert g2.node_seq_str(0) == "AACCGG"
    assert g2.validate() == []
    assert path_seqs(g2) == path_seqs(g)


def test_unchop_respects_branch():
    # 1 -> 2 -> 3 and 1 -> 3: node 2 not mergeable with 1 or 3
    g = parse_gfa(
        b"S\t1\tAA\nS\t2\tCC\nS\t3\tGG\n"
        b"L\t1\t+\t2\t+\t0M\nL\t2\t+\t3\t+\t0M\nL\t1\t+\t3\t+\t0M\n"
        b"P\tx\t1+,2+,3+\t*\nP\ty\t1+,3+\t*\n"
    )
    g2 = unchop(g)
    assert g2.num_nodes == 3
    assert path_seqs(g2) == path_seqs(g)


def test_unchop_with_inversion():
    # chain traversed 1+,2- : node 2 stored flipped relative to the chain
    g = parse_gfa(
        b"S\t1\tAA\nS\t2\tCC\n"
        b"L\t1\t+\t2\t-\t0M\n"
        b"P\tx\t1+,2-\t*\n"
    )
    g2 = unchop(g)
    assert g2.num_nodes == 1
    assert path_seqs(g2) == path_seqs(g)


def test_chop_unchop_roundtrip(t_gfa):
    g2 = unchop(chop(t_gfa, 2))
    assert path_seqs(g2) == path_seqs(t_gfa)
    assert g2.validate() == []
    # unchop must recover at most the original node count
    assert g2.num_nodes <= t_gfa.num_nodes


def test_unchop_drb(drb_graph):
    g2 = unchop(drb_graph)
    assert g2.validate() == []
    assert path_seqs(g2) == path_seqs(drb_graph)
    assert g2.num_nodes <= drb_graph.num_nodes


def test_depth_degree_t(t_gfa):
    d = node_depth(t_gfa)
    assert d.sum() == t_gfa.num_steps
    du = node_depth_unique(t_gfa)
    assert (du <= d).all()
    ind, outd = node_degree(t_gfa)
    assert ind.sum() + outd.sum() == 2 * t_gfa.num_edges


def test_windows_bed(t_gfa):
    d = node_depth(t_gfa)
    rows = list(path_windows_bed(t_gfa, d, 10))
    assert rows
    assert rows[0][0] == "x"
    # windows tile the path
    assert rows[0][1] == 0


def test_viz_renders(t_gfa, tmp_path):
    from odgi_tpu.algorithms.viz import bin_paths, render_viz, save_viz_png

    b = bin_paths(t_gfa, 100)
    # covered bp equals path length
    assert b.mean_depth.sum() * (t_gfa.total_length / 100) == pytest.approx(
        int(t_gfa.path_length[0]), rel=1e-6
    )
    img = render_viz(t_gfa, width=200, show_path_names=False)
    assert img.shape[1] == 200
    p = str(tmp_path / "t.png")
    save_viz_png(t_gfa, p, width=200)
    import os

    assert os.path.getsize(p) > 0


def test_draw_renders(t_gfa, tmp_path):
    from odgi_tpu.algorithms.draw import draw_png
    from odgi_tpu.algorithms.layout import init_layout

    coords = init_layout(t_gfa, "d")
    p = str(tmp_path / "t2d.png")
    draw_png(t_gfa, coords, p, width=300)
    import os

    assert os.path.getsize(p) > 0
