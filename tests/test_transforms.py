"""Tests for flip, prune family, explode, squeeze."""

import numpy as np

from odgi_tpu import parse_gfa
from odgi_tpu.algorithms.transforms import (
    cut_tips,
    drop_nodes,
    explode,
    flip_paths,
    prune_high_degree,
    prune_low_depth,
    squeeze,
)


def test_flip_paths():
    g = parse_gfa(
        b"S\t1\tAA\nS\t2\tCCCC\n"
        b"L\t1\t+\t2\t+\t0M\n"
        b"P\tfwd\t1+,2+\t*\nP\trev\t2-,1-\t*\n"
    )
    g2 = flip_paths(g)
    # 'rev' travels entirely reverse -> flipped to forward
    lo, hi = int(g2.path_offset[1]), int(g2.path_offset[2])
    hs = g2.step_handle[lo:hi]
    assert not (hs & 1).any()
    assert [int(h) >> 1 for h in hs] == [0, 1]
    # 'fwd' untouched
    lo, hi = int(g2.path_offset[0]), int(g2.path_offset[1])
    assert np.array_equal(g2.step_handle[lo:hi], g.step_handle[lo:hi])


def test_drop_nodes_splits_paths():
    g = parse_gfa(
        b"S\t1\tAA\nS\t2\tCC\nS\t3\tGG\n"
        b"L\t1\t+\t2\t+\t0M\nL\t2\t+\t3\t+\t0M\n"
        b"P\tx\t1+,2+,3+\t*\n"
    )
    mask = np.array([False, True, False])
    g2 = drop_nodes(g, mask)
    assert g2.num_nodes == 2
    assert g2.num_paths == 2  # split into two fragments
    assert any(":" in n for n in g2.path_names)
    assert g2.validate() == []


def test_prune_high_degree(t_gfa):
    g2 = prune_high_degree(t_gfa, 100)
    assert g2.num_nodes == t_gfa.num_nodes  # nothing that high
    g3 = prune_high_degree(t_gfa, 1)
    assert g3.num_nodes < t_gfa.num_nodes


def test_prune_low_depth(t_gfa):
    g2 = prune_low_depth(t_gfa, 1)
    # only nodes on the single path survive
    assert g2.num_nodes == 10
    assert g2.validate() == []


def test_cut_tips():
    g = parse_gfa(
        b"S\t1\tAA\nS\t2\tCC\nS\t3\tGG\n"
        b"L\t1\t+\t2\t+\t0M\nL\t2\t+\t3\t+\t0M\n"
    )
    g2 = cut_tips(g)
    # 1 and 3 are tips
    assert g2.num_nodes == 1


def test_explode_and_squeeze():
    g = parse_gfa(
        b"S\t1\tAA\nS\t2\tCC\nS\t3\tGG\nS\t4\tTT\n"
        b"L\t1\t+\t2\t+\t0M\nL\t3\t+\t4\t+\t0M\n"
        b"P\tx\t1+,2+\t*\nP\ty\t3+,4+\t*\n"
    )
    parts = explode(g)
    assert len(parts) == 2
    assert all(p.num_nodes == 2 for p in parts)
    back = squeeze(parts)
    assert back.num_nodes == 4
    assert back.num_edges == 2
    assert back.num_paths == 2
    assert back.validate() == []
