"""Tests for paths exports, kmers, tension, matrix, heaps, pav."""

import io

import numpy as np
import pytest

from odgi_tpu import parse_gfa
from odgi_tpu.algorithms.analytics import (
    heaps_permutations,
    node_tension,
    path_kmers,
    pav_table,
    write_matrix,
)
from odgi_tpu.algorithms.paths_cmd import (
    flatten,
    haplotype_matrix,
    path_jaccard_matrix,
    path_sequence,
    write_fasta,
    write_haplotype_matrix,
)


@pytest.fixture
def two_path_graph():
    return parse_gfa(
        b"S\t1\tAA\nS\t2\tCC\nS\t3\tGG\n"
        b"L\t1\t+\t2\t+\t0M\nL\t2\t+\t3\t+\t0M\nL\t1\t+\t3\t+\t0M\n"
        b"P\tx\t1+,2+,3+\t*\nP\ty\t1+,3+\t*\n"
    )


def test_path_sequence(t_gfa):
    seq = path_sequence(t_gfa, 0)
    assert seq == b"CAAATAAGGCTTGGAAATTTTCTGGAGTTCTATTATATTCCAACTCTCTG"


def test_write_fasta(t_gfa):
    buf = io.StringIO()
    write_fasta(t_gfa, buf)
    lines = buf.getvalue().splitlines()
    assert lines[0] == ">x"
    assert "".join(lines[1:]) == path_sequence(t_gfa, 0).decode()


def test_haplotype_matrix(two_path_graph):
    names, lengths, steps, cov = haplotype_matrix(two_path_graph)
    assert names == ["x", "y"]
    assert lengths.tolist() == [6, 4]
    assert steps.tolist() == [3, 2]
    assert cov.tolist() == [[1, 1, 1], [1, 0, 1]]
    # length-scaled
    _, _, _, covs = haplotype_matrix(two_path_graph, scale_by_length=True)
    assert covs.tolist() == [[2, 2, 2], [2, 0, 2]]


def test_haplotype_matrix_grouped():
    g = parse_gfa(
        b"S\t1\tAA\n"
        b"P\ts1#h1\t1+\t*\nP\ts1#h2\t1+\t*\nP\ts2#h1\t1+\t*\n"
    )
    names, lengths, steps, cov = haplotype_matrix(g, group_delim="#")
    assert names == ["s1", "s2"]
    assert cov.tolist() == [[2], [1]]


def test_jaccard(two_path_graph):
    jac = path_jaccard_matrix(two_path_graph)
    assert jac[0, 0] == pytest.approx(1.0)
    # y covers 4bp of x's 6bp; union 6 -> 4/6
    assert jac[0, 1] == pytest.approx(4 / 6)


def test_flatten(t_gfa):
    fa, bed = io.StringIO(), io.StringIO()
    flatten(t_gfa, fa, bed)
    assert fa.getvalue().startswith(">flattened\n")
    assert len(bed.getvalue().splitlines()) == t_gfa.num_steps + 1


def test_kmers(t_gfa):
    counts = path_kmers(t_gfa, 5)
    seq = path_sequence(t_gfa, 0)
    assert sum(counts.values()) == len(seq) - 4
    assert counts[seq[:5]] >= 1


def test_tension(two_path_graph):
    g = two_path_graph
    coords = np.zeros((2 * g.num_nodes, 2))
    coords[:, 0] = np.arange(2 * g.num_nodes)  # spread out
    t = node_tension(g, coords)
    assert t.shape == (3,)
    assert (t >= 0).all()
    assert t.sum() > 0


def test_matrix(two_path_graph):
    buf = io.StringIO()
    write_matrix(two_path_graph, buf)
    assert len(buf.getvalue().splitlines()) == two_path_graph.num_edges
    buf2 = io.StringIO()
    write_matrix(two_path_graph, buf2, weight_by_paths=True)
    rows = [l.split("\t") for l in buf2.getvalue().splitlines()]
    # pair (1,3) traversed once by y; (1,2) and (2,3) by x
    weights = {(r[0], r[1]): int(r[2]) for r in rows}
    assert weights[("1", "2")] == 1
    assert weights[("1", "3")] == 1


def test_heaps(two_path_graph):
    curves = heaps_permutations(two_path_graph, n_permutations=10)
    assert curves.shape == (10, 2)
    # final cumulative coverage is the full 6bp regardless of order
    assert (curves[:, -1] == 6).all()
    assert (np.diff(curves, axis=1) >= 0).all()


def test_pav(two_path_graph):
    cols, tab = pav_table(two_path_graph, ref_path=0, intervals=[(0, 6), (2, 4)])
    assert cols == ["x", "y"]
    assert tab[0, 0] == pytest.approx(1.0)
    # y misses node 2 (bp 2..4 of path x)
    assert tab[0, 1] == pytest.approx(4 / 6)
    assert tab[1, 1] == pytest.approx(0.0)


def test_graph_kmers_cross_edges(t_gfa):
    from odgi_tpu.algorithms.analytics import for_each_graph_kmer

    ks = list(for_each_graph_kmer(t_gfa, 5))
    assert ks and all(len(seq) == 5 for seq, _, _, _ in ks)
    # kmers must cross node boundaries: t.gfa has 1bp nodes
    assert len(ks) > t_gfa.num_nodes
    # furcation cap reduces the count
    capped = list(for_each_graph_kmer(t_gfa, 5, max_furcations=1))
    assert len(capped) <= len(ks)
