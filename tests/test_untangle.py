"""Untangle pipeline tests."""

import io

import numpy as np
import pytest

from odgi_tpu import parse_gfa
from odgi_tpu.algorithms.untangle import (
    PathSelfIndex,
    SegmentMap,
    merge_cuts,
    self_mean_coverage,
    untangle,
    untangle_cuts,
)


@pytest.fixture
def loop_graph():
    # query path revisits node 2 (a loop): 1+,2+,3+,2+,4+
    return parse_gfa(
        b"S\t1\tAA\nS\t2\tCC\nS\t3\tGG\nS\t4\tTT\n"
        b"L\t1\t+\t2\t+\t0M\nL\t2\t+\t3\t+\t0M\nL\t3\t+\t2\t+\t0M\nL\t2\t+\t4\t+\t0M\n"
        b"P\tq\t1+,2+,3+,2+,4+\t*\nP\tt\t1+,2+,4+\t*\n"
    )


def test_self_index(loop_graph):
    si = PathSelfIndex(loop_graph, 0)
    assert si.n_steps_on_node(1) == 2  # node 2 visited twice
    first = si.on_node[1][0]
    assert si.next_on_node(1, first) == si.on_node[1][1]
    assert si.prev_on_node(1, si.on_node[1][1]) == first


def test_untangle_cuts_finds_loop(loop_graph):
    g = loop_graph
    si = PathSelfIndex(g, 0)
    cuts = untangle_cuts(g, 0, si, lambda r: False)
    # at minimum the path ends are cut points, plus the loop boundary
    assert cuts[0] == int(g.path_offset[0])
    assert len(cuts) >= 3


def test_merge_cuts_appends_sentinel(loop_graph):
    g = loop_graph
    si = PathSelfIndex(g, 0)
    cuts = merge_cuts(g, 0, untangle_cuts(g, 0, si, lambda r: False), 0)
    assert cuts[-1] == int(g.path_offset[1])  # end sentinel


def test_self_mean_coverage(loop_graph):
    g = loop_graph
    si = PathSelfIndex(g, 0)
    lo, hi = int(g.path_offset[0]), int(g.path_offset[1])
    cov = self_mean_coverage(g, si, lo, hi)
    assert cov > 1.0  # node 2 visited twice


def test_untangle_bedpe(loop_graph):
    g = loop_graph
    buf = io.StringIO()
    rows = untangle(g, queries=[0], targets=[1], out=buf)
    assert rows, "query should map to target segments"
    q, qs, qe, t, ts, te, jac, inv, sc, nth = rows[0]
    assert q == "q"
    assert t == "t"
    assert 0 < jac <= 1.0
    assert buf.getvalue().startswith("#query.name")


def test_untangle_identical_paths():
    g = parse_gfa(
        b"S\t1\tAAAA\nS\t2\tCCCC\n"
        b"L\t1\t+\t2\t+\t0M\n"
        b"P\ta\t1+,2+\t*\nP\tb\t1+,2+\t*\n"
    )
    rows = untangle(g, queries=[0], targets=[1])
    assert rows
    # identical path should map with jaccard 1
    assert rows[0][6] == pytest.approx(1.0)


def test_untangle_drb_smoke(drb_graph):
    g = drb_graph
    rows = untangle(g, queries=[0], targets=[1], merge_dist=100)
    assert rows
    # all rows reference valid positions
    for r in rows:
        assert 0 <= r[1] <= r[2] <= int(g.path_length[0])
