"""Position mapping + extract tests."""

import numpy as np
import pytest

from odgi_tpu import parse_gfa
from odgi_tpu.algorithms.extract import (
    expand_context,
    extract_bed,
    extract_nodes,
    extract_path_range,
    nodes_in_path_range,
)
from odgi_tpu.algorithms.position import (
    graph_pos_to_paths,
    lift_position,
    pangenome_pos,
    panpos,
    path_pos_to_graph,
)


def test_path_pos_to_graph(t_gfa):
    g = t_gfa
    # position 0 is node 1 (rank 0), offset 0
    assert path_pos_to_graph(g, 0, 0) == (0, 0, False)
    # position 7 is still in node 1 (8bp)
    assert path_pos_to_graph(g, 0, 7) == (0, 7, False)
    # position 8 starts node 3 (rank 2) on path x
    assert path_pos_to_graph(g, 0, 8) == (2, 0, False)
    with pytest.raises(IndexError):
        path_pos_to_graph(g, 0, 10_000)


def test_path_pos_reverse_step():
    g = parse_gfa(
        b"S\t1\tAAAA\nS\t2\tCCCC\nL\t1\t+\t2\t-\t0M\nP\tx\t1+,2-\t*\n"
    )
    # path position 4 = first bp of the reverse traversal of node 2 =
    # node-forward offset 3
    rank, off, rev = path_pos_to_graph(g, 0, 4)
    assert (rank, rev) == (1, True)
    assert off == 3


def test_panpos(t_gfa):
    # pangenome pos of x:8 = start of node 3 = offset of rank 2
    assert panpos(t_gfa, "x", 8) == pangenome_pos(t_gfa, 2, 0)
    assert panpos(t_gfa, "x", 0) == 0


def test_graph_pos_to_paths(t_gfa):
    hits = graph_pos_to_paths(t_gfa, 0, 3)
    assert hits == [(0, 3, False)]
    # node 2 (rank 1) is not on any path
    assert graph_pos_to_paths(t_gfa, 1, 0) == []


def test_lift_position_direct():
    g = parse_gfa(
        b"S\t1\tAAAA\nS\t2\tCC\nL\t1\t+\t2\t+\t0M\n"
        b"P\ta\t1+,2+\t*\nP\tb\t2+\t*\n"
    )
    # a:5 is on node 2 offset 1 -> b:1
    res = lift_position(g, 0, 5, [1])
    assert res is not None
    p, pos, rev, walked = res
    assert (p, pos, walked) == (1, 1, 0)


def test_lift_position_bfs():
    # a goes through node 1; b only on node 2, one hop away
    g = parse_gfa(
        b"S\t1\tAAAA\nS\t2\tCC\nL\t1\t+\t2\t+\t0M\n"
        b"P\ta\t1+\t*\nP\tb\t2+\t*\n"
    )
    res = lift_position(g, 0, 2, [1])
    assert res is not None
    assert res[0] == 1
    res2 = lift_position(g, 0, 2, [1], search_radius_bp=0)
    assert res2 is None


def test_nodes_in_path_range(t_gfa):
    ranks = nodes_in_path_range(t_gfa, 0, 0, 9)
    # bp 0-9 covers node 1 (8bp) and node 3 (1bp at pos 8)
    assert set(ranks) == {0, 2}


def test_extract_path_range(t_gfa):
    sub = extract_path_range(t_gfa, "x", 0, 9)
    assert sub.num_nodes == 2
    assert sub.validate() == []
    # fragment naming
    assert any(":" in n or n == "x" for n in sub.path_names)


def test_extract_full_range(t_gfa):
    sub = extract_path_range(t_gfa, "x", 0, 9, full_range=True)
    # lacing includes node 2 between ranks 0 and 2
    assert sub.num_nodes == 3


def test_extract_context(t_gfa):
    sub0 = extract_nodes(t_gfa, [0])
    assert sub0.num_nodes == 1
    sub1 = extract_nodes(t_gfa, [0], context_steps=1)
    # node 1 connects to nodes 2 and 3
    assert sub1.num_nodes == 3


def test_extract_bed(t_gfa):
    sub = extract_bed(t_gfa, [("x", 0, 9), ("x", 40, 50)])
    assert sub.num_nodes >= 3
    assert sub.validate() == []


def test_extract_node_and_inverse(tmp_path):
    import io, contextlib
    from odgi_tpu.cli.main import main as cli_main
    from odgi_tpu.io.og_compat import load_og

    out = tmp_path / "sub.og"
    rc = cli_main(
        ["extract", "-i", "/root/reference/test/t.gfa", "-o", str(out),
         "-n", "5", "-c", "1"]
    )
    assert rc == 0
    sub = load_og(str(out))
    assert 1 <= sub.num_nodes <= 5
    rc = cli_main(
        ["extract", "-i", "/root/reference/test/t.gfa", "-o", str(out),
         "-n", "5", "-I"]
    )
    assert rc == 0
    inv = load_og(str(out))
    assert inv.num_nodes == 14  # all but node 5


def test_extract_pangenomic_range_and_drop_pathless(tmp_path):
    from odgi_tpu.cli.main import main as cli_main
    from odgi_tpu.io.og_compat import load_og

    out = tmp_path / "sub.og"
    rc = cli_main(
        ["extract", "-i", "/root/reference/test/t.gfa", "-o", str(out),
         "-q", "0-20", "--drop-pathless", "-O"]
    )
    assert rc == 0
    sub = load_og(str(out))
    assert sub.num_nodes > 0
    from odgi_tpu.core.graph import handle_rank
    import numpy as np

    used = np.zeros(sub.num_nodes, bool)
    used[handle_rank(sub.step_handle)] = True
    assert used.all()  # -d removed pathless nodes


def test_extract_subpath_gap_merging_and_split(tmp_path):
    """Reference extract -d/--max-distance-subpaths pulls small gaps
    between selected subpaths back in; -s writes one graph per range;
    -K restores full path names for single-fragment subpaths
    (extract_main.cpp)."""
    import subprocess
    import sys

    from odgi_tpu import parse_gfa
    from odgi_tpu.cli.main import main as cli_main

    # path x covers nodes 1..10 linearly (t.gfa-like synthetic)
    gfa = tmp_path / "g.gfa"
    lines = ["H\tVN:Z:1.0"]
    for i in range(1, 11):
        lines.append(f"S\t{i}\tAAAA")
    for i in range(1, 10):
        lines.append(f"L\t{i}\t+\t{i+1}\t+\t0M")
    lines.append("P\tx\t" + ",".join(f"{i}+" for i in range(1, 11)) + "\t*")
    gfa.write_text("\n".join(lines) + "\n")

    out = tmp_path / "sub.og"
    # select two windows [0,8) and [16,24) bp -> nodes 1-2 and 5-6;
    # the 8bp gap (nodes 3-4) merges back with -d 9 but not with -d 4
    bed = tmp_path / "r.bed"
    bed.write_text("x\t0\t8\nx\t16\t24\n")
    rc = cli_main(
        ["extract", "-i", str(gfa), "-o", str(out), "-b", str(bed),
         "-d", "9"]
    )
    assert rc == 0
    from odgi_tpu.io.og_compat import load_og

    sub = load_og(str(out))
    assert sub.num_nodes == 6  # 1,2,3,4,5,6 (gap merged)
    rc = cli_main(
        ["extract", "-i", str(gfa), "-o", str(out), "-b", str(bed),
         "-d", "4"]
    )
    assert rc == 0
    sub = load_og(str(out))
    assert sub.num_nodes == 4  # gap NOT merged

    # -s: one file per range; -K restores the full path name
    rc = cli_main(
        ["extract", "-i", str(gfa), "-o", str(tmp_path / "split.og"),
         "-b", str(bed), "-s", "-K"]
    )
    assert rc == 0
    s1 = load_og(str(tmp_path / "split.x:0-8.og"))
    s2 = load_og(str(tmp_path / "split.x:16-24.og"))
    assert s1.num_nodes == 2 and s2.num_nodes == 2
    assert s1.path_names == ("x",)  # -K restored the name
