"""Long-tail algorithms: split_strands / is_acyclic / count_walks /
shortest_cycle / eades / linear_sgd / ProgressMeter / GFAz sniffing
(reference: src/algorithms/{split_strands,is_acyclic,count_walks,
shortest_cycle,eades_algorithm,linear_sgd}.cpp, progress.hpp,
src/utils.cpp:16-25)."""

import io
import contextlib

import numpy as np
import pytest

import odgi_tpu
from odgi_tpu.algorithms import graph_misc as gm
from odgi_tpu.core.graph import GraphBuilder
from odgi_tpu.cli.main import main as cli_main

T_GFA = "/root/reference/test/t.gfa"


def cyclic_graph():
    b = GraphBuilder()
    for i in (1, 2, 3):
        b.add_node(i, b"AAAA")
    b.add_edge(1, False, 2, False)
    b.add_edge(2, False, 3, False)
    b.add_edge(3, False, 1, False)
    return b.build()


def test_split_strands_doubles():
    g = odgi_tpu.parse_gfa(T_GFA)
    sp, tr = gm.split_strands(g)
    assert sp.num_nodes == 2 * g.num_nodes
    assert sp.num_edges == 2 * g.num_edges
    assert sp.validate() == []
    # reverse copies carry the reverse complement
    r0_fwd = sp.node_seq(0)
    r0_rev = sp.node_seq(1)
    assert r0_rev == bytes(
        reversed(r0_fwd.translate(bytes.maketrans(b"ACGT", b"TGCA")))
    )
    assert tr[1] == (int(g.node_id[0]), False)
    assert tr[2] == (int(g.node_id[0]), True)


def test_is_acyclic():
    assert gm.is_acyclic(odgi_tpu.parse_gfa(T_GFA))
    assert not gm.is_acyclic(cyclic_graph())


def test_count_walks_diamond():
    b = GraphBuilder()
    for i in (1, 2, 3, 4):
        b.add_node(i, b"A")
    b.add_edge(1, False, 2, False)
    b.add_edge(1, False, 3, False)
    b.add_edge(2, False, 4, False)
    b.add_edge(3, False, 4, False)
    assert gm.count_walks(b.build()) == 2


def test_shortest_cycle():
    INF = (1 << 63) - 1
    assert gm.shortest_cycle_length(odgi_tpu.parse_gfa(T_GFA)) == INF
    assert gm.shortest_cycle_length(cyclic_graph()) == 12


def test_eades_order_permutation():
    g = odgi_tpu.parse_gfa(T_GFA)
    o = gm.eades_order(g)
    assert sorted(o.tolist()) == list(range(g.num_nodes))
    o2 = gm.eades_order(cyclic_graph())
    assert sorted(o2.tolist()) == [0, 1, 2]


def test_linear_sgd_order():
    g = odgi_tpu.parse_gfa(T_GFA)
    o = gm.linear_sgd_order(g, bandwidth=100, t_max=10)
    assert sorted(o.tolist()) == list(range(g.num_nodes))


def test_sort_pipeline_e_and_l(tmp_path):
    rc = cli_main(["sort", "-i", T_GFA, "-o", str(tmp_path / "e.og"), "-p", "e"])
    assert rc == 0
    rc = cli_main(["sort", "-i", T_GFA, "-o", str(tmp_path / "l.og"), "-p", "l"])
    assert rc == 0


def test_stats_long_tail_flags():
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli_main(
            ["stats", "-i", T_GFA, "--is-acyclic", "--count-walks",
             "--shortest-cycle"]
        )
    out = buf.getvalue().splitlines()
    assert rc == 0
    assert "is_acyclic: yes" in out
    assert any(l.startswith("count_walks: ") for l in out)
    assert "shortest_cycle_length: none" in out


def test_gfaz_sniff_rejected(tmp_path):
    f = tmp_path / "x.gfaz"
    f.write_bytes(b"GFAZ" + b"\x00" * 64)
    with pytest.raises(SystemExit):
        cli_main(["stats", "-i", str(f), "-S"])


def test_progress_meter_runs():
    from odgi_tpu.utils.progress import ProgressMeter

    buf = io.StringIO()
    pm = ProgressMeter(100, "[odgi_tpu::test]", enabled=True, stream=buf,
                       interval=0.01)
    for _ in range(100):
        pm.increment()
    pm.finish()
    out = buf.getvalue()
    assert "[odgi_tpu::test]" in out
    assert "100.00%" in out


def test_dagify_unrolls_cycles():
    b = GraphBuilder()
    for i in (1, 2, 3, 4):
        b.add_node(i, b"AAAA")
    b.add_edge(1, False, 2, False)
    b.add_edge(2, False, 3, False)
    b.add_edge(3, False, 2, False)  # cycle 2<->3
    b.add_edge(3, False, 4, False)
    g = b.build()
    sp, _ = gm.split_strands(g)
    dag, tr = gm.dagify(sp, 1)
    assert gm.is_acyclic(dag)
    assert dag.num_nodes > sp.num_nodes  # the cycle was duplicated
    # every dag node maps back to a split node
    assert all(v in [int(i) for i in sp.node_id] for v in tr.values())


def test_dagify_sort_order_projects_back():
    g = odgi_tpu.parse_gfa(T_GFA)
    o = gm.dagify_sort_order_exact(g)
    assert sorted(o.tolist()) == list(range(g.num_nodes))
