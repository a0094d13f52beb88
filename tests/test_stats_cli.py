"""Golden-format tests for the `odgi stats` driver surface
(reference: src/subcommand/stats_main.cpp — TSV / YAML (-y) / MultiQC (-m)
output shapes; flag set :34-79)."""

import io
import contextlib

import pytest

from odgi_tpu.cli.main import main as cli_main


def run_cli(argv):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli_main(argv)
    return rc, buf.getvalue()


T_GFA = "/root/reference/test/t.gfa"


def test_stats_default_is_summary():
    rc, out = run_cli(["stats", "-i", T_GFA])
    assert rc == 0
    assert out.splitlines()[0] == "#length\tnodes\tedges\tpaths\tsteps"
    assert out.splitlines()[1] == "55\t15\t20\t1\t10"


def test_stats_multiqc_yaml_shape():
    rc, out = run_cli(["stats", "-i", T_GFA, "-m"])
    assert rc == 0
    lines = out.splitlines()
    assert lines[0] == "---"
    assert "length: 55" in lines
    assert "num_weakly_connected_components: 1" in lines
    assert "      is_acyclic: 'yes'" in out
    assert "num_nodes_self_loops:" in lines
    assert "  total: 0" in lines
    assert "  unique: 0" in lines
    assert any(l.startswith("file_size_in_bytes: ") for l in lines)
    assert "mean_links_length:" in lines
    assert "      path: all_paths" in out
    assert "      num_gap_links_not_penalized: 0" in out
    assert "sum_of_path_node_distances:" in lines
    assert "      num_penalties_different_orientation: 0" in out


def test_stats_yaml_selected_only():
    rc, out = run_cli(["stats", "-i", T_GFA, "-y", "-S"])
    assert rc == 0
    lines = out.splitlines()
    assert lines[0] == "---"
    assert lines[1] == "length: 55"
    assert "mean_links_length:" not in out


def test_stats_per_path_rows():
    rc, out = run_cli(["stats", "-i", T_GFA, "-s", "-l", "-p"])
    assert rc == 0
    # t.gfa has one path 'x': a per-path row precedes all_paths in both blocks
    assert out.count("\nx\t") == 2
    assert out.count("all_paths\t") == 2


def test_stats_wfa_wrj_per_path():
    rc, out = run_cli(["stats", "-i", T_GFA, "-w", "-j", "-p"])
    assert rc == 0
    lines = out.splitlines()
    assert "path\tweighted_feedback_arc" in lines
    assert "path\tweighted_reversing_join" in lines
    # per-path row present before each all_paths row
    ix = lines.index("path\tweighted_feedback_arc")
    assert lines[ix + 1].startswith("x\t")
    assert lines[ix + 2].startswith("all_paths\t")


def test_stats_links_length_per_nuc():
    rc, out = run_cli(["stats", "-i", T_GFA, "-q"])
    assert rc == 0
    lines = out.splitlines()
    assert lines[0] == "path\tlinks_length_per_nuc"
    assert lines[1].startswith("all_paths\t")


def test_stats_class_counts():
    rc, out = run_cli(
        ["stats", "-i", T_GFA, "-a", "#,0"]
    )
    assert rc == 0
    lines = out.splitlines()
    assert lines[0] == "#name\tcore\tprivate\tshell"
    # single sample: every visited nucleotide is Private
    name, core, priv, shell = lines[1].split("\t")
    assert name == "x"
    assert core == "0" and shell == "0"
    assert int(priv) > 0


def test_stats_nondeterministic_edges():
    rc, out = run_cli(["stats", "-i", T_GFA, "-N"])
    assert rc == 0
    assert out.splitlines()[0] == "#from_node\tto_node"


def test_stats_file_size():
    import os

    rc, out = run_cli(["stats", "-i", T_GFA, "-f"])
    assert rc == 0
    assert out.strip() == str(os.path.getsize(T_GFA))
