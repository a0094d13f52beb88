"""Output-format tests for the extended `odgi untangle` driver
(reference: src/algorithms/untangle.cpp:530-1015 — PAF :617-637,
gene order :663-676, gggenes/schematic :683-699, cut points :888-915,
self-dotplot :184-214, cut-every :804-880)."""

import io
import contextlib

from odgi_tpu.cli.main import main as cli_main

OV = "/root/reference/test/overlap.gfa"


def run_cli(argv):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli_main(argv)
    return rc, buf.getvalue()


BASE = ["untangle", "-i", OV, "-r", "target"]


def test_untangle_paf_shape():
    rc, out = run_cli(BASE + ["-p"])
    assert rc == 0
    for line in out.splitlines():
        f = line.split("\t")
        assert len(f) >= 16
        assert f[4] in "+-"
        assert f[11] == "255"
        assert f[12].startswith("id:f:")
        assert f[13].startswith("jc:f:")
        assert f[14].startswith("sc:f:")
        assert f[15].startswith("nb:i:")
        # query interval within query length
        assert 0 <= int(f[2]) <= int(f[3]) <= int(f[1])


def test_untangle_gene_order():
    rc, out = run_cli(BASE + ["-G"])
    lines = out.splitlines()
    assert len(lines) == 4  # one row per query path
    nonempty = 0
    for line in lines:
        name, genes = line.split("\t")
        if not genes:
            continue  # queries with no mappings keep an empty list
        nonempty += 1
        for gspec in genes.split(","):
            tname, span = gspec.rsplit(":", 1)
            b, e = span.split("-")
            assert int(b) <= int(e)
    assert nonempty >= 1


def test_untangle_gggenes():
    rc, out = run_cli(BASE + ["-g"])
    lines = out.splitlines()
    assert lines[0] == "molecule\tgene\tstart\tend\tstrand"
    for line in lines[1:]:
        mol, gene, s, e, strand = line.split("\t")
        assert strand in ("0", "1")
        assert int(s) < int(e)


def test_untangle_schematic_100bp_genes():
    rc, out = run_cli(BASE + ["-X"])
    for line in out.splitlines()[1:]:
        mol, gene, s, e, strand = line.split("\t")
        assert int(e) - int(s) == 100
        assert int(s) % 150 == 0


def test_untangle_cut_points_roundtrip(tmp_path):
    cuts = tmp_path / "cuts"
    rc, out1 = run_cli(BASE + ["-d", str(cuts)])
    assert rc == 0
    ids = cuts.read_text().split()
    assert len(ids) > 0 and all(i.isdigit() for i in ids)
    # feeding the emitted cut points back reproduces the same mappings
    rc, out2 = run_cli(BASE + ["-c", str(cuts)])
    assert out1 == out2


def test_untangle_cut_every_adds_segments():
    rc, out_base = run_cli(BASE)
    rc, out_cut = run_cli(BASE + ["-e", "2"])
    assert len(out_cut.splitlines()) >= len(out_base.splitlines())


def test_untangle_self_dotplot():
    rc, out = run_cli(["untangle", "-i", OV, "-q", "target", "-S"])
    lines = out.splitlines()
    assert lines[0] == "name\tfrom\tto"
    assert all(l.split("\t")[0] == "target" for l in lines[1:])


def test_untangle_query_paths_file(tmp_path):
    f = tmp_path / "q"
    f.write_text("query1\n")
    rc, out = run_cli(["untangle", "-i", OV, "-Q", str(f), "-r", "target"])
    body = [l for l in out.splitlines() if not l.startswith("#")]
    assert body and all(l.startswith("query1\t") for l in body)
