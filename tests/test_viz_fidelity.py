"""Viz fidelity: color modes, labels, packing, prefix handling, palettes
(reference: src/subcommand/viz_main.cpp:56-160 flags, :616-676 prefix
grouping, :1025-1560 rasterizers; src/colorbrewer.hpp)."""

import numpy as np
import pytest

import odgi_tpu
from odgi_tpu.algorithms import viz
from odgi_tpu.algorithms.colorbrewer import palette, parse_scheme_spec
from odgi_tpu.cli.main import main as cli_main

T_GFA = "/root/reference/test/t.gfa"
OV = "/root/reference/test/overlap.gfa"
C4 = "/root/reference/test/chr6.C4.gfa"


def test_colorbrewer_palettes():
    assert palette("Set1", 3) == [(228, 26, 28), (55, 126, 184), (77, 175, 74)]
    assert len(palette("Spectral", 11)) == 11
    assert len(parse_scheme_spec("Blues:5")) == 5
    with pytest.raises(KeyError):
        palette("NotAScheme", 3)


def test_bin_uncalled_fraction():
    from odgi_tpu.core.graph import GraphBuilder

    b = GraphBuilder()
    b.add_node(1, b"NNNN")
    b.add_node(2, b"ACGT")
    b.add_edge(1, False, 2, False)
    p = b.add_path("x")
    b.append_step(p, 1, False)
    b.append_step(p, 2, False)
    g = b.build()
    bins = viz.bin_paths(g, 2)
    assert bins.mean_uncalled[0, 0] == pytest.approx(1.0)
    assert bins.mean_uncalled[0, 1] == pytest.approx(0.0)


@pytest.mark.parametrize(
    "mode", ["path", "strand", "depth", "gray", "inversion", "uncalled", "prefix"]
)
def test_render_modes(mode):
    g = odgi_tpu.parse_gfa(OV)
    img = viz.render_viz(g, width=200, color_by=mode)
    assert img.dtype == np.uint8 and img.shape[2] == 3
    assert (img < 250).any()  # something was drawn


def test_labels_and_hide():
    g = odgi_tpu.parse_gfa(OV)
    with_labels = viz.render_viz(g, width=200, show_path_names=True)
    without = viz.render_viz(g, width=200, show_path_names=False)
    assert with_labels.shape[1] > without.shape[1]
    # label margin contains black text pixels
    margin = with_labels[:, : with_labels.shape[1] - 200, :]
    assert (margin == 0).any()


def test_pack_paths_reduces_rows():
    g = odgi_tpu.parse_gfa(C4)
    tall = viz.render_viz(g, width=300, pack_paths=False,
                          show_path_names=False)
    packed = viz.render_viz(g, width=300, pack_paths=True,
                            show_path_names=False)
    assert packed.shape[0] <= tall.shape[0]


def test_prefix_merge_and_ignore():
    g = odgi_tpu.parse_gfa(OV)
    merged = viz.render_viz(
        g, width=200, merge_prefixes=["query"], show_path_names=False
    )
    plain = viz.render_viz(g, width=200, show_path_names=False)
    assert merged.shape[0] < plain.shape[0]  # 3 query paths -> 1 row
    ignored = viz.render_viz(
        g, width=200, ignore_prefix="query", show_path_names=False
    )
    assert ignored.shape[0] < plain.shape[0]


def test_custom_path_colors():
    g = odgi_tpu.parse_gfa(OV)
    img = viz.render_viz(
        g,
        width=200,
        path_colors={"target": (1, 2, 3)},
        show_path_names=False,
    )
    assert (np.all(img == np.array([1, 2, 3]), axis=2)).any()


def test_viz_cli_full_flags(tmp_path):
    out = tmp_path / "v.png"
    rc = cli_main(
        ["viz", "-i", OV, "-o", str(out), "-x", "300", "-z", "-R", "-b"]
    )
    assert rc == 0 and out.stat().st_size > 0
    rc = cli_main(
        ["viz", "-i", OV, "-o", str(out), "-x", "300", "-m", "-B", "Blues:5"]
    )
    assert rc == 0
    colors = tmp_path / "colors"
    colors.write_text("target\t#ff0000\nquery1\t0,255,0\n")
    rc = cli_main(
        ["viz", "-i", OV, "-o", str(out), "-x", "300", "-c", str(colors)]
    )
    assert rc == 0


def test_viz_pixel_regression():
    """Pin the rendered pixel array for the default mode on t.gfa so color
    or layout regressions are caught (our equivalent of the reference's
    byte-equality regime for deterministic outputs)."""
    g = odgi_tpu.parse_gfa(T_GFA)
    img = viz.render_viz(g, width=64, path_height=4, show_path_names=False)
    assert img.shape == (40 + 4 + 1 * 4, 64, 3)
    # covered bins get the first categorical color; borders stay white
    row = img[45]
    covered = (row != 255).any(axis=1)
    assert covered.any()
    first_color = viz._PATH_COLORS[0]
    assert (row[covered] == first_color).all()


def test_draw_svg_structure(tmp_path):
    import io as _io

    from odgi_tpu.algorithms.draw import draw_svg
    from odgi_tpu.algorithms.layout import init_layout

    g = odgi_tpu.parse_gfa(T_GFA)
    coords = init_layout(g, "d")
    buf = _io.StringIO()
    draw_svg(g, coords, buf, node_labels={0: ["node1"]})
    svg = buf.getvalue()
    assert svg.startswith("<svg ") and svg.rstrip().endswith("</svg>")
    assert svg.count("<line ") == g.num_nodes
    assert "<text " in svg and "node1" in svg


def test_draw_svg_colors_and_sparsification(tmp_path):
    import io as _io

    import numpy as np
    from odgi_tpu.algorithms.draw import draw_svg
    from odgi_tpu.algorithms.layout import init_layout

    g = odgi_tpu.parse_gfa(T_GFA)
    coords = init_layout(g, "d")
    colors = np.zeros((g.num_nodes, 3), np.uint8)
    colors[3] = (255, 0, 0)
    buf = _io.StringIO()
    draw_svg(g, coords, buf, node_colors=colors)
    svg = buf.getvalue()
    assert 'stroke="#ff0000"' in svg
    # highlighted node is drawn after the black base layer
    assert svg.rindex('stroke="#ff0000"') > svg.index('stroke="#000000"')
    buf2 = _io.StringIO()
    draw_svg(g, coords, buf2, sparsification_factor=0.9)
    assert buf2.getvalue().count("<line ") < g.num_nodes


def test_draw_bed_node_colors(tmp_path):
    from odgi_tpu.algorithms.draw import bed_node_colors

    g = odgi_tpu.parse_gfa(T_GFA)
    bed = tmp_path / "x.bed"
    bed.write_text("x\t0\t10\tgene1\t0\t+\t0\t0\t255,0,0\n")
    colors = bed_node_colors(g, str(bed))
    assert colors is not None
    assert (colors == (255, 0, 0)).all(axis=1).any()
    assert (colors == (0, 0, 0)).all(axis=1).any()


def test_draw_cli_svg(tmp_path):
    lay = tmp_path / "t.lay"
    rc = cli_main(["layout", "-i", T_GFA, "-o", str(lay), "-x", "2"])
    assert rc == 0
    svg = tmp_path / "t.svg"
    rc = cli_main(["draw", "-i", T_GFA, "-c", str(lay), "-s", str(svg)])
    assert rc == 0 and svg.stat().st_size > 0
