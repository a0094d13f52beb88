"""Pixel-snapshot regression for viz and draw (round-3 verdict #7).

True byte-diffs against the reference binary are blocked (the reference
is unbuildable here: empty vendored deps), so these tests pin OUR
rendered output instead: blake2b digests of the raw RGB arrays for fixed
inputs across every color mode, the BASELINE config-#4 scenario
(chr6.C4 with chr6.HLA_genes.bed node coloring) and draw on the
reference DRB1 `.lay` fixture.  Changing a palette constant, the font,
the binning, or the rasterizers fails a digest.

Regenerate after an INTENTIONAL rendering change with:
    ODGI_TPU_REGEN_SNAPSHOTS=1 python -m pytest tests/test_render_snapshots.py
and commit the updated tests/data/render_snapshots.json.
"""

import hashlib
import json
import os
import pathlib

import numpy as np
import pytest

SNAP_FILE = pathlib.Path(__file__).parent / "data" / "render_snapshots.json"
REGEN = os.environ.get("ODGI_TPU_REGEN_SNAPSHOTS") == "1"
REF = pathlib.Path("/root/reference/test")


def _digest(arr: np.ndarray) -> str:
    a = np.ascontiguousarray(arr)
    return hashlib.blake2b(
        a.tobytes() + str(a.shape).encode(), digest_size=16
    ).hexdigest()


def _check(key: str, arr: np.ndarray):
    d = _digest(arr)
    snaps = json.loads(SNAP_FILE.read_text()) if SNAP_FILE.exists() else {}
    if REGEN:
        snaps[key] = d
        SNAP_FILE.parent.mkdir(parents=True, exist_ok=True)
        SNAP_FILE.write_text(json.dumps(snaps, indent=1, sort_keys=True))
        return
    assert key in snaps, (
        f"no committed snapshot for {key!r} — run with "
        "ODGI_TPU_REGEN_SNAPSHOTS=1 and commit the fixture"
    )
    assert snaps[key] == d, (
        f"rendered output changed for {key!r} (committed {snaps[key]}, "
        f"got {d}) — if intentional, regenerate the snapshot fixtures"
    )


VIZ_MODES = [
    ("path", {}),
    ("strand", {}),
    ("depth", {}),
    ("gray", {}),
    ("inversion", {}),
    ("uncalled", {}),
    ("prefix", {}),
    ("depth_brewer", {"color_by": "depth", "colorbrewer_scheme": "Spectral:4"}),
    ("path_dark", {"color_by": "path", "change_darkness": True}),
    ("path_packed", {"color_by": "path", "pack_paths": True}),
    ("path_noborder", {"color_by": "path", "path_borders": False}),
]


@pytest.mark.parametrize("key,overrides", VIZ_MODES, ids=[m[0] for m in VIZ_MODES])
def test_viz_mode_snapshot(drb_graph, key, overrides):
    from odgi_tpu.algorithms.viz import render_viz

    kwargs = dict(width=400, path_height=6, color_by=key)
    kwargs.update(overrides)
    img = render_viz(drb_graph, **kwargs)
    assert img.dtype == np.uint8 and img.ndim == 3
    _check(f"viz_drb1_{key}", img)


def test_viz_chr6_hla_bed_highlight_snapshot():
    """BASELINE config #4: chr6.C4 with chr6.HLA_genes.bed coloring."""
    import odgi_tpu
    from odgi_tpu.algorithms.viz import render_viz

    g = odgi_tpu.parse_gfa(str(REF / "chr6.C4.gfa"))
    # nodes covered by the BED intervals (path ranges -> node ids)
    from odgi_tpu.algorithms.draw import bed_node_colors

    colors = bed_node_colors(g, str(REF / "chr6.HLA_genes.bed"))
    hl = (
        (np.arange(g.num_nodes) + 1)[np.any(colors != 0, axis=1)]
        if colors is not None
        else None
    )
    img = render_viz(g, width=400, path_height=4, color_by="path",
                     highlight_nodes=hl)
    _check("viz_chr6_hla_bed", img)


def test_draw_png_snapshot_from_lay_fixture(tmp_path):
    """draw on the reference DRB1 layout fixture, decoded back to pixels."""
    from odgi_tpu.io.og_compat import load_og
    from odgi_tpu.io.lay import load_lay
    from odgi_tpu.algorithms.draw import draw_png

    import odgi_tpu
    g = odgi_tpu.parse_gfa(str(REF / "DRB1-3123_unsorted.gfa"))
    coords = load_lay(str(REF / "DRB1-3123_unsorted.og.lay"))
    out = tmp_path / "d.png"
    draw_png(g, coords, str(out), width=300)
    from PIL import Image

    img = np.asarray(Image.open(out).convert("RGB"))
    _check("draw_drb1_lay_png", img)


def test_draw_svg_snapshot_from_lay_fixture(tmp_path):
    from odgi_tpu.io.og_compat import load_og
    from odgi_tpu.io.lay import load_lay
    from odgi_tpu.algorithms.draw import draw_svg

    import odgi_tpu
    g = odgi_tpu.parse_gfa(str(REF / "DRB1-3123_unsorted.gfa"))
    coords = load_lay(str(REF / "DRB1-3123_unsorted.og.lay"))
    out = tmp_path / "d.svg"
    draw_svg(g, coords, str(out), scale=0.01)
    data = out.read_bytes()
    _check("draw_drb1_lay_svg", np.frombuffer(data, np.uint8))
