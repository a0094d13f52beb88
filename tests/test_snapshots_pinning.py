"""PG-SGD snapshots (-u) and target-path pinning (-H)
(reference: src/algorithms/path_sgd.cpp:285-302,387-392 target_sorting;
:408-433,589-637 1D snapshot replay; path_sgd_layout.cpp:379-408 2D
per-iteration .lay snapshots)."""

import numpy as np

from odgi_tpu.cli.main import main as cli_main
from odgi_tpu.ops import sgd
from odgi_tpu.algorithms.layout import init_layout

T_GFA = "/root/reference/test/t.gfa"
OV = "/root/reference/test/overlap.gfa"


def test_sort_snapshots_write_og_per_iteration(tmp_path):
    from odgi_tpu.io.og_compat import load_og

    prefix = str(tmp_path / "snap")
    rc = cli_main(
        ["sort", "-i", T_GFA, "-o", str(tmp_path / "out.og"),
         "-Y", "-x", "4", "-u", prefix]
    )
    assert rc == 0
    for j in range(1, 5):
        g = load_og(f"{prefix}{j}")
        assert g.num_nodes == 15
        assert g.validate() == []


def test_layout_snapshots_write_lay_per_iteration(tmp_path):
    from odgi_tpu.io.lay import load_layout

    prefix = str(tmp_path / "ls")
    rc = cli_main(
        ["layout", "-i", T_GFA, "-o", str(tmp_path / "out.lay"),
         "-x", "3", "-u", prefix]
    )
    assert rc == 0
    for j in range(1, 4):
        coords = load_layout(f"{prefix}{j}")
        assert coords.shape == (30, 2)
        assert np.isfinite(coords).all()


def test_1d_pinning_freezes_target_nodes():
    import odgi_tpu
    from odgi_tpu.core.graph import handle_rank

    g = odgi_tpu.parse_gfa(OV)
    cfg = sgd.derive_config_1d(g, iter_max=5)
    target = 0  # pin the first path's nodes
    lo, hi = int(g.path_offset[target]), int(g.path_offset[target + 1])
    pin = np.zeros(g.num_nodes, dtype=bool)
    pin[handle_rank(g.step_handle[lo:hi])] = True
    x0 = g.node_offset.astype(np.float64)
    X = sgd.path_sgd_1d(g, cfg, pin_nodes=pin)
    x0_f32 = x0.astype(np.float32).astype(np.float64)
    assert np.array_equal(X[pin], x0_f32[pin])
    assert not np.array_equal(X[~pin], x0_f32[~pin])


def test_2d_pinning_freezes_target_nodes():
    import odgi_tpu
    from odgi_tpu.core.graph import handle_rank

    g = odgi_tpu.parse_gfa(OV)
    cfg = sgd.derive_config_2d(g, iter_max=3)
    pin = np.zeros(g.num_nodes, dtype=bool)
    lo, hi = int(g.path_offset[0]), int(g.path_offset[1])
    pin[handle_rank(g.step_handle[lo:hi])] = True
    coords0 = init_layout(g, "d")
    out = sgd.path_sgd_2d(g, coords0, cfg, pin_nodes=pin)
    pin_ep = np.repeat(pin, 2)
    c0 = np.asarray(coords0, np.float32).astype(np.float64)
    assert np.array_equal(out[pin_ep], c0[pin_ep])
    assert not np.array_equal(out[~pin_ep], c0[~pin_ep])


def test_sort_target_paths_cli(tmp_path):
    from odgi_tpu.io.og_compat import load_og

    f = tmp_path / "targets"
    f.write_text("target\n")
    out = tmp_path / "out.og"
    rc = cli_main(
        ["sort", "-i", OV, "-o", str(out), "-Y", "-x", "3", "-H", str(f)]
    )
    assert rc == 0
    assert load_og(str(out)).validate() == []
