"""Reference .lay layout container compatibility (io/lay.py)."""

import io

import numpy as np

from odgi_tpu.io.lay import load_lay, load_layout, save_lay, save_layout

LAY_FIXTURE = "/root/reference/test/DRB1-3123_unsorted.og.lay"


def test_load_reference_lay():
    c = load_lay(LAY_FIXTURE)
    # 3214 nodes x 2 endpoints (reference: layout_main.cpp:268-269)
    assert c.shape == (6428, 2)
    assert c.min() == 1000.0  # min_value stored exactly
    assert np.isfinite(c).all()


def test_save_is_byte_identical_to_reference():
    c = load_lay(LAY_FIXTURE)
    buf = io.BytesIO()
    save_lay(c, buf)
    with open(LAY_FIXTURE, "rb") as f:
        assert buf.getvalue() == f.read()


def test_roundtrip_random_coords():
    rng = np.random.default_rng(0)
    c = rng.normal(scale=1e4, size=(513, 2))  # odd size exercises tail
    buf = io.BytesIO()
    save_lay(c, buf)
    c2 = load_lay(buf.getvalue())
    # the format's min-shift costs <=1 ulp per coord ((v-min)+min), a
    # lossiness the reference shares (layout.cpp:47-55); beyond that the
    # elias-delta stream is exact, so a second roundtrip is idempotent
    assert np.allclose(c, c2, rtol=1e-12, atol=0)
    buf2 = io.BytesIO()
    save_lay(c2, buf2)
    assert np.array_equal(load_lay(buf2.getvalue()), c2)


def test_load_layout_sniffs_both(tmp_path):
    c = load_lay(LAY_FIXTURE)
    p_native = str(tmp_path / "x.layt")
    p_ref = str(tmp_path / "x.lay")
    save_layout(c, p_native)
    save_layout(c, p_ref)
    assert np.array_equal(load_layout(p_native), c)
    assert np.array_equal(load_layout(p_ref), c)


def test_reference_layout_stress():
    """The fixture layout's 2D stress is the quality bar for our layouts
    (BASELINE: equal-stress .lay layouts)."""
    import odgi_tpu
    from odgi_tpu.algorithms import stats

    g = odgi_tpu.parse_gfa("/root/reference/test/DRB1-3123_unsorted.gfa")
    c = load_lay(LAY_FIXTURE)
    d = stats.sum_of_path_node_distances(g, xy=(c[:, 0], c[:, 1]))
    assert 1.0 < d.all_2d_by_nucleotides < 1.5  # measured 1.2855
