"""Tests for the HBM-streaming PG-SGD kernels (ops/pallas_sgd_xl.py).

Claims pinned here, all run through the REAL Mosaic kernels in
interpret mode (pltpu.InterpretParams) on CPU:

- **Chunk-phase bit-exactness vs the resident kernels**: the streaming
  variants DMA the same values the resident kernels slice from VMEM and
  execute the same pair arithmetic.  The 1D comparison is bit-identical;
  the 2D resident merge uses a windowed/transposed factorization whose
  f32 association differs from the streaming merge, so 2D is pinned to
  agree within a few ulps (<= 1e-6 relative).  The streaming kernels ARE
  bit-identical to the block-merge (XXL) kernels
  (tests/test_pallas_sgd_xxl.py).
- **Segmentation invariance**: splitting a run into multiple dispatches
  must not change the result.  The drift/base HBM state is carried
  across dispatches via input/output aliasing and the one-time init is
  gated on the GLOBAL first segment (meta[0] == 0) — regression test
  for the round-4 advisor's high-severity finding (every segment after
  the first silently reset the replica geometry to the initial layout).
"""

import numpy as np
import pytest

import jax

from odgi_tpu.ops import sgd
from odgi_tpu.ops import pallas_sgd as ps
from odgi_tpu.ops import pallas_sgd_xl as xl
from odgi_tpu.algorithms.layout import init_layout


@pytest.fixture(scope="module")
def xl_graph():
    """3 paths x 1700 steps over 150 nodes (S >= CHUNK at RC=32)."""
    from odgi_tpu.core.graph import GraphBuilder

    rng = np.random.default_rng(11)
    b = GraphBuilder()
    N = 150
    for i in range(1, N + 1):
        b.add_node(i, b"ACGTA" * int(rng.integers(1, 5)))
    for i in range(1, N):
        b.add_edge(i, False, i + 1, False)
    for pi in range(3):
        p = b.add_path(f"p{pi}")
        n = 1
        for _ in range(1700):
            b.append_step(p, n, bool(rng.integers(0, 2)))
            n = int(np.clip(n + rng.integers(-2, 3), 1, N))
    return b.build()


def _force_segments(monkeypatch, plan, n_seg):
    """Shrink MAX_CHUNKS so _segments splits the run into >= n_seg
    dispatches at merge-group boundaries."""
    total = plan["groups"] * plan["cgs"]
    monkeypatch.setattr(ps, "MAX_CHUNKS", max(plan["cgs"], total // n_seg))


def test_xl_2d_bitexact_vs_resident(xl_graph):
    g = xl_graph
    cfg = sgd.derive_config_2d(g, iter_max=2, min_term_updates=3 * 1024)
    c0 = init_layout(g, "d")
    res = np.asarray(ps.path_sgd_2d_pallas(g, c0, cfg, interpret=True))
    stream = np.asarray(xl.path_sgd_2d_pallas_xl(g, c0, cfg, interpret=True))
    assert np.isfinite(stream).all()
    # chunk phases are identical; the resident 2D merge factorization
    # (windowed/transposed) associates f32 adds differently, so agree
    # to a few ulps rather than bitwise
    scale = np.abs(res).max() + 1
    assert np.abs(stream - res).max() / scale < 1e-6
    # and it actually optimized
    assert np.abs(stream - np.asarray(c0, np.float64)).max() > 1.0


def test_xl_1d_bitexact_vs_resident(xl_graph):
    g = xl_graph
    cfg = sgd.derive_config_1d(g, iter_max=2, min_term_updates=3 * 1024)
    res = np.asarray(ps.path_sgd_1d_pallas(g, cfg, interpret=True))
    stream = np.asarray(xl.path_sgd_1d_pallas_xl(g, cfg, interpret=True))
    assert np.isfinite(stream).all()
    np.testing.assert_array_equal(stream, res)


def test_xl_2d_multisegment_continuation(xl_graph, monkeypatch):
    """>= 3 dispatches must reproduce the single-dispatch result exactly:
    the aliased drift/base state continues across segments and the HBM
    init runs only on the global first segment."""
    g = xl_graph
    cfg = sgd.derive_config_2d(g, iter_max=3, min_term_updates=3 * 1024)
    c0 = init_layout(g, "d")
    plan = ps.plan_run(g, cfg, one_d=False)
    assert plan["groups"] >= 3, "need >= 3 merge groups to segment"
    one = np.asarray(xl.path_sgd_2d_pallas_xl(g, c0, cfg, interpret=True))
    _force_segments(monkeypatch, plan, 3)
    segs = ps._segments(plan["groups"], plan["cgs"])
    assert len(segs) >= 2, segs
    many = np.asarray(xl.path_sgd_2d_pallas_xl(g, c0, cfg, interpret=True))
    np.testing.assert_array_equal(many, one)


def test_xl_1d_multisegment_continuation(xl_graph, monkeypatch):
    g = xl_graph
    cfg = sgd.derive_config_1d(g, iter_max=3, min_term_updates=3 * 1024)
    plan = ps.plan_run(g, cfg, one_d=True)
    assert plan["groups"] >= 3
    one = np.asarray(xl.path_sgd_1d_pallas_xl(g, cfg, interpret=True))
    _force_segments(monkeypatch, plan, 3)
    segs = ps._segments(plan["groups"], plan["cgs"])
    assert len(segs) >= 2, segs
    many = np.asarray(xl.path_sgd_1d_pallas_xl(g, cfg, interpret=True))
    np.testing.assert_array_equal(many, one)


def test_xl_2d_matches_twin(xl_graph):
    """The streaming kernel against the exact-arithmetic host twin —
    same bound as the resident kernel's twin test."""
    g = xl_graph
    cfg = sgd.derive_config_2d(g, iter_max=2, min_term_updates=3 * 1024)
    c0 = init_layout(g, "d")
    twin = np.asarray(ps.path_sgd_2d_strata_xla(g, c0, cfg))
    stream = np.asarray(xl.path_sgd_2d_pallas_xl(g, c0, cfg, interpret=True))
    scale = np.abs(twin).max() + 1
    assert np.abs(stream - twin).max() / scale < 1e-4
