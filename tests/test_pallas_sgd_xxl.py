"""Tests for the big-N block-merge streaming kernels (pallas_sgd_xxl).

The block size is shrunk (monkeypatched XXL_BS) so a small synthetic
graph exercises MULTI-BLOCK merges, and the results are pinned
bit-identical to the capped XL kernels — the block-scheduled merge is
an exact reorganization (skipped (block, tile) pairs contribute exact
zeros), not an approximation.
"""

import numpy as np
import pytest

from odgi_tpu.ops import sgd
from odgi_tpu.ops import pallas_sgd as ps
from odgi_tpu.ops import pallas_sgd_xl as xl
from odgi_tpu.ops import pallas_sgd_xxl as xxl
from odgi_tpu.algorithms.layout import init_layout


@pytest.fixture(scope="module")
def big_graph():
    """2000 nodes, 3 paths x 1800 steps, jumps across the whole id
    range — with XXL_BS=1024 the 2D merge runs 4 blocks and most step
    tiles touch several blocks (a low-locality stress case)."""
    from odgi_tpu.core.graph import GraphBuilder

    rng = np.random.default_rng(23)
    b = GraphBuilder()
    N = 2000
    for i in range(1, N + 1):
        b.add_node(i, b"ACGT")
    for i in range(1, N):
        b.add_edge(i, False, i + 1, False)
    for pi in range(3):
        p = b.add_path(f"p{pi}")
        n = 1
        for _ in range(1800):
            b.append_step(p, n, bool(rng.integers(0, 2)))
            n = int(np.clip(n + rng.integers(-40, 41), 1, N))
    return b.build()


def test_schedule_covers_all_steps(big_graph):
    g = big_graph
    sched, K, nb = xxl._build_schedule(g, 1024, one_d=False)
    assert nb >= 2
    # every (block, tile) incidence of a real step is scheduled
    ep = 2 * (g.step_handle >> 1) + (g.step_handle & 1)
    tile = np.arange(g.num_steps) // (ps.TR * ps.LANE)
    want = set(zip(ep // 1024, tile))
    got = set(zip(sched[1, :K], sched[0, :K]))
    assert want <= got
    # first/last flags delimit each block's contiguous run
    b_arr = sched[1, :K]
    first = sched[2, :K].astype(bool)
    last = sched[3, :K].astype(bool)
    assert first[0] and last[-1]
    assert np.array_equal(first[1:], b_arr[1:] != b_arr[:-1])
    assert np.array_equal(last[:-1], first[1:])


def test_xxl_2d_bitexact_vs_xl(big_graph, monkeypatch):
    g = big_graph
    monkeypatch.setattr(xxl, "XXL_BS", 1024)
    cfg = sgd.derive_config_2d(g, iter_max=2, min_term_updates=3 * 1024)
    assert int(cfg.space) >= 1024
    c0 = init_layout(g, "d")
    ref = np.asarray(xl.path_sgd_2d_pallas_xl(g, c0, cfg, interpret=True))
    got = np.asarray(xxl.path_sgd_2d_pallas_xxl(g, c0, cfg, interpret=True))
    assert np.isfinite(got).all()
    np.testing.assert_array_equal(got, ref)
    assert np.abs(got - np.asarray(c0, np.float64)).max() > 1.0


def test_xxl_1d_bitexact_vs_xl(big_graph, monkeypatch):
    g = big_graph
    monkeypatch.setattr(xxl, "XXL_BS", 1024)
    cfg = sgd.derive_config_1d(g, iter_max=2, min_term_updates=3 * 1024)
    ref = np.asarray(xl.path_sgd_1d_pallas_xl(g, cfg, interpret=True))
    got = np.asarray(xxl.path_sgd_1d_pallas_xxl(g, cfg, interpret=True))
    assert np.isfinite(got).all()
    np.testing.assert_array_equal(got, ref)


def test_xxl_2d_multisegment_continuation(big_graph, monkeypatch):
    g = big_graph
    monkeypatch.setattr(xxl, "XXL_BS", 1024)
    cfg = sgd.derive_config_2d(g, iter_max=3, min_term_updates=3 * 1024)
    c0 = init_layout(g, "d")
    plan = ps.plan_run(g, cfg, one_d=False)
    assert plan["groups"] >= 3
    one = np.asarray(xxl.path_sgd_2d_pallas_xxl(g, c0, cfg, interpret=True))
    monkeypatch.setattr(
        ps, "MAX_CHUNKS", max(plan["cgs"], plan["groups"] * plan["cgs"] // 3)
    )
    assert len(ps._segments(plan["groups"], plan["cgs"])) >= 2
    many = np.asarray(xxl.path_sgd_2d_pallas_xxl(g, c0, cfg, interpret=True))
    np.testing.assert_array_equal(many, one)


def test_xxl_dispatch_predicate_cpu(big_graph):
    import jax

    cfg = sgd.derive_config_2d(big_graph)
    assert jax.default_backend() == "cpu"
    assert not xxl.xxl_supported(big_graph, cfg)
