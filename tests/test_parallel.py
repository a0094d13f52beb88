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
