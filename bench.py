"""Headline benchmark: PG-SGD 2D layout of DRB1-3123 on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: pair-updates/second for the full `odgi layout`-default workload on
DRB1-3123 (reference: test/DRB1-3123.gfa; 2D PG-SGD, iter_max=30,
min_term_updates=10*steps — src/subcommand/layout_main.cpp:198,252-266).

vs_baseline: ratio against 40e6 pair-updates/s, a charitable estimate of
the multithreaded CPU reference (16 Hogwild threads x ~2.5M updates/s;
the SC'24 A100 CUDA port reports 57.3x over that CPU baseline, README.md:56,
i.e. ~2.3e9; beating vs_baseline=57.3 means beating the A100 number).
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from odgi_tpu.utils.env import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

import odgi_tpu
from odgi_tpu.algorithms.layout import init_layout
from odgi_tpu.ops import sgd

CPU_BASELINE_PAIRS_PER_SEC = 40e6


def main():
    g = odgi_tpu.parse_gfa("/root/reference/test/DRB1-3123.gfa")
    cfg = sgd.derive_config_2d(g)
    data = sgd.SgdData.build(
        g, cfg.theta, cfg.space, cfg.space_max, cfg.space_quantization_step
    )
    etas = jnp.asarray(
        sgd.sgd_schedule(
            1.0 / cfg.eta_max, 1.0, cfg.iter_max,
            cfg.iter_with_max_learning_rate, cfg.eps,
        ),
        jnp.float32,
    )
    key = jax.random.key(cfg.seed, impl=cfg.rng_impl)
    coords0 = init_layout(g, "d").astype(np.float32)

    # compile (cached across runs); np.asarray forces a device->host copy —
    # block_until_ready alone has proven unreliable on the axon platform
    out = sgd.sgd_2d_run(jnp.asarray(coords0), key, etas, data, cfg, cfg.num_batches)
    np.asarray(out)

    # timed runs
    times = []
    for _ in range(3):
        c = jnp.asarray(coords0)
        t0 = time.time()
        out = sgd.sgd_2d_run(c, key, etas, data, cfg, cfg.num_batches)
        np.asarray(out)
        times.append(time.time() - t0)
    dt = float(np.median(times))
    total_pairs = cfg.num_batches * cfg.batch_size * cfg.iter_max
    pairs_per_sec = total_pairs / dt
    assert bool(jnp.isfinite(out).all()), "layout produced non-finite coords"

    print(
        json.dumps(
            {
                "metric": "pgsgd_2d_pair_updates_per_sec_drb1",
                "value": round(pairs_per_sec),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_sec / CPU_BASELINE_PAIRS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
