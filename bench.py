"""Headline benchmark: PG-SGD 2D layout of DRB1-3123 on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Metric: pair-updates/second for the full `odgi layout`-default workload on
DRB1-3123 (reference: test/DRB1-3123.gfa; 2D PG-SGD, iter_max=30,
min_term_updates=10*steps — src/subcommand/layout_main.cpp:198,252-266),
through the shipping dispatch (the fused Pallas strata kernel on TPU,
ops/pallas_sgd.py; XLA fallback elsewhere).

Extra fields in the same line:
  stress            converged sum_of_path_node_distances (2D/nt) — the
                    bench FAILS (asserts) if it exceeds 1.4; the reference
                    fixture DRB1-3123_unsorted.og.lay measures 1.2855
  wall_cold_s       first full run including compile
  wall_warm_s       median of 3 warm full runs
  sort_pairs_per_sec  the 1D `odgi sort -Y` default workload rate
  backend           jax backend that ran the bench

vs_baseline: ratio against 40e6 pair-updates/s, a charitable estimate of
the multithreaded CPU reference (16 Hogwild threads x ~2.5M updates/s;
the SC'24 A100 CUDA port reports 57.3x over that CPU baseline,
README.md:56, i.e. ~2.3e9; beating vs_baseline=57.3 beats the A100).
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from odgi_tpu.utils.env import enable_compilation_cache

enable_compilation_cache()

import jax
import numpy as np

import odgi_tpu
from odgi_tpu.algorithms import stats
from odgi_tpu.algorithms.layout import init_layout
from odgi_tpu.ops import sgd

CPU_BASELINE_PAIRS_PER_SEC = 40e6
STRESS_BAR = 1.4


def main():
    g = odgi_tpu.parse_gfa("/root/reference/test/DRB1-3123.gfa")
    cfg = sgd.derive_config_2d(g)
    coords0 = init_layout(g, "d")

    # how many pairs the shipping path actually runs
    from odgi_tpu.ops import pallas_sgd

    use_pallas = cfg.pallas and pallas_sgd.pallas_supported(g, cfg)
    if use_pallas:
        nch = int(np.clip(cfg.batch_size // pallas_sgd.CHUNK, 1, 64))
        nb = pallas_sgd._num_batches(cfg, nch)
        total_pairs = cfg.iter_max * nb * nch * pallas_sgd.CHUNK
    else:
        total_pairs = cfg.iter_max * cfg.num_batches * cfg.batch_size

    t0 = time.time()
    out = sgd.path_sgd_2d(g, coords0, cfg)
    wall_cold = time.time() - t0

    times = []
    for _ in range(3):
        t0 = time.time()
        out = sgd.path_sgd_2d(g, coords0, cfg)
        times.append(time.time() - t0)
    wall_warm = float(np.median(times))
    pairs_per_sec = total_pairs / wall_warm

    # quality gate ON CHIP: a perf hack that destroys the layout fails here
    c = np.asarray(out, np.float64).reshape(-1, 2)
    r = stats.sum_of_path_node_distances(g, (c[:, 0], c[:, 1]))
    stress = float(r.all_2d_by_nucleotides)
    assert np.isfinite(c).all(), "layout produced non-finite coords"
    assert stress <= STRESS_BAR, (
        f"converged stress {stress:.4f} exceeds the {STRESS_BAR} bar "
        f"(fixture: 1.2855) — quality regression"
    )

    # secondary: the 1D sort default workload, with its own quality gate
    # (fixture DRB1-3123_sorted.og measures 4.952 nt-space distance)
    from odgi_tpu.algorithms.path_sgd_sort import order_from_x

    cfg1 = sgd.derive_config_1d(g)
    x1 = sgd.path_sgd_1d(g, cfg1)  # compile
    t0 = time.time()
    x1 = sgd.path_sgd_1d(g, cfg1)
    sort_wall = time.time() - t0
    from odgi_tpu.ops import pallas_sgd as _ps

    if cfg1.pallas and _ps.pallas_supported_1d(g, cfg1):
        nch1 = int(np.clip(cfg1.batch_size // _ps.CHUNK, 1, 64))
        nb1 = _ps._num_batches(cfg1, nch1)
        sort_pairs = cfg1.iter_max * nb1 * nch1 * _ps.CHUNK
    else:
        sort_pairs = cfg1.iter_max * cfg1.num_batches * cfg1.batch_size
    sort_rate = sort_pairs / sort_wall
    g_sorted = g.apply_ordering(order_from_x(g, x1))
    sort_dist = float(stats.sum_of_path_node_distances(g_sorted).all_nt_space)
    assert sort_dist <= 4.952, (
        f"1D sort nt-distance {sort_dist:.3f} exceeds the reference "
        f"fixture (4.952) — sort quality regression"
    )

    print(
        json.dumps(
            {
                "metric": "pgsgd_2d_pair_updates_per_sec_drb1",
                "value": round(pairs_per_sec),
                "unit": "pairs/s",
                "vs_baseline": round(
                    pairs_per_sec / CPU_BASELINE_PAIRS_PER_SEC, 3
                ),
                "stress": round(stress, 4),
                "wall_cold_s": round(wall_cold, 3),
                "wall_warm_s": round(wall_warm, 3),
                "sort_pairs_per_sec": round(sort_rate),
                "sort_dist": round(sort_dist, 4),
                "pallas": bool(use_pallas),
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
