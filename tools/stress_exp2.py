"""Bisect the JAX 2D layout quality bug: run variants, print stress."""

import sys

sys.path.insert(0, "/root/repo")
import numpy as np

import odgi_tpu
from odgi_tpu.algorithms.layout import init_layout
from odgi_tpu.algorithms.stats import sum_of_path_node_distances
from odgi_tpu.ops import sgd

GFA = "/root/reference/test/DRB1-3123_unsorted.gfa"


def stress(g, coords):
    c = np.asarray(coords, np.float64).reshape(-1, 2)
    r = sum_of_path_node_distances(g, (c[:, 0], c[:, 1]))
    return r.all_2d_by_nucleotides


def main():
    g = odgi_tpu.parse_gfa(GFA)
    coords0 = init_layout(g, "d")
    variants = [
        ("default", {}),
        ("threefry", dict(rng_impl="threefry2x32")),
        ("no-mxu", dict(mxu_coords=False, mxu_tables=False)),
        ("batch-2048", dict(batch_size=2048)),
        ("threefry+no-mxu", dict(rng_impl="threefry2x32", mxu_coords=False, mxu_tables=False)),
    ]
    for name, over in variants:
        cfg = sgd.derive_config_2d(g, **over)
        out = sgd.path_sgd_2d(g, coords0, cfg)
        print(f"jax {name:<18} batch={cfg.batch_size} nb={cfg.num_batches} stress: {stress(g, out):.4f}", flush=True)


if __name__ == "__main__":
    main()
