"""Multi-device scaling-efficiency harness on chr6.C4 (BASELINE target:
>=70% pair-updates/s efficiency from 1 to 4 hosts).

Runs the sharded 2D PG-SGD layout at 1/2/4/8 devices and reports
pairs/s + efficiency vs the single-device rate.  On this machine it runs
over virtual CPU devices (no multi-chip hardware; the mesh/collective
code paths are identical); on a real pod slice the same script measures
true ICI scaling.

Usage: python tools/scaling_chr6.py [--graph PATH] [--devices 1,2,4,8]
Prints one JSON line per device count.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graph", default="/root/reference/test/chr6.C4.gfa")
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--iter-max", type=int, default=5)
    ap.add_argument("--batch-size", type=int, default=4096)
    ap.add_argument("--real-devices", action="store_true",
                    help="use the actual backend devices (e.g. a pod "
                    "slice) instead of forcing the virtual CPU mesh")
    args = ap.parse_args()
    counts = [int(c) for c in args.devices.split(",")]

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={max(counts)}"
        ).strip()
    import jax

    if not args.real_devices:
        # must run before any backend query: the environment pins
        # JAX_PLATFORMS=axon (one tunneled chip)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    import odgi_tpu
    from odgi_tpu.ops import sgd
    from odgi_tpu.algorithms.layout import init_layout
    from odgi_tpu.parallel.sharded import make_sharded_sgd_2d

    g = odgi_tpu.parse_gfa(args.graph)
    if not g.is_optimized():
        g = g.optimize()
    cfg = sgd.derive_config_2d(
        g, iter_max=args.iter_max, batch_size=args.batch_size
    )
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
    coords0 = init_layout(g, "d").astype(np.float32)
    key = jax.random.key(cfg.seed, impl=cfg.rng_impl)

    base_rate = None
    for n in counts:
        devices = jax.devices()[:n]
        if len(devices) < n:
            print(json.dumps({"devices": n, "error": "not enough devices"}))
            continue
        mesh = Mesh(np.array(devices), ("data",))
        fn = make_sharded_sgd_2d(mesh, cfg, cfg.num_batches)
        c = jnp.asarray(coords0)
        out = fn(c, key, etas, data)
        out.block_until_ready()  # compile + warm
        t0 = time.time()
        out = fn(jnp.asarray(coords0), key, etas, data)
        out.block_until_ready()
        dt = time.time() - t0
        pairs = cfg.iter_max * cfg.num_batches * cfg.batch_size * n
        rate = pairs / dt
        if base_rate is None:
            base_rate = rate / n  # per-device rate at the first count
        eff = rate / (base_rate * n)  # efficiency vs linear scaling
        backend = jax.default_backend()
        print(
            json.dumps(
                {
                    "graph": os.path.basename(args.graph),
                    "devices": n,
                    "pairs_per_sec": round(rate),
                    "wall_s": round(dt, 3),
                    "scaling_efficiency": round(eff, 3),
                    # virtual devices TIME-SHARE the physical cores:
                    # compute-bound efficiency cannot exceed
                    # cores/devices on this host, so also report
                    # efficiency against that achievable ceiling
                    "core_ceiling": round(
                        min(1.0, (os.cpu_count() or 1) / n), 3
                    ),
                    "efficiency_vs_ceiling": round(
                        eff / min(1.0, (os.cpu_count() or 1) / n), 3
                    ),
                    "backend": backend,
                    "host_cores": os.cpu_count(),
                    # virtual CPU devices share the host cores, so wall
                    # time necessarily grows once devices > cores: these
                    # numbers validate the mesh/collective CODE PATHS,
                    # not ICI scaling (which needs a real pod slice)
                    "measures_ici": backend not in ("cpu",),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
