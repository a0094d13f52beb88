"""Chromosome-scale Pallas PG-SGD check (round-3 verdict #4).

Builds a synthetic pangenome-shaped graph with >= 5M steps (deep path
coverage over ~10k nodes — the step:node ratio of real chromosome
pangenomes), runs the fused Pallas path and the XLA fallback on the SAME
graph, and reports both rates.  Done-criterion: the Pallas path runs
(pallas_supported == True at this scale — v5e's ~128MB VMEM holds the
step planes resident; see ops/pallas_sgd.py VMEM_BUDGET) and beats the
fallback's pair rate.

Usage: python tools/bigscale_bench.py [--steps 5200000] [--nodes 10000]
Prints one JSON line per configuration.
"""

import argparse
import json
import os
import sys
import time

try:
    import odgi_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from odgi_tpu.utils.env import enable_compilation_cache

enable_compilation_cache()

import numpy as np

from odgi_tpu.core.graph import GraphTensors


def synth_graph(num_steps: int, num_nodes: int, path_steps: int,
                seed: int = 11) -> GraphTensors:
    """Deep-coverage synthetic graph: P paths of `path_steps` steps each
    random-walking over `num_nodes` 1bp nodes with mixed orientations
    (node_len=1 keeps nucleotide positions == step ranks, bounding the
    Zipf space and the position-plane width)."""
    rng = np.random.default_rng(seed)
    P = -(-num_steps // path_steps)
    S = P * path_steps
    node_len = np.ones(num_nodes, np.int64)
    seq_offset = np.arange(num_nodes + 1, dtype=np.int64)
    seq = np.full(num_nodes, ord("A"), np.uint8)
    node_id = np.arange(1, num_nodes + 1, dtype=np.int64)

    # near-monotone walk per path (real haplotypes traverse a sorted
    # graph mostly forward with occasional stalls/backtracks); each path
    # spans the full node range so deep coverage stays pangenome-shaped.
    # Works for any node:step ratio (chromosome graphs have ~1 step/node
    # per haplotype; deep-coverage pangenomes have hundreds).
    adv = num_nodes / path_steps
    base = int(adv)
    frac = adv - base
    steps = base + (rng.random(S) < frac).astype(np.int64)
    # ~5% stall/backtrack noise, mean-compensated so paths still span
    # the whole range
    noise = rng.choice([0, 1, -1], size=S, p=[0.95, 0.025, 0.025])
    steps = (steps + noise).reshape(P, path_steps)
    steps[:, 0] = 0
    node = np.clip(np.cumsum(steps, axis=1), 0, num_nodes - 1).reshape(-1)
    orient = rng.integers(0, 2, S)
    step_handle = (node << 1) | orient
    path_offset = np.arange(P + 1, dtype=np.int64) * path_steps
    step_pos = np.tile(np.arange(path_steps, dtype=np.int64), P)

    # edges: consecutive distinct nodes (canonicalized, deduped)
    a = step_handle[:-1].copy()
    b = step_handle[1:].copy()
    keep = (np.arange(1, S) % path_steps) != 0
    a, b = a[keep], b[keep]
    e = np.unique(np.stack([np.minimum(a, b), np.maximum(a, b)], 1), axis=0)

    return GraphTensors(
        node_len=node_len,
        seq_offset=seq_offset,
        seq=seq,
        node_id=node_id,
        edge_from=e[:, 0],
        edge_to=e[:, 1],
        path_names=tuple(f"p{i}" for i in range(P)),
        path_circular=np.zeros(P, bool),
        path_offset=path_offset,
        step_handle=step_handle,
        step_pos=step_pos,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5_200_000)
    ap.add_argument("--nodes", type=int, default=10_000)
    ap.add_argument("--path-steps", type=int, default=50_000)
    ap.add_argument("--iters", type=int, default=3,
                    help="iterations for the rate measurement (full "
                         "schedules take minutes at this scale)")
    ap.add_argument("--dim", type=int, default=1, choices=(1, 2))
    ap.add_argument("--no-xla", action="store_true",
                    help="skip the XLA fallback comparison (it takes "
                         "hours at million-node scale)")
    ap.add_argument("--quality", action="store_true",
                    help="report 1D nt-distance before/after")
    ap.add_argument("--shuffle", action="store_true",
                    help="random-permute node ids before the run (the "
                         "synthetic walk is generated near-sorted; a "
                         "sort demo must start unsorted)")
    args = ap.parse_args()

    import jax

    from odgi_tpu.ops import pallas_sgd as ps
    from odgi_tpu.ops import sgd

    g = synth_graph(args.steps, args.nodes, args.path_steps)
    if args.shuffle:
        perm = np.random.default_rng(5).permutation(g.num_nodes)
        g = g.apply_ordering(perm)
    print(json.dumps({"graph": "synthetic", "nodes": g.num_nodes,
                      "steps": g.num_steps, "paths": g.num_paths}),
          flush=True)

    from odgi_tpu.ops import pallas_sgd_xl as xl
    from odgi_tpu.ops import pallas_sgd_xxl as xxl

    one_d = args.dim == 1
    derive = sgd.derive_config_1d if one_d else sgd.derive_config_2d
    cfg = derive(g, iter_max=args.iters)
    resident = (ps.pallas_supported_1d if one_d else ps.pallas_supported)(
        g, cfg
    )
    xl_ok = (xl.xl_supported_1d if one_d else xl.xl_supported)(g, cfg)
    xxl_ok = (xxl.xxl_supported_1d if one_d else xxl.xxl_supported)(g, cfg)
    streaming = (not resident) and xl_ok
    big_n = (not resident) and (not xl_ok) and xxl_ok
    sup = resident or streaming or big_n
    out = {"dim": args.dim, "iters": args.iters,
           "pallas_supported": bool(sup),
           "pallas_variant": "resident" if resident else
           ("streaming" if streaming else
            ("block-merge" if big_n else None)),
           "backend": jax.default_backend()}
    if one_d:
        if big_n:
            run_pallas = lambda: xxl.path_sgd_1d_pallas_xxl(
                g, cfg, interpret=False)
        elif streaming:
            run_pallas = lambda: xl.path_sgd_1d_pallas_xl(g, cfg)
        else:
            run_pallas = lambda: ps.path_sgd_1d_pallas(g, cfg,
                                                       interpret=False)
        run_xla = lambda c: sgd.path_sgd_1d(g, c)
    else:
        from odgi_tpu.algorithms.layout import init_layout

        c0 = init_layout(g, "d")
        if big_n:
            run_pallas = lambda: xxl.path_sgd_2d_pallas_xxl(
                g, c0, cfg, interpret=False)
        elif streaming:
            run_pallas = lambda: xl.path_sgd_2d_pallas_xl(g, c0, cfg)
        else:
            run_pallas = lambda: ps.path_sgd_2d_pallas(g, c0, cfg,
                                                       interpret=False)
        run_xla = lambda c: sgd.path_sgd_2d(g, c0, c)
    if sup:
        p = ps.plan_run(g, cfg, one_d=one_d)
        t0 = time.time()
        x = run_pallas()
        out["pallas_cold_s"] = round(time.time() - t0, 1)
        t0 = time.time()
        x = run_pallas()
        dt = time.time() - t0
        out["pallas_wall_s"] = round(dt, 2)
        out["pallas_valid_pairs_per_sec"] = round(p["total_valid"] / dt)
        out["finite"] = bool(np.isfinite(np.asarray(x)).all())
        if args.quality:
            from odgi_tpu.algorithms import stats

            if one_d:
                # sort-quality gate: nt-space distance must improve vs
                # the input order
                from odgi_tpu.algorithms.path_sgd_sort import order_from_x

                g2 = g.apply_ordering(order_from_x(g, np.asarray(x)))
                d0 = float(stats.sum_of_path_node_distances(g).all_nt_space)
                d1 = float(stats.sum_of_path_node_distances(g2).all_nt_space)
                out["nt_dist_before"] = round(d0, 4)
                out["nt_dist_after"] = round(d1, 4)
            else:
                c = np.asarray(x, np.float64).reshape(-1, 2)
                c00 = np.asarray(c0, np.float64).reshape(-1, 2)
                s0 = float(stats.sum_of_path_node_distances(
                    g, (c00[:, 0], c00[:, 1])).all_2d_by_nucleotides)
                s1 = float(stats.sum_of_path_node_distances(
                    g, (c[:, 0], c[:, 1])).all_2d_by_nucleotides)
                out["stress_before"] = round(s0, 4)
                out["stress_after"] = round(s1, 4)

    if args.no_xla:
        print(json.dumps(out), flush=True)
        return

    cfgf = derive(g, iter_max=args.iters, pallas=False)
    t0 = time.time()
    xf = run_xla(cfgf)
    out["xla_cold_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    xf = run_xla(cfgf)
    dtf = time.time() - t0
    pairs_f = cfgf.iter_max * cfgf.num_batches * cfgf.batch_size
    out["xla_wall_s"] = round(dtf, 2)
    out["xla_pairs_per_sec"] = round(pairs_f / dtf)
    if sup:
        out["speedup_vs_xla"] = round(
            out["pallas_valid_pairs_per_sec"] / out["xla_pairs_per_sec"], 2
        )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
