"""Headline benchmark: PG-SGD on the reference test graphs, one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Headline metric: VALID pair-updates/second for the full `odgi layout`
default workload on DRB1-3123 (reference: test/DRB1-3123.gfa; 2D PG-SGD,
iter_max=30, min_term_updates=10*steps — layout_main.cpp:198,252-266),
through the shipping dispatch (the fused Pallas replica kernel on TPU,
ops/pallas_sgd.py; XLA fallback elsewhere).

Accounting is honest (round-4 change): window pairs that cross a path
boundary are masked no-ops in the strata kernel, so the chunk count is
compensated upward until VALID updates meet the reference's
min_term_updates contract (ops/pallas_sgd.py:plan_run), and the reported
rate counts ONLY valid updates.  `slots_per_sec` is the raw lane rate.
Geometry and counts come from pallas_sgd.pairs_per_run — the same code
path the dispatcher executes, so the two cannot diverge.

Wall-clock caveat: in this environment the TPU sits behind the axon
relay, whose per-call result-fetch round trip is tens of ms (reported as
`rtt_s`, measured by fetching a ready 32-byte array).  The wall rates
include it; on a directly-attached chip the sync cost is microseconds.

Scenarios: DRB1-3123, chr6.C4 and LPA (all pallas-eligible), each with a
chip-side quality gate:
  2D: converged sum_of_path_node_distances (2D/nt) must beat a pinned
      bar (DRB1 1.4 vs fixture 1.2855; chr6/LPA pinned from measured
      converged values + ~10% headroom).
  1D: nt-space distance after applying the sort order (DRB1 bar 4.952 =
      the reference's sorted fixture).

vs_baseline: ratio against 40e6 pair-updates/s, a charitable estimate of
the multithreaded CPU reference (16 Hogwild threads x ~2.5M updates/s;
the SC'24 A100 CUDA port reports 57.3x over that CPU baseline,
README.md:56, i.e. ~2.3e9; beating vs_baseline=57.3 beats the A100).
"""

import json
import sys
import time

try:
    import odgi_tpu  # installed (pip install -e .)
except ImportError:  # fresh checkout without install
    sys.path.insert(0, "/root/repo")
    import odgi_tpu

from odgi_tpu.utils.env import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from odgi_tpu.algorithms import stats
from odgi_tpu.algorithms.layout import init_layout
from odgi_tpu.algorithms.path_sgd_sort import order_from_x
from odgi_tpu.ops import pallas_sgd, sgd

CPU_BASELINE_PAIRS_PER_SEC = 40e6
TEST_DIR = "/root/reference/test"
STRESS_BARS_2D = {"DRB1-3123": 1.4, "chr6.C4": 2.2, "LPA": 2.1}
DIST_BARS_1D = {"DRB1-3123": 4.952, "chr6.C4": 4.7, "LPA": 3.1}


def device_seconds(fn) -> float:
    """Device-only execution time of fn()'s dispatches, via a
    jax.profiler trace (the wall numbers include the axon relay's
    ~25-30ms per-dispatch round trip; on a directly-attached chip wall
    ~= device)."""
    import collections
    import glob
    import gzip
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        with jax.profiler.trace(d):
            fn()
        total = 0.0
        for f in glob.glob(d + "/**/*.trace.json.gz", recursive=True):
            with gzip.open(f) as fh:
                tr = json.load(fh)
            ev = tr.get("traceEvents", [])
            pids = {
                e["pid"]: e["args"].get("name", "")
                for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
            }
            for e in ev:
                if (
                    e.get("ph") == "X"
                    and "TPU" in str(pids.get(e.get("pid"), ""))
                    and str(e.get("name", "")).startswith("jit_")
                ):
                    total += e.get("dur", 0)
    return total / 1e6


def measure_rtt() -> float:
    x = jnp.ones(8)
    x.block_until_ready()
    ts = []
    for _ in range(5):
        t0 = time.time()
        np.asarray(x)
        ts.append(time.time() - t0)
    return float(np.median(ts))


def bench_graph(name: str):
    g = odgi_tpu.parse_gfa(f"{TEST_DIR}/{name}.gfa")
    out = {}

    cfg2 = sgd.derive_config_2d(g)
    use_pallas = cfg2.pallas and pallas_sgd.pallas_supported(g, cfg2)
    out["pallas"] = bool(use_pallas)
    coords0 = init_layout(g, "d")
    if use_pallas:
        acct = pallas_sgd.pairs_per_run(g, cfg2)
        slots, valid = acct["slots"], acct["valid"]
    else:
        slots = valid = cfg2.iter_max * cfg2.num_batches * cfg2.batch_size

    t0 = time.time()
    c = sgd.path_sgd_2d(g, coords0, cfg2)
    out["wall_cold_s"] = round(time.time() - t0, 3)
    walls = []
    for _ in range(9):
        t0 = time.time()
        c = sgd.path_sgd_2d(g, coords0, cfg2)
        walls.append(time.time() - t0)
    # the axon relay adds a noisy ~25-30ms sync per dispatch (±15%
    # run-to-run); the median over 9 runs keeps the headline stable
    warm = float(np.median(walls))
    out["wall_warm_s"] = round(warm, 4)
    out["slots_per_sec"] = round(slots / warm)
    out["valid_pairs_per_sec"] = round(valid / warm)
    out["valid_frac"] = round(valid / max(slots, 1), 4)
    try:
        dev = device_seconds(lambda: sgd.path_sgd_2d(g, coords0, cfg2))
        if dev > 0:
            out["device_s"] = round(dev, 4)
            out["device_valid_pairs_per_sec"] = round(valid / dev)
    except Exception:
        pass

    c = np.asarray(c, np.float64).reshape(-1, 2)
    assert np.isfinite(c).all(), f"{name}: non-finite layout coords"
    s = float(
        stats.sum_of_path_node_distances(g, (c[:, 0], c[:, 1])).all_2d_by_nucleotides
    )
    out["stress"] = round(s, 4)
    bar = STRESS_BARS_2D[name]
    assert s <= bar, (
        f"{name}: converged 2D stress {s:.4f} exceeds the {bar} bar — "
        f"quality regression"
    )

    cfg1 = sgd.derive_config_1d(g)
    if cfg1.pallas and pallas_sgd.pallas_supported_1d(g, cfg1):
        acct1 = pallas_sgd.pairs_per_run(g, cfg1, one_d=True)
        valid1 = acct1["valid"]
    else:
        valid1 = cfg1.iter_max * cfg1.num_batches * cfg1.batch_size
    x1 = sgd.path_sgd_1d(g, cfg1)  # compile
    t0 = time.time()
    x1 = sgd.path_sgd_1d(g, cfg1)
    sort_wall = time.time() - t0
    out["sort_valid_pairs_per_sec"] = round(valid1 / sort_wall)
    g2 = g.apply_ordering(order_from_x(g, x1))
    d = float(stats.sum_of_path_node_distances(g2).all_nt_space)
    out["sort_dist"] = round(d, 4)
    bar1 = DIST_BARS_1D[name]
    assert d <= bar1, (
        f"{name}: 1D sort nt-distance {d:.4f} exceeds the {bar1} bar — "
        f"sort quality regression"
    )
    return out


def bench_untangle_lpa():
    """All-vs-all untangle on LPA (round-4 verdict #9): wall seconds +
    output digest (byte-level correctness vs the reference is pinned by
    tests/test_golden_untangle.py on the golden fixture)."""
    import hashlib
    import io

    from odgi_tpu.algorithms.untangle import untangle

    g = odgi_tpu.parse_gfa(f"{TEST_DIR}/LPA.gfa")
    paths = list(range(g.num_paths))
    buf = io.StringIO()
    t0 = time.time()
    untangle(g, queries=paths, targets=paths, out=buf)
    dt = time.time() - t0
    sha = hashlib.sha256(buf.getvalue().encode()).hexdigest()[:16]
    return round(dt, 3), sha


def main():
    rtt = measure_rtt()
    graphs = {}
    for name in ("DRB1-3123", "chr6.C4", "LPA"):
        graphs[name] = bench_graph(name)
    unt_s, unt_sha = bench_untangle_lpa()

    drb = graphs["DRB1-3123"]
    rate = drb["valid_pairs_per_sec"]
    print(
        json.dumps(
            {
                "metric": "pgsgd_2d_valid_pair_updates_per_sec_drb1",
                "value": rate,
                "unit": "pairs/s",
                "vs_baseline": round(rate / CPU_BASELINE_PAIRS_PER_SEC, 3),
                # same ratio on profiler-measured device-only time (the
                # wall number carries this environment's ~25-30ms relay
                # sync per dispatch; a directly-attached chip would not)
                "vs_baseline_device": (
                    round(
                        drb["device_valid_pairs_per_sec"]
                        / CPU_BASELINE_PAIRS_PER_SEC,
                        3,
                    )
                    if drb.get("device_valid_pairs_per_sec")
                    else None
                ),
                "stress": drb["stress"],
                "wall_cold_s": drb["wall_cold_s"],
                "wall_warm_s": drb["wall_warm_s"],
                "device_s": drb.get("device_s"),
                "device_pairs_per_sec": drb.get(
                    "device_valid_pairs_per_sec"
                ),
                "sort_pairs_per_sec": drb["sort_valid_pairs_per_sec"],
                "sort_dist": drb["sort_dist"],
                "pallas": drb["pallas"],
                "backend": jax.default_backend(),
                "rtt_s": round(rtt, 4),
                "untangle_lpa_s": unt_s,
                "untangle_lpa_sha": unt_sha,
                "graphs": graphs,
            }
        )
    )


if __name__ == "__main__":
    main()
