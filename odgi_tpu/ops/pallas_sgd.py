"""Fused Pallas TPU kernel for the PG-SGD layout/sort hot loop.

Round-4 architecture: **O(1) work per pair** via per-step coordinate
replicas.  The round-3 kernel routed every gather/scatter through dense
one-hot matmuls whose cost was O(num_nodes) per pair (an architecture that
measured 99.6M pairs/s — 4% of the A100-equivalent target).  This kernel
removes the per-pair one-hots entirely:

- **Coordinates are replicated per step slot** in VMEM planes laid out in
  step order (`cp`), so the strata-window pair gather is a contiguous
  dynamic-slice read and the pair update is a contiguous dynamic-slice
  read-modify-write — a handful of VPU ops per pair, independent of graph
  size.  This is the TPU answer to the CUDA port's O(1) random access
  (reference: src/cuda/layout.cu:141-188 — 2 random reads + 4 atomic
  writes per pair): the TPU has no fast random access, so the random
  access is designed out instead.
- **A `base` plane snapshot** holds each replica's value at the last
  consensus, so `cp - base` is exactly the per-slot accumulated delta.
  Within a merge group the slot's replica compounds its own updates
  sequentially (fresh local reads — the Hogwild analog of the reference's
  racing threads, path_sgd.cpp:367-375), while different replicas of the
  same node evolve independently like Hogwild workers.
- **Consensus merge once per merge group** (default: one iteration, the
  CUDA port's kernel-launch granularity, layout.cu:442-447): per node
  endpoint, X += sum_over_steps(cp - base) / R with R = the node's static
  step count — the mean over replica trajectories.  The merge rides the
  MXU as factored one-hot matmuls over the *step table* (amortized over
  the whole group's pairs, not per pair), then broadcasts the update back
  into `cp` and `base`.  Round 5: node planes are transposed (nl, 128),
  per-tile cyclic hi WINDOWS (host-computed) bound the one-hot width on
  long-path graphs, both passes share one forward lane one-hot (reverse
  endpoints fold via an exact lane-xor permutation of the small
  accumulator), and eta resolves per chunk from the per-iteration table
  so merge groups may span iterations (env ODGI_TPU_PALLAS_IPM;
  measured to degrade DRB1 convergence past its gate at K>=2, so the
  default stays one iteration per merge).

Sampling is unchanged from round 3 (validated against the reference's
semantics): each CHUNK of RC*128 pairs (4096 at the default RC=32 —
measured faster AND better-converged than smaller chunks on every
reference graph) shares ONE jump distance D drawn
from the quantized-zeta Zipf distribution (reference: path_sgd.cpp:
124-138; closed-form inverse as in cuda_rnd_zipf, layout.cu:89-113) or
uniform pre-cooling (path_sgd.cpp:274-279); the pairs are
(step[o+i], step[o+i+D]) for a random 128-aligned window offset o, so
both sides are contiguous VMEM slices (the partner side is a lane-rotate
by D mod 128).  Pairs crossing a path boundary are masked invalid; the
surviving conditional distribution of D equals the reference's
end-clamped Zipf (truncation and renormalization commute).

Numerics contract (honest version of the round-3 claims): pair gathers
and pair updates are exact f32 (direct VMEM reads/writes — no bf16
anywhere on the hot path).  Positions are i32 and differenced in i32, so
term distances are exact for positions up to 2^31 (the round-3 2^24 cap
is gone).  The consensus merge folds the per-slot delta sums and the
broadcast update through single-pass bf16 matmuls: both operands are
*small deltas*, so the 2^-8 relative rounding is zero-mean noise on the
order of 1e-2 of one update step — measured stress-neutral (bench.py
gates).  Node coordinates themselves accumulate in exact f32.

RNG contract: chunk scalars (window o, jump D, learning rate eta) from
numpy Philox(cfg.seed) on the host, prefetched to SMEM; per-pair endpoint
coins from a splitmix-style hash of the GLOBAL chunk index (passed as
data, so segmented dispatches share one compiled kernel and one coin
stream — results are independent of segmentation).  Deterministic for a
fixed config (the reference's Hogwild threads are nondeterministic
anyway; only converged stress is comparable — path_sgd.cpp:208-209).

Update math is identical to ops/sgd.py (reference: src/cuda/layout.cu:
141-188): mu = min(eta/d, 1); Delta = mu*(mag - d)/2; head/tail endpoint
choice with orientation fix-up (layout.cu:251-281); the learning-rate
schedule is the exact closed form of path_linear_sgd_schedule (reference:
path_sgd.cpp:466-501), evaluated on the host into the per-chunk eta
array.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .zipf import zeta_eta_table

LANE = 128
RC = int(os.environ.get("ODGI_TPU_PALLAS_RC", "32"))  # sublane rows per chunk
# (32 measured fastest with every quality gate green: DRB1 stress 1.2497 /
# sort 3.31 at -14% wall vs RC=8's 1.2643/3.62; larger chunks amortize
# per-chunk dispatch overhead, and the strata window is still 4096 of
# ~35k+ steps on the smallest reference graph)
CHUNK = RC * LANE      # pairs per chunk (one shared jump distance)
# Merge tile rows (TR*128 steps per consensus-merge tile).  Measured
# perf-neutral between 32 and 64 on chr6 (the merge is bound by real
# VPU/MXU work over the whole step table, not per-tile overhead); 32
# keeps transients small near the VMEM capacity ceiling.
TR = int(os.environ.get("ODGI_TPU_PALLAS_TR", "32"))
_POS, _POSEND, _HANDLE, _PATH = range(4)
_P1_POS, _P1_HANDLE, _P1_PATH = range(3)  # 1D planes (no pos_end)

# Max per-dispatch chunk count (bounds the VMEM (2, groups, cgs) scalar
# array); longer runs are split into segments at merge-group boundaries
# (same compiled kernel — the segment base rides a prefetched meta array,
# so the coin stream and the results are independent of the split).
MAX_CHUNKS = int(os.environ.get("ODGI_TPU_PALLAS_MAX_CHUNKS", "262144"))
# Max chunks per merge group: the group's (o, D) scalars are DMA-staged
# into an SMEM scratch per group; large SMEM residency collapses kernel
# throughput (measured ~3x cliff past ~40KB), so the staging buffer stays
# at 32KB (2 x 4096 x i32).  4096 keeps chr6/LPA-sized iterations in ONE
# merge group (the per-iteration consensus contract) — measured both
# faster (chr6 device 96 -> 56ms) and slightly better converged than the
# forced twice-per-iteration split at 2048.
MAX_CGS = int(os.environ.get("ODGI_TPU_PALLAS_MAX_CGS", "4096"))
# Merge groups per iteration (1 = consensus once per iteration, the CUDA
# launch granularity).  >1 merges more often (less replica staleness,
# more merge overhead).
MERGES_PER_ITER = int(os.environ.get("ODGI_TPU_PALLAS_MPI", "1"))
# Iterations per merge group in the RESIDENT kernels (consensus merges
# dominate device time on the reference graphs; spanning K iterations
# per merge cuts them K-fold).  Learning rates stay exact: eta is
# resolved PER CHUNK from the prefetched per-iteration table.  The
# effective K is clamped so a group's chunk scalars fit the SMEM
# staging cap and divides iter_max; delta>0 runs force K=1 (per-
# iteration early-stop checks).  Quality is gated by bench.py's
# converged-stress bars.
ITERS_PER_MERGE = int(os.environ.get("ODGI_TPU_PALLAS_IPM", "1"))
# VMEM budget for the resident planes (static + drift + base), bytes.
# v5e exposes ~128MB of VMEM (probed: 120MB scratch compiles and runs);
# 110MB leaves room for the node arrays, merge-tile transients and the
# chunk-scalar array.  1D fits ~5M steps resident, 2D ~2M.
VMEM_BUDGET = int(os.environ.get("ODGI_TPU_PALLAS_VMEM", str(110 * 1024 * 1024)))

_ABLATE = os.environ.get("ODGI_TPU_PALLAS_ABLATE", "")
_DATA_CACHE: dict = {}


def _pad_to(n: int, m: int) -> int:
    return -(-n // m) * m


def n_step_tiles(S: int) -> int:
    """Number of TR-row merge tiles covering S steps — the single
    source for the kernel grid/hb-array agreement (a kernel iterating
    more tiles than len(hb) would read SMEM out of bounds)."""
    return max(1, -(-(-(-S // LANE)) // TR))


# ---------------------------------------------------------------------------
# Static device-side data
# ---------------------------------------------------------------------------


def _tile_windows(hi: np.ndarray, S: int, nl: int) -> tuple:
    """Per-step-tile cyclic hi-window (base rows, width).

    The consensus merge's per-tile work is O(steps x nl) VPU traffic
    (measured dominant).  Steps in a tile touch a narrow band of node
    lanes on sorted graphs, so each tile gets a cyclic window
    [hb_t, hb_t + nl_w) mod nl covering all its hi values; nl_w is the
    max over tiles (8-aligned).  Window bases are 8-aligned so the
    windowed accumulator RMWs stay on sublane-friendly offsets."""
    tsz = TR * LANE
    n_tiles = n_step_tiles(S)
    hb = np.zeros(n_tiles, np.int32)
    width = np.zeros(n_tiles, np.int64)
    for t in range(n_tiles):
        h = np.unique(hi[t * tsz : min((t + 1) * tsz, S)])
        if len(h) == 0:
            width[t] = 1
            continue
        if len(h) == nl:
            hb[t] = 0
            width[t] = nl
            continue
        # largest circular gap between consecutive present values
        gaps = np.diff(np.concatenate([h, h[:1] + nl])) - 1
        k = int(np.argmax(gaps))
        start = int(h[(k + 1) % len(h)])  # first value after the gap
        base = (start // 8) * 8
        width[t] = ((int(h[k]) - base) % nl) + 1
        hb[t] = base
    nl_w = min(nl, _pad_to(max(int(width.max()), 1), 8))
    if nl_w >= nl:
        hb[:] = 0
        nl_w = nl
    return hb, nl_w


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["planes"],
    meta_fields=["num_steps", "n_blocks", "ch", "num_nodes", "space", "one_d"],
)
@dataclass(frozen=True)
class PallasSgdData:
    """Device-resident step planes for the strata kernel (pytree).

    planes: i32 (4, PR, 128) — [pos, pos_end, handle, path_id] in TRUE
        step order (row r lane l = step r*128+l) for 2D; (3, PR, 128) —
        [pos, handle, path_id] for 1D.  The tail region past S carries
        path_id = -1 so window portions past the end mask out via the same
        path compare that masks cross-path pairs, and handle = 2*num_nodes
        (a dummy node one past the real ids) so pad slots fold into a
        discarded accumulator row at merge time.  This flattening is the
        `element_array` model of the CUDA port (reference:
        src/cuda/layout.cu:345-410) minus its per-element path
        back-pointers, which the window construction makes redundant.

    ch: node-layout lane count NL — node/endpoint index idx maps to
        (sublane idx & 127, lane idx >> 7) of a (128, NL) array (2D packs
        x and y halves side by side as (128, 2*NL)).
    """

    planes: jnp.ndarray
    num_steps: int
    n_blocks: int   # valid 128-aligned window start blocks (= ceil(S/128))
    ch: int         # node-layout lanes NL (see above)
    num_nodes: int
    space: int
    one_d: bool = False

    @staticmethod
    def build_cached(g, space: int, one_d: bool = False) -> "PallasSgdData":
        """Per-(graph, space, dim) cache: GraphTensors are immutable, and
        the plane build + device transfer would otherwise be paid on every
        dispatch."""
        key = (id(g), space, RC, one_d)
        hit = _DATA_CACHE.get(key)
        if hit is not None and hit[0] is g:
            return hit[1]
        d = PallasSgdData.build(g, space, one_d)
        _DATA_CACHE[key] = (g, d)
        while len(_DATA_CACHE) > 4:
            _DATA_CACHE.pop(next(iter(_DATA_CACHE)))
        return d

    @staticmethod
    def build(g, space: int, one_d: bool = False) -> "PallasSgdData":
        S = g.num_steps
        handle = g.step_handle.astype(np.int64)
        node = handle >> 1
        pos = g.step_pos.astype(np.int64)
        path_id = g.step_path.astype(np.int64)

        pad = _pad_to(S + CHUNK + space + 4 * RC * LANE, TR * LANE)
        np_planes = 3 if one_d else 4
        pl4 = np.zeros((np_planes, pad), np.int32)
        if one_d:
            pl4[_P1_PATH] = -1
            pl4[_P1_HANDLE] = 2 * g.num_nodes
            pl4[_P1_POS, :S] = pos
            pl4[_P1_HANDLE, :S] = handle
            pl4[_P1_PATH, :S] = path_id
            idx_count = g.num_nodes + 1
        else:
            pl4[_PATH] = -1
            pl4[_HANDLE] = 2 * g.num_nodes
            pl4[_POS, :S] = pos
            pl4[_POSEND, :S] = pos + g.node_len[node]
            pl4[_HANDLE, :S] = handle
            pl4[_PATH, :S] = path_id
            idx_count = 2 * g.num_nodes + 2
        ch = _pad_to(max(-(-idx_count // LANE), 1), 8)
        return PallasSgdData(
            planes=jnp.asarray(pl4.reshape(np_planes, pad // LANE, LANE)),
            num_steps=S,
            n_blocks=max(1, -(-S // LANE)),
            ch=ch,
            num_nodes=g.num_nodes,
            space=space,
            one_d=one_d,
        )


# Node-layout packing helpers -----------------------------------------------


def coords_to_node_array(coords: np.ndarray, nl: int) -> np.ndarray:
    """(2N, 2) f32 -> (128, 2*NL) node array (x lanes 0:NL, y NL:2NL);
    endpoint idx at (idx & 127, idx >> 7)."""
    m = coords.shape[0]
    x = np.zeros(128 * nl, np.float32)
    y = np.zeros(128 * nl, np.float32)
    # flat layout: idx = lane * 128 + sublane  <=>  arr[idx & 127, idx >> 7]
    x[:m] = coords[:, 0]
    y[:m] = coords[:, 1]
    x = x.reshape(nl, 128).T  # (128, NL)
    y = y.reshape(nl, 128).T
    return np.concatenate([x, y], axis=1)


def node_array_to_coords(arr: np.ndarray, m: int, nl: int) -> np.ndarray:
    x = np.asarray(arr[:, :nl]).T.reshape(-1)[:m]
    y = np.asarray(arr[:, nl:]).T.reshape(-1)[:m]
    return np.stack([x, y], axis=1)


def x_to_node_array(x: np.ndarray, nl: int) -> np.ndarray:
    m = x.shape[0]
    buf = np.zeros(128 * nl, np.float32)
    buf[:m] = x
    return buf.reshape(nl, 128).T  # (128, NL)


def node_array_to_x(arr: np.ndarray, m: int) -> np.ndarray:
    return np.asarray(arr).T.reshape(-1)[:m]


# Transposed node-plane layout (round-5 windowed merge): endpoint idx ->
# (row idx >> 7, lane idx & 127) of an (NL, 128) plane.


def x_to_node_array_t(x: np.ndarray, nl: int) -> np.ndarray:
    m = x.shape[0]
    buf = np.zeros(nl * 128, np.float32)
    buf[:m] = x
    return buf.reshape(nl, 128)


def node_array_t_to_x(arr: np.ndarray, m: int) -> np.ndarray:
    return np.asarray(arr).reshape(-1)[:m]


def coords_to_node_planes_t(coords: np.ndarray, nl: int) -> np.ndarray:
    """(2N, 2) f32 -> (2, NL, 128) [x plane, y plane]."""
    c = np.asarray(coords, np.float32)
    return np.stack(
        [x_to_node_array_t(c[:, 0], nl), x_to_node_array_t(c[:, 1], nl)]
    )


def node_planes_t_to_coords(p2: np.ndarray, m: int) -> np.ndarray:
    x = np.asarray(p2[0]).reshape(-1)[:m]
    y = np.asarray(p2[1]).reshape(-1)[:m]
    return np.stack([x, y], axis=1)


def _recip_r_t(g, nl: int, one_d: bool) -> np.ndarray:
    """(NL, 128) static per-endpoint 1/R plane in transposed layout."""
    node = (g.step_handle >> 1).astype(np.int64)
    r = np.bincount(node, minlength=g.num_nodes).astype(np.float64)
    if one_d:
        idx_count = g.num_nodes
        rr = r
    else:
        idx_count = 2 * g.num_nodes
        rr = np.repeat(r, 2)
    buf = np.zeros(nl * 128, np.float32)
    with np.errstate(divide="ignore"):
        buf[:idx_count] = np.where(rr > 0, 1.0 / np.maximum(rr, 1), 0.0)
    return buf.reshape(nl, 128)


_WIN_CACHE: dict = {}


def _win_cached(g, one_d: bool, nl: int):
    """Cached (hb, nl_w) per-tile merge windows (see _tile_windows)."""
    key = (id(g), one_d, TR, nl)
    hit = _WIN_CACHE.get(key)
    if hit is not None and hit[0] is g:
        return hit[1]
    node = (g.step_handle >> 1).astype(np.int64)
    if one_d:
        hi = node >> 7
    else:
        hi = (2 * node + (g.step_handle & 1).astype(np.int64)) >> 7
    val = _tile_windows(hi, g.num_steps, nl)
    _WIN_CACHE[key] = (g, val)
    while len(_WIN_CACHE) > 8:
        _WIN_CACHE.pop(next(iter(_WIN_CACHE)))
    return val


def _recip_r(g, nl: int, one_d: bool) -> np.ndarray:
    """(128, NL) or (128, 2*NL) static 1/R divisor (R = per-node step
    count — the replica count feeding each endpoint's consensus mean).
    Zero rows for step-less nodes and the dummy pad node keep them
    frozen."""
    node = (g.step_handle >> 1).astype(np.int64)
    r = np.bincount(node, minlength=g.num_nodes).astype(np.float64)
    if one_d:
        idx_count = g.num_nodes
        rr = r
    else:
        idx_count = 2 * g.num_nodes
        rr = np.repeat(r, 2)
    buf = np.zeros(128 * nl, np.float32)
    with np.errstate(divide="ignore"):
        buf[:idx_count] = np.where(rr > 0, 1.0 / np.maximum(rr, 1), 0.0)
    out = buf.reshape(nl, 128).T  # (128, NL)
    if one_d:
        return out
    return np.concatenate([out, out], axis=1)


def _step_coord_planes(g, coords: np.ndarray) -> np.ndarray:
    """(2N,2) f32 -> (4, PR*128) f32 replica planes [xf, xr, yf, yr]:
    the coin-0 ("forward") replica holds endpoint 2*node + orient and the
    coin-1 replica its complement (the orientation fix-up of
    layout.cu:251-281 folded into the plane layout)."""
    S = g.num_steps
    node = (g.step_handle >> 1).astype(np.int64)
    orient = (g.step_handle & 1).astype(np.int64)
    epf = 2 * node + orient
    epr = epf ^ 1
    c = np.asarray(coords, np.float32)
    out = np.zeros((4, S), np.float32)
    out[0] = c[epf, 0]
    out[1] = c[epr, 0]
    out[2] = c[epf, 1]
    out[3] = c[epr, 1]
    return out


def _step_x_plane(g, x: np.ndarray) -> np.ndarray:
    S = g.num_steps
    node = (g.step_handle >> 1).astype(np.int64)
    return np.asarray(x, np.float32)[node][:S]


def _pad_planes(vals: np.ndarray, pr: int) -> np.ndarray:
    """(k, S) -> (k, PR, 128) zero-padded f32."""
    k, S = vals.shape
    buf = np.zeros((k, pr * LANE), np.float32)
    buf[:, :S] = vals
    return buf.reshape(k, pr, LANE)


# ---------------------------------------------------------------------------
# Host-side chunk scalars (window offset, jump distance, learning rate)
# ---------------------------------------------------------------------------


def _zeta_consts(cfg, space: int):
    """(zeta(space), eta(space)) from the same quantized table as the XLA
    path (bit-identical values; reference: path_sgd.cpp:124-138)."""
    ze = zeta_eta_table(
        space, cfg.space_max, cfg.space_quantization_step, cfg.theta
    )
    if space > cfg.space_max:
        zi = cfg.space_max + 1 + (space - cfg.space_max) // cfg.space_quantization_step
    else:
        zi = space
    zi = min(zi, len(ze) - 1)
    return float(ze[zi, 0]), float(ze[zi, 1])


def _eta_schedule(cfg) -> np.ndarray:
    """Per-iteration learning rate: the same path_linear_sgd_schedule the
    XLA path consumes (reference: path_sgd.cpp:466-501), truncated to the
    iter_max entries the kernel indexes."""
    from .sgd import sgd_schedule

    etas = sgd_schedule(
        1.0 / cfg.eta_max, 1.0, cfg.iter_max,
        cfg.iter_with_max_learning_rate, cfg.eps,
    )
    return np.asarray(etas[: cfg.iter_max], np.float32)


_SCALAR_CACHE: dict = {}


def _host_chunk_scalars(cfg, data: "PallasSgdData", nch: int,
                        num_batches: int, one_d: bool = False):
    """Precompute per-chunk (window block o, jump D, learning rate eta).

    Sampling semantics match the reference exactly: D is the dirtyzipf
    closed-form inverse over the quantized zeta table (reference:
    src/cuda/layout.cu:89-113, path_sgd.cpp:124-138) with probability 1/2
    before cooling, else uniform in [1, space); after cooling always Zipf
    (2D cools at iter >= first_cooling — layout_main.cpp via cooling_start;
    1D strictly after — path_sgd.cpp:194).

    `nch * num_batches` is the chunk count per ITERATION (the merge-group
    subdivision does not affect these streams)."""
    key = (cfg, data.n_blocks, int(data.space), nch, num_batches, one_d)
    hit = _SCALAR_CACHE.get(key)
    if hit is not None:
        return hit
    total = cfg.iter_max * num_batches * nch
    space = int(data.space)
    zeta_n, eta_z = _zeta_consts(cfg, space)
    alpha = 1.0 / (1.0 - cfg.theta)
    hp = 0.5 ** cfg.theta

    rng = np.random.Generator(np.random.Philox(int(cfg.seed) & 0x7FFFFFFF))
    u = rng.random((3, total))
    coin = rng.integers(0, 2, total)

    o_blk = np.minimum(
        (u[0] * data.n_blocks).astype(np.int32), data.n_blocks - 1
    )
    x = np.maximum(eta_z * u[1] - eta_z + 1.0, 1e-30)
    powx = np.exp(alpha * np.log(x))
    uz = u[1] * zeta_n
    val = np.where(uz < 1.0, 1.0, np.where(uz < 1.0 + hp, 2.0, 1.0 + space * powx))
    d_zipf = np.clip(np.floor(val), 1, space).astype(np.int32)
    d_unif = (1 + np.floor(u[2] * max(space - 1, 1))).astype(np.int32)

    it = np.arange(total) // (num_batches * nch)
    fc = cfg.first_cooling_iteration
    cooling = (it > fc) if one_d else (it >= fc)
    d_arr = np.where(cooling | (coin > 0), d_zipf, d_unif).astype(np.int32)
    eta_arr = _eta_schedule(cfg)[it].astype(np.float32)
    out = (o_blk, d_arr, eta_arr)
    _SCALAR_CACHE[key] = out
    while len(_SCALAR_CACHE) > 8:
        _SCALAR_CACHE.pop(next(iter(_SCALAR_CACHE)))
    return out


def _count_valid(g, data: "PallasSgdData", o_blk: np.ndarray,
                 d_arr: np.ndarray) -> int:
    """Exact number of VALID pairs across all chunks: pair (s, s+D) is
    valid iff both sides lie in the same path (path boundaries counted via
    a cumulative boundary trick).  Used for honest pairs/s accounting and
    for compensating the batch count so effective valid updates meet the
    reference's min_term_updates contract (reference: path_sgd.cpp:
    161-203 counts every term; our masked window pairs do not update)."""
    S = data.num_steps
    pr = data.planes.shape[1]
    pf = np.full(pr * LANE + 1, -1, np.int64)
    pf[:S] = g.step_path
    bnd = np.zeros(pr * LANE + 1, np.int64)
    bnd[1:] = np.cumsum(pf[1:] != pf[:-1])
    total = 0
    i_pair = np.arange(CHUNK, dtype=np.int64)
    blk = 4096
    for c0 in range(0, len(o_blk), blk):
        o = o_blk[c0 : c0 + blk].astype(np.int64) * LANE
        d = d_arr[c0 : c0 + blk].astype(np.int64)
        a = o[:, None] + i_pair[None, :]
        b = a + d[:, None]
        ok = (bnd[a] == bnd[b]) & (pf[a] >= 0)
        total += int(ok.sum())
    return total


_PLAN_CACHE: dict = {}
_DEV_CACHE: dict = {}


def _dev_arrays(g, key, build):
    """Memoize device-uploaded input arrays: rebuilding and re-uploading
    ~1MB of planes per dispatch costs ~40ms through the axon relay — 4x
    the device time of the whole DRB1 optimization.  Keyed on (graph id,
    cfg, coords digest) and verified against the live graph object (ids
    are reused after GC, like _DATA_CACHE); same-input re-runs
    (benchmarks, pipelines that retry) hit the cache."""
    hit = _DEV_CACHE.get(key)
    if hit is not None and hit[0] is g:
        return hit[1]
    val = build()
    _DEV_CACHE[key] = (g, val)
    while len(_DEV_CACHE) > 6:
        _DEV_CACHE.pop(next(iter(_DEV_CACHE)))
    return val


def plan_run(g, cfg, one_d: bool = False) -> dict:
    """The single source of truth for the Pallas dispatch geometry AND the
    benchmark's work accounting (so they cannot diverge): chunks per
    iteration, merge groups, exact slot and valid-pair counts.

    The chunk count per iteration is compensated upward by the measured
    valid-pair fraction so that VALID updates per iteration >= the
    reference's min_term_updates contract.

    Cached per (graph, config): the exact valid-pair count is ~0.5s of
    host numpy on DRB1 — 40x the device time of the whole optimization —
    so it must not run per dispatch."""
    key = (id(g), cfg, one_d, RC, MAX_CGS, MERGES_PER_ITER,
           ITERS_PER_MERGE)
    hit = _PLAN_CACHE.get(key)
    if hit is not None and hit[0] is g:
        return hit[1]
    p = _plan_run_uncached(g, cfg, one_d)
    _PLAN_CACHE[key] = (g, p)
    while len(_PLAN_CACHE) > 8:
        _PLAN_CACHE.pop(next(iter(_PLAN_CACHE)))
    return p


def _plan_run_uncached(g, cfg, one_d: bool) -> dict:
    data = PallasSgdData.build_cached(g, int(cfg.space), one_d)
    nch0 = max(1, -(-cfg.min_term_updates // CHUNK))
    o_blk, d_arr, _ = _host_chunk_scalars(cfg, data, nch0, 1, one_d)
    valid0 = _count_valid(g, data, o_blk, d_arr)
    frac = max(valid0 / max(len(o_blk) * CHUNK, 1), 0.05)
    cpi = max(1, -(-cfg.min_term_updates // int(CHUNK * frac)))
    # split each iteration into merge groups: at least MERGES_PER_ITER,
    # and enough that a group's (o, D) scalars fit the SMEM staging
    # buffer (see MAX_CGS / _make_kernel_*)
    mpi = max(MERGES_PER_ITER, -(-cpi // MAX_CGS))
    mpi = max(1, min(mpi, cpi))
    cpi = _pad_to(cpi, mpi)
    o_blk, d_arr, eta_arr = _host_chunk_scalars(cfg, data, cpi, 1, one_d)
    valid = _count_valid(g, data, o_blk, d_arr)
    # resident-kernel grouping: K iterations per merge (K=1 when the
    # iteration already splits into multiple groups, or delta>0)
    k = 1
    if mpi == 1 and ITERS_PER_MERGE > 1 and cfg.delta <= 0:
        kmax = min(ITERS_PER_MERGE, max(1, MAX_CGS // cpi))
        for cand in range(kmax, 0, -1):
            if cfg.iter_max % cand == 0:
                k = cand
                break
    return dict(
        data=data,
        cpi=cpi,                      # chunks per iteration
        cgs=cpi // mpi,               # chunks per merge group (K=1 view)
        groups=cfg.iter_max * mpi,    # total merge groups (K=1 view)
        kcgs=k * cpi if k > 1 else cpi // mpi,   # resident grouping
        kgroups=cfg.iter_max * mpi // k if k > 1
        else cfg.iter_max * mpi,
        o_blk=o_blk,
        d_arr=d_arr,
        eta_arr=eta_arr,
        eta_table=_eta_schedule(cfg),
        total_slots=cfg.iter_max * cpi * CHUNK,
        total_valid=valid,
        valid_frac=valid / max(cfg.iter_max * cpi * CHUNK, 1),
    )


def pairs_per_run(g, cfg, one_d: bool = False) -> dict:
    """Public accounting helper for bench.py: {'slots', 'valid'} for the
    exact dispatch the kernel will execute (see plan_run)."""
    p = plan_run(g, cfg, one_d)
    return {"slots": p["total_slots"], "valid": p["total_valid"]}


# ---------------------------------------------------------------------------
# Kernel building blocks
# ---------------------------------------------------------------------------


def _pair_coins(gchunk):
    """Two decorrelated coin planes (RC, LANE) i32 from a vectorized
    splitmix-style hash of (gchunk, pair index).  Only bit 0 of each word
    is consumed (endpoint coins; reference: layout.cu:251-281)."""
    iota = jax.lax.broadcasted_iota(
        jnp.int32, (2, RC, LANE), 1
    ) * LANE + jax.lax.broadcasted_iota(jnp.int32, (2, RC, LANE), 2)
    sel = jax.lax.broadcasted_iota(jnp.int32, (2, RC, LANE), 0)
    h = iota * (-1640531527) + sel * 1779033703 + gchunk * (-1150833019)
    h = (h ^ jax.lax.shift_right_logical(h, 16)) * (-2048144789)
    h = (h ^ jax.lax.shift_right_logical(h, 13)) * (-1028477387)
    h = h ^ jax.lax.shift_right_logical(h, 16)
    return h


def _read_a(ref, p, o_blk):
    return ref[p, pl.ds(o_blk, RC), :]


def _read_b_rows(rows, c_sh, keep):
    """roll+blend of already-loaded (NP, 2*RC, 128) B-window rows."""
    r1 = pltpu.roll(rows, (LANE - c_sh) & (LANE - 1), axis=2)
    return jnp.where(keep, r1[:, 0:RC], r1[:, 1 : RC + 1])


def _read_b_stacked(ref, r0, c_sh, keep):
    """Stacked B-window read: ONE (NP, 2*RC, 128) dynamic slice for all
    planes of the ref, ONE lane-rotate by -c_sh, one row-blend.  Per-op
    dispatch overhead dominates the chunk body, so everything that can
    share a slice/roll does (8-row-multiple windows: unaligned sublane
    windows lower pathologically in Mosaic)."""
    rows = ref[:, pl.ds(r0, 2 * RC), :]
    r1 = pltpu.roll(rows, (LANE - c_sh) & (LANE - 1), axis=2)
    return jnp.where(keep, r1[:, 0:RC], r1[:, 1 : RC + 1])


def _rmw_a_stacked(ref, o_blk, v):
    ref[:, pl.ds(o_blk, RC), :] = ref[:, pl.ds(o_blk, RC), :] + v


def _rmw_b_stacked(ref, r0, c_sh, lane2, v):
    """Stacked B-window scatter-add: inverse of _read_b_stacked (rotate
    by +c_sh, split the wrapped lanes into the next row); one RMW for all
    planes.  v: (NP, RC, 128); rows RC+1.. of the window add zero."""
    np_ = v.shape[0]
    rot = pltpu.roll(v, c_sh, axis=2)
    z1 = jnp.zeros((np_, 1, LANE), jnp.float32)
    z = jnp.zeros((np_, RC - 1, LANE), jnp.float32)
    top = jnp.concatenate([rot, z1, z], axis=1)
    bot = jnp.concatenate([z1, rot, z], axis=1)
    # pair slot (r, l) targets row r0+r+(l+c_sh >= 128), lane (l+c_sh)&127:
    # unwrapped lanes (>= c_sh) come from the same rotated row (top),
    # wrapped lanes (< c_sh) from the previous one (bot)
    contrib = jnp.where(lane2 >= c_sh, top, bot)
    ref[:, pl.ds(r0, 2 * RC), :] = ref[:, pl.ds(r0, 2 * RC), :] + contrib


def _chunk_2d(planes_ref, drift_ref, base_ref, o_blk, D, eta_lr,
              gchunk_global, dm_sc=None):
    """One chunk of CHUNK pair updates, replica style: contiguous reads,
    ~40 VPU ops, contiguous RMW writes.  Update math: layout.cu:141-188.

    Replicas are stored as DRIFT from the last consensus (base + drift =
    absolute): compounding tiny cooled-phase deltas into an absolute-f32
    plane silently loses anything below one ulp of the coordinate
    magnitude (~1e-3 at 1e4 nt), which measurably stalls convergence on
    real-f32 hardware (chip stress plateaued at 1.7 vs 1.26 for the
    excess-precision CPU twin); drift values stay small so the compound
    is exact."""
    r0 = o_blk + jax.lax.shift_right_logical(D, 7)
    c_sh = jnp.bitwise_and(D, LANE - 1)
    keep = jax.lax.broadcasted_iota(jnp.int32, (1, RC, LANE), 2) < (
        LANE - c_sh
    )
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * RC, LANE), 2)

    pa = planes_ref[:, pl.ds(o_blk, RC), :]
    pb = _read_b_stacked(planes_ref, r0, c_sh, keep)
    ca_ = (base_ref[:, pl.ds(o_blk, RC), :]
           + drift_ref[:, pl.ds(o_blk, RC), :])
    b_rows = (base_ref[:, pl.ds(r0, 2 * RC), :]
              + drift_ref[:, pl.ds(r0, 2 * RC), :])
    cb_ = _read_b_rows(b_rows, c_sh, keep)
    pa0, pa1, patha = pa[_POS], pa[_POSEND], pa[_PATH]
    pb0, pb1, pathb = pb[_POS], pb[_POSEND], pb[_PATH]
    xfa, xra, yfa, yra = ca_[0], ca_[1], ca_[2], ca_[3]
    xfb, xrb, yfb, yrb = cb_[0], cb_[1], cb_[2], cb_[3]

    coins = _pair_coins(gchunk_global * 1000003 + 0)
    ca = coins[0] & 1
    cb = coins[1] & 1
    caf = ca == 0
    cbf = cb == 0
    if "nocoins" in _ABLATE:
        caf = jnp.ones_like(caf)
        cbf = jnp.ones_like(cbf)

    pos_a = jnp.where(caf, pa0, pa1)
    pos_b = jnp.where(cbf, pb0, pb1)
    xa = jnp.where(caf, xfa, xra)
    ya = jnp.where(caf, yfa, yra)
    xb = jnp.where(cbf, xfb, xrb)
    yb = jnp.where(cbf, yfb, yrb)
    valid = jnp.logical_and(patha == pathb, patha >= 0)

    term = jnp.maximum(jnp.abs(pos_a - pos_b).astype(jnp.float32), 1e-9)
    mu = jnp.minimum(eta_lr / term, 1.0)
    dx = xa - xb
    dx = jnp.where(dx == 0.0, 1e-9, dx)
    dy = ya - yb
    mag = jnp.sqrt(dx * dx + dy * dy)
    delta = mu * (mag - term) * 0.5
    r = jnp.where(valid, delta / mag, 0.0)
    rx = r * dx
    ry = r * dy

    if dm_sc is not None:
        # delta early-stop tracking (reference Delta_max,
        # path_sgd.cpp:183-190): elementwise running max of the masked
        # per-term update magnitude; reduced once per merge group
        dm_sc[:] = jnp.maximum(
            dm_sc[:], jnp.where(valid, jnp.abs(delta), 0.0)[None]
        )

    zero = jnp.zeros_like(rx)
    if "noarmw" not in _ABLATE:
        va = jnp.stack([
            jnp.where(caf, -rx, zero), jnp.where(caf, zero, -rx),
            jnp.where(caf, -ry, zero), jnp.where(caf, zero, -ry),
        ])
        _rmw_a_stacked(drift_ref, o_blk, va)
    if "nobrmw" not in _ABLATE:
        vb = jnp.stack([
            jnp.where(cbf, rx, zero), jnp.where(cbf, zero, rx),
            jnp.where(cbf, ry, zero), jnp.where(cbf, zero, ry),
        ])
        _rmw_b_stacked(drift_ref, r0, c_sh, lane2, vb)


def _chunk_1d(planes_ref, drift_ref, base_ref, o_blk, D, eta_lr,
              dm_sc=None):
    """1D strata chunk on per-step X replicas, drift form (see _chunk_2d;
    reference: path_sgd.cpp:304-396 for the update math)."""
    r0 = o_blk + jax.lax.shift_right_logical(D, 7)
    c_sh = jnp.bitwise_and(D, LANE - 1)
    keep = jax.lax.broadcasted_iota(jnp.int32, (1, RC, LANE), 2) < (
        LANE - c_sh
    )
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * RC, LANE), 2)

    pas = planes_ref[:, pl.ds(o_blk, RC), :]
    pbs = _read_b_stacked(planes_ref, r0, c_sh, keep)
    pa, patha = pas[_P1_POS], pas[_P1_PATH]
    pb, pathb = pbs[_P1_POS], pbs[_P1_PATH]
    xa = (base_ref[0, pl.ds(o_blk, RC), :]
          + drift_ref[0, pl.ds(o_blk, RC), :])
    b_rows = (base_ref[:, pl.ds(r0, 2 * RC), :]
              + drift_ref[:, pl.ds(r0, 2 * RC), :])
    xb = _read_b_rows(b_rows, c_sh, keep)[0]

    di = pa - pb
    valid = jnp.logical_and(
        jnp.logical_and(patha == pathb, patha >= 0), di != 0
    )
    term = jnp.abs(di).astype(jnp.float32)
    w = 1.0 / jnp.maximum(term, 1e-30)
    mu = jnp.minimum(eta_lr * w, 1.0)
    dx = xa - xb
    dx = jnp.where(dx == 0.0, 1e-9, dx)
    mag = jnp.abs(dx)
    delta = mu * (mag - term) * 0.5
    rr = jnp.where(valid, delta / mag * dx, 0.0)

    if dm_sc is not None:
        dm_sc[:] = jnp.maximum(
            dm_sc[:], jnp.where(valid, jnp.abs(delta), 0.0)[None]
        )

    _rmw_a_stacked(drift_ref, o_blk, -rr[None])
    _rmw_b_stacked(drift_ref, r0, c_sh, lane2, rr[None])


# Consensus merge ------------------------------------------------------------


# Merge matmul precision: the MXU computes f32 dots as a SINGLE bf16
# pass by default, which quantizes the folded drift sums to ~8 mantissa
# bits regardless of operand dtype (measured: per-merge consensus error
# ~0.4% of the update, stalling converged stress at 1.7 vs 1.26).  The
# one-hot side is exact in bf16, so splitting the VALUE side into
# hi + lo bf16 planes reconstructs it to ~2^-16 relative in 2 passes
# (Precision.HIGHEST costs 6) — measured stress-neutral vs HIGHEST.


def _dot2(e_lo_b, piece, dims):
    """2-pass hi/lo bf16 dot: exact one-hot operand x value operand split
    as v = hi + lo with bf16 rounding at each level (~2^-16 relative)."""
    ph = piece.astype(jnp.bfloat16)
    if "dots1" in _ABLATE:  # timing ablation: single bf16 pass
        return jax.lax.dot_general(
            e_lo_b, ph, dimension_numbers=dims,
            preferred_element_type=jnp.float32,
        )
    plo = (piece - ph.astype(jnp.float32)).astype(jnp.bfloat16)
    a = jax.lax.dot_general(
        e_lo_b, ph, dimension_numbers=dims,
        preferred_element_type=jnp.float32,
    )
    b = jax.lax.dot_general(
        e_lo_b, plo, dimension_numbers=dims,
        preferred_element_type=jnp.float32,
    )
    return a + b


_DIMS_SCATTER = (((0,), (0,)), ((), ()))
_DIMS_BCAST = (((1,), (0,)), ((), ()))
# transposed-layout merge dims: scatter contracts the step dim of both
# operands (value left) -> (cols, 128); bcast contracts the lane dim of
# the one-hot with the lane dim of the staged update -> (steps, cols)
_DIMS_SCATTER_T = (((0,), (0,)), ((), ()))
_DIMS_BCAST_T = (((1,), (1,)), ((), ()))


def _xor_lanes(a):
    """Exact lane permutation a[..., l] <- a[..., l ^ 1].

    The reverse endpoint of a step is always epf ^ 1 (same hi row,
    lo lane xor 1), so its one-hot is the forward one-hot with the lane
    swapped.  Instead of building a second (TR*LANE, 128) one-hot per
    tile, contributions accumulate through the FORWARD one-hot and this
    permutation is applied once per merge to the small (nl, 128)
    accumulator — pure data movement, bit-exact."""
    ax = a.ndim - 1
    down = pltpu.roll(a, 1, axis=ax)
    up = pltpu.roll(a, a.shape[ax] - 1, axis=ax)  # roll by -1 (mod lanes)
    lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, ax)
    return jnp.where((lane & 1) == 0, up, down)


def _dot2v(piece, e_lo_b, dims):
    """_dot2 with the VALUE operand on the LEFT (hi/lo bf16 split of
    `piece`; `e_lo_b` is the exact one-hot side)."""
    ph = piece.astype(jnp.bfloat16)
    if "dots1" in _ABLATE:
        return jax.lax.dot_general(
            ph, e_lo_b, dimension_numbers=dims,
            preferred_element_type=jnp.float32,
        )
    plo = (piece - ph.astype(jnp.float32)).astype(jnp.bfloat16)
    a = jax.lax.dot_general(
        ph, e_lo_b, dimension_numbers=dims,
        preferred_element_type=jnp.float32,
    )
    b = jax.lax.dot_general(
        plo, e_lo_b, dimension_numbers=dims,
        preferred_element_type=jnp.float32,
    )
    return a + b


def _twosum_update(out_ref, lo_ref, upd):
    """Compensated out += upd: node coordinates reach ~1e4 while cooled
    updates shrink to ~1e-3 = one f32 ulp, so a plain f32 accumulate
    plateaus (measured: chip stress stuck at ~1.7 while the f64-merge twin
    reaches 1.26).  TwoSum keeps the lost low bits in a second f32 plane;
    the final group folds them back into the output."""
    hi = out_ref[:]
    s = hi + upd
    bb = s - hi
    e = (hi - (s - bb)) + (upd - bb)
    out_ref[:] = s
    lo_ref[:] = lo_ref[:] + e


def _merge_tiles_2d(planes_ref, drift_ref, base_ref, out_ref, lo_ref,
                    acc_ref, recip_ref, hb_ref, n_tiles: int, nl: int,
                    nl_w: int):
    """Consensus: out += sum_steps(drift) / R per endpoint, then broadcast
    the update into base and reset drift to zero.

    Layout (round-5): node arrays are TRANSPOSED — endpoint idx maps to
    (row idx >> 7, lane idx & 127) of an (nl, 128) plane — and the merge
    is WINDOWED: each step tile only touches its cyclic hi band
    [hb[t], hb[t]+nl_w) (host-computed, _tile_windows), shrinking the
    per-tile one-hot traffic from O(steps x nl) to O(steps x nl_w).
    Both passes share ONE forward lane one-hot; reverse-endpoint
    contributions ride extra dot columns and are folded with the exact
    lane-xor permutation once per merge.

    acc_ref: (4, nl + nl_w, LANE) scratch — channels [xf, yf, xr, yr],
    rows [0, nl) plus a cyclic spill band folded after the scatter; it
    is reused to stage the spill-extended update for the bcast pass.
    out/lo/recip: (2, nl, LANE) / (nl, LANE) transposed node planes."""
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (TR, LANE, nl_w), 2)
    iota_128 = jax.lax.broadcasted_iota(jnp.int32, (TR, LANE, LANE), 2)

    def onehots(t):
        r = t * TR
        hb = hb_ref[t]
        if "onehot0" in _ABLATE:  # timing ablation: loop-invariant build
            h = planes_ref[_HANDLE, 0:TR, :]
        else:
            h = planes_ref[_HANDLE, pl.ds(r, TR), :]
        epf = 2 * jax.lax.shift_right_logical(h, 1) + (h & 1)
        hi = jax.lax.shift_right_logical(epf, 7)
        lof = epf & (LANE - 1)
        hiw = hi - hb
        hiw = jnp.where(hiw < 0, hiw + nl, hiw)
        e_hi = (hiw[:, :, None] == iota_w).astype(jnp.float32)
        # 3D one-hot: the dots contract BOTH step dims (tile row, lane),
        # avoiding the (TR, LANE, C) -> (TR*LANE, C) relayout that
        # dominated the merge (measured ~40% of device time)
        e_lo_f = (lof[:, :, None] == iota_128).astype(
            jnp.float32
        ).astype(jnp.bfloat16)
        return r, hb, e_hi, e_lo_f

    def scatter_body(t, _):
        r, hb, e_hi, e_lo_f = onehots(t)
        ds = pl.ds(r, TR)
        # channels [xf, yf, xr, yr] = drift planes (0, 2, 1, 3)
        def piece(pp):
            v = drift_ref[pp, ds, :]
            return e_hi * v[:, :, None]

        if "nopieces" in _ABLATE:  # timing ablation
            pall = jnp.zeros((TR * LANE, 4 * nl_w), jnp.float32)
        else:
            pall = jnp.concatenate(
                [piece(0), piece(2), piece(1), piece(3)], axis=2
            ).reshape(TR * LANE, 4 * nl_w)
        if "nodots" in _ABLATE:  # timing ablation
            contrib = jnp.zeros((4, nl_w, LANE), jnp.float32)
        else:
            contrib = _dot2v(
                pall, e_lo_f.reshape(TR * LANE, LANE), _DIMS_SCATTER_T
            ).reshape(4, nl_w, LANE)
        acc_ref[:, pl.ds(hb, nl_w), :] = (
            acc_ref[:, pl.ds(hb, nl_w), :] + contrib
        )
        return 0

    acc_ref[:] = jnp.zeros_like(acc_ref)
    if "noscatter" not in _ABLATE:
        jax.lax.fori_loop(0, n_tiles, scatter_body, 0)
    # fold the cyclic spill band, combine fwd + lane-xored rev channels
    acc_ref[:, 0:nl_w, :] = (
        acc_ref[:, 0:nl_w, :] + acc_ref[:, nl : nl + nl_w, :]
    )
    acc4 = acc_ref[:, 0:nl, :]
    updx = (acc4[0] + _xor_lanes(acc4[2])) * recip_ref[:]
    updy = (acc4[1] + _xor_lanes(acc4[3])) * recip_ref[:]
    upd = jnp.stack([updx, updy])
    _twosum_update(out_ref, lo_ref, upd)
    # stage the bcast read table into acc_ref: channels
    # [updx, updy, xor(updx), updy-xor] with the cyclic spill appended,
    # so per-tile windows are single sublane slices
    upd4 = jnp.stack([updx, updy, _xor_lanes(updx), _xor_lanes(updy)])
    acc_ref[:, 0:nl, :] = upd4
    acc_ref[:, nl : nl + nl_w, :] = upd4[:, 0:nl_w, :]

    def bcast_body(t, _):
        r, hb, e_hi, e_lo_f = onehots(t)
        ds = pl.ds(r, TR)
        updw = acc_ref[:, pl.ds(hb, nl_w), :].reshape(4 * nl_w, LANE)
        t1 = _dot2(e_lo_f, updw, (((2,), (1,)), ((), ())))
        vxf = jnp.sum(t1[:, :, 0 * nl_w : 1 * nl_w] * e_hi, axis=2)
        vyf = jnp.sum(t1[:, :, 1 * nl_w : 2 * nl_w] * e_hi, axis=2)
        vxr = jnp.sum(t1[:, :, 2 * nl_w : 3 * nl_w] * e_hi, axis=2)
        vyr = jnp.sum(t1[:, :, 3 * nl_w : 4 * nl_w] * e_hi, axis=2)
        # consensus collapse: base' = base + upd stays the broadcast of
        # the node coords by induction; drift restarts from zero
        for p, v in ((0, vxf), (1, vxr), (2, vyf), (3, vyr)):
            base_ref[p, ds, :] = base_ref[p, ds, :] + v
            drift_ref[p, ds, :] = jnp.zeros((TR, LANE), jnp.float32)
        return 0

    if "nobcast" not in _ABLATE:
        jax.lax.fori_loop(0, n_tiles, bcast_body, 0)


def _merge_tiles_1d(planes_ref, drift_ref, base_ref, out_ref, lo_ref,
                    acc_ref, recip_ref, hb_ref, n_tiles: int, nl: int,
                    nl_w: int):
    """1D windowed merge (see _merge_tiles_2d): transposed (nl, 128)
    node plane, acc_ref (1, nl + nl_w, LANE) with cyclic spill."""
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (TR, LANE, nl_w), 2)
    iota_128 = jax.lax.broadcasted_iota(jnp.int32, (TR, LANE, LANE), 2)

    def onehots(t):
        r = t * TR
        hb = hb_ref[t]
        h = planes_ref[_P1_HANDLE, pl.ds(r, TR), :]
        nd = jax.lax.shift_right_logical(h, 1)
        hi = jax.lax.shift_right_logical(nd, 7)
        lo = nd & (LANE - 1)
        hiw = hi - hb
        hiw = jnp.where(hiw < 0, hiw + nl, hiw)
        e_hi = (hiw[:, :, None] == iota_w).astype(jnp.float32)
        e_lo = (lo[:, :, None] == iota_128).astype(
            jnp.float32
        ).astype(jnp.bfloat16)
        return r, hb, e_hi, e_lo

    def scatter_body(t, _):
        r, hb, e_hi, e_lo = onehots(t)
        ds = pl.ds(r, TR)
        v = drift_ref[0, ds, :]
        piece = (e_hi * v[:, :, None]).reshape(TR * LANE, nl_w)
        contrib = _dot2v(
            piece, e_lo.reshape(TR * LANE, LANE), _DIMS_SCATTER_T
        )
        acc_ref[0, pl.ds(hb, nl_w), :] = (
            acc_ref[0, pl.ds(hb, nl_w), :] + contrib
        )
        return 0

    acc_ref[:] = jnp.zeros_like(acc_ref)
    jax.lax.fori_loop(0, n_tiles, scatter_body, 0)
    acc_ref[0, 0:nl_w, :] = (
        acc_ref[0, 0:nl_w, :] + acc_ref[0, nl : nl + nl_w, :]
    )
    upd = acc_ref[0, 0:nl, :] * recip_ref[:]
    _twosum_update(out_ref, lo_ref, upd)
    acc_ref[0, 0:nl, :] = upd
    acc_ref[0, nl : nl + nl_w, :] = upd[0:nl_w, :]

    def bcast_body(t, _):
        r, hb, e_hi, e_lo = onehots(t)
        ds = pl.ds(r, TR)
        updw = acc_ref[0, pl.ds(hb, nl_w), :]
        t1 = _dot2(e_lo, updw, (((2,), (1,)), ((), ())))
        v = jnp.sum(t1 * e_hi, axis=2)
        base_ref[0, ds, :] = base_ref[0, ds, :] + v
        drift_ref[0, ds, :] = jnp.zeros((TR, LANE), jnp.float32)
        return 0

    jax.lax.fori_loop(0, n_tiles, bcast_body, 0)


# ---------------------------------------------------------------------------
# Kernels and dispatch
# ---------------------------------------------------------------------------


def _stage_group_scalars(od_ref, od_smem, sem, gid):
    """DMA the group's (o, D) chunk scalars from the HBM-resident
    (groups, 2, cgs) array into the SMEM staging scratch.  Keeping the
    full per-run scalar arrays out of SMEM matters: SMEM residency past
    ~40KB collapses the whole kernel's throughput ~3x (measured on v5e);
    HBM (untiled) is also the only space that allows the single-group
    slice DMA."""
    dma = pltpu.make_async_copy(od_ref.at[gid], od_smem, sem)
    dma.start()
    dma.wait()


def _make_kernel_2d(cgs: int, n_tiles: int, nl: int, nl_w: int,
                    track: bool = False):
    """grid = (merge groups,); one grid step = cgs chunks + one consensus
    merge.  Scalar prefetch: meta [gchunk_base, seed], o/D/eta arrays.
    With `track`, the per-group max |delta| (the reference's Delta_max,
    path_sgd.cpp:183-190) is reduced into the dmax output."""

    def kernel(meta_ref, eta_ref, hb_ref, od_ref, planes_ref, cp0_ref,
               xy_ref, recip_ref, out_ref, dmax_ref, drift_sc, base_sc,
               acc_sc, lo_sc, dm_sc, od_smem, sem):
        gid = pl.program_id(0)

        @pl.when(gid == 0)
        def _():
            drift_sc[:] = jnp.zeros_like(drift_sc)
            base_sc[:] = cp0_ref[:]
            out_ref[:] = xy_ref[:]
            lo_sc[:] = jnp.zeros_like(lo_sc)

        if track:
            dm_sc[:] = jnp.zeros_like(dm_sc)
        _stage_group_scalars(od_ref, od_smem, sem, gid)

        def body(c, _):
            gl = gid * cgs + c
            # eta resolved per chunk from the per-iteration table
            # (meta[2] = chunks per iteration), so merge groups may
            # span iteration boundaries
            it = (meta_ref[0] + gl) // meta_ref[2]
            _chunk_2d(
                planes_ref, drift_sc, base_sc, od_smem[0, c],
                od_smem[1, c], eta_ref[it], meta_ref[0] + gl,
                dm_sc if track else None,
            )
            return 0

        if "nochunks" not in _ABLATE:
            jax.lax.fori_loop(0, cgs, body, 0)
        if "nomerge" not in _ABLATE:
            _merge_tiles_2d(
                planes_ref, drift_sc, base_sc, out_ref, lo_sc, acc_sc,
                recip_ref, hb_ref, n_tiles, nl, nl_w,
            )
        dmax_ref[gid] = jnp.max(dm_sc[:]) if track else 0.0

        # final group: fold the compensation plane into the output
        @pl.when(gid == pl.num_programs(0) - 1)
        def _():
            out_ref[:] = out_ref[:] + lo_sc[:]

    return kernel


def _make_kernel_1d(cgs: int, n_tiles: int, nl: int, nl_w: int,
                    track: bool = False):
    def kernel(meta_ref, eta_ref, hb_ref, od_ref, planes_ref, cp0_ref,
               x_ref, recip_ref, out_ref, dmax_ref, drift_sc, base_sc,
               acc_sc, lo_sc, dm_sc, od_smem, sem):
        gid = pl.program_id(0)

        @pl.when(gid == 0)
        def _():
            drift_sc[:] = jnp.zeros_like(drift_sc)
            base_sc[:] = cp0_ref[:]
            out_ref[:] = x_ref[:]
            lo_sc[:] = jnp.zeros_like(lo_sc)

        if track:
            dm_sc[:] = jnp.zeros_like(dm_sc)
        _stage_group_scalars(od_ref, od_smem, sem, gid)

        def body(c, _):
            it = (meta_ref[0] + gid * cgs + c) // meta_ref[2]
            _chunk_1d(planes_ref, drift_sc, base_sc, od_smem[0, c],
                      od_smem[1, c], eta_ref[it],
                      dm_sc if track else None)
            return 0

        jax.lax.fori_loop(0, cgs, body, 0)
        _merge_tiles_1d(
            planes_ref, drift_sc, base_sc, out_ref, lo_sc, acc_sc,
            recip_ref, hb_ref, n_tiles, nl, nl_w,
        )
        dmax_ref[gid] = jnp.max(dm_sc[:]) if track else 0.0

        @pl.when(gid == pl.num_programs(0) - 1)
        def _():
            out_ref[:] = out_ref[:] + lo_sc[:]

    return kernel


@partial(
    jax.jit,
    static_argnames=("groups", "cgs", "n_tiles", "nl", "nl_w", "one_d",
                     "interpret", "track"),
)
def _pallas_call(meta, eta_g, hb, od_all, planes, cp0, xy0, recip,
                 groups: int, cgs: int, n_tiles: int, nl: int, nl_w: int,
                 one_d: bool, interpret: bool, track: bool = False):
    np_planes = planes.shape[0]
    pr = planes.shape[1]
    ncp = cp0.shape[0]
    cgs_pad = od_all.shape[2]
    # node planes are transposed (nl rows, 128 lanes); 2D stacks x and y
    nodeshape = (nl, LANE) if one_d else (2, nl, LANE)
    nodeidx = (
        (lambda i, *_: (0, 0)) if one_d else (lambda i, *_: (0, 0, 0))
    )
    kernel = (_make_kernel_1d if one_d else _make_kernel_2d)(
        cgs, n_tiles, nl, nl_w, track
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(groups,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # od (groups, 2, cgs), HBM
            pl.BlockSpec(
                (np_planes, pr, LANE), lambda i, *_: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (ncp, pr, LANE), lambda i, *_: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                nodeshape, nodeidx, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (nl, LANE), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                nodeshape, nodeidx, memory_space=pltpu.VMEM
            ),
            # per-group Delta_max (delta early-stop): whole (groups,)
            # array SMEM-resident across grid steps; each step writes
            # its own slot
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((ncp, pr, LANE), jnp.float32),
            pltpu.VMEM((ncp, pr, LANE), jnp.float32),
            # windowed-merge accumulator with cyclic spill band:
            # channels [xf, yf, xr, yr] (2D) / [x] (1D)
            pltpu.VMEM(
                (1 if one_d else 4, nl + nl_w, LANE), jnp.float32
            ),
            pltpu.VMEM(nodeshape, jnp.float32),
            pltpu.VMEM((1, RC, LANE), jnp.float32),
            pltpu.SMEM((2, cgs_pad), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    # static planes + cp0 input + drift + base scratches, node arrays,
    # chunk scalars
    vmem_need = (
        (np_planes + 3 * ncp) * pr * LANE * 4
        + 10 * nl * LANE * 4
        + 2 * groups * cgs_pad * 4
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(nodeshape, jnp.float32),
            jax.ShapeDtypeStruct((groups,), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                vmem_need + 24 * 1024 * 1024, 127 * 1024 * 1024
            ),
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(meta, eta_g, hb, od_all, planes, cp0, xy0, recip)


def _pack_od(p: dict) -> np.ndarray:
    """(groups, 2, cgs_pad) i32 chunk-scalar array over the RESIDENT
    grouping (kgroups/kcgs — K iterations per merge); the chunk dim is
    padded to a 128 multiple (DMA slice alignment), pad entries are
    never read (the chunk loop bound is the unpadded cgs)."""
    groups, cgs = p["kgroups"], p["kcgs"]
    cgs_pad = _pad_to(cgs, LANE)
    od = np.zeros((groups, 2, cgs_pad), np.int32)
    od[:, 0, :cgs] = p["o_blk"].reshape(groups, cgs)
    od[:, 1, :cgs] = p["d_arr"].reshape(groups, cgs)
    od[:, 1, cgs:] = 1
    return od


def _segments(groups: int, cgs: int):
    """Split the run into dispatches of <= MAX_CHUNKS chunks at merge
    group boundaries (results are split-invariant: the coin stream is
    keyed by the global chunk index carried in the meta array).

    Segments are sized EQUALLY (not greedy): a ragged tail segment has a
    different grid size and pays a full Mosaic recompile (~2 min at 5M
    steps — measured to dominate the whole run)."""
    gps = max(1, min(groups, MAX_CHUNKS // cgs))
    n_seg = -(-groups // gps)
    size = -(-groups // n_seg)
    segs = []
    g0 = 0
    while g0 < groups:
        segs.append((g0, min(size, groups - g0)))
        g0 += size
    return segs


def path_sgd_2d_pallas(
    g, coords0: np.ndarray, cfg=None, interpret: Optional[bool] = None
) -> np.ndarray:
    """Drop-in alternative to ops.sgd.path_sgd_2d on the Pallas fast path.

    Dispatched from ops.sgd.path_sgd_2d when cfg.pallas and
    pallas_supported() hold; interpret-mode runs everywhere for tests."""
    from .sgd import derive_config_2d

    if cfg is None:
        cfg = derive_config_2d(g)
    if not (g.path_step_count > 1).any():
        return np.asarray(coords0, np.float64)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    p = plan_run(g, cfg, one_d=False)
    data = p["data"]
    nl = data.ch
    pr = data.planes.shape[1]
    n_tiles = n_step_tiles(data.num_steps)
    seed = int(cfg.seed) & 0x7FFFFFFF

    import hashlib

    c0b = np.ascontiguousarray(np.asarray(coords0, np.float64))
    digest = hashlib.blake2b(c0b.tobytes(), digest_size=16).digest()
    cgs = p["kcgs"]
    hb_np, nl_w = _win_cached(g, False, nl)
    cp0, xy0, recip, od_all, eta_g, hb = _dev_arrays(
        g,
        (id(g), cfg, False, digest, RC),
        lambda: (
            jnp.asarray(_pad_planes(_step_coord_planes(g, coords0), pr)),
            jnp.asarray(coords_to_node_planes_t(c0b, nl)),
            jnp.asarray(_recip_r_t(g, nl, one_d=False)),
            jnp.asarray(_pack_od(p)),
            jnp.asarray(p["eta_table"]),
            jnp.asarray(hb_np),
        ),
    )
    xy = xy0
    track = cfg.delta > 0

    segs = _segments(p["kgroups"], cgs)
    if track:
        # delta early stop (reference: path_sgd.cpp:183-190) needs a
        # host check per ITERATION: dispatch per iteration (same grid
        # size every time -> one compiled kernel), stop when the
        # iteration's Delta_max <= delta (plan forces K=1 here)
        mpi = p["kgroups"] // cfg.iter_max
        sub = max(1, -(-(mpi * cgs) // MAX_CHUNKS))
        gps = -(-mpi // sub)
        segs = [
            (it * mpi + s0, min(gps, mpi - s0))
            for it in range(cfg.iter_max)
            for s0 in range(0, mpi, gps)
        ]

    dmaxes: list = []
    for g0, n_g in segs:
        meta = jnp.asarray([g0 * cgs, seed, p["cpi"]], jnp.int32)
        xy, dmax = _pallas_call(
            meta,
            eta_g,
            hb,
            od_all[g0 : g0 + n_g],
            data.planes,
            cp0,
            xy,
            recip,
            n_g,
            cgs,
            n_tiles,
            nl,
            nl_w,
            False,
            bool(interpret),
            track,
        )
        if track:
            dmaxes.append(np.asarray(dmax))
            if (g0 + n_g) % mpi == 0:
                dm_it = float(np.concatenate(dmaxes).max())
                dmaxes = []
                if dm_it <= cfg.delta:
                    break
        if g0 + n_g < p["kgroups"]:
            # replicas collapse to consensus at every merge (= segment)
            # boundary, so rebuilding cp0 from the returned node coords is
            # exact continuation, not an approximation
            host_xy = node_planes_t_to_coords(np.asarray(xy), 2 * g.num_nodes)
            cp0 = jnp.asarray(_pad_planes(_step_coord_planes(g, host_xy), pr))
    return node_planes_t_to_coords(
        np.asarray(xy), 2 * g.num_nodes
    ).astype(np.float64)


def path_sgd_1d_pallas(g, cfg=None, x0=None,
                       interpret: Optional[bool] = None) -> np.ndarray:
    """Fused-kernel 1D PG-SGD; drop-in for the hot part of
    ops.sgd.path_sgd_1d (dispatched when pallas_supported_1d holds)."""
    from .sgd import derive_config_1d

    if cfg is None:
        cfg = derive_config_1d(g)
    if not (g.path_step_count > 1).any():
        return g.node_offset.astype(np.float64)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    p = plan_run(g, cfg, one_d=True)
    data = p["data"]
    nl = data.ch
    pr = data.planes.shape[1]
    n_tiles = n_step_tiles(data.num_steps)
    seed = int(cfg.seed) & 0x7FFFFFFF

    import hashlib

    x0v = (
        g.node_offset.astype(np.float32)
        if x0 is None
        else np.asarray(x0, np.float32)
    )
    digest = hashlib.blake2b(
        np.ascontiguousarray(x0v).tobytes(), digest_size=16
    ).digest()
    cgs = p["kcgs"]
    hb_np, nl_w = _win_cached(g, True, nl)
    cp0, xn0, recip, od_all, eta_g, hb = _dev_arrays(
        g,
        (id(g), cfg, True, digest, RC),
        lambda: (
            jnp.asarray(_pad_planes(_step_x_plane(g, x0v)[None, :], pr)),
            jnp.asarray(x_to_node_array_t(x0v, nl)),
            jnp.asarray(_recip_r_t(g, nl, one_d=True)),
            jnp.asarray(_pack_od(p)),
            jnp.asarray(p["eta_table"]),
            jnp.asarray(hb_np),
        ),
    )
    xn = xn0
    track = cfg.delta > 0

    segs = _segments(p["kgroups"], cgs)
    if track:
        mpi = p["kgroups"] // cfg.iter_max
        sub = max(1, -(-(mpi * cgs) // MAX_CHUNKS))
        gps = -(-mpi // sub)
        segs = [
            (it * mpi + s0, min(gps, mpi - s0))
            for it in range(cfg.iter_max)
            for s0 in range(0, mpi, gps)
        ]

    dmaxes: list = []
    for g0, n_g in segs:
        meta = jnp.asarray([g0 * cgs, seed, p["cpi"]], jnp.int32)
        xn, dmax = _pallas_call(
            meta, eta_g, hb, od_all[g0 : g0 + n_g],
            data.planes, cp0, xn, recip,
            n_g, cgs, n_tiles, nl, nl_w, True, bool(interpret), track,
        )
        if track:
            dmaxes.append(np.asarray(dmax))
            if (g0 + n_g) % mpi == 0:
                dm_it = float(np.concatenate(dmaxes).max())
                dmaxes = []
                if dm_it <= cfg.delta:
                    break
        if g0 + n_g < p["kgroups"]:
            host_x = node_array_t_to_x(np.asarray(xn), g.num_nodes)
            cp0 = jnp.asarray(_pad_planes(_step_x_plane(g, host_x)[None, :], pr))
    return node_array_t_to_x(np.asarray(xn), g.num_nodes).astype(np.float64)


def _supported(g, cfg, one_d: bool) -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    # cfg.delta > 0 IS supported here: the driver dispatches per
    # iteration and early-stops on the kernel's Delta_max output
    S = g.num_steps
    # correctness holds for any S (windows past the end mask out via
    # the path compare and the plan compensates the chunk count); below
    # ~1024 steps the XLA path is already sub-millisecond and the
    # compile cost isn't worth it
    if S < 1024:
        return False
    max_pos = int(g.step_pos.max(initial=0)) + int(g.node_len.max(initial=0))
    if max_pos >= 2**30:
        return False
    idx_count = (g.num_nodes + 1) if one_d else (2 * g.num_nodes + 2)
    nl = _pad_to(max(-(-idx_count // LANE), 1), 8)
    if nl > 256:
        return False  # merge one-hot capacity cap (streaming path: TODO)
    space = int(cfg.space)
    pad = _pad_to(S + CHUNK + space + 4 * RC * LANE, TR * LANE)
    np_planes = 3 if one_d else 4
    ncp = 1 if one_d else 4
    # resident: static planes + cp0 (inputs) + drift + base scratches —
    # must match the vmem_need formula in _pallas_call, or graphs near
    # the ceiling pass here and then fail Mosaic compilation instead of
    # falling through to the streaming variant
    vmem = (np_planes + 3 * ncp) * pad * 4
    return vmem < VMEM_BUDGET


def pallas_supported(g, cfg) -> bool:
    """Whether the fused 2D kernel applies to this graph/config.

    Requires: TPU backend, VMEM-resident step planes + replicas, node
    capacity within the merge one-hot cap, positions < 2^30.  Delta
    early-stop (cfg.delta > 0) is supported via per-iteration
    dispatches."""
    return _supported(g, cfg, one_d=False)


def pallas_supported_1d(g, cfg) -> bool:
    return _supported(g, cfg, one_d=True)


# ---------------------------------------------------------------------------
# XLA+host twin (semantic reference; runs on any backend incl. CPU tests)
# ---------------------------------------------------------------------------


def _twin_coins(gchunk):
    """Flat (2, CHUNK) coin words — the SAME splitmix hash as the kernel's
    _pair_coins, flattened in the kernel's (row, lane) order."""
    h = _pair_coins(gchunk)
    return h.reshape(2, CHUNK)


@partial(jax.jit, static_argnames=("cgs",), donate_argnums=(0,))
def _twin_chunks_2d(drift, base, pos0, pos1, path, o_arr, d_arr, eta_arr,
                    g0, cgs: int):
    """One merge group of chunk updates on flat replica planes, drift
    form (absolute = base + drift; see _chunk_2d) — the jittable half of
    the twin (the consensus merge runs on the host with numpy: XLA CPU
    compiles graph-sized scatters pathologically slowly, minutes for one
    segment-sum)."""

    def chunk_body(c, drift):
        gl = g0 + c
        o = o_arr[gl] * LANE
        D = d_arr[gl]
        eta_lr = eta_arr[gl]
        coins = _twin_coins(gl * 1000003)
        caf = (coins[0] & 1) == 0
        cbf = (coins[1] & 1) == 0
        if "nocoins" in _ABLATE:
            caf = jnp.ones_like(caf)
            cbf = jnp.ones_like(cbf)
        a = (jax.lax.dynamic_slice(base, (0, o), (4, CHUNK))
             + jax.lax.dynamic_slice(drift, (0, o), (4, CHUNK)))
        b = (jax.lax.dynamic_slice(base, (0, o + D), (4, CHUNK))
             + jax.lax.dynamic_slice(drift, (0, o + D), (4, CHUNK)))
        pa0 = jax.lax.dynamic_slice(pos0, (o,), (CHUNK,))
        pa1 = jax.lax.dynamic_slice(pos1, (o,), (CHUNK,))
        pb0 = jax.lax.dynamic_slice(pos0, (o + D,), (CHUNK,))
        pb1 = jax.lax.dynamic_slice(pos1, (o + D,), (CHUNK,))
        patha = jax.lax.dynamic_slice(path, (o,), (CHUNK,))
        pathb = jax.lax.dynamic_slice(path, (o + D,), (CHUNK,))
        pos_a = jnp.where(caf, pa0, pa1)
        pos_b = jnp.where(cbf, pb0, pb1)
        xa = jnp.where(caf, a[0], a[1])
        ya = jnp.where(caf, a[2], a[3])
        xb = jnp.where(cbf, b[0], b[1])
        yb = jnp.where(cbf, b[2], b[3])
        valid = jnp.logical_and(patha == pathb, patha >= 0)
        term = jnp.maximum(jnp.abs(pos_a - pos_b).astype(jnp.float32), 1e-9)
        mu = jnp.minimum(eta_lr / term, 1.0)
        dx = xa - xb
        dx = jnp.where(dx == 0.0, 1e-9, dx)
        dy = ya - yb
        mag = jnp.sqrt(dx * dx + dy * dy)
        delta = mu * (mag - term) * 0.5
        r = jnp.where(valid, delta / mag, 0.0)
        rx = r * dx
        ry = r * dy
        zero = jnp.zeros_like(rx)
        upd_a = jnp.stack([
            jnp.where(caf, -rx, zero), jnp.where(caf, zero, -rx),
            jnp.where(caf, -ry, zero), jnp.where(caf, zero, -ry),
        ])
        upd_b = jnp.stack([
            jnp.where(cbf, rx, zero), jnp.where(cbf, zero, rx),
            jnp.where(cbf, ry, zero), jnp.where(cbf, zero, ry),
        ])
        if "noarmw" not in _ABLATE:
            drift = jax.lax.dynamic_update_slice(
                drift,
                jax.lax.dynamic_slice(drift, (0, o), (4, CHUNK)) + upd_a,
                (0, o),
            )
        if "nobrmw" not in _ABLATE:
            drift = jax.lax.dynamic_update_slice(
                drift,
                jax.lax.dynamic_slice(drift, (0, o + D), (4, CHUNK)) + upd_b,
                (0, o + D),
            )
        return drift

    return jax.lax.fori_loop(0, cgs, chunk_body, drift)


def path_sgd_2d_strata_xla(g, coords0: np.ndarray, cfg=None) -> np.ndarray:
    """Any-backend run of the replica strata scheme; the semantic
    reference for path_sgd_2d_pallas, exercised by the CPU test suite.
    Matches the kernel chunk-for-chunk (same host scalars, same coin
    hash, same RMW ordering); the only numeric difference is the kernel's
    bf16 consensus matmuls vs exact f32/f64 here."""
    from .sgd import derive_config_2d

    if cfg is None:
        cfg = derive_config_2d(g)
    if not (g.path_step_count > 1).any():
        return np.asarray(coords0, np.float64)
    p = plan_run(g, cfg, one_d=False)
    data = p["data"]
    pr = data.planes.shape[1]
    flat = np.asarray(data.planes).reshape(data.planes.shape[0], -1)
    S = g.num_steps
    node = (g.step_handle >> 1).astype(np.int64)
    orient = (g.step_handle & 1).astype(np.int64)
    idx_cap = 2 * g.num_nodes + 2
    epf = np.full(pr * LANE, 2 * g.num_nodes, np.int64)
    epf[:S] = 2 * node + orient
    epr = epf ^ 1
    rr2 = np.repeat(np.bincount(node, minlength=g.num_nodes), 2).astype(np.float64)
    recip = np.zeros(idx_cap, np.float64)
    recip[: 2 * g.num_nodes] = np.where(rr2 > 0, 1.0 / np.maximum(rr2, 1), 0.0)

    pos0 = jnp.asarray(flat[_POS])
    pos1 = jnp.asarray(flat[_POSEND])
    path = jnp.asarray(flat[_PATH])
    o_arr = jnp.asarray(p["o_blk"])
    d_arr = jnp.asarray(p["d_arr"])
    eta_arr = jnp.asarray(p["eta_arr"])
    base_np = _pad_planes(_step_coord_planes(g, coords0), pr).reshape(4, -1)
    base = jnp.asarray(base_np)
    drift = jnp.zeros_like(base)
    xy = np.asarray(coords0, np.float64).copy()

    for gid in range(p["groups"]):
        drift = _twin_chunks_2d(
            drift, base, pos0, pos1, path, o_arr, d_arr, eta_arr,
            jnp.int32(gid * p["cgs"]), p["cgs"],
        )
        dv = np.asarray(drift, np.float32).astype(np.float64)
        accx = np.bincount(epf, weights=dv[0], minlength=idx_cap)
        accx += np.bincount(epr, weights=dv[1], minlength=idx_cap)
        accy = np.bincount(epf, weights=dv[2], minlength=idx_cap)
        accy += np.bincount(epr, weights=dv[3], minlength=idx_cap)
        updx = accx * recip
        updy = accy * recip
        xy[:, 0] += updx[: 2 * g.num_nodes]
        xy[:, 1] += updy[: 2 * g.num_nodes]
        bc = np.stack(
            [updx[epf], updx[epr], updy[epf], updy[epr]]
        ).astype(np.float32)
        # consensus collapse: base' = base + upd; drift restarts at zero
        base = jnp.asarray(np.asarray(base, np.float32) + bc)
        drift = jnp.zeros_like(base)
    return xy


@partial(jax.jit, static_argnames=("cgs",), donate_argnums=(0,))
def _twin_chunks_1d(drift, base, pos, path, o_arr, d_arr, eta_arr, g0,
                    cgs: int):
    def chunk_body(c, drift):
        gl = g0 + c
        o = o_arr[gl] * LANE
        D = d_arr[gl]
        eta_lr = eta_arr[gl]
        xa = (jax.lax.dynamic_slice(base, (o,), (CHUNK,))
              + jax.lax.dynamic_slice(drift, (o,), (CHUNK,)))
        xb = (jax.lax.dynamic_slice(base, (o + D,), (CHUNK,))
              + jax.lax.dynamic_slice(drift, (o + D,), (CHUNK,)))
        pa = jax.lax.dynamic_slice(pos, (o,), (CHUNK,))
        pb = jax.lax.dynamic_slice(pos, (o + D,), (CHUNK,))
        patha = jax.lax.dynamic_slice(path, (o,), (CHUNK,))
        pathb = jax.lax.dynamic_slice(path, (o + D,), (CHUNK,))
        di = pa - pb
        valid = jnp.logical_and(
            jnp.logical_and(patha == pathb, patha >= 0), di != 0
        )
        term = jnp.abs(di).astype(jnp.float32)
        w = 1.0 / jnp.maximum(term, 1e-30)
        mu = jnp.minimum(eta_lr * w, 1.0)
        dx = xa - xb
        dx = jnp.where(dx == 0.0, 1e-9, dx)
        mag = jnp.abs(dx)
        delta = mu * (mag - term) * 0.5
        rr = jnp.where(valid, delta / mag * dx, 0.0)
        drift = jax.lax.dynamic_update_slice(
            drift, jax.lax.dynamic_slice(drift, (o,), (CHUNK,)) - rr, (o,)
        )
        drift = jax.lax.dynamic_update_slice(
            drift,
            jax.lax.dynamic_slice(drift, (o + D,), (CHUNK,)) + rr,
            (o + D,),
        )
        return drift

    return jax.lax.fori_loop(0, cgs, chunk_body, drift)


def path_sgd_1d_strata_xla(g, cfg=None, x0=None) -> np.ndarray:
    """Any-backend twin of the 1D replica kernel (see
    path_sgd_2d_strata_xla)."""
    from .sgd import derive_config_1d

    if cfg is None:
        cfg = derive_config_1d(g)
    if not (g.path_step_count > 1).any():
        return g.node_offset.astype(np.float64)
    p = plan_run(g, cfg, one_d=True)
    data = p["data"]
    pr = data.planes.shape[1]
    flat = np.asarray(data.planes).reshape(data.planes.shape[0], -1)
    S = g.num_steps
    node = (g.step_handle >> 1).astype(np.int64)
    idx_cap = g.num_nodes + 1
    nd = np.full(pr * LANE, g.num_nodes, np.int64)
    nd[:S] = node
    rr = np.bincount(node, minlength=g.num_nodes).astype(np.float64)
    recip = np.zeros(idx_cap, np.float64)
    recip[: g.num_nodes] = np.where(rr > 0, 1.0 / np.maximum(rr, 1), 0.0)
    x0v = (
        g.node_offset.astype(np.float32)
        if x0 is None
        else np.asarray(x0, np.float32)
    )

    pos = jnp.asarray(flat[_P1_POS])
    path = jnp.asarray(flat[_P1_PATH])
    o_arr = jnp.asarray(p["o_blk"])
    d_arr = jnp.asarray(p["d_arr"])
    eta_arr = jnp.asarray(p["eta_arr"])
    base = jnp.asarray(
        _pad_planes(_step_x_plane(g, x0v)[None, :], pr).reshape(-1)
    )
    drift = jnp.zeros_like(base)
    xn = x0v.astype(np.float64).copy()

    for gid in range(p["groups"]):
        drift = _twin_chunks_1d(
            drift, base, pos, path, o_arr, d_arr, eta_arr,
            jnp.int32(gid * p["cgs"]), p["cgs"],
        )
        dv = np.asarray(drift, np.float32).astype(np.float64)
        acc = np.bincount(nd, weights=dv, minlength=idx_cap)
        upd = acc * recip
        xn += upd[: g.num_nodes]
        base = jnp.asarray(
            np.asarray(base, np.float32) + upd[nd].astype(np.float32)
        )
        drift = jnp.zeros_like(base)
    return xn
