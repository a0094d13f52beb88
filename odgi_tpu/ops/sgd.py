"""Path-guided SGD (1D sort + 2D layout): the hot kernels, TPU-native.

Re-designs the reference's Hogwild PG-SGD (reference:
src/algorithms/path_sgd.cpp:12-464 for 1D, src/algorithms/path_sgd_layout.cpp
and the SC'24 CUDA port src/cuda/layout.cu:190-287 for 2D) as batched
device-wide pair updates:

- All sampling state is a flat step tensor (the CUDA `element_array` model,
  reference: src/cuda/layout.h:30-47) plus the quantized zeta table.
- Per iteration we run `min_term_updates` term updates in batches of
  `batch_size`; within a batch, pair updates are computed against a common
  snapshot of the coordinates and merged by scatter-add.  The reference's
  CUDA kernel runs ALL of an iteration's updates against one snapshot with
  racing atomicExch stores (src/cuda/layout.cu:442-447,184-187), so our
  semantics are strictly *fresher* than the accelerator reference; the CPU
  Hogwild loop is fresher still but serial per pair.  Convergence is
  statistical in all three (the reference comments its own races "risky",
  path_sgd.cpp:367).
- RNG is counter-based threefry (`jax.random`), keyed by
  (seed, iteration, batch): deterministic for a fixed batch size/device
  count, unlike the reference's free-running per-thread Xoshiro
  (path_sgd.cpp:208-209) — this is our documented RNG contract.
- The learning-rate schedule and cooling phase are exact ports
  (path_sgd.cpp:466-501; first_cooling_iteration = floor(cooling_start *
  iter_max), path_sgd.cpp:44).  Like the CUDA port (layout.cu:239) and
  unlike the CPU path, theta stays constant during cooling (the CPU path
  swaps in theta=0.001 but keeps zetas computed for the original theta —
  path_sgd.cpp:146-148,194-197 — a mismatch we do not reproduce).

Coordinates are float32 (CUDA precedent: src/cuda/layout.h:21 uses float);
positions/distances are computed in int32 then cast, so term distances are
exact.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core.graph import GraphTensors, handle_is_reverse, handle_rank
from .zipf import zeta_index, zeta_table, zipf_sample


# ---------------------------------------------------------------------------
# Schedule (exact port of path_linear_sgd_schedule, path_sgd.cpp:466-501)
# ---------------------------------------------------------------------------


def sgd_schedule(
    w_min: float,
    w_max: float,
    iter_max: int,
    iter_with_max_learning_rate: int,
    eps: float,
) -> np.ndarray:
    eta_max = 1.0 / w_min
    eta_min = eps / w_max
    lam = math.log(eta_max / eta_min) / (iter_max - 1)
    t = np.arange(iter_max + 1, dtype=np.float64)
    etas = eta_max * np.exp(-lam * np.abs(t - iter_with_max_learning_rate))
    # CUDA guards NaN -> eta_min (layout.cu:312)
    return np.where(np.isfinite(etas), etas, eta_min)


# ---------------------------------------------------------------------------
# Static device-side sampling data
# ---------------------------------------------------------------------------


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "step_path", "step_node", "step_rev", "step_pos",
        "path_offset", "path_count", "node_len", "zetas",
    ],
    meta_fields=["num_steps", "num_nodes"],
)
@dataclass(frozen=True)
class SgdData:
    """Flattened sampling tensors (device-resident pytree)."""

    step_path: jnp.ndarray    # i32[S] path index per step
    step_node: jnp.ndarray    # i32[S] node rank per step
    step_rev: jnp.ndarray     # bool[S] orientation per step
    step_pos: jnp.ndarray     # i32[S] nt offset of step within its path
    path_offset: jnp.ndarray  # i32[P+1]
    path_count: jnp.ndarray   # i32[P]
    node_len: jnp.ndarray     # i32[N]
    zetas: jnp.ndarray        # f32[Z] quantized zeta table
    num_steps: int
    num_nodes: int

    @staticmethod
    def build(
        g: GraphTensors,
        theta: float,
        space: int,
        space_max: int,
        quant_step: int,
        use_paths: Optional[Sequence[int]] = None,
    ) -> "SgdData":
        if use_paths is not None and sorted(use_paths) != list(range(g.num_paths)):
            g = g.keep_paths(sorted(use_paths))
        zetas = zeta_table(space, space_max, quant_step, theta)
        return SgdData(
            step_path=jnp.asarray(g.step_path, jnp.int32),
            step_node=jnp.asarray(handle_rank(g.step_handle), jnp.int32),
            step_rev=jnp.asarray(handle_is_reverse(g.step_handle)),
            step_pos=jnp.asarray(g.step_pos, jnp.int32),
            path_offset=jnp.asarray(g.path_offset, jnp.int32),
            path_count=jnp.asarray(g.path_step_count, jnp.int32),
            node_len=jnp.asarray(g.node_len, jnp.int32),
            zetas=jnp.asarray(zetas, jnp.float32),
            num_steps=g.num_steps,
            num_nodes=g.num_nodes,
        )


@dataclass(frozen=True)
class SgdConfig:
    """PG-SGD parameters (defaults follow `odgi sort`/`odgi layout`;
    reference: sort_main.cpp:313-415, layout_main.cpp:198-266)."""

    iter_max: int
    min_term_updates: int
    eta_max: float
    eps: float = 0.01
    delta: float = 0.0
    iter_with_max_learning_rate: int = 0
    theta: float = 0.99
    space: int = 1
    space_max: int = 100
    space_quantization_step: int = 100
    cooling_start: float = 0.5
    batch_size: int = 8192
    seed: int = 9399220  # the reference's worker seed base (path_sgd.cpp:208)

    @property
    def first_cooling_iteration(self) -> int:
        return int(math.floor(self.cooling_start * self.iter_max))

    @property
    def num_batches(self) -> int:
        return max(1, -(-self.min_term_updates // self.batch_size))


def derive_config_1d(g: GraphTensors, **overrides) -> SgdConfig:
    """1D defaults (reference: sort_main.cpp:313-415): iter_max=100,
    min_term_updates=1*sum_steps, eta_max=max_steps^2, zipf space = max path
    length in NUCLEOTIDES, space_max=100, quantization derived from
    MAX_NUMBER_OF_ZIPF_DISTRIBUTIONS=100."""
    sum_steps = int(g.num_steps)
    max_steps = int(g.path_step_count.max()) if g.num_paths else 1
    space = int(g.path_length.max()) if g.num_paths else 1
    space_max = int(overrides.pop("space_max", 100))
    max_dists = max(space_max + 1, 100)
    if space > space_max:
        quant = max(2, -(-(space - space_max) // (max_dists - space_max)))
    else:
        quant = 100
    cfg = dict(
        iter_max=100,
        min_term_updates=sum_steps,
        eta_max=float(max_steps) ** 2,
        space=max(1, space),
        space_max=space_max,
        space_quantization_step=quant,
        theta=0.99,
        cooling_start=0.5,
    )
    cfg.update(overrides)
    return SgdConfig(**cfg)


def derive_config_2d(g: GraphTensors, **overrides) -> SgdConfig:
    """2D defaults (reference: layout_main.cpp:198-266): iter_max=30,
    min_term_updates=10*sum_steps, zipf space = max path STEP count,
    space_max=1000, quantization step 100."""
    sum_steps = int(g.num_steps)
    max_steps = int(g.path_step_count.max()) if g.num_paths else 1
    space = max(1, max_steps)
    cfg = dict(
        iter_max=30,
        min_term_updates=10 * sum_steps,
        eta_max=float(max_steps) ** 2,
        space=space,
        space_max=min(space, 1000),
        space_quantization_step=100,
        theta=0.99,
        cooling_start=0.5,
    )
    cfg.update(overrides)
    return SgdConfig(**cfg)


# ---------------------------------------------------------------------------
# Pair sampling (shared by 1D and 2D)
# ---------------------------------------------------------------------------


def _sample_pairs(key, data: SgdData, cfg: SgdConfig, cooling: bool):
    """Sample a batch of term pairs.

    Returns (step_a, step_b, valid): i32[B] step indices into the flat step
    tensor and a validity mask (paths with <2 steps are dropped, matching
    path_sgd.cpp:229-232 / layout.cu:212-214).

    Mirrors the reference sampling scheme exactly
    (path_sgd.cpp:215-279, layout.cu:205-246): uniform step over all path
    steps -> its path; with p=1/2 (or always when cooling) a Zipf-distributed
    jump along the same path (direction: backward with p=1/2 unless at the
    path ends), else a uniform second step in the path.
    """
    B = cfg.batch_size
    bits = jax.random.bits(key, (5, B), dtype=jnp.uint32)
    S = data.num_steps

    step_a = (bits[0] % jnp.uint32(S)).astype(jnp.int32)
    path = data.step_path[step_a]
    lo = data.path_offset[path]
    count = data.path_count[path]
    s_rank = step_a - lo
    valid = count > 1

    coin_zipf = (bits[1] & 1).astype(jnp.bool_)
    coin_dir = (bits[2] & 1).astype(jnp.bool_)
    # uniform in [0, 1) with 24-bit mantissa
    u = (bits[3] >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(2**-24)

    backward = ((s_rank > 0) & coin_dir) | (s_rank == count - 1)
    jump_space = jnp.minimum(
        jnp.int32(cfg.space), jnp.where(backward, s_rank, count - 1 - s_rank)
    )
    jump_space = jnp.maximum(jump_space, 1)
    zi = zipf_sample(
        u,
        jump_space,
        cfg.theta,
        data.zetas[2] if data.zetas.shape[0] > 2 else jnp.float32(1.0),
        data.zetas[
            zeta_index(jump_space, cfg.space_max, cfg.space_quantization_step)
        ],
    )
    s2_zipf = jnp.where(backward, s_rank - zi, s_rank + zi)
    s2_unif = (bits[4] % count.astype(jnp.uint32)).astype(jnp.int32)
    use_zipf = jnp.logical_or(coin_zipf, cooling)
    s2 = jnp.where(use_zipf, s2_zipf, s2_unif)
    s2 = jnp.clip(s2, 0, count - 1)
    step_b = lo + s2
    return step_a, step_b, valid


# ---------------------------------------------------------------------------
# 1D update (path_linear_sgd, path_sgd.cpp:304-396)
# ---------------------------------------------------------------------------


def _update_1d(X, key, data: SgdData, cfg: SgdConfig, eta, cooling: bool):
    step_a, step_b, valid = _sample_pairs(key, data, cfg, cooling)
    pos_a = data.step_pos[step_a]
    pos_b = data.step_pos[step_b]
    i = data.step_node[step_a]
    j = data.step_node[step_b]
    term_dist = jnp.abs(pos_a - pos_b).astype(jnp.float32)
    valid = valid & (term_dist != 0)
    w = 1.0 / jnp.maximum(term_dist, 1e-30)
    mu = jnp.minimum(eta * w, 1.0)
    dx = X[i] - X[j]
    dx = jnp.where(dx == 0.0, 1e-9, dx)
    mag = jnp.abs(dx)
    delta = mu * (mag - term_dist) / 2.0
    r_x = jnp.where(valid, delta / mag * dx, 0.0)
    # Merge conflicting updates by averaging: each pair update alone moves a
    # node by its full requested displacement (the reference applies them
    # sequentially / via racing atomicExch, layout.cu:184-187, so at most
    # ~one full displacement lands per node per wavefront); summing them
    # would overshoot and diverge, so we divide by the per-node hit count.
    v = valid.astype(jnp.float32)
    acc = jnp.zeros_like(X).at[i].add(-r_x).at[j].add(r_x)
    cnt = jnp.zeros_like(X).at[i].add(v).at[j].add(v)
    X = X + acc / jnp.maximum(cnt, 1.0)
    batch_max = jnp.max(jnp.where(valid, jnp.abs(delta), 0.0))
    return X, batch_max


@partial(
    jax.jit,
    static_argnames=("cfg", "cooling", "num_batches"),
    donate_argnums=(0,),
)
def sgd_1d_iteration(X, key, eta, data: SgdData, cfg: SgdConfig, cooling: bool, num_batches: int):
    """One full PG-SGD 1D iteration: `num_batches` batches of pair updates.
    Returns (X, Delta_max) for the host-side early-stop check
    (path_sgd.cpp:183-190)."""

    def body(b, carry):
        X, dmax = carry
        kb = jax.random.fold_in(key, b)
        X, batch_max = _update_1d(X, kb, data, cfg, eta, cooling)
        return X, jnp.maximum(dmax, batch_max)

    return jax.lax.fori_loop(0, num_batches, body, (X, jnp.float32(0.0)))


def path_sgd_1d(
    g: GraphTensors,
    cfg: Optional[SgdConfig] = None,
    use_paths: Optional[Sequence[int]] = None,
    x0: Optional[np.ndarray] = None,
    progress: bool = False,
) -> np.ndarray:
    """Run 1D PG-SGD; returns the final X positions (f64 host array).

    Seeds X with cumulative node lengths in current graph order
    (path_sgd.cpp:63-69).  Skips entirely when no path has >1 step
    (path_sgd.cpp:80-106).
    """
    if cfg is None:
        cfg = derive_config_1d(g)
    if not (g.path_step_count > 1).any():
        return g.node_offset.astype(np.float64)
    data = SgdData.build(
        g, cfg.theta, cfg.space, cfg.space_max, cfg.space_quantization_step, use_paths
    )
    X = jnp.asarray(
        g.node_offset.astype(np.float32) if x0 is None else np.asarray(x0, np.float32)
    )
    etas = sgd_schedule(
        1.0 / cfg.eta_max, 1.0, cfg.iter_max, cfg.iter_with_max_learning_rate, cfg.eps
    )
    key = jax.random.PRNGKey(cfg.seed)
    for it in range(cfg.iter_max):
        cooling = it > cfg.first_cooling_iteration
        X, dmax = sgd_1d_iteration(
            X,
            jax.random.fold_in(key, it),
            jnp.float32(etas[it]),
            data,
            cfg,
            cooling,
            cfg.num_batches,
        )
        if cfg.delta > 0 and float(dmax) <= cfg.delta:
            break
    return np.asarray(X, dtype=np.float64)


# ---------------------------------------------------------------------------
# 2D update (gpu_layout_kernel + update_pos_gpu, layout.cu:141-287)
# ---------------------------------------------------------------------------


def _endpoints_2d(key, data: SgdData, step_a, step_b):
    """Choose head/tail endpoints with orientation fix-up, exactly as the
    CUDA kernel (layout.cu:252-281).  Returns (ep_a, ep_b, pos_a, pos_b):
    endpoint indices into the (2N, 2) coords array and i32 path positions."""
    bits = jax.random.bits(key, (2, step_a.shape[0]), dtype=jnp.uint32)
    out = []
    for t, step in enumerate((step_a, step_b)):
        node = data.step_node[step]
        rev = data.step_rev[step]
        pos = data.step_pos[step] + 1  # CUDA pos starts at 1 (layout.cu:385)
        coin = (bits[t] & 1).astype(jnp.bool_)
        pos = jnp.where(coin, pos + data.node_len[node], pos)
        use_other = jnp.where(coin, ~rev, rev)
        ep = 2 * node + use_other.astype(jnp.int32)
        out.append((ep, pos))
    (ep_a, pos_a), (ep_b, pos_b) = out
    return ep_a, ep_b, pos_a, pos_b


def _update_2d(coords, key, data: SgdData, cfg: SgdConfig, eta, cooling: bool):
    key_pair, key_ep = jax.random.split(key)
    step_a, step_b, valid = _sample_pairs(key_pair, data, cfg, cooling)
    ep_a, ep_b, pos_a, pos_b = _endpoints_2d(key_ep, data, step_a, step_b)
    term_dist = jnp.abs(pos_a - pos_b).astype(jnp.float32)
    term_dist = jnp.maximum(term_dist, 1e-9)
    w = 1.0 / term_dist
    mu = jnp.minimum(eta * w, 1.0)
    d = coords[ep_a] - coords[ep_b]  # (B, 2)
    dx = jnp.where(d[:, 0] == 0.0, 1e-9, d[:, 0])
    dy = d[:, 1]
    mag = jnp.sqrt(dx * dx + dy * dy)
    delta = mu * (mag - term_dist) / 2.0
    r = jnp.where(valid, delta / mag, 0.0)
    upd = jnp.stack([r * dx, r * dy], axis=1)
    # Average conflicting endpoint updates (see _update_1d).
    v = valid.astype(jnp.float32)
    acc = jnp.zeros_like(coords).at[ep_a].add(-upd).at[ep_b].add(upd)
    cnt = jnp.zeros(coords.shape[0], jnp.float32).at[ep_a].add(v).at[ep_b].add(v)
    coords = coords + acc / jnp.maximum(cnt, 1.0)[:, None]
    batch_max = jnp.max(jnp.where(valid, jnp.abs(delta), 0.0))
    return coords, batch_max


@partial(
    jax.jit,
    static_argnames=("cfg", "cooling", "num_batches"),
    donate_argnums=(0,),
)
def sgd_2d_iteration(coords, key, eta, data: SgdData, cfg: SgdConfig, cooling: bool, num_batches: int):
    """One full PG-SGD 2D layout iteration (one CUDA kernel launch analog,
    layout.cu:442-447)."""

    def body(b, carry):
        coords, dmax = carry
        kb = jax.random.fold_in(key, b)
        coords, batch_max = _update_2d(coords, kb, data, cfg, eta, cooling)
        return coords, jnp.maximum(dmax, batch_max)

    return jax.lax.fori_loop(0, num_batches, body, (coords, jnp.float32(0.0)))


def path_sgd_2d(
    g: GraphTensors,
    coords0: np.ndarray,
    cfg: Optional[SgdConfig] = None,
    use_paths: Optional[Sequence[int]] = None,
    progress: bool = False,
) -> np.ndarray:
    """Run the 2D PG-SGD layout; returns coords (2N, 2) f64 host array.

    `coords0` is the (2N, 2) initial layout (see layout_init.py for the
    d/r/u/g/h init modes of layout_main.cpp:268-330).
    """
    if cfg is None:
        cfg = derive_config_2d(g)
    if not (g.path_step_count > 1).any():
        return np.asarray(coords0, np.float64)
    data = SgdData.build(
        g, cfg.theta, cfg.space, cfg.space_max, cfg.space_quantization_step, use_paths
    )
    coords = jnp.asarray(np.asarray(coords0, np.float32))
    etas = sgd_schedule(
        1.0 / cfg.eta_max, 1.0, cfg.iter_max, cfg.iter_with_max_learning_rate, cfg.eps
    )
    key = jax.random.PRNGKey(cfg.seed)
    for it in range(cfg.iter_max):
        cooling = it >= cfg.first_cooling_iteration  # CUDA: iter >= first (layout.cu:201)
        coords, dmax = sgd_2d_iteration(
            coords,
            jax.random.fold_in(key, it),
            jnp.float32(etas[it]),
            data,
            cfg,
            cooling,
            cfg.num_batches,
        )
        if cfg.delta > 0 and float(dmax) <= cfg.delta:
            break
    return np.asarray(coords, dtype=np.float64)
