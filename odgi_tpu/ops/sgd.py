"""Path-guided SGD (1D sort + 2D layout): the hot kernels, TPU-native.

Re-designs the reference's Hogwild PG-SGD (reference:
src/algorithms/path_sgd.cpp:12-464 for 1D, src/algorithms/path_sgd_layout.cpp
and the SC'24 CUDA port src/cuda/layout.cu:190-287 for 2D) as batched
device-wide pair updates.  TPUs have neither fast random scalar access nor
atomics, so the kernel is shaped around three facts of the hardware:

1. **No integer divide** — every range reduction is a float multiply on
   24-bit uniforms (exact below 2^24; the CUDA kernel's `%` reduction,
   layout.cu:207, has the same bias class).
2. **Random gathers cost ~0.2 ms per 32k-lane batch; contiguous reads are
   free.**  The first step of each term pair is therefore drawn by walking
   a PRE-PERMUTED copy of the step table sequentially (classic shuffled-
   epoch SGD: uniform marginal, exactly-once coverage per epoch, and
   empirically at least as good as iid draws).  All of a step's sampling
   attributes are denormalized into one 8-column row so the second step
   costs a single row gather instead of eight scalar gathers.
3. **Scatter serializes on the scalar core; the MXU does not.**  The
   coordinate update merges each batch's conflicting pair updates by a
   per-node mean computed with factored one-hot matmuls (ops/scatter.py) —
   dense systolic work replacing the CUDA kernel's atomicExch race
   (layout.cu:184-187).  Mean-merge keeps batched updates stable where
   summing would diverge; one-update-per-node-per-wavefront is also what
   the atomicExch race effectively applies.

RNG is counter-based threefry keyed by (seed, iteration, batch):
deterministic for a fixed batch size / device count — our documented RNG
contract (the reference is nondeterministic across threads,
path_sgd.cpp:208-209, so only converged order/stress is comparable).

The learning-rate schedule and cooling phase are exact ports
(path_sgd.cpp:466-501; first_cooling_iteration = floor(cooling_start *
iter_max)).  Like the CUDA port (layout.cu:239) and unlike the CPU path,
theta stays constant during cooling (the CPU path swaps in theta=0.001 but
keeps zetas computed for the original theta — path_sgd.cpp:146-148,194-197
— a mismatch we measured to *hurt* quality and do not reproduce).

Coordinates are float32 (CUDA precedent: src/cuda/layout.h:21); positions
and term distances are integer i32, cast after subtraction, so distances
are exact.
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
from .scatter import factored_gather, scatter_mean_apply
from .zipf import zeta_eta_table, zeta_index, zeta_table, zipf_sample

# A-table rows (transposed: (8, 2S) so a batch is a lane-contiguous
# dynamic slice; the (2S, 8) row-major layout pads 8 -> 128 lanes and made
# the per-batch slice 16x more HBM traffic).
_A_LO, _A_RANK, _A_COUNT, _A_POS, _A_POSEND, _A_HANDLE = range(6)
_A_COLS = 8  # padded to 8 sublanes for tile alignment
# B-table columns (true step order, row-gathered for the second step).
_B_POS, _B_POSEND, _B_HANDLE = range(3)
_B_COLS = 4


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
    lam = (
        math.log(eta_max / eta_min) / (iter_max - 1) if iter_max > 1 else 0.0
    )
    t = np.arange(iter_max + 1, dtype=np.float64)
    etas = eta_max * np.exp(-lam * np.abs(t - iter_with_max_learning_rate))
    # CUDA guards NaN -> eta_min (layout.cu:312)
    return np.where(np.isfinite(etas), etas, eta_min)


# ---------------------------------------------------------------------------
# Static device-side sampling data
# ---------------------------------------------------------------------------


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["tab_a", "tab_b", "tab_b_f", "zetas", "zeta_eta"],
    meta_fields=["num_steps", "num_nodes", "tables_exact"],
)
@dataclass(frozen=True)
class SgdData:
    """Device-resident sampling tensors (pytree).

    tab_a: i32 (8, 2*S) — the step table in a fixed random permutation,
        TRANSPOSED so a batch is one lane-contiguous dynamic slice, and
        doubled so any length<=S slice wraps; rows
        [path_first_step, step_rank_in_path, path_step_count,
         pos, pos_end, packed_handle, 0, 0].
        This subsumes the XP index's np_bv/nr_iv/npi_iv sampling triple
        (reference: src/algorithms/xp.hpp:168-174) and the per-path
        position lookups, denormalized per step.
    tab_b: i32 (S, 4) — [pos, pos_end, packed_handle, 0] in true step
        order, addressed by first_step + jumped_rank.
    zetas: f32 quantized zeta table (reference: path_sgd.cpp:128-138).
    zeta_eta: f32 (T, 2) [zeta, eta] per entry (see zipf.zeta_eta_table).
    """

    tab_a: jnp.ndarray
    tab_b: jnp.ndarray
    tab_b_f: jnp.ndarray  # f32 copy of tab_b for the MXU-factored gather
    zetas: jnp.ndarray
    zeta_eta: jnp.ndarray
    num_steps: int
    num_nodes: int
    tables_exact: bool  # all tab_b values < 2^24 (f32-exact for MXU path)

    @staticmethod
    def build(
        g: GraphTensors,
        theta: float,
        space: int,
        space_max: int,
        quant_step: int,
        use_paths: Optional[Sequence[int]] = None,
        perm_seed: int = 421,
    ) -> "SgdData":
        if use_paths is not None and sorted(use_paths) != list(range(g.num_paths)):
            g = g.keep_paths(sorted(use_paths))
        S = g.num_steps
        handle = g.step_handle.astype(np.int64)
        node = (handle >> 1).astype(np.int64)
        pos = g.step_pos.astype(np.int64)
        pos_end = pos + g.node_len[node]
        lo = g.path_offset[g.step_path].astype(np.int64)
        rank = np.arange(S, dtype=np.int64) - lo
        count = g.path_step_count[g.step_path].astype(np.int64)

        a = np.zeros((max(S, 1), _A_COLS), dtype=np.int32)
        if S:
            a[:, _A_LO] = lo
            a[:, _A_RANK] = rank
            a[:, _A_COUNT] = count
            a[:, _A_POS] = pos
            a[:, _A_POSEND] = pos_end
            a[:, _A_HANDLE] = handle
            perm = np.random.default_rng(perm_seed).permutation(S)
            a = a[perm]
        tab_a = np.ascontiguousarray(np.concatenate([a, a], axis=0).T)

        b = np.zeros((max(S, 1), _B_COLS), dtype=np.int32)
        if S:
            b[:, _B_POS] = pos
            b[:, _B_POSEND] = pos_end
            b[:, _B_HANDLE] = handle

        zetas = zeta_table(space, space_max, quant_step, theta)
        return SgdData(
            tab_a=jnp.asarray(tab_a),
            tab_b=jnp.asarray(b),
            tab_b_f=jnp.asarray(b, jnp.float32),
            zetas=jnp.asarray(zetas, jnp.float32),
            zeta_eta=jnp.asarray(
                zeta_eta_table(space, space_max, quant_step, theta)
            ),
            num_steps=S,
            num_nodes=g.num_nodes,
            tables_exact=bool(b.max(initial=0) < 2**24),
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
    batch_size: int = 32768
    seed: int = 9399220  # the reference's worker seed base (path_sgd.cpp:208)
    mxu_coords: bool = True  # factored one-hot coords ops (vs XLA scatter)
    mxu_tables: bool = True  # factored one-hot step-table gather (vs XLA)
    pallas: bool = True  # fused Pallas hot kernel when supported (2D, TPU;
    # see ops/pallas_sgd.py — falls back to the XLA path otherwise)
    rng_impl: str = "rbg"  # hardware RNG; 'threefry2x32' for splittability

    @property
    def first_cooling_iteration(self) -> int:
        return int(math.floor(self.cooling_start * self.iter_max))

    @property
    def num_batches(self) -> int:
        return max(1, -(-self.min_term_updates // self.batch_size))


def _clamp_batch(batch_size: int, num_steps: int, epoch_div: int = 4) -> int:
    """Batch must not exceed the step count (the A-table walk wraps once),
    and is capped at S/epoch_div so an epoch spans several coordinate
    snapshots: merging a whole epoch against one snapshot measurably hurts
    1D convergence (full staleness), so 1D uses epoch_div=4 (matches iid
    quality); 2D runs 10 epochs per iteration and tolerates epoch_div=2
    (stress 1.21 -> 1.23 on DRB1 while halving per-batch overhead)."""
    if num_steps <= 0:
        return 1
    cap = max(1, num_steps // epoch_div) if num_steps >= 2 * epoch_div else num_steps
    return max(1, min(batch_size, cap))


def _platform_defaults(overrides: dict) -> dict:
    """Resolve backend-dependent dispatch defaults: the factored one-hot
    MXU formulation only pays on TPU (CPU/GPU XLA scatter-gather is fine
    and the one-hot matmuls are slow there)."""
    on_tpu = jax.default_backend() == "tpu"
    overrides.setdefault("mxu_coords", on_tpu)
    overrides.setdefault("mxu_tables", on_tpu)
    return overrides


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
    overrides = _platform_defaults(overrides)
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
    cfg["batch_size"] = _clamp_batch(
        cfg.get("batch_size", SgdConfig.batch_size), sum_steps, epoch_div=4
    )
    return SgdConfig(**cfg)


def derive_config_2d(g: GraphTensors, **overrides) -> SgdConfig:
    """2D defaults (reference: layout_main.cpp:198-266): iter_max=30,
    min_term_updates=10*sum_steps, zipf space = max path STEP count,
    space_max=1000, quantization step 100."""
    sum_steps = int(g.num_steps)
    max_steps = int(g.path_step_count.max()) if g.num_paths else 1
    space = max(1, max_steps)
    overrides = _platform_defaults(overrides)
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
    cfg["batch_size"] = _clamp_batch(
        cfg.get("batch_size", SgdConfig.batch_size), sum_steps, epoch_div=2
    )
    return SgdConfig(**cfg)


# ---------------------------------------------------------------------------
# Pair sampling (shared by 1D and 2D)
# ---------------------------------------------------------------------------


def _u24(word):
    """uint32 -> uniform f32 in [0, 1) with 24-bit resolution."""
    return (word >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(2**-24)


def _sample_pairs(key, start, data: SgdData, cfg: SgdConfig, cooling):
    """Sample one batch of term pairs.

    First steps: B consecutive rows of the permuted A-table starting at
    `start` (wraps via the doubled table).  Second steps mirror the
    reference scheme exactly (path_sgd.cpp:245-279, layout.cu:222-246):
    with p=1/2 (or always when cooling) a Zipf jump along the path
    (backward with p=1/2 unless at the ends), else uniform in the path.

    Returns (cols_a (8,B) i32, rows_b (B,4) i32, valid mask).
    """
    B = cfg.batch_size
    cols_a = jax.lax.dynamic_slice(data.tab_a, (0, start), (_A_COLS, B))
    lo = cols_a[_A_LO]
    s_rank = cols_a[_A_RANK]
    count = cols_a[_A_COUNT]
    valid = count > 1

    # Two random words per lane: word0 feeds the branch coins (bits 0-1)
    # and the Zipf uniform (bits 8-31); word1 feeds the uniform second step
    # (bits 8-31) and the 2D endpoint coins (bits 0-1, used by the caller).
    bits = jax.random.bits(key, (2, B), dtype=jnp.uint32)
    w0, w1 = bits[0], bits[1]
    coin_zipf = (w0 & 1).astype(jnp.bool_)
    coin_dir = (w0 & 2).astype(jnp.bool_)
    u = _u24(w0)

    backward = ((s_rank > 0) & coin_dir) | (s_rank == count - 1)
    jump_space = jnp.minimum(
        jnp.int32(cfg.space), jnp.where(backward, s_rank, count - 1 - s_rank)
    )
    jump_space = jnp.maximum(jump_space, 1)
    ze = factored_gather(
        data.zeta_eta,
        zeta_index(jump_space, cfg.space_max, cfg.space_quantization_step),
    )
    zi = zipf_sample(
        u,
        jump_space,
        cfg.theta,
        data.zetas[2] if data.zetas.shape[0] > 2 else jnp.float32(1.0),
        ze[:, 0],
        eta=ze[:, 1],
    )
    s2_zipf = jnp.where(backward, s_rank - zi, s_rank + zi)
    s2_unif = jnp.floor(_u24(w1) * count.astype(jnp.float32)).astype(jnp.int32)
    use_zipf = jnp.logical_or(coin_zipf, cooling)
    s2 = jnp.clip(jnp.where(use_zipf, s2_zipf, s2_unif), 0, count - 1)
    step_b = lo + s2
    if cfg.mxu_tables and data.tables_exact:
        rows_b = factored_gather(data.tab_b_f, step_b).astype(jnp.int32)
    else:
        rows_b = data.tab_b[step_b]
    return cols_a, rows_b, valid, w1


# ---------------------------------------------------------------------------
# 1D update (path_linear_sgd, path_sgd.cpp:304-396)
# ---------------------------------------------------------------------------


def _update_1d(X, key, start, data: SgdData, cfg: SgdConfig, eta, cooling, pin=None):
    cols_a, rows_b, valid, _ = _sample_pairs(key, start, data, cfg, cooling)
    pos_a = cols_a[_A_POS]
    pos_b = rows_b[:, _B_POS]
    i = cols_a[_A_HANDLE] >> 1
    j = rows_b[:, _B_HANDLE] >> 1
    term_dist = jnp.abs(pos_a - pos_b).astype(jnp.float32)
    valid = valid & (term_dist != 0)
    w = 1.0 / jnp.maximum(term_dist, 1e-30)
    mu = jnp.minimum(eta * w, 1.0)
    if cfg.mxu_coords:
        Xc = X[:, None]
        xi = factored_gather(Xc, i)[:, 0]
        xj = factored_gather(Xc, j)[:, 0]
    else:
        xi = X[i]
        xj = X[j]
    dx = xi - xj
    dx = jnp.where(dx == 0.0, 1e-9, dx)
    mag = jnp.abs(dx)
    delta = mu * (mag - term_dist) / 2.0
    r_x = jnp.where(valid, delta / mag * dx, 0.0)
    # Merge conflicting updates by per-node averaging (see module docstring).
    if cfg.mxu_coords:
        Xn = scatter_mean_apply(
            X[:, None], [i, j], [-r_x[:, None], r_x[:, None]], valid
        )[:, 0]
    else:
        v = valid.astype(jnp.float32)
        acc = jnp.zeros_like(X).at[i].add(-r_x).at[j].add(r_x)
        cnt = jnp.zeros_like(X).at[i].add(v).at[j].add(v)
        Xn = X + acc / jnp.maximum(cnt, 1.0)
    if pin is not None:
        # target-path pinning: pinned nodes never move
        # (reference: path_sgd.cpp:285-302,387-392 target_sorting)
        Xn = jnp.where(pin, X, Xn)
    batch_max = jnp.max(jnp.where(valid, jnp.abs(delta), 0.0))
    return Xn, batch_max


# ---------------------------------------------------------------------------
# 2D update (gpu_layout_kernel + update_pos_gpu, layout.cu:141-287)
# ---------------------------------------------------------------------------


def _endpoints_2d(coin, handle, pos0, pos1):
    """Choose head/tail endpoints with orientation fix-up, exactly as the
    CUDA kernel (layout.cu:252-281).  `coin` is a bool per lane.  Returns
    (ep, pos): endpoint index into the (2N, 2) coords array and the i32
    path position (CUDA's pos starts at 1, layout.cu:385; ours is 0-based —
    the shift cancels in the distance)."""
    node = handle >> 1
    rev = (handle & 1).astype(jnp.bool_)
    pos = jnp.where(coin, pos1, pos0)
    use_other = jnp.where(coin, ~rev, rev)
    ep = 2 * node + use_other.astype(jnp.int32)
    return ep, pos


def _update_2d(coords, key, start, data: SgdData, cfg: SgdConfig, eta, cooling, pin_ep=None):
    cols_a, rows_b, valid, w1 = _sample_pairs(key, start, data, cfg, cooling)
    coin_a = (w1 & 1).astype(jnp.bool_)
    coin_b = (w1 & 2).astype(jnp.bool_)
    ep_a, pos_a = _endpoints_2d(
        coin_a, cols_a[_A_HANDLE], cols_a[_A_POS], cols_a[_A_POSEND]
    )
    ep_b, pos_b = _endpoints_2d(
        coin_b, rows_b[:, _B_HANDLE], rows_b[:, _B_POS], rows_b[:, _B_POSEND]
    )
    term_dist = jnp.maximum(jnp.abs(pos_a - pos_b).astype(jnp.float32), 1e-9)
    mu = jnp.minimum(eta / term_dist, 1.0)
    if cfg.mxu_coords:
        ca = factored_gather(coords, ep_a)
        cb = factored_gather(coords, ep_b)
    else:
        ca = coords[ep_a]
        cb = coords[ep_b]
    d = ca - cb
    dx = jnp.where(d[:, 0] == 0.0, 1e-9, d[:, 0])
    dy = d[:, 1]
    mag = jnp.sqrt(dx * dx + dy * dy)
    delta = mu * (mag - term_dist) / 2.0
    r = jnp.where(valid, delta / mag, 0.0)
    upd = jnp.stack([r * dx, r * dy], axis=1)
    if cfg.mxu_coords:
        out = scatter_mean_apply(coords, [ep_a, ep_b], [-upd, upd], valid)
    else:
        v = valid.astype(jnp.float32)
        acc = jnp.zeros_like(coords).at[ep_a].add(-upd).at[ep_b].add(upd)
        cnt = (
            jnp.zeros(coords.shape[0], jnp.float32).at[ep_a].add(v).at[ep_b].add(v)
        )
        out = coords + acc / jnp.maximum(cnt, 1.0)[:, None]
    if pin_ep is not None:
        out = jnp.where(pin_ep[:, None], coords, out)
    batch_max = jnp.max(jnp.where(valid, jnp.abs(delta), 0.0))
    return out, batch_max


# ---------------------------------------------------------------------------
# Full-run drivers: one device program per optimization
# ---------------------------------------------------------------------------


def _batch_start(global_batch, B: int, S: int):
    """A-table offset of a batch: (global_batch * B) mod S, computed with
    scalar f64-free arithmetic (S < 2^31; one scalar mod is fine)."""
    return (global_batch * B) % S


@partial(jax.jit, static_argnames=("cfg", "num_batches"), donate_argnums=(0,))
def sgd_1d_run(X, key, etas, data: SgdData, cfg: SgdConfig, num_batches: int, pin=None):
    """The COMPLETE 1D PG-SGD run in one device program: a fori_loop over
    iterations, each running `num_batches` update batches.

    One dispatch for the whole optimization — the analog of the CUDA host
    loop of kernel launches (layout.cu:442-447) but without per-iteration
    host round-trips (which dominate when the device sits behind a network
    tunnel).  Cooling is a traced per-iteration predicate.
    """
    first_cooling = cfg.first_cooling_iteration
    B, S = cfg.batch_size, data.num_steps

    def iter_body(it, X):
        eta = etas[it]
        cooling = it > first_cooling
        key_it = jax.random.fold_in(key, it)

        def body(b, X):
            kb = jax.random.fold_in(key_it, b)
            start = _batch_start(it * num_batches + b, B, S)
            X, _ = _update_1d(X, kb, start, data, cfg, eta, cooling, pin)
            return X

        return jax.lax.fori_loop(0, num_batches, body, X)

    return jax.lax.fori_loop(0, cfg.iter_max, iter_body, X)


@partial(
    jax.jit,
    static_argnames=("cfg", "cooling", "num_batches"),
    donate_argnums=(0,),
)
def sgd_1d_iteration(X, key, eta, it, data: SgdData, cfg: SgdConfig, cooling: bool, num_batches: int, pin=None):
    """One 1D iteration (used when delta-based early stopping needs
    per-iteration Delta_max on the host; path_sgd.cpp:183-190)."""
    B, S = cfg.batch_size, data.num_steps

    def body(b, carry):
        X, dmax = carry
        kb = jax.random.fold_in(key, b)
        start = _batch_start(it * num_batches + b, B, S)
        X, batch_max = _update_1d(X, kb, start, data, cfg, eta, cooling, pin)
        return X, jnp.maximum(dmax, batch_max)

    return jax.lax.fori_loop(0, num_batches, body, (X, jnp.float32(0.0)))


def path_sgd_1d(
    g: GraphTensors,
    cfg: Optional[SgdConfig] = None,
    use_paths: Optional[Sequence[int]] = None,
    x0: Optional[np.ndarray] = None,
    progress: bool = False,
    pin_nodes: Optional[np.ndarray] = None,
    snapshot_cb=None,
) -> np.ndarray:
    """Run 1D PG-SGD; returns the final X positions (f64 host array).

    Seeds X with cumulative node lengths in current graph order
    (path_sgd.cpp:63-69).  Skips entirely when no path has >1 step
    (path_sgd.cpp:80-106).

    `pin_nodes` (bool[N]) freezes target-path nodes (reference:
    path_sgd.cpp:285-302 target_sorting); `snapshot_cb(it, X)` is invoked
    with the host X after every iteration (reference: the -u snapshot
    thread, path_sgd.cpp:408-433) and forces the per-iteration driver.
    """
    if cfg is None:
        cfg = derive_config_1d(g)
    if not (g.path_step_count > 1).any():
        return g.node_offset.astype(np.float64)
    if cfg.pallas and pin_nodes is None and snapshot_cb is None:
        from .pallas_sgd import pallas_supported_1d, path_sgd_1d_pallas
        from .pallas_sgd_xl import path_sgd_1d_pallas_xl, xl_supported_1d
        from .pallas_sgd_xxl import path_sgd_1d_pallas_xxl, xxl_supported_1d

        g_eff = g
        if use_paths is not None and sorted(use_paths) != list(range(g.num_paths)):
            g_eff = g.keep_paths(sorted(use_paths))
        if pallas_supported_1d(g_eff, cfg):
            return path_sgd_1d_pallas(g_eff, cfg, x0=x0)
        if cfg.delta > 0:
            import sys as _sys

            print(
                "[odgi_tpu::sgd] note: delta early-stop (-j) with a "
                "graph beyond the VMEM-resident kernel falls back to "
                "the slower XLA path",
                file=_sys.stderr,
            )
        if xl_supported_1d(g_eff, cfg):
            return path_sgd_1d_pallas_xl(g_eff, cfg, x0=x0)
        if xxl_supported_1d(g_eff, cfg):
            # node count past the capped kernels: block-merge variant
            return path_sgd_1d_pallas_xxl(g_eff, cfg, x0=x0)
    data = SgdData.build(
        g, cfg.theta, cfg.space, cfg.space_max, cfg.space_quantization_step, use_paths
    )
    X = jnp.asarray(
        g.node_offset.astype(np.float32) if x0 is None else np.asarray(x0, np.float32)
    )
    pin = jnp.asarray(pin_nodes, bool) if pin_nodes is not None else None
    etas = sgd_schedule(
        1.0 / cfg.eta_max, 1.0, cfg.iter_max, cfg.iter_with_max_learning_rate, cfg.eps
    )
    key = jax.random.key(cfg.seed, impl=cfg.rng_impl)
    if cfg.delta <= 0 and snapshot_cb is None:
        X = sgd_1d_run(
            X, key, jnp.asarray(etas, jnp.float32), data, cfg, cfg.num_batches, pin
        )
    else:
        for it in range(cfg.iter_max):
            cooling = it > cfg.first_cooling_iteration
            X, dmax = sgd_1d_iteration(
                X,
                jax.random.fold_in(key, it),
                jnp.float32(etas[it]),
                it,
                data,
                cfg,
                cooling,
                cfg.num_batches,
                pin,
            )
            if snapshot_cb is not None:
                snapshot_cb(it, np.asarray(X, dtype=np.float64))
            if cfg.delta > 0 and float(dmax) <= cfg.delta:
                break
    return np.asarray(X, dtype=np.float64)


@partial(jax.jit, static_argnames=("cfg", "num_batches"), donate_argnums=(0,))
def sgd_2d_run(coords, key, etas, data: SgdData, cfg: SgdConfig, num_batches: int, pin_ep=None):
    """The COMPLETE 2D layout run in one device program (see sgd_1d_run)."""
    first_cooling = cfg.first_cooling_iteration
    B, S = cfg.batch_size, data.num_steps

    def iter_body(it, coords):
        eta = etas[it]
        cooling = it >= first_cooling  # CUDA: iter >= first (layout.cu:201)
        key_it = jax.random.fold_in(key, it)

        def body(b, coords):
            kb = jax.random.fold_in(key_it, b)
            start = _batch_start(it * num_batches + b, B, S)
            coords, _ = _update_2d(coords, kb, start, data, cfg, eta, cooling, pin_ep)
            return coords

        return jax.lax.fori_loop(0, num_batches, body, coords)

    return jax.lax.fori_loop(0, cfg.iter_max, iter_body, coords)


@partial(
    jax.jit,
    static_argnames=("cfg", "cooling", "num_batches"),
    donate_argnums=(0,),
)
def sgd_2d_iteration(coords, key, eta, it, data: SgdData, cfg: SgdConfig, cooling: bool, num_batches: int, pin_ep=None):
    """One 2D layout iteration (delta-based early-stop path)."""
    B, S = cfg.batch_size, data.num_steps

    def body(b, carry):
        coords, dmax = carry
        kb = jax.random.fold_in(key, b)
        start = _batch_start(it * num_batches + b, B, S)
        coords, batch_max = _update_2d(coords, kb, start, data, cfg, eta, cooling, pin_ep)
        return coords, jnp.maximum(dmax, batch_max)

    return jax.lax.fori_loop(0, num_batches, body, (coords, jnp.float32(0.0)))


def path_sgd_2d(
    g: GraphTensors,
    coords0: np.ndarray,
    cfg: Optional[SgdConfig] = None,
    use_paths: Optional[Sequence[int]] = None,
    progress: bool = False,
    pin_nodes: Optional[np.ndarray] = None,
    snapshot_cb=None,
) -> np.ndarray:
    """Run the 2D PG-SGD layout; returns coords (2N, 2) f64 host array.

    `coords0` is the (2N, 2) initial layout (see layout.py for the
    d/r/u/g/h init modes of layout_main.cpp:268-330).  `pin_nodes` freezes
    target-path nodes; `snapshot_cb(it, coords)` receives per-iteration
    coordinates (the -u snapshot thread, path_sgd_layout.cpp:379-408) and
    forces the per-iteration driver.  Both disable the fused Pallas path.
    """
    if cfg is None:
        cfg = derive_config_2d(g)
    if not (g.path_step_count > 1).any():
        return np.asarray(coords0, np.float64)
    if cfg.pallas and pin_nodes is None and snapshot_cb is None:
        from .pallas_sgd import pallas_supported, path_sgd_2d_pallas
        from .pallas_sgd_xl import path_sgd_2d_pallas_xl, xl_supported
        from .pallas_sgd_xxl import path_sgd_2d_pallas_xxl, xxl_supported

        g_eff = g
        if use_paths is not None and sorted(use_paths) != list(range(g.num_paths)):
            g_eff = g.keep_paths(sorted(use_paths))
        if pallas_supported(g_eff, cfg):
            return path_sgd_2d_pallas(g_eff, coords0, cfg, interpret=False)
        if cfg.delta > 0:
            import sys as _sys

            print(
                "[odgi_tpu::sgd] note: delta early-stop (-j) with a "
                "graph beyond the VMEM-resident kernel falls back to "
                "the slower XLA path",
                file=_sys.stderr,
            )
        if xl_supported(g_eff, cfg):
            # VMEM-resident planes don't fit: HBM-streaming variant
            return path_sgd_2d_pallas_xl(g_eff, coords0, cfg)
        if xxl_supported(g_eff, cfg):
            # node count past the capped kernels: block-merge variant
            return path_sgd_2d_pallas_xxl(g_eff, coords0, cfg)
    data = SgdData.build(
        g, cfg.theta, cfg.space, cfg.space_max, cfg.space_quantization_step, use_paths
    )
    coords = jnp.asarray(np.asarray(coords0, np.float32))
    pin_ep = (
        jnp.asarray(np.repeat(np.asarray(pin_nodes, bool), 2))
        if pin_nodes is not None
        else None
    )
    etas = sgd_schedule(
        1.0 / cfg.eta_max, 1.0, cfg.iter_max, cfg.iter_with_max_learning_rate, cfg.eps
    )
    key = jax.random.key(cfg.seed, impl=cfg.rng_impl)
    if cfg.delta <= 0 and snapshot_cb is None:
        coords = sgd_2d_run(
            coords, key, jnp.asarray(etas, jnp.float32), data, cfg,
            cfg.num_batches, pin_ep,
        )
    else:
        for it in range(cfg.iter_max):
            cooling = it >= cfg.first_cooling_iteration
            coords, dmax = sgd_2d_iteration(
                coords,
                jax.random.fold_in(key, it),
                jnp.float32(etas[it]),
                it,
                data,
                cfg,
                cooling,
                cfg.num_batches,
                pin_ep,
            )
            if snapshot_cb is not None:
                snapshot_cb(it, np.asarray(coords, dtype=np.float64))
            if cfg.delta > 0 and float(dmax) <= cfg.delta:
                break
    return np.asarray(coords, dtype=np.float64)
