"""Fused Pallas TPU kernel for the PG-SGD layout/sort hot loop.

The entire optimization (all iterations, all batches) runs as ONE
`pallas_call`: coordinates live in the revisited VMEM output block for the
whole run, update accumulators live in VMEM scratch, and the step table is
VMEM-resident — zero HBM round-trips between the first and last pair
update.  This replaces the per-iteration CUDA kernel-launch loop of the
SC'24 GPU port (reference: src/cuda/layout.cu:442-447).

The design is shaped by what a TPU can and cannot do fast:

- **No random memory access**: the reference's per-term random step pair
  (reference: src/algorithms/path_sgd_layout.cpp:100-377, layout.cu:190-287)
  would need two random gathers per term.  Instead each CHUNK of 1024
  pairs shares ONE jump distance D drawn from the same quantized-zeta Zipf
  distribution (reference: path_sgd.cpp:124-138; closed-form inverse as in
  cuda_rnd_zipf, layout.cu:89-113): the pairs are (step[o+i], step[o+i+D])
  for a random 128-aligned window offset o, so BOTH sides of every pair
  are contiguous VMEM slices (the partner side is a dynamic lane-rotate by
  D mod 128 — a single-cycle vector op).  Pairs that cross a path boundary
  are masked invalid; the surviving conditional distribution of D given a
  step's position equals the reference's end-clamped Zipf (truncation and
  renormalization commute).  Stratifying the Zipf draw per chunk was
  validated to CONVERGE BETTER than the fixture: DRB1 default stress ~1.25
  vs fixture 1.2855 (guarded by tests and bench.py's assertion).
- **Pre-cooling uniform terms** (reference: path_sgd.cpp:274-279) use a
  uniform jump D ~ U[1, space) with the same masking; after cooling all
  chunks are Zipf, as in the CUDA port (layout.cu:239).
- **Per-chunk scalars ride scalar prefetch (SMEM), not the scalar core**:
  the window offset o, jump D and learning rate eta of every chunk are
  precomputed on the HOST (numpy Philox keyed by cfg.seed) and passed as
  SMEM arrays via PrefetchScalarGridSpec.  An earlier revision derived
  them in-kernel from a splitmix hash + the closed-form Zipf inverse;
  profiling showed that scalar chain (hash, exp, log per chunk) cost
  ~4 us/chunk — a third of the whole kernel.  Only the per-PAIR endpoint
  coins stay on the hardware PRNG, seeded ONCE for the whole run.
- **Coordinate gather/scatter ride the MXU** as factored one-hot matmuls;
  with the strata trick removing the step-table gather, these are the
  only "random access" left and they are batched systolic work.  All
  matmuls run as SINGLE bf16 passes: the one-hot operand is exact in
  bf16, the coordinate operand is split hi+lo bf16 (2 passes reconstruct
  full f32 — see _split_bf16), and the scatter operand is a stochastic
  delta where 8-bit mantissa truncation is zero-mean noise (measured
  stress-neutral on DRB1).  Mosaic's only exact alternative, HIGHEST,
  costs 6 passes.
- Hogwild merging (reference: "try until we succeed. risky.",
  path_sgd.cpp:367-375) becomes a per-endpoint mean-merge applied at batch
  boundaries (nch chunks per batch), the same batched-update contract as
  ops/sgd.py.

RNG contract for this path: chunk scalars from numpy Philox(cfg.seed),
per-pair coins from the TPU core PRNG seeded with cfg.seed — deterministic
for fixed config (the reference's Hogwild threads are nondeterministic
anyway; only converged stress is comparable — reference:
path_sgd.cpp:208-209).

Update math is identical to ops/sgd.py (reference: src/cuda/layout.cu:
141-188): mu = min(eta/d, 1); Delta = mu*(mag - d)/2; head/tail endpoint
choice with orientation fix-up (layout.cu:251-281); the learning-rate
schedule is the exact closed form of path_linear_sgd_schedule (reference:
path_sgd.cpp:466-501), evaluated on the host into the per-chunk eta array.
"""

from __future__ import annotations

import math
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
RC = int(os.environ.get("ODGI_TPU_PALLAS_RC", "8"))  # sublane rows per chunk
CHUNK = RC * LANE      # pairs per chunk (one shared jump distance)
_POS, _POSEND, _HANDLE, _PATH = range(4)

# Max per-run chunk count for the SMEM prefetch scalar arrays (3 x i32/f32
# per chunk); beyond this the dispatch falls back to the XLA path.
MAX_CHUNKS = int(os.environ.get("ODGI_TPU_PALLAS_MAX_CHUNKS", "32768"))

_ABLATE = os.environ.get("ODGI_TPU_PALLAS_ABLATE", "")
_DATA_CACHE: dict = {}


def _split_bf16(x):
    """f32 -> (hi, lo) bf16 planes with hi + lo == x to f32 roundoff.

    dot(onehot_bf16, hi) + dot(onehot_bf16, lo) with f32 accumulation is
    an EXACT f32 gather in 2 single-pass bf16 matmuls (the usual 3-pass
    f32 decomposition loses its third term because the one-hot side has
    no low part)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _pad_to(n: int, m: int) -> int:
    return -(-n // m) * m


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["planes"],
    meta_fields=["num_steps", "n_blocks", "ch", "num_nodes", "space"],
)
@dataclass(frozen=True)
class PallasSgdData:
    """Device-resident step planes for the strata kernel (pytree).

    planes: i32 (4, PR, 128) — [pos, pos_end, handle, path_id] in TRUE step
        order (row r lane l = step r*128+l), with the tail region past S
        carrying path_id = -1 so window portions past the end mask out via
        the same path compare that masks cross-path pairs (no modular
        arithmetic anywhere; windows starting near S simply yield fewer
        valid pairs, like windows at path boundaries).  This flattening is
        the `element_array` model of the CUDA port (reference:
        src/cuda/layout.cu:345-410) minus its per-element path
        back-pointers, which the window construction makes redundant.
    """

    planes: jnp.ndarray
    num_steps: int
    n_blocks: int   # valid 128-aligned window start blocks (= ceil(S/128))
    ch: int         # coordinate sublane rows (= ceil(2N/128) padded to 8)
    num_nodes: int
    space: int

    @staticmethod
    def build_cached(g, space: int) -> "PallasSgdData":
        """Per-(graph, space) cache: GraphTensors are immutable, and the
        plane build + device transfer (~35 ms on DRB1) would otherwise be
        paid on every dispatch."""
        key = (id(g), space, RC)
        hit = _DATA_CACHE.get(key)
        if hit is not None and hit[0] is g:
            return hit[1]
        d = PallasSgdData.build(g, space)
        _DATA_CACHE[key] = (g, d)
        while len(_DATA_CACHE) > 4:
            _DATA_CACHE.pop(next(iter(_DATA_CACHE)))
        return d

    @staticmethod
    def build(g, space: int) -> "PallasSgdData":
        S = g.num_steps
        handle = g.step_handle.astype(np.int64)
        node = handle >> 1
        pos = g.step_pos.astype(np.int64)
        pos_end = pos + g.node_len[node]
        path_id = g.step_path.astype(np.int64)

        pad = _pad_to(S + CHUNK + space + 2 * RC * LANE, RC * LANE)
        pl4 = np.zeros((4, pad), np.int32)
        pl4[_PATH] = -1
        pl4[_POS, :S] = pos
        pl4[_POSEND, :S] = pos_end
        pl4[_HANDLE, :S] = handle
        pl4[_PATH, :S] = path_id

        ch = _pad_to(max(-(-2 * g.num_nodes // LANE), 1), 8)
        return PallasSgdData(
            planes=jnp.asarray(pl4.reshape(4, pad // LANE, LANE)),
            num_steps=S,
            n_blocks=max(1, -(-S // LANE)),
            ch=ch,
            num_nodes=g.num_nodes,
            space=space,
        )


def coords_to_planes(coords: np.ndarray, ch: int) -> np.ndarray:
    """(2N, 2) f32 -> (ch, 256) plane layout (x lanes 0:128, y 128:256)."""
    m = coords.shape[0]
    x = np.zeros(ch * LANE, np.float32)
    y = np.zeros(ch * LANE, np.float32)
    x[:m] = coords[:, 0]
    y[:m] = coords[:, 1]
    return np.concatenate([x.reshape(ch, LANE), y.reshape(ch, LANE)], axis=1)


def planes_to_coords(planes: np.ndarray, m: int) -> np.ndarray:
    x = np.asarray(planes[:, :LANE]).reshape(-1)[:m]
    y = np.asarray(planes[:, LANE:]).reshape(-1)[:m]
    return np.stack([x, y], axis=1)


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
    1D strictly after — path_sgd.cpp:194)."""
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
    out = (jnp.asarray(o_blk), jnp.asarray(d_arr), jnp.asarray(eta_arr))
    _SCALAR_CACHE[key] = out
    while len(_SCALAR_CACHE) > 8:
        _SCALAR_CACHE.pop(next(iter(_SCALAR_CACHE)))
    return out


def _window_slices(planes_ref, o_blk, D):
    """A/B window slices for all four planes.  A is row-aligned at o_blk;
    B is the same window shifted by D steps, realized as a dynamic
    sublane slice plus a lane-rotate by D mod 128."""
    r0 = o_blk + jax.lax.shift_right_logical(D, 7)
    c_sh = jnp.bitwise_and(D, LANE - 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (RC, LANE), 1)
    keep = lane < (LANE - c_sh)

    def slice_a(p):
        return planes_ref[p, pl.ds(o_blk, RC), :]

    def slice_b(p):
        rows = planes_ref[p, pl.ds(r0, 2 * RC), :]
        r1 = pltpu.roll(rows, (LANE - c_sh) & (LANE - 1), axis=1)
        return jnp.where(keep, r1[0:RC], r1[1 : RC + 1])

    return slice_a, slice_b


def _onehot3(idx, kk, dt):
    """(2*RC, LANE) indices -> (2*RC, LANE, kk) one-hot, built in 3D so the
    collapse to (2*CHUNK, kk) is a Mosaic-supported relayout (a direct
    (2*RC, LANE) -> (2*CHUNK, 1) reshape is not lowerable)."""
    io = jax.lax.broadcasted_iota(jnp.int32, (1, 1, kk), 2)
    return (idx[:, :, None] == io).astype(dt)


def _pair_coins(gchunk):
    """Two decorrelated coin planes (RC, LANE) i32 from a vectorized
    splitmix-style hash of (gchunk, pair index).  Replaces
    pltpu.prng_random_bits, whose per-draw cost profiled at ~2 us/chunk;
    the hash is ~8 VPU passes.  Only bit 0 of each word is consumed."""
    iota = jax.lax.broadcasted_iota(
        jnp.int32, (2, RC, LANE), 1
    ) * LANE + jax.lax.broadcasted_iota(jnp.int32, (2, RC, LANE), 2)
    sel = jax.lax.broadcasted_iota(jnp.int32, (2, RC, LANE), 0)
    h = iota * (-1640531527) + sel * 1779033703 + gchunk * (-1150833019)
    h = (h ^ jax.lax.shift_right_logical(h, 16)) * (-2048144789)
    h = (h ^ jax.lax.shift_right_logical(h, 13)) * (-1028477387)
    h = h ^ jax.lax.shift_right_logical(h, 16)
    return h


def _chunk_acc(ch, o_blk, D, eta_lr, planes_ref, co, coins):
    """One chunk of CHUNK pair updates: returns the (ch, 3*LANE) dense
    [dx_sum | dy_sum | count] accumulator."""
    w0, w1 = coins[0], coins[1]
    slice_a, slice_b = _window_slices(planes_ref, o_blk, D)

    pos_a0 = slice_a(_POS)
    pos_a1 = slice_a(_POSEND)
    handle_a = slice_a(_HANDLE)
    path_a = slice_a(_PATH)
    pos_b0 = slice_b(_POS)
    pos_b1 = slice_b(_POSEND)
    handle_b = slice_b(_HANDLE)
    path_b = slice_b(_PATH)
    # pad slots carry path -1 on BOTH sides; -1 == -1 must NOT pair
    valid = jnp.logical_and(path_a == path_b, path_a >= 0)

    # endpoint choice with orientation fix-up (layout.cu:251-281)
    ca = w0 & 1
    cb = w1 & 1
    pos_a = jnp.where(ca > 0, pos_a1, pos_a0).astype(jnp.float32)
    pos_b = jnp.where(cb > 0, pos_b1, pos_b0).astype(jnp.float32)
    ep_a = 2 * (handle_a >> 1) + ((handle_a & 1) ^ ca)
    ep_b = 2 * (handle_b >> 1) + ((handle_b & 1) ^ cb)
    vf = valid.astype(jnp.float32)

    ep_ab = jnp.concatenate([ep_a, ep_b], axis=0)
    e_hi3 = _onehot3(ep_ab >> 7, ch, jnp.float32)
    e_hi = e_hi3.reshape(2 * CHUNK, ch)
    e_lo = _onehot3(ep_ab & (LANE - 1), LANE, jnp.float32).reshape(
        2 * CHUNK, LANE
    )

    if "nogather" in _ABLATE:
        xa = pos_a * 1e-3
        ya = pos_b * 1e-3
        xb = pos_b * 1e-3
        yb = pos_a * 1e-3
    else:
        co_h, co_l = _split_bf16(co)
        e_hi_b = e_hi.astype(jnp.bfloat16)
        gab = jnp.dot(e_hi_b, co_h, preferred_element_type=jnp.float32)
        gab = gab + jnp.dot(e_hi_b, co_l, preferred_element_type=jnp.float32)
        x_ab = jnp.sum(
            gab[:, :LANE] * e_lo, axis=1, keepdims=True
        ).reshape(2 * RC, LANE)
        y_ab = jnp.sum(
            gab[:, LANE:] * e_lo, axis=1, keepdims=True
        ).reshape(2 * RC, LANE)
        xa, xb = x_ab[:RC], x_ab[RC:]
        ya, yb = y_ab[:RC], y_ab[RC:]

    # update math (reference: src/cuda/layout.cu:141-188)
    term = jnp.maximum(jnp.abs(pos_a - pos_b), 1e-9)
    mu = jnp.minimum(eta_lr / term, 1.0)
    dx = xa - xb
    dx = jnp.where(dx == 0.0, 1e-9, dx)
    dy = ya - yb
    mag = jnp.sqrt(dx * dx + dy * dy)
    delta = mu * (mag - term) / 2.0
    r = jnp.where(valid, delta / mag, 0.0)
    rx = r * dx
    ry = r * dy

    if "noscatter" in _ABLATE:
        s = jnp.sum(rx) + jnp.sum(ry)
        return jnp.full((ch, 3 * LANE), 1e-30, jnp.float32) * s

    # value-folded scatter: fold rx/ry/count into the HI one-hot (ch wide,
    # cheaper than spreading over the 128-wide LO side), then bf16
    # matmuls against e_lo yield the three (ch, LANE) accumulator panes.
    rxx = jnp.concatenate([-rx, rx], axis=0)[:, :, None]
    ryy = jnp.concatenate([-ry, ry], axis=0)[:, :, None]
    vv = jnp.concatenate([vf, vf], axis=0)[:, :, None]
    e_lo_b = e_lo.astype(jnp.bfloat16)
    if "foldcat" in _ABLATE:
        hcat = jnp.concatenate(
            [e_hi3 * rxx, e_hi3 * ryy, e_hi3 * vv], axis=2
        ).reshape(2 * CHUNK, 3 * ch)
        accT = jax.lax.dot_general(
            hcat.astype(jnp.bfloat16),
            e_lo_b,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jnp.concatenate(
            [accT[0:ch], accT[ch : 2 * ch], accT[2 * ch : 3 * ch]], axis=1
        )

    def sc(v3):
        piece = (e_hi3 * v3).reshape(2 * CHUNK, ch).astype(jnp.bfloat16)
        return jax.lax.dot_general(
            piece,
            e_lo_b,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return jnp.concatenate([sc(rxx), sc(ryy), sc(vv)], axis=1)


def _make_kernel(ch: int, nch: int, num_batches: int, seed: int):
    """Mega-grid kernel: the whole run in one pallas_call.

    grid = (iter_max, num_batches, nch); scalar prefetch carries the
    per-chunk (o, D, eta) host arrays."""

    def kernel(o_ref, d_ref, e_ref, planes_ref, cin_ref, out_ref, acc_ref):
        it = pl.program_id(0)
        b = pl.program_id(1)
        c = pl.program_id(2)
        gchunk = (it * num_batches + b) * nch + c

        @pl.when(gchunk == 0)
        def _():
            out_ref[:] = cin_ref[:]

        @pl.when(c == 0)
        def _():
            acc_ref[:] = jnp.zeros((ch, 3 * LANE), jnp.float32)

        coins = _pair_coins(gchunk * 1000003 + seed)
        acc = _chunk_acc(
            ch, o_ref[gchunk], d_ref[gchunk], e_ref[gchunk],
            planes_ref, out_ref[:], coins,
        )
        acc_ref[:] = acc_ref[:] + acc

        # batch boundary: apply the per-endpoint mean merge
        @pl.when(c == nch - 1)
        def _():
            cnt = jnp.maximum(acc_ref[:, 2 * LANE :], 1.0)
            upd = acc_ref[:, : 2 * LANE] / jnp.concatenate([cnt, cnt], axis=1)
            out_ref[:] = out_ref[:] + upd

    return kernel


@partial(
    jax.jit,
    static_argnames=("iter_max", "seed", "ch", "nch", "num_batches",
                     "interpret"),
)
def _pallas_sgd_2d_call(
    coords_planes, planes, o_arr, d_arr, eta_arr, iter_max: int, seed: int,
    ch: int, nch: int, num_batches: int, interpret: bool,
):
    pr = planes.shape[1]
    kernel = _make_kernel(ch, nch, num_batches, seed)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(iter_max, num_batches, nch),
        in_specs=[
            pl.BlockSpec(
                (4, pr, LANE), lambda i, b, c, *_: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (ch, 2 * LANE), lambda i, b, c, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (ch, 2 * LANE), lambda i, b, c, *_: (0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((ch, 3 * LANE), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ch, 2 * LANE), jnp.float32),
        # the TPU-semantics interpreter (pltpu.prng_*, roll, ...) — plain
        # interpret=True lacks lowerings for the TPU primitives
        interpret=pltpu.InterpretParams() if interpret else False,
    )(o_arr, d_arr, eta_arr, planes, coords_planes)


def _num_batches(cfg, nch: int) -> int:
    return max(1, -(-cfg.min_term_updates // (nch * CHUNK)))


def path_sgd_2d_pallas(
    g, coords0: np.ndarray, cfg=None, interpret: Optional[bool] = None
) -> np.ndarray:
    """Drop-in alternative to ops.sgd.path_sgd_2d on the Pallas fast path.

    Dispatched from ops.sgd.path_sgd_2d when cfg.pallas and
    pallas_supported() hold; interpret-mode runs everywhere for tests.
    """
    from .sgd import derive_config_2d

    if cfg is None:
        cfg = derive_config_2d(g)
    if not (g.path_step_count > 1).any():
        return np.asarray(coords0, np.float64)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    data = PallasSgdData.build_cached(g, cfg.space)
    nch = int(np.clip(cfg.batch_size // CHUNK, 1, 64))
    nb = _num_batches(cfg, nch)
    o_arr, d_arr, eta_arr = _host_chunk_scalars(cfg, data, nch, nb)
    co = jnp.asarray(coords_to_planes(np.asarray(coords0, np.float32), data.ch))
    seed = int(cfg.seed) & 0x7FFFFFFF
    # Segment long runs so each dispatch's SMEM prefetch arrays stay under
    # MAX_CHUNKS; segments chain through the coordinate block, and the
    # per-pair coin stream continues exactly because the hash consumes
    # gchunk_local*1000003 + (seed + seg_start*1000003)
    #   == gchunk_global*1000003 + seed  (mod 2^32).
    per_iter = nb * nch
    seg_iters = max(1, min(cfg.iter_max, MAX_CHUNKS // per_iter))
    it0 = 0
    while it0 < cfg.iter_max:
        iters = min(seg_iters, cfg.iter_max - it0)
        c0 = it0 * per_iter
        c1 = (it0 + iters) * per_iter
        seg_seed = (seed + c0 * 1000003) & 0x7FFFFFFF
        co = _pallas_sgd_2d_call(
            co,
            data.planes,
            o_arr[c0:c1],
            d_arr[c0:c1],
            eta_arr[c0:c1],
            iters,
            seg_seed,
            data.ch,
            nch,
            nb,
            bool(interpret),
        )
        it0 += iters
    return planes_to_coords(np.asarray(co), 2 * g.num_nodes).astype(np.float64)


@partial(
    jax.jit,
    static_argnames=("iter_max", "S", "space", "nch", "num_batches", "n2"),
)
def _strata_xla_run(coords, key, planes_flat, o_arr, d_arr, eta_arr,
                    iter_max, S, space, nch, num_batches, n2):
    """Pure-XLA reference of the strata kernel semantics: the SAME host
    (o, D, eta) chunk scalars and the same window/mean-merge batching;
    only the per-pair endpoint coins differ (threefry here, TPU core PRNG
    in the kernel), so results agree statistically, not bitwise.
    planes_flat: i32 (4, PAD) [pos, pos_end, handle, path]."""
    tp, tpe, th, tpa = (planes_flat[i] for i in range(4))

    def iter_body(it, coords):
        key_it = jax.random.fold_in(key, it)

        def batch_body(b, coords):
            kb = jax.random.fold_in(key_it, b)
            acc = jnp.zeros((n2, 3), jnp.float32)

            def chunk_body(c, acc):
                gchunk = (it * num_batches + b) * nch + c
                kc = jax.random.fold_in(kb, c)
                o = o_arr[gchunk] * LANE
                D = d_arr[gchunk]
                eta_lr = eta_arr[gchunk]
                ia = o + jnp.arange(CHUNK, dtype=jnp.int32)
                ib = ia + D
                valid = jnp.logical_and(tpa[ia] == tpa[ib], tpa[ia] >= 0)
                w = jax.random.bits(kc, (2, CHUNK), jnp.uint32)
                ca = (w[0] & 1).astype(jnp.int32)
                cb = (w[1] & 1).astype(jnp.int32)
                ha, hb = th[ia], th[ib]
                pos_a = jnp.where(ca > 0, tpe[ia], tp[ia]).astype(jnp.float32)
                pos_b = jnp.where(cb > 0, tpe[ib], tp[ib]).astype(jnp.float32)
                ep_a = 2 * (ha >> 1) + ((ha & 1) ^ ca)
                ep_b = 2 * (hb >> 1) + ((hb & 1) ^ cb)
                term = jnp.maximum(jnp.abs(pos_a - pos_b), 1e-9)
                mu = jnp.minimum(eta_lr / term, 1.0)
                d = coords[ep_a] - coords[ep_b]
                dx = jnp.where(d[:, 0] == 0.0, 1e-9, d[:, 0])
                dy = d[:, 1]
                mag = jnp.sqrt(dx * dx + dy * dy)
                delta = mu * (mag - term) / 2.0
                r = jnp.where(valid, delta / mag, 0.0)
                v = valid.astype(jnp.float32)
                col_a = jnp.stack([-r * dx, -r * dy, v], 1)
                col_b = jnp.stack([r * dx, r * dy, v], 1)
                return acc.at[ep_a].add(col_a).at[ep_b].add(col_b)

            acc = jax.lax.fori_loop(0, nch, chunk_body, acc)
            return coords + acc[:, :2] / jnp.maximum(acc[:, 2], 1.0)[:, None]

        return jax.lax.fori_loop(0, num_batches, batch_body, coords)

    return jax.lax.fori_loop(0, iter_max, iter_body, coords)


def path_sgd_2d_strata_xla(g, coords0: np.ndarray, cfg=None) -> np.ndarray:
    """XLA (any-backend) run of the strata sampling scheme; the semantic
    reference for path_sgd_2d_pallas, exercised by the CPU test suite."""
    from .sgd import derive_config_2d

    if cfg is None:
        cfg = derive_config_2d(g)
    if not (g.path_step_count > 1).any():
        return np.asarray(coords0, np.float64)
    data = PallasSgdData.build(g, cfg.space)
    nch = int(np.clip(cfg.batch_size // CHUNK, 1, 64))
    nb = _num_batches(cfg, nch)
    o_arr, d_arr, eta_arr = _host_chunk_scalars(cfg, data, nch, nb)
    planes_flat = jnp.asarray(np.asarray(data.planes).reshape(4, -1))
    out = _strata_xla_run(
        jnp.asarray(np.asarray(coords0, np.float32)),
        jax.random.key(cfg.seed),
        planes_flat,
        jnp.asarray(o_arr),
        jnp.asarray(d_arr),
        jnp.asarray(eta_arr),
        int(cfg.iter_max),
        data.num_steps,
        int(data.space),
        nch,
        nb,
        2 * g.num_nodes,
    )
    return np.asarray(out, np.float64)


def pallas_supported(g, cfg) -> bool:
    """Whether the fused kernel applies to this graph/config.

    Requires: TPU backend, no delta early-stop (the kernel runs the full
    schedule in one dispatch), VMEM-resident step planes and coordinates,
    f32-exact positions (< 2^24), and prefetch scalar arrays within the
    SMEM budget.
    """
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if cfg.delta > 0:
        return False
    S = g.num_steps
    if S < CHUNK:
        return False
    max_pos = int(g.step_pos.max(initial=0)) + int(g.node_len.max(initial=0))
    if max_pos >= 2**24 or 2 * g.num_nodes >= 2**24:
        return False
    space = int(cfg.space)
    pad = _pad_to(S + CHUNK + space + 2 * RC * LANE, RC * LANE)
    ch = _pad_to(max(-(-2 * g.num_nodes // LANE), 1), 8)
    nch = int(np.clip(cfg.batch_size // CHUNK, 1, 64))
    nb = _num_batches(cfg, nch)
    if nb * nch > MAX_CHUNKS:
        return False  # a single iteration must fit one segmented dispatch
    return 4 * pad * 4 < 7 * 1024 * 1024 and ch <= 512


# ---------------------------------------------------------------------------
# 1D variant: the `odgi sort -Y` hot loop (reference: path_sgd.cpp:12-464)
# ---------------------------------------------------------------------------


def _chunk_acc_1d(chn, o_blk, D, eta_lr, planes_ref, x_ref):
    """1D strata chunk: like _chunk_acc but with per-NODE scalar positions
    (X only) and no endpoint coins; returns the (chn, 2*LANE)
    [dx_sum | count] accumulator.  Update math mirrors ops.sgd._update_1d
    (reference: path_sgd.cpp:304-396)."""
    slice_a, slice_b = _window_slices(planes_ref, o_blk, D)

    pos_a = slice_a(_POS).astype(jnp.float32)
    handle_a = slice_a(_HANDLE)
    path_a = slice_a(_PATH)
    pos_b = slice_b(_POS).astype(jnp.float32)
    handle_b = slice_b(_HANDLE)
    path_b = slice_b(_PATH)
    term = jnp.abs(pos_a - pos_b)
    valid = jnp.logical_and(
        jnp.logical_and(path_a == path_b, path_a >= 0), term != 0.0
    )
    node_a = handle_a >> 1
    node_b = handle_b >> 1
    vf = valid.astype(jnp.float32)

    nd_ab = jnp.concatenate([node_a, node_b], axis=0)
    e_hi3 = _onehot3(nd_ab >> 7, chn, jnp.float32)
    e_lo = _onehot3(nd_ab & (LANE - 1), LANE, jnp.float32).reshape(
        2 * CHUNK, LANE
    )

    x_h, x_l = _split_bf16(x_ref)
    e_hi_b = e_hi3.reshape(2 * CHUNK, chn).astype(jnp.bfloat16)
    gab = jnp.dot(e_hi_b, x_h, preferred_element_type=jnp.float32)
    gab = gab + jnp.dot(e_hi_b, x_l, preferred_element_type=jnp.float32)
    x_ab = jnp.sum(gab * e_lo, axis=1, keepdims=True).reshape(2 * RC, LANE)
    xa, xb = x_ab[:RC], x_ab[RC:]

    w = 1.0 / jnp.maximum(term, 1e-30)
    mu = jnp.minimum(eta_lr * w, 1.0)
    dx = xa - xb
    dx = jnp.where(dx == 0.0, 1e-9, dx)
    mag = jnp.abs(dx)
    delta = mu * (mag - term) / 2.0
    r = jnp.where(valid, delta / mag * dx, 0.0)

    rxx = jnp.concatenate([-r, r], axis=0)[:, :, None]
    vv = jnp.concatenate([vf, vf], axis=0)[:, :, None]
    e_lo_b = e_lo.astype(jnp.bfloat16)

    def sc(v3):
        piece = (e_hi3 * v3).reshape(2 * CHUNK, chn).astype(jnp.bfloat16)
        return jax.lax.dot_general(
            piece,
            e_lo_b,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return jnp.concatenate([sc(rxx), sc(vv)], axis=1)


def _make_kernel_1d(chn: int, nch: int, num_batches: int):
    def kernel(o_ref, d_ref, e_ref, planes_ref, xin_ref, out_ref, acc_ref):
        it = pl.program_id(0)
        b = pl.program_id(1)
        c = pl.program_id(2)
        gchunk = (it * num_batches + b) * nch + c

        @pl.when(gchunk == 0)
        def _():
            out_ref[:] = xin_ref[:]

        @pl.when(c == 0)
        def _():
            acc_ref[:] = jnp.zeros((chn, 2 * LANE), jnp.float32)

        acc = _chunk_acc_1d(
            chn, o_ref[gchunk], d_ref[gchunk], e_ref[gchunk],
            planes_ref, out_ref[:],
        )
        acc_ref[:] = acc_ref[:] + acc

        @pl.when(c == nch - 1)
        def _():
            cnt = jnp.maximum(acc_ref[:, LANE:], 1.0)
            out_ref[:] = out_ref[:] + acc_ref[:, :LANE] / cnt

    return kernel


@partial(
    jax.jit,
    static_argnames=("iter_max", "chn", "nch", "num_batches", "interpret"),
)
def _pallas_sgd_1d_call(
    x_plane, planes, o_arr, d_arr, eta_arr, iter_max: int,
    chn: int, nch: int, num_batches: int, interpret: bool,
):
    pr = planes.shape[1]
    kernel = _make_kernel_1d(chn, nch, num_batches)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(iter_max, num_batches, nch),
        in_specs=[
            pl.BlockSpec(
                (4, pr, LANE), lambda i, b, c, *_: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (chn, LANE), lambda i, b, c, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (chn, LANE), lambda i, b, c, *_: (0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((chn, 2 * LANE), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((chn, LANE), jnp.float32),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(o_arr, d_arr, eta_arr, planes, x_plane)


def build_data_1d(g, cfg) -> PallasSgdData:
    """1D planes share the 2D layout but size the coordinate rows by NODES
    (not endpoints) and keep the 1D zipf-space quirk (space in nt, jumps in
    steps — reference: sort_main.cpp:387 vs path_sgd.cpp:249)."""
    d = PallasSgdData.build_cached(g, cfg.space)
    chn = _pad_to(max(-(-g.num_nodes // LANE), 1), 8)
    return PallasSgdData(
        planes=d.planes,
        num_steps=d.num_steps,
        n_blocks=d.n_blocks,
        ch=chn,
        num_nodes=d.num_nodes,
        space=d.space,
    )


def path_sgd_1d_pallas(g, cfg=None, x0=None) -> np.ndarray:
    """Fused-kernel 1D PG-SGD; drop-in for the hot part of
    ops.sgd.path_sgd_1d (dispatched when pallas_supported_1d holds)."""
    from .sgd import derive_config_1d

    if cfg is None:
        cfg = derive_config_1d(g)
    if not (g.path_step_count > 1).any():
        return g.node_offset.astype(np.float64)
    data = build_data_1d(g, cfg)
    nch = int(np.clip(cfg.batch_size // CHUNK, 1, 64))
    nb = _num_batches(cfg, nch)
    o_arr, d_arr, eta_arr = _host_chunk_scalars(cfg, data, nch, nb, one_d=True)
    x = np.zeros(data.ch * LANE, np.float32)
    x0v = (
        g.node_offset.astype(np.float32)
        if x0 is None
        else np.asarray(x0, np.float32)
    )
    x[: g.num_nodes] = x0v
    xp = jnp.asarray(x.reshape(data.ch, LANE))
    # segmented dispatch, as in path_sgd_2d_pallas (1D draws no coins, so
    # segments only need the scalar-array slices)
    per_iter = nb * nch
    seg_iters = max(1, min(cfg.iter_max, MAX_CHUNKS // per_iter))
    it0 = 0
    while it0 < cfg.iter_max:
        iters = min(seg_iters, cfg.iter_max - it0)
        c0 = it0 * per_iter
        c1 = (it0 + iters) * per_iter
        xp = _pallas_sgd_1d_call(
            xp,
            data.planes,
            o_arr[c0:c1],
            d_arr[c0:c1],
            eta_arr[c0:c1],
            iters,
            data.ch,
            nch,
            nb,
            False,
        )
        it0 += iters
    return np.asarray(xp).reshape(-1)[: g.num_nodes].astype(np.float64)


def pallas_supported_1d(g, cfg) -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if cfg.delta > 0:
        return False
    S = g.num_steps
    if S < CHUNK:
        return False
    max_pos = int(g.step_pos.max(initial=0)) + int(g.node_len.max(initial=0))
    if max_pos >= 2**24 or g.num_nodes >= 2**24:
        return False
    pad = _pad_to(S + CHUNK + int(cfg.space) + 2 * RC * LANE, RC * LANE)
    chn = _pad_to(max(-(-g.num_nodes // LANE), 1), 8)
    nch = int(np.clip(cfg.batch_size // CHUNK, 1, 64))
    nb = _num_batches(cfg, nch)
    if nb * nch > MAX_CHUNKS:
        return False  # a single iteration must fit one segmented dispatch
    return 4 * pad * 4 < 7 * 1024 * 1024 and chn <= 512
