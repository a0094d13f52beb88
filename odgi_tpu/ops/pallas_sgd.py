"""Fused Pallas TPU kernel for the PG-SGD 2D layout hot loop.

The entire layout optimization (all iterations, all batches) runs as ONE
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
  validated to CONVERGE BETTER than the fixture: DRB1 default stress ~1.24
  vs fixture 1.2855 (guarded by tests and bench.py's assertion).
- **Pre-cooling uniform terms** (reference: path_sgd.cpp:274-279) use a
  uniform jump D ~ U[1, space) with the same masking; after cooling all
  chunks are Zipf, as in the CUDA port (layout.cu:239).
- **Coordinate gather/scatter ride the MXU** as factored one-hot matmuls
  (one (1024, ch) @ (ch, 256) gather and its transpose per endpoint side);
  with the strata trick removing the step-table gather, these are the only
  "random access" left and they are batched systolic work.
- Hogwild merging (reference: "try until we succeed. risky.",
  path_sgd.cpp:367-375) becomes a per-endpoint mean-merge applied at batch
  boundaries (nch chunks per batch), the same batched-update contract as
  ops/sgd.py.

RNG is the TPU core PRNG seeded per (seed, global_chunk): deterministic
for fixed config — our documented contract for this path (the reference's
Hogwild threads are nondeterministic anyway; only converged stress is
comparable — reference: path_sgd.cpp:208-209).

Update math is identical to ops/sgd.py (reference: src/cuda/layout.cu:
141-188): mu = min(eta/d, 1); Delta = mu*(mag - d)/2; head/tail endpoint
choice with orientation fix-up (layout.cu:251-281); the learning-rate
schedule is computed in-kernel from the exact closed form of
path_linear_sgd_schedule (reference: path_sgd.cpp:466-501).
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
RC = 8                 # sublane rows per chunk
CHUNK = RC * LANE      # 1024 pairs per chunk (one shared jump distance)
_POS, _POSEND, _HANDLE, _PATH = range(4)


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


def _kernel_consts(cfg, data: "PallasSgdData"):
    """Static constants shared by both kernel variants."""
    space = int(data.space)
    zeta_n, eta_z = _zeta_consts(cfg, space)
    eta_lr_max = float(cfg.eta_max)
    eta_lr_min = float(cfg.eps)
    lam = (
        math.log(eta_lr_max / eta_lr_min) / (cfg.iter_max - 1)
        if cfg.iter_max > 1
        else 0.0
    )
    return dict(
        theta=cfg.theta,
        alpha=1.0 / (1.0 - cfg.theta),
        half_pow_theta=float(0.5**cfg.theta),
        space=space,
        zeta_n=zeta_n,
        eta_z=eta_z,
        eta_lr_max=eta_lr_max,
        eta_lr_min=eta_lr_min,
        lam=lam,
        t_peak=int(cfg.iter_with_max_learning_rate),
        first_cooling=cfg.first_cooling_iteration,
        ch=data.ch,
        n_blocks=data.n_blocks,
    )


_ABLATE = os.environ.get("ODGI_TPU_PALLAS_ABLATE", "")


def _chunk_acc(k, seed, gchunk, it, planes_ref, co):
    """One chunk of CHUNK pair updates: returns the (ch, 3*LANE) dense
    [dx_sum | dy_sum | count] accumulator.  `k` holds _kernel_consts."""
    ch = k["ch"]
    space = k["space"]
    two24 = float(2.0**-24)

    pltpu.prng_seed(seed + gchunk * 7919)
    bits = pltpu.bitcast(pltpu.prng_random_bits((2, RC, LANE)), jnp.int32)
    w0, w1 = bits[0], bits[1]

    def u24(word):
        return ((word >> 8) & 0xFFFFFF).astype(jnp.float32) * two24

    # --- per-chunk scalars: window offset + shared jump distance ---
    # Pure scalar-core splitmix32 hash of (seed, gchunk): avoids a
    # vector->scalar readback stall (a VMEM round-trip per chunk); the
    # per-PAIR coins stay on the hardware PRNG above.
    def mix(h):
        h = (h ^ jax.lax.shift_right_logical(h, 16)) * (-2048144789)
        h = (h ^ jax.lax.shift_right_logical(h, 13)) * (-1028477387)
        return h ^ jax.lax.shift_right_logical(h, 16)

    h0 = mix(gchunk * (-1640531527) + seed)
    h1 = mix(h0 + 1779033703)
    h2 = mix(h1 + (-1150833019))
    h3 = mix(h2 + 1013904242)
    u_o = u24(h0)
    u_z = u24(h1)
    u_u = u24(h2)
    o_blk = jnp.floor(u_o * jnp.float32(k["n_blocks"])).astype(jnp.int32)
    o_blk = jnp.minimum(o_blk, k["n_blocks"] - 1)
    # dirtyzipf closed-form inverse (reference: src/cuda/layout.cu:89-113)
    x = jnp.maximum(k["eta_z"] * u_z - k["eta_z"] + 1.0, 1e-30)
    powx = jnp.exp(jnp.float32(k["alpha"]) * jnp.log(x))
    uz = u_z * k["zeta_n"]
    val = jnp.where(
        uz < 1.0,
        1.0,
        jnp.where(uz < 1.0 + k["half_pow_theta"], 2.0, 1.0 + space * powx),
    )
    d_zipf = jnp.clip(jnp.floor(val).astype(jnp.int32), 1, space)
    d_unif = 1 + jnp.floor(
        u_u * jnp.float32(max(space - 1, 1))
    ).astype(jnp.int32)
    use_zipf = jnp.logical_or(it >= k["first_cooling"], (h3 & 1) > 0)
    D = jnp.where(use_zipf, d_zipf, d_unif)

    # learning rate of this iteration (path_sgd.cpp:466-501)
    t = it.astype(jnp.float32)
    eta_lr = k["eta_lr_max"] * jnp.exp(
        jnp.float32(-k["lam"]) * jnp.abs(t - jnp.float32(k["t_peak"]))
    )
    eta_lr = jnp.where(jnp.isfinite(eta_lr), eta_lr, k["eta_lr_min"])

    # --- window slices: A side row-aligned, B side rolled by D%128 ---
    r0 = o_blk + jax.lax.shift_right_logical(D, 7)
    c_sh = jnp.bitwise_and(D, LANE - 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (RC, LANE), 1)
    keep = lane < (LANE - c_sh)

    def slice_a(p):
        return planes_ref[p, pl.ds(o_blk, RC), :]

    def slice_b(p):
        if "nosliceb" in _ABLATE:
            return planes_ref[p, pl.ds(o_blk + 1, RC), :]
        rows = planes_ref[p, pl.ds(r0, 2 * RC), :]
        r1 = pltpu.roll(rows, (LANE - c_sh) & (LANE - 1), axis=1)
        return jnp.where(keep, r1[0:RC], r1[1 : RC + 1])

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

    # factored one-hots built in 3D and collapsed (Mosaic-supported
    # relayout); both endpoint sides share one (2*CHUNK, ch) matmul so
    # the MXU amortizes the (ch, 256) operand load across twice the rows
    def onehot3(idx, kk):
        io = jax.lax.broadcasted_iota(jnp.int32, (1, 1, kk), 2)
        return (idx[:, :, None] == io).astype(jnp.float32)

    ep_ab = jnp.concatenate([ep_a, ep_b], axis=0)
    e_hi = onehot3(ep_ab >> 7, ch).reshape(2 * CHUNK, ch)
    e_lo3 = onehot3(ep_ab & (LANE - 1), LANE)
    e_lo = e_lo3.reshape(2 * CHUNK, LANE)

    if "nogather" in _ABLATE:
        xa = pos_a * 1e-3
        ya = pos_b * 1e-3
        xb = pos_b * 1e-3
        yb = pos_a * 1e-3
    else:
        gab = jnp.dot(e_hi, co, preferred_element_type=jnp.float32)
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
        z = jnp.zeros((ch, 3 * LANE), jnp.float32)
        return z.at[0, 0].add(jnp.sum(rx) + jnp.sum(ry))
    rxx = jnp.concatenate([-rx, rx], axis=0)[:, :, None]
    ryy = jnp.concatenate([-ry, ry], axis=0)[:, :, None]
    vv = jnp.concatenate([vf, vf], axis=0)[:, :, None]
    spread = jnp.concatenate(
        [e_lo3 * rxx, e_lo3 * ryy, e_lo3 * vv], axis=2
    ).reshape(2 * CHUNK, 3 * LANE)
    return jax.lax.dot_general(
        e_hi,
        spread,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _make_kernel(cfg, data: PallasSgdData, nch: int, num_batches: int):
    """Mega-grid kernel: the whole run in one pallas_call."""
    k = _kernel_consts(cfg, data)
    ch = k["ch"]

    def kernel(seed_ref, planes_ref, cin_ref, out_ref, acc_ref):
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

        acc = _chunk_acc(k, seed_ref[0], gchunk, it, planes_ref, out_ref[:])
        acc_ref[:] = acc_ref[:] + acc

        # batch boundary: apply the per-endpoint mean merge
        @pl.when(c == nch - 1)
        def _():
            cnt = jnp.maximum(acc_ref[:, 2 * LANE :], 1.0)
            upd = acc_ref[:, : 2 * LANE] / jnp.concatenate([cnt, cnt], axis=1)
            out_ref[:] = out_ref[:] + upd

    return kernel


def _make_batch_kernel(cfg, data: PallasSgdData, nch: int):
    """Per-batch kernel: grid=(nch,), invoked once per merge batch from an
    XLA fori_loop (used when the one-dispatch mega-grid is not wanted)."""
    k = _kernel_consts(cfg, data)
    ch = k["ch"]

    def kernel(sarr_ref, planes_ref, cin_ref, out_ref, acc_ref):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            acc_ref[:] = jnp.zeros((ch, 3 * LANE), jnp.float32)

        seed = sarr_ref[0]
        batch_index = sarr_ref[1]
        it = sarr_ref[2]
        gchunk = batch_index * nch + c
        acc = _chunk_acc(k, seed, gchunk, it, planes_ref, cin_ref[:])
        acc_ref[:] = acc_ref[:] + acc

        @pl.when(c == nch - 1)
        def _():
            cnt = jnp.maximum(acc_ref[:, 2 * LANE :], 1.0)
            upd = acc_ref[:, : 2 * LANE] / jnp.concatenate([cnt, cnt], axis=1)
            out_ref[:] = cin_ref[:] + upd

    return kernel


@partial(
    jax.jit,
    static_argnames=("cfg", "data_meta", "nch", "num_batches", "interpret"),
)
def _pallas_sgd_2d_batched(
    coords_planes, planes, seed, cfg, data_meta, nch: int,
    num_batches: int, interpret: bool,
):
    """Per-batch-dispatch variant: XLA fori_loop over (iter, batch) calling
    the grid=(nch,) kernel once per merge batch."""
    data = PallasSgdData(planes, *data_meta)
    ch = data.ch
    pr = planes.shape[1]
    kernel = _make_batch_kernel(cfg, data, nch)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nch,),
        in_specs=[
            pl.BlockSpec(
                (4, pr, LANE), lambda c, s: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (ch, 2 * LANE), lambda c, s: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (ch, 2 * LANE), lambda c, s: (0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((ch, 3 * LANE), jnp.float32),
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ch, 2 * LANE), jnp.float32),
        interpret=pltpu.InterpretParams() if interpret else False,
    )

    def body(g_batch, co):
        it = g_batch // num_batches
        sarr = jnp.stack([seed[0], g_batch, it])
        return call(sarr, planes, co)

    return jax.lax.fori_loop(
        0, cfg.iter_max * num_batches, body, coords_planes
    )


@partial(
    jax.jit,
    static_argnames=("cfg", "data_meta", "nch", "num_batches", "interpret"),
)
def _pallas_sgd_2d_call(
    coords_planes, planes, seed, cfg, data_meta, nch: int,
    num_batches: int, interpret: bool,
):
    data = PallasSgdData(planes, *data_meta)
    ch = data.ch
    pr = planes.shape[1]
    kernel = _make_kernel(cfg, data, nch, num_batches)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(cfg.iter_max, num_batches, nch),
        in_specs=[
            pl.BlockSpec(
                (4, pr, LANE), lambda i, b, c, s: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (ch, 2 * LANE), lambda i, b, c, s: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (ch, 2 * LANE), lambda i, b, c, s: (0, 0),
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
    )(seed, planes, coords_planes)


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
    data = PallasSgdData.build(g, cfg.space)
    nch = int(np.clip(cfg.batch_size // CHUNK, 1, 64))
    nb = _num_batches(cfg, nch)
    co = coords_to_planes(np.asarray(coords0, np.float32), data.ch)
    meta = (data.num_steps, data.n_blocks, data.ch, data.num_nodes, data.space)
    out = _pallas_sgd_2d_call(
        jnp.asarray(co),
        data.planes,
        jnp.asarray([cfg.seed], jnp.int32),
        cfg,
        meta,
        nch,
        nb,
        bool(interpret),
    )
    return planes_to_coords(np.asarray(out), 2 * g.num_nodes).astype(np.float64)


@partial(
    jax.jit,
    static_argnames=("cfg", "S", "space", "nch", "num_batches", "n2"),
)
def _strata_xla_run(coords, key, planes_flat, cfg, S, space, nch, num_batches, n2):
    """Pure-XLA reference of the strata kernel semantics (same window/
    shared-D sampling, same mean-merge batching), used by tests on CPU and
    as documentation of the kernel's math.  RNG is threefry, so results
    are not bitwise-comparable with the TPU kernel — only statistically.
    planes_flat: i32 (4, PAD) [pos, pos_end, handle, path] modularly padded.
    """
    from .sgd import sgd_schedule

    tp, tpe, th, tpa = (planes_flat[i] for i in range(4))
    zeta_n, eta_z = _zeta_consts(cfg, space)
    alpha = 1.0 / (1.0 - cfg.theta)
    half_pow_theta = float(0.5**cfg.theta)
    etas = jnp.asarray(
        sgd_schedule(
            1.0 / cfg.eta_max, 1.0, cfg.iter_max,
            cfg.iter_with_max_learning_rate, cfg.eps,
        ),
        jnp.float32,
    )
    n_blocks = max(1, -(-S // LANE))
    first_cooling = cfg.first_cooling_iteration

    def iter_body(it, coords):
        eta_lr = etas[it]
        cooling = it >= first_cooling
        key_it = jax.random.fold_in(key, it)

        def batch_body(b, coords):
            kb = jax.random.fold_in(key_it, b)
            acc = jnp.zeros((n2, 3), jnp.float32)

            def chunk_body(c, acc):
                kc = jax.random.fold_in(kb, c)
                ks, kp = jax.random.split(kc)
                sc = jax.random.uniform(ks, (3,), jnp.float32)
                wm = jax.random.bits(ks, (), jnp.uint32)
                o = jnp.minimum(
                    jnp.floor(sc[0] * n_blocks).astype(jnp.int32), n_blocks - 1
                ) * LANE
                x = jnp.maximum(eta_z * sc[1] - eta_z + 1.0, 1e-30)
                powx = jnp.exp(jnp.float32(alpha) * jnp.log(x))
                uz = sc[1] * zeta_n
                val = jnp.where(
                    uz < 1.0,
                    1.0,
                    jnp.where(uz < 1.0 + half_pow_theta, 2.0, 1.0 + space * powx),
                )
                d_zipf = jnp.clip(jnp.floor(val).astype(jnp.int32), 1, space)
                d_unif = 1 + jnp.floor(
                    sc[2] * jnp.float32(max(space - 1, 1))
                ).astype(jnp.int32)
                D = jnp.where(
                    jnp.logical_or(cooling, (wm & 1) > 0), d_zipf, d_unif
                )
                ia = o + jnp.arange(CHUNK, dtype=jnp.int32)
                ib = ia + D
                valid = jnp.logical_and(tpa[ia] == tpa[ib], tpa[ia] >= 0)
                w = jax.random.bits(kp, (2, CHUNK), jnp.uint32)
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

    return jax.lax.fori_loop(0, cfg.iter_max, iter_body, coords)


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
    planes_flat = jnp.asarray(np.asarray(data.planes).reshape(4, -1))
    out = _strata_xla_run(
        jnp.asarray(np.asarray(coords0, np.float32)),
        jax.random.key(cfg.seed),
        planes_flat,
        cfg,
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
    and f32-exact positions (< 2^24).
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
    return 4 * pad * 4 < 7 * 1024 * 1024 and ch <= 512


# ---------------------------------------------------------------------------
# 1D variant: the `odgi sort -Y` hot loop (reference: path_sgd.cpp:12-464)
# ---------------------------------------------------------------------------


def _chunk_acc_1d(k, seed, gchunk, it, planes_ref, x_ref):
    """1D strata chunk: like _chunk_acc but with per-NODE scalar positions
    (X only); returns the (chn, 2*LANE) [dx_sum | count] accumulator.
    Update math mirrors ops.sgd._update_1d (reference: path_sgd.cpp:304-396;
    1D cooling starts strictly after first_cooling, path_sgd.cpp:194)."""
    chn = k["ch"]
    space = k["space"]
    two24 = float(2.0**-24)

    pltpu.prng_seed(seed + gchunk * 7919)
    bits = pltpu.bitcast(pltpu.prng_random_bits((1, RC, LANE)), jnp.int32)
    del bits  # 1D draws no per-pair coins; keep the PRNG stream advancing

    def mix(h):
        h = (h ^ jax.lax.shift_right_logical(h, 16)) * (-2048144789)
        h = (h ^ jax.lax.shift_right_logical(h, 13)) * (-1028477387)
        return h ^ jax.lax.shift_right_logical(h, 16)

    def u24(word):
        return ((word >> 8) & 0xFFFFFF).astype(jnp.float32) * two24

    h0 = mix(gchunk * (-1640531527) + seed)
    h1 = mix(h0 + 1779033703)
    h2 = mix(h1 + (-1150833019))
    h3 = mix(h2 + 1013904242)
    u_o = u24(h0)
    u_z = u24(h1)
    u_u = u24(h2)
    o_blk = jnp.floor(u_o * jnp.float32(k["n_blocks"])).astype(jnp.int32)
    o_blk = jnp.minimum(o_blk, k["n_blocks"] - 1)
    x = jnp.maximum(k["eta_z"] * u_z - k["eta_z"] + 1.0, 1e-30)
    powx = jnp.exp(jnp.float32(k["alpha"]) * jnp.log(x))
    uz = u_z * k["zeta_n"]
    val = jnp.where(
        uz < 1.0,
        1.0,
        jnp.where(uz < 1.0 + k["half_pow_theta"], 2.0, 1.0 + space * powx),
    )
    d_zipf = jnp.clip(jnp.floor(val).astype(jnp.int32), 1, space)
    d_unif = 1 + jnp.floor(
        u_u * jnp.float32(max(space - 1, 1))
    ).astype(jnp.int32)
    use_zipf = jnp.logical_or(it > k["first_cooling"], (h3 & 1) > 0)
    D = jnp.where(use_zipf, d_zipf, d_unif)

    t = it.astype(jnp.float32)
    eta_lr = k["eta_lr_max"] * jnp.exp(
        jnp.float32(-k["lam"]) * jnp.abs(t - jnp.float32(k["t_peak"]))
    )
    eta_lr = jnp.where(jnp.isfinite(eta_lr), eta_lr, k["eta_lr_min"])

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

    def onehot3(idx, kk):
        io = jax.lax.broadcasted_iota(jnp.int32, (1, 1, kk), 2)
        return (idx[:, :, None] == io).astype(jnp.float32)

    nd_ab = jnp.concatenate([node_a, node_b], axis=0)
    e_hi = onehot3(nd_ab >> 7, chn).reshape(2 * CHUNK, chn)
    e_lo3 = onehot3(nd_ab & (LANE - 1), LANE)
    e_lo = e_lo3.reshape(2 * CHUNK, LANE)

    gab = jnp.dot(e_hi, x_ref, preferred_element_type=jnp.float32)
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
    spread = jnp.concatenate([e_lo3 * rxx, e_lo3 * vv], axis=2).reshape(
        2 * CHUNK, 2 * LANE
    )
    return jax.lax.dot_general(
        e_hi,
        spread,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _make_batch_kernel_1d(cfg, data: PallasSgdData, nch: int):
    k = _kernel_consts(cfg, data)
    chn = k["ch"]

    def kernel(sarr_ref, planes_ref, xin_ref, out_ref, acc_ref):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            acc_ref[:] = jnp.zeros((chn, 2 * LANE), jnp.float32)

        seed = sarr_ref[0]
        batch_index = sarr_ref[1]
        it = sarr_ref[2]
        gchunk = batch_index * nch + c
        acc = _chunk_acc_1d(k, seed, gchunk, it, planes_ref, xin_ref[:])
        acc_ref[:] = acc_ref[:] + acc

        @pl.when(c == nch - 1)
        def _():
            cnt = jnp.maximum(acc_ref[:, LANE:], 1.0)
            out_ref[:] = xin_ref[:] + acc_ref[:, :LANE] / cnt

    return kernel


@partial(
    jax.jit,
    static_argnames=("cfg", "data_meta", "nch", "num_batches", "interpret"),
)
def _pallas_sgd_1d_batched(
    x_plane, planes, seed, cfg, data_meta, nch: int,
    num_batches: int, interpret: bool,
):
    data = PallasSgdData(planes, *data_meta)
    chn = data.ch
    pr = planes.shape[1]
    kernel = _make_batch_kernel_1d(cfg, data, nch)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nch,),
        in_specs=[
            pl.BlockSpec(
                (4, pr, LANE), lambda c, s: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (chn, LANE), lambda c, s: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (chn, LANE), lambda c, s: (0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((chn, 2 * LANE), jnp.float32),
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((chn, LANE), jnp.float32),
        interpret=pltpu.InterpretParams() if interpret else False,
    )

    def body(g_batch, xp):
        it = g_batch // num_batches
        sarr = jnp.stack([seed[0], g_batch, it])
        return call(sarr, planes, xp)

    return jax.lax.fori_loop(0, cfg.iter_max * num_batches, body, x_plane)


def build_data_1d(g, cfg) -> PallasSgdData:
    """1D planes share the 2D layout but size the coordinate rows by NODES
    (not endpoints) and keep the 1D zipf-space quirk (space in nt, jumps in
    steps — reference: sort_main.cpp:387 vs path_sgd.cpp:249)."""
    d = PallasSgdData.build(g, cfg.space)
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
    x = np.zeros(data.ch * LANE, np.float32)
    x0v = (
        g.node_offset.astype(np.float32)
        if x0 is None
        else np.asarray(x0, np.float32)
    )
    x[: g.num_nodes] = x0v
    meta = (data.num_steps, data.n_blocks, data.ch, data.num_nodes, data.space)
    out = _pallas_sgd_1d_batched(
        jnp.asarray(x.reshape(data.ch, LANE)),
        data.planes,
        jnp.asarray([cfg.seed], jnp.int32),
        cfg,
        meta,
        nch,
        nb,
        False,
    )
    return np.asarray(out).reshape(-1)[: g.num_nodes].astype(np.float64)


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
    return 4 * pad * 4 < 7 * 1024 * 1024 and chn <= 512
