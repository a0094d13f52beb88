"""Fused Pallas TPU kernel for the PG-SGD 2D layout hot loop.

The XLA formulation in ops/sgd.py is memory-bound: each factored one-hot
gather/scatter (ops/scatter.py) materializes (B, 128, C) intermediates in
HBM (~150 MB per batch), capping DRB1 throughput at ~45M pair-updates/s.
This kernel fuses one whole update batch on-chip:

- The step table ("A" planes, one row per step in a fixed random
  permutation) streams HBM->VMEM chunk by chunk via scalar-prefetch block
  index maps — the sequential first-step walk of ops/sgd.py, unchanged.
- Zipf zeta/eta constants are DENORMALIZED per step (forward and backward
  jump spaces are functions of rank/count only), so the kernel does zero
  table lookups for Zipf sampling; values are bit-identical to the
  reference's quantized zeta table (reference: src/algorithms/
  path_sgd.cpp:124-138 — same quantization, same f32 rounding).
- The partner ("B") table in true step order and the coordinate planes are
  VMEM-resident for the whole batch; second-step rows and coordinate
  endpoints are gathered with factored one-hot matmuls that never leave
  VMEM, and the scatter-mean accumulator is the transposed matmul, summed
  across grid chunks in the revisited output block.
- RNG is the TPU core PRNG (pltpu.prng_*), seeded per (batch, chunk):
  our documented deterministic contract for the Pallas path (the
  reference's Hogwild threads are nondeterministic anyway; only converged
  stress is comparable — reference: src/algorithms/path_sgd.cpp:208-209).

Update math is identical to ops/sgd.py (reference: src/cuda/layout.cu:
141-287): mu = min(eta/d, 1); Delta = mu*(mag - d)/2; conflicting updates
within a batch merge by per-endpoint mean.

Memory layout (lane = 128):
  ai: (6, S_pad/128, 128) i32 planes [lo, rank, count, pos, pos_end, handle]
  af: (4, S_pad/128, 128) f32 planes [zeta_fwd, eta_fwd, zeta_bwd, eta_bwd]
  tb: (Bh, 384) f32 — partner rows: lanes [0:128)=pos, [128:256)=pos_end,
      [256:384)=handle for step h*128+l (all values < 2^24, f32-exact)
  coords: (Ch, 256) f32 — endpoint 128*h+l at row h, lanes l (x), 128+l (y)
  acc out: (Ch, 384) f32 — [dx_sum, dy_sum, count] per endpoint
"""

from __future__ import annotations

import math
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
CHUNK = 1024           # pairs per grid step
RC = CHUNK // LANE     # sublane rows per chunk slice

_AI_LO, _AI_RANK, _AI_COUNT, _AI_POS, _AI_POSEND, _AI_HANDLE = range(6)


def _pad_to(n: int, m: int) -> int:
    return -(-n // m) * m


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["ai", "af", "tb"],
    meta_fields=["num_steps", "s_pad", "bh", "ch", "num_nodes"],
)
@dataclass(frozen=True)
class PallasSgdData:
    ai: jnp.ndarray
    af: jnp.ndarray
    tb: jnp.ndarray
    num_steps: int
    s_pad: int
    bh: int       # partner-table sublane rows (= ceil(S/128) padded to 8)
    ch: int       # coordinate sublane rows (= ceil(2N/128) padded to 8)
    num_nodes: int

    @staticmethod
    def build(
        g,
        theta: float,
        space: int,
        space_max: int,
        quant_step: int,
        perm_seed: int = 421,
    ) -> "PallasSgdData":
        S = g.num_steps
        handle = g.step_handle.astype(np.int64)
        node = handle >> 1
        pos = g.step_pos.astype(np.int64)
        pos_end = pos + g.node_len[node]
        lo = g.path_offset[g.step_path].astype(np.int64)
        rank = np.arange(S, dtype=np.int64) - lo
        count = g.path_step_count[g.step_path].astype(np.int64)

        # zeta/eta per step for both jump directions, from the SAME
        # quantized table as the XLA path (bit-identical values).
        ze = zeta_eta_table(space, space_max, quant_step, theta)

        def ze_at(s):
            s = np.maximum(s, 1)
            idx = np.where(
                s > space_max, space_max + 1 + (s - space_max) // quant_step, s
            )
            idx = np.minimum(idx, len(ze) - 1)
            return ze[idx]

        sp_f = np.minimum(space, count - 1 - rank)
        sp_b = np.minimum(space, rank)
        ze_f = ze_at(sp_f)
        ze_b = ze_at(sp_b)

        s_pad = max(_pad_to(S, CHUNK), CHUNK)
        ai = np.zeros((6, s_pad), np.int32)
        af = np.ones((4, s_pad), np.float32)
        ai[_AI_COUNT] = 1  # padding rows: count=1 -> invalid, masked
        ai[_AI_LO, :S] = lo
        ai[_AI_RANK, :S] = rank
        ai[_AI_COUNT, :S] = count
        ai[_AI_POS, :S] = pos
        ai[_AI_POSEND, :S] = pos_end
        ai[_AI_HANDLE, :S] = handle
        af[0, :S] = ze_f[:, 0]
        af[1, :S] = ze_f[:, 1]
        af[2, :S] = ze_b[:, 0]
        af[3, :S] = ze_b[:, 1]
        perm = np.random.default_rng(perm_seed).permutation(S)
        ai[:, :S] = ai[:, :S][:, perm]
        af[:, :S] = af[:, :S][:, perm]

        bh = _pad_to(max(-(-S // LANE), 1), 8)
        tb = np.zeros((bh, 3 * LANE), np.float32)
        flat = np.zeros((3, bh * LANE), np.float32)
        flat[0, :S] = pos
        flat[1, :S] = pos_end
        flat[2, :S] = handle
        tb[:, 0:LANE] = flat[0].reshape(bh, LANE)
        tb[:, LANE : 2 * LANE] = flat[1].reshape(bh, LANE)
        tb[:, 2 * LANE :] = flat[2].reshape(bh, LANE)

        ch = _pad_to(max(-(-2 * g.num_nodes // LANE), 1), 8)
        return PallasSgdData(
            ai=jnp.asarray(ai.reshape(6, s_pad // LANE, LANE)),
            af=jnp.asarray(af.reshape(4, s_pad // LANE, LANE)),
            tb=jnp.asarray(tb),
            num_steps=S,
            s_pad=s_pad,
            bh=bh,
            ch=ch,
            num_nodes=g.num_nodes,
        )

    def supported(self) -> bool:
        """VMEM-resident partner table + coords must fit comfortably."""
        vmem = (self.bh * 384 + self.ch * (256 + 384)) * 4
        exact = (
            self.s_pad * LANE < 2**24  # handles/positions f32-exact
        )
        return vmem < 8 * 1024 * 1024 and exact


def coords_to_planes(coords: np.ndarray, ch: int) -> np.ndarray:
    """(2N, 2) f32 -> (Ch, 256) plane layout."""
    m = coords.shape[0]
    x = np.zeros(ch * LANE, np.float32)
    y = np.zeros(ch * LANE, np.float32)
    x[:m] = coords[:, 0]
    y[:m] = coords[:, 1]
    return np.concatenate(
        [x.reshape(ch, LANE), y.reshape(ch, LANE)], axis=1
    )


def planes_to_coords(planes: np.ndarray, m: int) -> np.ndarray:
    x = np.asarray(planes[:, :LANE]).reshape(-1)[:m]
    y = np.asarray(planes[:, LANE:]).reshape(-1)[:m]
    return np.stack([x, y], axis=1)


def _make_batch_kernel(cfg, data: PallasSgdData, nchunks: int, interpret: bool):
    theta = cfg.theta
    alpha = 1.0 / (1.0 - theta)
    half_pow_theta = float(0.5**theta)
    space_f = float(cfg.space)
    bh, ch = data.bh, data.ch
    n_rcblk = data.s_pad // CHUNK

    def kernel(sref, eref, ai_ref, af_ref, tb_ref, co_ref, acc_ref):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            acc_ref[:] = jnp.zeros((ch, 3 * LANE), jnp.float32)

        pltpu.prng_seed(sref[1] + c * 7919)
        bits = pltpu.bitcast(
            pltpu.prng_random_bits((3, RC, LANE)), jnp.int32
        )
        w0, w1, w2 = bits[0], bits[1], bits[2]
        two24 = jnp.float32(2.0**-24)
        u0 = ((w0 >> 8) & 0xFFFFFF).astype(jnp.float32) * two24
        u1 = ((w1 >> 8) & 0xFFFFFF).astype(jnp.float32) * two24

        rank = ai_ref[_AI_RANK]
        cnt = ai_ref[_AI_COUNT]
        pos_a0 = ai_ref[_AI_POS]
        pos_a1 = ai_ref[_AI_POSEND]
        handle_a = ai_ref[_AI_HANDLE]
        valid = cnt > 1

        coin_zipf = (w0 & 1) > 0
        coin_dir = (w0 & 2) > 0
        backward = ((rank > 0) & coin_dir) | (rank == cnt - 1)
        jump_space = jnp.minimum(
            jnp.int32(cfg.space), jnp.where(backward, rank, cnt - 1 - rank)
        )
        jump_space = jnp.maximum(jump_space, 1)
        zetan = jnp.where(backward, af_ref[2], af_ref[0])
        eta_z = jnp.where(backward, af_ref[3], af_ref[1])
        # dirtyzipf closed-form inverse (reference: src/cuda/layout.cu:89-113)
        x = jnp.maximum(eta_z * u0 - eta_z + 1.0, 1e-30)
        powx = jnp.exp(jnp.float32(alpha) * jnp.log(x))
        uz = u0 * zetan
        n_f = jump_space.astype(jnp.float32)
        val = jnp.where(
            uz < 1.0,
            1.0,
            jnp.where(uz < 1.0 + half_pow_theta, 2.0, 1.0 + n_f * powx),
        )
        zi = jnp.clip(jnp.floor(val).astype(jnp.int32), 1, jump_space)
        s2_zipf = jnp.where(backward, rank - zi, rank + zi)
        s2_unif = jnp.floor(u1 * cnt.astype(jnp.float32)).astype(jnp.int32)
        use_zipf = coin_zipf | (sref[2] > 0)
        s2 = jnp.clip(jnp.where(use_zipf, s2_zipf, s2_unif), 0, cnt - 1)
        row_b = ai_ref[_AI_LO] + s2

        # endpoint + position of the first step (CUDA endpoint fix-up,
        # reference: src/cuda/layout.cu:251-281); use_other = rev XOR coin
        ca = w2 & 1
        node_a = handle_a >> 1
        pos_a = jnp.where(ca > 0, pos_a1, pos_a0).astype(jnp.float32)
        ep_a = 2 * node_a + ((handle_a & 1) ^ ca)
        cb = (w2 >> 1) & 1
        vf = valid.astype(jnp.float32)

        # Mosaic cannot relayout (RC,128)->(CHUNK,1) directly; one-hots are
        # built in 3D and collapsed over the leading dims (supported), and
        # gathered (CHUNK,1) columns reshape back to (RC,128) (supported).
        def onehot(idx, k):
            io = jax.lax.broadcasted_iota(jnp.int32, (1, 1, k), 2)
            return (idx[:, :, None] == io).astype(jnp.float32).reshape(
                CHUNK, k
            )

        def col2row(col):
            return col.reshape(RC, LANE)

        def sel(st, lo_onehot, j):
            return col2row(
                jnp.sum(
                    st[:, j * LANE : (j + 1) * LANE] * lo_onehot,
                    axis=1,
                    keepdims=True,
                )
            )

        # partner-row gather: (CHUNK,bh)@(bh,384) then lane select
        e_hi_b = onehot(row_b >> 7, bh)
        e_lo_b = onehot(row_b & 127, LANE)
        st = jnp.dot(e_hi_b, tb_ref[:], preferred_element_type=jnp.float32)
        pos_b0 = sel(st, e_lo_b, 0)
        pos_b1 = sel(st, e_lo_b, 1)
        handle_b = sel(st, e_lo_b, 2).astype(jnp.int32)
        node_b = handle_b >> 1
        pos_b = jnp.where(cb > 0, pos_b1, pos_b0)
        eb = 2 * node_b + ((handle_b & 1) ^ cb)

        # coordinate gathers: (CHUNK,ch)@(ch,256) then lane select
        e_hi_a = onehot(ep_a >> 7, ch)
        e_lo_a = onehot(ep_a & 127, LANE)
        sa = jnp.dot(e_hi_a, co_ref[:], preferred_element_type=jnp.float32)
        xa = sel(sa, e_lo_a, 0)
        ya = sel(sa, e_lo_a, 1)
        e_hi_b2 = onehot(eb >> 7, ch)
        e_lo_b2 = onehot(eb & 127, LANE)
        sb = jnp.dot(e_hi_b2, co_ref[:], preferred_element_type=jnp.float32)
        xb = sel(sb, e_lo_b2, 0)
        yb = sel(sb, e_lo_b2, 1)

        # update math in (RC,128) rows (reference: src/cuda/layout.cu:141-188)
        term_dist = jnp.maximum(jnp.abs(pos_a - pos_b), 1e-9)
        eta_lr = eref[0]
        mu = jnp.minimum(eta_lr / term_dist, 1.0)
        dx = xa - xb
        dx = jnp.where(dx == 0.0, 1e-9, dx)
        dy = ya - yb
        mag = jnp.sqrt(dx * dx + dy * dy)
        delta = mu * (mag - term_dist) / 2.0
        r = jnp.where(vf > 0, delta / mag, 0.0)
        rx = r * dx
        ry = r * dy

        # scatter-add both endpoints: spreads built in 3D (value broadcast
        # against lane one-hot), then transposed matmuls into the (ch,384)
        # accumulator block, revisited across grid chunks
        def spread(idx, v0, v1, v2):
            io = jax.lax.broadcasted_iota(jnp.int32, (1, 1, LANE), 2)
            e = (idx[:, :, None] == io).astype(jnp.float32)
            return jnp.concatenate(
                [e * v0[:, :, None], e * v1[:, :, None], e * v2[:, :, None]],
                axis=2,
            ).reshape(CHUNK, 3 * LANE)

        spread_a = spread(ep_a & 127, -rx, -ry, vf)
        spread_b = spread(eb & 127, rx, ry, vf)
        acc = jax.lax.dot_general(
            e_hi_a,
            spread_a,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            e_hi_b2,
            spread_b,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] = acc_ref[:] + acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec(
                (6, RC, LANE),
                lambda c, s, e: (0, (s[0] + c) % n_rcblk, 0),
            ),
            pl.BlockSpec(
                (4, RC, LANE),
                lambda c, s, e: (0, (s[0] + c) % n_rcblk, 0),
            ),
            pl.BlockSpec((bh, 3 * LANE), lambda c, s, e: (0, 0)),
            pl.BlockSpec((ch, 2 * LANE), lambda c, s, e: (0, 0)),
        ],
        out_specs=pl.BlockSpec((ch, 3 * LANE), lambda c, s, e: (0, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ch, 3 * LANE), jnp.float32),
        interpret=interpret,
    )


def batch_update(coords_planes, data: PallasSgdData, cfg, start_rcblk, seed,
                 cooling, eta, nchunks: int, interpret: bool = False):
    """One update batch of nchunks*CHUNK pairs; returns new coord planes."""
    call = _make_batch_kernel(cfg, data, nchunks, interpret)
    scal = jnp.stack(
        [
            start_rcblk.astype(jnp.int32),
            seed.astype(jnp.int32),
            cooling.astype(jnp.int32),
        ]
    )
    eta_arr = jnp.asarray(eta, jnp.float32).reshape(1)
    acc = call(scal, eta_arr, data.ai, data.af, data.tb, coords_planes)
    cnt = jnp.maximum(acc[:, 2 * LANE :], 1.0)
    upd = acc[:, : 2 * LANE] / jnp.concatenate([cnt, cnt], axis=1)
    return coords_planes + upd


@partial(
    jax.jit,
    static_argnames=("cfg", "num_batches", "nchunks", "interpret"),
    donate_argnums=(0,),
)
def pallas_sgd_2d_run(
    coords_planes, etas, data: PallasSgdData, cfg, num_batches: int,
    nchunks: int, interpret: bool = False,
):
    """The complete 2D layout optimization with the fused Pallas batch."""
    first_cooling = cfg.first_cooling_iteration
    n_rcblk = data.s_pad // CHUNK

    def iter_body(it, co):
        eta = etas[it]
        cooling = (it >= first_cooling).astype(jnp.int32)

        def body(b, co):
            g = it * num_batches + b
            start = (g * nchunks) % n_rcblk
            seed = jnp.int32(cfg.seed) + g * jnp.int32(1000003)
            return batch_update(
                co, data, cfg, start, seed, cooling, eta, nchunks, interpret
            )

        return jax.lax.fori_loop(0, num_batches, body, co)

    return jax.lax.fori_loop(0, cfg.iter_max, iter_body, coords_planes)


def path_sgd_2d_pallas(
    g, coords0: np.ndarray, cfg=None, interpret: Optional[bool] = None
) -> np.ndarray:
    """Drop-in alternative to ops.sgd.path_sgd_2d on the Pallas fast path.

    Batch size is nchunks*CHUNK with the same epoch_div staleness cap as
    the XLA path; falls back is the caller's responsibility (see
    ops.sgd.path_sgd_2d which dispatches on pallas_supported()).
    """
    from .sgd import derive_config_2d, sgd_schedule

    if cfg is None:
        cfg = derive_config_2d(g)
    if not (g.path_step_count > 1).any():
        return np.asarray(coords0, np.float64)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    data = PallasSgdData.build(
        g, cfg.theta, cfg.space, cfg.space_max, cfg.space_quantization_step
    )
    nchunks = max(1, cfg.batch_size // CHUNK)
    num_batches = max(1, -(-cfg.min_term_updates // (nchunks * CHUNK)))
    co = jnp.asarray(
        coords_to_planes(np.asarray(coords0, np.float32), data.ch)
    )
    etas = jnp.asarray(
        sgd_schedule(
            1.0 / cfg.eta_max, 1.0, cfg.iter_max,
            cfg.iter_with_max_learning_rate, cfg.eps,
        ),
        jnp.float32,
    )
    out = pallas_sgd_2d_run(
        co, etas, data, cfg, num_batches, nchunks, interpret
    )
    return planes_to_coords(np.asarray(out), 2 * g.num_nodes).astype(
        np.float64
    )


def pallas_supported(g, cfg) -> bool:
    """Whether the Pallas fast path applies to this graph/config."""
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if g.num_steps < CHUNK:
        return False
    max_val = max(
        int(g.step_pos.max(initial=0)) + int(g.node_len.max(initial=0)),
        2 * g.num_nodes,
    )
    if max_val >= 2**24:
        return False
    bh = _pad_to(max(-(-g.num_steps // LANE), 1), 8)
    ch = _pad_to(max(-(-2 * g.num_nodes // LANE), 1), 8)
    return (bh * 384 + ch * (256 + 384)) * 4 < 8 * 1024 * 1024
