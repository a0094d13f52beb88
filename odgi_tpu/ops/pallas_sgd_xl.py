"""HBM-streaming variant of the replica PG-SGD kernel (2D) for graphs
whose step planes exceed VMEM (~1.7M steps for 2D at v5e's 128MB; see
ops/pallas_sgd.py for the resident variant and the shared semantics).

Differences from the resident kernel:

- The static planes, drift planes and base planes live in HBM
  (`memory_space=ANY`); drift and base are input/output-aliased so their
  state persists across merge groups within one dispatch.
- Each chunk DMAs its A/B windows into VMEM scratch, computes the same
  pair updates, and DMAs the modified drift windows back.  When the two
  windows overlap or nearly so (jump D < 2*CHUNK — the common case after
  cooling), the chunk operates on ONE union window so no write-back can
  drop the other side's contribution; far jumps use two disjoint
  windows.  Chunks are serialized (write-back completes before the next
  chunk's reads), trading peak throughput for correctness — still ~two
  orders of magnitude over the XLA fallback at this scale.
- The consensus merge streams tiles: pass 1 DMAs (handle, drift) tiles
  and folds the one-hot scatter into the VMEM node accumulator; pass 2
  DMAs base tiles, adds the broadcast update, writes base back and
  zeroes the drift tile.

Sampling, update math, coins, accounting and the host twin are shared
with ops/pallas_sgd.py (the `plan_run` geometry and
`path_sgd_2d_strata_xla` apply unchanged).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_sgd import (
    _ABLATE,
    CHUNK,
    LANE,
    RC,
    TR,
    n_step_tiles,
    _dev_arrays,
    _POS,
    _POSEND,
    _HANDLE,
    _PATH,
    _dot2,
    _DIMS_SCATTER,
    _DIMS_BCAST,
    _pad_to,
    _pair_coins,
    _recip_r,
    _segments,
    _stage_group_scalars,
    _twosum_update,
    coords_to_node_array,
    node_array_to_coords,
    plan_run,
)

# union window rows for near jumps: covers D < 2*CHUNK
_UW = 4 * RC


def _ep_indices(g, pr: int, one_d: bool):
    """Padded step->endpoint gather indices for the on-device cp0
    build (pad slots hit the zero-valued dummy endpoint/node)."""
    S = g.num_steps
    node = (g.step_handle >> 1).astype(np.int64)
    if one_d:
        nd = np.full(pr * LANE, g.num_nodes, np.int32)
        nd[:S] = node
        return nd
    orient = (g.step_handle & 1).astype(np.int64)
    epf = np.full(pr * LANE, 2 * g.num_nodes, np.int32)
    epf[:S] = 2 * node + orient
    return epf, epf ^ 1


@partial(jax.jit, static_argnames=("pr", "idx_count"))
def _cp0_device_2d(coords, epf, epr, pr: int, idx_count: int):
    """(2N, 2) coords -> (4, pr, LANE) replica planes via on-device
    gathers — replaces a host build + upload of the full step-sized
    planes (hundreds of MB at chromosome scale) with a 2N-float upload.
    Values match pallas_sgd._step_coord_planes + _pad_planes exactly
    (pad slots gather the zero dummy endpoint)."""
    c = coords.astype(jnp.float32)
    zpad = jnp.zeros(idx_count - c.shape[0], jnp.float32)
    xf = jnp.concatenate([c[:, 0], zpad])
    yf = jnp.concatenate([c[:, 1], zpad])
    return jnp.stack(
        [xf[epf], xf[epr], yf[epf], yf[epr]]
    ).reshape(4, pr, LANE)


@partial(jax.jit, static_argnames=("pr", "idx_count"))
def _cp0_device_1d(x, nd, pr: int, idx_count: int):
    xv = x.astype(jnp.float32)
    zpad = jnp.zeros(idx_count - xv.shape[0], jnp.float32)
    xq = jnp.concatenate([xv, zpad])
    return xq[nd].reshape(1, pr, LANE)


def _pack_od_xl(p: dict) -> np.ndarray:
    """(groups, 4, cgs_pad) i32: rows [o, D, sync, pad] per chunk.
    sync=1 marks a chunk whose read windows intersect the PREVIOUS
    chunk's windows: its reads must not be prefetched past that chunk's
    drift write-back (a stale prefetched window would be written back
    whole, erasing the previous chunk's updates).  On chromosome-scale
    graphs the flag fires for ~window-span/PR of chunks (~0.1%), so
    prefetching stays on almost everywhere while results remain
    BIT-IDENTICAL to the serialized kernel."""
    groups, cgs = p["groups"], p["cgs"]
    cgs_pad = _pad_to(cgs, LANE)
    o = p["o_blk"].astype(np.int64)
    d = p["d_arr"].astype(np.int64)
    r0 = o + (d >> 7)
    # spans: A-union [o, o+_UW), far-B [r0, r0+2RC)
    a0, a1 = o, o + _UW
    b0, b1 = r0, r0 + 2 * RC
    def inter(x0, x1, y0, y1):
        return (x0 < y1) & (y0 < x1)
    prev = np.zeros(len(o), bool)
    prev[1:] = (
        inter(a0[1:], a1[1:], a0[:-1], a1[:-1])
        | inter(a0[1:], a1[1:], b0[:-1], b1[:-1])
        | inter(b0[1:], b1[1:], a0[:-1], a1[:-1])
        | inter(b0[1:], b1[1:], b0[:-1], b1[:-1])
    )
    # chunk 0 of each group is issued before the loop: never needs sync
    prev[:: cgs] = False
    # row 3 is alignment padding (DMA tiling wants multiples of 4)
    od = np.zeros((groups, 4, cgs_pad), np.int32)
    od[:, 0, :cgs] = p["o_blk"].reshape(groups, cgs)
    od[:, 1, :cgs] = p["d_arr"].reshape(groups, cgs)
    od[:, 1, cgs:] = 1
    od[:, 2, :cgs] = prev.reshape(groups, cgs)
    return od


def _compute_pair(pa, pb, ca_, cb_, eta_lr, gchunk_global):
    """Shared pair math on already-gathered (4, RC, 128) A/B windows of
    (planes, absolute coords); returns (va, vb) drift contributions.
    Identical math to pallas_sgd._chunk_2d (reference: layout.cu:141-188).
    """
    pa0, pa1, patha = pa[_POS], pa[_POSEND], pa[_PATH]
    pb0, pb1, pathb = pb[_POS], pb[_POSEND], pb[_PATH]
    xfa, xra, yfa, yra = ca_[0], ca_[1], ca_[2], ca_[3]
    xfb, xrb, yfb, yrb = cb_[0], cb_[1], cb_[2], cb_[3]

    coins = _pair_coins(gchunk_global * 1000003 + 0)
    caf = (coins[0] & 1) == 0
    cbf = (coins[1] & 1) == 0

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
    zero = jnp.zeros_like(rx)
    va = jnp.stack([
        jnp.where(caf, -rx, zero), jnp.where(caf, zero, -rx),
        jnp.where(caf, -ry, zero), jnp.where(caf, zero, -ry),
    ])
    vb = jnp.stack([
        jnp.where(cbf, rx, zero), jnp.where(cbf, zero, rx),
        jnp.where(cbf, ry, zero), jnp.where(cbf, zero, ry),
    ])
    return va, vb


def _rot_b(rows, c_sh, keep):
    r1 = pltpu.roll(rows, (LANE - c_sh) & (LANE - 1), axis=2)
    return jnp.where(keep, r1[:, 0:RC], r1[:, 1 : RC + 1])


def _spread_b(v, c_sh, lane2):
    """(4, RC, 128) B contributions -> (4, 2*RC, 128) window-aligned."""
    rot = pltpu.roll(v, c_sh, axis=2)
    z1 = jnp.zeros((4, 1, LANE), jnp.float32)
    z = jnp.zeros((4, RC - 1, LANE), jnp.float32)
    top = jnp.concatenate([rot, z1, z], axis=1)
    bot = jnp.concatenate([z1, rot, z], axis=1)
    return jnp.where(lane2 >= c_sh, top, bot)


def _dma_helpers(sem):
    """(dma, dma_group) bound to a DMA-semaphore array: dma is a
    synchronous copy; dma_group overlaps independent transfers (start
    all, then wait all).  ONE definition for every streaming kernel —
    the semaphore/copy protocol must not diverge between copies."""

    def dma(src, dst, s):
        cp = pltpu.make_async_copy(src, dst, sem.at[s])
        cp.start()
        cp.wait()

    def dma_group(*copies):
        objs = [
            pltpu.make_async_copy(src, dst, sem.at[s])
            for src, dst, s in copies
        ]
        for o in objs:
            o.start()
        for o in objs:
            o.wait()

    return dma, dma_group


def _run_chunks_2d(cgs, gid, meta_ref, od_smem, eta_lr,
                   planes_hbm, drift_hbm, base_hbm,
                   pw_sc, cw_sc, bw_sc, pwb_sc, cwb_sc, bwb_sc, wb_sc,
                   sem):
    """The 2D streaming chunk phase (shared by the XL and big-N
    kernels): double-buffered window DMAs + pair updates + drift
    write-backs for one merge group of `cgs` chunks."""

    dma, dma_group = _dma_helpers(sem)

    keep_tpl = jax.lax.broadcasted_iota(jnp.int32, (1, RC, LANE), 2)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * RC, LANE), 2)

    def read_copies(c):
        """The 6 uniform window reads of chunk c into slot c&1: the
        union span at o_blk (covers A and near-B) plus the far-B span
        at r0 (redundant for near chunks; uniformity lets chunk c+1's
        reads prefetch during chunk c's compute without branching).

        Concurrency contract: a chunk whose windows intersect the
        previous chunk's windows carries sync=1 in the od array
        (_pack_od_xl) and is NOT prefetched — its reads are issued
        after that chunk's drift write-back completes.  All other
        chunks touch disjoint spans, so their prefetched reads
        cannot observe (or clobber) in-flight write-backs; results
        are bit-identical to the fully serialized kernel."""
        slot = c & 1
        o_blk = od_smem[0, c]
        D = od_smem[1, c]
        r0 = o_blk + jax.lax.shift_right_logical(D, 7)
        return [
            pltpu.make_async_copy(
                planes_hbm.at[:, pl.ds(o_blk, _UW), :],
                pw_sc.at[slot], sem.at[slot * 6 + 0]),
            pltpu.make_async_copy(
                drift_hbm.at[:, pl.ds(o_blk, _UW), :],
                cw_sc.at[slot], sem.at[slot * 6 + 1]),
            pltpu.make_async_copy(
                base_hbm.at[:, pl.ds(o_blk, _UW), :],
                bw_sc.at[slot], sem.at[slot * 6 + 2]),
            pltpu.make_async_copy(
                planes_hbm.at[:, pl.ds(r0, 2 * RC), :],
                pwb_sc.at[slot], sem.at[slot * 6 + 3]),
            pltpu.make_async_copy(
                drift_hbm.at[:, pl.ds(r0, 2 * RC), :],
                cwb_sc.at[slot], sem.at[slot * 6 + 4]),
            pltpu.make_async_copy(
                base_hbm.at[:, pl.ds(r0, 2 * RC), :],
                bwb_sc.at[slot], sem.at[slot * 6 + 5]),
        ]

    for cp in read_copies(0):
        cp.start()

    def chunk(c, _):
        slot = c & 1
        gl = gid * cgs + c
        o_blk = od_smem[0, c]
        D = od_smem[1, c]
        r0 = o_blk + jax.lax.shift_right_logical(D, 7)
        c_sh = jnp.bitwise_and(D, LANE - 1)
        keep = keep_tpl < (LANE - c_sh)
        near = D < (2 * CHUNK)

        # sync chunks were NOT prefetched (their windows intersect
        # the previous chunk's write-back): read them now, after it
        @pl.when(od_smem[2, c] != 0)
        def _():
            for cp in read_copies(c):
                cp.start()

        for cp in read_copies(c):
            cp.wait()

        # clamp the lookahead (c+1 == cgs_pad on the last chunk when
        # cgs is already lane-aligned); the value is discarded there
        nxt = jnp.minimum(c + 1, od_smem.shape[1] - 1)
        @pl.when(jnp.logical_and(c + 1 < cgs,
                                 od_smem[2, nxt] == 0))
        def _():
            for cp in read_copies(c + 1):
                cp.start()

        # ---- near path: one union window of _UW rows at o_blk ----
        @pl.when(near)
        def _():
            db = r0 - o_blk  # rows 0..15 (D < 2*CHUNK)
            pa = pw_sc[slot, :, 0:RC, :]
            pb = _rot_b(
                pw_sc[slot, :, pl.ds(db, 2 * RC), :], c_sh, keep
            )
            ca_ = (cw_sc[slot, :, 0:RC, :]
                   + bw_sc[slot, :, 0:RC, :])
            cb_rows = (
                cw_sc[slot, :, pl.ds(db, 2 * RC), :]
                + bw_sc[slot, :, pl.ds(db, 2 * RC), :]
            )
            cb_ = _rot_b(cb_rows, c_sh, keep)
            va, vb = _compute_pair(pa, pb, ca_, cb_, eta_lr,
                                   meta_ref[0] + gl)
            wb_sc[:] = cw_sc[slot]
            wb_sc[:, 0:RC, :] = wb_sc[:, 0:RC, :] + va
            sb = _spread_b(vb, c_sh, lane2)
            wb_sc[:, pl.ds(db, 2 * RC), :] = (
                wb_sc[:, pl.ds(db, 2 * RC), :] + sb
            )
            if "nowb" not in _ABLATE:  # timing ablation (wrong results)
                dma(wb_sc, drift_hbm.at[:, pl.ds(o_blk, _UW), :], 14)

        # ---- far path: A from the union span, B from its own span --
        @pl.when(jnp.logical_not(near))
        def _():
            pa = pw_sc[slot, :, 0:RC, :]
            pb = _rot_b(pwb_sc[slot], c_sh, keep)
            ca_ = (cw_sc[slot, :, 0:RC, :]
                   + bw_sc[slot, :, 0:RC, :])
            cb_ = _rot_b(cwb_sc[slot] + bwb_sc[slot], c_sh, keep)
            va, vb = _compute_pair(pa, pb, ca_, cb_, eta_lr,
                                   meta_ref[0] + gl)
            wb_sc[:, 0:RC, :] = cw_sc[slot, :, 0:RC, :] + va
            sb = _spread_b(vb, c_sh, lane2)
            wb_sc[:, RC : RC + 2 * RC, :] = cwb_sc[slot] + sb
            if "nowb" not in _ABLATE:  # timing ablation (wrong results)
                dma_group(
                    (wb_sc.at[:, 0:RC, :],
                     drift_hbm.at[:, pl.ds(o_blk, RC), :], 14),
                    (wb_sc.at[:, RC : RC + 2 * RC, :],
                     drift_hbm.at[:, pl.ds(r0, 2 * RC), :], 15),
                )

        return 0

    jax.lax.fori_loop(0, cgs, chunk, 0)


def _make_kernel_xl(cgs: int, n_tiles: int, nl: int, pr: int):
    def kernel(meta_ref, eta_ref, od_ref, planes_hbm, cp0_hbm, xy_ref,
               recip_ref, drift_in, base_in, lo_in, out_ref, drift_hbm,
               base_hbm, lo_ref, acc_sc, od_smem,
               pw_sc, cw_sc, bw_sc, pwb_sc, cwb_sc, bwb_sc, wb_sc,
               mh_sc, md_sc, mb_sc, sem):
        # drift_in/base_in are the aliased input views of drift_hbm/
        # base_hbm (same buffers); all access goes through the outputs
        del drift_in, base_in
        gid = pl.program_id(0)

        dma, dma_group = _dma_helpers(sem)

        @pl.when(gid == 0)
        def _():
            # per-dispatch: the node-array output and its TwoSum
            # compensation plane restart from the inputs (= the previous
            # segment's outputs); the host folds out + lo once after the
            # FINAL segment, so results are segmentation-invariant
            out_ref[:] = xy_ref[:]
            lo_ref[:] = lo_in[:]

        @pl.when(jnp.logical_and(gid == 0, meta_ref[0] == 0))
        def _():
            # GLOBAL first segment only (meta[0] = global chunk base):
            # initialize drift = 0 and base = cp0 in HBM, tile by tile.
            # Later segments inherit the aliased drift/base HBM state —
            # re-running this per dispatch would silently reset the
            # replica geometry to the run-initial layout mid-run.
            def init_tile(t, _):
                r = t * TR
                dma(cp0_hbm.at[:, pl.ds(r, TR), :], mb_sc, 0)
                dma(mb_sc, base_hbm.at[:, pl.ds(r, TR), :], 1)
                md_sc[:] = jnp.zeros_like(md_sc)
                dma(md_sc, drift_hbm.at[:, pl.ds(r, TR), :], 2)
                return 0

            jax.lax.fori_loop(0, pr // TR, init_tile, 0)

        _stage_group_scalars(od_ref, od_smem, sem.at[12], gid)
        eta_lr = eta_ref[gid]

        _run_chunks_2d(cgs, gid, meta_ref, od_smem, eta_lr,
                       planes_hbm, drift_hbm, base_hbm,
                       pw_sc, cw_sc, bw_sc, pwb_sc, cwb_sc, bwb_sc, wb_sc,
                       sem)

        # ---- consensus merge, streaming tiles from HBM ----
        iota_nl = jax.lax.broadcasted_iota(jnp.int32, (TR, LANE, nl), 2)
        iota_128 = jax.lax.broadcasted_iota(jnp.int32, (TR, LANE, LANE), 2)

        def onehots():
            h = mh_sc[0]
            epf = 2 * jax.lax.shift_right_logical(h, 1) + (h & 1)
            hi = jax.lax.shift_right_logical(epf, 7)
            lof = epf & (LANE - 1)
            e_hi = (hi[:, :, None] == iota_nl).astype(jnp.float32)
            e_lo_f = (
                (lof[:, :, None] == iota_128)
                .astype(jnp.float32)
                .reshape(TR * LANE, LANE)
                .astype(jnp.bfloat16)
            )
            e_lo_r = (
                ((lof ^ 1)[:, :, None] == iota_128)
                .astype(jnp.float32)
                .reshape(TR * LANE, LANE)
                .astype(jnp.bfloat16)
            )
            return e_hi, e_lo_f, e_lo_r

        def scatter_tile(t, _):
            r = t * TR
            dma(planes_hbm.at[_HANDLE, pl.ds(r, TR), :], mh_sc.at[0], 0)
            dma(drift_hbm.at[:, pl.ds(r, TR), :], md_sc, 1)
            e_hi, e_lo_f, e_lo_r = onehots()

            def piece(p):
                return e_hi * md_sc[p][:, :, None]

            pf = jnp.concatenate([piece(0), piece(2)], axis=2).reshape(
                TR * LANE, 2 * nl
            )
            pr_ = jnp.concatenate([piece(1), piece(3)], axis=2).reshape(
                TR * LANE, 2 * nl
            )
            acc_sc[:] = (
                acc_sc[:]
                + _dot2(e_lo_f, pf, _DIMS_SCATTER)
                + _dot2(e_lo_r, pr_, _DIMS_SCATTER)
            )
            return 0

        acc_sc[:] = jnp.zeros_like(acc_sc)
        jax.lax.fori_loop(0, n_tiles, scatter_tile, 0)
        upd = acc_sc[:] * recip_ref[:]
        _twosum_update(out_ref, lo_ref, upd)

        def bcast_tile(t, _):
            r = t * TR
            dma(planes_hbm.at[_HANDLE, pl.ds(r, TR), :], mh_sc.at[0], 0)
            dma(base_hbm.at[:, pl.ds(r, TR), :], mb_sc, 1)
            e_hi, e_lo_f, e_lo_r = onehots()
            t1f = _dot2(e_lo_f, upd, _DIMS_BCAST)
            t1r = _dot2(e_lo_r, upd, _DIMS_BCAST)
            t1f = t1f.reshape(TR, LANE, 2 * nl)
            t1r = t1r.reshape(TR, LANE, 2 * nl)
            vxf = jnp.sum(t1f[:, :, :nl] * e_hi, axis=2)
            vyf = jnp.sum(t1f[:, :, nl:] * e_hi, axis=2)
            vxr = jnp.sum(t1r[:, :, :nl] * e_hi, axis=2)
            vyr = jnp.sum(t1r[:, :, nl:] * e_hi, axis=2)
            mb_sc[:] = mb_sc[:] + jnp.stack([vxf, vxr, vyf, vyr])
            dma(mb_sc, base_hbm.at[:, pl.ds(r, TR), :], 2)
            md_sc[:] = jnp.zeros_like(md_sc)
            dma(md_sc, drift_hbm.at[:, pl.ds(r, TR), :], 3)
            return 0

        jax.lax.fori_loop(0, n_tiles, bcast_tile, 0)

    return kernel


@partial(
    jax.jit,
    static_argnames=("groups", "cgs", "n_tiles", "nl", "pr", "interpret"),
)
def _pallas_call_xl(meta, eta_g, od_all, planes, cp0, xy0, recip,
                    drift0, base0, lo0,
                    groups: int, cgs: int, n_tiles: int, nl: int, pr: int,
                    interpret: bool = False):
    w = 2 * nl
    kernel = _make_kernel_xl(cgs, n_tiles, nl, pr)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(groups,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # od (groups, 4, cgs_pad)
            pl.BlockSpec(memory_space=pltpu.ANY),  # planes (4, PR, 128) HBM
            pl.BlockSpec(memory_space=pltpu.ANY),  # cp0 (4, PR, 128) HBM
            pl.BlockSpec(
                (LANE, w), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (LANE, w), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),  # drift (aliased out 1)
            pl.BlockSpec(memory_space=pltpu.ANY),  # base  (aliased out 2)
            pl.BlockSpec(
                (LANE, w), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
            ),  # lo (TwoSum compensation, carried across segments)
        ],
        out_specs=(
            pl.BlockSpec(
                (LANE, w), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (LANE, w), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((LANE, w), jnp.float32),        # acc
            pltpu.SMEM((4, od_all.shape[2]), jnp.int32),
            pltpu.VMEM((2, 4, _UW, LANE), jnp.int32),   # planes A slots
            pltpu.VMEM((2, 4, _UW, LANE), jnp.float32), # drift A slots
            pltpu.VMEM((2, 4, _UW, LANE), jnp.float32), # base A slots
            pltpu.VMEM((2, 4, 2 * RC, LANE), jnp.int32),   # planes B
            pltpu.VMEM((2, 4, 2 * RC, LANE), jnp.float32), # drift B
            pltpu.VMEM((2, 4, 2 * RC, LANE), jnp.float32), # base B
            pltpu.VMEM((4, _UW, LANE), jnp.float32),    # write-back
            pltpu.VMEM((1, TR, LANE), jnp.int32),       # merge handle tile
            pltpu.VMEM((4, TR, LANE), jnp.float32),     # merge drift tile
            pltpu.VMEM((4, TR, LANE), jnp.float32),     # merge base tile
            pltpu.SemaphoreType.DMA((16,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((LANE, w), jnp.float32),
            jax.ShapeDtypeStruct(drift0.shape, jnp.float32),
            jax.ShapeDtypeStruct(base0.shape, jnp.float32),
            jax.ShapeDtypeStruct((LANE, w), jnp.float32),
        ),
        input_output_aliases={7: 1, 8: 2},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
            has_side_effects=True,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(meta, eta_g, od_all, planes, cp0, xy0, recip, drift0, base0, lo0)


def path_sgd_2d_pallas_xl(g, coords0: np.ndarray, cfg=None,
                          interpret=None) -> np.ndarray:
    """HBM-streaming 2D PG-SGD for graphs past the VMEM-resident cap."""
    from .sgd import derive_config_2d

    if cfg is None:
        cfg = derive_config_2d(g)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if not (g.path_step_count > 1).any():
        return np.asarray(coords0, np.float64)
    p = plan_run(g, cfg, one_d=False)
    data = p["data"]
    nl = data.ch
    pr = data.planes.shape[1]
    n_tiles = n_step_tiles(data.num_steps)
    seed = int(cfg.seed) & 0x7FFFFFFF
    cgs = p["cgs"]

    recip, od_all, eta_g, epf_d, epr_d = _dev_arrays(
        g,
        (id(g), cfg, "xl2d", RC),
        lambda: (
            jnp.asarray(_recip_r(g, nl, one_d=False)),
            jnp.asarray(_pack_od_xl(p)),
            jnp.asarray(p["eta_arr"].reshape(p["groups"], cgs)[:, 0]),
            *map(jnp.asarray, _ep_indices(g, pr, one_d=False)),
        ),
    )
    # cp0 built ON DEVICE from the (2N, 2) coords (a host build +
    # upload of the step-sized planes costs seconds at chromosome
    # scale through the relay)
    cp0 = _cp0_device_2d(
        jnp.asarray(np.asarray(coords0, np.float32)), epf_d, epr_d,
        pr, 2 * g.num_nodes + 2,
    )
    xy = jnp.asarray(
        coords_to_node_array(np.asarray(coords0, np.float32), nl)
    )
    drift = jnp.zeros((4, pr, LANE), jnp.float32)
    base = cp0
    lo = jnp.zeros((LANE, 2 * nl), jnp.float32)

    for g0, n_g in _segments(p["groups"], cgs):
        meta = jnp.asarray([g0 * cgs, seed], jnp.int32)
        xy, drift, base, lo = _pallas_call_xl(
            meta, eta_g[g0 : g0 + n_g], od_all[g0 : g0 + n_g],
            data.planes, cp0, xy, recip, drift, base, lo,
            n_g, cgs, n_tiles, nl, pr, bool(interpret),
        )
    # fold the TwoSum compensation plane once, after the final segment
    # (f32 add — the same arithmetic the resident kernel's in-kernel
    # final fold performs)
    xy_final = np.asarray(xy) + np.asarray(lo)
    return node_array_to_coords(
        xy_final, 2 * g.num_nodes, nl
    ).astype(np.float64)


def xl_supported(g, cfg) -> bool:
    """The streaming path needs only HBM for the planes; caps: node
    capacity for the one-hot merge, positions in i32, S >= CHUNK."""
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if cfg.delta > 0:
        return False
    if g.num_steps < 1024:
        return False
    max_pos = int(g.step_pos.max(initial=0)) + int(g.node_len.max(initial=0))
    if max_pos >= 2**30:
        return False
    nl = _pad_to(max(-(-(2 * g.num_nodes + 2) // LANE), 1), 8)
    return nl <= 256


# ---------------------------------------------------------------------------
# 1D variant (odgi sort -Y at chromosome scale)
# ---------------------------------------------------------------------------

from .pallas_sgd import (  # noqa: E402
    _P1_HANDLE,
    _P1_PATH,
    _P1_POS,
    x_to_node_array,
    node_array_to_x,
)


def _compute_pair_1d(pa, patha, pb, pathb, xa, xb, eta_lr):
    """1D update math on gathered windows (reference:
    path_sgd.cpp:304-396); returns the +-rr drift contribution."""
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
    return jnp.where(valid, delta / mag * dx, 0.0)


def _spread_b1(v, c_sh, lane2):
    rot = pltpu.roll(v, c_sh, axis=2)
    z1 = jnp.zeros((1, 1, LANE), jnp.float32)
    z = jnp.zeros((1, RC - 1, LANE), jnp.float32)
    top = jnp.concatenate([rot, z1, z], axis=1)
    bot = jnp.concatenate([z1, rot, z], axis=1)
    return jnp.where(lane2 >= c_sh, top, bot)


def _run_chunks_1d(cgs, gid, meta_ref, od_smem, eta_lr,
                   planes_hbm, drift_hbm, base_hbm,
                   pw_sc, cw_sc, bw_sc, pwb_sc, cwb_sc, bwb_sc, wb_sc,
                   sem):
    """The 1D streaming chunk phase (shared by the XL and big-N
    kernels).  Double-buffered like _run_chunks_2d: chunk c+1's window
    reads prefetch during chunk c's compute unless the od sync flag
    marks an overlap with c's write-back (then they are issued after
    it), so results stay bit-identical to the serialized kernel."""
    del gid, meta_ref  # 1D update math consumes no coins

    dma, dma_group = _dma_helpers(sem)

    keep_tpl = jax.lax.broadcasted_iota(jnp.int32, (1, RC, LANE), 2)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * RC, LANE), 2)

    def read_copies(c):
        """6 uniform window reads of chunk c into slot c&1 (see
        _run_chunks_2d for the prefetch/sync contract)."""
        slot = c & 1
        o_blk = od_smem[0, c]
        D = od_smem[1, c]
        r0 = o_blk + jax.lax.shift_right_logical(D, 7)
        return [
            pltpu.make_async_copy(
                planes_hbm.at[:, pl.ds(o_blk, _UW), :],
                pw_sc.at[slot], sem.at[slot * 6 + 0]),
            pltpu.make_async_copy(
                drift_hbm.at[:, pl.ds(o_blk, _UW), :],
                cw_sc.at[slot], sem.at[slot * 6 + 1]),
            pltpu.make_async_copy(
                base_hbm.at[:, pl.ds(o_blk, _UW), :],
                bw_sc.at[slot], sem.at[slot * 6 + 2]),
            pltpu.make_async_copy(
                planes_hbm.at[:, pl.ds(r0, 2 * RC), :],
                pwb_sc.at[slot], sem.at[slot * 6 + 3]),
            pltpu.make_async_copy(
                drift_hbm.at[:, pl.ds(r0, 2 * RC), :],
                cwb_sc.at[slot], sem.at[slot * 6 + 4]),
            pltpu.make_async_copy(
                base_hbm.at[:, pl.ds(r0, 2 * RC), :],
                bwb_sc.at[slot], sem.at[slot * 6 + 5]),
        ]

    for cp in read_copies(0):
        cp.start()

    def chunk(c, _):
        slot = c & 1
        o_blk = od_smem[0, c]
        D = od_smem[1, c]
        r0 = o_blk + jax.lax.shift_right_logical(D, 7)
        c_sh = jnp.bitwise_and(D, LANE - 1)
        keep = keep_tpl < (LANE - c_sh)
        near = D < (2 * CHUNK)

        @pl.when(od_smem[2, c] != 0)
        def _():
            for cp in read_copies(c):
                cp.start()

        for cp in read_copies(c):
            cp.wait()

        nxt = jnp.minimum(c + 1, od_smem.shape[1] - 1)

        @pl.when(jnp.logical_and(c + 1 < cgs, od_smem[2, nxt] == 0))
        def _():
            for cp in read_copies(c + 1):
                cp.start()

        # ---- near path: one union window of _UW rows at o_blk ----
        @pl.when(near)
        def _():
            db = r0 - o_blk
            pa = pw_sc[slot, _P1_POS, 0:RC, :]
            patha = pw_sc[slot, _P1_PATH, 0:RC, :]
            pbw = _rot_b(pw_sc[slot, :, pl.ds(db, 2 * RC), :], c_sh, keep)
            xa = cw_sc[slot, 0, 0:RC, :] + bw_sc[slot, 0, 0:RC, :]
            xbw = _rot_b(
                cw_sc[slot, :, pl.ds(db, 2 * RC), :]
                + bw_sc[slot, :, pl.ds(db, 2 * RC), :],
                c_sh, keep,
            )
            rr = _compute_pair_1d(
                pa, patha, pbw[_P1_POS], pbw[_P1_PATH], xa, xbw[0],
                eta_lr,
            )
            wb_sc[:] = cw_sc[slot]
            wb_sc[0, 0:RC, :] = wb_sc[0, 0:RC, :] - rr
            sb = _spread_b1(rr[None], c_sh, lane2)
            wb_sc[:, pl.ds(db, 2 * RC), :] = (
                wb_sc[:, pl.ds(db, 2 * RC), :] + sb
            )
            dma(wb_sc, drift_hbm.at[:, pl.ds(o_blk, _UW), :], 14)

        # ---- far path: A from the union span, B from its own span --
        @pl.when(jnp.logical_not(near))
        def _():
            pa = pw_sc[slot, _P1_POS, 0:RC, :]
            patha = pw_sc[slot, _P1_PATH, 0:RC, :]
            pbw = _rot_b(pwb_sc[slot], c_sh, keep)
            xa = cw_sc[slot, 0, 0:RC, :] + bw_sc[slot, 0, 0:RC, :]
            xbw = _rot_b(cwb_sc[slot] + bwb_sc[slot], c_sh, keep)
            rr = _compute_pair_1d(
                pa, patha, pbw[_P1_POS], pbw[_P1_PATH], xa, xbw[0],
                eta_lr,
            )
            wb_sc[0, 0:RC, :] = cw_sc[slot, 0, 0:RC, :] - rr
            sb = _spread_b1(rr[None], c_sh, lane2)
            wb_sc[:, RC : RC + 2 * RC, :] = cwb_sc[slot] + sb
            dma_group(
                (wb_sc.at[:, 0:RC, :],
                 drift_hbm.at[:, pl.ds(o_blk, RC), :], 14),
                (wb_sc.at[:, RC : RC + 2 * RC, :],
                 drift_hbm.at[:, pl.ds(r0, 2 * RC), :], 15),
            )

        return 0

    jax.lax.fori_loop(0, cgs, chunk, 0)


def _make_kernel_xl_1d(cgs: int, n_tiles: int, nl: int, pr: int):
    def kernel(meta_ref, eta_ref, od_ref, planes_hbm, cp0_hbm, x_ref,
               recip_ref, drift_in, base_in, lo_in, out_ref, drift_hbm,
               base_hbm, lo_ref, acc_sc, od_smem,
               pw_sc, cw_sc, bw_sc, pwb_sc, cwb_sc, bwb_sc, wb_sc,
               mh_sc, md_sc, mb_sc, sem):
        del drift_in, base_in
        gid = pl.program_id(0)

        dma, dma_group = _dma_helpers(sem)

        @pl.when(gid == 0)
        def _():
            out_ref[:] = x_ref[:]
            lo_ref[:] = lo_in[:]

        @pl.when(jnp.logical_and(gid == 0, meta_ref[0] == 0))
        def _():
            # global first segment only — see _make_kernel_xl
            def init_tile(t, _):
                r = t * TR
                dma(cp0_hbm.at[:, pl.ds(r, TR), :], mb_sc, 0)
                dma(mb_sc, base_hbm.at[:, pl.ds(r, TR), :], 1)
                md_sc[:] = jnp.zeros_like(md_sc)
                dma(md_sc, drift_hbm.at[:, pl.ds(r, TR), :], 2)
                return 0

            jax.lax.fori_loop(0, pr // TR, init_tile, 0)

        _stage_group_scalars(od_ref, od_smem, sem.at[12], gid)
        eta_lr = eta_ref[gid]

        _run_chunks_1d(cgs, gid, meta_ref, od_smem, eta_lr,
                       planes_hbm, drift_hbm, base_hbm,
                       pw_sc, cw_sc, bw_sc, pwb_sc, cwb_sc, bwb_sc,
                       wb_sc, sem)

        iota_nl = jax.lax.broadcasted_iota(jnp.int32, (TR, LANE, nl), 2)
        iota_128 = jax.lax.broadcasted_iota(jnp.int32, (TR, LANE, LANE), 2)

        def onehots():
            h = mh_sc[0]
            nd = jax.lax.shift_right_logical(h, 1)
            hi = jax.lax.shift_right_logical(nd, 7)
            lo = nd & (LANE - 1)
            e_hi = (hi[:, :, None] == iota_nl).astype(jnp.float32)
            e_lo = (
                (lo[:, :, None] == iota_128)
                .astype(jnp.float32)
                .reshape(TR * LANE, LANE)
                .astype(jnp.bfloat16)
            )
            return e_hi, e_lo

        def scatter_tile(t, _):
            r = t * TR
            dma(planes_hbm.at[_P1_HANDLE, pl.ds(r, TR), :], mh_sc.at[0], 0)
            dma(drift_hbm.at[:, pl.ds(r, TR), :], md_sc, 1)
            e_hi, e_lo = onehots()
            piece = (e_hi * md_sc[0][:, :, None]).reshape(TR * LANE, nl)
            acc_sc[:] = acc_sc[:] + _dot2(e_lo, piece, _DIMS_SCATTER)
            return 0

        acc_sc[:] = jnp.zeros_like(acc_sc)
        jax.lax.fori_loop(0, n_tiles, scatter_tile, 0)
        upd = acc_sc[:] * recip_ref[:]
        _twosum_update(out_ref, lo_ref, upd)

        def bcast_tile(t, _):
            r = t * TR
            dma(planes_hbm.at[_P1_HANDLE, pl.ds(r, TR), :], mh_sc.at[0], 0)
            dma(base_hbm.at[:, pl.ds(r, TR), :], mb_sc, 1)
            e_hi, e_lo = onehots()
            t1 = _dot2(e_lo, upd, _DIMS_BCAST)
            v = jnp.sum(t1.reshape(TR, LANE, nl) * e_hi, axis=2)
            mb_sc[:] = mb_sc[:] + v[None]
            dma(mb_sc, base_hbm.at[:, pl.ds(r, TR), :], 2)
            md_sc[:] = jnp.zeros_like(md_sc)
            dma(md_sc, drift_hbm.at[:, pl.ds(r, TR), :], 3)
            return 0

        jax.lax.fori_loop(0, n_tiles, bcast_tile, 0)

    return kernel


@partial(
    jax.jit,
    static_argnames=("groups", "cgs", "n_tiles", "nl", "pr", "interpret"),
)
def _pallas_call_xl_1d(meta, eta_g, od_all, planes, cp0, x0, recip,
                       drift0, base0, lo0,
                       groups: int, cgs: int, n_tiles: int, nl: int,
                       pr: int, interpret: bool = False):
    kernel = _make_kernel_xl_1d(cgs, n_tiles, nl, pr)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(groups,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (LANE, nl), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (LANE, nl), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (LANE, nl), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
            ),  # lo (TwoSum compensation, carried across segments)
        ],
        out_specs=(
            pl.BlockSpec(
                (LANE, nl), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (LANE, nl), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((LANE, nl), jnp.float32),
            pltpu.SMEM((4, od_all.shape[2]), jnp.int32),
            pltpu.VMEM((2, 3, _UW, LANE), jnp.int32),    # planes A slots
            pltpu.VMEM((2, 1, _UW, LANE), jnp.float32),  # drift A slots
            pltpu.VMEM((2, 1, _UW, LANE), jnp.float32),  # base A slots
            pltpu.VMEM((2, 3, 2 * RC, LANE), jnp.int32),    # planes B
            pltpu.VMEM((2, 1, 2 * RC, LANE), jnp.float32),  # drift B
            pltpu.VMEM((2, 1, 2 * RC, LANE), jnp.float32),  # base B
            pltpu.VMEM((1, _UW, LANE), jnp.float32),     # write-back
            pltpu.VMEM((1, TR, LANE), jnp.int32),
            pltpu.VMEM((1, TR, LANE), jnp.float32),
            pltpu.VMEM((1, TR, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((16,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((LANE, nl), jnp.float32),
            jax.ShapeDtypeStruct(drift0.shape, jnp.float32),
            jax.ShapeDtypeStruct(base0.shape, jnp.float32),
            jax.ShapeDtypeStruct((LANE, nl), jnp.float32),
        ),
        input_output_aliases={7: 1, 8: 2},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
            has_side_effects=True,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(meta, eta_g, od_all, planes, cp0, x0, recip, drift0, base0, lo0)


def path_sgd_1d_pallas_xl(g, cfg=None, x0=None, interpret=None) -> np.ndarray:
    """HBM-streaming 1D PG-SGD for graphs past the VMEM-resident cap."""
    from .sgd import derive_config_1d

    if cfg is None:
        cfg = derive_config_1d(g)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if not (g.path_step_count > 1).any():
        return g.node_offset.astype(np.float64)
    p = plan_run(g, cfg, one_d=True)
    data = p["data"]
    nl = data.ch
    pr = data.planes.shape[1]
    n_tiles = n_step_tiles(data.num_steps)
    seed = int(cfg.seed) & 0x7FFFFFFF
    cgs = p["cgs"]

    x0v = (
        g.node_offset.astype(np.float32)
        if x0 is None
        else np.asarray(x0, np.float32)
    )
    recip, od_all, eta_g, nd_d = _dev_arrays(
        g,
        (id(g), cfg, "xl1d", RC),
        lambda: (
            jnp.asarray(_recip_r(g, nl, one_d=True)),
            jnp.asarray(_pack_od_xl(p)),
            jnp.asarray(p["eta_arr"].reshape(p["groups"], cgs)[:, 0]),
            jnp.asarray(_ep_indices(g, pr, one_d=True)),
        ),
    )
    cp0 = _cp0_device_1d(jnp.asarray(x0v), nd_d, pr, g.num_nodes + 1)
    xn = jnp.asarray(x_to_node_array(x0v, nl))
    drift = jnp.zeros((1, pr, LANE), jnp.float32)
    base = cp0
    lo = jnp.zeros((LANE, nl), jnp.float32)

    for g0, n_g in _segments(p["groups"], cgs):
        meta = jnp.asarray([g0 * cgs, seed], jnp.int32)
        xn, drift, base, lo = _pallas_call_xl_1d(
            meta, eta_g[g0 : g0 + n_g], od_all[g0 : g0 + n_g],
            data.planes, cp0, xn, recip, drift, base, lo,
            n_g, cgs, n_tiles, nl, pr, bool(interpret),
        )
    xn_final = np.asarray(xn) + np.asarray(lo)
    return node_array_to_x(xn_final, g.num_nodes).astype(np.float64)


def xl_supported_1d(g, cfg) -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if cfg.delta > 0:
        return False
    if g.num_steps < 1024:
        return False
    max_pos = int(g.step_pos.max(initial=0)) + int(g.node_len.max(initial=0))
    if max_pos >= 2**30:
        return False
    nl = _pad_to(max(-(-(g.num_nodes + 1) // LANE), 1), 8)
    return nl <= 256
