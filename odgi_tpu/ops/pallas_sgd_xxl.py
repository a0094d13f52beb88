"""Big-N streaming PG-SGD kernels: unbounded NODE count on one chip.

The resident (ops/pallas_sgd.py) and streaming (ops/pallas_sgd_xl.py)
kernels hold the node/endpoint accumulator arrays in VMEM and build
their consensus one-hots over the full endpoint width, which caps the
node count at 16,383 (2D) / 32,767 (1D) — excluding chromosome-scale
pangenome graphs from the fast path (the round-4 verdict's #1 gap;
reference bar: src/cuda/layout.cu:318-343 mallocs N-sized arrays with
no cap).

This variant removes the cap by tiling the consensus merge over
NODE-INDEX BLOCKS of XXL_BS endpoints (default 32768 = 256 lanes x 128
sublanes, one contiguous lane-column slice of the node array):

- Node arrays (coords, TwoSum compensation, 1/R, per-merge update) live
  in HBM and are staged per block into small VMEM scratch.
- A host-built static SCHEDULE lists the (block, step-tile) pairs with
  non-zero incidence, sorted by (block, tile).  Steps outside the
  current block fall out of the local one-hot (their local lane index
  lands outside [0, 256)), so unscheduled pairs contribute exact zeros
  and are simply skipped.  The merge cost therefore adapts to the
  graph's step/node locality: on path-sorted pangenome graphs a step
  tile touches ~1-2 blocks and the merge costs the same O(S) as the
  capped kernels, independent of N.
- The merge runs as two flat passes over the schedule: scatter (fold
  per-block drift sums, write the per-block update to an HBM scratch)
  and broadcast (apply the staged update back into the base planes),
  then one pass over all step tiles to zero the drift planes.

The chunk-update phase (window DMAs + pair updates) is shared verbatim
with the XL kernels (_run_chunks_2d / _run_chunks_1d), so pair
semantics, coins and the host twin are identical; results are intended
to be bit-identical to the XL kernels wherever both apply (pinned by
tests/test_pallas_sgd_xxl.py).
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_sgd import (
    _ABLATE,
    _dev_arrays,
    LANE,
    RC,
    TR,
    n_step_tiles,
    _HANDLE,
    _P1_HANDLE,
    _dot2,
    _DIMS_SCATTER,
    _DIMS_BCAST,
    _pad_to,
    _segments,
    _stage_group_scalars,
    _twosum_update,
    node_array_to_x,
    plan_run,
    x_to_node_array,
)
from .pallas_sgd_xl import (
    _cp0_device_1d,
    _cp0_device_2d,
    _dma_helpers,
    _ep_indices,
    _pack_od_xl,
    _run_chunks_1d,
    _run_chunks_2d,
    _UW,
)

# Endpoints per node block (one merge-accumulator staging unit).  Must
# be a multiple of 128; default 32768 = 256 lanes, the same one-hot
# width the capped kernels use for their whole accumulator.  Tests
# shrink this to force multi-block merges on small graphs.
XXL_BS = int(os.environ.get("ODGI_TPU_PALLAS_XXL_BS", str(32768)))
# Schedule entries staged per SMEM batch.
SCHED_BATCH = 512


def _block_geometry(idx_count: int, bs: int):
    """(NL total node-array lanes, BW block lanes, NB blocks)."""
    bw = bs // LANE
    nl = _pad_to(max(-(-idx_count // LANE), 1), max(8, bw))
    return nl, bw, nl // bw


def _recip_ep(g, nl: int, one_d: bool) -> np.ndarray:
    """(128, NL) static per-ENDPOINT 1/R plane (unlike pallas_sgd._recip_r
    there is no x|y concat — the 2D kernel stages the same block slice
    for both coordinate halves)."""
    node = (g.step_handle >> 1).astype(np.int64)
    r = np.bincount(node, minlength=g.num_nodes).astype(np.float64)
    if one_d:
        idx_count = g.num_nodes
        rr = r
    else:
        idx_count = 2 * g.num_nodes
        rr = np.repeat(r, 2)
    buf = np.zeros(LANE * nl, np.float32)
    buf[:idx_count] = np.where(rr > 0, 1.0 / np.maximum(rr, 1), 0.0)
    return buf.reshape(nl, LANE).T


_PERM_CACHE: dict = {}


def _locality_order(g) -> np.ndarray:
    """Nodes in order of FIRST APPEARANCE along the step table (then any
    never-visited nodes).  The kernel's internal endpoint numbering is
    free — relabeling by first visit restores step/node locality for
    arbitrarily-labeled inputs, collapsing the merge schedule from
    O(tiles x blocks) toward O(tiles + blocks): paths visit nodes in
    roughly first-visit order regardless of how the ids were assigned
    (pangenome haplotypes are collinear except at variants).  Pure
    relabeling: per-endpoint arithmetic and results are unchanged
    (pinned bit-identical in tests/test_pallas_sgd_xxl.py)."""
    node = (g.step_handle >> 1).astype(np.int64)
    vals, idx = np.unique(node, return_index=True)
    visited = vals[np.argsort(idx)]
    unvisited = np.setdiff1d(
        np.arange(g.num_nodes, dtype=np.int64), vals, assume_unique=False
    )
    return np.concatenate([visited, unvisited])


def _relabel_cached(g):
    """(g_run, order) — order is None when the graph is already in
    first-visit order (no copy made)."""
    key = id(g)
    hit = _PERM_CACHE.get(key)
    if hit is not None and hit[0] is g:
        return hit[1]
    order = _locality_order(g)
    if np.array_equal(order, np.arange(g.num_nodes, dtype=np.int64)):
        val = (g, None)
    else:
        val = (g.apply_ordering(order), order)
    _PERM_CACHE[key] = (g, val)
    while len(_PERM_CACHE) > 4:
        _PERM_CACHE.pop(next(iter(_PERM_CACHE)))
    return val


_SCHED_CACHE: dict = {}


def _build_schedule(g, bs: int, one_d: bool):
    """Static (block, tile) incidence schedule, sorted by (block, tile).

    Returns (sched (4, Kpad) i32 rows [tile, block, first, last],
    K, NB).  Only REAL steps feed the schedule: pad steps carry the
    dummy endpoint whose 1/R is 0, so their (block, tile) pairs would
    contribute zero both ways."""
    key = (id(g), bs, one_d, TR)
    hit = _SCHED_CACHE.get(key)
    if hit is not None and hit[0] is g:
        return hit[1]
    node = (g.step_handle >> 1).astype(np.int64)
    if one_d:
        ep = node
        idx_count = g.num_nodes + 1
    else:
        ep = 2 * node + (g.step_handle & 1).astype(np.int64)
        idx_count = 2 * g.num_nodes + 2
    nl, bw, nb = _block_geometry(idx_count, bs)
    tile = np.arange(g.num_steps, dtype=np.int64) // (TR * LANE)
    blk = ep // bs
    n_tiles_tot = int(tile.max()) + 1 if len(tile) else 1
    pairs = np.unique(blk * n_tiles_tot + tile)
    b_arr = (pairs // n_tiles_tot).astype(np.int32)
    t_arr = (pairs % n_tiles_tot).astype(np.int32)
    K = len(pairs)
    first = np.zeros(K, np.int32)
    last = np.zeros(K, np.int32)
    first[0] = 1
    first[1:] = (b_arr[1:] != b_arr[:-1]).astype(np.int32)
    last[:-1] = first[1:]
    last[-1] = 1
    kpad = _pad_to(max(K, 1), SCHED_BATCH)
    sched = np.zeros((8, kpad), np.int32)
    sched[0, :K] = t_arr
    sched[1, :K] = b_arr
    sched[2, :K] = first
    sched[3, :K] = last
    # row 4: entry k+1's TILE reads may be prefetched before entry k's
    # base write-back (different tiles); the broadcast pass consults it
    safe = np.ones(K, np.int32)
    if K > 1:
        safe[:-1] = (t_arr[1:] != t_arr[:-1]).astype(np.int32)
    sched[4, :K] = safe
    out = (sched, K, nb)
    _SCHED_CACHE[key] = (g, out)
    while len(_SCHED_CACHE) > 8:
        _SCHED_CACHE.pop(next(iter(_SCHED_CACHE)))
    return out


# ---------------------------------------------------------------------------
# 2D kernel
# ---------------------------------------------------------------------------


def _make_kernel_xxl(cgs: int, n_tiles: int, K: int, bw: int, pr: int):
    bs = bw * LANE

    def kernel(meta_ref, eta_ref, od_ref, sched_hbm, planes_hbm, cp0_hbm,
               xy_in, recip_hbm, drift_in, base_in, lo_in,
               xy_hbm, drift_hbm, base_hbm, lo_hbm, upd_hbm,
               acc_sc, out_sc, lo_sc, recip_sc, upd_sc,
               od_smem, sched_smem,
               pw_sc, cw_sc, bw_sc, pwb_sc, cwb_sc, bwb_sc, wb_sc,
               th_sc, tv_sc, zb_sc, sem):
        # xy/drift/base/lo inputs are aliased to the like-named outputs
        # (state persists across grid steps AND dispatches)
        del xy_in, drift_in, base_in, lo_in
        gid = pl.program_id(0)

        dma, dma_group = _dma_helpers(sem)

        @pl.when(jnp.logical_and(gid == 0, meta_ref[0] == 0))
        def _():
            # global first segment: drift = 0, base = cp0 (see
            # pallas_sgd_xl._make_kernel_xl for why this must not re-run
            # on later segments)
            def init_tile(t, _):
                r = t * TR
                dma(cp0_hbm.at[:, pl.ds(r, TR), :], zb_sc, 0)
                dma(zb_sc, base_hbm.at[:, pl.ds(r, TR), :], 1)
                zb_sc[:] = jnp.zeros_like(zb_sc)
                dma(zb_sc, drift_hbm.at[:, pl.ds(r, TR), :], 2)
                return 0

            jax.lax.fori_loop(0, pr // TR, init_tile, 0)

        _stage_group_scalars(od_ref, od_smem, sem.at[12], gid)
        eta_lr = eta_ref[gid]

        _run_chunks_2d(cgs, gid, meta_ref, od_smem, eta_lr,
                       planes_hbm, drift_hbm, base_hbm,
                       pw_sc, cw_sc, bw_sc, pwb_sc, cwb_sc, bwb_sc, wb_sc,
                       sem)

        # ---- consensus merge over (block, tile) schedule entries ----
        # Tile DMAs are double-buffered: entry k+1's (handle, value)
        # reads prefetch into the other slot during entry k's compute.
        # The scatter pass never writes the arrays it reads, so it
        # always prefetches; the broadcast pass writes base tiles, so
        # the host-built schedule row 4 gates prefetch to
        # different-tile successors (same-tile successors issue their
        # reads after the write-back like the serialized kernel).
        iota_bw = jax.lax.broadcasted_iota(jnp.int32, (TR, LANE, bw), 2)
        iota_128 = jax.lax.broadcasted_iota(jnp.int32, (TR, LANE, LANE), 2)

        def onehots(b, h):
            """Block-LOCAL one-hots: endpoints outside block b get a
            local hi index outside [0, bw) and fall out of e_hi — no
            masking needed anywhere downstream."""
            epf = 2 * jax.lax.shift_right_logical(h, 1) + (h & 1)
            loc = epf - b * bs
            hi = jax.lax.shift_right_logical(loc, 7)
            lof = epf & (LANE - 1)
            e_hi = (hi[:, :, None] == iota_bw).astype(jnp.float32)
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

        n_batches = -(-K // SCHED_BATCH)

        def sched_pass(entry_fn, value_hbm, gate_prefetch: bool):
            def copies(j, slot):
                r = sched_smem[0, j] * TR
                return (
                    pltpu.make_async_copy(
                        planes_hbm.at[_HANDLE, pl.ds(r, TR), :],
                        th_sc.at[slot], sem.at[slot * 2 + 0]),
                    pltpu.make_async_copy(
                        value_hbm.at[:, pl.ds(r, TR), :],
                        tv_sc.at[slot], sem.at[slot * 2 + 1]),
                )

            def batch(bi, _):
                dma(sched_hbm.at[:, pl.ds(bi * SCHED_BATCH, SCHED_BATCH)],
                    sched_smem, 13)

                # batch head issues entry 0's reads (always safe: the
                # previous entry's write-back was waited inline)
                @pl.when(bi * SCHED_BATCH < K)
                def _():
                    for cp in copies(0, 0):
                        cp.start()

                def ent(j, _):
                    k = bi * SCHED_BATCH + j

                    @pl.when(k < K)
                    def _():
                        slot = j & 1
                        if gate_prefetch:
                            # a same-tile predecessor could not
                            # prefetch this entry: issue the reads now,
                            # after its write-back completed
                            jp = jnp.maximum(j - 1, 0)
                            was_pref = jnp.logical_or(
                                j == 0, sched_smem[4, jp] != 0
                            )

                            @pl.when(jnp.logical_not(was_pref))
                            def _():
                                for cp in copies(j, slot):
                                    cp.start()

                        for cp in copies(j, slot):
                            cp.wait()

                        jn = jnp.minimum(j + 1, SCHED_BATCH - 1)
                        nxt_ok = jnp.logical_and(
                            j + 1 < SCHED_BATCH, k + 1 < K
                        )
                        if gate_prefetch:
                            nxt_ok = jnp.logical_and(
                                nxt_ok, sched_smem[4, j] != 0
                            )

                        @pl.when(nxt_ok)
                        def _():
                            for cp in copies(jn, (j + 1) & 1):
                                cp.start()

                        entry_fn(
                            sched_smem[0, j], sched_smem[1, j],
                            sched_smem[2, j], sched_smem[3, j],
                            slot,
                        )
                    return 0

                jax.lax.fori_loop(0, SCHED_BATCH, ent, 0)
                return 0

            jax.lax.fori_loop(0, n_batches, batch, 0)

        # pass 1 (scatter): fold per-block drift sums; on each block's
        # last entry, TwoSum the update into the coord/compensation
        # blocks and stage it to the HBM update scratch for pass 2
        def scatter_entry(t, b, first, last, slot):
            @pl.when(first != 0)
            def _():
                acc_sc[:] = jnp.zeros_like(acc_sc)
                # sem 11 is free during the merge passes (the tile
                # prefetch owns 0-3; the chunk phase drained 0-11)
                dma(recip_hbm.at[:, pl.ds(b * bw, bw)], recip_sc, 11)

            e_hi, e_lo_f, e_lo_r = onehots(b, th_sc[slot])

            def piece(p):
                return e_hi * tv_sc[slot, p][:, :, None]

            pf = jnp.concatenate([piece(0), piece(2)], axis=2).reshape(
                TR * LANE, 2 * bw
            )
            pr_ = jnp.concatenate([piece(1), piece(3)], axis=2).reshape(
                TR * LANE, 2 * bw
            )
            acc_sc[:] = (
                acc_sc[:]
                + _dot2(e_lo_f, pf, _DIMS_SCATTER)
                + _dot2(e_lo_r, pr_, _DIMS_SCATTER)
            )
            @pl.when(last != 0)
            def _():
                dma_group(
                    (xy_hbm.at[0, :, pl.ds(b * bw, bw)],
                     out_sc.at[:, 0:bw], 4),
                    (xy_hbm.at[1, :, pl.ds(b * bw, bw)],
                     out_sc.at[:, bw : 2 * bw], 5),
                    (lo_hbm.at[0, :, pl.ds(b * bw, bw)],
                     lo_sc.at[:, 0:bw], 6),
                    (lo_hbm.at[1, :, pl.ds(b * bw, bw)],
                     lo_sc.at[:, bw : 2 * bw], 7),
                )
                recip2 = jnp.concatenate([recip_sc[:], recip_sc[:]], axis=1)
                upd_sc[:] = acc_sc[:] * recip2
                _twosum_update(out_sc, lo_sc, upd_sc[:])
                dma_group(
                    (out_sc.at[:, 0:bw],
                     xy_hbm.at[0, :, pl.ds(b * bw, bw)], 4),
                    (out_sc.at[:, bw : 2 * bw],
                     xy_hbm.at[1, :, pl.ds(b * bw, bw)], 5),
                    (lo_sc.at[:, 0:bw],
                     lo_hbm.at[0, :, pl.ds(b * bw, bw)], 6),
                    (lo_sc.at[:, bw : 2 * bw],
                     lo_hbm.at[1, :, pl.ds(b * bw, bw)], 7),
                    (upd_sc.at[:, 0:bw],
                     upd_hbm.at[0, :, pl.ds(b * bw, bw)], 8),
                    (upd_sc.at[:, bw : 2 * bw],
                     upd_hbm.at[1, :, pl.ds(b * bw, bw)], 9),
                )

        if "noscatter" not in _ABLATE:
            sched_pass(scatter_entry, drift_hbm, gate_prefetch=False)

        # pass 2 (broadcast): apply each block's staged update to the
        # base planes of its scheduled tiles
        def bcast_entry(t, b, first, last, slot):
            @pl.when(first != 0)
            def _():
                dma_group(
                    (upd_hbm.at[0, :, pl.ds(b * bw, bw)],
                     upd_sc.at[:, 0:bw], 8),
                    (upd_hbm.at[1, :, pl.ds(b * bw, bw)],
                     upd_sc.at[:, bw : 2 * bw], 9),
                )

            r = t * TR
            e_hi, e_lo_f, e_lo_r = onehots(b, th_sc[slot])
            upd = upd_sc[:]
            t1f = _dot2(e_lo_f, upd, _DIMS_BCAST)
            t1r = _dot2(e_lo_r, upd, _DIMS_BCAST)
            t1f = t1f.reshape(TR, LANE, 2 * bw)
            t1r = t1r.reshape(TR, LANE, 2 * bw)
            vxf = jnp.sum(t1f[:, :, :bw] * e_hi, axis=2)
            vyf = jnp.sum(t1f[:, :, bw:] * e_hi, axis=2)
            vxr = jnp.sum(t1r[:, :, :bw] * e_hi, axis=2)
            vyr = jnp.sum(t1r[:, :, bw:] * e_hi, axis=2)
            tv_sc[slot] = tv_sc[slot] + jnp.stack([vxf, vxr, vyf, vyr])
            dma(tv_sc.at[slot], base_hbm.at[:, pl.ds(r, TR), :], 14)

        if "nobcast" not in _ABLATE:
            sched_pass(bcast_entry, base_hbm, gate_prefetch=True)

        # pass 3: zero the drift planes (all tiles — every block's
        # contributions are now folded)
        zb_sc[:] = jnp.zeros_like(zb_sc)

        def zero_tile(t, _):
            dma(zb_sc, drift_hbm.at[:, pl.ds(t * TR, TR), :], 10)
            return 0

        jax.lax.fori_loop(0, n_tiles, zero_tile, 0)

    return kernel


@partial(
    jax.jit,
    static_argnames=("groups", "cgs", "n_tiles", "K", "bw", "pr",
                     "interpret"),
)
def _pallas_call_xxl(meta, eta_g, od_all, sched, planes, cp0,
                     xy0, recip, drift0, base0, lo0,
                     groups: int, cgs: int, n_tiles: int, K: int,
                     bw: int, pr: int, interpret: bool = False):
    kernel = _make_kernel_xxl(cgs, n_tiles, K, bw, pr)
    nl = xy0.shape[2]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(groups,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # od (groups, 4, cgs_pad)
            pl.BlockSpec(memory_space=pltpu.ANY),  # sched (4, Kpad)
            pl.BlockSpec(memory_space=pltpu.ANY),  # planes (4, PR, 128)
            pl.BlockSpec(memory_space=pltpu.ANY),  # cp0
            pl.BlockSpec(memory_space=pltpu.ANY),  # xy (2,128,NL) -> out 0
            pl.BlockSpec(memory_space=pltpu.ANY),  # recip (128, NL)
            pl.BlockSpec(memory_space=pltpu.ANY),  # drift -> out 1
            pl.BlockSpec(memory_space=pltpu.ANY),  # base  -> out 2
            pl.BlockSpec(memory_space=pltpu.ANY),  # lo (2,128,NL) -> out 3
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),  # upd scratch (2,128,NL)
        ),
        scratch_shapes=[
            pltpu.VMEM((LANE, 2 * bw), jnp.float32),   # acc
            pltpu.VMEM((LANE, 2 * bw), jnp.float32),   # out block
            pltpu.VMEM((LANE, 2 * bw), jnp.float32),   # lo block
            pltpu.VMEM((LANE, bw), jnp.float32),       # recip block
            pltpu.VMEM((LANE, 2 * bw), jnp.float32),   # upd block
            pltpu.SMEM((4, od_all.shape[2]), jnp.int32),
            pltpu.SMEM((8, SCHED_BATCH), jnp.int32),
            pltpu.VMEM((2, 4, _UW, LANE), jnp.int32),
            pltpu.VMEM((2, 4, _UW, LANE), jnp.float32),
            pltpu.VMEM((2, 4, _UW, LANE), jnp.float32),
            pltpu.VMEM((2, 4, 2 * RC, LANE), jnp.int32),
            pltpu.VMEM((2, 4, 2 * RC, LANE), jnp.float32),
            pltpu.VMEM((2, 4, 2 * RC, LANE), jnp.float32),
            pltpu.VMEM((4, _UW, LANE), jnp.float32),
            pltpu.VMEM((2, TR, LANE), jnp.int32),      # tile handle slots
            pltpu.VMEM((2, 4, TR, LANE), jnp.float32),  # tile value slots
            pltpu.VMEM((4, TR, LANE), jnp.float32),     # init/zero buffer
            pltpu.SemaphoreType.DMA((16,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((2, LANE, nl), jnp.float32),
            jax.ShapeDtypeStruct(drift0.shape, jnp.float32),
            jax.ShapeDtypeStruct(base0.shape, jnp.float32),
            jax.ShapeDtypeStruct((2, LANE, nl), jnp.float32),
            jax.ShapeDtypeStruct((2, LANE, nl), jnp.float32),
        ),
        input_output_aliases={6: 0, 8: 1, 9: 2, 10: 3},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
            has_side_effects=True,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(meta, eta_g, od_all, sched, planes, cp0, xy0, recip,
      drift0, base0, lo0)


def _coords_to_planes(coords: np.ndarray, nl: int) -> np.ndarray:
    c = np.asarray(coords, np.float32)
    return np.stack(
        [x_to_node_array(c[:, 0], nl), x_to_node_array(c[:, 1], nl)]
    )


def _planes_to_coords(p2: np.ndarray, m: int) -> np.ndarray:
    x = np.asarray(p2[0]).T.reshape(-1)[:m]
    y = np.asarray(p2[1]).T.reshape(-1)[:m]
    return np.stack([x, y], axis=1)


def path_sgd_2d_pallas_xxl(g, coords0: np.ndarray, cfg=None,
                           interpret=None) -> np.ndarray:
    """Streaming 2D PG-SGD with block-scheduled merge: no node cap."""
    from .sgd import derive_config_2d

    if cfg is None:
        cfg = derive_config_2d(g)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if not (g.path_step_count > 1).any():
        return np.asarray(coords0, np.float64)
    n_orig = g.num_nodes
    g, order = _relabel_cached(g)
    if order is not None:
        coords0 = (
            np.asarray(coords0, np.float64)
            .reshape(n_orig, 2, 2)[order]
            .reshape(2 * n_orig, 2)
        )
    p = plan_run(g, cfg, one_d=False)
    data = p["data"]
    pr = data.planes.shape[1]
    n_tiles = n_step_tiles(data.num_steps)
    seed = int(cfg.seed) & 0x7FFFFFFF
    cgs = p["cgs"]
    bs = XXL_BS
    sched_np, K, nb = _build_schedule(g, bs, one_d=False)
    nl, bw, _ = _block_geometry(2 * g.num_nodes + 2, bs)

    recip, od_all, sched, eta_g, epf_d, epr_d = _dev_arrays(
        g,
        (id(g), cfg, "xxl2d", RC, bs),
        lambda: (
            jnp.asarray(_recip_ep(g, nl, one_d=False)),
            jnp.asarray(_pack_od_xl(p)),
            jnp.asarray(sched_np),
            jnp.asarray(p["eta_arr"].reshape(p["groups"], cgs)[:, 0]),
            *map(jnp.asarray, _ep_indices(g, pr, one_d=False)),
        ),
    )
    cp0 = _cp0_device_2d(
        jnp.asarray(np.asarray(coords0, np.float32)), epf_d, epr_d,
        pr, 2 * g.num_nodes + 2,
    )
    xy = jnp.asarray(_coords_to_planes(np.asarray(coords0), nl))
    drift = jnp.zeros((4, pr, LANE), jnp.float32)
    base = cp0
    lo = jnp.zeros((2, LANE, nl), jnp.float32)

    for g0, n_g in _segments(p["groups"], cgs):
        meta = jnp.asarray([g0 * cgs, seed], jnp.int32)
        xy, drift, base, lo, _ = _pallas_call_xxl(
            meta, eta_g[g0 : g0 + n_g],
            od_all[g0 : g0 + n_g], sched,
            data.planes, cp0, xy, recip, drift, base, lo,
            n_g, cgs, n_tiles, K, bw, pr, bool(interpret),
        )
    xy_final = np.asarray(xy) + np.asarray(lo)
    res = _planes_to_coords(xy_final, 2 * g.num_nodes).astype(np.float64)
    if order is not None:
        out = np.empty_like(res)
        out.reshape(n_orig, 2, 2)[order] = res.reshape(n_orig, 2, 2)
        res = out
    return res


def xxl_supported(g, cfg) -> bool:
    """Block-merge streaming path: the only cap left is positions in
    i32 (the plane padding covers the union window for any space)."""
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if cfg.delta > 0:
        return False
    if g.num_steps < 1024:
        return False
    max_pos = int(g.step_pos.max(initial=0)) + int(g.node_len.max(initial=0))
    return max_pos < 2**30


# ---------------------------------------------------------------------------
# 1D kernel
# ---------------------------------------------------------------------------


def _make_kernel_xxl_1d(cgs: int, n_tiles: int, K: int, bw: int, pr: int):
    bs = bw * LANE

    def kernel(meta_ref, eta_ref, od_ref, sched_hbm, planes_hbm, cp0_hbm,
               x_in, recip_hbm, drift_in, base_in, lo_in,
               x_hbm, drift_hbm, base_hbm, lo_hbm, upd_hbm,
               acc_sc, out_sc, lo_sc, recip_sc, upd_sc,
               od_smem, sched_smem,
               pw_sc, cw_sc, bw_sc, pwb_sc, cwb_sc, bwb_sc, wb_sc,
               th_sc, tv_sc, zb_sc, sem):
        del x_in, drift_in, base_in, lo_in
        gid = pl.program_id(0)

        dma, dma_group = _dma_helpers(sem)

        @pl.when(jnp.logical_and(gid == 0, meta_ref[0] == 0))
        def _():
            def init_tile(t, _):
                r = t * TR
                dma(cp0_hbm.at[:, pl.ds(r, TR), :], zb_sc, 0)
                dma(zb_sc, base_hbm.at[:, pl.ds(r, TR), :], 1)
                zb_sc[:] = jnp.zeros_like(zb_sc)
                dma(zb_sc, drift_hbm.at[:, pl.ds(r, TR), :], 2)
                return 0

            jax.lax.fori_loop(0, pr // TR, init_tile, 0)

        _stage_group_scalars(od_ref, od_smem, sem.at[12], gid)
        eta_lr = eta_ref[gid]

        _run_chunks_1d(cgs, gid, meta_ref, od_smem, eta_lr,
                       planes_hbm, drift_hbm, base_hbm,
                       pw_sc, cw_sc, bw_sc, pwb_sc, cwb_sc, bwb_sc,
                       wb_sc, sem)

        iota_bw = jax.lax.broadcasted_iota(jnp.int32, (TR, LANE, bw), 2)
        iota_128 = jax.lax.broadcasted_iota(jnp.int32, (TR, LANE, LANE), 2)

        def onehots(b, h):
            nd = jax.lax.shift_right_logical(h, 1)
            loc = nd - b * bs
            hi = jax.lax.shift_right_logical(loc, 7)
            lo_i = nd & (LANE - 1)
            e_hi = (hi[:, :, None] == iota_bw).astype(jnp.float32)
            e_lo = (
                (lo_i[:, :, None] == iota_128)
                .astype(jnp.float32)
                .reshape(TR * LANE, LANE)
                .astype(jnp.bfloat16)
            )
            return e_hi, e_lo

        n_batches = -(-K // SCHED_BATCH)

        def sched_pass(entry_fn, value_hbm, gate_prefetch: bool):
            # double-buffered tile prefetch — see the 2D kernel
            def copies(j, slot):
                r = sched_smem[0, j] * TR
                return (
                    pltpu.make_async_copy(
                        planes_hbm.at[_P1_HANDLE, pl.ds(r, TR), :],
                        th_sc.at[slot], sem.at[slot * 2 + 0]),
                    pltpu.make_async_copy(
                        value_hbm.at[:, pl.ds(r, TR), :],
                        tv_sc.at[slot], sem.at[slot * 2 + 1]),
                )

            def batch(bi, _):
                dma(sched_hbm.at[:, pl.ds(bi * SCHED_BATCH, SCHED_BATCH)],
                    sched_smem, 6)

                @pl.when(bi * SCHED_BATCH < K)
                def _():
                    for cp in copies(0, 0):
                        cp.start()

                def ent(j, _):
                    k = bi * SCHED_BATCH + j

                    @pl.when(k < K)
                    def _():
                        slot = j & 1
                        if gate_prefetch:
                            jp = jnp.maximum(j - 1, 0)
                            was_pref = jnp.logical_or(
                                j == 0, sched_smem[4, jp] != 0
                            )

                            @pl.when(jnp.logical_not(was_pref))
                            def _():
                                for cp in copies(j, slot):
                                    cp.start()

                        for cp in copies(j, slot):
                            cp.wait()

                        jn = jnp.minimum(j + 1, SCHED_BATCH - 1)
                        nxt_ok = jnp.logical_and(
                            j + 1 < SCHED_BATCH, k + 1 < K
                        )
                        if gate_prefetch:
                            nxt_ok = jnp.logical_and(
                                nxt_ok, sched_smem[4, j] != 0
                            )

                        @pl.when(nxt_ok)
                        def _():
                            for cp in copies(jn, (j + 1) & 1):
                                cp.start()

                        entry_fn(
                            sched_smem[0, j], sched_smem[1, j],
                            sched_smem[2, j], sched_smem[3, j],
                            slot,
                        )
                    return 0

                jax.lax.fori_loop(0, SCHED_BATCH, ent, 0)
                return 0

            jax.lax.fori_loop(0, n_batches, batch, 0)

        def scatter_entry(t, b, first, last, slot):
            @pl.when(first != 0)
            def _():
                acc_sc[:] = jnp.zeros_like(acc_sc)
                # sem 11 is free during the merge passes (the tile
                # prefetch owns 0-3; the chunk phase drained 0-11)
                dma(recip_hbm.at[:, pl.ds(b * bw, bw)], recip_sc, 11)

            e_hi, e_lo = onehots(b, th_sc[slot])
            piece = (e_hi * tv_sc[slot, 0][:, :, None]).reshape(
                TR * LANE, bw
            )
            acc_sc[:] = acc_sc[:] + _dot2(e_lo, piece, _DIMS_SCATTER)

            @pl.when(last != 0)
            def _():
                dma_group(
                    (x_hbm.at[:, pl.ds(b * bw, bw)], out_sc, 4),
                    (lo_hbm.at[:, pl.ds(b * bw, bw)], lo_sc, 5),
                )
                upd_sc[:] = acc_sc[:] * recip_sc[:]
                _twosum_update(out_sc, lo_sc, upd_sc[:])
                dma_group(
                    (out_sc, x_hbm.at[:, pl.ds(b * bw, bw)], 4),
                    (lo_sc, lo_hbm.at[:, pl.ds(b * bw, bw)], 5),
                    (upd_sc, upd_hbm.at[:, pl.ds(b * bw, bw)], 8),
                )

        sched_pass(scatter_entry, drift_hbm, gate_prefetch=False)

        def bcast_entry(t, b, first, last, slot):
            @pl.when(first != 0)
            def _():
                dma(upd_hbm.at[:, pl.ds(b * bw, bw)], upd_sc, 8)

            r = t * TR
            e_hi, e_lo = onehots(b, th_sc[slot])
            t1 = _dot2(e_lo, upd_sc[:], _DIMS_BCAST)
            v = jnp.sum(t1.reshape(TR, LANE, bw) * e_hi, axis=2)
            tv_sc[slot] = tv_sc[slot] + v[None]
            dma(tv_sc.at[slot], base_hbm.at[:, pl.ds(r, TR), :], 14)

        sched_pass(bcast_entry, base_hbm, gate_prefetch=True)

        zb_sc[:] = jnp.zeros_like(zb_sc)

        def zero_tile(t, _):
            dma(zb_sc, drift_hbm.at[:, pl.ds(t * TR, TR), :], 10)
            return 0

        jax.lax.fori_loop(0, n_tiles, zero_tile, 0)

    return kernel


@partial(
    jax.jit,
    static_argnames=("groups", "cgs", "n_tiles", "K", "bw", "pr",
                     "interpret"),
)
def _pallas_call_xxl_1d(meta, eta_g, od_all, sched, planes, cp0,
                        x0, recip, drift0, base0, lo0,
                        groups: int, cgs: int, n_tiles: int, K: int,
                        bw: int, pr: int, interpret: bool = False):
    kernel = _make_kernel_xxl_1d(cgs, n_tiles, K, bw, pr)
    nl = x0.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(groups,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 9,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.ANY)] * 5),
        scratch_shapes=[
            pltpu.VMEM((LANE, bw), jnp.float32),   # acc
            pltpu.VMEM((LANE, bw), jnp.float32),   # out block
            pltpu.VMEM((LANE, bw), jnp.float32),   # lo block
            pltpu.VMEM((LANE, bw), jnp.float32),   # recip block
            pltpu.VMEM((LANE, bw), jnp.float32),   # upd block
            pltpu.SMEM((4, od_all.shape[2]), jnp.int32),
            pltpu.SMEM((8, SCHED_BATCH), jnp.int32),
            pltpu.VMEM((2, 3, _UW, LANE), jnp.int32),
            pltpu.VMEM((2, 1, _UW, LANE), jnp.float32),
            pltpu.VMEM((2, 1, _UW, LANE), jnp.float32),
            pltpu.VMEM((2, 3, 2 * RC, LANE), jnp.int32),
            pltpu.VMEM((2, 1, 2 * RC, LANE), jnp.float32),
            pltpu.VMEM((2, 1, 2 * RC, LANE), jnp.float32),
            pltpu.VMEM((1, _UW, LANE), jnp.float32),
            pltpu.VMEM((2, TR, LANE), jnp.int32),       # tile handle slots
            pltpu.VMEM((2, 1, TR, LANE), jnp.float32),  # tile value slots
            pltpu.VMEM((1, TR, LANE), jnp.float32),     # init/zero buffer
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
            jax.ShapeDtypeStruct((LANE, nl), jnp.float32),
        ),
        input_output_aliases={6: 0, 8: 1, 9: 2, 10: 3},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
            has_side_effects=True,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(meta, eta_g, od_all, sched, planes, cp0, x0, recip,
      drift0, base0, lo0)


def path_sgd_1d_pallas_xxl(g, cfg=None, x0=None, interpret=None) -> np.ndarray:
    """Streaming 1D PG-SGD with block-scheduled merge: no node cap."""
    from .sgd import derive_config_1d

    if cfg is None:
        cfg = derive_config_1d(g)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if not (g.path_step_count > 1).any():
        return g.node_offset.astype(np.float64)
    x0v = (
        g.node_offset.astype(np.float32)
        if x0 is None
        else np.asarray(x0, np.float32)
    )
    g, order = _relabel_cached(g)
    if order is not None:
        x0v = x0v[order]
    p = plan_run(g, cfg, one_d=True)
    data = p["data"]
    pr = data.planes.shape[1]
    n_tiles = n_step_tiles(data.num_steps)
    seed = int(cfg.seed) & 0x7FFFFFFF
    cgs = p["cgs"]
    bs = XXL_BS
    sched_np, K, nb = _build_schedule(g, bs, one_d=True)
    nl, bw, _ = _block_geometry(g.num_nodes + 1, bs)

    recip, od_all, sched, eta_g, nd_d = _dev_arrays(
        g,
        (id(g), cfg, "xxl1d", RC, bs),
        lambda: (
            jnp.asarray(_recip_ep(g, nl, one_d=True)),
            jnp.asarray(_pack_od_xl(p)),
            jnp.asarray(sched_np),
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
        xn, drift, base, lo, _ = _pallas_call_xxl_1d(
            meta, eta_g[g0 : g0 + n_g],
            od_all[g0 : g0 + n_g], sched,
            data.planes, cp0, xn, recip, drift, base, lo,
            n_g, cgs, n_tiles, K, bw, pr, bool(interpret),
        )
    xn_final = np.asarray(xn) + np.asarray(lo)
    res = node_array_to_x(xn_final, g.num_nodes).astype(np.float64)
    if order is not None:
        out = np.empty_like(res)
        out[order] = res
        res = out
    return res


def xxl_supported_1d(g, cfg) -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if cfg.delta > 0:
        return False
    if g.num_steps < 1024:
        return False
    max_pos = int(g.step_pos.max(initial=0)) + int(g.node_len.max(initial=0))
    return max_pos < 2**30
