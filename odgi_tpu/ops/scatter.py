"""MXU-friendly gather / scatter-mean via factored one-hot matmuls.

XLA's native scatter on TPU serializes random-index updates onto the scalar
core (~µs per element) — the PG-SGD hot loop spends >95% of its time there.
The TPU-native alternative: express gather and scatter as matmuls against
one-hot matrices so they run on the systolic array.  A full one-hot would
cost B×M compares to build; we factor the index as

    idx = hi * 128 + lo,   E_hi: (B, M/128),  E_lo: (B, 128)

so gather(C)[b] = Σ_{h,l} E_hi[b,h] · E_lo[b,l] · C[h,l]  — one (B,H)@(H,·)
matmul plus a 128-wide lane contraction, and scatter-add is its transpose:
acc.reshape(H,128) = E_hi^T @ (E_lo ⊙ values).  Compare cost drops from
B×M to B×(M/128 + 128); the MACs are trivial for the MXU.

This replaces the role of the CUDA kernel's atomicExch update loop
(reference: src/cuda/layout.cu:141-188) with dense systolic work.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

LANE = 128

# TPU f32 matmuls default to bf16 passes (8-bit mantissa) — silently
# truncating gathered table values (positions up to 2^24, coordinates).
# Every dot/einsum here must run at full f32 precision; this was measured
# to be the difference between DRB1 layout stress 5.50 and 1.23.
_HI = jax.lax.Precision.HIGHEST


def _pad_rows(m: int) -> int:
    return -(-m // LANE) * LANE


def _onehot_factors(idx, num_hi):
    """E_hi (B, num_hi) and E_lo (B, 128) one-hot factor matrices, f32."""
    hi = idx // LANE
    lo = idx % LANE
    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (1, num_hi), 1)
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    e_hi = (hi[:, None] == iota_hi).astype(jnp.float32)
    e_lo = (lo[:, None] == iota_lo).astype(jnp.float32)
    return e_hi, e_lo


def factored_gather(table, idx):
    """table: (M, C) f32, idx: (B,) i32 -> (B, C) rows, via MXU matmuls.

    Two contraction orders with identical results but different
    intermediate sizes (the HBM traffic of that intermediate dominates):
    when H = M/128 < 128 the (B, H, C) grouping is smaller than the
    (B, 128, C) one, so pick per-table."""
    M, C = table.shape
    Mp = _pad_rows(M)
    H = Mp // LANE
    if Mp != M:
        table = jnp.pad(table, ((0, Mp - M), (0, 0)))
    e_hi, e_lo = _onehot_factors(idx, H)
    t3 = table.reshape(H, LANE, C)
    if H < LANE:
        # (B, LANE) @ (LANE, H*C) -> (B, H, C); reduce over h
        w = jnp.dot(
            e_lo,
            jnp.transpose(t3, (1, 0, 2)).reshape(LANE, H * C),
            preferred_element_type=jnp.float32,
            precision=_HI,
        ).reshape(-1, H, C)
        return jnp.einsum("bh,bhc->bc", e_hi, w, precision=_HI)
    # (B, H) @ (H, LANE*C) -> (B, LANE, C); reduce over l
    t = jnp.dot(
        e_hi,
        t3.reshape(H, LANE * C),
        preferred_element_type=jnp.float32,
        precision=_HI,
    ).reshape(-1, LANE, C)
    return jnp.einsum("bl,blc->bc", e_lo, t, precision=_HI)


def factored_scatter_add(shape_m, idx, values):
    """Dense scatter-add: returns (M, C) accumulator with values (B, C)
    summed at rows idx.  Conflicts sum exactly (f32 accumulate).  Same
    adaptive grouping as factored_gather."""
    B, C = values.shape
    Mp = _pad_rows(shape_m)
    H = Mp // LANE
    e_hi, e_lo = _onehot_factors(idx, H)
    if H < LANE:
        # (B, H, C) intermediate, then (LANE, B) @ (B, H*C)
        t = e_hi[:, :, None] * values[:, None, :]
        acc = jnp.dot(
            e_lo.T,
            t.reshape(B, H * C),
            preferred_element_type=jnp.float32,
            precision=_HI,
        ).reshape(LANE, H, C)
        return jnp.transpose(acc, (1, 0, 2)).reshape(Mp, C)[:shape_m]
    # (B, LANE, C): spread each value across its lane slot
    spread = e_lo[:, :, None] * values[:, None, :]
    acc = jnp.dot(
        e_hi.T,
        spread.reshape(B, LANE * C),
        preferred_element_type=jnp.float32,
        precision=_HI,
    )
    return acc.reshape(Mp, C)[:shape_m]


def scatter_mean_apply(table, idx_list, upd_list, valid):
    """Apply the PG-SGD batch merge: table += mean of updates per row.

    idx_list/upd_list are matching lists (e.g. [ep_a, ep_b] with
    [-upd, +upd]); `valid` masks lanes.  Counts and sums ride one fused
    scatter by appending a count column.
    """
    M, C = table.shape
    v = valid.astype(jnp.float32)
    acc = jnp.zeros((M, C + 1), jnp.float32)
    for idx, upd in zip(idx_list, upd_list):
        cols = jnp.concatenate([upd, v[:, None]], axis=1)
        acc = acc + factored_scatter_add(M, idx, cols)
    cnt = acc[:, C]
    return table + acc[:, :C] / jnp.maximum(cnt, 1.0)[:, None]
