"""Zipf jump sampling for PG-SGD: zeta tables + closed-form inverse CDF.

The reference precomputes zeta(n, theta) partial sums exactly for spaces
1..space_max and quantized every `space_quantization_step` beyond
(reference: src/algorithms/path_sgd.cpp:124-138, src/cuda/layout.cu:412-428),
then samples by the dirtyzipf closed-form inversion, which the CUDA kernel
implements directly (reference: src/cuda/layout.cu:89-113).  We keep that
exact scheme: tiny replicated zeta table, branchless vectorized inversion.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def zeta_table(space: int, space_max: int, quant_step: int, theta: float) -> np.ndarray:
    """Quantized zeta partial-sum table, layout identical to the reference
    (reference: path_sgd.cpp:128-138): index i (1..space_max) holds
    zeta(i); index space_max+1+k holds zeta(space_max + k*quant_step).

    Computed in f64 on host with chunked cumsum (the reference's
    fast_precise_pow loop, vectorized).
    """
    n_entries = (
        space
        if space <= space_max
        else space_max + (space - space_max) // quant_step + 1
    ) + 1
    zetas = np.zeros(n_entries, dtype=np.float64)
    running = 0.0
    chunk = 1 << 22
    for lo in range(1, space + 1, chunk):
        hi = min(space + 1, lo + chunk)
        i = np.arange(lo, hi, dtype=np.float64)
        z = running + np.cumsum(np.power(1.0 / i, theta))
        running = z[-1]
        # exact region
        lo_exact = lo
        hi_exact = min(hi, space_max + 1)
        if lo_exact < hi_exact:
            zetas[lo_exact:hi_exact] = z[: hi_exact - lo_exact]
        # quantized region: i >= space_max and (i - space_max) % step == 0.
        # Only exists when space > space_max (the reference writes one slot
        # out of bounds when space == space_max — path_sgd.cpp:128-137 —
        # which we do not reproduce).
        if space > space_max:
            idx = np.arange(lo, hi)
            q = (idx >= space_max) & ((idx - space_max) % quant_step == 0)
            q &= space_max + 1 + (idx - space_max) // quant_step < len(zetas)
            if q.any():
                zetas[space_max + 1 + (idx[q] - space_max) // quant_step] = z[q]
    return zetas


def zeta_eta_table(
    space: int, space_max: int, quant_step: int, theta: float
) -> np.ndarray:
    """(T, 2) f32 table of [zeta(s_i), eta(s_i)] per zeta-table entry.

    eta(n) = (1 - (2/n)^(1-theta)) / (1 - zeta(2)/zeta(n)) is the
    per-space constant of the dirtyzipf inversion; the CUDA kernel
    recomputes it per draw with two powf calls (reference:
    src/cuda/layout.cu:95-104).  TPU transcendentals are the SGD
    bottleneck, so we precompute eta per table entry instead — for spaces
    beyond space_max this quantizes eta exactly like the reference already
    quantizes zeta (same error class, measured stress-neutral on DRB1).
    """
    zetas = zeta_table(space, space_max, quant_step, theta)
    n_entries = len(zetas)
    s = np.arange(n_entries, dtype=np.float64)
    if space > space_max:
        q = s > space_max
        s[q] = space_max + (s[q] - space_max - 1) * quant_step
    s = np.maximum(s, 1.0)
    zeta2 = zetas[2] if n_entries > 2 else 1.0
    denom = 1.0 - np.divide(zeta2, zetas, out=np.ones_like(zetas), where=zetas != 0)
    denom = np.where(denom == 0.0, 1e-9, denom)
    eta = (1.0 - np.power(2.0 / s, 1.0 - theta)) / denom
    return np.stack([zetas, eta], axis=1).astype(np.float32)


def zeta_index(jump_space, space_max: int, quant_step: int):
    """Map a jump space to its zeta-table index (reference:
    path_sgd.cpp:249-253): exact below space_max, quantized above.

    The divide runs as float multiply (no integer div on TPU); exact while
    jump_space - space_max < 2^24, i.e. for any path under ~16M steps
    beyond which the quantization bucket would be off by at most one.
    """
    quantized = space_max + 1 + jnp.floor(
        (jump_space - space_max).astype(jnp.float32) * jnp.float32(1.0 / quant_step)
    ).astype(jnp.int32)
    return jnp.where(jump_space > space_max, quantized, jump_space)


def zipf_sample(u, n, theta: float, zeta2, zetan, eta=None):
    """Vectorized closed-form Zipf(n, theta) sampler on (0,1] uniforms,
    the cuda_rnd_zipf inversion (reference: src/cuda/layout.cu:89-113).

    Returns integers in [1, n]; callers guarantee n >= 1.  Pass `eta`
    (precomputed per space by zeta_eta_table) to skip the per-lane
    pow(2/n, 1-theta); the remaining pow runs as exp2(alpha*log2(x)) —
    one transcendental pair per lane instead of four.
    """
    n = n.astype(jnp.float32)
    alpha = 1.0 / (1.0 - theta)
    if eta is None:
        denominator = 1.0 - zeta2 / zetan
        denominator = jnp.where(denominator == 0.0, 1e-9, denominator)
        eta = (1.0 - jnp.power(2.0 / n, 1.0 - theta)) / denominator
    x = eta * u - eta + 1.0
    powx = jnp.exp2(jnp.float32(alpha) * jnp.log2(x))
    uz = u * zetan
    val = jnp.where(
        uz < 1.0,
        1.0,
        jnp.where(uz < 1.0 + jnp.power(0.5, theta), 2.0, 1.0 + n * powx),
    )
    val = jnp.floor(val).astype(jnp.int32)
    return jnp.clip(val, 1, n.astype(jnp.int32))
