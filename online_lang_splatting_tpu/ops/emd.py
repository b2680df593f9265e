"""Approximate Earth Mover's Distance (approxmatch) — vectorized JAX.

Re-implementation of the PointNet-style auction matching used by the
reference's 3D semantic eval (/root/reference/tsdf-fusion/PyTorchEMD/
cuda/emd_kernel.cu `approxmatch`/`matchcost`): ten rounds of soft
assignment with temperature schedule level = -4^j for j = 7..-1 and a
final level of 0, maintaining per-point remaining mass (multiplicities
n/m), then cost = Σ match · squared distance. The per-round updates are
(N, M) matrix ops that ride the MXU; the whole thing jits.

Differentiable like the CUDA version: gradients flow through the cost
with the match held fixed (match computed under stop_gradient).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _pairwise_sq(x, y):
    return (
        jnp.sum(x * x, -1)[:, None]
        - 2.0 * x @ y.T
        + jnp.sum(y * y, -1)[None, :]
    )


@jax.jit
def approx_match(xyz1: jax.Array, xyz2: jax.Array) -> jax.Array:
    """xyz1 (N, 3), xyz2 (M, 3) → match (M, N) transport plan."""
    n, m = xyz1.shape[0], xyz2.shape[0]
    d2 = _pairwise_sq(xyz1, xyz2)  # (N, M)
    multi_l = jnp.float32(max(m // n, 1) if m > n else 1)
    multi_r = jnp.float32(max(n // m, 1) if n > m else 1)

    def round_step(carry, level):
        match, remain_l, remain_r = carry
        k = jnp.exp(level * d2)  # (N, M)
        # 1) provisional left ratios
        suml = 1e-9 + k @ remain_r  # (N,)
        ratio_l = remain_l / suml
        # 2) right consumption
        sumr = (k.T @ ratio_l) * remain_r  # (M,)
        consumption = jnp.minimum(remain_r / (sumr + 1e-9), 1.0)
        ratio_r = consumption * remain_r
        remain_r = jnp.maximum(0.0, remain_r - sumr)
        # 3) transported mass
        upd = k * ratio_l[:, None] * ratio_r[None, :]  # (N, M)
        match = match + upd.T
        remain_l = jnp.maximum(0.0, remain_l - jnp.sum(upd, axis=1))
        return (match, remain_l, remain_r), None

    levels = jnp.concatenate(
        [-(4.0 ** jnp.arange(7, -3, -1, dtype=jnp.float32))[:-1],
         jnp.zeros((1,), jnp.float32)]
    )
    init = (
        jnp.zeros((m, n), jnp.float32),
        jnp.full((n,), multi_l),
        jnp.full((m,), multi_r),
    )
    (match, _, _), _ = jax.lax.scan(round_step, init, levels)
    return match


@jax.jit
def match_cost(xyz1: jax.Array, xyz2: jax.Array, match: jax.Array) -> jax.Array:
    """Σ match · squared distance (scalar)."""
    d2 = _pairwise_sq(xyz1, xyz2)  # (N, M)
    return jnp.sum(match.T * d2)


def earth_mover_distance(xyz1: jax.Array, xyz2: jax.Array) -> jax.Array:
    """EMD with gradients through the cost only (matching the CUDA ext's
    autograd contract: match is treated as constant in backward)."""
    match = jax.lax.stop_gradient(approx_match(xyz1, xyz2))
    return match_cost(xyz1, xyz2, match)
