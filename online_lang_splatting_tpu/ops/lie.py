"""SO(3)/SE(3) exponential maps and pose retraction, in pure JAX.

Semantics match the reference SLAM's Lie helpers
(/root/reference/utils/pose_utils.py:12-93): left-multiplicative SE(3)
updates `T_new = Exp(tau) @ T_w2c` with tau = [rho(3), theta(3)], and the
small-angle Taylor branches below 1e-5. Everything here is differentiable,
so camera-pose gradients (the reference's hand-derived `dL_dtau`,
/root/reference/submodules/diff-gaussian-rasterization/cuda_rasterizer/
backward.cu:273-343) come from autodiff through these maps instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def skew(v: jax.Array) -> jax.Array:
    """Skew-symmetric matrix [v]_x such that [v]_x @ u = v × u. v: (..., 3)."""
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], z, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], z], axis=-1),
        ],
        axis=-2,
    )


def _sincs(theta: jax.Array):
    """Stable coefficients (sin a / a, (1-cos a)/a^2, (a-sin a)/a^3) of the
    rotation angle a = ||theta||.

    Uses Taylor expansions near zero so values AND gradients are finite at
    the identity (the raw norm has a NaN gradient at 0, so everything in the
    Taylor branch is expressed via the squared norm). The switch is at
    a < 1e-3 (wider than the reference's 1e-5) because in float32 the
    closed forms cancel catastrophically below that (1-cos(1e-5) == 0 in
    f32) while the two-term Taylor error there is ~1e-13 — strictly more
    accurate than the reference on the same inputs.
    """
    sq = jnp.sum(theta * theta)
    small = sq < 1e-6  # angle < 1e-3
    # Guard the denominator; the guarded branch is discarded by `where`,
    # and sqrt's gradient never sees zero.
    a2 = jnp.where(small, jnp.ones_like(sq), sq)
    a = jnp.sqrt(a2)
    sin_a, cos_a = jnp.sin(a), jnp.cos(a)
    c1 = jnp.where(small, 1.0 - sq / 6.0, sin_a / a)
    c2 = jnp.where(small, 0.5 - sq / 24.0, (1.0 - cos_a) / a2)
    c3 = jnp.where(small, 1.0 / 6.0 - sq / 120.0, (a - sin_a) / (a2 * a))
    return c1, c2, c3


def so3_exp(theta: jax.Array) -> jax.Array:
    """Rodrigues' formula: theta (3,) -> R (3, 3)."""
    w = skew(theta)
    w2 = w @ w
    c1, c2, _ = _sincs(theta)
    return jnp.eye(3, dtype=theta.dtype) + c1 * w + c2 * w2


def so3_left_jacobian(theta: jax.Array) -> jax.Array:
    """V(theta): the SO(3) left Jacobian used to map rho -> translation."""
    w = skew(theta)
    w2 = w @ w
    _, c2, c3 = _sincs(theta)
    return jnp.eye(3, dtype=theta.dtype) + c2 * w + c3 * w2


def se3_exp(tau: jax.Array) -> jax.Array:
    """tau = [rho(3), theta(3)] -> homogeneous (4, 4) transform."""
    rho, theta = tau[:3], tau[3:]
    r = so3_exp(theta)
    t = so3_left_jacobian(theta) @ rho
    top = jnp.concatenate([r, t[:, None]], axis=1)
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=tau.dtype)
    return jnp.concatenate([top, bottom], axis=0)


def update_pose(
    r: jax.Array, t: jax.Array, trans_delta: jax.Array, rot_delta: jax.Array,
    converged_threshold: float = 1e-4,
):
    """Left-multiplicative pose retraction.

    Mirrors the reference `update_pose` (/root/reference/utils/pose_utils.py:76-93):
    builds T_w2c from (R, T), left-multiplies by Exp([trans, rot]), and
    reports convergence when ||tau|| < threshold.

    Returns (new_R, new_T, converged: bool array).
    """
    tau = jnp.concatenate([trans_delta, rot_delta], axis=0)
    t_w2c = jnp.eye(4, dtype=tau.dtype).at[:3, :3].set(r).at[:3, 3].set(t)
    new_w2c = se3_exp(tau) @ t_w2c
    converged = jnp.linalg.norm(tau) < converged_threshold
    return new_w2c[:3, :3], new_w2c[:3, 3], converged


def rt_to_mat4(r: jax.Array, t: jax.Array) -> jax.Array:
    """(R, t) -> homogeneous 4x4."""
    return jnp.eye(4, dtype=r.dtype).at[:3, :3].set(r).at[:3, 3].set(t)
