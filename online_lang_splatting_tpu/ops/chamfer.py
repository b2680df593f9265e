"""Chamfer distance between point clouds — blocked JAX.

Equivalent of the sklearn-NN Chamfer used by the reference 3D eval
(/root/reference/tsdf-fusion/3d_evaluation_and_visualize_langslam_dim15.py:
235-274): symmetric mean nearest-neighbor distance. Blocked pairwise
distances ride the MXU; handles clouds of unequal size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("block",))
def nn_dist(x: jax.Array, y: jax.Array, block: int = 2048) -> jax.Array:
    """For each point in x (N, 3): distance to nearest point in y (M, 3)."""
    n = x.shape[0]
    pad = (-n) % block
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    ysq = jnp.sum(y * y, axis=-1)

    def body(i, out):
        q = jax.lax.dynamic_slice_in_dim(xp, i * block, block)
        d2 = (
            jnp.sum(q * q, -1)[:, None] - 2.0 * q @ y.T + ysq[None, :]
        )
        md = jnp.sqrt(jnp.maximum(jnp.min(d2, axis=1), 0.0))
        return jax.lax.dynamic_update_slice_in_dim(out, md, i * block, 0)

    out = jax.lax.fori_loop(
        0, xp.shape[0] // block, body, jnp.zeros((xp.shape[0],), x.dtype)
    )
    return out[:n]


def chamfer_distance(x, y, block: int = 2048):
    """Symmetric Chamfer: mean NN distance both ways, plus each direction."""
    d_xy = nn_dist(x, y, block=block)
    d_yx = nn_dist(y, x, block=block)
    completeness = float(jnp.mean(d_xy))
    accuracy = float(jnp.mean(d_yx))
    return {
        "chamfer": 0.5 * (completeness + accuracy),
        "x_to_y": completeness,
        "y_to_x": accuracy,
    }
