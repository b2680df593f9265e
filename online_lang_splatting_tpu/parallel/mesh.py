"""Multi-chip execution: device meshes and SPMD training steps.

The reference's entire distributed surface is torch.multiprocessing on one
GPU plus Lightning DDP for autoencoder training (SURVEY §2.11). The
TPU-native equivalents here ride ICI collectives under shard_map:

* `dp_ae_train_step` — data-parallel autoencoder training: batch sharded
  over the `dp` axis, parameters replicated, gradients psum-reduced.
  (Replaces Lightning `devices=[0,1]` DDP.)
* `dp_mapping_grads` — data-parallel SLAM mapping: keyframe slots sharded
  over devices, each chip renders + differentiates its local keyframes
  with the Pallas rasterizer, per-Gaussian gradients psum into a
  replicated map update. This is the multi-chip widening of the
  backend's lax.scan accumulation (same math, sum over slots).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), (axis,))


# ---------------------------------------------------------------------------
# Data-parallel autoencoder training


def dp_ae_train_step(model, optimizer, mesh: Mesh):
    """Returns jitted (params, opt_state, batch) -> (params, opt_state, loss)
    with the batch sharded over the dp axis and grads all-reduced."""
    from ..models.autoencoder import online_loss

    def local_step(params, opt_state, x):
        def loss_fn(p):
            return online_loss(model.apply({"params": p}, x), x)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.lax.pmean(grads, "dp")
        loss = jax.lax.pmean(loss, "dp")
        upd, opt_state = optimizer.update(grads, opt_state, params)
        import optax

        return optax.apply_updates(params, upd), opt_state, loss

    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P("dp")),
        out_specs=(P(), P(), P()),
        check_rep=False,
    )
    return jax.jit(sharded)


# ---------------------------------------------------------------------------
# Data-parallel mapping (keyframe-sharded SLAM optimization)


def dp_mapping_grads(settings, mesh: Mesh):
    """Returns jitted fn computing summed Gaussian-parameter gradients over
    keyframe slots sharded across the dp axis.

    Inputs: params (replicated GaussianParams), active (cap,), proj (4,4),
    slot tensors leading-sharded: r (S,3,3), t (S,3), images (S,3,H,W),
    depths (S,1,H,W), valid (S,). S must be divisible by mesh size.
    Output: (grads replicated, loss scalar).
    """
    from ..models import gaussians as G
    from ..ops import lie
    from ..slam import losses as L
    from ..slam.renderer import activate, render

    def kf_loss(params, active, proj, r, t, image, depth, valid):
        inputs = activate(params, active)
        out = render(inputs, lie.rt_to_mat4(r, t), proj, settings)
        loss = L.loss_mapping_rgbd(
            out.color, out.depth, image, depth,
            jnp.float32(0.0), jnp.float32(0.0), initialization=True,
        )
        return loss * valid

    def local(params, active, proj, r, t, images, depths, valid):
        def body(carry, slot):
            g_acc, l_acc = carry
            (r_k, t_k, im, de, v) = slot
            loss, g = jax.value_and_grad(kf_loss)(
                params, active, proj, r_k, t_k, im, de, v
            )
            return (jax.tree.map(jnp.add, g_acc, g), l_acc + loss), None

        zero = jax.tree.map(jnp.zeros_like, params)
        (g, l), _ = jax.lax.scan(
            body, (zero, 0.0), (r, t, images, depths, valid)
        )
        return jax.lax.psum(g, "dp"), jax.lax.psum(l, "dp")

    sharded = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(), P("dp"), P("dp"), P("dp"), P("dp"), P("dp")),
        out_specs=(P(), P()),
        check_rep=False,
    )
    return jax.jit(sharded)
