"""Multi-chip execution: device meshes and SPMD training steps.

The reference's entire distributed surface is torch.multiprocessing on one
GPU plus Lightning DDP for autoencoder training (SURVEY §2.11). The
TPU-native equivalents here ride ICI collectives under shard_map:

* `dp_ae_train_step` — data-parallel autoencoder training: batch sharded
  over the `dp` axis, parameters replicated, gradients psum-reduced.
  (Replaces Lightning `devices=[0,1]` DDP.)
* `dp_mapping_iteration` — data-parallel SLAM mapping: keyframe slots
  sharded over devices, each chip renders + differentiates its local
  keyframes with the Pallas rasterizer, per-Gaussian gradients psum into
  a replicated map update. This is the FULL backend mapping iteration
  (same math as slam.backend.mapping_iteration, shared core), selected in
  BackEnd by passing a mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P


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


def sharded_slot_grads(settings, mesh: Mesh, init_mode: bool):
    """shard_map-wrapped `scan_slot_grads`: keyframe slots sharded over the
    dp axis; per-Gaussian gradients + additive stats psum over ICI, max
    radii pmax, per-slot outputs stay sharded. The shared multi-chip core
    of dp_mapping_iteration and the dp mapping chunk."""
    from ..slam.backend import scan_slot_grads

    def local(params, active, proj, r, t, ea, eb, imgs, deps, lngs,
              l_on, valid_f, lang_weight):
        grads, loss, per_slot, stats = scan_slot_grads(
            params, active, proj, r, t, ea, eb, imgs, deps, lngs,
            l_on, valid_f, lang_weight,
            settings=settings, init_mode=init_mode,
        )
        grads = jax.lax.psum(grads, "dp")
        loss = jax.lax.psum(loss, "dp")
        max_radii, grad_accum, denom = stats
        stats = (
            jax.lax.pmax(max_radii, "dp"),
            jax.lax.psum(grad_accum, "dp"),
            jax.lax.psum(denom, "dp"),
        )
        return grads, loss, per_slot, stats

    return shard_map(
        local, mesh=mesh,
        in_specs=(
            P(), P(), P(), P("dp"), P("dp"), P("dp"), P("dp"),
            P("dp"), P("dp"), P("dp"), P("dp"), P("dp"), P(),
        ),
        out_specs=(
            P(), P(),
            (P("dp"), P("dp"), P("dp"), P("dp"), P("dp"), P("dp"),
             P("dp")),
            (P(), P(), P()),
        ),
        check_rep=False,
    )


@functools.lru_cache(maxsize=None)
def dp_mapping_iteration(settings, mesh: Mesh, n_slots: int, init_mode: bool):
    """The FULL mapping iteration (identical math to
    `slam.backend.mapping_iteration` — photometric + depth + language L1,
    isotropic regularizer, Gaussian Adam, per-keyframe pose/exposure Adam
    with SE(3) retraction, densification stats, occ visibility) with the
    keyframe slots sharded over the mesh's `dp` axis.

    Each chip renders + differentiates its local slots with the Pallas
    rasterizer (`scan_slot_grads`); per-Gaussian gradients and additive
    stats ride ICI psum, max radii pmax; per-slot pose gradients stay
    sharded and the replicated update tail (`apply_mapping_updates`) runs
    under GSPMD. Same signature and return tuple as `mapping_iteration`;
    `n_slots` must be divisible by the mesh size (callers pad with invalid
    slots).

    Replaces the reference's single-GPU torch.multiprocessing backend
    (/root/reference/utils/slam_backend.py:454-767) with multi-chip SPMD.
    """
    from ..slam.backend import apply_mapping_updates

    assert n_slots % mesh.size == 0, (n_slots, mesh.size)
    sharded = sharded_slot_grads(settings, mesh, init_mode)

    def fn(params, opt, aux, proj,
           slot_r, slot_t, slot_ea, slot_eb,
           pose_m, pose_v, pose_t,
           images, depths, langs,
           slot_valid, lang_on, pose_opt, exp_opt,
           lrs, lang_weight):
        grads, loss, per_slot, stats = sharded(
            params, aux.active, proj,
            slot_r, slot_t, slot_ea, slot_eb,
            images, depths, langs, lang_on,
            slot_valid.astype(jnp.float32), lang_weight,
        )
        (params, opt, aux, new_r, new_t, new_ea, new_eb, pose_state,
         occ_vis, ovf, demand) = apply_mapping_updates(
            params, opt, aux, grads, stats, per_slot,
            slot_r, slot_t, slot_ea, slot_eb,
            pose_m, pose_v, pose_t, pose_opt, exp_opt, lrs,
        )
        return (
            params, opt, aux, new_r, new_t, new_ea, new_eb,
            pose_state, occ_vis, loss, ovf, demand,
        )

    return jax.jit(fn)
