"""Final color refinement: L1 + SSIM over random keyframes.

Reference `color_refinement` (/root/reference/utils/slam_backend.py:769-819):
26000 iterations of (1-λ)·L1 + λ·(1-SSIM) on one random keyframe each,
Adam on Gaussian parameters only (no pose updates), λ_dssim = 0.2.

TPU-native structure: the iteration loop runs DEVICE-RESIDENT — keyframe
images and poses are staged once (or gathered from the backend's
FrameStack), the random keyframe schedule is precomputed, and a lax.scan
runs CHUNK iterations per dispatch. Through the remote-tunnel link one
dispatch per iteration would cost 26000 × ~100 ms of round trips; chunking
cuts dispatches ≥50×.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models import gaussians as G
from ..ops import lie, losses
from .renderer import activate, render

CHUNK = 256


@functools.lru_cache(maxsize=None)
def make_refine_chunk(settings, n_iters: int):
    """Jitted scan of n_iters refine steps; each gathers one keyframe
    (image + pose) from the staged stacks by row index."""

    def chunk(params, opt, active, proj, stack_imgs, stack_r, stack_t,
              rows, lrs, lambda_dssim):
        def body(carry, row):
            params, opt = carry
            image = jnp.take(stack_imgs, row, axis=0)
            r = jnp.take(stack_r, row, axis=0)
            t = jnp.take(stack_t, row, axis=0)

            def loss_fn(p):
                inputs = activate(p, active)
                out = render(inputs, lie.rt_to_mat4(r, t), proj, settings)
                l1 = jnp.abs(out.color - image).mean()
                ssim_v = losses.ssim(out.color, image)
                return (1.0 - lambda_dssim) * l1 + lambda_dssim * (1.0 - ssim_v)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            params, opt = G.adam_step(params, grads, opt, lrs, active)
            return (params, opt), loss

        (params, opt), losses_out = jax.lax.scan(body, (params, opt), rows)
        return params, opt, losses_out

    return jax.jit(chunk)


def default_refine_lrs():
    f = jnp.float32
    return G.LearningRates(
        xyz=f(0.0000016), features_dc=f(0.0025), features_rest=f(0.000125),
        scaling=f(0.001), rotation=f(0.001), opacity=f(0.05),
        language=f(0.0025),
    )


def color_refine(params, aux, viewpoints, proj, settings, *, iterations,
                 lambda_dssim=0.2, lrs=None, frame_stack=None,
                 log_every=2000):
    """Run the reference's 26k-iteration refinement with chunked dispatch.

    `frame_stack` (backend FrameStack) provides device-resident images; if
    absent, images/poses are staged here once. Poses are read once at entry
    (refinement never updates them, slam_backend.py:790)."""
    opt = G.init_adam(params)
    if lrs is None:
        lrs = default_refine_lrs()
    keys = list(viewpoints.keys())
    cams = [viewpoints[k] for k in keys]
    if frame_stack is not None:
        row_for = [frame_stack.row_of[k] for k in keys]
        stack_imgs = frame_stack.images
    else:
        row_for = list(range(len(keys)))
        stack_imgs = jnp.stack([c.image for c in cams])
    # Pose stack rows must line up with image rows.
    n_rows = stack_imgs.shape[0]
    stack_r = np.tile(np.eye(3, dtype=np.float32), (n_rows, 1, 1))
    stack_t = np.zeros((n_rows, 3), np.float32)
    for k, cam in zip(row_for, cams):
        stack_r[k] = cam.r
        stack_t[k] = cam.t
    stack_r = jnp.asarray(stack_r)
    stack_t = jnp.asarray(stack_t)

    # The reference's schedule: one uniformly-random viewpoint/iteration.
    rng = np.random.default_rng(0)
    draw = rng.integers(len(keys), size=iterations)
    rows = np.asarray(row_for, np.int32)[draw]

    done = 0
    while done < iterations:
        n = min(CHUNK, iterations - done)
        fn = make_refine_chunk(settings, n)
        params, opt, _losses = fn(
            params, opt, aux.active, proj, stack_imgs, stack_r, stack_t,
            jnp.asarray(rows[done:done + n]), lrs,
            jnp.float32(lambda_dssim),
        )
        done += n
    return params, opt
