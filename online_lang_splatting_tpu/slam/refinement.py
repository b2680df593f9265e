"""Final color refinement: L1 + SSIM over random keyframes.

Reference `color_refinement` (/root/reference/utils/slam_backend.py:769-819):
26000 iterations of (1-λ)·L1 + λ·(1-SSIM) on one random keyframe each,
Adam on Gaussian parameters only (no pose updates), λ_dssim = 0.2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models import gaussians as G
from ..ops import lie, losses
from .renderer import activate, render


@functools.partial(jax.jit, static_argnames=("settings",))
def refine_step(params, opt, aux, proj, r, t, image, lrs, lambda_dssim,
                *, settings):
    def loss_fn(p):
        inputs = activate(p, aux.active)
        out = render(inputs, lie.rt_to_mat4(r, t), proj, settings)
        l1 = jnp.abs(out.color - image).mean()
        ssim_v = losses.ssim(out.color, image)
        return (1.0 - lambda_dssim) * l1 + lambda_dssim * (1.0 - ssim_v)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    params, opt = G.adam_step(params, grads, opt, lrs, aux.active)
    return params, opt, loss


def color_refine(params, aux, viewpoints, proj, settings, *, iterations,
                 lambda_dssim=0.2, lrs=None, log_every=2000):
    opt = G.init_adam(params)
    if lrs is None:
        f = jnp.float32
        lrs = G.LearningRates(
            xyz=f(0.0000016), features_dc=f(0.0025), features_rest=f(0.000125),
            scaling=f(0.001), rotation=f(0.001), opacity=f(0.05),
            language=f(0.0025),
        )
    keys = list(viewpoints.keys())
    rng = np.random.default_rng(0)
    for it in range(iterations):
        cam = viewpoints[keys[int(rng.integers(len(keys)))]]
        params, opt, loss = refine_step(
            params, opt, aux, proj,
            jnp.asarray(cam.r), jnp.asarray(cam.t), cam.image,
            lrs, jnp.float32(lambda_dssim), settings=settings,
        )
    return params, opt
