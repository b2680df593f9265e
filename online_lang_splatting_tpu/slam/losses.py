"""Tracking and mapping photometric losses — pure JAX.

Numerics match /root/reference/utils/slam_utils.py:91-165:
tracking = opacity-weighted masked RGB L1 (exposure-compensated) blended
with masked depth L1 at alpha=0.95; mapping = masked RGB/depth L1 blend.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def loss_tracking_rgbd(
    image, depth, opacity, gt_image, gt_depth, grad_mask,
    exposure_a, exposure_b, *, alpha=0.95, rgb_boundary_threshold=0.01,
):
    """All images channel-first; image (3,H,W), depth/opacity (1,H,W)."""
    image_ab = jnp.exp(exposure_a) * image + exposure_b
    rgb_mask = (jnp.sum(gt_image, axis=0) > rgb_boundary_threshold)[None]
    rgb_mask = rgb_mask * grad_mask
    l1_rgb = (opacity * jnp.abs(image_ab * rgb_mask - gt_image * rgb_mask)).mean()
    depth_mask = (gt_depth > 0.01) & (opacity > 0.95)
    l1_depth = jnp.abs(depth * depth_mask - gt_depth * depth_mask).mean()
    return alpha * l1_rgb + (1 - alpha) * l1_depth


def loss_mapping_rgbd(
    image, depth, gt_image, gt_depth, exposure_a, exposure_b,
    *, alpha=0.95, rgb_boundary_threshold=0.01, initialization=False,
):
    image_ab = jnp.where(
        initialization, image, jnp.exp(exposure_a) * image + exposure_b
    )
    rgb_mask = (jnp.sum(gt_image, axis=0) > rgb_boundary_threshold)[None]
    depth_mask = gt_depth > 0.01
    l1_rgb = jnp.abs(image_ab * rgb_mask - gt_image * rgb_mask).mean()
    l1_depth = jnp.abs(depth * depth_mask - gt_depth * depth_mask).mean()
    return alpha * l1_rgb + (1 - alpha) * l1_depth


def isotropic_loss(scaling, active):
    """10x weight applied by callers (slam_backend.py:664-667). Masked mean
    over active Gaussians only (inactive slots are parked at scale 1)."""
    dev = jnp.abs(scaling - scaling.mean(axis=1, keepdims=True))
    w = active.astype(scaling.dtype)[:, None]
    return (dev * w).sum() / jnp.maximum(w.sum() * scaling.shape[1], 1.0)


def median_depth(depth, opacity):
    """Median of rendered depth where opacity > 0.95 and depth > 0
    (slam_utils.py:168-179); masked median via sort-with-inf padding."""
    valid = (depth > 0) & (opacity > 0.95)
    vals = jnp.where(valid, depth, jnp.nan)
    return jnp.nanmedian(vals)
