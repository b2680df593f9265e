"""Volumetric TSDF fusion with multi-channel features — pure JAX.

TPU-native replacement for the reference's PyCUDA/numba TSDF volumes
(/root/reference/tsdf-fusion/fusion.py:19-340 — RGB; fusion3.py — the
15-channel language variant; fusion2.py — 3-channel). One jitted
`integrate` handles any channel count: the voxel grid is projected into
the frame, depth-tested with the classic truncated SDF update, and the
feature channels are running-weighted means — all dense vectorized ops,
no per-voxel loops.

Mesh extraction via marching cubes is deliberately replaced by the
point-cloud surface export (`get_point_cloud`) that the 3D semantic
evaluation consumes (3d_evaluation_*_dim15.py uses semantic_pc.ply).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("obs_weight",))
def _integrate(
    tsdf, weights, features,
    vox_coords_world,          # (N, 3) flattened voxel centers
    depth_im, feat_im,         # (H, W), (C, H, W)
    intr,                      # (fx, fy, cx, cy)
    w2c,                       # (4, 4)
    trunc_margin,
    obs_weight: float = 1.0,
):
    fx, fy, cx, cy = intr
    h, w = depth_im.shape
    cam = vox_coords_world @ w2c[:3, :3].T + w2c[:3, 3]
    z = cam[:, 2]
    u = jnp.round(cam[:, 0] / z * fx + cx).astype(jnp.int32)
    v = jnp.round(cam[:, 1] / z * fy + cy).astype(jnp.int32)
    inside = (z > 0) & (u >= 0) & (u < w) & (v >= 0) & (v < h)
    uc = jnp.clip(u, 0, w - 1)
    vc = jnp.clip(v, 0, h - 1)
    depth_val = depth_im[vc, uc]
    sdf = depth_val - z
    valid = inside & (depth_val > 0) & (sdf >= -trunc_margin)
    dist = jnp.minimum(1.0, sdf / trunc_margin)
    w_old = weights
    w_new = jnp.where(valid, w_old + obs_weight, w_old)
    w_safe = jnp.maximum(w_new, 1e-8)
    tsdf_new = jnp.where(
        valid, (tsdf * w_old + obs_weight * dist) / w_safe, tsdf
    )
    feat_val = feat_im[:, vc, uc]  # (C, N)
    feats_new = jnp.where(
        valid[None, :],
        (features * w_old[None, :] + obs_weight * feat_val) / w_safe[None, :],
        features,
    )
    return tsdf_new, w_new, feats_new


class TSDFVolume:
    """Fixed-bounds voxel volume with C feature channels."""

    def __init__(self, vol_bnds, voxel_size: float, n_channels: int = 3):
        vol_bnds = np.asarray(vol_bnds, np.float32)  # (3, 2)
        self.voxel_size = float(voxel_size)
        self.trunc_margin = 5 * self.voxel_size
        self.dims = np.ceil(
            (vol_bnds[:, 1] - vol_bnds[:, 0]) / voxel_size
        ).astype(int)
        self.origin = vol_bnds[:, 0]
        n = int(np.prod(self.dims))
        self.n_channels = n_channels
        xs, ys, zs = np.meshgrid(
            *[np.arange(d) for d in self.dims], indexing="ij"
        )
        coords = np.stack([xs, ys, zs], -1).reshape(-1, 3).astype(np.float32)
        self._world = jnp.asarray(
            self.origin + (coords + 0.5) * voxel_size
        )
        self.tsdf = jnp.ones((n,), jnp.float32)
        self.weights = jnp.zeros((n,), jnp.float32)
        self.features = jnp.zeros((n_channels, n), jnp.float32)

    def integrate(self, feat_im, depth_im, intrinsics, cam_pose_w2c,
                  obs_weight: float = 1.0):
        """feat_im: (C, H, W) features (RGB or language codes);
        depth_im: (H, W) meters; cam_pose_w2c: (4, 4)."""
        intr = jnp.asarray(intrinsics, jnp.float32)
        self.tsdf, self.weights, self.features = _integrate(
            self.tsdf, self.weights, self.features, self._world,
            jnp.asarray(depth_im), jnp.asarray(feat_im), intr,
            jnp.asarray(cam_pose_w2c), jnp.float32(self.trunc_margin),
            obs_weight=obs_weight,
        )

    def get_point_cloud(self, tsdf_thresh: float = 0.2, weight_thresh: float = 0.0):
        """Surface points: voxels near the zero crossing with observations.
        Returns (points (M, 3), features (M, C))."""
        tsdf = np.asarray(self.tsdf)
        w = np.asarray(self.weights)
        mask = (np.abs(tsdf) < tsdf_thresh) & (w > weight_thresh)
        pts = np.asarray(self._world)[mask]
        feats = np.asarray(self.features).T[mask]
        return pts, feats

    def get_volume(self):
        return (
            np.asarray(self.tsdf).reshape(self.dims),
            np.asarray(self.features).reshape((self.n_channels, *self.dims)),
        )


def estimate_bounds(depth_frames, intrinsics, poses_w2c, margin: float = 0.1):
    """Frustum-union volume bounds (reference dim15_recon.py:20-60)."""
    fx, fy, cx, cy = intrinsics
    mins = np.full(3, np.inf)
    maxs = np.full(3, -np.inf)
    for depth, w2c in zip(depth_frames, poses_w2c):
        h, w = depth.shape
        zmax = float(np.max(depth)) if np.any(depth > 0) else 1.0
        corners = np.array(
            [[0, 0], [w - 1, 0], [0, h - 1], [w - 1, h - 1]], np.float32
        )
        c2w = np.linalg.inv(w2c)
        for z in (0.0, zmax):
            x = (corners[:, 0] - cx) / fx * z
            y = (corners[:, 1] - cy) / fy * z
            pts = np.stack([x, y, np.full(4, z)], -1) @ c2w[:3, :3].T + c2w[:3, 3]
            mins = np.minimum(mins, pts.min(axis=0))
            maxs = np.maximum(maxs, pts.max(axis=0))
    return np.stack([mins - margin, maxs + margin], axis=1)
