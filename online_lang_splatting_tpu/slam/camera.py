"""Per-frame camera state (host-side) and image-space preprocessing.

Mirror of the reference Camera (/root/reference/utils/camera_utils.py:8-163)
minus torch: poses are numpy, images/depths are device arrays, the pose
deltas/exposure live as small jnp arrays optimized by the tracking and
mapping steps. The Scharr gradient mask matches compute_grad_mask
(:123-152) — "replica"-type datasets use per-block medians, everything
else a global median threshold.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import graphics, losses


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _grad_mask_device(image, is_replica: bool, rows: int, cols: int,
                      edge_threshold):
    """Whole Scharr grad-mask pipeline as ONE device program.

    The eager version cost ~6 dispatches + a full-image device->host
    fetch + a host->device mask upload PER FRAME — each paying the
    remote tunnel's 50-300 ms round trip (CLAUDE.md); at 40 frames that
    was the bulk of the gate's 17 s "data" phase."""
    gray = jnp.mean(image, axis=0, keepdims=True)
    grad_v, grad_h = losses.image_gradient(gray)
    mask_v, mask_h = losses.image_gradient_mask(gray)
    intensity = jnp.sqrt(
        jnp.square(grad_v * mask_v) + jnp.square(grad_h * mask_h)
    )
    if not is_replica:
        med = jnp.median(intensity)
        return (intensity > med * edge_threshold).astype(jnp.float32)
    h, w = intensity.shape[1], intensity.shape[2]
    bh, bw = h // rows, w // cols
    blocks = intensity[0, : rows * bh, : cols * bw].reshape(
        rows, bh, cols, bw
    )
    med = jnp.median(blocks, axis=(1, 3), keepdims=True)
    out = (blocks > med * edge_threshold).astype(jnp.float32)
    out = out.reshape(rows * bh, cols * bw)
    full = jnp.zeros((h, w), jnp.float32)
    return full.at[: rows * bh, : cols * bw].set(out)[None]


@jax.jit
def _u8_to_unit(u8):
    return u8.astype(jnp.float32) / 255.0


@dataclasses.dataclass
class Camera:
    uid: int
    image: Any            # (3, H, W) float32 [0, 1] device array
    depth: np.ndarray     # (H, W) float32 meters (host)
    r_gt: np.ndarray      # (3, 3)
    t_gt: np.ndarray      # (3,)
    fx: float
    fy: float
    cx: float
    cy: float
    fovx: float
    fovy: float
    height: int
    width: int
    # Current estimated pose (W2C), updated by tracking/mapping.
    r: np.ndarray = None
    t: np.ndarray = None
    exposure_a: float = 0.0
    exposure_b: float = 0.0
    grad_mask: Any = None
    gt_lang_feat: Any = None    # (L, 192, 192) cached supervision map
    coco_lang_feat: Any = None  # (N, 32) two-stage cached codes
    lang_feat_mask: Any = None
    image_host: Any = None      # optional (3, H, W) host copy (numpy)
    depth_dev: Any = None       # (1, H, W) device copy of `depth` —
    # uploaded off the tracking critical path (CameraPrefetcher thread):
    # the eager jnp.asarray(depth) in track() paid a ~3.3 MB tunnel
    # transfer per frame.

    def __post_init__(self):
        if self.r is None:
            self.r = np.eye(3, dtype=np.float32)
        if self.t is None:
            self.t = np.zeros(3, dtype=np.float32)

    @classmethod
    def from_dataset(cls, dataset, idx: int) -> "Camera":
        color, depth, pose, gt_lang, lang_mask = dataset[idx]
        if getattr(dataset, "upload_u8", False):
            # 4x less tunnel traffic: ship u8, divide on device. Within
            # 1 ulp for u8-source datasets (datasets.BaseDataset.upload_u8).
            u8 = np.clip(color * 255.0 + 0.5, 0.0, 255.0).astype(np.uint8)
            image = _u8_to_unit(jnp.asarray(u8))
        else:
            image = jnp.asarray(color)
        cam = cls(
            uid=idx,
            image=image,
            depth=depth,
            r_gt=pose[:3, :3].astype(np.float32),
            t_gt=pose[:3, 3].astype(np.float32),
            fx=dataset.fx, fy=dataset.fy, cx=dataset.cx, cy=dataset.cy,
            fovx=dataset.fovx, fovy=dataset.fovy,
            height=dataset.height, width=dataset.width,
            gt_lang_feat=gt_lang, lang_feat_mask=lang_mask,
        )
        # Keep the dataset's host copy: keyframe insertion reads pixels
        # host-side (frontend.new_keyframe_depth); without this it pays a
        # ~10 MB device->host fetch through the remote tunnel per KF.
        cam.image_host = color if isinstance(color, np.ndarray) else None
        return cam

    def update_rt(self, r, t):
        self.r = np.asarray(r, np.float32)
        self.t = np.asarray(t, np.float32)

    @property
    def world_view_transform(self) -> np.ndarray:
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = self.r
        m[:3, 3] = self.t
        return m

    def compute_grad_mask(self, config: dict):
        edge_threshold = config["Training"]["edge_threshold"]
        self.grad_mask = _grad_mask_device(
            self.image, config["Dataset"]["type"] == "replica", 32, 32,
            jnp.float32(edge_threshold),
        )
        # Piggyback the tracking-loss depth upload on the same prefetched
        # build (runs in the CameraPrefetcher worker, overlapped with the
        # previous frame's tracking compute).
        if self.depth is not None:
            self.depth_dev = jnp.asarray(self.depth)[None]

    def clean(self):
        self.image = None
        self.image_host = None
        self.depth = None
        self.depth_dev = None
        self.grad_mask = None
        self.gt_lang_feat = None
        self.coco_lang_feat = None


def camera_projection(cam: Camera, znear=0.01, zfar=100.0):
    return graphics.projection_matrix(
        znear, zfar, cam.cx, cam.cy, cam.fx, cam.fy, cam.width, cam.height
    )
