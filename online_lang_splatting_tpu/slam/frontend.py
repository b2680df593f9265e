"""SLAM frontend: per-frame camera tracking + keyframe management.

Host-side port of the reference FrontEnd
(/root/reference/utils/slam_frontend.py:33-728) re-built around jitted
device steps: one compiled `tracking_step` performs render → tracking
loss → pose/exposure Adam → SE(3) retraction, called up to
`tracking_itr_num` times per frame with an early convergence exit
(‖tau‖ < 1e-4). Keyframe selection (translation vs median depth +
visibility IoU) and the overlap/inverse-distance window management follow
the reference logic exactly.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.raster import RasterSettings
from . import losses as L
from .camera import Camera
from .renderer import RenderInputs, render


class PoseAdamState:
    """Tiny Adam over (rho, theta, exposure_a, exposure_b)."""

    def __init__(self):
        self.m = [jnp.zeros(3), jnp.zeros(3), jnp.zeros(()), jnp.zeros(())]
        self.v = [jnp.zeros(3), jnp.zeros(3), jnp.zeros(()), jnp.zeros(())]
        self.t = 0


@functools.partial(jax.jit, static_argnames=("settings", "alpha", "rgb_threshold"))
def tracking_step(
    inputs: RenderInputs,
    view, proj, gt_image, gt_depth, grad_mask,
    exposure_a, exposure_b,
    adam_m, adam_v, adam_t,
    lrs,  # (lr_trans, lr_rot, lr_exposure)
    *, settings: RasterSettings, alpha=0.95, rgb_threshold=0.01,
):
    """One tracking iteration. Returns new view, exposure, adam state,
    tau norm, and the final render byproducts (depth/opacity medians,
    visibility)."""

    def loss_fn(rho, theta, ea, eb):
        out = render(
            inputs, view, proj, settings,
            cam_trans_delta=rho, cam_rot_delta=theta,
        )
        loss = L.loss_tracking_rgbd(
            out.color, out.depth, out.opacity, gt_image, gt_depth, grad_mask,
            ea, eb, alpha=alpha, rgb_boundary_threshold=rgb_threshold,
        )
        return loss, out

    zeros3 = jnp.zeros(3, jnp.float32)
    (loss, out), grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3), has_aux=True)(
        zeros3, zeros3, exposure_a, exposure_b
    )

    # Adam on [trans, rot, ea, eb] with per-group LRs (reference tracking()
    # optimizer; deltas are re-zeroed by the retraction each iteration so
    # the delta after one step is exactly -update).
    lr_list = [lrs[0], lrs[1], lrs[2], lrs[2]]
    b1, b2, eps = 0.9, 0.999, 1e-8
    t = adam_t + 1
    new_m, new_v, steps = [], [], []
    for g, m, v, lr in zip(grads, adam_m, adam_v, lr_list):
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mhat = m / (1 - b1**t)
        vhat = v / (1 - b2**t)
        steps.append(-lr * mhat / (jnp.sqrt(vhat) + eps))
        new_m.append(m)
        new_v.append(v)
    trans_delta, rot_delta, d_ea, d_eb = steps
    tau = jnp.concatenate([trans_delta, rot_delta])
    from ..ops import lie

    new_view = lie.se3_exp(tau) @ view
    converged = jnp.linalg.norm(tau) < 1e-4
    med = L.median_depth(out.depth, out.opacity)
    return (
        new_view, exposure_a + d_ea, exposure_b + d_eb,
        new_m, new_v, t, converged, loss, med,
        out.n_touched > 0,
    )


class FrontEnd:
    def __init__(self, config: dict, settings: RasterSettings, backend_queue=None):
        self.config = config
        self.settings = settings
        self.backend_queue = backend_queue
        tr = config["Training"]
        self.tracking_itr_num = tr["tracking_itr_num"]
        self.kf_interval = tr["kf_interval"]
        self.window_size = tr["window_size"]
        self.single_thread = tr["single_thread"]
        self.use_gt_pose = tr.get("use_gt_pose", False)
        self.kf_translation = tr["kf_translation"]
        self.kf_min_translation = tr["kf_min_translation"]
        self.kf_overlap = tr["kf_overlap"]
        self.kf_cutoff = tr.get("kf_cutoff", 0.4)
        self.rgb_boundary_threshold = tr["rgb_boundary_threshold"]
        self.lr_trans = tr["lr"]["cam_trans_delta"]
        self.lr_rot = tr["lr"]["cam_rot_delta"]
        self.cameras: Dict[int, Camera] = {}
        self.occ_aware_visibility: Dict[int, np.ndarray] = {}
        self.current_window: List[int] = []
        self.kf_indices: List[int] = []
        self.median_depth = 1.0
        self.render_inputs: Optional[RenderInputs] = None

    # -- tracking -----------------------------------------------------------

    def track(self, cam: Camera, prev: Camera, proj) -> np.ndarray:
        """Track `cam` starting from `prev`'s pose. Returns visibility."""
        cam.update_rt(prev.r, prev.t)
        if self.use_gt_pose:
            cam.update_rt(cam.r_gt, cam.t_gt)

        view = jnp.asarray(cam.world_view_transform)
        ea = jnp.asarray(cam.exposure_a, jnp.float32)
        eb = jnp.asarray(cam.exposure_b, jnp.float32)
        adam = PoseAdamState()
        gt_depth = jnp.asarray(cam.depth)[None]
        lrs = (jnp.float32(self.lr_trans), jnp.float32(self.lr_rot), jnp.float32(0.01))
        visibility = None
        for itr in range(self.tracking_itr_num):
            (view, ea, eb, adam.m, adam.v, adam.t, converged, loss, med,
             visibility) = tracking_step(
                self.render_inputs, view, proj, cam.image, gt_depth,
                cam.grad_mask, ea, eb, adam.m, adam.v, adam.t, lrs,
                settings=self.settings,
                rgb_threshold=self.rgb_boundary_threshold,
            )
            if self.use_gt_pose:
                if itr >= 50:
                    break
                view = jnp.asarray(cam.world_view_transform)
            elif bool(converged):
                break
        v = np.asarray(view)
        if not self.use_gt_pose:
            cam.update_rt(v[:3, :3], v[:3, 3])
        cam.exposure_a = float(ea)
        cam.exposure_b = float(eb)
        self.median_depth = float(med)
        if not np.isfinite(self.median_depth):
            self.median_depth = 1.0
        return np.asarray(visibility)

    # -- keyframing ---------------------------------------------------------

    def is_keyframe(
        self, cur_idx: int, last_kf_idx: int, visibility: np.ndarray
    ) -> bool:
        cur, last = self.cameras[cur_idx], self.cameras[last_kf_idx]
        pose_cw = cur.world_view_transform
        last_wc = np.linalg.inv(last.world_view_transform)
        dist = np.linalg.norm((pose_cw @ last_wc)[:3, 3])
        dist_check = dist > self.kf_translation * self.median_depth
        dist_check2 = dist > self.kf_min_translation * self.median_depth
        last_vis = self.occ_aware_visibility[last_kf_idx]
        union = np.count_nonzero(visibility | last_vis)
        intersection = np.count_nonzero(visibility & last_vis)
        ratio = intersection / max(union, 1)
        return (ratio < self.kf_overlap and dist_check2) or dist_check

    def add_to_window(
        self, cur_idx: int, visibility: np.ndarray, window: List[int]
    ) -> Tuple[List[int], Optional[int]]:
        n_dont_touch = 2
        window = [cur_idx] + window
        removed = None
        to_remove = []
        for i in range(n_dont_touch, len(window)):
            kf_idx = window[i]
            vis = self.occ_aware_visibility[kf_idx]
            intersection = np.count_nonzero(visibility & vis)
            denom = min(np.count_nonzero(visibility), np.count_nonzero(vis))
            if intersection / max(denom, 1) <= self.kf_cutoff:
                to_remove.append(kf_idx)
        if to_remove:
            window.remove(to_remove[-1])
            removed = to_remove[-1]

        cur = self.cameras[cur_idx]
        kf0_wc = np.linalg.inv(cur.world_view_transform)
        if len(window) > self.window_size:
            inv_dist = []
            for i in range(n_dont_touch, len(window)):
                kf_i = self.cameras[window[i]]
                kf_i_cw = kf_i.world_view_transform
                inv_dists = []
                for j in range(n_dont_touch, len(window)):
                    if i == j:
                        continue
                    kf_j_wc = np.linalg.inv(
                        self.cameras[window[j]].world_view_transform
                    )
                    inv_dists.append(
                        1.0 / (np.linalg.norm((kf_i_cw @ kf_j_wc)[:3, 3]) + 1e-6)
                    )
                k = np.sqrt(np.linalg.norm((kf_i_cw @ kf0_wc)[:3, 3]))
                inv_dist.append(k * sum(inv_dists))
            removed = window[n_dont_touch + int(np.argmax(inv_dist))]
            window.remove(removed)
        return window, removed

    def new_keyframe_depth(self, cam: Camera) -> np.ndarray:
        """Observed depth with invalid-RGB pixels zeroed (add_new_keyframe)."""
        valid_rgb = (
            np.asarray(cam.image).sum(axis=0) > self.rgb_boundary_threshold
        )
        depth = cam.depth.copy()
        depth[~valid_rgb] = 0.0
        return depth
