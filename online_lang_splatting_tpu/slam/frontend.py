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

from ..ops import lie
from ..ops.raster import RasterSettings, grow_bucket
from . import losses as L
from .camera import Camera
from .renderer import RenderInputs, render


@functools.partial(
    jax.jit,
    static_argnames=(
        "settings", "alpha", "rgb_threshold", "max_iters",
        "plateau_patience", "keep_best",
    ),
)
def tracking_run(
    inputs: RenderInputs,
    view, proj, gt_image, gt_depth, grad_mask,
    exposure_a, exposure_b, lrs,
    plateau_rtol=0.0,
    lr_decay=1.0,
    *, settings: RasterSettings, max_iters: int,
    alpha=0.95, rgb_threshold=0.01, plateau_patience: int = 5,
    keep_best: bool = False,
):
    """Whole-frame tracking in ONE dispatch: a lax.while_loop of
    render → loss → pose/exposure Adam → SE(3) retraction with the
    device-side ‖tau‖ < 1e-4 convergence exit. Replaces per-iteration host
    round trips (which dominate through the remote device link).

    `plateau_rtol > 0` adds a loss-plateau exit: `plateau_patience`
    CONSECUTIVE iterations without a meaningful new best loss
    (loss < best·(1-rtol)) end the loop. Adam's
    step norm stays ~lr until momentum decays through gradient
    oscillation, so the reference's ‖tau‖ criterion rarely fires inside
    the budget (measured 62-84% budget exhaustion, PERF.md) even when the
    pose stopped improving dozens of iterations earlier; the plateau exit
    banks those iterations. 0.0 (default) preserves reference behavior.

    `lr_decay < 1` (requires `plateau_rtol > 0`) turns the plateau
    criterion into a reduce-lr-on-plateau schedule instead of an exit:
    each time the loss plateaus for `plateau_patience` consecutive
    iterations, every Adam step (pose AND exposure) is scaled by
    lr_decay and the patience counter resets. Adam's bias-corrected step
    stays ~lr-sized regardless of gradient magnitude, so with the
    reference's FIXED lr the ‖tau‖ < 1e-4 exit can only fire through
    momentum cancellation — measured 62-88% budget exhaustion on the
    synthetic replica-scale scene, leaving ~lr-scale noise in every
    committed pose (and, compounded over frames, the 120-frame ATE
    blow-ups: 0.0229 static r4, 0.0582 cv+keep_best r5). Cutting lr only
    ON plateau keeps the travel range unbounded while progress lasts (a
    plain per-iteration exponential decay caps total displacement at
    lr/(1-decay) — it froze short of the target on the unit toy), then
    collapses the step geometrically so the ‖tau‖ exit fires and the
    committed pose is the basin minimum rather than the last sample of
    an lr-sized orbit. 1.0 (default) preserves reference behavior
    (fixed-lr Adam; with plateau_rtol > 0 the plateau stays an EXIT, the
    round-4 semantics).

    `keep_best=True` returns the argmin-loss (pose, exposure) over the
    loop instead of the last iterate. Adam's bias-corrected step is
    ~lr-sized regardless of gradient magnitude, so even from a perfect
    init the pose random-walks at ~lr scale until the budget runs out —
    the LAST iterate carries that noise into the trajectory (and, frame
    over frame, into map drift: the 120-frame run doubled ATE with 84%
    budget saturation). The loss at each iterate is already computed for
    its gradient, so tracking the argmin costs four extra while-loop
    registers and no extra renders. Off by default (reference parity:
    update_pose commits the final iterate, pose_utils.py:76-93).

    Language channels are dropped from the tracking render: the tracking
    loss never reads them, so results are identical and the blend moves
    ~3x less channel data than the reference's language rasterizer call.
    """
    track_inputs = inputs._replace(
        language=jnp.zeros((inputs.language.shape[0], 0), jnp.float32)
    )
    # Loop renders never read n_touched/n_contrib — skip that kernel
    # bookkeeping; only the final render (median depth + visibility)
    # needs it.
    loop_settings = settings._replace(stats=False)

    def loss_fn(rho, theta, ea, eb, view):
        out = render(
            track_inputs, view, proj, loop_settings,
            cam_trans_delta=rho, cam_rot_delta=theta,
        )
        loss = L.loss_tracking_rgbd(
            out.color, out.depth, out.opacity, gt_image, gt_depth, grad_mask,
            ea, eb, alpha=alpha, rgb_boundary_threshold=rgb_threshold,
        )
        return loss, out

    zeros3 = jnp.zeros(3, jnp.float32)
    lr_list = [lrs[0], lrs[1], lrs[2], lrs[2]]
    b1, b2, eps = 0.9, 0.999, 1e-8

    def body(state):
        (view, ea, eb, m, v, t, _, loss_prev, ovf, dem, cnt, lr_scale,
         best) = state
        (loss, out), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2, 3), has_aux=True
        )(zeros3, zeros3, ea, eb, view)
        # Plateau = no MEANINGFUL NEW BEST for `patience` consecutive
        # iterations. Consecutive-iteration |Δloss| is the wrong signal:
        # an iterate oscillating around the minimum keeps large deltas
        # forever, so that criterion never fires exactly where the exit
        # is needed (measured: 60/60 iters with rtol 0.01 on the unit
        # toy). Improvement-vs-best is the standard
        # reduce-lr-on-plateau test.
        improved = loss < best[0] * (1 - plateau_rtol)
        # The loss just computed scores the CURRENT iterate (pre-step);
        # keep the running argmin (keep_best docstring).
        better = loss < best[0]
        best = (
            jnp.where(better, loss, best[0]),
            jnp.where(better, view, best[1]),
            jnp.where(better, ea, best[2]),
            jnp.where(better, eb, best[3]),
        )
        # Accumulate overflow from every intermediate render: a truncated
        # render yields truncated pose gradients, so the caller must know
        # even when the final render fits the pool (overflow-replay
        # invariant; mirrors the mapping chunks' per-iteration OR).
        ovf = ovf | out.overflow
        dem = jnp.maximum(dem, out.num_instances)
        t = t + 1
        new_m, new_v, steps = [], [], []
        for g, mi, vi, lr in zip(grads, m, v, lr_list):
            mi = b1 * mi + (1 - b1) * g
            vi = b2 * vi + (1 - b2) * g * g
            steps.append(
                -lr * lr_scale * (mi / (1 - b1**t))
                / (jnp.sqrt(vi / (1 - b2**t)) + eps)
            )
            new_m.append(mi)
            new_v.append(vi)
        trans_d, rot_d, d_ea, d_eb = steps
        tau = jnp.concatenate([trans_d, rot_d])
        view = lie.se3_exp(tau) @ view
        cnt = jnp.where(improved, 0, cnt + 1)
        trigger = (plateau_rtol > 0) & (cnt >= plateau_patience)
        # Reduce-lr-on-plateau (docstring): with lr_decay < 1 the plateau
        # trigger CUTS the lr and resets patience instead of exiting.
        cut = trigger & (lr_decay < 1)
        lr_scale = jnp.where(cut, lr_scale * lr_decay, lr_scale)
        cnt = jnp.where(cut, 0, cnt)
        converged = (jnp.linalg.norm(tau) < 1e-4) | (
            trigger & (lr_decay >= 1)
        )
        return (view, ea + d_ea, eb + d_eb, tuple(new_m), tuple(new_v), t,
                converged, loss, ovf, dem, cnt, lr_scale, best)

    def cond(state):
        t, converged = state[5], state[6]
        return (t < max_iters) & ~converged

    z3 = jnp.zeros(3)
    zs = jnp.zeros(())
    init = (
        view, exposure_a, exposure_b,
        (z3, z3, zs, zs), (z3, z3, zs, zs),
        jnp.zeros((), jnp.float32), jnp.array(False), jnp.zeros(()),
        jnp.array(False), jnp.zeros((), jnp.int32),
        jnp.zeros((), jnp.int32), jnp.ones((), jnp.float32),
        (jnp.full((), jnp.inf, jnp.float32), view, exposure_a, exposure_b),
    )
    (view, ea, eb, _, _, n_iters, _, loss, ovf, dem, _, _,
     best) = jax.lax.while_loop(cond, body, init)
    if keep_best:
        loss, view, ea, eb = best
    # Final render at the converged pose: median depth + visibility.
    out = render(track_inputs, view, proj, settings)
    med = L.median_depth(out.depth, out.opacity)
    return (view, ea, eb, n_iters, loss, med, out.n_touched > 0,
            ovf | out.overflow, jnp.maximum(dem, out.num_instances))


def cv_extrapolate(v1: np.ndarray, v2: np.ndarray) -> np.ndarray:
    """Constant-velocity pose prediction: given W2C matrices at t-1 (`v1`)
    and t-2 (`v2`), predict t's W2C assuming the frame-to-frame delta
    D = v1 @ v2^-1 repeats. Exact on constant-twist trajectories."""
    return v1 @ np.linalg.inv(v2) @ v1


class FrontEnd:
    def __init__(self, config: dict, settings: RasterSettings,
                 backend_queue=None, mesh=None):
        self.config = config
        self.settings = settings
        self.backend_queue = backend_queue
        # Optional device mesh: tracking renders band-parallel over chips
        # (parallel/tile_shard.py) — latency, not just throughput, scales
        # with the pod size.
        self.mesh = mesh
        tr = config["Training"]
        self.tracking_itr_num = tr["tracking_itr_num"]
        # Tracking pose initialization: "static" starts each frame at the
        # previous frame's pose (reference behavior,
        # /root/reference/utils/slam_frontend.py:592-594 — viewpoint keeps
        # the last estimate); "cv" extrapolates with a constant-velocity
        # motion model (init = D @ V_prev with D = V_prev @ V_prev2^-1),
        # which starts the optimizer much closer on smooth trajectories —
        # fewer iterations to the ||tau|| exit and less drift when the
        # budget caps out. Beyond-reference; default preserves parity.
        self.motion_model = tr.get("motion_model", "static")
        # Loss-plateau tracking exit (tracking_run docstring); 0 = off
        # (reference parity: only the ‖tau‖ criterion).
        self.plateau_rtol = float(tr.get("tracking_plateau_rtol", 0.0))
        self.plateau_patience = int(tr.get("tracking_plateau_patience", 5))
        # Per-iteration tracking lr decay (tracking_run docstring);
        # 1.0 = off (reference parity: fixed-lr Adam).
        self.lr_decay = float(tr.get("tracking_lr_decay", 1.0))
        # Commit the argmin-loss iterate instead of the last one
        # (tracking_run keep_best docstring); off = reference parity.
        self.keep_best = bool(tr.get("tracking_best_pose", False))
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
        # Per-frame tracking iteration counts + final losses (the
        # ‖tau‖<1e-4 convergence-exit analysis, PERF.md).
        self.track_iters: List[int] = []
        self.track_losses: List[float] = []

    # -- tracking -----------------------------------------------------------

    def track(self, cam: Camera, prev: Camera, proj,
              prev2: Optional[Camera] = None) -> np.ndarray:
        """Track `cam` starting from `prev`'s pose (or the constant-velocity
        extrapolation when `motion_model: cv`). Returns visibility."""
        if self.motion_model == "cv" and prev2 is not None:
            init = cv_extrapolate(
                prev.world_view_transform, prev2.world_view_transform
            )
            cam.update_rt(init[:3, :3], init[:3, 3])
        else:
            cam.update_rt(prev.r, prev.t)
        if self.use_gt_pose:
            cam.update_rt(cam.r_gt, cam.t_gt)

        import os as _os
        import time as _time

        timing = _os.environ.get("OLS_TRACK_TIMING")
        # Small args stay numpy: they ride the dispatch's argument batch
        # instead of paying an eager per-array tunnel transfer each.
        view0 = np.asarray(cam.world_view_transform, np.float32)
        # The depth upload is prefetched (camera.compute_grad_mask in the
        # CameraPrefetcher worker); fall back to an inline upload for
        # cameras built without prefetch.
        gt_depth = (
            cam.depth_dev if cam.depth_dev is not None
            else jnp.asarray(cam.depth)[None]
        )
        lrs = (np.float32(self.lr_trans), np.float32(self.lr_rot),
               np.float32(0.01))
        max_iters = 1 if self.use_gt_pose else self.tracking_itr_num
        # On raster instance-pool overflow: grow the bucket and REDO the
        # whole frame (truncated renders would corrupt the pose estimate).
        t_disp = 0.0
        for _attempt in range(4):
            if self.mesh is not None:
                from ..parallel.tile_shard import make_banded_tracking_run

                run = make_banded_tracking_run(
                    self.mesh, self.settings, max_iters=max_iters,
                    rgb_threshold=self.rgb_boundary_threshold,
                    plateau_patience=self.plateau_patience,
                    keep_best=self.keep_best,
                )
                (view, ea, eb, n_iters, loss, med, visibility,
                 overflow, demand) = run(
                    self.render_inputs, view0, proj, cam.image, gt_depth,
                    cam.grad_mask, jnp.asarray(cam.exposure_a, jnp.float32),
                    jnp.asarray(cam.exposure_b, jnp.float32), lrs,
                    jnp.float32(self.plateau_rtol),
                    jnp.float32(self.lr_decay),
                )
            else:
                t_disp = _time.time()
                (view, ea, eb, n_iters, loss, med, visibility,
                 overflow, demand) = tracking_run(
                    self.render_inputs, view0, proj, cam.image, gt_depth,
                    cam.grad_mask, np.float32(cam.exposure_a),
                    np.float32(cam.exposure_b), lrs,
                    np.float32(self.plateau_rtol),
                    np.float32(self.lr_decay),
                    settings=self.settings, max_iters=max_iters,
                    rgb_threshold=self.rgb_boundary_threshold,
                    plateau_patience=self.plateau_patience,
                    keep_best=self.keep_best,
                )
                t_disp = _time.time() - t_disp
            # ONE batched fetch for everything the host consumes: each
            # scalar float()/int() pays its own 50-300 ms tunnel round
            # trip; batching them is the same trick as the backend's
            # chunk fetches (CLAUDE.md, backend.py).
            t_fetch = _time.time()
            (view, ea, eb, n_iters, loss, med, visibility, overflow,
             demand) = jax.device_get(
                (view, ea, eb, n_iters, loss, med, visibility, overflow,
                 demand))
            if timing:
                print(f"[track-timing] frame={cam.uid} "
                      f"dispatch={t_disp:.3f}s "
                      f"fetch={_time.time() - t_fetch:.3f}s "
                      f"iters={int(n_iters)} "
                      f"depth_prefetched={cam.depth_dev is not None}",
                      flush=True)
            if not bool(overflow):
                break
            # Demand-sized growth (grow_bucket docstring): land on the
            # observed peak instance demand x margin, not a blind double.
            self.settings = self.settings._replace(
                max_instances=grow_bucket(
                    self.settings.max_instances, int(demand)
                )
            )
            print(f"[frontend] raster instance pool grown to "
                  f"{self.settings.max_instances}; redoing frame")
        if not self.use_gt_pose:
            v = np.asarray(view)
            if np.isfinite(v).all():
                cam.update_rt(v[:3, :3], v[:3, 3])
                cam.exposure_a = float(ea)
                cam.exposure_b = float(eb)
            else:
                # Never commit a diverged pose (e.g. a frame whose valid
                # pixels vanished once the trajectory swept off the mapped
                # scene): keep the init pose — already written to cam by
                # the motion model above — and reset exposure. The next
                # frame restarts from a finite estimate instead of
                # cascading NaNs through cv extrapolation and the map.
                print(f"[frontend] WARNING: non-finite tracked pose at "
                      f"frame {cam.uid}; keeping motion-model init")
                cam.exposure_a = 0.0
                cam.exposure_b = 0.0
        self.track_iters.append(int(n_iters))
        self.track_losses.append(float(loss))
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
        # Prefer the host copy: np.asarray(device image) pays a ~10 MB
        # fetch through the remote tunnel per keyframe.
        img = cam.image_host if cam.image_host is not None else np.asarray(
            cam.image
        )
        valid_rgb = img.sum(axis=0) > self.rgb_boundary_threshold
        depth = cam.depth.copy()
        depth[~valid_rgb] = 0.0
        return depth
