"""SLAM backend: keyframe mapping, densification, language fusion.

Host-driven port of the reference BackEnd
(/root/reference/utils/slam_backend.py:44-998). The per-iteration work —
render each window/random keyframe, accumulate photometric + language +
isotropic losses, step the Gaussian Adam and the per-keyframe pose/exposure
Adam, collect visibility & densification statistics — is ONE jitted
function (`mapping_iteration`) that lax.scans over a fixed number of
keyframe slots; gradients are computed inside each scan step so only one
render's residuals are ever live. Densify/prune/opacity-reset cadences,
keyframe bookkeeping, window management and the online autoencoder run on
the host between steps, exactly on the reference's schedule.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import gaussians as G
from ..models.convnext_clip import resize_bilinear
from ..ops import lie
from ..ops.raster import RasterSettings
from . import losses as L
from .camera import Camera
from .renderer import activate, render


@functools.partial(
    jax.jit,
    static_argnames=("settings", "n_slots", "init_mode"),
)
def mapping_iteration(
    params: G.GaussianParams,
    opt: G.AdamState,
    aux: G.GaussianAux,
    proj,
    slot_r, slot_t, slot_ea, slot_eb,
    pose_m, pose_v, pose_t,
    images, depths, langs,
    slot_valid, lang_on, pose_opt, exp_opt,
    lrs: G.LearningRates,
    lang_weight,
    *,
    settings: RasterSettings,
    n_slots: int,
    init_mode: bool,
):
    """One mapping iteration over `n_slots` keyframe slots.

    Returns (params, opt, aux, new slot poses/exposures, pose adam state,
    occ_vis (S, cap) bool, loss).
    """
    cap = params.xyz.shape[0]

    def kf_loss(p, rho, theta, ea, eb, m2d, r, t, image, depth, lang, l_on, valid):
        inputs = activate(p, aux.active)
        view = lie.rt_to_mat4(r, t)
        out = render(
            inputs, view, proj, settings,
            cam_trans_delta=rho, cam_rot_delta=theta, means2d_offset=m2d,
        )
        loss = L.loss_mapping_rgbd(
            out.color, out.depth, image, depth, ea, eb,
            initialization=init_mode,
        )
        # Language supervision (slam_backend.py:579-597): L1 against the
        # cached low-dim map, resized to the frame.
        lang_hw = resize_bilinear(
            jnp.transpose(lang, (1, 2, 0))[None],
            (image.shape[1], image.shape[2]),
        )[0]
        l_lang = jnp.abs(out.language - jnp.transpose(lang_hw, (2, 0, 1))).mean()
        loss = loss + lang_weight * jnp.where(l_on, l_lang, 0.0)
        loss = loss * valid
        return loss, (out.radii, out.n_touched, out.overflow)

    zero_m2d = jnp.zeros((cap, 2), jnp.float32)
    zeros3 = jnp.zeros(3, jnp.float32)

    def step(carry, slot):
        grad_acc, aux_c, loss_acc = carry
        (r, t, ea, eb, image, depth, lang, l_on, valid, p_opt) = slot
        (loss, (radii, n_touched, ovf)), grads = jax.value_and_grad(
            kf_loss, argnums=(0, 1, 2, 3, 4, 5), has_aux=True
        )(params, zeros3, zeros3, ea, eb, zero_m2d, r, t, image, depth, lang,
          l_on, valid)
        g_params, g_rho, g_theta, g_ea, g_eb, g_m2d = grads
        grad_acc = jax.tree.map(jnp.add, grad_acc, g_params)
        visible = (radii > 0) & aux_c.active
        aux_c = aux_c._replace(
            max_radii2d=jnp.where(
                visible,
                jnp.maximum(aux_c.max_radii2d, radii.astype(jnp.float32)),
                aux_c.max_radii2d,
            ),
            xyz_grad_accum=aux_c.xyz_grad_accum
            + jnp.where(visible, jnp.linalg.norm(g_m2d, axis=-1), 0.0),
            denom=aux_c.denom + visible.astype(jnp.float32),
        )
        return (grad_acc, aux_c, loss_acc + loss), (
            g_rho, g_theta, g_ea, g_eb, n_touched > 0, ovf,
        )

    grad0 = jax.tree.map(jnp.zeros_like, params)
    slots = (
        slot_r, slot_t, slot_ea, slot_eb, images, depths, langs,
        lang_on, slot_valid.astype(jnp.float32), pose_opt,
    )
    (grads, aux, loss), per_slot = jax.lax.scan(step, (grad0, aux, 0.0), slots)
    g_rho, g_theta, g_ea, g_eb, occ_vis, slot_ovf = per_slot

    # Isotropic regularizer, 10x (slam_backend.py:664-667).
    iso_grad = jax.grad(
        lambda p: 10.0 * L.isotropic_loss(jnp.exp(p.scaling), aux.active)
    )(params)
    grads = jax.tree.map(jnp.add, grads, iso_grad)

    params, opt = G.adam_step(params, grads, opt, lrs, aux.active)

    # Per-keyframe pose/exposure Adam + SE(3) retraction.
    b1, b2, eps = 0.9, 0.999, 1e-8
    t_new = pose_t + 1
    lr_list = (0.001, 0.003, 0.01, 0.01)  # trans, rot, exposure a/b

    def pose_step(g, m, v, lr):
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mh = m / (1 - b1 ** t_new.reshape((-1,) + (1,) * (g.ndim - 1)))
        vh = v / (1 - b2 ** t_new.reshape((-1,) + (1,) * (g.ndim - 1)))
        return -lr * mh / (jnp.sqrt(vh) + eps), m, v

    d_rho, m0, v0 = pose_step(g_rho, pose_m[0], pose_v[0], lr_list[0])
    d_theta, m1, v1 = pose_step(g_theta, pose_m[1], pose_v[1], lr_list[1])
    d_ea, m2, v2 = pose_step(g_ea, pose_m[2], pose_v[2], lr_list[2])
    d_eb, m3, v3 = pose_step(g_eb, pose_m[3], pose_v[3], lr_list[3])

    pose_mask = pose_opt
    exp_mask = exp_opt

    def retract(r, t, dr, dt, ok):
        new = lie.se3_exp(jnp.concatenate([dt, dr])) @ lie.rt_to_mat4(r, t)
        return (
            jnp.where(ok, new[:3, :3], r),
            jnp.where(ok, new[:3, 3], t),
        )

    new_r, new_t = jax.vmap(retract)(
        slot_r, slot_t, d_theta, d_rho, pose_mask
    )
    new_ea = jnp.where(exp_mask, slot_ea + d_ea, slot_ea)
    new_eb = jnp.where(exp_mask, slot_eb + d_eb, slot_eb)

    return (
        params, opt, aux, new_r, new_t, new_ea, new_eb,
        ((m0, m1, m2, m3), (v0, v1, v2, v3), t_new),
        occ_vis, loss, jnp.any(slot_ovf),
    )


@functools.partial(jax.jit, static_argnames=("n_target",))
def backproject_sample(image, depthmap, w2c, intrinsics, key, n_target: int):
    """Back-project an RGB-D frame to a world point cloud and sample
    n_target points uniformly among valid-depth pixels (the reference's
    open3d create_from_rgbd_image + random_down_sample, on device)."""
    fx, fy, cx, cy = intrinsics
    h, w = depthmap.shape
    ys, xs = jnp.mgrid[0:h, 0:w]
    z = depthmap.reshape(-1)
    x = (xs.reshape(-1) - cx) / fx * z
    y = (ys.reshape(-1) - cy) / fy * z
    cam_pts = jnp.stack([x, y, z], -1)
    c2w = jnp.linalg.inv(w2c)
    world = cam_pts @ c2w[:3, :3].T + c2w[:3, 3]
    rgb = image.reshape(3, -1).T
    valid = z > 0
    score = jnp.where(valid, jax.random.uniform(key, z.shape), 2.0)
    _, idx = jax.lax.top_k(-score, n_target)
    sel_valid = score[idx] < 1.5
    return world[idx], rgb[idx], sel_valid


class BackEnd:
    def __init__(
        self,
        config: dict,
        settings: RasterSettings,
        proj,
        capacity: int = 1 << 17,
        lang_extractor=None,
        online_ae=None,
    ):
        self.config = config
        self.settings = settings
        self.proj = jnp.asarray(proj)
        tr = config["Training"]
        op = config["opt_params"]
        self.cap = capacity
        lang_dim = config.get("language", {}).get("lang_code_size", 15)
        self.lang_dim = lang_dim
        sh_degree = config["model_params"]["sh_degree"]
        self.params = G.empty_params(capacity, sh_degree, lang_dim)
        self.aux = G.empty_aux(capacity)
        self.opt = G.init_adam(self.params)
        self.iteration_count = 0
        self.viewpoints: Dict[int, Camera] = {}
        self.current_window: List[int] = []
        self.occ_aware_visibility: Dict[int, np.ndarray] = {}
        self.initialized = False
        self.keyframe_optimizer_state = None
        self.rng = jax.random.PRNGKey(config.get("seed", 0))

        self.init_itr_num = tr["init_itr_num"]
        self.init_gaussian_update = tr["init_gaussian_update"]
        self.init_gaussian_reset = tr["init_gaussian_reset"]
        self.init_gaussian_th = tr["init_gaussian_th"]
        self.init_gaussian_extent = tr["init_gaussian_extent"]
        self.mapping_itr_num = tr["mapping_itr_num"]
        self.gaussian_update_every = tr["gaussian_update_every"]
        self.gaussian_update_offset = tr["gaussian_update_offset"]
        self.gaussian_th = tr["gaussian_th"]
        self.gaussian_extent = tr["gaussian_extent"]
        self.gaussian_reset = tr["gaussian_reset"]
        self.size_threshold = tr["size_threshold"]
        self.window_size = tr["window_size"]
        self.pose_window = tr["pose_window"]
        self.use_gt_pose = tr.get("use_gt_pose", False)
        self.prune_mode = tr.get("prune_mode", "slam")
        self.single_thread = tr.get("single_thread", False)
        self.op = op
        self.lang_train = config.get("language", {}).get("language_train", False)
        self.lamda_lang = config.get("language", {}).get("lamda_lang", 1.0)
        self.lang_extractor = lang_extractor
        self.online_ae = online_ae  # two-stage trainer or None
        self.pcd_downsample = config["Dataset"]["pcd_downsample"]
        self.pcd_downsample_init = config["Dataset"]["pcd_downsample_init"]
        self.point_size = config["Dataset"]["point_size"]
        self.adaptive_pointsize = config["Dataset"].get("adaptive_pointsize", False)
        self.frame_size = None  # (H, W), set on first keyframe

    # -- learning rates -----------------------------------------------------

    def _lrs(self) -> G.LearningRates:
        op = self.op
        xyz_lr = G.expon_lr(
            jnp.asarray(self.iteration_count, jnp.float32),
            op["position_lr_init"], op["position_lr_final"],
            lr_delay_mult=op["position_lr_delay_mult"],
            max_steps=op["position_lr_max_steps"],
        )
        f = jnp.float32
        return G.LearningRates(
            xyz=xyz_lr,
            features_dc=f(op["feature_lr"]),
            features_rest=f(op["feature_lr"] / 20.0),
            scaling=f(op["scaling_lr"]),
            rotation=f(op["rotation_lr"]),
            opacity=f(op["opacity_lr"]),
            language=f(op.get("language_lr", op["feature_lr"])),
        )

    # -- keyframe insertion -------------------------------------------------

    def add_next_kf(self, kf_idx: int, cam: Camera, depthmap: np.ndarray,
                    init: bool = False):
        self.viewpoints[kf_idx] = cam
        self.frame_size = (cam.height, cam.width)
        downsample = self.pcd_downsample_init if init else self.pcd_downsample
        point_size = self.point_size
        if self.adaptive_pointsize:
            med = float(np.median(depthmap[depthmap > 0])) if (depthmap > 0).any() else 1.0
            point_size = min(0.05, point_size * med)
        n_target = max(int(cam.height * cam.width / downsample), 16)
        self.rng, key = jax.random.split(self.rng)
        xyz, rgb, valid = backproject_sample(
            cam.image, jnp.asarray(depthmap),
            jnp.asarray(cam.world_view_transform),
            jnp.asarray([cam.fx, cam.fy, cam.cx, cam.cy], jnp.float32),
            key, n_target,
        )
        self.params, self.aux, self.opt, overflow = G.extend_points(
            self.params, self.aux, self.opt,
            xyz=xyz, rgb=rgb, valid=valid, kf_id=kf_idx, point_size=point_size,
        )
        if bool(overflow):
            self._grow_capacity()
            self.params, self.aux, self.opt, _ = G.extend_points(
                self.params, self.aux, self.opt,
                xyz=xyz, rgb=rgb, valid=valid, kf_id=kf_idx,
                point_size=point_size,
            )

    def _grow_capacity(self):
        new_cap = self.cap * 2
        self.params, self.aux, self.opt, n = G.compact(
            self.params, self.aux, self.opt, new_cap
        )
        self.cap = new_cap

    def reset_keyframe_optimizer(self, n_slots: int):
        z3 = jnp.zeros((n_slots, 3), jnp.float32)
        zs = jnp.zeros((n_slots,), jnp.float32)
        self.keyframe_optimizer_state = (
            (z3, z3, zs, zs), (z3, z3, zs, zs),
            jnp.zeros((n_slots,), jnp.float32),
        )

    # -- language supervision ----------------------------------------------

    def ensure_lang_features(self, cam: Camera):
        """Compute and cache the low-dim language map for a keyframe
        (slam_backend.py:537-576)."""
        if not self.lang_train or cam.gt_lang_feat is not None:
            return
        if self.lang_extractor is None:
            # No model weights loaded: supervise with zeros (keeps the
            # pipeline shape-correct; a warning is the caller's job).
            cam.gt_lang_feat = jnp.zeros(
                (self.lang_dim, 192, 192), jnp.float32
            )
            return
        code = self.lang_extractor.encode_frame(cam.image.transpose(1, 2, 0) * 255.0)
        if self.online_ae is not None:
            cam.coco_lang_feat = code.reshape(-1, code.shape[-1])
            code = self.online_ae.train_and_encode(cam.coco_lang_feat).reshape(
                192, 192, -1
            )
        cam.gt_lang_feat = jnp.transpose(code, (2, 0, 1))

    # -- mapping ------------------------------------------------------------

    def _build_slots(self, window: List[int], rand: List[int], n_slots: int,
                     lang_run: bool):
        h, w = self.frame_size
        cams = [self.viewpoints[i] for i in window + rand]
        n = len(cams)
        r = np.stack([c.r for c in cams] + [np.eye(3, dtype=np.float32)] * (n_slots - n))
        t = np.stack([c.t for c in cams] + [np.zeros(3, np.float32)] * (n_slots - n))
        ea = np.array([c.exposure_a for c in cams] + [0.0] * (n_slots - n), np.float32)
        eb = np.array([c.exposure_b for c in cams] + [0.0] * (n_slots - n), np.float32)
        zero_img = jnp.zeros((3, h, w), jnp.float32)
        zero_lang = jnp.zeros((self.lang_dim, 192, 192), jnp.float32)
        imgs = jnp.stack([c.image for c in cams] + [zero_img] * (n_slots - n))
        deps = jnp.stack(
            [jnp.asarray(c.depth)[None] for c in cams]
            + [zero_img[:1]] * (n_slots - n)
        )
        langs = jnp.stack(
            [
                c.gt_lang_feat if c.gt_lang_feat is not None else zero_lang
                for c in cams
            ]
            + [zero_lang] * (n_slots - n)
        )
        valid = np.zeros((n_slots,), bool)
        valid[:n] = True
        lang_on = np.zeros((n_slots,), bool)
        if lang_run and self.lang_train:
            lang_on[:n] = [c.gt_lang_feat is not None for c in cams]
        pose_opt = np.zeros((n_slots,), bool)
        exp_opt = np.zeros((n_slots,), bool)
        if not self.use_gt_pose:
            for i in range(min(self.pose_window, len(window))):
                if cams[i].uid != 0:
                    pose_opt[i] = True
        exp_opt[: len(window)] = True
        return (r, t, ea, eb, imgs, deps, langs, valid, lang_on, pose_opt, exp_opt)

    def map(self, window: List[int], iters: int = 1, lang_run: bool = False,
            prune: bool = False, init_mode: bool = False) -> bool:
        if not window:
            return False
        n_slots = self.window_size + 2
        rand_pool = [i for i in self.viewpoints if i not in set(window)]
        if self.lang_train and lang_run:
            for idx in window:
                self.ensure_lang_features(self.viewpoints[idx])
        if self.keyframe_optimizer_state is None or (
            self.keyframe_optimizer_state[2].shape[0] != n_slots
        ):
            self.reset_keyframe_optimizer(n_slots)
        gaussian_split = False

        for it in range(iters):
            self.iteration_count += 1
            rand = list(np.random.default_rng(self.iteration_count).permutation(
                rand_pool
            )[:2]) if rand_pool else []
            slots = self._build_slots(window, rand, n_slots, lang_run)
            (r, t, ea, eb, imgs, deps, langs, valid, lang_on, pose_opt,
             exp_opt) = slots
            pm, pv, pt = self.keyframe_optimizer_state
            (self.params, self.opt, self.aux, new_r, new_t, new_ea, new_eb,
             self.keyframe_optimizer_state, occ_vis, loss,
             raster_overflow) = mapping_iteration(
                self.params, self.opt, self.aux, self.proj,
                jnp.asarray(r), jnp.asarray(t), jnp.asarray(ea), jnp.asarray(eb),
                pm, pv, pt,
                imgs, deps, langs,
                jnp.asarray(valid), jnp.asarray(lang_on), jnp.asarray(pose_opt),
                jnp.asarray(exp_opt),
                self._lrs(), jnp.float32(self.lamda_lang),
                settings=self.settings, n_slots=n_slots, init_mode=init_mode,
            )
            if bool(raster_overflow):
                # Instance pool exhausted: grow the bucket (recompiles once)
                # — this iteration rendered truncated tails.
                self.settings = self.settings._replace(
                    max_instances=self.settings.max_instances * 2
                )
                print(f"[backend] raster instance pool grown to "
                      f"{self.settings.max_instances}")
            # Write back per-KF poses/exposures.
            new_r_h, new_t_h = np.asarray(new_r), np.asarray(new_t)
            new_ea_h, new_eb_h = np.asarray(new_ea), np.asarray(new_eb)
            for i, idx in enumerate(window + rand):
                cam = self.viewpoints[idx]
                if pose_opt[i]:
                    cam.update_rt(new_r_h[i], new_t_h[i])
                if exp_opt[i]:
                    cam.exposure_a = float(new_ea_h[i])
                    cam.exposure_b = float(new_eb_h[i])
            occ = np.asarray(occ_vis)
            for i, idx in enumerate(window):
                self.occ_aware_visibility[idx] = occ[i]

            if prune:
                self._visibility_prune(window)
                return False

            update_every = (
                self.init_gaussian_update if init_mode else self.gaussian_update_every
            )
            update_offset = 0 if init_mode else self.gaussian_update_offset
            cadence_update = (
                self.iteration_count % update_every == update_offset
            )
            if cadence_update:
                self.rng, key = jax.random.split(self.rng)
                extent = (
                    self.init_gaussian_extent if init_mode else self.gaussian_extent
                )
                th = self.init_gaussian_th if init_mode else self.gaussian_th
                size_th = None if init_mode else self.size_threshold
                self.params, self.aux, self.opt, overflow = G.densify_and_prune(
                    self.params, self.aux, self.opt, key,
                    max_grad=self.op["densify_grad_threshold"],
                    min_opacity=th, extent=extent, max_screen_size=size_th,
                    percent_dense=self.op["percent_dense"],
                )
                if bool(overflow):
                    self._grow_capacity()
                gaussian_split = True
            reset_every = self.init_gaussian_reset if init_mode else self.gaussian_reset
            if (self.iteration_count % reset_every == 0) and not cadence_update:
                if init_mode:
                    self.params, self.opt = G.reset_opacity(self.params, self.opt)
                else:
                    visible = jnp.asarray(occ.any(axis=0))
                    self.params, self.opt = G.reset_opacity_nonvisible(
                        self.params, self.opt, visible
                    )
                gaussian_split = True
        return gaussian_split

    def _visibility_prune(self, window: List[int]):
        """occ-visibility pruning at keyframe time (slam_backend.py:683-717)."""
        if len(window) != self.window_size:
            return
        occ = np.stack([self.occ_aware_visibility[i] for i in window])
        n_obs = jnp.asarray(occ.sum(axis=0))
        kf_id = self.aux.kf_id
        if self.prune_mode == "odometry":
            to_prune = n_obs < 3
        else:  # slam
            sorted_window = sorted(window, reverse=True)
            mask = kf_id >= sorted_window[2]
            to_prune = (n_obs <= 3) & mask
        to_prune = to_prune & self.aux.active
        self.aux = G.prune_only(self.params, self.aux, to_prune)
        keep = ~np.asarray(to_prune)
        for idx in window:
            self.occ_aware_visibility[idx] = (
                self.occ_aware_visibility[idx] & keep
            )

    def initialize_map(self, kf_idx: int, cam: Camera):
        if self.lang_train:
            self.ensure_lang_features(cam)
        self.map(
            [kf_idx], iters=self.init_itr_num,
            lang_run=self.lang_train, init_mode=True,
        )
        self.initialized = True

    def color_refinement(self, iterations: int = 26000):
        """Final L1+SSIM refinement over random keyframes
        (slam_backend.py:769-819)."""
        from . import refinement

        self.params, self.opt = refinement.color_refine(
            self.params, self.aux, self.viewpoints, self.proj, self.settings,
            iterations=iterations,
            lambda_dssim=self.op.get("lambda_dssim", 0.2),
        )
