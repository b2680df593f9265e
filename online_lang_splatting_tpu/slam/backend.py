"""SLAM backend: keyframe mapping, densification, language fusion.

Host-driven port of the reference BackEnd
(/root/reference/utils/slam_backend.py:44-998). The per-iteration work —
render each window/random keyframe, accumulate photometric + language +
isotropic losses, step the Gaussian Adam and the per-keyframe pose/exposure
Adam, collect visibility & densification statistics — is expressed as a
shardable per-slot core (`scan_slot_grads`) plus a replicated update tail
(`apply_mapping_updates`); gradients are computed inside each scan step so
only one render's residuals are ever live.

Production dispatch is CHUNKED (`make_mapping_chunk`): up to 16 mapping
iterations (64 during init) run device-resident per dispatch — window
poses, both Adam states and densification stats carried in a lax.scan,
random anti-forgetting frames gathered on-device from a `FrameStack`,
and the reference's densify/opacity-reset cadence events fired ON DEVICE
at their exact iterations (lax.cond inside the scan), so a chunk never
has to break at an event boundary. With a
jax.sharding Mesh, the slot axis additionally shards over the `dp` axis
(gradients psum over ICI) — the multi-chip replacement for the
reference's single-GPU backend process. `mapping_iteration` (one
iteration, one device) remains as the equivalence oracle for tests.
"""

from __future__ import annotations

import functools
import os as _os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import gaussians as G
from ..models.convnext_clip import resize_bilinear
from ..ops import lie
from ..ops.raster import RasterSettings, grow_bucket
from . import losses as L
from .camera import Camera
from .renderer import activate, render


def scan_slot_grads(
    params: G.GaussianParams,
    active,
    proj,
    slot_r, slot_t, slot_ea, slot_eb,
    images, depths, langs,
    lang_on, slot_valid_f,
    lang_weight,
    *,
    settings: RasterSettings,
    init_mode: bool,
):
    """The shardable core of one mapping iteration: lax.scan over keyframe
    slots, each step rendering + differentiating one keyframe's mapping loss
    (photometric + depth + language L1, slam_backend.py:515-597).

    Per-slot work is independent, so a data-parallel caller may shard the
    slot axis over a device mesh and combine with psum (grads, loss,
    additive stats) / pmax (max radii). Returns:
      grads      — GaussianParams tree, summed over slots
      loss       — scalar sum over slots
      per_slot   — (g_rho, g_theta, g_ea, g_eb, occ_vis, ovf), leading slot axis
      stats      — (max_radii (cap,), grad_accum_delta (cap,), denom_delta (cap,))
    """
    cap = params.xyz.shape[0]

    def kf_loss(p, rho, theta, ea, eb, m2d, r, t, image, depth, lang, l_on, valid):
        def live(args):
            (p, rho, theta, ea, eb, m2d) = args
            inputs = activate(p, active)
            view = lie.rt_to_mat4(r, t)
            out = render(
                inputs, view, proj, settings,
                cam_trans_delta=rho, cam_rot_delta=theta, means2d_offset=m2d,
            )
            loss = L.loss_mapping_rgbd(
                out.color, out.depth, image, depth, ea, eb,
                initialization=init_mode,
            )
            # Language supervision (slam_backend.py:579-597): L1 against
            # the cached low-dim map, resized to the frame.
            lang_hw = resize_bilinear(
                jnp.transpose(lang, (1, 2, 0))[None],
                (image.shape[1], image.shape[2]),
            )[0]
            l_lang = jnp.abs(
                out.language - jnp.transpose(lang_hw, (2, 0, 1))
            ).mean()
            loss = loss + lang_weight * jnp.where(l_on, l_lang, 0.0)
            return loss * valid, (
                out.radii, out.n_touched, out.overflow, out.num_instances,
            )

        def dead(args):
            # Invalid/padding slot: skip the whole render (during map init
            # the window has ONE keyframe and 11 of 12 slots are padding —
            # real control flow here is a ~12x init speedup; lax.cond
            # differentiates to zero grads for this branch).
            return jnp.float32(0.0), (
                jnp.zeros((cap,), jnp.int32), jnp.zeros((cap,), jnp.int32),
                jnp.zeros((), bool), jnp.zeros((), jnp.int32),
            )

        return jax.lax.cond(
            valid > 0, live, dead, (p, rho, theta, ea, eb, m2d)
        )

    zero_m2d = jnp.zeros((cap, 2), jnp.float32)
    zeros3 = jnp.zeros(3, jnp.float32)

    def step(carry, slot):
        grad_acc, max_radii, grad_accum, denom, loss_acc = carry
        (r, t, ea, eb, image, depth, lang, l_on, valid) = slot
        (loss, (radii, n_touched, ovf, n_inst)), grads = jax.value_and_grad(
            kf_loss, argnums=(0, 1, 2, 3, 4, 5), has_aux=True
        )(params, zeros3, zeros3, ea, eb, zero_m2d, r, t, image, depth, lang,
          l_on, valid)
        g_params, g_rho, g_theta, g_ea, g_eb, g_m2d = grads
        grad_acc = jax.tree.map(jnp.add, grad_acc, g_params)
        visible = (radii > 0) & active
        max_radii = jnp.maximum(
            max_radii, jnp.where(visible, radii.astype(jnp.float32), 0.0)
        )
        grad_accum = grad_accum + jnp.where(
            visible, jnp.linalg.norm(g_m2d, axis=-1), 0.0
        )
        denom = denom + visible.astype(jnp.float32)
        return (grad_acc, max_radii, grad_accum, denom, loss_acc + loss), (
            g_rho, g_theta, g_ea, g_eb, n_touched > 0, ovf, n_inst,
        )

    grad0 = jax.tree.map(jnp.zeros_like, params)
    zcap = jnp.zeros((cap,), jnp.float32)
    slots = (
        slot_r, slot_t, slot_ea, slot_eb, images, depths, langs,
        lang_on, slot_valid_f,
    )
    (grads, max_radii, grad_accum, denom, loss), per_slot = jax.lax.scan(
        step, (grad0, zcap, zcap, zcap, 0.0), slots
    )
    return grads, loss, per_slot, (max_radii, grad_accum, denom)


def apply_mapping_updates(
    params: G.GaussianParams,
    opt: G.AdamState,
    aux: G.GaussianAux,
    grads, stats, per_slot,
    slot_r, slot_t, slot_ea, slot_eb,
    pose_m, pose_v, pose_t,
    pose_opt, exp_opt,
    lrs: G.LearningRates,
):
    """Replicated tail of one mapping iteration: fold slot stats into aux,
    add the isotropic regularizer, step the Gaussian Adam, and step the
    per-keyframe pose/exposure Adam with SE(3) retraction."""
    g_rho, g_theta, g_ea, g_eb, occ_vis, slot_ovf, slot_demand = per_slot
    max_radii, grad_accum, denom = stats
    aux = aux._replace(
        max_radii2d=jnp.maximum(aux.max_radii2d, max_radii),
        xyz_grad_accum=aux.xyz_grad_accum + grad_accum,
        denom=aux.denom + denom,
    )

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
        occ_vis, jnp.any(slot_ovf), jnp.max(slot_demand),
    )


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
    """One mapping iteration over `n_slots` keyframe slots (single device).

    Returns (params, opt, aux, new slot poses/exposures, pose adam state,
    occ_vis (S, cap) bool, loss).
    """
    grads, loss, per_slot, stats = scan_slot_grads(
        params, aux.active, proj,
        slot_r, slot_t, slot_ea, slot_eb,
        images, depths, langs,
        lang_on, slot_valid.astype(jnp.float32),
        lang_weight, settings=settings, init_mode=init_mode,
    )
    (params, opt, aux, new_r, new_t, new_ea, new_eb, pose_state, occ_vis,
     ovf, demand) = apply_mapping_updates(
        params, opt, aux, grads, stats, per_slot,
        slot_r, slot_t, slot_ea, slot_eb,
        pose_m, pose_v, pose_t, pose_opt, exp_opt, lrs,
    )
    return (
        params, opt, aux, new_r, new_t, new_ea, new_eb,
        pose_state, occ_vis, loss, ovf, demand,
    )


@functools.lru_cache(maxsize=None)
def make_mapping_chunk(
    settings: RasterSettings,
    n_slots: int,
    n_iters: int,
    init_mode: bool,
    lr_cfg: tuple,  # (xyz_lr_init, xyz_lr_final, delay_mult, max_steps)
    mesh=None,
    cadence: tuple | None = None,
):
    """Build a jitted function running `n_iters` full mapping iterations in
    ONE device dispatch (a lax.scan over iterations, each scanning the
    keyframe slots). Between host round-trips this keeps the Gaussian Adam,
    per-keyframe pose/exposure Adam, densification stats and window poses
    device-resident, and gathers the per-iteration random anti-forgetting
    frames (slam_backend.py:606) from a device-resident frame stack instead
    of restaging them from host.

    Slot layout: the first `n_slots - 2` slots are the (fixed) keyframe
    window, the last 2 are the per-iteration random frames. With `mesh`,
    the slot axis is sharded over the mesh's dp axis per iteration
    (gradients psum, stats psum/pmax) — the multi-chip mapping path.

    With `cadence` = (update_every, update_offset, reset_every, max_grad,
    min_opacity, extent, size_threshold|None, percent_dense), the
    reference's densify/prune and opacity-reset cadence events
    (slam_backend.py:729-742) run ON DEVICE inside the iteration scan (a
    lax.cond at the exact cadence iterations), so chunks no longer break
    at event boundaries — every dispatch through the remote relay costs
    ~1-2 s of submission overhead, and event-aligned splitting used to
    quadruple the init phase's dispatch count. The jitted function then
    takes one extra trailing argument (the per-chunk RNG key; split-sample
    keys derive from it via fold_in(iteration)) and reports densify
    capacity overflow as an extra output, on which the caller grows the
    Gaussian capacity and REPLAYS the chunk.
    """
    n_win = n_slots - 2

    if mesh is not None:
        from ..parallel.mesh import sharded_slot_grads

        slot_grads = sharded_slot_grads(settings, mesh, init_mode)
    else:
        def slot_grads(params, active, proj, r, t, ea, eb, imgs, deps, lngs,
                       l_on, valid_f, lw):
            return scan_slot_grads(
                params, active, proj, r, t, ea, eb, imgs, deps, lngs,
                l_on, valid_f, lw, settings=settings, init_mode=init_mode,
            )

    def chunk(
        params, opt, aux, proj,
        win_r, win_t, win_ea, win_eb,          # (W,3,3) (W,3) (W,) (W,)
        win_imgs, win_deps, win_langs,         # (W,3,H,W) (W,1,H,W) (W,L,192,192)
        win_valid, win_lang_on,                # (W,) bool
        pose_opt, exp_opt,                     # (S,) bool (rand slots False)
        pose_m, pose_v, pose_t,
        stack_imgs, stack_deps, stack_langs, stack_lang_on,
        rand_rows, rand_valid,                 # (N,2) i32 / bool
        rand_r, rand_t, rand_ea, rand_eb,      # (N,2,...)
        iter0,                                 # scalar f32: iteration count before chunk
        fixed_lrs: G.LearningRates,
        lang_weight,
        base_key=None,                         # cadence mode only
        n_live=None,                           # dynamic live-iteration count
        events_on=None,                        # cadence mode: traced bool —
                                               # False suppresses densify/
                                               # reset events (the prune
                                               # iteration) without a
                                               # separate no-cadence program
    ):
        win_valid_f = win_valid.astype(jnp.float32)
        counts = iter0 + 1.0 + jnp.arange(n_iters, dtype=jnp.float32)
        counts_i = (
            jnp.round(iter0).astype(jnp.int32)
            + 1
            + jnp.arange(n_iters, dtype=jnp.int32)
        )
        occ0 = jnp.zeros((n_slots, params.xyz.shape[0]), bool)

        def real_body(carry, x):
            (params, opt, aux, wr, wt, wea, web, pm, pv, pt, _occ) = carry
            (rows, rvalid, rr, rt, rea, reb, count, count_i) = x
            r_imgs = jnp.take(stack_imgs, rows, axis=0)
            r_deps = jnp.take(stack_deps, rows, axis=0)
            r_langs = jnp.take(stack_langs, rows, axis=0)
            r_lang_on = jnp.take(stack_lang_on, rows) & rvalid

            slot_r = jnp.concatenate([wr, rr])
            slot_t = jnp.concatenate([wt, rt])
            slot_ea = jnp.concatenate([wea, rea])
            slot_eb = jnp.concatenate([web, reb])
            imgs = jnp.concatenate([win_imgs, r_imgs])
            deps = jnp.concatenate([win_deps, r_deps])
            lngs = jnp.concatenate([win_langs, r_langs])
            lang_on = jnp.concatenate([win_lang_on, r_lang_on])
            valid_f = jnp.concatenate(
                [win_valid_f, rvalid.astype(jnp.float32)]
            )

            lrs = fixed_lrs._replace(
                xyz=G.expon_lr(
                    count, lr_cfg[0], lr_cfg[1],
                    lr_delay_mult=lr_cfg[2], max_steps=lr_cfg[3],
                )
            )
            grads, loss, per_slot, stats = slot_grads(
                params, aux.active, proj, slot_r, slot_t, slot_ea, slot_eb,
                imgs, deps, lngs, lang_on, valid_f, lang_weight,
            )
            (params, opt, aux, new_r, new_t, new_ea, new_eb,
             (pm, pv, pt), occ_vis, ovf, demand) = apply_mapping_updates(
                params, opt, aux, grads, stats, per_slot,
                slot_r, slot_t, slot_ea, slot_eb,
                pm, pv, pt, pose_opt, exp_opt, lrs,
            )

            if cadence is not None:
                (upd_every, upd_off, rst_every, max_grad, min_op,
                 extent, size_th, pct) = cadence
                do_update = (count_i % upd_every) == upd_off
                do_reset = ((count_i % rst_every) == 0) & ~do_update
                if events_on is not None:
                    do_update = do_update & events_on
                    do_reset = do_reset & events_on
                key = jax.random.fold_in(base_key, count_i)

                def densify(operand):
                    p, o, a = operand
                    p2, a2, o2, d_ovf = G.densify_and_prune(
                        p, a, o, key, max_grad=max_grad, min_opacity=min_op,
                        extent=extent, max_screen_size=size_th,
                        percent_dense=pct,
                    )
                    return p2, o2, a2, d_ovf

                params, opt, aux, cap_ovf = jax.lax.cond(
                    do_update, densify,
                    lambda operand: (*operand, jnp.zeros((), bool)),
                    (params, opt, aux),
                )
                if init_mode:
                    def reset(operand):
                        return G.reset_opacity(*operand)
                else:
                    # Visible = seen by any live window slot THIS iteration
                    # (reference reset_opacity_nonvisible after map()).
                    visible = jnp.any(
                        occ_vis[:n_win] & win_valid[:, None], axis=0
                    )

                    def reset(operand):
                        return G.reset_opacity_nonvisible(*operand, visible)

                params, opt = jax.lax.cond(
                    do_reset, reset, lambda operand: operand, (params, opt)
                )
            else:
                cap_ovf = jnp.zeros((), bool)

            carry = (
                params, opt, aux,
                new_r[:n_win], new_t[:n_win], new_ea[:n_win], new_eb[:n_win],
                pm, pv, pt, occ_vis,
            )
            return carry, (loss, ovf, cap_ovf, demand)

        if n_live is None:
            body = real_body
        else:
            # Live-masking: ONE program (grid length n_iters) serves every
            # chunk length — partial chunks mask their tail instead of
            # compiling/loading a separate shorter program (each fresh
            # chunk program costs ~30-40 s compile / ~5-10 s cache load
            # through the remote relay). Dead steps pass the carry
            # through a lax.cond untouched.
            def body(carry, x):
                *xp, live = x

                def skip(c):
                    return c, (
                        jnp.float32(0.0),
                        jnp.zeros((), bool),
                        jnp.zeros((), bool),
                        jnp.zeros((), jnp.int32),
                    )

                return jax.lax.cond(
                    live, lambda c: real_body(c, tuple(xp)), skip, carry
                )

        carry0 = (
            params, opt, aux, win_r, win_t, win_ea, win_eb,
            pose_m, pose_v, pose_t, occ0,
        )
        xs = (rand_rows, rand_valid, rand_r, rand_t, rand_ea, rand_eb,
              counts, counts_i)
        if n_live is not None:
            xs = xs + (jnp.arange(n_iters, dtype=jnp.int32) < n_live,)
        (params, opt, aux, wr, wt, wea, web, pm, pv, pt, occ_vis), (
            losses, ovfs, cap_ovfs, demands
        ) = jax.lax.scan(body, carry0, xs)
        return (
            params, opt, aux, wr, wt, wea, web, (pm, pv, pt),
            occ_vis, losses, jnp.any(ovfs), jnp.any(cap_ovfs),
            jnp.max(demands),
        )

    return jax.jit(chunk)


class FrameStack:
    """Device-resident per-keyframe frame store (image / depth / language
    supervision), written once per keyframe. Mapping chunks gather random
    anti-forgetting frames from it on-device, so no frame is ever restaged
    through the host link after insertion (the reference keeps all
    viewpoints on-GPU the same way, slam_backend.py:187)."""

    # ONE live-masked program length per mode (partial chunks mask their
    # tail iterations — backend.map). Mapping caps at 16: a single
    # dispatch of 16 full-scale 12-slot iterations runs ~20-27 s on
    # hardware and the TPU worker kills dispatches in the minute range
    # (chunk-64 at 12 live slots ~ 109 s reproducibly crashed it). INIT
    # chunks go to 64: init has ONE live keyframe slot (~0.1 s/iteration,
    # 64 iters ~ 7 s), and each dispatch through the remote relay costs
    # ~1-2 s of submission overhead — quartering the dispatch count cuts
    # the init phase materially.
    # Env-tunable so a hardware session can re-probe after kernel-cost
    # changes (a faster render lifts the safe chunk length).
    MAP_CHUNK = int(_os.environ.get("OLS_MAP_CHUNK", "16"))
    INIT_CHUNK = int(_os.environ.get("OLS_INIT_CHUNK", "64"))

    def __init__(self, h: int, w: int, lang_dim: int, cap: int = 16,
                 lang_hw=(192, 192)):
        self.h, self.w, self.lang_dim = h, w, lang_dim
        self.cap = cap
        self.count = 0
        self.row_of: Dict[int, int] = {}
        self.images = jnp.zeros((cap, 3, h, w), jnp.float32)
        self.depths = jnp.zeros((cap, 1, h, w), jnp.float32)
        self.langs = jnp.zeros((cap, lang_dim) + tuple(lang_hw), jnp.float32)
        self.lang_on = np.zeros((cap,), bool)  # host-side flag
        self.coco_on = np.zeros((cap,), bool)
        # Two-stage mode only (lazy): per-keyframe 32-d CLIP codes cached
        # for continuous online-AE training (the reference keeps them as
        # viewpoint.coco_lang_feat, slam_backend.py:562-576).
        self.cocos = None

    def _grow(self):
        def pad(a):
            return jnp.concatenate(
                [a, jnp.zeros((self.cap,) + a.shape[1:], a.dtype)]
            )

        self.images = pad(self.images)
        self.depths = pad(self.depths)
        self.langs = pad(self.langs)
        if self.cocos is not None:
            self.cocos = pad(self.cocos)
        self.lang_on = np.concatenate(
            [self.lang_on, np.zeros((self.cap,), bool)]
        )
        self.coco_on = np.concatenate(
            [self.coco_on, np.zeros((self.cap,), bool)]
        )
        self.cap *= 2

    def add(self, kf_idx: int, image, depth) -> int:
        if kf_idx in self.row_of:
            return self.row_of[kf_idx]
        if self.count == self.cap:
            self._grow()
        row = self.count
        self.row_of[kf_idx] = row
        self.count += 1
        self.images = self.images.at[row].set(image)
        self.depths = self.depths.at[row].set(
            jnp.asarray(depth, jnp.float32)[None]
        )
        return row

    def set_lang(self, kf_idx: int, lang):
        row = self.row_of[kf_idx]
        self.langs = self.langs.at[row].set(lang)
        self.lang_on[row] = True

    def set_coco(self, kf_idx: int, codes):
        """Cache a keyframe's (N, 32) mid-dim codes for online-AE training."""
        row = self.row_of[kf_idx]
        codes = jnp.asarray(codes, jnp.float32)
        if self.cocos is None:
            self.cocos = jnp.zeros(
                (self.cap,) + codes.shape, jnp.float32
            )
        self.cocos = self.cocos.at[row].set(codes)
        self.coco_on[row] = True


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
        mesh=None,
    ):
        self.config = config
        self.settings = settings
        # Optional jax.sharding.Mesh: shard keyframe slots over the dp axis
        # (multi-chip mapping; replaces the reference's single-GPU backend
        # process, slam_backend.py:44).
        self.mesh = mesh if (mesh is not None and mesh.size > 1) else None
        self.proj = jnp.asarray(proj)
        tr = config["Training"]
        op = config["opt_params"]
        self.cap = capacity
        lang_dim = config.get("language", {}).get("lang_code_size", 15)
        self.lang_dim = lang_dim
        # Spatial size of the supervision maps — 192x192 for the reference
        # extractor (supervisedNet.py:74-81); tests may shrink it.
        fh = config.get("language", {}).get("feat_hw", 192)
        self.lang_hw = tuple(fh) if isinstance(fh, (list, tuple)) else (fh, fh)
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
        self.frame_stack: Optional[FrameStack] = None

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
        dbg = _os.environ.get("OLS_CHUNK_TIMING")
        t0 = time.time()
        self.viewpoints[kf_idx] = cam
        self.frame_size = (cam.height, cam.width)
        if self.frame_stack is None:
            self.frame_stack = FrameStack(
                cam.height, cam.width, self.lang_dim, cap=64,
                lang_hw=self.lang_hw,
            )
        self.frame_stack.add(kf_idx, cam.image, cam.depth)
        if dbg:
            t1 = time.time()
            print(f"[add_kf] stack_add={t1 - t0:.2f}s", flush=True)
        if self.lang_train and cam.gt_lang_feat is not None:
            lf = jnp.asarray(cam.gt_lang_feat)
            if lf.shape == (self.lang_dim,) + self.lang_hw:
                self.frame_stack.set_lang(kf_idx, lf)
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
        if dbg:
            jax.block_until_ready(xyz)
            t2 = time.time()
            print(f"[add_kf] backproject={t2 - t1:.2f}s", flush=True)
        self.params, self.aux, self.opt, overflow = G.extend_points(
            self.params, self.aux, self.opt,
            xyz=xyz, rgb=rgb, valid=valid, kf_id=kf_idx, point_size=point_size,
        )
        if dbg:
            overflow = jax.block_until_ready(overflow)
            print(f"[add_kf] extend={time.time() - t2:.2f}s", flush=True)
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
        if not self.lang_train:
            return
        if cam.gt_lang_feat is not None:
            if (
                self.frame_stack is not None
                and cam.uid in self.frame_stack.row_of
                and not self.frame_stack.lang_on[self.frame_stack.row_of[cam.uid]]
                and jnp.asarray(cam.gt_lang_feat).shape
                == (self.lang_dim,) + self.lang_hw
            ):
                self.frame_stack.set_lang(cam.uid, jnp.asarray(cam.gt_lang_feat))
            return
        if self.lang_extractor is None:
            # No language model weights loaded. Training language codes
            # toward zeros silently corrupts the map, so this is opt-in
            # (config: language.allow_zero_supervision) — default is to
            # leave language supervision OFF for this frame.
            if not self.config.get("language", {}).get(
                "allow_zero_supervision", False
            ):
                if not getattr(self, "_warned_no_lang_model", False):
                    self._warned_no_lang_model = True
                    print(
                        "[backend] WARNING: language_train=True but no "
                        "language model is loaded; language supervision is "
                        "DISABLED (set language.allow_zero_supervision: "
                        "true to train codes toward zeros instead)."
                    )
                return
            cam.gt_lang_feat = jnp.zeros(
                (self.lang_dim,) + self.lang_hw, jnp.float32
            )
            if (
                self.frame_stack is not None
                and cam.uid in self.frame_stack.row_of
            ):
                self.frame_stack.set_lang(cam.uid, cam.gt_lang_feat)
            return
        code = self.lang_extractor.encode_frame(cam.image.transpose(1, 2, 0) * 255.0)
        if self.online_ae is not None:
            # New-keyframe extraction trains the online codec once on the
            # fresh codes (slam_backend.py:562-572) and caches them for the
            # continuous per-iteration training replays (see _run_chunk).
            cam.coco_lang_feat = code.reshape(-1, code.shape[-1])
            code = self.online_ae.train_and_encode(cam.coco_lang_feat).reshape(
                self.lang_hw[0], self.lang_hw[1], -1
            )
        cam.gt_lang_feat = jnp.transpose(code, (2, 0, 1))
        if (
            self.frame_stack is not None
            and cam.uid in self.frame_stack.row_of
        ):
            self.frame_stack.set_lang(cam.uid, cam.gt_lang_feat)
            if self.online_ae is not None:
                self.frame_stack.set_coco(cam.uid, cam.coco_lang_feat)

    # -- mapping ------------------------------------------------------------

    def _n_slots(self, init_mode: bool = False) -> int:
        # Init maps ONE keyframe: a 4-slot layout (2 window + 2 random)
        # skips 8 dead-slot scan steps per iteration vs the full window
        # (each costs a few ms of cond/accumulator machinery x 1050 init
        # iterations).
        n = 4 if init_mode else self.window_size + 2
        if self.mesh is not None:
            # Pad to a multiple of the mesh size so slots shard evenly;
            # padding slots carry valid=False and contribute zero loss.
            d = self.mesh.size
            n = -(-n // d) * d
        return n

    def _stage_window(self, window: List[int], n_win: int, lang_run: bool):
        """Host-side window slot tensors for a chunk (constant across the
        whole map() call); frames gathered from the device frame stack."""
        stack = self.frame_stack
        cams = [self.viewpoints[i] for i in window]
        n = len(cams)
        pad = n_win - n
        rows = [stack.row_of[i] for i in window] + [0] * pad
        rows_d = jnp.asarray(rows, jnp.int32)
        win_r = np.stack(
            [c.r for c in cams] + [np.eye(3, dtype=np.float32)] * pad
        )
        win_t = np.stack([c.t for c in cams] + [np.zeros(3, np.float32)] * pad)
        win_ea = np.array(
            [c.exposure_a for c in cams] + [0.0] * pad, np.float32
        )
        win_eb = np.array(
            [c.exposure_b for c in cams] + [0.0] * pad, np.float32
        )
        win_imgs = jnp.take(stack.images, rows_d, axis=0)
        win_deps = jnp.take(stack.depths, rows_d, axis=0)
        win_langs = jnp.take(stack.langs, rows_d, axis=0)
        valid = np.zeros((n_win,), bool)
        valid[:n] = True
        lang_on = np.zeros((n_win,), bool)
        if lang_run and self.lang_train:
            lang_on[:n] = stack.lang_on[rows[:n]]
        pose_opt = np.zeros((n_win + 2,), bool)
        exp_opt = np.zeros((n_win + 2,), bool)
        if not self.use_gt_pose:
            for i in range(min(self.pose_window, n)):
                if cams[i].uid != 0:
                    pose_opt[i] = True
        exp_opt[:n] = True
        return [
            jnp.asarray(win_r), jnp.asarray(win_t),
            jnp.asarray(win_ea), jnp.asarray(win_eb),
            win_imgs, win_deps, win_langs,
            jnp.asarray(valid), jnp.asarray(lang_on),
            jnp.asarray(pose_opt), jnp.asarray(exp_opt),
            pose_opt, exp_opt,  # host mirrors (avoid per-chunk fetches)
        ]

    def _stage_rand(self, rand_pool: List[int], count0: int, n: int):
        """Per-iteration random anti-forgetting draws for a chunk: the same
        seed schedule as the per-iteration path (rng seeded by the 1-based
        iteration number), returning stack rows + poses/exposures."""
        stack = self.frame_stack
        rows = np.zeros((n, 2), np.int32)
        valid = np.zeros((n, 2), bool)
        r = np.tile(np.eye(3, dtype=np.float32), (n, 2, 1, 1))
        t = np.zeros((n, 2, 3), np.float32)
        ea = np.zeros((n, 2), np.float32)
        eb = np.zeros((n, 2), np.float32)
        draws: List[List[int]] = []
        for j in range(n):
            picks = (
                list(
                    np.random.default_rng(count0 + j + 1).permutation(
                        rand_pool
                    )[:2]
                )
                if rand_pool
                else []
            )
            draws.append(picks)
            for k, idx in enumerate(picks):
                cam = self.viewpoints[idx]
                rows[j, k] = stack.row_of[idx]
                valid[j, k] = True
                r[j, k] = cam.r
                t[j, k] = cam.t
                ea[j, k] = cam.exposure_a
                eb[j, k] = cam.exposure_b
        return (
            jnp.asarray(rows), jnp.asarray(valid),
            jnp.asarray(r), jnp.asarray(t), jnp.asarray(ea), jnp.asarray(eb),
        ), (rows, valid)

    def _cadence_cfg(self, init_mode: bool) -> tuple:
        """Static densify/reset cadence config for in-chunk events
        (slam_backend.py:729-742 hyperparameters)."""
        return (
            self.init_gaussian_update if init_mode
            else self.gaussian_update_every,
            0 if init_mode else self.gaussian_update_offset,
            self.init_gaussian_reset if init_mode else self.gaussian_reset,
            float(self.op["densify_grad_threshold"]),
            float(self.init_gaussian_th if init_mode else self.gaussian_th),
            float(
                self.init_gaussian_extent if init_mode
                else self.gaussian_extent
            ),
            None if init_mode else self.size_threshold,
            float(self.op["percent_dense"]),
        )

    def _submit_chunk(self, window, staged_window, rand_pool, n: int,
                      lang_run: bool, init_mode: bool, cadence: bool = True,
                      n_live: int | None = None):
        """Dispatch one device-resident chunk of n mapping iterations
        WITHOUT waiting for it, and OPTIMISTICALLY advance the backend
        state to the chunk's (device-future) outputs so the next chunk can
        be submitted while this one executes — the remote relay charges
        ~0.1-2 s of submission + fetch latency per dispatch, and a
        sequential loop pays it serially between chunks.

        Returns a ctx dict for `_finish_chunk`, which blocks on the
        overflow flags and either commits the host-side bookkeeping or
        (overflow) rolls back to the saved pre-chunk state refs, grows the
        bucket/capacity, and replays — no truncated-gradient or
        dropped-densify step is ever committed.

        `staged_window` is a list; its pose/exposure entries are refreshed
        in place with the chunk's outputs so the next chunk continues from
        the optimized window poses without a host round-trip."""
        dbg = _os.environ.get("OLS_CHUNK_TIMING")
        t_s0 = time.time()
        n_slots = self._n_slots(init_mode)
        rand, rand_h = self._stage_rand(rand_pool, self.iteration_count, n)
        t_s1 = time.time()
        stack = self.frame_stack
        op = self.op
        lr_cfg = (
            op["position_lr_init"], op["position_lr_final"],
            op["position_lr_delay_mult"], op["position_lr_max_steps"],
        )
        fixed = self._lrs()
        stack_lang_on = jnp.asarray(
            stack.lang_on if (lang_run and self.lang_train)
            else np.zeros_like(stack.lang_on)
        )
        # Always build the cadence program; `cadence=False` (the prune
        # iteration, slam_backend.py:683-717 — the reference never fires
        # events from it) suppresses events with the traced `events_on`
        # flag instead of compiling a separate no-cadence program per
        # bucket through the relay.
        cad = self._cadence_cfg(init_mode)
        # One key per chunk; per-event keys derive via fold_in(iteration),
        # so an overflow REPLAY reruns the identical key schedule.
        self.rng, base_key = jax.random.split(self.rng)
        ctx = dict(
            window=window, staged=staged_window, n=n, n_live=n_live,
            n_eff=n if n_live is None else n_live,
            lang_run=lang_run, init_mode=init_mode, cadence=cadence,
            n_slots=n_slots, rand=rand, rand_h=rand_h, fixed=fixed,
            lr_cfg=lr_cfg, cad=cad, base_key=base_key,
            stack_lang_on=stack_lang_on,
            count0=self.iteration_count,
            # Pre-chunk state refs: replay restarts from these.
            state_in=(self.params, self.opt, self.aux,
                      self.keyframe_optimizer_state),
            win_in=tuple(staged_window[0:4]),
            t0=time.time(),
        )
        t_s2 = time.time()
        out = self._dispatch_chunk(ctx, *ctx["state_in"], ctx["win_in"])
        ctx["t_submitted"] = time.time()
        if dbg:
            print(
                f"[submit] stage={t_s1 - t_s0:.2f}s prep={t_s2 - t_s1:.2f}s "
                f"dispatch={ctx['t_submitted'] - t_s2:.2f}s",
                flush=True,
            )
        ctx["out"] = out
        self._advance_to(ctx, out)
        return ctx

    def _dispatch_chunk(self, ctx, params, opt, aux, kf_opt, win4):
        """Build the arg tuple and dispatch the chunk program (async)."""
        staged_window = ctx["staged"]
        (_, _, _, _, win_imgs, win_deps, win_langs,
         win_valid, win_lang_on, pose_opt, exp_opt,
         _pose_opt_h, _exp_opt_h) = staged_window
        stack = self.frame_stack
        args = (
            params, opt, aux, self.proj,
            *win4,
            win_imgs, win_deps, win_langs, win_valid, win_lang_on,
            pose_opt, exp_opt,
            *kf_opt,
            stack.images, stack.depths, stack.langs, ctx["stack_lang_on"],
            *ctx["rand"],
            jnp.float32(ctx["count0"]),
            ctx["fixed"], jnp.float32(self.lamda_lang),
            ctx["base_key"],
        )
        fn = make_mapping_chunk(
            self.settings, ctx["n_slots"], ctx["n"], ctx["init_mode"],
            ctx["lr_cfg"], self.mesh, ctx["cad"]
        )
        n_live = ctx["n_live"]
        return fn(
            *args,
            n_live=jnp.int32(n_live if n_live is not None else ctx["n"]),
            events_on=jnp.bool_(ctx["cadence"]),
        )

    def _advance_to(self, ctx, out):
        """Optimistically point the backend state + staged window at the
        chunk's output refs (device futures — nothing blocks here)."""
        staged_window = ctx["staged"]
        (self.params, self.opt, self.aux, new_r, new_t, new_ea, new_eb,
         self.keyframe_optimizer_state, _occ, _losses, _ovf,
         _cap_ovf, _demand) = out
        staged_window[0], staged_window[1] = new_r, new_t
        staged_window[2], staged_window[3] = new_ea, new_eb
        self.iteration_count = ctx["count0"] + ctx["n_eff"]

    def _finish_chunk(self, ctx) -> bool:
        """Block on a submitted chunk's flags, replay on overflow, commit
        host bookkeeping. Returns True if a replay occurred (the state
        lineage changed: any chunk submitted AFTER ctx consumed discarded
        outputs and must itself be rolled back and resubmitted)."""
        dbg = _os.environ.get("OLS_CHUNK_TIMING")
        out = ctx["out"]
        replayed = False
        for _attempt in range(4):
            t_w0 = time.time()
            # ONE batched host transfer for everything the host needs from
            # the chunk (overflow flags, window poses/exposures, occ
            # visibility): each separate fetch pays a full tunnel round
            # trip (~30-300 ms), and chunks used to make six of them.
            (ovf_h, cap_ovf_h, demand_h, new_r_h, new_t_h, new_ea_h,
             new_eb_h, occ_h) = jax.device_get(
                (out[10], out[11], out[12], out[3], out[4], out[5],
                 out[6], out[8])
            )
            if dbg:
                print(
                    f"[chunk] wait_fetch={time.time() - t_w0:.2f}s "
                    f"(since submit {time.time() - ctx['t_submitted']:.2f}s)",
                    flush=True,
                )
            if (_attempt == 3) and (bool(ovf_h) or bool(cap_ovf_h)):
                # Attempt budget exhausted: do NOT grow or dispatch another
                # replay — committing a fresh replay's outputs device-side
                # while the host writeback below uses THIS attempt's fetched
                # poses/occ would skew device and host state (and growing
                # self.cap without replaying leaves self.params at the old
                # capacity shapes). Commit the last fetched (truncated)
                # result consistently; the next chunk re-detects and grows.
                import warnings

                warnings.warn(
                    "[backend] mapping chunk still overflows after 3 "
                    f"grow+replay attempts (max_instances="
                    f"{self.settings.max_instances}, capacity={self.cap}); "
                    "committing truncated result — map quality may degrade.",
                    RuntimeWarning,
                )
                break
            grew = False
            if bool(ovf_h):
                # Demand-sized growth: the chunk reports its exact peak
                # pre-truncation instance demand, so the replay lands on
                # demand x 1.25 directly instead of doubling through
                # intermediate buckets (each bucket compiles fresh chunk
                # programs through the remote relay, and every cap-sized
                # op pays for dead rows forever after).
                self.settings = self.settings._replace(
                    max_instances=grow_bucket(
                        self.settings.max_instances, int(demand_h)
                    )
                )
                grew = True
                print(f"[backend] raster instance pool grown to "
                      f"{self.settings.max_instances}; replaying chunk")
            if bool(cap_ovf_h):
                # In-chunk densify ran out of free Gaussian slots: grow the
                # capacity bucket and replay so no clone/split candidate is
                # ever dropped. Growth must compact the SAVED pre-chunk
                # state — self.* currently hold the optimistic (discarded)
                # chunk outputs.
                params0, opt0, aux0, kf0 = ctx["state_in"]
                new_cap = self.cap * 2
                params0, aux0, opt0, _n = G.compact(
                    params0, aux0, opt0, new_cap
                )
                self.cap = new_cap
                ctx["state_in"] = (params0, opt0, aux0, kf0)
                grew = True
                print(f"[backend] gaussian capacity grown to {self.cap}; "
                      "replaying chunk")
            if not grew:
                break
            # Replay from the saved pre-chunk state with the SAME base_key
            # (identical event-key schedule).
            replayed = True
            out = self._dispatch_chunk(ctx, *ctx["state_in"], ctx["win_in"])
            ctx["out"] = out
            self._advance_to(ctx, out)
        if dbg:
            print(
                f"[chunk] n={ctx['n']} live={ctx['n_eff']} "
                f"init={ctx['init_mode']} "
                f"bucket={self.settings.max_instances} cap={self.cap} "
                f"dt={time.time() - ctx['t0']:.2f}s", flush=True,
            )
        window = ctx["window"]
        t_ae0 = time.time()
        self._replay_online_ae(window, ctx["rand_h"], ctx["count0"],
                               ctx["n_eff"], ctx["lang_run"],
                               ctx["init_mode"])
        if dbg:
            print(f"[chunk] ae_replay dt={time.time() - t_ae0:.2f}s",
                  flush=True)

        # Write back window poses/exposures (host copies from the batched
        # transfer above).
        pose_opt_h, exp_opt_h = ctx["staged"][11], ctx["staged"][12]
        self._commit_window_host(window, pose_opt_h, exp_opt_h,
                                 new_r_h, new_t_h, new_ea_h, new_eb_h, occ_h)
        return replayed

    def _commit_window_host(self, window, pose_opt_h, exp_opt_h,
                            new_r_h, new_t_h, new_ea_h, new_eb_h, occ_h):
        """Write chunk-optimized window poses/exposures/visibility back to
        the host cameras — dropping any non-finite update (mirror of the
        frontend tracking guard): a keyframe whose valid pixels vanish once
        the trajectory sweeps off the mapped scene NaNs its pose grads, and
        a committed NaN here poisons the cv motion model AND every later
        mapping window that re-optimizes this keyframe (observed: 300-frame
        run, keyframes 118-134 went non-finite through this writeback while
        tracking itself first broke at frame 135). `_stage_window` re-reads
        host poses each chunk, so dropping the update self-heals the next
        chunk."""
        for i, idx in enumerate(window):
            cam = self.viewpoints[idx]
            if pose_opt_h[i]:
                if np.isfinite(new_r_h[i]).all() and np.isfinite(
                        new_t_h[i]).all():
                    cam.update_rt(new_r_h[i], new_t_h[i])
                else:
                    print(f"[backend] WARNING: non-finite mapped pose for "
                          f"keyframe {idx}; keeping previous pose",
                          flush=True)
            if exp_opt_h[i] and np.isfinite(
                    [new_ea_h[i], new_eb_h[i]]).all():
                cam.exposure_a = float(new_ea_h[i])
                cam.exposure_b = float(new_eb_h[i])
        for i, idx in enumerate(window):
            self.occ_aware_visibility[idx] = occ_h[i]

    def _run_chunk(self, window, staged_window, rand_pool, n: int,
                   lang_run: bool, init_mode: bool, cadence: bool = True,
                   n_live: int | None = None):
        """Synchronous submit + finish (the prune iteration and other
        single-chunk callers)."""
        ctx = self._submit_chunk(
            window, staged_window, rand_pool, n, lang_run, init_mode,
            cadence=cadence, n_live=n_live,
        )
        self._finish_chunk(ctx)

    def _replay_online_ae(self, window, rand_h, count0: int, n: int,
                          lang_run: bool, init_mode: bool):
        """Continuous two-stage online-AE training, replayed at chunk
        boundaries with the reference's exact step schedule
        (slam_backend.py:397-407 init: one step per 5th init iteration on
        the init keyframe's codes; :640-648 mapping: one step per random
        anti-forgetting keyframe visit, two visits per iteration). The
        chunk's iterations [count0, count0+n) are walked in order and the
        visited keyframes' cached 32-d codes are trained as one scanned
        dispatch — identical step count and data order to the reference's
        per-iteration host loop."""
        stack = self.frame_stack
        if (self.online_ae is None or not lang_run or not self.lang_train
                or stack is None or stack.cocos is None):
            return
        rows_seq: List[int] = []
        if init_mode:
            r0 = stack.row_of.get(window[0])
            if r0 is not None and stack.coco_on[r0]:
                for j in range(n):
                    it = count0 + j
                    # Iteration 0's firing already happened at extraction
                    # time (train_and_encode in ensure_lang_features).
                    if it % 5 == 0 and it != 0:
                        rows_seq.append(r0)
        else:
            # Host mirrors from _stage_rand — no device fetch (the rows
            # originated on the host; np.asarray on the device copy paid a
            # full tunnel round trip per chunk).
            rows_h, valid_h = rand_h
            for j in range(n):
                for k in range(rows_h.shape[1]):
                    r = int(rows_h[j, k])
                    if valid_h[j, k] and stack.coco_on[r]:
                        rows_seq.append(r)
        if rows_seq:
            self.online_ae.train_rows(rows_seq, stack.cocos)

    def map(self, window: List[int], iters: int = 1, lang_run: bool = False,
            prune: bool = False, init_mode: bool = False) -> bool:
        if not window:
            return False
        n_slots = self._n_slots(init_mode)
        rand_pool = [i for i in self.viewpoints if i not in set(window)]
        t_lang0 = time.time()
        if self.lang_train and lang_run:
            for idx in window:
                self.ensure_lang_features(self.viewpoints[idx])
        if _os.environ.get("OLS_CHUNK_TIMING"):
            print(f"[map] ensure_lang={time.time() - t_lang0:.2f}s",
                  flush=True)
        if self.keyframe_optimizer_state is None or (
            self.keyframe_optimizer_state[2].shape[0] != n_slots
        ):
            self.reset_keyframe_optimizer(n_slots)
        staged = self._stage_window(window, n_slots - 2, lang_run)

        if prune:
            # One iteration + occ-visibility prune (slam_backend.py:683-717).
            # events_on=False: the host path never fired events from this
            # extra iteration either. Reuses the bucket's main masked
            # program (n_live=1) — no dedicated 1-iteration program.
            n_prog = (
                FrameStack.INIT_CHUNK if init_mode else FrameStack.MAP_CHUNK
            )
            self._run_chunk(
                window, staged, rand_pool, n_prog, lang_run, init_mode,
                cadence=False, n_live=1,
            )
            self._visibility_prune(window)
            return False

        count0 = self.iteration_count
        it_done = 0
        # ONE live-masked program per (mode, bucket): full chunks run all
        # iterations live, the final partial chunk masks its tail (dead
        # scan steps pass the carry through). The old shorter-program
        # ladder cost a ~30-40 s compile / ~5-10 s relay cache load PER
        # length PER bucket.
        n_prog = (
            FrameStack.INIT_CHUNK if init_mode else FrameStack.MAP_CHUNK
        )
        # Depth-2 pipeline: submit chunk N+1 BEFORE blocking on chunk N's
        # flags, so the relay's per-dispatch submission + fetch latency
        # overlaps on-device execution. Chunk N+1 chains on N's device-
        # future outputs; the rare overflow replay invalidates the
        # optimistic submission, which is rolled back and resubmitted.
        pending = None
        while it_done < iters:
            n_live = min(n_prog, iters - it_done)
            ctx = self._submit_chunk(
                window, staged, rand_pool, n_prog, lang_run, init_mode,
                n_live=n_live,
            )
            if pending is not None and self._finish_chunk(pending):
                # pending replayed: ctx consumed discarded outputs — the
                # replay's _advance_to already restored the state lineage
                # (and the iteration count) to pending's replayed outputs;
                # resubmit ctx from there with the same rand schedule.
                self.iteration_count = ctx["count0"]
                ctx = self._submit_chunk(
                    window, staged, rand_pool, n_prog, lang_run, init_mode,
                    n_live=n_live,
                )
            pending = ctx
            it_done += n_live
        if pending is not None:
            self._finish_chunk(pending)
        # Cadence events ran ON DEVICE inside the chunks; report whether any
        # densify iteration fell inside this call (host-deterministic).
        update_every = (
            self.init_gaussian_update if init_mode
            else self.gaussian_update_every
        )
        update_offset = 0 if init_mode else self.gaussian_update_offset
        gaussian_split = any(
            k % update_every == update_offset
            for k in range(count0 + 1, self.iteration_count + 1)
        )
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
            frame_stack=self.frame_stack,
        )
