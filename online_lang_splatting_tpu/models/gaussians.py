"""Gaussian map: fixed-capacity SoA pytree + masked Adam + densification.

TPU-native re-design of the reference `GaussianModel`
(/root/reference/gaussian_splatting/scene/gaussian_model.py:34-969).
Instead of torch Parameters that are concatenated/pruned (dynamic shapes),
the map lives in **fixed-capacity arrays with an active mask**; growth
(keyframe extension, clone, split) allocates free slots with static-shape
scatter ops, pruning just clears mask bits, and every structural edit
performs the reference's optimizer-state surgery by zeroing the Adam
moments of (re)allocated slots on device. Capacity is bucketed: the host
driver re-jits with a larger capacity when occupancy crosses a threshold.

Activations match the reference: exp(scaling), sigmoid(opacity),
normalized quaternion, raw language codes. The Adam uses eps=1e-15 and
per-group learning rates (position LR on an exponential decay schedule,
general_utils.py:79-94).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import sh as sh_ops
from ..ops.knn import knn_mean_sq_dist
from ..ops.raster.preprocess import quat_to_rotmat


class GaussianParams(NamedTuple):
    """Raw (pre-activation) optimizable parameters; leaves shaped (cap, ...)."""

    xyz: jax.Array            # (N, 3)
    features_dc: jax.Array    # (N, 1, 3)
    features_rest: jax.Array  # (N, K-1, 3)
    scaling: jax.Array        # (N, 3) log-scale
    rotation: jax.Array       # (N, 4) unnormalized quaternion
    opacity: jax.Array        # (N, 1) logit
    language: jax.Array       # (N, L) language code


class GaussianAux(NamedTuple):
    """Non-differentiable per-slot state."""

    active: jax.Array          # (N,) bool
    max_radii2d: jax.Array     # (N,) f32
    xyz_grad_accum: jax.Array  # (N,) f32
    denom: jax.Array           # (N,) f32
    kf_id: jax.Array           # (N,) int32
    n_obs: jax.Array           # (N,) int32


class AdamState(NamedTuple):
    mu: GaussianParams
    nu: GaussianParams
    count: jax.Array  # () int32


class LearningRates(NamedTuple):
    xyz: jax.Array
    features_dc: jax.Array
    features_rest: jax.Array
    scaling: jax.Array
    rotation: jax.Array
    opacity: jax.Array
    language: jax.Array


# ---------------------------------------------------------------------------
# Construction


def empty_params(capacity: int, sh_degree: int, lang_dim: int) -> GaussianParams:
    k = (sh_degree + 1) ** 2
    f32 = jnp.float32
    return GaussianParams(
        xyz=jnp.zeros((capacity, 3), f32),
        features_dc=jnp.zeros((capacity, 1, 3), f32),
        features_rest=jnp.zeros((capacity, k - 1, 3), f32),
        scaling=jnp.zeros((capacity, 3), f32),
        rotation=jnp.zeros((capacity, 4), f32).at[:, 0].set(1.0),
        opacity=jnp.full((capacity, 1), -9.21, f32),  # sigmoid ~ 1e-4
        language=jnp.zeros((capacity, lang_dim), f32),
    )


def empty_aux(capacity: int) -> GaussianAux:
    return GaussianAux(
        active=jnp.zeros((capacity,), bool),
        max_radii2d=jnp.zeros((capacity,), jnp.float32),
        xyz_grad_accum=jnp.zeros((capacity,), jnp.float32),
        denom=jnp.zeros((capacity,), jnp.float32),
        kf_id=jnp.full((capacity,), -1, jnp.int32),
        n_obs=jnp.zeros((capacity,), jnp.int32),
    )


def init_adam(params: GaussianParams) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=zeros, count=jnp.zeros((), jnp.int32))


# ---------------------------------------------------------------------------
# Activations (reference gaussian_model.py:67-72)


def get_scaling(p: GaussianParams) -> jax.Array:
    return jnp.exp(p.scaling)


def get_opacity(p: GaussianParams, aux: GaussianAux) -> jax.Array:
    return jax.nn.sigmoid(p.opacity[:, 0]) * aux.active


def get_rotation(p: GaussianParams) -> jax.Array:
    return p.rotation / jnp.linalg.norm(p.rotation, axis=-1, keepdims=True)


def get_features(p: GaussianParams) -> jax.Array:
    return jnp.concatenate([p.features_dc, p.features_rest], axis=1)


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


# ---------------------------------------------------------------------------
# Adam with per-group LRs and slot surgery


def adam_step(
    params: GaussianParams,
    grads: GaussianParams,
    state: AdamState,
    lrs: LearningRates,
    active: jax.Array,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-15,
):
    """One masked Adam step. Inactive slots are frozen entirely."""
    count = state.count + 1
    c1 = 1.0 - b1 ** count.astype(jnp.float32)
    c2 = 1.0 - b2 ** count.astype(jnp.float32)

    def upd(p, g, mu, nu, lr):
        mask = active.reshape((-1,) + (1,) * (p.ndim - 1))
        g = jnp.where(mask, g, 0.0)
        mu = b1 * mu + (1 - b1) * g
        nu = b2 * nu + (1 - b2) * g * g
        step = lr * (mu / c1) / (jnp.sqrt(nu / c2) + eps)
        return jnp.where(mask, p - step, p), mu, nu

    ps, mus, nus = [], [], []
    for p, g, mu, nu, lr in zip(params, grads, state.mu, state.nu, lrs):
        np_, nmu, nnu = upd(p, g, mu, nu, lr)
        ps.append(np_)
        mus.append(nmu)
        nus.append(nnu)
    return GaussianParams(*ps), AdamState(
        mu=GaussianParams(*mus), nu=GaussianParams(*nus), count=count
    )


def expon_lr(
    step: jax.Array,
    lr_init: float,
    lr_final: float,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
    max_steps: int = 1000000,
) -> jax.Array:
    """Log-linear LR interpolation with optional delayed warmup
    (reference utils/general_utils.py get_expon_lr_func)."""
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1)
        )
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0, 1)
    log_lerp = jnp.exp(
        jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t
    )
    return delay_rate * log_lerp


# ---------------------------------------------------------------------------
# Structural edits (all static-shape, on-device)


def _alloc_slots(active: jax.Array, want: jax.Array, max_new: int):
    """Assign up to max_new free slot indices to the `want` candidates.

    want: (M,) bool — which of M candidates need a slot. Returns
    (slot_idx (M,) int32, ok (M,) bool). Candidates that did not get a
    slot (ok=False) carry the out-of-bounds index `capacity`, so scatters
    with mode="drop" discard them without clobbering live slots.
    """
    cap = active.shape[0]
    free_idx = jnp.nonzero(~active, size=max_new, fill_value=cap)[0]
    rank = jnp.cumsum(want.astype(jnp.int32)) - 1  # allocation order
    slot = free_idx[jnp.clip(rank, 0, max_new - 1)]
    ok = want & (rank < max_new) & (slot < cap)
    return jnp.where(ok, slot, cap).astype(jnp.int32), ok


def _scatter_params(params: GaussianParams, new: GaussianParams, slots, ok):
    del ok  # encoded in slots: not-ok rows carry an OOB index
    return jax.tree.map(
        lambda dst, src: dst.at[slots].set(src, mode="drop"), params, new
    )


def _zero_moments(state: AdamState, slots, ok) -> AdamState:
    del ok
    def z(m):
        return m.at[slots].set(jnp.zeros_like(m[0]), mode="drop")

    return AdamState(
        mu=jax.tree.map(z, state.mu), nu=jax.tree.map(z, state.nu),
        count=state.count,
    )


def extend_points(
    params: GaussianParams,
    aux: GaussianAux,
    opt: AdamState,
    *,
    xyz: jax.Array,         # (M, 3)
    rgb: jax.Array,         # (M, 3)
    valid: jax.Array,       # (M,) bool
    kf_id,
    point_size: float = 1.0,
    init_opacity: float = 0.5,
):
    """Keyframe extension: back-projected points become fresh Gaussians
    (reference extend_from_pcd_seq → create_pcd_from_image_and_depth:
    SH-DC from RGB, scale from 3-NN mean squared distance, identity
    rotation, opacity 0.5, zero language code).

    Jit-wrapped as ONE program: run eagerly, the blocked exact 3-NN
    alone dispatches hundreds of small ops — ~26-36 s per keyframe
    through the remote TPU relay (round-4 [add_kf] instrumentation).
    kf_id/point_size ride as traced arrays so per-keyframe values don't
    bake into per-keyframe recompiles (adaptive_pointsize changes
    point_size every keyframe)."""
    return _extend_points_jit(
        params, aux, opt, xyz, rgb, valid,
        jnp.asarray(kf_id, jnp.int32),
        jnp.asarray(point_size, jnp.float32),
        float(init_opacity),
    )


@functools.partial(jax.jit, static_argnums=(8,))
def _extend_points_jit(params, aux, opt, xyz, rgb, valid, kf_id,
                       point_size, init_opacity=0.5):
    m = xyz.shape[0]
    dist2 = jnp.maximum(knn_mean_sq_dist(xyz, valid), 1e-7) * point_size
    log_scale = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)
    k_rest = params.features_rest.shape[1]
    new = GaussianParams(
        xyz=xyz,
        features_dc=sh_ops.rgb_to_sh(rgb)[:, None, :],
        features_rest=jnp.zeros((m, k_rest, 3), jnp.float32),
        scaling=log_scale,
        rotation=jnp.zeros((m, 4), jnp.float32).at[:, 0].set(1.0),
        opacity=jnp.full(
            (m, 1), math.log(init_opacity / (1.0 - init_opacity)),
            jnp.float32,
        ),
        language=jnp.zeros((m, params.language.shape[1]), jnp.float32),
    )
    slots, ok = _alloc_slots(aux.active, valid, m)
    params = _scatter_params(params, new, slots, ok)
    opt = _zero_moments(opt, slots, ok)
    aux = aux._replace(
        active=aux.active.at[slots].set(True, mode="drop"),
        kf_id=aux.kf_id.at[slots].set(jnp.int32(kf_id), mode="drop"),
        n_obs=aux.n_obs.at[slots].set(0, mode="drop"),
        max_radii2d=aux.max_radii2d.at[slots].set(0.0, mode="drop"),
        xyz_grad_accum=aux.xyz_grad_accum.at[slots].set(0.0, mode="drop"),
        denom=aux.denom.at[slots].set(0.0, mode="drop"),
    )
    overflow = jnp.sum(valid) > jnp.sum(ok)
    return params, aux, opt, overflow


def add_densification_stats(aux: GaussianAux, means2d_grad, update_filter):
    """Accumulate screen-space position gradient norms (reference
    add_densification_stats)."""
    norm = jnp.linalg.norm(means2d_grad[:, :2], axis=-1)
    upd = update_filter & aux.active
    return aux._replace(
        xyz_grad_accum=aux.xyz_grad_accum + jnp.where(upd, norm, 0.0),
        denom=aux.denom + upd.astype(jnp.float32),
    )


def update_max_radii(aux: GaussianAux, radii, visibility):
    return aux._replace(
        max_radii2d=jnp.where(
            visibility & aux.active,
            jnp.maximum(aux.max_radii2d, radii.astype(jnp.float32)),
            aux.max_radii2d,
        )
    )


def densify_and_prune(
    params: GaussianParams,
    aux: GaussianAux,
    opt: AdamState,
    rng: jax.Array,
    *,
    max_grad: float,
    min_opacity: float,
    extent: float,
    max_screen_size: int | None,
    percent_dense: float = 0.01,
    max_new: int = 8192,
):
    """Clone + split + prune, all masked/static (reference densify_and_prune).

    Order matches the reference: clone small high-grad Gaussians, split
    large high-grad ones (N=2, sampled offsets, scales / (0.8·2), original
    pruned), then prune by min opacity / screen size / world size.
    """
    grads = aux.xyz_grad_accum / jnp.maximum(aux.denom, 1e-12)
    grads = jnp.where(jnp.isnan(grads) | ~aux.active, 0.0, grads)
    scal = get_scaling(params)
    max_scale = jnp.max(scal, axis=1)

    # Clone.
    clone_mask = (grads >= max_grad) & (max_scale <= percent_dense * extent) & aux.active
    slots, ok = _alloc_slots(aux.active, clone_mask, max_new)
    # Candidate i is Gaussian i itself; copy its row into the new slot.
    params = _scatter_params(params, params, slots, ok)
    opt = _zero_moments(opt, slots, ok)
    aux = aux._replace(
        active=aux.active.at[slots].set(True, mode="drop"),
        kf_id=aux.kf_id.at[slots].set(aux.kf_id, mode="drop"),
        n_obs=aux.n_obs.at[slots].set(aux.n_obs, mode="drop"),
    )

    # Split (N=2: one new sample replaces the original in place, one goes
    # to a fresh slot; both receive sampled offsets and shrunken scales).
    split_mask = (grads >= max_grad) & (max_scale > percent_dense * extent) & aux.active
    k1, k2 = jax.random.split(rng)
    rot = quat_to_rotmat(get_rotation(params))

    def sampled(key):
        eps = jax.random.normal(key, params.xyz.shape) * scal
        return params.xyz + jnp.einsum("nij,nj->ni", rot, eps)

    new_scaling = jnp.log(scal / (0.8 * 2.0))
    split_a = params._replace(xyz=sampled(k1), scaling=new_scaling)
    split_b = params._replace(xyz=sampled(k2), scaling=new_scaling)
    slots2, ok2 = _alloc_slots(aux.active, split_mask, max_new)
    params = _scatter_params(params, split_b, slots2, ok2)
    opt = _zero_moments(opt, slots2, ok2)
    aux = aux._replace(
        active=aux.active.at[slots2].set(True, mode="drop"),
        kf_id=aux.kf_id.at[slots2].set(aux.kf_id, mode="drop"),
        n_obs=aux.n_obs.at[slots2].set(aux.n_obs, mode="drop"),
    )
    # In-place replacement of split originals (only those whose sibling got
    # a slot, so a failed allocation never destroys the original).
    repl = split_mask & ok2
    params = jax.tree.map(
        lambda dst, src_: jnp.where(
            repl.reshape((-1,) + (1,) * (dst.ndim - 1)), src_, dst
        ),
        params, split_a,
    )
    opt = AdamState(
        mu=jax.tree.map(
            lambda m: jnp.where(repl.reshape((-1,) + (1,) * (m.ndim - 1)), 0.0, m),
            opt.mu,
        ),
        nu=jax.tree.map(
            lambda m: jnp.where(repl.reshape((-1,) + (1,) * (m.ndim - 1)), 0.0, m),
            opt.nu,
        ),
        count=opt.count,
    )

    # Prune.
    prune = jax.nn.sigmoid(params.opacity[:, 0]) < min_opacity
    if max_screen_size is not None:
        prune = prune | (aux.max_radii2d > max_screen_size)
        prune = prune | (jnp.max(get_scaling(params), axis=1) > 0.1 * extent)
    aux = aux._replace(
        active=aux.active & ~prune,
        xyz_grad_accum=jnp.zeros_like(aux.xyz_grad_accum),
        denom=jnp.zeros_like(aux.denom),
        max_radii2d=jnp.zeros_like(aux.max_radii2d),
    )
    overflow = (jnp.sum(clone_mask) > jnp.sum(ok)) | (jnp.sum(split_mask) > jnp.sum(ok2))
    return params, aux, opt, overflow


def prune_only(
    params: GaussianParams, aux: GaussianAux, mask: jax.Array
) -> GaussianAux:
    return aux._replace(active=aux.active & ~mask)


def reset_opacity(params: GaussianParams, opt: AdamState, value: float = 0.01):
    """Set every opacity to `value` and zero its Adam moments (reference
    reset_opacity + replace_tensor_to_optimizer)."""
    # Python-math constant (not jnp) so this stays trace-safe inside the
    # mapping chunk's on-device cadence (lax.cond under jit).
    params = params._replace(
        opacity=jnp.full_like(
            params.opacity, math.log(value / (1.0 - value))
        )
    )
    opt = AdamState(
        mu=opt.mu._replace(opacity=jnp.zeros_like(opt.mu.opacity)),
        nu=opt.nu._replace(opacity=jnp.zeros_like(opt.nu.opacity)),
        count=opt.count,
    )
    return params, opt


def reset_opacity_nonvisible(
    params: GaussianParams, opt: AdamState, visible: jax.Array, value: float = 0.4
):
    """Reset opacity of non-visible Gaussians only (reference
    reset_opacity_nonvisible)."""
    target = math.log(value / (1.0 - value))  # trace-safe constant
    new_op = jnp.where(visible[:, None], params.opacity, target)
    params = params._replace(opacity=new_op)
    opt = AdamState(
        mu=opt.mu._replace(opacity=jnp.zeros_like(opt.mu.opacity)),
        nu=opt.nu._replace(opacity=jnp.zeros_like(opt.nu.opacity)),
        count=opt.count,
    )
    return params, opt


def compact(params: GaussianParams, aux: GaussianAux, opt: AdamState,
            new_capacity: int):
    """Host-side recompaction/rebucketing: pack active slots to the front
    of arrays of `new_capacity`. Returns (params, aux, opt, n_active)."""
    active = np.asarray(aux.active)
    idx = np.nonzero(active)[0]
    n = len(idx)
    assert n <= new_capacity, f"{n} active > capacity {new_capacity}"

    def pack(arr, fill=0.0):
        a = np.asarray(arr)
        out = np.full((new_capacity,) + a.shape[1:], fill, a.dtype)
        out[:n] = a[idx]
        return jnp.asarray(out)

    params = GaussianParams(*(pack(v) for v in params))
    opt = AdamState(
        mu=GaussianParams(*(pack(v) for v in opt.mu)),
        nu=GaussianParams(*(pack(v) for v in opt.nu)),
        count=opt.count,
    )
    aux = GaussianAux(
        active=pack(aux.active, False),
        max_radii2d=pack(aux.max_radii2d),
        xyz_grad_accum=pack(aux.xyz_grad_accum),
        denom=pack(aux.denom),
        kf_id=pack(aux.kf_id, -1),
        n_obs=pack(aux.n_obs),
    )
    return params, aux, opt, n
