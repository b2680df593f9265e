"""Tiled (Pallas) rasterizer vs. the dense oracle: forward + gradient parity.

Runs in Pallas interpreter mode on CPU (the kernel auto-detects platform).
The BASELINE config-#3 requirement — single-frame fwd/bwd parity of
RGB + depth + language channels — is exercised here on randomized scenes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import random_scene
from online_lang_splatting_tpu.ops.raster import rasterize


def _both(scene, **kw):
    outs = {}
    for backend in ("oracle", "tpu"):
        settings = scene["settings"]._replace(backend=backend)
        outs[backend] = rasterize(
            scene["means3d"], scene["opacities"], scene["scales"], scene["quats"],
            shs=scene["shs"], language_features=scene["language_features"],
            viewmatrix=scene["viewmatrix"], projmatrix=scene["projmatrix"],
            settings=settings, **kw,
        )
    return outs["oracle"], outs["tpu"]


@pytest.mark.parametrize("seed,n,w,h,tile", [
    (0, 64, 64, 48, 16),
    (1, 200, 80, 56, 16),
    (2, 64, 50, 34, 15),   # reference tile size + ragged edges
    (3, 32, 33, 17, 16),   # heavy edge padding
])
def test_forward_parity(seed, n, w, h, tile):
    scene = random_scene(n=n, width=w, height=h, seed=seed, tile=tile)
    bg = jnp.array([0.2, 0.4, 0.6])
    ref, tpu = _both(scene, bg=bg)
    np.testing.assert_allclose(tpu.color, ref.color, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(tpu.language, ref.language, atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(tpu.depth, ref.depth, atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(tpu.opacity, ref.opacity, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(tpu.final_t, ref.final_t, atol=2e-5, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(tpu.radii), np.asarray(ref.radii))
    np.testing.assert_array_equal(
        np.asarray(tpu.n_touched), np.asarray(ref.n_touched)
    )
    np.testing.assert_array_equal(
        np.asarray(tpu.n_contrib), np.asarray(ref.n_contrib)
    )


def test_saturated_scene_parity():
    """Early-stop path: dense opaque stack triggers the T<1e-4 cutoff."""
    scene = random_scene(
        n=256, width=32, height=32, seed=5, spread=0.2,
        scale_range=(0.2, 0.5), depth_range=(2.0, 3.0),
    )
    # Push opacities high to saturate.
    scene["opacities"] = jnp.full_like(scene["opacities"], 0.97)
    ref, tpu = _both(scene)
    assert float(ref.final_t.min()) < 2e-4  # cutoff actually reached
    np.testing.assert_allclose(tpu.color, ref.color, atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(tpu.final_t, ref.final_t, atol=1e-6, rtol=1e-3)
    np.testing.assert_array_equal(
        np.asarray(tpu.n_touched), np.asarray(ref.n_touched)
    )
    np.testing.assert_array_equal(
        np.asarray(tpu.n_contrib), np.asarray(ref.n_contrib)
    )


@pytest.mark.parametrize("wrt", ["means", "scales", "opacity", "lang", "pose"])
def test_gradient_parity(wrt):
    scene = random_scene(n=48, width=48, height=32, seed=7, lang_dim=8)
    bg = jnp.array([0.3, 0.1, 0.5])
    gw = jnp.asarray(np.random.default_rng(0).normal(size=(8,)), dtype=jnp.float32)

    def loss(backend, means, scales, opac, lang, rho, theta):
        settings = scene["settings"]._replace(backend=backend)
        out = rasterize(
            means, opac, scales, scene["quats"], shs=scene["shs"],
            language_features=lang, viewmatrix=scene["viewmatrix"],
            projmatrix=scene["projmatrix"], settings=settings, bg=bg,
            cam_trans_delta=rho, cam_rot_delta=theta,
        )
        return (
            jnp.abs(out.color).sum()
            + (out.language * gw[:, None, None]).sum()
            + 1.7 * out.depth.sum()
            + 0.9 * out.opacity.sum()
        )

    argnum = {"means": 1, "scales": 2, "opacity": 3, "lang": 4, "pose": 5}[wrt]
    args = (
        scene["means3d"], scene["scales"], scene["opacities"],
        scene["language_features"], jnp.zeros(3), jnp.zeros(3),
    )
    if wrt == "pose":
        g_ref = jax.grad(lambda *a: loss("oracle", *a), argnums=(4, 5))(*args)
        g_tpu = jax.grad(lambda *a: loss("tpu", *a), argnums=(4, 5))(*args)
        for gr, gt in zip(g_ref, g_tpu):
            np.testing.assert_allclose(gt, gr, atol=1e-3, rtol=1e-3)
    else:
        g_ref = jax.grad(lambda *a: loss("oracle", *a), argnums=argnum)(*args)
        g_tpu = jax.grad(lambda *a: loss("tpu", *a), argnums=argnum)(*args)
        scale = np.abs(np.asarray(g_ref)).max() + 1e-8
        np.testing.assert_allclose(
            np.asarray(g_tpu) / scale, np.asarray(g_ref) / scale,
            atol=2e-5, rtol=1e-3,
        )


def test_emission_grad_reduce_parity():
    """The emission-order gradient reduction (permutation scatter-set +
    segmented scan) must match the scatter-add baseline and the oracle:
    same forward outputs, same n_touched, near-identical grads."""
    scene = random_scene(n=120, width=64, height=48, seed=11, lang_dim=8)
    bg = jnp.array([0.3, 0.1, 0.5])
    gw = jnp.asarray(
        np.random.default_rng(0).normal(size=(8,)), dtype=jnp.float32
    )

    def loss(settings, means, scales, opac, lang, rho, theta):
        out = rasterize(
            means, opac, scales, scene["quats"], shs=scene["shs"],
            language_features=lang, viewmatrix=scene["viewmatrix"],
            projmatrix=scene["projmatrix"], settings=settings, bg=bg,
            cam_trans_delta=rho, cam_rot_delta=theta,
        )
        val = (
            jnp.abs(out.color).sum()
            + (out.language * gw[:, None, None]).sum()
            + 1.7 * out.depth.sum()
            + 0.9 * out.opacity.sum()
        )
        return val, out

    args = (
        scene["means3d"], scene["scales"], scene["opacities"],
        scene["language_features"], jnp.zeros(3), jnp.zeros(3),
    )
    grads, outs = {}, {}
    for mode in ("scatter", "emission", "oracle"):
        if mode == "oracle":
            st = scene["settings"]._replace(backend="oracle")
        else:
            st = scene["settings"]._replace(backend="tpu", grad_reduce=mode)
        grads[mode], outs[mode] = jax.grad(
            lambda *a: loss(st, *a), argnums=(0, 1, 2, 3, 4, 5),
            has_aux=True,
        )(*args)

    # Forward path is untouched by the reduction choice: bit-identical.
    np.testing.assert_array_equal(
        np.asarray(outs["emission"].color), np.asarray(outs["scatter"].color)
    )
    np.testing.assert_array_equal(
        np.asarray(outs["emission"].n_touched),
        np.asarray(outs["scatter"].n_touched),
    )
    for ge, gs, go in zip(grads["emission"], grads["scatter"],
                          grads["oracle"]):
        scale = np.abs(np.asarray(go)).max() + 1e-8
        # vs the scatter baseline: only f32 summation order differs.
        np.testing.assert_allclose(
            np.asarray(ge) / scale, np.asarray(gs) / scale, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(ge) / scale, np.asarray(go) / scale,
            atol=2e-5, rtol=1e-3,
        )


def test_stats_off_render_parity():
    """stats=False (tracking-loop renders) must leave every consumed
    output and all gradients bit-identical, with n_touched/n_contrib
    coming back zero."""
    scene = random_scene(n=96, width=64, height=48, seed=13, lang_dim=4)
    bg = jnp.array([0.1, 0.2, 0.3])

    def loss(settings, means, rho, theta):
        out = rasterize(
            means, scene["opacities"], scene["scales"], scene["quats"],
            shs=scene["shs"], language_features=scene["language_features"],
            viewmatrix=scene["viewmatrix"], projmatrix=scene["projmatrix"],
            settings=settings, bg=bg, cam_trans_delta=rho,
            cam_rot_delta=theta,
        )
        return (
            jnp.abs(out.color).sum() + 1.3 * out.depth.sum()
            + 0.7 * out.opacity.sum()
        ), out

    args = (scene["means3d"], jnp.zeros(3), jnp.zeros(3))
    res = {}
    for stats in (True, False):
        st = scene["settings"]._replace(backend="tpu", stats=stats)
        res[stats] = jax.grad(
            lambda *a: loss(st, *a), argnums=(0, 1, 2), has_aux=True
        )(*args)
    (g_on, out_on), (g_off, out_off) = res[True], res[False]
    for a, b in zip(g_on, g_off):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for field in ("color", "depth", "opacity", "final_t"):
        np.testing.assert_array_equal(
            np.asarray(getattr(out_on, field)),
            np.asarray(getattr(out_off, field)),
        )
    assert int(np.asarray(out_on.n_touched).sum()) > 0
    np.testing.assert_array_equal(np.asarray(out_off.n_touched), 0)
    np.testing.assert_array_equal(np.asarray(out_off.n_contrib), 0)


def test_emission_segment_sum_truncated_gaussian_is_zero():
    """Under instance-capacity overflow, a Gaussian whose instances were
    ALL truncated (emit_start >= cap) must get zero grads — not the
    straddling Gaussian's partial sum at x[cap-1]."""
    from online_lang_splatting_tpu.ops.raster.tiled import (
        _emission_segment_sum,
    )

    cap = 8
    rows = jnp.arange(cap, dtype=jnp.float32).reshape(cap, 1) + 1.0
    s_emit = jnp.arange(cap, dtype=jnp.int32)  # identity permutation
    emit_start = jnp.array([0, 6, 12], jnp.int32)
    emit_count = jnp.array([6, 6, 4], jnp.int32)
    out = np.asarray(
        _emission_segment_sum(rows, s_emit, emit_start, emit_count, 3, 16)
    )
    np.testing.assert_allclose(out[:, 0], [21.0, 15.0, 0.0])


def test_overflow_flag():
    from online_lang_splatting_tpu.ops.raster.binning import bin_gaussians
    from online_lang_splatting_tpu.ops.raster.preprocess import preprocess

    scene = random_scene(n=64, width=64, height=48, seed=0)
    view, proj = scene["viewmatrix"], scene["projmatrix"]
    st = scene["settings"]
    prep = preprocess(
        scene["means3d"], scene["scales"], scene["quats"], scene["opacities"],
        view, proj @ view, -view[:3, :3].T @ view[:3, 3], shs=scene["shs"],
        sh_degree=0, width=st.image_width, height=st.image_height,
        tan_fovx=st.tanfovx, tan_fovy=st.tanfovy,
    )
    b_small = bin_gaussians(prep, tiles_x=4, tiles_y=3, max_instances=128)
    assert bool(b_small.overflow)
    b_big = bin_gaussians(prep, tiles_x=4, tiles_y=3, max_instances=1 << 14)
    assert not bool(b_big.overflow)
    assert int(b_big.num_instances) == int(prep.tiles_touched.sum())


def test_dynamic_jump_carry_parity():
    """OLS_BIN_DYN's while_loop jump-carry must be value-identical to the
    static pass ladder on real expansion data (small and huge splats, a
    tight cap with real truncation, live padding tail)."""
    from online_lang_splatting_tpu.ops.raster import binning as BN
    from online_lang_splatting_tpu.ops.raster.preprocess import preprocess

    for seed, scale_range, cap, chunk in [
        (0, (0.05, 0.3), 1 << 13, 256),
        (1, (0.3, 1.2), 1 << 13, 256),   # long runs: big splats
        (2, (0.05, 0.3), 1 << 9, 64),    # capacity truncation
    ]:
        scene = random_scene(
            n=96, width=80, height=56, seed=seed, scale_range=scale_range
        )
        view, proj = scene["viewmatrix"], scene["projmatrix"]
        st = scene["settings"]
        prep = preprocess(
            scene["means3d"], scene["scales"], scene["quats"],
            scene["opacities"], view, proj @ view,
            -view[:3, :3].T @ view[:3, 3], shs=scene["shs"], sh_degree=0,
            width=st.image_width, height=st.image_height,
            tan_fovx=st.tanfovx, tan_fovy=st.tanfovy,
        )
        tiles_x = (st.image_width + 15) // 16
        tiles_y = (st.image_height + 15) // 16
        num_tiles = tiles_x * tiles_y
        gtab, tt, off, total, _ = BN._depth_tables(prep, cap)
        vals = BN._expand_scatter(gtab, tt, off, cap)
        static = BN._jump_carry(vals, min(cap, num_tiles))
        dyn = BN._jump_carry(vals, min(cap, num_tiles), jnp.max(tt))
        # Compare only live slots: the padding tail past `total` is
        # unspecified (every consumer masks it with inst < total).
        live = (np.arange(cap) < int(total))[None, :]
        np.testing.assert_array_equal(
            np.asarray(static)[np.broadcast_to(live, static.shape)],
            np.asarray(dyn)[np.broadcast_to(live, dyn.shape)],
        )

        # End-to-end: the full sorted binning under both modes.
        b_static = BN.bin_gaussians_sorted(
            prep, tiles_x=tiles_x, tiles_y=tiles_y, max_instances=cap,
            chunk=chunk,
        )
        orig = BN.C.BIN_DYN
        BN.C.BIN_DYN = True
        try:
            b_dyn = BN.bin_gaussians_sorted(
                prep, tiles_x=tiles_x, tiles_y=tiles_y, max_instances=cap,
                chunk=chunk,
            )
        finally:
            BN.C.BIN_DYN = orig
        for name in ("s_gid", "s_tile", "starts", "tile_counts", "cont",
                     "num_instances", "overflow"):
            np.testing.assert_array_equal(
                np.asarray(getattr(b_static, name)),
                np.asarray(getattr(b_dyn, name)), err_msg=name,
            )
