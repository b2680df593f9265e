"""Tile-sharded (band-parallel) render equivalence on the 8-device CPU
mesh: each chip blends a band of tile rows; outputs and gradients must
match the single-device Pallas path (VERDICT r2 #6)."""

import numpy as np

import jax
import jax.numpy as jnp

from online_lang_splatting_tpu.ops import graphics
from online_lang_splatting_tpu.ops.raster import RasterSettings
from online_lang_splatting_tpu.parallel.mesh import make_mesh
from online_lang_splatting_tpu.parallel.tile_shard import (
    make_banded_render, make_banded_tracking_run,
)
from online_lang_splatting_tpu.slam.renderer import RenderInputs, render


def _scene(p=160, lang_dim=8, h=48, w=64, f=40.0, seed=3):
    rng = np.random.default_rng(seed)
    inputs = RenderInputs(
        xyz=jnp.asarray(
            np.stack([rng.uniform(-1.5, 1.5, p), rng.uniform(-1.0, 1.0, p),
                      rng.uniform(1.5, 6.0, p)], 1), jnp.float32),
        opacity=jnp.asarray(rng.uniform(0.2, 0.95, p), jnp.float32),
        scales=jnp.asarray(rng.uniform(0.02, 0.12, (p, 3)), jnp.float32),
        quats=jnp.asarray(
            rng.normal(size=(p, 4))
            / np.linalg.norm(rng.normal(size=(p, 4)), axis=1, keepdims=True),
            jnp.float32),
        shs=jnp.asarray(rng.normal(size=(p, 1, 3)) * 0.3, jnp.float32),
        language=jnp.asarray(rng.normal(size=(p, lang_dim)) * 0.2, jnp.float32),
    )
    # Deterministic quats norm fix (normalize actual sample).
    q = np.asarray(inputs.quats)
    inputs = inputs._replace(
        quats=jnp.asarray(q / np.linalg.norm(q, axis=1, keepdims=True))
    )
    settings = RasterSettings(
        image_height=h, image_width=w,
        tanfovx=w / (2 * f), tanfovy=h / (2 * f),
        sh_degree=0, backend="tpu", max_instances=8192,
    )
    proj = graphics.projection_matrix(0.01, 100.0, w / 2, h / 2, f, f, w, h)
    view = jnp.eye(4)
    return inputs, settings, proj, view


import pytest


@pytest.mark.parametrize("multiseg", ["off", "hybrid"])
def test_banded_render_matches_single_device(multiseg):
    inputs, settings, proj, view = _scene()
    settings = settings._replace(multiseg=multiseg)
    mesh = make_mesh(8)
    banded = make_banded_render(mesh, settings, inputs.language.shape[1])

    ref = render(inputs, view, proj, settings)
    out = banded(inputs, view, proj)

    np.testing.assert_allclose(
        np.asarray(out.color), np.asarray(ref.color), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out.language), np.asarray(ref.language), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out.depth), np.asarray(ref.depth), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out.opacity), np.asarray(ref.opacity), atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(out.n_touched), np.asarray(ref.n_touched))
    np.testing.assert_array_equal(
        np.asarray(out.radii), np.asarray(ref.radii))
    assert not bool(out.overflow)


def test_banded_render_gradients_match():
    inputs, settings, proj, view = _scene()
    mesh = make_mesh(8)
    banded = make_banded_render(mesh, settings, inputs.language.shape[1])

    def loss_banded(xyz, opacity, language):
        out = banded(
            inputs._replace(xyz=xyz, opacity=opacity, language=language),
            view, proj)
        return (out.color.sum() + out.language.sum()
                + 0.1 * out.depth.sum())

    def loss_single(xyz, opacity, language):
        out = render(
            inputs._replace(xyz=xyz, opacity=opacity, language=language),
            view, proj, settings)
        return (out.color.sum() + out.language.sum()
                + 0.1 * out.depth.sum())

    g_b = jax.grad(loss_banded, argnums=(0, 1, 2))(
        inputs.xyz, inputs.opacity, inputs.language)
    g_s = jax.grad(loss_single, argnums=(0, 1, 2))(
        inputs.xyz, inputs.opacity, inputs.language)
    for a, b in zip(g_b, g_s):
        scale = max(float(jnp.abs(b).max()), 1.0)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=2e-5)


def test_banded_tracking_run_matches_single_device():
    from online_lang_splatting_tpu.slam.frontend import tracking_run

    inputs, settings, proj, view = _scene()
    h, w = settings.image_height, settings.image_width
    rng = np.random.default_rng(7)

    # gt = render from a slightly different pose; start tracking at identity.
    import online_lang_splatting_tpu.ops.lie as lie

    tau = jnp.asarray([0.01, -0.005, 0.008, 0.004, -0.003, 0.002], jnp.float32)
    gt_view = lie.se3_exp(tau) @ view
    gt = render(inputs, gt_view, proj, settings)
    gt_image = gt.color
    gt_depth = gt.depth
    grad_mask = jnp.ones((1, h, w), jnp.float32)
    lrs = (jnp.float32(0.002), jnp.float32(0.002), jnp.float32(0.01))

    ref = tracking_run(
        inputs, view, proj, gt_image, gt_depth, grad_mask,
        jnp.float32(0.0), jnp.float32(0.0), lrs,
        settings=settings, max_iters=12,
    )
    mesh = make_mesh(8)
    banded_run = make_banded_tracking_run(mesh, settings, max_iters=12)
    out = banded_run(
        inputs, view, proj, gt_image, gt_depth, grad_mask,
        jnp.float32(0.0), jnp.float32(0.0), lrs,
    )

    # view, ea, eb, n_iters, loss, med, visibility, overflow
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(ref[0]), atol=1e-5)
    np.testing.assert_allclose(float(out[1]), float(ref[1]), atol=1e-5)
    np.testing.assert_allclose(float(out[2]), float(ref[2]), atol=1e-5)
    assert int(out[3]) == int(ref[3])
    np.testing.assert_allclose(float(out[4]), float(ref[4]), atol=1e-6)
    np.testing.assert_allclose(float(out[5]), float(ref[5]), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out[6]), np.asarray(ref[6]))


def _tracking_setup():
    import online_lang_splatting_tpu.ops.lie as lie

    inputs, settings, proj, view = _scene()
    h, w = settings.image_height, settings.image_width
    tau = jnp.asarray([0.01, -0.005, 0.008, 0.004, -0.003, 0.002],
                      jnp.float32)
    gt_view = lie.se3_exp(tau) @ view
    gt = render(inputs, gt_view, proj, settings)
    grad_mask = jnp.ones((1, h, w), jnp.float32)
    lrs = (jnp.float32(0.002), jnp.float32(0.002), jnp.float32(0.01))
    return inputs, settings, proj, view, gt.color, gt.depth, grad_mask, lrs


def test_tracking_keep_best_returns_argmin_iterate():
    """keep_best commits the argmin-loss iterate: its loss can never
    exceed the last-evaluated iterate's, and the returned (view, ea, eb)
    must REPRODUCE the returned loss when re-evaluated outside the loop
    (i.e. it is a real visited iterate, not a blend)."""
    from online_lang_splatting_tpu.slam import losses as L
    from online_lang_splatting_tpu.slam.frontend import tracking_run

    (inputs, settings, proj, view, gt_image, gt_depth, grad_mask,
     lrs) = _tracking_setup()

    last = tracking_run(
        inputs, view, proj, gt_image, gt_depth, grad_mask,
        jnp.float32(0.0), jnp.float32(0.0), lrs,
        settings=settings, max_iters=12,
    )
    best = tracking_run(
        inputs, view, proj, gt_image, gt_depth, grad_mask,
        jnp.float32(0.0), jnp.float32(0.0), lrs,
        settings=settings, max_iters=12, keep_best=True,
    )
    assert float(best[4]) <= float(last[4]) + 1e-7
    assert int(best[3]) == int(last[3])  # same loop length, different commit

    # Re-evaluate the tracking loss at the returned best iterate.
    track_inputs = inputs._replace(
        language=jnp.zeros((inputs.language.shape[0], 0), jnp.float32))
    out = render(track_inputs, best[0], proj,
                 settings._replace(stats=False))
    loss = L.loss_tracking_rgbd(
        out.color, out.depth, out.opacity, gt_image, gt_depth, grad_mask,
        best[1], best[2], alpha=0.95, rgb_boundary_threshold=0.01,
    )
    # rtol: the in-loop render and this standalone one differ by XLA
    # fusion/accumulation order (~2.6e-6 relative observed on CPU).
    np.testing.assert_allclose(float(loss), float(best[4]), rtol=1e-5)


def test_tracking_lr_decay_parity_and_convergence():
    """lr_decay=1.0 is bit-identical to the default (reference parity);
    lr_decay<1 + plateau_rtol>0 = reduce-lr-on-plateau: full-lr travel
    while the loss improves, then geometric step collapse so the
    ‖tau‖<1e-4 exit fires before the budget — WITHOUT losing accuracy
    vs fixed lr (a plain per-iteration decay caps total travel at
    lr/(1-d) and froze short of the target on this exact toy)."""
    import online_lang_splatting_tpu.ops.lie as lie
    from online_lang_splatting_tpu.slam.frontend import tracking_run

    (inputs, settings, proj, view, gt_image, gt_depth, grad_mask,
     lrs) = _tracking_setup()
    tau = jnp.asarray([0.01, -0.005, 0.008, 0.004, -0.003, 0.002],
                      jnp.float32)
    gt_view = np.asarray(lie.se3_exp(tau) @ view)

    base = tracking_run(
        inputs, view, proj, gt_image, gt_depth, grad_mask,
        jnp.float32(0.0), jnp.float32(0.0), lrs,
        settings=settings, max_iters=60,
    )
    one = tracking_run(
        inputs, view, proj, gt_image, gt_depth, grad_mask,
        jnp.float32(0.0), jnp.float32(0.0), lrs, jnp.float32(0.0),
        jnp.float32(1.0), settings=settings, max_iters=60,
    )
    np.testing.assert_array_equal(np.asarray(base[0]), np.asarray(one[0]))
    assert int(base[3]) == int(one[3])

    dec = tracking_run(
        inputs, view, proj, gt_image, gt_depth, grad_mask,
        jnp.float32(0.0), jnp.float32(0.0), lrs, jnp.float32(0.01),
        jnp.float32(0.5), settings=settings, max_iters=60,
    )
    # Each plateau halves the step; a few cuts drive ‖tau‖ under 1e-4.
    assert int(dec[3]) < 60, f"decay run used all {int(dec[3])} iters"
    err_dec = np.linalg.norm(np.asarray(dec[0])[:3, 3] - gt_view[:3, 3])
    err_base = np.linalg.norm(np.asarray(base[0])[:3, 3] - gt_view[:3, 3])
    assert np.isfinite(err_dec)
    assert err_dec <= err_base + 1e-4


def test_banded_tracking_lr_decay_matches_single_device():
    from online_lang_splatting_tpu.slam.frontend import tracking_run

    (inputs, settings, proj, view, gt_image, gt_depth, grad_mask,
     lrs) = _tracking_setup()
    ref = tracking_run(
        inputs, view, proj, gt_image, gt_depth, grad_mask,
        jnp.float32(0.0), jnp.float32(0.0), lrs, jnp.float32(0.01),
        jnp.float32(0.5), settings=settings, max_iters=25,
    )
    mesh = make_mesh(8)
    banded_run = make_banded_tracking_run(mesh, settings, max_iters=25)
    out = banded_run(
        inputs, view, proj, gt_image, gt_depth, grad_mask,
        jnp.float32(0.0), jnp.float32(0.0), lrs, jnp.float32(0.01),
        jnp.float32(0.5),
    )
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(ref[0]), atol=1e-5)
    assert int(out[3]) == int(ref[3])


@pytest.mark.slow
def test_banded_render_production_shapes():
    """Single-vs-8-device equivalence at PRODUCTION-like shapes: tile 32,
    1200x680 frame, >=64k instance bucket (VERDICT r4 #7 — the fast
    equivalence tests run 48x64/8k toys, so sharding bugs that need real
    tile-row counts or multi-band instance distributions never fired).
    Uses the replica-scale calibration and enough Gaussians that every
    band composites thousands of instances."""
    p = 6000
    rng = np.random.default_rng(11)
    h, w, f = 680, 1200, 600.0
    inputs = RenderInputs(
        xyz=jnp.asarray(
            np.stack([rng.uniform(-3.0, 3.0, p), rng.uniform(-1.8, 1.8, p),
                      rng.uniform(1.5, 7.0, p)], 1), jnp.float32),
        opacity=jnp.asarray(rng.uniform(0.2, 0.95, p), jnp.float32),
        scales=jnp.asarray(rng.uniform(0.01, 0.08, (p, 3)), jnp.float32),
        quats=jnp.asarray(rng.normal(size=(p, 4)), jnp.float32),
        shs=jnp.asarray(rng.normal(size=(p, 1, 3)) * 0.3, jnp.float32),
        language=jnp.asarray(rng.normal(size=(p, 15)) * 0.2, jnp.float32),
    )
    q = np.asarray(inputs.quats)
    inputs = inputs._replace(
        quats=jnp.asarray(q / np.linalg.norm(q, axis=1, keepdims=True)))
    settings = RasterSettings(
        image_height=h, image_width=w,
        tanfovx=w / (2 * f), tanfovy=h / (2 * f),
        sh_degree=0, backend="tpu", max_instances=65536, tile=32,
    )
    proj = graphics.projection_matrix(0.01, 100.0, w / 2, h / 2, f, f, w, h)
    view = jnp.eye(4)
    mesh = make_mesh(8)
    banded = make_banded_render(mesh, settings, 15)

    ref = render(inputs, view, proj, settings)
    out = banded(inputs, view, proj)
    assert not bool(ref.overflow) and not bool(out.overflow)
    # Production-scale sanity: this scene must actually stress the bucket
    # (tens of thousands of instances) and touch every band.
    assert int(ref.num_instances) > 30000, int(ref.num_instances)

    def close_except_stop_boundary(a, b, atol, max_abs, frac=1e-4):
        """Band vs single-device blends differ only by f32 accumulation
        order (chunk boundaries fall differently); at SATURATED pixels
        that can flip the discrete T < eps early-stop by one instance —
        a ~1e-3 jump on a vanishing pixel fraction (observed 30 of 2.4M
        at this scene). Everything else must match to float tolerance."""
        a, b = np.asarray(a), np.asarray(b)
        d = np.abs(a - b)
        assert float(d.max()) <= max_abs, float(d.max())
        assert (d > atol).mean() <= frac, (d > atol).mean()

    close_except_stop_boundary(out.color, ref.color, 2e-5, 5e-3)
    close_except_stop_boundary(out.language, ref.language, 2e-5, 5e-3)
    close_except_stop_boundary(out.depth, ref.depth, 1e-3, 5e-2)
    close_except_stop_boundary(out.opacity, ref.opacity, 2e-5, 5e-3)
    nt_d = np.abs(np.asarray(out.n_touched, np.int64)
                  - np.asarray(ref.n_touched, np.int64))
    assert (nt_d > 0).mean() <= 1e-3 and nt_d.max() <= 4, (
        (nt_d > 0).mean(), nt_d.max())

    # One banded tracking step at the same scale (pose grads psum'd over
    # all 8 bands of the real tile grid).
    gt = render(inputs, view, proj, settings)
    banded_run = make_banded_tracking_run(mesh, settings, max_iters=2)
    from online_lang_splatting_tpu.slam.frontend import tracking_run

    lrs = (jnp.float32(0.002), jnp.float32(0.002), jnp.float32(0.01))
    reft = tracking_run(
        inputs, view, proj, gt.color, gt.depth,
        jnp.ones((1, h, w), jnp.float32),
        jnp.float32(0.0), jnp.float32(0.0), lrs,
        settings=settings, max_iters=2,
    )
    outt = banded_run(
        inputs, view, proj, gt.color, gt.depth,
        jnp.ones((1, h, w), jnp.float32),
        jnp.float32(0.0), jnp.float32(0.0), lrs,
    )
    np.testing.assert_allclose(
        np.asarray(outt[0]), np.asarray(reft[0]), atol=1e-5)
    np.testing.assert_allclose(float(outt[4]), float(reft[4]), rtol=1e-5)


def test_banded_tracking_keep_best_matches_single_device():
    from online_lang_splatting_tpu.slam.frontend import tracking_run

    (inputs, settings, proj, view, gt_image, gt_depth, grad_mask,
     lrs) = _tracking_setup()
    ref = tracking_run(
        inputs, view, proj, gt_image, gt_depth, grad_mask,
        jnp.float32(0.0), jnp.float32(0.0), lrs,
        settings=settings, max_iters=12, keep_best=True,
    )
    mesh = make_mesh(8)
    banded_run = make_banded_tracking_run(
        mesh, settings, max_iters=12, keep_best=True)
    out = banded_run(
        inputs, view, proj, gt_image, gt_depth, grad_mask,
        jnp.float32(0.0), jnp.float32(0.0), lrs,
    )
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(ref[0]), atol=1e-5)
    np.testing.assert_allclose(float(out[1]), float(ref[1]), atol=1e-5)
    np.testing.assert_allclose(float(out[2]), float(ref[2]), atol=1e-5)
    assert int(out[3]) == int(ref[3])
    np.testing.assert_allclose(float(out[4]), float(ref[4]), atol=1e-6)


def test_tracking_plateau_exit_shortens_loop():
    """plateau_rtol > 0 adds a loss-plateau exit: with a generous rtol
    and patience the loop must end EARLIER than the full budget (Adam's
    ~lr-sized steps keep ||tau|| above the reference exit long after the
    loss stops moving), and a plateau-exited pose must still track (its
    loss below the initial-pose loss). plateau_rtol=0.0 preserves
    reference behavior — same iterate count as the default."""
    from online_lang_splatting_tpu.slam.frontend import tracking_run

    (inputs, settings, proj, view, gt_image, gt_depth, grad_mask,
     lrs) = _tracking_setup()

    base = tracking_run(
        inputs, view, proj, gt_image, gt_depth, grad_mask,
        jnp.float32(0.0), jnp.float32(0.0), lrs,
        settings=settings, max_iters=40,
    )
    zero = tracking_run(
        inputs, view, proj, gt_image, gt_depth, grad_mask,
        jnp.float32(0.0), jnp.float32(0.0), lrs, jnp.float32(0.0),
        settings=settings, max_iters=40, plateau_patience=3,
    )
    assert int(zero[3]) == int(base[3])  # rtol=0: reference parity

    plat = tracking_run(
        inputs, view, proj, gt_image, gt_depth, grad_mask,
        jnp.float32(0.0), jnp.float32(0.0), lrs, jnp.float32(0.5),
        settings=settings, max_iters=40, plateau_patience=3,
    )
    assert int(plat[3]) < int(base[3])
    assert np.isfinite(float(plat[4]))

    # Combined with keep_best (the r5b hardware configuration).
    combo = tracking_run(
        inputs, view, proj, gt_image, gt_depth, grad_mask,
        jnp.float32(0.0), jnp.float32(0.0), lrs, jnp.float32(0.05),
        settings=settings, max_iters=40, plateau_patience=3,
        keep_best=True,
    )
    assert np.isfinite(float(combo[4]))
    assert float(combo[4]) <= float(plat[4]) + 1e-6
