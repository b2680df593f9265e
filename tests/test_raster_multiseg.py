"""Vectorized multi-segment blend kernels (OLS_MULTISEG) vs the baseline.

The "on"/"hybrid" paths process every tile segment of a 256-instance
chunk in one full-block pass (per-row tile origins + segmented
transmittance scan) instead of one full-block pass PER segment; they
must reproduce the baseline loop kernel to f32 product-order tolerance
and the golden fixtures to golden tolerance. Scenes here are chosen so
chunks genuinely span several tiles (many small splats over many tiles)
AND tiles span several chunks (cross-chunk transmittance carry).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import random_scene
from raster_fixtures import SCENES, render_scene
from online_lang_splatting_tpu.ops.raster import rasterize

MODES = ("on", "hybrid", "bwd-hybrid")

FLOAT_FIELDS = ("color", "language", "depth", "opacity", "final_t")
INT_FIELDS = ("radii", "n_touched", "n_contrib")


def _multiseg_scene():
    """Many tiny splats across a 6x4-tile image: most chunks hold 2+
    tile segments, the vectorized path's reason to exist."""
    return random_scene(
        n=300, width=96, height=64, seed=21, lang_dim=8,
        scale_range=(0.01, 0.05), spread=1.2,
    )


def _mixed_scene():
    """Dense overlap: some tiles exceed one chunk (cross-chunk carry)
    while edge tiles stay tiny (multi-segment chunks)."""
    return random_scene(
        n=500, width=80, height=48, seed=22, lang_dim=8,
        scale_range=(0.02, 0.35), spread=0.5, depth_range=(2.0, 4.0),
    )


def _render(scene, **overrides):
    settings = scene["settings"]._replace(backend="tpu", **overrides)
    return rasterize(
        scene["means3d"], scene["opacities"], scene["scales"],
        scene["quats"], shs=scene["shs"],
        language_features=scene["language_features"],
        viewmatrix=scene["viewmatrix"], projmatrix=scene["projmatrix"],
        settings=settings, bg=jnp.array([0.2, 0.4, 0.6]),
    )


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("scene_fn", [_multiseg_scene, _mixed_scene])
def test_forward_parity_vs_baseline(mode, scene_fn):
    scene = scene_fn()
    base = _render(scene, multiseg="off")
    got = _render(scene, multiseg=mode)
    for f in FLOAT_FIELDS:
        b = np.asarray(getattr(base, f))
        g = np.asarray(getattr(got, f))
        scale = max(float(np.abs(b).max()), 1.0)
        # Only the f32 multiplication ORDER of the transmittance prefix
        # differs between the segmented scan and the masked plain scan.
        np.testing.assert_allclose(g / scale, b / scale, atol=2e-6,
                                   err_msg=f"{f} ({mode})")
    for f in INT_FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(got, f)), np.asarray(getattr(base, f)),
            err_msg=f"{f} ({mode})",
        )


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("grad_reduce", ["scatter", "emission"])
def test_gradient_parity_vs_baseline(mode, grad_reduce):
    scene = _mixed_scene()
    gw = jnp.asarray(
        np.random.default_rng(0).normal(size=(8,)), dtype=jnp.float32
    )

    def loss(settings, means, scales, opac, lang, rho, theta):
        out = rasterize(
            means, opac, scales, scene["quats"], shs=scene["shs"],
            language_features=lang, viewmatrix=scene["viewmatrix"],
            projmatrix=scene["projmatrix"], settings=settings,
            bg=jnp.array([0.3, 0.1, 0.5]), cam_trans_delta=rho,
            cam_rot_delta=theta,
        )
        return (
            jnp.abs(out.color).sum()
            + (out.language * gw[:, None, None]).sum()
            + 1.7 * out.depth.sum()
            + 0.9 * out.opacity.sum()
        )

    args = (
        scene["means3d"], scene["scales"], scene["opacities"],
        scene["language_features"], jnp.zeros(3), jnp.zeros(3),
    )
    grads = {}
    for ms in ("off", mode):
        st = scene["settings"]._replace(
            backend="tpu", multiseg=ms, grad_reduce=grad_reduce
        )
        grads[ms] = jax.grad(
            lambda *a: loss(st, *a), argnums=(0, 1, 2, 3, 4, 5)
        )(*args)
    for gb, gm in zip(grads["off"], grads[mode]):
        scale = np.abs(np.asarray(gb)).max() + 1e-8
        np.testing.assert_allclose(
            np.asarray(gm) / scale, np.asarray(gb) / scale, atol=1e-5
        )


@pytest.mark.parametrize("mode", MODES)
def test_saturated_early_stop_parity(mode):
    """The done/T carries across chunk boundaries and the early-stop
    masking must survive vectorization."""
    scene = random_scene(
        n=256, width=64, height=48, seed=5, spread=0.8,
        scale_range=(0.05, 0.3), depth_range=(2.0, 3.0),
    )
    scene["opacities"] = jnp.full_like(scene["opacities"], 0.97)
    base = _render(scene, multiseg="off")
    assert float(base.final_t.min()) < 2e-4  # cutoff actually reached
    got = _render(scene, multiseg=mode)
    np.testing.assert_allclose(
        np.asarray(got.final_t), np.asarray(base.final_t), atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(got.n_touched), np.asarray(base.n_touched)
    )
    np.testing.assert_array_equal(
        np.asarray(got.n_contrib), np.asarray(base.n_contrib)
    )


@pytest.mark.parametrize("mode", MODES)
def test_stats_off_parity(mode):
    scene = _multiseg_scene()
    on = _render(scene, multiseg=mode, stats=True)
    off = _render(scene, multiseg=mode, stats=False)
    for f in FLOAT_FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(on, f)), np.asarray(getattr(off, f))
        )
    np.testing.assert_array_equal(np.asarray(off.n_touched), 0)
    np.testing.assert_array_equal(np.asarray(off.n_contrib), 0)


@pytest.mark.parametrize("mode", MODES)
def test_overflow_truncation_parity(mode):
    """Under instance-capacity overflow the truncated chunk sequence can
    end mid-tile; the vectorized path must reproduce the baseline's
    truncated render exactly."""
    scene = random_scene(
        n=900, width=64, height=48, seed=31, scale_range=(0.08, 0.3)
    )
    base = _render(scene, multiseg="off", max_instances=2048)
    assert bool(base.overflow)
    got = _render(scene, multiseg=mode, max_instances=2048)
    assert bool(got.overflow)
    for f in FLOAT_FIELDS:
        b = np.asarray(getattr(base, f))
        g = np.asarray(getattr(got, f))
        scale = max(float(np.abs(b).max()), 1.0)
        np.testing.assert_allclose(g / scale, b / scale, atol=2e-6,
                                   err_msg=f"{f} ({mode})")
    for f in INT_FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(got, f)), np.asarray(getattr(base, f)),
            err_msg=f"{f} ({mode})",
        )


@pytest.mark.parametrize("mode", ["hybrid", "bwd-hybrid"])
@pytest.mark.parametrize("name", sorted(SCENES))
def test_goldens_hybrid(name, mode):
    """The hybrid paths must hit the same pinned goldens as the baseline
    (adversarial edge cases: alpha clamp, T cutoff, >1-chunk tiles,
    multi-tile splats, degenerate conics)."""
    from pathlib import Path

    f = Path(__file__).parent / "goldens" / f"{name}.npz"
    golden = np.load(f)
    got = render_scene(SCENES[name](), "tpu", multiseg=mode)
    for key in golden.files:
        g, r = got[key], golden[key]
        if key in {"radii", "n_touched", "n_contrib"}:
            np.testing.assert_array_equal(g, r, err_msg=f"{name}/{key}")
            continue
        scale = max(float(np.abs(r).max()), 1.0)
        tol = 2e-3 if key.startswith("d_") else 1e-4
        np.testing.assert_allclose(
            g / scale, r / scale, atol=tol, err_msg=f"{name}/{key}"
        )
