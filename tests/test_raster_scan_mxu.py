"""MXU triangular-dot prefix scans (OLS_SCAN_MXU) vs the Hillis-Steele
baseline.

The blend kernels' two Hillis-Steele scans (transmittance prefix product,
backward wG prefix sum) are ~50 of the ~90 full-block VPU passes per
backward chunk; `scan_mxu` replaces each with one triangular-matrix dot
(the product rides in log space). On CPU the dots execute in exact f32,
so the only drift is log/exp rounding of the transmittance product —
parity here pins the MATH; the hardware A/B (tools/hw_queue.sh phase B)
pins the bf16_3x MXU numerics via the golden replay.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import random_scene
from raster_fixtures import SCENES, render_scene
from online_lang_splatting_tpu.ops.raster import rasterize

FLOAT_FIELDS = ("color", "language", "depth", "opacity", "final_t")
INT_FIELDS = ("radii", "n_touched", "n_contrib")


def _scene():
    """Mixed regime: multi-segment chunks AND tiles spanning chunks."""
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


def test_bwd_mode_forward_is_baseline():
    """scan_mxu="bwd" must leave the forward untouched (bit-identical)."""
    scene = _scene()
    base = _render(scene, scan_mxu="off")
    got = _render(scene, scan_mxu="bwd")
    for f in FLOAT_FIELDS + INT_FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(base, f)), np.asarray(getattr(got, f)),
            err_msg=f,
        )


@pytest.mark.parametrize("multiseg", ["off", "hybrid"])
def test_forward_parity_all(multiseg):
    scene = _scene()
    base = _render(scene, scan_mxu="off", multiseg=multiseg)
    got = _render(scene, scan_mxu="all", multiseg=multiseg)
    for f in FLOAT_FIELDS:
        b = np.asarray(getattr(base, f))
        g = np.asarray(getattr(got, f))
        scale = max(float(np.abs(b).max()), 1.0)
        # log/exp round-trip of the transmittance product: ~1e-6 relative
        # per factor, <= 256 factors per chunk.
        np.testing.assert_allclose(g / scale, b / scale, atol=5e-5,
                                   err_msg=f"{f} ({multiseg})")
    for f in INT_FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(got, f)), np.asarray(getattr(base, f)),
            err_msg=f"{f} ({multiseg})",
        )


@pytest.mark.parametrize("scan_mxu", ["bwd", "all"])
@pytest.mark.parametrize("multiseg", ["off", "hybrid"])
def test_gradient_parity(scan_mxu, multiseg):
    scene = _scene()
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
    for sm in ("off", scan_mxu):
        st = scene["settings"]._replace(
            backend="tpu", scan_mxu=sm, multiseg=multiseg
        )
        grads[sm] = jax.grad(
            lambda *a: loss(st, *a), argnums=(0, 1, 2, 3, 4, 5)
        )(*args)
    for gb, gm in zip(grads["off"], grads[scan_mxu]):
        scale = np.abs(np.asarray(gb)).max() + 1e-8
        np.testing.assert_allclose(
            np.asarray(gm) / scale, np.asarray(gb) / scale, atol=1e-4
        )


def test_gradient_parity_emission():
    """The emission-order reduction consumes the same per-instance grads;
    one combined case pins the cross-product."""
    scene = _scene()

    def loss(settings, means):
        out = rasterize(
            means, scene["opacities"], scene["scales"], scene["quats"],
            shs=scene["shs"],
            language_features=scene["language_features"],
            viewmatrix=scene["viewmatrix"],
            projmatrix=scene["projmatrix"], settings=settings,
            bg=jnp.zeros(3),
        )
        return out.color.sum() + 1.3 * out.depth.sum()

    grads = {}
    for sm in ("off", "bwd"):
        st = scene["settings"]._replace(
            backend="tpu", scan_mxu=sm, grad_reduce="emission"
        )
        grads[sm] = jax.grad(lambda m: loss(st, m))(scene["means3d"])
    scale = np.abs(np.asarray(grads["off"])).max() + 1e-8
    np.testing.assert_allclose(
        np.asarray(grads["bwd"]) / scale,
        np.asarray(grads["off"]) / scale, atol=1e-4,
    )


@pytest.mark.parametrize("name", sorted(SCENES))
def test_goldens_scan_mxu(name):
    """The adversarial golden fixtures (alpha clamp, T cutoff, >1-chunk
    tiles, multi-tile splats, degenerate conics) under scan_mxu="all"."""
    from pathlib import Path

    f = Path(__file__).parent / "goldens" / f"{name}.npz"
    golden = np.load(f)
    got = render_scene(SCENES[name](), "tpu", scan_mxu="all")
    for key in golden.files:
        g, r = got[key], golden[key]
        if key in {"radii", "n_touched", "n_contrib"}:
            np.testing.assert_array_equal(g, r, err_msg=f"{name}/{key}")
            continue
        scale = max(float(np.abs(r).max()), 1.0)
        tol = 2e-3 if key.startswith("d_") else 2e-4
        np.testing.assert_allclose(
            g / scale, r / scale, atol=tol, err_msg=f"{name}/{key}"
        )
