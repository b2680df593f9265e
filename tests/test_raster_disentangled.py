"""Disentangle-optim variant: independent language geometry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import random_scene
from online_lang_splatting_tpu.ops.raster import rasterize
from online_lang_splatting_tpu.ops.raster.disentangled import (
    rasterize_disentangled,
)


def _scene(seed=0):
    scene = random_scene(n=48, width=48, height=32, seed=seed, lang_dim=3)
    rng = np.random.default_rng(seed + 100)
    scene["opacities_lang"] = jnp.asarray(
        rng.uniform(0.3, 0.9, 48), dtype=jnp.float32
    )
    scene["scales_lang"] = scene["scales"] * 1.5
    q = rng.normal(size=(48, 4)).astype(np.float32)
    scene["quats_lang"] = jnp.asarray(q / np.linalg.norm(q, axis=1, keepdims=True))
    return scene


def _run(scene, **kw):
    return rasterize_disentangled(
        scene["means3d"], scene["opacities"], scene["scales"], scene["quats"],
        scene["opacities_lang"], scene["scales_lang"], scene["quats_lang"],
        viewmatrix=scene["viewmatrix"], projmatrix=scene["projmatrix"],
        settings=scene["settings"], shs=scene["shs"],
        language_features=scene["language_features"], **kw,
    )


def test_color_matches_entangled_color_pass():
    scene = _scene()
    out = _run(scene)
    ref = rasterize(
        scene["means3d"], scene["opacities"], scene["scales"], scene["quats"],
        shs=scene["shs"], viewmatrix=scene["viewmatrix"],
        projmatrix=scene["projmatrix"], settings=scene["settings"],
    )
    np.testing.assert_allclose(out.color, ref.color, atol=1e-6)
    np.testing.assert_allclose(out.depth, ref.depth, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out.radii), np.asarray(ref.radii))


def test_language_uses_own_geometry():
    scene = _scene()
    out = _run(scene)
    # Language pass with the language geometry, via the standard op.
    ref_lang = rasterize(
        scene["means3d"], scene["opacities_lang"], scene["scales_lang"],
        scene["quats_lang"],
        colors_precomp=jnp.zeros((48, 3)),
        language_features=scene["language_features"],
        viewmatrix=scene["viewmatrix"], projmatrix=scene["projmatrix"],
        settings=scene["settings"],
    )
    np.testing.assert_allclose(out.language, ref_lang.language, atol=1e-6)
    np.testing.assert_allclose(out.opacity_lang, ref_lang.opacity, atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(out.n_touched_lang), np.asarray(ref_lang.n_touched)
    )
    # The two geometries genuinely differ.
    assert float(jnp.abs(out.final_t - out.final_t_lang).max()) > 1e-3


def test_gradients_flow_to_both_geometries():
    scene = _scene()

    def loss(op, op_l, rho):
        out = rasterize_disentangled(
            scene["means3d"], op, scene["scales"], scene["quats"],
            op_l, scene["scales_lang"], scene["quats_lang"],
            viewmatrix=scene["viewmatrix"], projmatrix=scene["projmatrix"],
            settings=scene["settings"], shs=scene["shs"],
            language_features=scene["language_features"],
            cam_trans_delta=rho,
        )
        return out.color.sum() + out.language.sum()

    g_op, g_opl, g_rho = jax.grad(loss, argnums=(0, 1, 2))(
        scene["opacities"], scene["opacities_lang"], jnp.zeros(3)
    )
    assert float(jnp.abs(g_op).max()) > 0
    assert float(jnp.abs(g_opl).max()) > 0
    assert bool(jnp.isfinite(g_rho).all()) and float(jnp.abs(g_rho).max()) > 0
