"""Chunked color refinement: equivalence with a per-iteration loop and
loss improvement on a toy scene."""

import jax
import jax.numpy as jnp
import numpy as np

from online_lang_splatting_tpu.models import gaussians as G
from online_lang_splatting_tpu.ops import graphics
from online_lang_splatting_tpu.ops.raster import RasterSettings
from online_lang_splatting_tpu.slam.refinement import (
    default_refine_lrs, make_refine_chunk,
)


def _setup(k=3, h=24, w=32):
    rng = np.random.default_rng(5)
    cap = 256
    params = G.empty_params(cap, sh_degree=0, lang_dim=0)
    aux = G.empty_aux(cap)
    opt0 = G.init_adam(params)
    xyz = jnp.asarray(rng.normal(size=(96, 3)) * 0.5 + [0, 0, 3.0], jnp.float32)
    rgb = jnp.asarray(rng.uniform(size=(96, 3)), jnp.float32)
    params, aux, _, _ = G.extend_points(
        params, aux, opt0, xyz=xyz, rgb=rgb,
        valid=jnp.ones((96,), bool), kf_id=0,
    )
    f = 30.0
    settings = RasterSettings(
        image_height=h, image_width=w,
        tanfovx=w / (2 * f), tanfovy=h / (2 * f),
        sh_degree=0, backend="tpu", max_instances=4096,
    )
    proj = graphics.projection_matrix(0.01, 100.0, w / 2, h / 2, f, f, w, h)
    stack_imgs = jnp.asarray(rng.uniform(size=(k, 3, h, w)), jnp.float32)
    stack_r = jnp.broadcast_to(jnp.eye(3), (k, 3, 3))
    stack_t = jnp.asarray(rng.normal(size=(k, 3)) * 0.01, jnp.float32)
    return params, aux, settings, proj, stack_imgs, stack_r, stack_t


def test_chunk_matches_per_iteration_and_improves():
    params, aux, settings, proj, imgs, r, t = _setup()
    opt = G.init_adam(params)
    lrs = default_refine_lrs()
    lam = jnp.float32(0.2)
    rows = jnp.asarray([0, 2, 1, 0, 2, 1, 1, 0], jnp.int32)

    one = make_refine_chunk(settings, 1)
    p1, o1 = params, opt
    losses_single = []
    for row in np.asarray(rows):
        p1, o1, ls = one(
            p1, o1, aux.active, proj, imgs, r, t,
            jnp.asarray([row], jnp.int32), lrs, lam,
        )
        losses_single.append(float(ls[0]))

    many = make_refine_chunk(settings, len(rows))
    p8, o8, losses = many(
        params, opt, aux.active, proj, imgs, r, t, rows, lrs, lam,
    )
    np.testing.assert_allclose(
        np.asarray(losses), np.asarray(losses_single), rtol=1e-5, atol=1e-6
    )
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        if a.size:
            assert float(jnp.abs(a - b).max()) < 1e-6
    # Optimization actually reduces the photometric loss.
    assert losses[-1] < losses[0]
