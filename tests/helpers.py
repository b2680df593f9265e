"""Shared scene builders for rasterizer tests."""

import jax.numpy as jnp
import numpy as np

from online_lang_splatting_tpu.ops import graphics
from online_lang_splatting_tpu.ops.raster import RasterSettings


def make_camera(width=64, height=48, fx=60.0, fy=60.0, znear=0.01, zfar=100.0):
    cx, cy = width / 2.0, height / 2.0
    proj = graphics.projection_matrix(znear, zfar, cx, cy, fx, fy, width, height)
    view = jnp.eye(4, dtype=jnp.float32)
    tanfovx = width / (2.0 * fx)
    tanfovy = height / (2.0 * fy)
    return view, proj, tanfovx, tanfovy


def random_scene(
    n=64, width=64, height=48, seed=0, lang_dim=15, sh_degree=0, spread=1.0,
    depth_range=(2.0, 6.0), scale_range=(0.05, 0.3), backend="oracle", tile=16,
):
    rng = np.random.default_rng(seed)
    view, proj, tanfovx, tanfovy = make_camera(width, height)
    means = np.zeros((n, 3), np.float32)
    means[:, 0] = rng.uniform(-spread, spread, n)
    means[:, 1] = rng.uniform(-spread * height / width, spread * height / width, n)
    means[:, 2] = rng.uniform(*depth_range, n)
    scales = rng.uniform(*scale_range, (n, 3)).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    opac = rng.uniform(0.3, 0.95, n).astype(np.float32)
    n_coeffs = (sh_degree + 1) ** 2
    shs = rng.normal(size=(n, n_coeffs, 3)).astype(np.float32) * 0.3
    lang = rng.normal(size=(n, lang_dim)).astype(np.float32)
    settings = RasterSettings(
        image_height=height, image_width=width,
        tanfovx=float(tanfovx), tanfovy=float(tanfovy),
        sh_degree=sh_degree, backend=backend, tile=tile,
    )
    return dict(
        means3d=jnp.asarray(means), scales=jnp.asarray(scales),
        quats=jnp.asarray(q), opacities=jnp.asarray(opac),
        shs=jnp.asarray(shs), language_features=jnp.asarray(lang),
        viewmatrix=view, projmatrix=proj, settings=settings,
    )
