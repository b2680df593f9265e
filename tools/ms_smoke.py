#!/usr/bin/env python
"""Fast Mosaic-lowering smoke for the vectorized multiseg blend path.

Tiny scene, small compile — isolates a TPU lowering failure in the new
vectorized ops (int transpose, flag rolls, per-chunk cond between two
big bodies) in minutes before the heavy stage-7 probes run.
"""

import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tests"))
from helpers import random_scene  # noqa: E402

from online_lang_splatting_tpu.ops.raster import rasterize  # noqa: E402


def main():
    results = {}
    for mode in ("off", "on", "hybrid"):
        scene = random_scene(n=200, width=96, height=64, seed=9,
                             scale_range=(0.01, 0.1))
        st = scene["settings"]._replace(backend="tpu", multiseg=mode)

        def loss(means, st=st, scene=scene):
            out = rasterize(
                means, scene["opacities"], scene["scales"],
                scene["quats"], shs=scene["shs"],
                language_features=scene["language_features"],
                viewmatrix=scene["viewmatrix"],
                projmatrix=scene["projmatrix"], settings=st,
                bg=jnp.zeros(3))
            return out.color.sum() + out.depth.sum()

        v, g = jax.jit(jax.value_and_grad(loss))(scene["means3d"])
        v, g = float(v), np.asarray(g)
        if not (np.isfinite(v) and np.isfinite(g).all()):
            raise SystemExit(f"multiseg={mode}: non-finite value/grad")
        results[mode] = (v, g)
        print(mode, "ok", v, flush=True)

    v0, g0 = results["off"]
    for mode in ("on", "hybrid"):
        v, g = results[mode]
        if abs(v - v0) > 1e-3 * max(1.0, abs(v0)):
            raise SystemExit(
                f"multiseg={mode}: value {v} != baseline {v0}")
        rel = np.abs(g - g0).max() / max(1e-8, np.abs(g0).max())
        if rel > 1e-3:
            raise SystemExit(
                f"multiseg={mode}: grads diverge from baseline "
                f"(rel {rel:.2e})")
        print(mode, "matches off-baseline", flush=True)


if __name__ == "__main__":
    main()
