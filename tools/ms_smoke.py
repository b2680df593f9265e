#!/usr/bin/env python
"""Fast Mosaic-lowering smoke for the vectorized multiseg blend path.

Tiny scene, small compile — isolates a TPU lowering failure in the new
vectorized ops (int transpose, flag rolls, per-chunk cond between two
big bodies) in minutes before the heavy stage-7 probes run.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "tests")
from helpers import random_scene  # noqa: E402

from online_lang_splatting_tpu.ops.raster import rasterize  # noqa: E402


def main():
    for mode in ("on", "hybrid"):
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
        assert np.isfinite(float(v)) and np.isfinite(np.asarray(g)).all()
        print(mode, "ok", float(v), flush=True)


if __name__ == "__main__":
    main()
