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

_ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_ROOT))
sys.path.insert(0, str(_ROOT / "tests"))
from helpers import random_scene  # noqa: E402

from online_lang_splatting_tpu.ops.raster import rasterize  # noqa: E402


CASES = (
    # (multiseg, scan_mxu) — "off"/"off" is the cross-check baseline.
    ("off", "off"),
    ("on", "off"),
    ("hybrid", "off"),
    ("off", "bwd"),
    ("off", "all"),
    ("hybrid", "all"),
)


def main():
    results = {}
    for mode, sm in CASES:
        scene = random_scene(n=200, width=96, height=64, seed=9,
                             scale_range=(0.01, 0.1))
        st = scene["settings"]._replace(
            backend="tpu", multiseg=mode, scan_mxu=sm
        )

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
        case = f"multiseg={mode},scan_mxu={sm}"
        if not (np.isfinite(v) and np.isfinite(g).all()):
            raise SystemExit(f"{case}: non-finite value/grad")
        results[(mode, sm)] = (v, g)
        print(case, "ok", v, flush=True)

    v0, g0 = results[("off", "off")]
    for key, (v, g) in results.items():
        if key == ("off", "off"):
            continue
        case = f"multiseg={key[0]},scan_mxu={key[1]}"
        if abs(v - v0) > 1e-3 * max(1.0, abs(v0)):
            raise SystemExit(f"{case}: value {v} != baseline {v0}")
        rel = np.abs(g - g0).max() / max(1e-8, np.abs(g0).max())
        if rel > 1e-3:
            raise SystemExit(
                f"{case}: grads diverge from baseline (rel {rel:.2e})")
        print(case, "matches off-baseline", flush=True)


if __name__ == "__main__":
    main()
