#!/usr/bin/env python
"""Generate the pinned rasterizer goldens (tests/goldens/*.npz) from the
dense f32 oracle on CPU. Run ONLY after an intentional semantics change;
the goldens are the regression anchor for both backends and for the
on-hardware parity driver (tools/tpu_raster_parity.py)."""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402

from raster_fixtures import SCENES, render_scene  # noqa: E402


def main():
    # Optional output dir (argv[1]): tile/semantics A/Bs regenerate into a
    # scratch dir (with OLS_TILE etc. set) instead of overwriting the
    # pinned anchor in tests/goldens/.
    out_dir = Path(sys.argv[1]) if len(sys.argv) > 1 else (
        REPO / "tests" / "goldens")
    out_dir.mkdir(parents=True, exist_ok=True)
    for name, make in SCENES.items():
        golden = render_scene(make(), "oracle")
        np.savez_compressed(out_dir / f"{name}.npz", **golden)
        print(f"{name}: color mean {golden['color'].mean():.6f}, "
              f"max n_contrib {golden['n_contrib'].max()}, "
              f"min final_t {golden['final_t'].min():.2e}")
    print(f"wrote {len(SCENES)} goldens to {out_dir}")


if __name__ == "__main__":
    main()
