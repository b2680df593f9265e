#!/usr/bin/env python
"""On-hardware rasterizer parity: replay the adversarial golden scenes on
the REAL TPU (Pallas compiled, not interpret mode) and compare against the
CPU-oracle goldens in tests/goldens/.

    python tools/tpu_raster_parity.py            # real chip
    python tools/tpu_raster_parity.py --cpu      # sanity (interpret mode)

Prints one JSON line per scene and a final summary; exits non-zero on any
mismatch beyond tolerance."""

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tol", type=float, default=1e-4)
    ap.add_argument("--grad-tol", type=float, default=2e-3)
    ap.add_argument("--goldens", default=None,
                    help="golden dir (default tests/goldens; point at a "
                    "scratch dir for tile/semantics A/Bs)")
    ap.add_argument("--tile", type=int, default=None,
                    help="render tile size; defaults to 32 when the golden "
                    "dir name ends in _t32, else the env/kernel default — "
                    "without this, pointing --goldens at tile-32 goldens "
                    "compared tile-16 renders against them")
    args = ap.parse_args()
    if args.tile is None and args.goldens and args.goldens.rstrip(
            "/").endswith("_t32"):
        args.tile = 32

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from raster_fixtures import SCENES, render_scene

    grad_keys = {"d_means", "d_scales", "d_opac", "d_lang"}
    int_keys = {"radii", "n_touched", "n_contrib"}
    ok_all = True
    for name, make in SCENES.items():
        gdir = Path(args.goldens) if args.goldens else (
            REPO / "tests" / "goldens")
        golden = np.load(gdir / f"{name}.npz")
        overrides = {} if args.tile is None else {"tile": args.tile}
        got = render_scene(make(), "tpu", **overrides)
        worst = {}
        ok = True
        for key in golden.files:
            g, r = got[key], golden[key]
            if key in int_keys:
                bad = int((g != r).sum())
                worst[key] = bad
                ok &= bad == 0
                continue
            scale = max(float(np.abs(r).max()), 1.0)
            err = float(np.abs(g - r).max()) / scale
            worst[key] = round(err, 9)
            ok &= err < (args.grad_tol if key in grad_keys else args.tol)
        ok_all &= ok
        print(json.dumps({"scene": name, "ok": ok, "max_rel_err": worst}))
    print(json.dumps({"all_ok": ok_all, "platform": jax.devices()[0].platform}))
    return 0 if ok_all else 1


if __name__ == "__main__":
    sys.exit(main())
