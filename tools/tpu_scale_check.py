#!/usr/bin/env python
"""Staged hardware check at Replica scale — bisects TPU worker crashes.

Stages (run one with --stage N; each stage is a separate process so a
worker crash is attributable):
  1  raster forward at 200k gaussians / 1200x680
  2  forward+backward (value_and_grad through the custom VJP)
  3  one full mapping_iteration (12 slots)
  4  mapping chunk n=4
  5  mapping chunk n=16
  6  mapping chunk n=64 (known to crash the worker: ~109 s dispatch)
  7  component timing: preprocess / binning / pack+blend fwd / blend bwd
"""

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, required=True)
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--max-instances", type=int, default=None,
                    help="instance bucket (default 1M = 8*2^17). Tile-size "
                    "A/Bs must right-size this to the printed "
                    "num_instances: a larger tile's whole win is a "
                    "smaller instance array")
    ap.add_argument("--tile", type=int, default=None,
                    help="raster tile (default OLS_TILE=16; the SLAM "
                    "production default is 32)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    import numpy as np

    from online_lang_splatting_tpu.models import gaussians as G
    from online_lang_splatting_tpu.ops import graphics
    from online_lang_splatting_tpu.ops.raster import RasterSettings, rasterize

    h, w = 680, 1200
    fx = fy = 600.0
    cap = 1 << 17
    rng = np.random.default_rng(0)
    n = args.n
    settings = RasterSettings(
        image_height=h, image_width=w,
        tanfovx=w / (2 * fx), tanfovy=h / (2 * fy),
        sh_degree=0, backend="tpu",
        max_instances=args.max_instances or 8 * cap,
        **({"tile": args.tile} if args.tile else {}),
    )
    proj = graphics.projection_matrix(0.01, 100.0, w / 2, h / 2, fx, fy, w, h)
    view = jnp.eye(4)

    means = jnp.asarray(
        np.stack([
            rng.uniform(-3, 3, n), rng.uniform(-2, 2, n),
            rng.uniform(2.0, 8.0, n),
        ], 1), jnp.float32)
    # ~0.015 mean scale keeps the probe scene inside the 1M instance
    # bucket (~650k instances, the Replica steady state).
    scales = jnp.asarray(rng.uniform(0.005, 0.025, (n, 3)), jnp.float32)
    quats = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.2, 0.9, n), jnp.float32)
    shs = jnp.asarray(rng.normal(size=(n, 1, 3)) * 0.3, jnp.float32)
    lang = jnp.asarray(rng.normal(size=(n, 15)) * 0.1, jnp.float32)

    if args.stage == 7:
        import functools

        from online_lang_splatting_tpu.ops.raster import binning as BN
        from online_lang_splatting_tpu.ops.raster import preprocess as PP
        from online_lang_splatting_tpu.ops.raster.tiled import blend_tiled

        tile = settings.tile
        campos = jnp.zeros(3)

        def _prep(means, scales, quats, opac, view, pj, campos, shs):
            return PP.preprocess(
                means, scales, quats, opac, view, pj, campos, shs=shs,
                sh_degree=0, width=w, height=h,
                tan_fovx=settings.tanfovx, tan_fovy=settings.tanfovy,
                tile=tile,
            )

        prep_fn = jax.jit(_prep)
        tiles_x = (w + tile - 1) // tile
        tiles_y = (h + tile - 1) // tile
        bin_fn = jax.jit(functools.partial(
            BN.bin_gaussians, tiles_x=tiles_x, tiles_y=tiles_y,
            max_instances=settings.max_instances, chunk=256,
        ))
        fwd_fn = jax.jit(lambda prep, lang: blend_tiled(
            prep, lang, jnp.zeros(3),
            width=w, height=h, tile=tile,
            max_instances=settings.max_instances,
        ).color.sum())
        bwd_fn = jax.jit(jax.grad(
            lambda means, opac, scales, lang: blend_tiled(
                prep_fn(means, scales, quats, opac, view, proj @ view,
                        campos, shs=shs),
                lang, jnp.zeros(3), width=w, height=h, tile=tile,
                max_instances=settings.max_instances,
            ).color.sum(),
            argnums=(0, 3),
        ))

        fetch = jax.jit(
            lambda r: sum(jnp.sum(jnp.asarray(x).astype(jnp.float32))
                          for x in jax.tree.leaves(r))
        )

        def timeit(name, f, *a):
            # Force completion with a HOST FETCH of a scalar depending on
            # every output — block_until_ready alone reports fictitious
            # timings through the remote tunnel (CLAUDE.md).
            _ = float(fetch(f(*a)))
            t0 = time.time()
            for _ in range(5):
                r = f(*a)
            _ = float(fetch(r))
            print(f"  {name}: {1e3 * (time.time() - t0) / 5:.1f} ms")
            return r

        prep = timeit("preprocess", prep_fn, means, scales, quats, opac,
                      view, proj @ view, campos, shs)
        binning = timeit("binning", bin_fn, prep)
        print(f"  num_instances: {int(binning.num_instances)}")
        timeit("pack+blend fwd (+assembly)", fwd_fn, prep, lang)
        timeit("full fwd+bwd", bwd_fn, means, opac, scales, lang)
        return 0

    if args.stage == 9:
        # Tracking-iteration probe: the frontend's production whole-frame
        # dispatch body (render fwd+bwd with language dropped + stats off,
        # pose/exposure Adam, SE(3) retraction) timed per iteration, vs
        # the bare pose-grad render fwd+bwd to isolate the optimizer/loss
        # share. Production regime: --n 15000 --tile 32 --max-instances
        # <demand-sized> (PERF.md tile-size table).
        from online_lang_splatting_tpu.slam import losses as L
        from online_lang_splatting_tpu.slam.frontend import tracking_run
        from online_lang_splatting_tpu.slam.renderer import (
            RenderInputs, render as slam_render,
        )

        inputs = RenderInputs(
            xyz=means, opacity=opac, scales=scales,
            quats=quats / jnp.linalg.norm(quats, axis=-1, keepdims=True),
            shs=shs, language=lang,
        )
        gt_img = jnp.asarray(rng.uniform(size=(3, h, w)), jnp.float32)
        gt_dep = jnp.full((1, h, w), 3.0, jnp.float32)
        mask = jnp.ones((1, h, w), jnp.float32)
        lrs3 = (jnp.float32(1e-3), jnp.float32(3e-3), jnp.float32(0.01))
        k_iters = 16

        def whole(view0):
            return tracking_run(
                inputs, view0, proj, gt_img, gt_dep, mask,
                jnp.float32(0.0), jnp.float32(0.0), lrs3,
                settings=settings, max_iters=k_iters,
            )

        out = whole(view)
        jax.block_until_ready(out)
        for _ in range(3):
            t0 = time.time()
            out = whole(view)
            # Force the loop AND the final render (CLAUDE.md: fetch
            # scalars that data-depend on the outputs).
            n_it, med = jax.device_get((out[3], out[5]))
            n_it = int(n_it)
            dt = time.time() - t0
            print(f"  tracking dispatch ({n_it} iters + final render): "
                  f"{1e3 * dt:.1f} ms = {1e3 * dt / max(n_it, 1):.1f} ms/iter")

        # Bare render fwd+bwd with pose grads (the loop body minus Adam).
        track_inputs = inputs._replace(language=jnp.zeros((n, 0), jnp.float32))
        loop_settings = settings._replace(stats=False)

        def pose_loss(rho, theta):
            o = slam_render(
                track_inputs, view, proj, loop_settings,
                cam_trans_delta=rho, cam_rot_delta=theta,
            )
            return L.loss_tracking_rgbd(
                o.color, o.depth, o.opacity, gt_img, gt_dep, mask,
                jnp.float32(0.0), jnp.float32(0.0),
            )

        z3 = jnp.zeros(3, jnp.float32)
        gfn = jax.jit(jax.value_and_grad(pose_loss, argnums=(0, 1)))
        r = jax.block_until_ready(gfn(z3, z3))
        for _ in range(3):
            t0 = time.time()
            for _ in range(5):
                r = gfn(z3, z3)
            jax.block_until_ready(r)
            print(f"  bare pose-grad render fwd+bwd: "
                  f"{1e3 * (time.time() - t0) / 5:.1f} ms")
        return 0

    if args.stage in (1, 2):
        def fwd(means, opac, scales, lang):
            out = rasterize(
                means, opac, scales, quats, shs=shs, language_features=lang,
                viewmatrix=view, projmatrix=proj, settings=settings,
            )
            return out

        if args.stage == 1:
            f = jax.jit(lambda *a: fwd(*a).color.sum())
        else:
            f = jax.jit(jax.grad(
                lambda *a: fwd(*a).color.sum()
                + fwd(*a).language.sum() + fwd(*a).depth.sum()
            ))
        t0 = time.time()
        r = jax.block_until_ready(f(means, opac, scales, lang))
        print(f"stage {args.stage} compile+run {time.time()-t0:.1f}s")
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(f(means, opac, scales, lang))
            print(f"  run {1e3*(time.time()-t0):.1f} ms")
        return 0

    # Stages 3/4: mapping.
    params = G.empty_params(cap, sh_degree=0, lang_dim=15)
    aux = G.empty_aux(cap)
    opt = G.init_adam(params)
    params, aux, opt, _ = G.extend_points(
        params, aux, opt, xyz=means, rgb=jnp.asarray(rng.uniform(size=(n, 3)), jnp.float32),
        valid=jnp.ones((n,), bool), kf_id=0,
    )
    s = 12
    z3 = jnp.zeros((s, 3), jnp.float32)
    zs = jnp.zeros((s,), jnp.float32)
    images = jnp.asarray(rng.uniform(size=(s, 3, h, w)), jnp.float32)
    depths = jnp.full((s, 1, h, w), 3.0, jnp.float32)
    langs = jnp.asarray(rng.normal(size=(s, 15, 192, 192)) * 0.1, jnp.float32)
    lrs = G.LearningRates(*[jnp.float32(1e-3)] * 7)

    if args.stage == 3:
        from online_lang_splatting_tpu.slam.backend import mapping_iteration

        t0 = time.time()
        out = mapping_iteration(
            params, opt, aux, proj,
            jnp.broadcast_to(jnp.eye(3), (s, 3, 3)), z3[:, :3] * 0,
            zs, zs,
            (z3, z3, zs, zs), (z3, z3, zs, zs), zs,
            images, depths, langs,
            jnp.ones((s,), bool), jnp.ones((s,), bool),
            jnp.asarray([False] + [True] * (s - 1)), jnp.ones((s,), bool),
            lrs, jnp.float32(1.0),
            settings=settings, n_slots=s, init_mode=False,
        )
        jax.block_until_ready(out[0].xyz)
        print(f"stage 3 compile+run {time.time()-t0:.1f}s loss={float(out[9]):.3f}")
        t0 = time.time()
        out = mapping_iteration(
            params, opt, aux, proj,
            jnp.broadcast_to(jnp.eye(3), (s, 3, 3)), z3[:, :3] * 0,
            zs, zs,
            (z3, z3, zs, zs), (z3, z3, zs, zs), zs,
            images, depths, langs,
            jnp.ones((s,), bool), jnp.ones((s,), bool),
            jnp.asarray([False] + [True] * (s - 1)), jnp.ones((s,), bool),
            lrs, jnp.float32(1.0),
            settings=settings, n_slots=s, init_mode=False,
        )
        jax.block_until_ready(out[0].xyz)
        print(f"  warm run {time.time()-t0:.2f}s")
        return 0

    if args.stage == 8:
        # Init-mode chunk: ONE live slot, early-init Gaussian count, 64
        # iterations per dispatch — the init-phase building block.
        from online_lang_splatting_tpu.slam.backend import make_mapping_chunk

        n_iters = 64
        n_win = s - 2
        lr_cfg = (0.00016, 0.0000016, 0.01, 30000)
        fn = make_mapping_chunk(settings, s, n_iters, True, lr_cfg, None)
        k = 16
        stack_imgs = jnp.asarray(rng.uniform(size=(k, 3, h, w)), jnp.float32)
        stack_deps = jnp.full((k, 1, h, w), 3.0, jnp.float32)
        stack_langs = jnp.asarray(
            rng.normal(size=(k, 15, 192, 192)) * 0.1, jnp.float32)
        valid1 = jnp.asarray([True] + [False] * (n_win - 1))
        chunk_args = (
            params, opt, aux, proj,
            jnp.broadcast_to(jnp.eye(3), (n_win, 3, 3)),
            jnp.zeros((n_win, 3), jnp.float32),
            jnp.zeros((n_win,), jnp.float32), jnp.zeros((n_win,), jnp.float32),
            stack_imgs[:n_win], stack_deps[:n_win], stack_langs[:n_win],
            valid1, valid1,
            jnp.zeros((s,), bool), jnp.asarray([True] + [False] * (s - 1)),
            (z3, z3, zs, zs), (z3, z3, zs, zs), zs,
            stack_imgs, stack_deps, stack_langs, jnp.zeros((k,), bool),
            jnp.zeros((n_iters, 2), jnp.int32),
            jnp.zeros((n_iters, 2), bool),
            jnp.broadcast_to(jnp.eye(3), (n_iters, 2, 3, 3)),
            jnp.zeros((n_iters, 2, 3), jnp.float32),
            jnp.zeros((n_iters, 2), jnp.float32),
            jnp.zeros((n_iters, 2), jnp.float32),
            jnp.float32(0.0), lrs, jnp.float32(1.0),
        )
        t0 = time.time()
        out = fn(*chunk_args)
        jax.block_until_ready(out[0].xyz)
        print(f"stage 8 (init chunk 64, n={args.n}) compile+run "
              f"{time.time()-t0:.1f}s")
        for _ in range(2):
            t0 = time.time()
            jax.block_until_ready(fn(*chunk_args)[0].xyz)
            dt = time.time() - t0
            print(f"  warm run {dt:.2f}s ({1e3*dt/n_iters:.0f} ms/iter)")
        return 0

    if args.stage in (4, 5, 6):
        from online_lang_splatting_tpu.slam.backend import make_mapping_chunk

        n_iters = {4: 4, 5: 16, 6: 64}[args.stage]
        n_win = s - 2
        lr_cfg = (0.00016, 0.0000016, 0.01, 30000)
        fn = make_mapping_chunk(settings, s, n_iters, False, lr_cfg, None)
        k = 16  # stack rows
        stack_imgs = jnp.asarray(rng.uniform(size=(k, 3, h, w)), jnp.float32)
        stack_deps = jnp.full((k, 1, h, w), 3.0, jnp.float32)
        stack_langs = jnp.asarray(
            rng.normal(size=(k, 15, 192, 192)) * 0.1, jnp.float32)
        t0 = time.time()
        out = fn(
            params, opt, aux, proj,
            jnp.broadcast_to(jnp.eye(3), (n_win, 3, 3)),
            jnp.zeros((n_win, 3), jnp.float32),
            jnp.zeros((n_win,), jnp.float32), jnp.zeros((n_win,), jnp.float32),
            stack_imgs[:n_win], stack_deps[:n_win], stack_langs[:n_win],
            jnp.ones((n_win,), bool), jnp.ones((n_win,), bool),
            jnp.asarray([False] + [True] * (s - 1)), jnp.ones((s,), bool),
            (z3, z3, zs, zs), (z3, z3, zs, zs), zs,
            stack_imgs, stack_deps, stack_langs, jnp.ones((k,), bool),
            jnp.asarray(rng.integers(0, k, (n_iters, 2)), jnp.int32),
            jnp.ones((n_iters, 2), bool),
            jnp.broadcast_to(jnp.eye(3), (n_iters, 2, 3, 3)),
            jnp.zeros((n_iters, 2, 3), jnp.float32),
            jnp.zeros((n_iters, 2), jnp.float32),
            jnp.zeros((n_iters, 2), jnp.float32),
            jnp.float32(0.0), lrs, jnp.float32(1.0),
        )
        jax.block_until_ready(out[0].xyz)
        print(f"stage {args.stage} (chunk {n_iters}) compile+run {time.time()-t0:.1f}s "
              f"losses={np.asarray(out[9])[:4]}")
        t0 = time.time()
        jax.block_until_ready(fn(
            params, opt, aux, proj,
            jnp.broadcast_to(jnp.eye(3), (n_win, 3, 3)),
            jnp.zeros((n_win, 3), jnp.float32),
            jnp.zeros((n_win,), jnp.float32), jnp.zeros((n_win,), jnp.float32),
            stack_imgs[:n_win], stack_deps[:n_win], stack_langs[:n_win],
            jnp.ones((n_win,), bool), jnp.ones((n_win,), bool),
            jnp.asarray([False] + [True] * (s - 1)), jnp.ones((s,), bool),
            (z3, z3, zs, zs), (z3, z3, zs, zs), zs,
            stack_imgs, stack_deps, stack_langs, jnp.ones((k,), bool),
            jnp.asarray(rng.integers(0, k, (n_iters, 2)), jnp.int32),
            jnp.ones((n_iters, 2), bool),
            jnp.broadcast_to(jnp.eye(3), (n_iters, 2, 3, 3)),
            jnp.zeros((n_iters, 2, 3), jnp.float32),
            jnp.zeros((n_iters, 2), jnp.float32),
            jnp.zeros((n_iters, 2), jnp.float32),
            jnp.float32(0.0), lrs, jnp.float32(1.0),
        )[0].xyz)
        print(f"  warm run {time.time()-t0:.2f}s "
              f"({1e3*(time.time()-t0)/n_iters:.0f} ms/iter)")
        return 0


if __name__ == "__main__":
    sys.exit(main())
