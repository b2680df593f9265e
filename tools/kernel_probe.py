#!/usr/bin/env python
"""Rasterizer cost decomposition probe (round-3 perf work).

Times the production pipeline pieces on the real chip at Replica scale.
All numbers carry a constant harness bias (~3-4 ms: tunnel dispatch +
scalar fetch / iters) — diff pairs of rows to isolate stages.

Variants:
  pieces    — preprocess / binning (sorted) / pack / core fwd / core
              fwd+bwd on pre-binned device inputs.
  micro     — sort / gather / scatter / cummax micro-benchmarks that
              motivated the design (docstrings in ops/raster/binning.py).

Usage: python tools/kernel_probe.py [--variants pieces,micro]
"""

import argparse
import functools
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--variants", type=str, default="pieces")
    ap.add_argument("--cap", type=int, default=1 << 20)
    ap.add_argument("--platform", type=str, default=None,
                    help="e.g. cpu — smoke-test probe code off-TPU")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    import numpy as np

    from online_lang_splatting_tpu.ops import graphics
    from online_lang_splatting_tpu.ops.raster import binning as BN
    from online_lang_splatting_tpu.ops.raster import config as C
    from online_lang_splatting_tpu.ops.raster import preprocess as PP
    from online_lang_splatting_tpu.ops.raster import tiled as T

    h, w = 680, 1200
    fx = fy = 600.0
    rng = np.random.default_rng(0)
    n = args.n
    tile = C.DEFAULT_TILE
    max_instances = args.cap
    tan_fovx, tan_fovy = w / (2 * fx), h / (2 * fy)
    proj = graphics.projection_matrix(0.01, 100.0, w / 2, h / 2, fx, fy, w, h)
    view = jnp.eye(4)

    means = jnp.asarray(
        np.stack([
            rng.uniform(-3, 3, n), rng.uniform(-2, 2, n),
            rng.uniform(2.0, 8.0, n),
        ], 1), jnp.float32)
    scales = jnp.asarray(rng.uniform(0.005, 0.025, (n, 3)), jnp.float32)
    quats = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.2, 0.9, n), jnp.float32)
    shs = jnp.asarray(rng.normal(size=(n, 1, 3)) * 0.3, jnp.float32)
    lang = jnp.asarray(rng.normal(size=(n, 15)) * 0.1, jnp.float32)

    tiles_x = (w + tile - 1) // tile
    tiles_y = (h + tile - 1) // tile
    num_tiles = tiles_x * tiles_y

    def timeit(name, f, *a, iters=10):
        r = jax.block_until_ready(f(*a))
        fetch = jax.jit(
            lambda r: sum(jnp.sum(jnp.asarray(x).astype(jnp.float32))
                          for x in jax.tree.leaves(r)))
        _ = float(fetch(r))
        t0 = time.time()
        for _ in range(iters):
            r = f(*a)
        _ = float(fetch(r))
        print(f"  {name}: {1e3 * (time.time() - t0) / iters:.2f} ms",
              flush=True)

    variants = args.variants.split(",")

    @jax.jit
    def prep_and_bin(means, scales, quats, opac, shs):
        prep = PP.preprocess(
            means, scales, quats, opac, view, proj @ view, jnp.zeros(3),
            shs=shs, sh_degree=0, width=w, height=h,
            tan_fovx=tan_fovx, tan_fovy=tan_fovy, tile=tile,
        )
        b = BN.bin_gaussians_sorted(
            prep, tiles_x=tiles_x, tiles_y=tiles_y,
            max_instances=max_instances, chunk=T.CHUNK,
        )
        return prep, b

    prep_d, bin_d = jax.block_until_ready(
        prep_and_bin(means, scales, quats, opac, shs))
    print(f"instances={int(bin_d.num_instances)} "
          f"chunks={bin_d.cont.shape[0]} "
          f"active={int(np.sum(np.asarray(bin_d.cont) >= 0))}", flush=True)

    if "pieces" in variants:
        timeit("preprocess-only", jax.jit(
            lambda m, s, q, o, sh: PP.preprocess(
                m, s, q, o, view, proj @ view, jnp.zeros(3), shs=sh,
                sh_degree=0, width=w, height=h, tan_fovx=tan_fovx,
                tan_fovy=tan_fovy, tile=tile)),
            means, scales, quats, opac, shs)
        timeit("binning-sorted-only", jax.jit(functools.partial(
            BN.bin_gaussians_sorted, tiles_x=tiles_x, tiles_y=tiles_y,
            max_instances=max_instances, chunk=T.CHUNK)), prep_d)
        timeit("pack-only", jax.jit(
            lambda prep, lang, sg: T._pack_instances(
                prep.xy, prep.conic, prep.opacity, prep.color, lang,
                jnp.where(prep.valid, prep.depth, 0.0), sg)[0:2]),
            prep_d, lang, bin_d.s_gid)

        lim = jnp.full((1,), h, jnp.int32)
        z0 = jnp.zeros((0,), jnp.int32)

        def core_fwd(prep, lang, b):
            acc, nt = T._blend_core(
                prep.xy, prep.conic, prep.opacity, prep.color, lang,
                jnp.where(prep.valid, prep.depth, 0.0),
                b.s_gid, b.s_tile, b.starts, b.cont, b.tile_counts,
                z0, z0, z0, lim, tile, w, h, "scatter", True,
                T.C.MULTISEG, T.C.SCAN_MXU,
            )
            return acc.sum() + nt.sum()

        timeit("core-fwd (pack+kernel)", jax.jit(core_fwd),
               prep_d, lang, bin_d)

        def core_bwd(xy, conic, opac_, color, lang_, depth_, b):
            def f(xy, conic, opac_, color, lang_, depth_):
                acc, _ = T._blend_core(
                    xy, conic, opac_, color, lang_, depth_,
                    b.s_gid, b.s_tile, b.starts, b.cont, b.tile_counts,
                    z0, z0, z0, lim, tile, w, h, "scatter", True,
                    T.C.MULTISEG, T.C.SCAN_MXU,
                )
                return acc.sum()
            return jax.grad(f, argnums=(0, 1, 2, 3, 4, 5))(
                xy, conic, opac_, color, lang_, depth_)

        timeit("core-fwd+bwd (pack+kernels+scatter)", jax.jit(core_bwd),
               prep_d.xy, prep_d.conic, prep_d.opacity, prep_d.color,
               lang, jnp.where(prep_d.valid, prep_d.depth, 0.0), bin_d)

    if "binpieces" in variants:
        # Cumulative-prefix timings of the binning pipeline stages — diff
        # consecutive rows to isolate a stage. Cross-checks: the last row
        # should match "binning-sorted-only" from the pieces variant.
        cap = max_instances

        def st1(prep):
            return BN._depth_tables(prep, cap)

        def st2(prep):
            g, tt, off, tot, _ = BN._depth_tables(prep, cap)
            return BN._expand_scatter(g, tt, off, cap), tot

        def st3(prep, run_bound=None):
            g, tt, off, tot, _ = BN._depth_tables(prep, cap)
            v = BN._expand_scatter(g, tt, off, cap)
            rb = jnp.max(tt) if run_bound == "dyn" else None
            return BN._jump_carry(v, min(cap, num_tiles), rb), tot

        def st4(prep):
            v, tot = st3(prep)
            return BN._instance_tiles(v, tot, tiles_x, num_tiles, cap,
                                      tile)

        def st5(prep):
            t_, o_ = st4(prep)
            return BN._key_sort(t_, o_, cap, num_tiles)

        timeit("bin s1 depth-sort+tables", jax.jit(st1), prep_d)
        timeit("bin s2 +expand-scatter", jax.jit(st2), prep_d)
        timeit("bin s3 +jump-carry", jax.jit(st3), prep_d)
        timeit("bin s3 +jump-carry DYN", jax.jit(
            functools.partial(st3, run_bound="dyn")), prep_d)
        timeit("bin s4 +tile+cull", jax.jit(st4), prep_d)
        timeit("bin s5 +key-sort", jax.jit(st5), prep_d)
        timeit("bin full (ranges+cont)", jax.jit(functools.partial(
            BN.bin_gaussians_sorted, tiles_x=tiles_x, tiles_y=tiles_y,
            max_instances=max_instances, chunk=T.CHUNK)), prep_d)
        tt_host = np.asarray(prep_d.tiles_touched)
        print(f"  tiles_touched: max={int(tt_host.max())} "
              f"mean={float(tt_host[tt_host > 0].mean()):.2f} "
              f"p99={int(np.percentile(tt_host[tt_host > 0], 99))}",
              flush=True)

    if "micro" in variants:
        p = n
        cap = max_instances
        key_probe = jnp.asarray(
            (np.random.default_rng(0).integers(0, 3226, cap).astype(np.uint32)
             << 20) | np.arange(cap, dtype=np.uint32))
        timeit("u32-sort(1M)", jax.jit(
            lambda k: jax.lax.sort((k,), num_keys=1)[0]), key_probe)
        gid_probe = jnp.asarray(
            np.random.default_rng(1).integers(0, p, cap), jnp.int32)
        timeit("4B-gather(1M)", jax.jit(
            lambda o, i: o[i]), jnp.arange(p, dtype=jnp.int32), gid_probe)
        ids = jnp.asarray(
            np.random.default_rng(2).integers(0, p, cap), jnp.int32)
        rows = jnp.asarray(
            np.random.default_rng(3).normal(size=(cap, 25)), jnp.float32)
        timeit("scatter-add (1M,25)", jax.jit(
            lambda i, r: jnp.zeros((p, 25), jnp.float32).at[i].add(
                r, mode="drop")), ids, rows)
        timeit("cummax(1M)", jax.jit(jax.lax.cummax),
               jnp.asarray(np.random.default_rng(4).integers(
                   -1, 100, cap), jnp.int32))

    if "scatter" in variants:
        # Alternatives to the backward's per-Gaussian grad reduction
        # (tiled.py:_blend_bwd tail): 1M instance rows, D=25 columns,
        # ~200k distinct Gaussians. Baseline is the wide-row scatter-add.
        p = n
        cap = max_instances
        rng2 = np.random.default_rng(7)
        ids = jnp.asarray(rng2.integers(0, p, cap), jnp.int32)
        rows = jnp.asarray(rng2.normal(size=(cap, 25)), jnp.float32)

        timeit("scatter-add (1M,25) random ids", jax.jit(
            lambda i, r: jnp.zeros((p, 25), jnp.float32).at[i].add(
                r, mode="drop")), ids, rows)

        # Occupancy sensitivity: does a dropped (out-of-range) tail cost?
        ids_65 = jnp.where(jnp.arange(cap) < int(0.65 * cap), ids, p)
        timeit("scatter-add (1M,25) 35% dropped tail", jax.jit(
            lambda i, r: jnp.zeros((p, 25), jnp.float32).at[i].add(
                r, mode="drop")), ids_65, rows)

        # Sorted ids: is XLA's scatter sensitive to monotonic indices?
        ids_sorted = jnp.sort(ids)
        timeit("scatter-add (1M,25) sorted ids", jax.jit(
            lambda i, r: jnp.zeros((p, 25), jnp.float32).at[i].add(
                r, mode="drop")), ids_sorted, rows)

        # Permutation scatter (unique): the emission-reorder path's core.
        perm = jnp.asarray(rng2.permutation(cap), jnp.int32)
        timeit("scatter-set (1M,25) unique perm", jax.jit(
            lambda i, r: jnp.zeros((cap, 25), jnp.float32).at[i].set(
                r, unique_indices=True)), perm, rows)

        # Wide-row gather: the inverse-permutation move.
        timeit("gather (1M,25) perm", jax.jit(
            lambda i, r: r[i]), perm, rows)

        # Segment-reduce in emission order: cumsum(1M,25) + 2x 200k
        # boundary gathers (run starts/ends from binning offsets).
        bounds = jnp.asarray(
            np.sort(rng2.integers(0, cap, p)), jnp.int32)
        def seg_reduce(r, b):
            c = jnp.cumsum(r, axis=0)
            c = jnp.concatenate([jnp.zeros((1, 25), r.dtype), c], 0)
            return c[jnp.minimum(b + 1, cap)] - c[b]
        timeit("cumsum+boundary-gather (1M,25)->(200k,25)",
               jax.jit(seg_reduce), rows, bounds)

        # Full emission chain: gather(inv perm) + cumsum-diff.
        def emission_chain(invp, r, b):
            re = r[invp]
            return seg_reduce(re, b)
        timeit("emission chain: perm-gather + segreduce",
               jax.jit(emission_chain), perm, rows, bounds)

        # Split-scatter: two half-size scatter-adds + one add — does XLA
        # pipeline independent scatters at all?
        def split_scatter(i, r):
            h_ = cap // 2
            a = jnp.zeros((p, 25), jnp.float32).at[i[:h_]].add(
                r[:h_], mode="drop")
            b = jnp.zeros((p, 25), jnp.float32).at[i[h_:]].add(
                r[h_:], mode="drop")
            return a + b
        timeit("2x half scatter-add + add", jax.jit(split_scatter),
               ids, rows)

        # Width sensitivity: D=8 vs D=25 (is cost per-row or per-byte?)
        rows8 = rows[:, :8]
        timeit("scatter-add (1M,8) random ids", jax.jit(
            lambda i, r: jnp.zeros((p, 8), jnp.float32).at[i].add(
                r, mode="drop")), ids, rows8)

        # PRODUCTION reductions head-to-head on REAL binning data (same
        # s_gid/s_emit/emit_start the blend backward would use): this is
        # the number that decides OLS_GRAD_REDUCE.
        b_em = BN.bin_gaussians_sorted(
            prep_d, tiles_x=tiles_x, tiles_y=tiles_y,
            max_instances=max_instances, chunk=T.CHUNK,
            emission_order=True,
        )
        emit_count = prep_d.tiles_touched.astype(jnp.int32)
        sgid = b_em.s_gid

        def prod_scatter(r):
            i = jnp.where(sgid >= 0, sgid, p)
            return jnp.zeros((p, 25), jnp.float32).at[i].add(
                r, mode="drop")
        timeit("PROD scatter-add (real ids)", jax.jit(prod_scatter), rows)

        def prod_emission(r):
            return T._emission_segment_sum(
                r, b_em.s_emit, b_em.emit_start, emit_count, p,
                tiles_x * tiles_y,
            )
        timeit("PROD emission segmented-scan (real perm)",
               jax.jit(prod_emission), rows)


if __name__ == "__main__":
    main()
