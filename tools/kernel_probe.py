#!/usr/bin/env python
"""Blend-kernel cost decomposition probe (round-3 perf work).

Times pallas_call variants of the forward blend kernel on the real chip
at Replica scale to attribute the per-grid-step cost:

  full     — the production kernel (tiled._fwd_kernel), via blend_tiled's
             own pack+call path but isolated from binning/preprocess.
  noscan   — prefix scans replaced by a single-shift approximation
             (WRONG numerics; isolates the Hillis-Steele roll cost).
  nomatmul — channel-accumulation matmul removed.
  empty    — kernel only zeroes its outputs (grid + block-DMA floor).

Usage: python tools/kernel_probe.py [--variant all]
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
    ap.add_argument("--variants", type=str, default="full,noscan,nomatmul,empty")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

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
    max_instances = 1 << 20
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

    @jax.jit
    def setup(means, scales, quats, opac, shs, lang):
        prep = PP.preprocess(
            means, scales, quats, opac, view, proj @ view, jnp.zeros(3),
            shs=shs, sh_degree=0, width=w, height=h,
            tan_fovx=tan_fovx, tan_fovy=tan_fovy, tile=tile,
        )
        b = BN.bin_gaussians(
            prep, tiles_x=tiles_x, tiles_y=tiles_y,
            max_instances=max_instances, chunk=T.CHUNK,
        )
        geom, feat, f_pad, f_out = T._pack_instances(
            prep.xy, prep.conic, prep.opacity, prep.color, lang,
            jnp.where(prep.valid, prep.depth, 0.0), b.point_list,
        )
        return geom, feat, b.chunk_tile, b.chunk_first, b.chunk_last, b.num_instances

    geom, feat, ct, cf, cl, ni = jax.block_until_ready(
        setup(means, scales, quats, opac, shs, lang))
    f_pad = feat.shape[0]
    f_out = 3 + 15 + 1
    pix = T._pix_pad(tile)
    num_chunks = ct.shape[0]
    print(f"instances={int(ni)} chunks={num_chunks} "
          f"active={int(np.sum(np.asarray(ct) < num_tiles))} f_pad={f_pad}")

    def run_variant(name, kern_factory):
        kern = kern_factory()
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(num_chunks,),
            in_specs=[
                pl.BlockSpec((T.GEOM_ROWS, T.CHUNK), lambda c, *_: (0, c)),
                pl.BlockSpec((f_pad, T.CHUNK), lambda c, *_: (0, c)),
            ],
            out_specs=[
                pl.BlockSpec((1, f_pad, pix),
                             lambda c, ct, cf, cl, lim: (ct[c], 0, 0)),
                pl.BlockSpec((T.NT_ROWS, T.CHUNK),
                             lambda c, *_: (c // T.NT_ROWS, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((1, pix), jnp.float32),
                pltpu.VMEM((1, pix), jnp.float32),
                pltpu.VMEM((f_pad, pix), jnp.float32),
                pltpu.VMEM((T.NT_ROWS, T.CHUNK), jnp.int32),
                pltpu.VMEM((1, pix), jnp.float32),
                pltpu.SMEM((1, 1), jnp.int32),
            ],
        )
        call = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((num_tiles + 1, f_pad, pix), jnp.float32),
                jax.ShapeDtypeStruct((num_chunks, T.CHUNK), jnp.int32),
            ],
        )
        lim = jnp.full((1,), h, jnp.int32)
        f = jax.jit(lambda *a: [x.sum() for x in call(*a)])
        t0 = time.time()
        r = jax.block_until_ready(f(ct, cf, cl, lim, geom, feat))
        print(f"  {name}: compile+run {time.time()-t0:.1f}s")
        _ = [float(x) for x in r]
        t0 = time.time()
        for _ in range(10):
            r = f(ct, cf, cl, lim, geom, feat)
        _ = [float(x) for x in r]
        dt = (time.time() - t0) / 10
        print(f"  {name}: {1e3*dt:.2f} ms  ({1e6*dt/num_chunks:.2f} us/chunk)")

    base = functools.partial(
        T._fwd_kernel, tiles_x=tiles_x, num_tiles=num_tiles, tile=tile,
        pix=pix, f_pad=f_pad, f_out=f_out, width=w, height=h,
    )

    variants = args.variants.split(",")

    # --- end-to-end pieces on pre-binned inputs -------------------------
    @jax.jit
    def prep_and_bin(means, scales, quats, opac, shs):
        prep = PP.preprocess(
            means, scales, quats, opac, view, proj @ view, jnp.zeros(3),
            shs=shs, sh_degree=0, width=w, height=h,
            tan_fovx=tan_fovx, tan_fovy=tan_fovy, tile=tile,
        )
        b = BN.bin_gaussians(
            prep, tiles_x=tiles_x, tiles_y=tiles_y,
            max_instances=max_instances, chunk=T.CHUNK,
        )
        return prep, b

    prep_d, bin_d = jax.block_until_ready(
        prep_and_bin(means, scales, quats, opac, shs))

    def timeit(name, f, *a):
        r = jax.block_until_ready(f(*a))
        fetch = jax.jit(
            lambda r: sum(jnp.sum(jnp.asarray(x).astype(jnp.float32))
                          for x in jax.tree.leaves(r)))
        _ = float(fetch(r))
        t0 = time.time()
        for _ in range(10):
            r = f(*a)
        _ = float(fetch(r))
        print(f"  {name}: {1e3 * (time.time() - t0) / 10:.2f} ms")

    if "pieces" in variants:
        timeit("preprocess-only", jax.jit(
            lambda m, s, q, o, sh: PP.preprocess(
                m, s, q, o, view, proj @ view, jnp.zeros(3), shs=sh,
                sh_degree=0, width=w, height=h, tan_fovx=tan_fovx,
                tan_fovy=tan_fovy, tile=tile)),
            means, scales, quats, opac, shs)
        timeit("binning-only", jax.jit(functools.partial(
            BN.bin_gaussians, tiles_x=tiles_x, tiles_y=tiles_y,
            max_instances=max_instances, chunk=T.CHUNK)), prep_d)
        timeit("pack-only", jax.jit(
            lambda prep, lang, pl_: T._pack_instances(
                prep.xy, prep.conic, prep.opacity, prep.color, lang,
                jnp.where(prep.valid, prep.depth, 0.0), pl_)[0:2]),
            prep_d, lang, bin_d.point_list)
        timeit("core-fwd (pack+kernel+assembly)", jax.jit(
            lambda prep, lang, b: T.blend_tiled.__wrapped__(
                prep, lang, jnp.zeros(3), width=w, height=h, tile=tile,
                max_instances=max_instances).color.sum()
            if hasattr(T.blend_tiled, "__wrapped__") else None),
            prep_d, lang, bin_d) if False else None

        def core_fwd(prep, lang, b):
            acc, nt = T._blend_core(
                prep.xy, prep.conic, prep.opacity, prep.color, lang,
                jnp.where(prep.valid, prep.depth, 0.0),
                b.point_list, b.chunk_tile, b.chunk_first, b.chunk_last,
                b.tile_counts, jnp.full((1,), h, jnp.int32), tile, w, h,
            )
            return acc.sum() + nt.sum()

        timeit("core-fwd (pack+kernel)", jax.jit(core_fwd),
               prep_d, lang, bin_d)

        def core_bwd(xy, conic, opac_, color, lang_, depth_, b):
            def f(xy, conic, opac_, color, lang_, depth_):
                acc, _ = T._blend_core(
                    xy, conic, opac_, color, lang_, depth_,
                    b.point_list, b.chunk_tile, b.chunk_first, b.chunk_last,
                    b.tile_counts, jnp.full((1,), h, jnp.int32), tile, w, h,
                )
                return acc.sum()
            return jax.grad(f, argnums=(0, 1, 2, 3, 4, 5))(
                xy, conic, opac_, color, lang_, depth_)

        timeit("core-fwd+bwd (pack+kernels+scatter)", jax.jit(core_bwd),
               prep_d.xy, prep_d.conic, prep_d.opacity, prep_d.color,
               lang, jnp.where(prep_d.valid, prep_d.depth, 0.0), bin_d)

    if "binparts" in variants:
        # Binning sub-steps (mirrors bin_gaussians internals).
        p = n
        cap = max_instances

        def depth_sort(prep):
            d_key = jnp.where(prep.tiles_touched > 0, prep.depth, jnp.inf)
            return jax.lax.sort(
                (d_key, jnp.arange(p, dtype=jnp.int32)),
                num_keys=1, is_stable=True)

        timeit("bin:depth-presort(P)", jax.jit(depth_sort), prep_d)

        key_probe = jnp.asarray(
            (np.random.default_rng(0).integers(0, 3226, cap).astype(np.uint32)
             << 20) | np.arange(cap, dtype=np.uint32))

        timeit("bin:u32-sort(cap)", jax.jit(
            lambda k: jax.lax.sort((k,), num_keys=1)[0]), key_probe)

        tile_probe = jnp.asarray(
            np.random.default_rng(0).integers(0, 3226, cap), jnp.int32)
        inst_probe = jnp.arange(cap, dtype=jnp.int32)
        timeit("bin:2key-sort(cap)", jax.jit(
            lambda t, i: jax.lax.sort((t, i), num_keys=2)), tile_probe,
            inst_probe)
        d_probe = jnp.asarray(
            np.random.default_rng(0).uniform(1, 9, cap), jnp.float32)
        timeit("bin:3arr-sort(cap) [old]", jax.jit(
            lambda t, d, i: jax.lax.sort((t, d, i), num_keys=2,
                                         is_stable=True)),
            tile_probe, d_probe, inst_probe)

        gid_probe = jnp.asarray(
            np.random.default_rng(1).integers(0, p, cap), jnp.int32)
        timeit("bin:1M-4B-gather", jax.jit(
            lambda o, i: o[i]), jnp.arange(p, dtype=jnp.int32), gid_probe)
        timeit("bin:cummax(slotcap)", jax.jit(
            lambda x: jax.lax.cummax(x)),
            jnp.asarray(np.random.default_rng(2).integers(
                -1, 100, ct.shape[0] * T.CHUNK), jnp.int32))
        gt5 = jnp.asarray(
            np.random.default_rng(3).uniform(size=(p, 5)), jnp.float32)
        timeit("bin:wide5-gather(cap)", jax.jit(
            lambda t, i: t[i]), gt5, gid_probe)

    if "binsteps" in variants:
        # Cumulative prefixes of bin_gaussians; successive diffs isolate
        # each stage (constant harness bias cancels).
        p = n
        cap = max_instances
        from online_lang_splatting_tpu.ops.raster.binning import (
            slot_capacity,
        )

        slot_cap = slot_capacity(cap, num_tiles, T.CHUNK)

        def stage(upto):
            def f(prep):
                tiles_touched = prep.tiles_touched
                d_key = jnp.where(tiles_touched > 0, prep.depth, jnp.inf)
                _, perm = jax.lax.sort(
                    (d_key, jnp.arange(p, dtype=jnp.int32)),
                    num_keys=1, is_stable=True)
                tt_s = tiles_touched[perm]
                cum = jnp.cumsum(tt_s)
                total = cum[-1]
                offsets = (cum - tt_s).astype(jnp.int32)
                if upto == "presort":
                    return perm, total
                gtab = jnp.stack([
                    prep.rect_min[:, 0].astype(jnp.float32),
                    prep.rect_min[:, 1].astype(jnp.float32),
                    jnp.maximum(
                        prep.rect_max[:, 0] - prep.rect_min[:, 0], 1
                    ).astype(jnp.float32),
                    jnp.arange(p, dtype=jnp.float32),
                ], axis=1)
                gtab_s = jnp.concatenate(
                    [offsets[:, None].astype(jnp.float32), gtab[perm]],
                    axis=1)
                inst = jnp.arange(cap, dtype=jnp.int32)
                start_marks = jnp.full((cap,), -1, jnp.int32).at[
                    jnp.where(tt_s > 0, offsets, cap)
                ].max(jnp.arange(p, dtype=jnp.int32), mode="drop")
                gid_c = jnp.maximum(jax.lax.cummax(start_marks), 0)
                rows = gtab_s[gid_c]
                local = inst - rows[:, 0].astype(jnp.int32)
                width = rows[:, 3].astype(jnp.int32)
                tx_ = rows[:, 1].astype(jnp.int32) + local % width
                ty_ = rows[:, 2].astype(jnp.int32) + local // width
                tile_arr = ty_ * tiles_x + tx_
                inst_valid = inst < total
                tile_arr = jnp.where(inst_valid, tile_arr, num_tiles)
                orig = rows[:, 4].astype(jnp.int32)
                if upto == "expand":
                    return tile_arr, orig
                inst_bits = max((cap - 1).bit_length(), 1)
                key = (tile_arr.astype(jnp.uint32) << inst_bits) | \
                    inst.astype(jnp.uint32)
                s_key, s_gid = jax.lax.sort((key, orig), num_keys=1)
                s_tile = (s_key >> inst_bits).astype(jnp.int32)
                if upto == "sort":
                    return s_tile, s_gid
                tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
                starts = jnp.searchsorted(
                    s_tile, tile_ids, side="left").astype(jnp.int32)
                ends = jnp.searchsorted(
                    s_tile, tile_ids, side="right").astype(jnp.int32)
                counts = ends - starts
                if upto == "ranges":
                    return counts, s_gid
                padded = ((counts + T.CHUNK - 1) // T.CHUNK) * T.CHUNK
                pcum = jnp.cumsum(padded)
                pstarts = (pcum - padded).astype(jnp.int32)
                shift_t = pstarts - starts
                shift_marks = jnp.full((cap,), -1, jnp.int32).at[
                    jnp.where(counts > 0, starts, cap)
                ].max(shift_t, mode="drop")
                shift = jnp.maximum(jax.lax.cummax(shift_marks), 0)
                dst = jnp.where(inst_valid, inst + shift, slot_cap)
                point_list = jnp.full((slot_cap,), -1, jnp.int32).at[
                    dst].set(s_gid, mode="drop")
                return point_list, counts
            return f

        for name in ("presort", "expand", "sort", "ranges", "slots"):
            timeit(f"bin[{name}]", jax.jit(stage(name)), prep_d)
        timeit("bin[full]", jax.jit(functools.partial(
            BN.bin_gaussians, tiles_x=tiles_x, tiles_y=tiles_y,
            max_instances=max_instances, chunk=T.CHUNK)), prep_d)

    if "bwdparts" in variants:
        slot_cap = ct.shape[0] * T.CHUNK
        rngg = np.random.default_rng(0)
        dgeom_p = jnp.asarray(
            rngg.normal(size=(T.GEOM_ROWS, slot_cap)), jnp.float32)
        dfeat_p = jnp.asarray(rngg.normal(size=(f_pad, slot_cap)), jnp.float32)
        pl_p = bin_d.point_list

        def scatter_only(dgeom, dfeat, point_list):
            ids = jnp.where(point_list >= 0, point_list, n)
            rows = jnp.concatenate(
                [dgeom[0:6], dfeat[: 3 + 15 + 1]], axis=0).T
            return jnp.zeros((n, rows.shape[1]), jnp.float32).at[ids].add(
                rows, mode="drop")

        timeit("bwd:scatter-only", jax.jit(scatter_only),
               dgeom_p, dfeat_p, pl_p)

    if "full" in variants:
        run_variant("full", lambda: base)

    if "noscan" in variants:
        def make_noscan():
            orig = T._prefix_scan

            def cheap(x, op, fill):
                return op(x, T._shift_down(x, 1, fill))

            def kern(*a, **k):
                T._prefix_scan = cheap
                try:
                    return base(*a, **k)
                finally:
                    T._prefix_scan = orig
            return kern
        run_variant("noscan", make_noscan)

    if "nomatmul" in variants:
        def make_nomm():
            def kern(ct_ref, cf_ref, cl_ref, lim_ref, geom_ref, feat_ref,
                     acc_ref, nt_ref, t_s, done_s, acc_s, nt_s, nc_s, off_s):
                c = pl.program_id(0)
                tile_id = ct_ref[c]
                active = tile_id < num_tiles
                nt_row = jax.lax.rem(c, T.NT_ROWS)

                @pl.when(cf_ref[c] == 1)
                def _():
                    acc_s[...] = jnp.zeros_like(acc_s)
                    t_s[...] = jnp.ones_like(t_s)
                    done_s[...] = jnp.zeros_like(done_s)
                    nc_s[...] = jnp.zeros_like(nc_s)
                    off_s[0, 0] = 0

                @pl.when(active)
                def _():
                    a = T._chunk_alpha(geom_ref[...], tile_id, tiles_x,
                                       tile, pix)
                    cum_t, test_t, contrib, wgt, t_new, done_new = \
                        T._composite(a["alpha"], a["skip"], t_s[...],
                                     done_s[...])
                    acc_s[...] += jnp.sum(wgt, axis=0)[None] * 0.001
                    nt_s[pl.ds(nt_row, 1), :] = jnp.sum(
                        contrib, axis=1, dtype=jnp.int32).reshape(1, T.CHUNK)
                    t_s[...] = t_new
                    done_s[...] = done_new

                @pl.when(~active)
                def _():
                    nt_s[pl.ds(nt_row, 1), :] = jnp.zeros(
                        (1, T.CHUNK), jnp.int32)

                @pl.when(cl_ref[c] == 1)
                def _():
                    acc_ref[...] = acc_s[...][None]

                @pl.when(nt_row == T.NT_ROWS - 1)
                def _():
                    nt_ref[...] = nt_s[...]
            return kern
        run_variant("nomatmul", make_nomm)

    if "empty" in variants:
        def make_empty():
            def kern(ct_ref, cf_ref, cl_ref, lim_ref, geom_ref, feat_ref,
                     acc_ref, nt_ref, t_s, done_s, acc_s, nt_s, nc_s, off_s):
                c = pl.program_id(0)

                @pl.when(cl_ref[c] == 1)
                def _():
                    acc_ref[...] = jnp.full_like(acc_ref, geom_ref[0, 0])

                @pl.when(jax.lax.rem(c, T.NT_ROWS) == T.NT_ROWS - 1)
                def _():
                    nt_ref[...] = jnp.zeros_like(nt_ref)
            return kern
        run_variant("empty", make_empty)


if __name__ == "__main__":
    main()
