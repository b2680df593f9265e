#!/usr/bin/env python
"""Stage-level profile + A/B of the fused language-feature extractor.

Times each stage of the frame -> (192,192,15) pipeline (the 59-FPS
headline path, models/sed.py) as its OWN jitted program with
device-resident inputs and scalar-fetch completion (CLAUDE.md: bare
block_until_ready reports fictitious timings through the remote tunnel),
plus the full fused program under both ConvTranspose lowerings
(OLS_HR_CONVT=xla vs phase — models/hr_net.py:PhaseConvTranspose2x).

    python tools/extractor_profile.py [--iters 12] [--json out.json]

Stages:
  preprocess   normalize + bilinear resize 680x1200 -> 768²
  trunk        ConvNeXt-L stem + 4 stages (pyramid dict)
  head         per-location CLIP projection (os32 -> 768)
  hr_xla       HR refinement head, nn.ConvTranspose lowering
  hr_phase     HR refinement head, polyphase 2x2 decomposition
  ae           768 -> 15 AE encode at 192²
  full_xla     fused frame -> 15-d map (ConvTranspose via XLA)
  full_phase   fused frame -> 15-d map (polyphase)
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def _med_time(fn, args, iters):
    """Median seconds/call: per-call scalar fetch forces completion; the
    null round-trip (same fetch of a trivial program) is subtracted.

    Weight trees MUST ride in `args`, never in a closure: a closed-over
    tree is baked into the HLO as constants, and ConvNeXt-L's ~200M
    params blow the remote relay's request-body limit (HTTP 413 —
    observed in /tmp/hwq_r4e/54)."""
    import jax
    import jax.numpy as jnp

    run = jax.jit(lambda *a: jnp.sum(fn(*a)))
    null = jax.jit(lambda x: jnp.sum(x) * 0.0 + 1.0)
    probe = jnp.zeros((8,), jnp.float32)
    _ = float(run(*args))  # compile
    _ = float(null(probe))
    ts, rtts = [], []
    for _i in range(iters):
        t0 = time.time()
        _ = float(null(probe))
        rtts.append(time.time() - t0)
        t0 = time.time()
        _ = float(run(*args))
        ts.append(time.time() - t0)
    return max(float(np.median(ts) - np.median(rtts)), 0.0)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from online_lang_splatting_tpu.models.convnext_clip import (
        normalize_image, resize_bilinear,
    )
    from online_lang_splatting_tpu.models.sed import LangFeatureExtractor

    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.uniform(0, 255, (680, 1200, 3)), jnp.float32)
    results: dict[str, float] = {}

    def report(name, secs, flops=None):
        results[name] = secs * 1e3
        line = f"{name:<12} {secs * 1e3:8.2f} ms"
        # secs can clamp to 0.0 when the stage is faster than the
        # null-RTT median (seen on the AE stage, hwq_r4h) — skip the
        # rate rather than dividing by zero.
        if flops and secs > 0:
            line += f"   {flops / secs / 1e12:6.1f} TFLOP/s"
        print(line, flush=True)

    os.environ["OLS_HR_CONVT"] = "xla"
    ex = LangFeatureExtractor(rng=jax.random.key(0),
                              compute_dtype=jnp.bfloat16)

    # Stage inputs (device-resident, bf16 as in the fused path).
    x768 = jax.block_until_ready(
        resize_bilinear(normalize_image(frame)[None].astype(jnp.bfloat16),
                        (768, 768)))
    feats = jax.block_until_ready(
        ex.visual.apply({"params": ex.visual_params}, x768))

    report("preprocess", _med_time(
        lambda f: resize_bilinear(
            normalize_image(f)[None].astype(jnp.bfloat16), (768, 768)),
        (frame,), args.iters))

    # Trunk: stem + stages only (head excluded via res5 output).
    trunk_s = _med_time(
        lambda p, x: ex.visual.apply({"params": p}, x)["res5"],
        (ex.visual_params, x768), args.iters)
    report("trunk", trunk_s, flops=809e9)

    # clip_vis_dense depends on res5, so this row is the WHOLE tower
    # (trunk + projection head) — the r4 PERF table's "head 9.9 ms
    # standalone" misread it as head-only (VERDICT r5 #8).
    tower_s = _med_time(
        lambda p, x: ex.visual.apply(
            {"params": p}, x)["clip_vis_dense"],
        (ex.visual_params, x768), args.iters)
    report("tower_full", tower_s)
    # The true in-tower head cost: the 24x24x(1536->1536->768) MLP diff.
    # Can go slightly negative under relay timing noise.
    report("head_diff", max(tower_s - trunk_s, 0.0))

    hr_in = (feats["clip_vis_dense"], feats["res3"], feats["res2"])
    # Reuse ex's weight trees: re-initializing ConvNeXt-L per variant
    # wastes minutes through the relay.
    trees = dict(visual_params=ex.visual_params,
                 hr_variables=ex.hr_variables,
                 ae_variables=ex.ae_variables)
    for mode in ("xla", "phase"):
        os.environ["OLS_HR_CONVT"] = mode
        hr_ex = LangFeatureExtractor(compute_dtype=jnp.bfloat16, **trees)
        report(f"hr_{mode}", _med_time(
            lambda v, a, b, c, _e=hr_ex: _e.hr.apply(v, a, b, c),
            (hr_ex.hr_variables,) + hr_in, args.iters), flops=103e9)

    os.environ["OLS_HR_CONVT"] = "xla"
    hr_out = jax.block_until_ready(
        ex.hr.apply(ex.hr_variables, *hr_in).astype(jnp.float32))
    from online_lang_splatting_tpu.models.autoencoder import AutoencoderMLP

    report("ae", _med_time(
        lambda v, h, _e=ex: _e.ae.apply(
            v, h.reshape(-1, h.shape[-1]),
            method=AutoencoderMLP.encode),
        (ex.ae_variables, hr_out), args.iters), flops=29e9)

    for mode in ("xla", "phase"):
        os.environ["OLS_HR_CONVT"] = mode
        f_ex = LangFeatureExtractor(compute_dtype=jnp.bfloat16, **trees)
        secs = _med_time(
            lambda vp, hv, av, f, _e=f_ex: _e._encode_frame(vp, hv, av, f),
            (f_ex.visual_params, f_ex.hr_variables, f_ex.ae_variables,
             frame), args.iters)
        report(f"full_{mode}", secs, flops=940e9)
        if secs > 0:
            print(f"  -> {1.0 / secs:6.1f} FPS single-stream")

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
