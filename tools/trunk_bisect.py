"""Bisect the ConvNeXt-L trunk's on-chip time (round-4 VERDICT #5).

The extractor profile pins the trunk at ~13.6 ms / 59 TFLOP/s (~30% MFU)
for a 768^2 bf16 dense encode. The MLP matmuls alone should run far
faster, so something else — depthwise 7x7 convs, LayerNorms, exact-erf
GELU, layer-scale, or the stem — is eating VPU/bandwidth time. This
probe times (a) each stage in isolation and (b) stage-2 single-block
component ablations, all with weights passed as jit ARGS (never
closures: baked ~200M-param constants blow the remote compile relay's
request-body limit, HTTP 413).

Ablations change numerics; they are timing probes only.

Usage: python tools/trunk_bisect.py [--iters 30]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def _med_time(fn, args, iters):
    import jax
    import jax.numpy as jnp

    run = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    null = jax.jit(lambda x: jnp.sum(x) * 0.0 + 1.0)
    probe = jnp.zeros((8,), jnp.float32)
    _ = float(run(*args))  # compile
    _ = float(null(probe))
    ts, rtts = [], []
    for _i in range(iters):
        t0 = time.perf_counter()
        _ = float(run(*args))
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _ = float(null(probe))
        rtts.append(time.perf_counter() - t0)
    return max(float(np.median(ts) - np.median(rtts)), 1e-6)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from online_lang_splatting_tpu.models.convnext_clip import (
        DEPTHS, DIMS, GELU_MODE, ConvNeXtStage, _gelu,
    )

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    def report(name, secs, flops=None):
        msg = f"{name:18s} {secs * 1e3:7.2f} ms"
        if flops:
            msg += f"  {flops / secs / 1e12:6.1f} TFLOP/s"
        print(msg, flush=True)

    # --- per-stage timings at the real 768^2 pyramid shapes -------------
    # stage i input: (1, 768/4/2^max(i-1,0) ...), NHWC.
    sizes = [192, 192, 96, 48, 24]
    stem = nn.Conv(DIMS[0], (4, 4), strides=4, padding="VALID")
    x0 = jax.random.normal(key, (1, 768, 768, 3), dt)
    sp = stem.init(key, x0)["params"]
    sp = jax.tree.map(lambda v: v.astype(dt), sp)
    report("stem", _med_time(
        lambda p_, x_: stem.apply({"params": p_}, x_), (sp, x0), args.iters),
        flops=2 * 768 * 768 / 16 * 3 * 16 * DIMS[0])

    total_flops = 0.0
    for i, (dim, depth) in enumerate(zip(DIMS, DEPTHS)):
        s = sizes[i]
        cin = DIMS[max(i - 1, 0)]
        x = jax.random.normal(key, (1, s, s, cin), dt)
        # gelu_mode is an explicit attribute now — honor the OLS_GELU env
        # knob so stage rows stay A/B-able.
        stage = ConvNeXtStage(dim, depth, downsample=i > 0,
                              gelu_mode=GELU_MODE)
        # init in f32 (bf16 tracing promotes the residual add to f32 and
        # breaks the nn.scan carry), then cast — same recipe as the tower.
        params = stage.init(key, x.astype(jnp.float32))["params"]
        params = jax.tree.map(lambda v: v.astype(dt), params)
        so = sizes[i + 1]
        fl = depth * (
            2 * so * so * dim * 4 * dim * 2      # two MLP matmuls
            + 2 * so * so * dim * 49             # dw conv
        ) + (2 * so * so * cin * 4 * dim if i else 0)
        total_flops += fl
        report(f"stage{i} x{depth}", _med_time(
            lambda p_, x_, _st=stage: _st.apply({"params": p_}, x_),
            (params, x), args.iters), flops=fl)

    # --- stage-2 single-block component ablations -----------------------
    # (48^2, 768ch — 27 of these dominate the trunk's FLOPs.)
    dim, s = DIMS[2], sizes[3]
    x = jax.random.normal(key, (1, s, s, dim), dt)

    class Block(nn.Module):
        dw: bool = True
        ln: bool = True
        gelu: str = "erf"
        mlp: bool = True

        @nn.compact
        def __call__(self, y):
            z = y
            if self.dw:
                z = nn.Conv(dim, (7, 7), padding=3,
                            feature_group_count=dim, name="dwconv")(z)
            if self.ln:
                z = nn.LayerNorm(epsilon=1e-6, name="norm")(z)
            if self.mlp:
                z = nn.Dense(4 * dim, name="fc1")(z)
                if self.gelu == "erf":
                    z = _gelu(z)
                elif self.gelu == "tanh":
                    z = jax.nn.gelu(z, approximate=True)
                z = nn.Dense(dim, name="fc2")(z)
            g = self.param("gamma", nn.initializers.constant(1e-6), (dim,))
            return y + g * z

    variants = {
        "block_full": Block(),
        "block_no_dw": Block(dw=False),
        "block_no_ln": Block(ln=False),
        "block_tanh_gelu": Block(gelu="tanh"),
        "block_no_gelu": Block(gelu="none"),
        "block_mlp_only": Block(dw=False, ln=False, gelu="none"),
        "block_dw_only": Block(mlp=False, ln=False),
    }
    mlp_fl = 2 * s * s * dim * 4 * dim * 2
    for name, mod in variants.items():
        params = mod.init(key, x.astype(jnp.float32))["params"]
        params = jax.tree.map(lambda v: v.astype(dt), params)
        report(name, _med_time(
            lambda p_, x_, _m=mod: _m.apply({"params": p_}, x_),
            (params, x), args.iters),
            flops=mlp_fl if mod.mlp else None)
    print(f"(stage flops total {total_flops / 1e9:.0f} GFLOP)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
