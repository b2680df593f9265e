#!/usr/bin/env python
"""Benchmark: dense language-feature-map throughput on one TPU chip.

Measures the headline number of the reference (>40 FPS for 192x192x768
CLIP feature maps via SED ConvNeXt-L + HR head on an RTX A4500,
README.md:29) on our fused JAX pipeline: frame -> normalize -> resize 768²
-> ConvNeXt-L dense CLIP -> HR refinement -> (192,192,768), plus the
15-d autoencoder encode. Prints ONE JSON line.

Runs the measurement in a WATCHDOG-SUPERVISED child process: the remote
compile relay intermittently wedges a client (0% CPU, no output, forever
— see CLAUDE.md); when the child makes no progress for WATCHDOG_S the
parent kills it, waits out the tunnel, and retries, so an unattended
bench invocation still reports a number.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

BASELINE_FPS = 40.0  # reference claim on RTX A4500


def _retry_sleep(default: float) -> float:
    """Backoff before a retry, letting the TPU relay settle. Env-tunable
    so the harness tests don't pay real relay-settle time for fake
    children (OLS_BENCH_RETRY_SLEEP=0)."""
    return float(os.environ.get("OLS_BENCH_RETRY_SLEEP", default))
# Per-attempt deadlines: the first tolerates a healthy-but-degraded relay
# compile (observed 15+ min for this extractor program when the relay is
# slow, CLAUDE.md); retries run against a now-warm compile cache, where
# only a true wedge (which never ends) can exceed minutes.
DEADLINES_S = (1800.0, 600.0, 600.0)


def _measure(q):
    # Harness test hooks (tests/test_bench_harness.py): fake a
    # measurement / a crash / a wedge without touching the TPU.
    fake = os.environ.get("OLS_BENCH_FAKE")
    if fake == "crash":
        raise RuntimeError("fake child crash")
    if fake == "hang":
        time.sleep(3600)
    if fake:
        q.put(float(fake))
        return

    import jax

    # Persistent compile cache: the ConvNeXt-L 768² program is a long
    # compile through the remote-compile tunnel; cache it across runs.
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from online_lang_splatting_tpu.models.sed import LangFeatureExtractor

    # bf16 conv towers (the reference's own eval encoder runs fp16;
    # bf16-vs-f32 code cosine is 0.99996). The AE stays f32.
    # With OLS_WEIGHTS_DIR set (tools/verify_artifacts.py), the bench
    # runs on REAL converted weights instead of random init.
    wdir = os.environ.get("OLS_WEIGHTS_DIR")
    trees = {}
    if wdir:
        from pathlib import Path

        from online_lang_splatting_tpu.models.checkpoints import (
            load_npz_tree,
        )

        for key, fname in (("visual_params", "clip_visual.npz"),
                           ("hr_variables", "hr_net.npz"),
                           ("ae_variables", "autoencoder.npz")):
            p = Path(wdir) / fname
            if p.exists():
                trees[key] = load_npz_tree(p)
    extractor = LangFeatureExtractor(
        rng=jax.random.key(0), compute_dtype=jnp.bfloat16, **trees
    )
    # Distinct frames each call — identical-input loops can be elided by
    # runtime caching layers and report fictitious throughput.
    rng = np.random.default_rng(0)
    frames = [
        jnp.asarray(rng.uniform(0, 255, (680, 1200, 3)), dtype=jnp.float32)
        for _ in range(16)
    ]

    def run(f):
        return extractor._encode_frame(
            extractor.visual_params, extractor.hr_variables,
            extractor.ae_variables, f,
        )

    out = jax.block_until_ready(run(frames[0]))  # compile single-frame path
    assert out.shape == (192, 192, 15), out.shape

    # Throughput: ONE dispatch scans all N distinct device-resident frames
    # on-chip (lax.map over a stacked batch) and returns a single scalar
    # that data-depends on every output — real completion is forced by the
    # scalar fetch, and the remote relay's per-dispatch overhead (~3 ms/
    # frame when dispatching frames separately — measured r4f: 56.75 FPS
    # dispatched vs 69.6 FPS on-chip) is paid once, not per frame. Params
    # ride as jit args (closure constants blow the relay body limit,
    # HTTP 413).
    stack = jnp.stack(frames)  # (N, 680, 1200, 3), device-resident

    @jax.jit
    def run_all(vp, hv, av, fs):
        outs = jax.lax.map(
            lambda f: extractor._encode_frame(vp, hv, av, f), fs
        )
        return jnp.sum(outs.astype(jnp.float32))

    args = (extractor.visual_params, extractor.hr_variables,
            extractor.ae_variables, stack)
    _ = float(run_all(*args))  # compile scanned program
    null = jax.jit(lambda x: jnp.sum(x) * 0.0 + 1.0)
    probe = jnp.zeros((8,), jnp.float32)
    _ = float(null(probe))

    n = len(frames)  # all-distinct inputs defeat any result caching
    ts, rtt0 = [], []
    for _i in range(5):
        t0 = time.time()
        _ = float(run_all(*args))
        ts.append(time.time() - t0)
        t0 = time.time()
        _ = float(null(probe))
        rtt0.append(time.time() - t0)
    dt = max(float(np.median(ts) - np.median(rtt0)), 1e-6) / n

    # Single-frame LATENCY (what SLAM's per-keyframe extraction pays,
    # backend.py ensure_lang_features): dispatch ONE frame through the
    # already-compiled _encode_frame program, then fetch a scalar that
    # data-depends on its output. (Wrapping run() in a fresh
    # jit(sum(run(f))) would recompile the whole ConvNeXt-L pipeline —
    # a second multi-minute compile whose request has also blown the
    # remote relay's body limit, HTTP 413.) The null measurement — the
    # same scalar fetch on a resident output — is subtracted, removing
    # the tunnel round trip + small-program overhead.
    small_sum = jax.jit(jnp.sum)
    _ = float(small_sum(out))  # compile tiny summer
    rtts, lats = [], []
    for f in frames[:8]:
        t0 = time.time()
        _ = float(small_sum(out))
        rtts.append(time.time() - t0)
        t0 = time.time()
        _ = float(small_sum(run(f)))
        lats.append(time.time() - t0)
    latency_ms = (np.median(lats) - np.median(rtts)) * 1000.0
    q.put((1.0 / dt, latency_ms))


def main():
    ctx = mp.get_context("spawn")
    for attempt, deadline in enumerate(DEADLINES_S):
        q = ctx.Queue()
        child = ctx.Process(target=_measure, args=(q,), daemon=True)
        child.start()
        child.join(deadline)
        if not q.empty():
            got = q.get()
            fps, latency_ms = got if isinstance(got, tuple) else (got, None)
            child.join(5)
            out = {
                "metric": "lang_feature_map_fps_192x192x768",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
            if latency_ms is not None:
                # Single-frame device latency (null-RTT-corrected; the
                # throughput above pipelines 16 dispatches).
                out["latency_ms"] = round(latency_ms, 1)
            print(json.dumps(out))
            return 0
        if child.is_alive():
            # Wedged: kill by PID (never by pattern), let the tunnel
            # settle, retry against the (partially) warmed cache.
            child.terminate()
            child.join(10)
            if child.is_alive():
                child.kill()
                child.join(10)
            print(f"[bench] attempt {attempt + 1} made no progress in "
                  f"{deadline:.0f}s (relay wedge?) — retrying",
                  file=sys.stderr, flush=True)
            time.sleep(_retry_sleep(90.0))
        else:
            # Crashed with an exception (its traceback went to stderr).
            # Transient relay errors ("Broken pipe") deserve a retry;
            # deterministic failures will just fail fast again.
            print(f"[bench] attempt {attempt + 1} exited with code "
                  f"{child.exitcode} — retrying", file=sys.stderr,
                  flush=True)
            time.sleep(_retry_sleep(10.0))
    print(json.dumps({
        "metric": "lang_feature_map_fps_192x192x768",
        "value": 0.0,
        "unit": "frames/s",
        "vs_baseline": 0.0,
        "error": "no attempt completed (remote relay unavailable)",
    }))
    return 1


if __name__ == "__main__":
    os.environ.setdefault("JAX_PLATFORMS", "")  # axon default platform
    sys.exit(main())
