#!/bin/bash
# Round-3 hardware validation queue (memory: round3-hardware-pending).
# Run when the TPU tunnel is healthy:  bash tools/hw_queue.sh [logdir]
# Each step is timeout-bounded and logged separately so a wedged remote
# compile can be attributed and the rest of the queue still runs.
set -u
LOG=${1:-/tmp/hwq}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."

step() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%FT%TZ)) ==="
  ( timeout "$tmo" "$@" ) > "$LOG/$name.log" 2>&1
  local rc=$?
  tail -25 "$LOG/$name.log"
  echo "--- $name exit=$rc"
}

# 0. Tunnel sanity (tiny matmul).
step 00_ping 180 python - <<'EOF'
import jax, jax.numpy as jnp
x = jnp.ones((128,128), jnp.bfloat16)
print("ping ok", float((x@x).sum()), jax.devices())
EOF

# 1. Grad-reduction micro-alternatives (decides emission-order viability).
step 01_probe_scatter 1800 python tools/kernel_probe.py --variants scatter

# 2. Saturated fwd+bwd after the scan eliminations (was 96.3 ms).
step 02_stage7_scatter 2400 python tools/tpu_scale_check.py --stage 7

# 3. Same with the emission-order grad reduction (A/B via env).
OLS_GRAD_REDUCE=emission step 03_stage7_emission 2400 \
  python tools/tpu_scale_check.py --stage 7

# 4. Golden parity replay, both reduction modes.
step 04_parity_scatter 2400 python tools/tpu_raster_parity.py
OLS_GRAD_REDUCE=emission step 05_parity_emission 2400 \
  python tools/tpu_raster_parity.py

# 5. Chunk/AE-replay timing decomposition (init non-render overhead).
OLS_CHUNK_TIMING=1 step 06_chunk_timing 3600 \
  python tools/replica_scale_gate.py --max-frames 4 --no-gates

# 6. 40-frame gate: cold + warm (best recorded was 0.036 FPS warm).
step 07_gate40_cold 5400 python tools/replica_scale_gate.py --max-frames 40
step 08_gate40_warm 5400 python tools/replica_scale_gate.py --max-frames 40

# 7. Vectorized multi-segment blend kernels (OLS_MULTISEG): golden
#    parity, then stage-7 A/B vs the baseline numbers from steps 02/03.
#    (The probe scene averages 2.15 segments/chunk — 100% of chunks are
#    multi-segment — so the hybrid path should cut both kernels' VPU
#    time substantially; production scenes average ~3.)
#    Fast Mosaic-lowering smoke for the new vectorized ops (int
#    transpose, flag rolls, per-chunk cond between two big bodies):
#    tiny scene, small compile — isolates a lowering failure in minutes
#    before the heavy steps run.
step 10a_ms_smoke 900 python - <<'EOF'
import jax, jax.numpy as jnp, numpy as np, sys
sys.path.insert(0, "tests")
from helpers import random_scene
from online_lang_splatting_tpu.ops.raster import rasterize
for mode in ("on", "hybrid"):
    scene = random_scene(n=200, width=96, height=64, seed=9,
                         scale_range=(0.01, 0.1))
    st = scene["settings"]._replace(backend="tpu", multiseg=mode)
    def loss(means):
        out = rasterize(
            means, scene["opacities"], scene["scales"], scene["quats"],
            shs=scene["shs"],
            language_features=scene["language_features"],
            viewmatrix=scene["viewmatrix"],
            projmatrix=scene["projmatrix"], settings=st,
            bg=jnp.zeros(3))
        return out.color.sum() + out.depth.sum()
    v, g = jax.jit(jax.value_and_grad(loss))(scene["means3d"])
    assert np.isfinite(float(v)) and np.isfinite(np.asarray(g)).all()
    print(mode, "ok", float(v), flush=True)
EOF

OLS_MULTISEG=hybrid step 10_parity_multiseg 2400 \
  python tools/tpu_raster_parity.py
OLS_MULTISEG=hybrid step 11_stage7_multiseg 2400 \
  python tools/tpu_scale_check.py --stage 7
OLS_MULTISEG=hybrid OLS_GRAD_REDUCE=emission step 12_stage7_ms_emission \
  2400 python tools/tpu_scale_check.py --stage 7
#    Production-occupancy regime (~540k demand in the 1M bucket,
#    ~3.15 segments/chunk): baseline vs hybrid.
step 13_stage7_n15k_base 2400 \
  python tools/tpu_scale_check.py --stage 7 --n 15000
OLS_MULTISEG=hybrid step 14_stage7_n15k_ms 2400 \
  python tools/tpu_scale_check.py --stage 7 --n 15000
#    CHUNK=512 was a round-2 negative with the loop kernels (padding +
#    per-segment VPU working set outgrew the win); the vectorized path
#    pays ~one full-block pass per chunk regardless of segment count,
#    so halving the chunk COUNT may now win. Re-test under hybrid.
OLS_MULTISEG=hybrid OLS_BLEND_CHUNK=512 step 15_stage7_ms_c512 2400 \
  python tools/tpu_scale_check.py --stage 7

# 8. Best-combo 40-frame gate (only meaningful if steps 10-15 look good;
#    quality gates inside catch any parity drift at scale).
OLS_MULTISEG=hybrid OLS_GRAD_REDUCE=emission step 16_gate40_best 5400 \
  python tools/replica_scale_gate.py --max-frames 40

# 9. Headline bench (was 54.75 FPS).
step 09_bench 1800 python bench.py

echo "=== queue done ($(date -u +%FT%TZ)); logs in $LOG ==="
