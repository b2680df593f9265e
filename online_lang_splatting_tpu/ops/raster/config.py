"""Compile-time constants of the splatting pipeline.

Reference values: NUM_LANGUAGE_CHANNELS 15, BLOCK_X=BLOCK_Y=15 in the
primary engine (/root/reference/submodules/diff-gaussian-rasterization/
cuda_rasterizer/config.h:15-18); the disentangle-optim variant uses 3
language channels and 16x16 tiles. Here tile size is a runtime parameter
of the op (it defines the rect-culling granularity and therefore the
exact output); the kernels pad the pixel block up to TPU-friendly shapes
internally, so any tile size is supported with identical semantics.
"""

NUM_COLOR_CHANNELS = 3
DEFAULT_LANGUAGE_CHANNELS = 15

import os as _os

# Blend tile edge in pixels. 16 is the TPU-preferred default (pixel block
# = 2 sublane rows of 128 lanes); 15 bit-matches the reference engine.
# Env-toggleable for hardware A/B: a LARGER tile (e.g. 32 -> 1024-lane
# blocks) cuts the (Gaussian, tile) instance count — and with it the
# binning sort, pack gather and grad scatter-add, the three biggest
# instance-array costs at saturation — at the price of coarser dead-tail
# granularity and 4x-larger per-segment VPU blocks. Tile size changes
# which pixels a Gaussian can touch (rect-cull granularity, as in the
# CUDA engines), so parity is always judged against the oracle at the
# SAME tile.
DEFAULT_TILE = int(_os.environ.get("OLS_TILE", "16"))

# Instances per blend-kernel grid step; instance buckets are quantized to
# 8 chunks (tiled.CHUNK re-exports this). Env-toggleable for hardware
# A/B probes. Hardware verdicts: 512 WORSE (round 2 — padding and VPU
# working set outgrow the win); 128 WINS the production regime (tile 32,
# demand-sized 221k bucket: fwd+bwd 25.7 vs 29.3 ms, hwq_r4l phase L —
# at tile 32 the pixel block is 4x the t16 one, so halving the instance
# chunk halves the scan working set while the 7-vs-8 Hillis-Steele step
# count barely grows) and is a wash saturated (162.8 vs 158.8 ms at the
# 1M bucket, hwq_r4m 122/123); golden parity replayed clean on hardware
# at c128 (hwq_r4m 120). Default flipped to 128 in round 5.
BLEND_CHUNK = int(_os.environ.get("OLS_BLEND_CHUNK", "128"))

# Blend-loop numerics (forward.cu:464-485).
ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4
NEAR_CLIP = 0.2
LOWPASS = 0.3
N_TOUCHED_T = 0.5

# Exact per-(Gaussian, tile) alpha cull inside the binning expansion
# (output-preserving; see preprocess.tile_keeps_instance). Trades ~6 extra
# carried rows in the expansion's jump-carry for fewer active blend
# chunks; the env toggle exists so hardware probes can A/B it.
PER_TILE_CULL = _os.environ.get("OLS_TILE_CULL", "1") != "0"

# Blend-kernel segment strategy (tiled._fwd_kernel/_bwd_kernel):
#   "off"    — per-segment full-block processing (baseline): every tile
#              segment inside a 256-instance chunk pays a full
#              (CHUNK, pix) alpha chain + transmittance scan. At
#              production occupancy (~650k instances over ~3.2k tiles)
#              chunks average ~2.3 segments, so the kernels do ~2.3x the
#              necessary VPU work.
#   "on"     — vectorized: per-row tile origins + ONE segmented scan per
#              chunk process every segment together; the per-segment loop
#              shrinks to masked matmuls + state updates. (Always-on loses
#              the single-segment dead-tail skip — use "hybrid".)
#   "hybrid" — per-chunk lax.cond: single-segment chunks take the baseline
#              body (with its dead-tail skip), multi-segment chunks the
#              vectorized body. The production candidate.
#   "bwd-hybrid" — hybrid in the BACKWARD kernel only; forward keeps the
#              baseline loop. Round-4 hardware showed full hybrid LOSES
#              (+6% saturated): the fwd's per-segment body is lean (alpha
#              chain + scan + one matmul) so vectorization overhead
#              (per-row tile origins, masked matmuls, 2 extra scratch
#              blocks) outweighs the saved passes there — but the bwd's
#              per-segment body also pays gdot + wG scan + dalpha + geom
#              rows + dfeat, so the same collapse saves ~2x more per
#              segment. Round-5 A/B candidate.
# Default stays "off" until the hardware A/B (tools/hw_queue.sh) replays
# golden parity and times stage 7 under OLS_MULTISEG=hybrid.
_ms = _os.environ.get("OLS_MULTISEG", "off")
MULTISEG = {"0": "off", "1": "on"}.get(_ms, _ms)
assert MULTISEG in ("off", "on", "hybrid", "bwd-hybrid"), MULTISEG

# Prefix-scan implementation inside the blend kernels
# (tiled._composite / tiled._vec_chunk_state / the backward wG prefix):
#   "off" — Hillis-Steele shift scans (exact f32; log2(CHUNK) = 8 steps of
#           ~3 full-block VPU passes each — the scans are ~50 of the ~90
#           VPU passes per backward chunk).
#   "bwd" — the BACKWARD kernel's two scans become triangular-matrix MXU
#           dots (the transmittance product rides in log space); forward
#           stays exact. Gradient parity budget is looser (7.9e-5 on
#           hardware) than forward parity (4.2e-6).
#   "all" — forward transmittance scan too.
# Dots spell out bf16_3x by hand with f32-dtype operands whose VALUES
# are bf16-exact (the x operand splits into three 8-bit-significand
# terms — exact), so Mosaic's default single-bf16-pass f32 lowering is
# exact per term; only f32 accumulation rounding remains. Explicit
# bf16 operands are rejected, Precision.HIGH is unimplemented in the
# v5e lowering, and HIGHEST 128x128 dots hang the remote compile
# (CLAUDE.md). Default "off" until the hardware A/B replays golden
# parity and times stage 7.
_sm = _os.environ.get("OLS_SCAN_MXU", "off")
SCAN_MXU = {"0": "off", "1": "all"}.get(_sm, _sm)
assert SCAN_MXU in ("off", "bwd", "all"), SCAN_MXU

# Dynamic jump-carry pass count in the binning expansion
# (binning._jump_carry): the static pass ladder covers the worst legal
# run (one Gaussian touching every tile -> ceil(log2(num_tiles)) passes,
# ~10 at tile 32), but real scenes' longest run is max(tiles_touched),
# usually 2-16 -> 1-4 passes. "1" switches to a lax.while_loop over the
# static shift table bounded by the measured max run. Value-identical
# (the skipped passes are provable no-ops); default off until the
# hardware A/B times it (a while_loop can defeat XLA pass fusion).
BIN_DYN = _os.environ.get("OLS_BIN_DYN", "0") != "0"

# Per-Gaussian gradient reduction strategy (tiled._blend_bwd):
#   "scatter"  — one wide-row XLA scatter-add over Gaussian ids (baseline;
#                ~18 ms at the 1M bucket, rows serialize on id conflicts).
#   "emission" — permutation scatter-set into emission order (indices are
#                unique by construction: the sort key's low bits ARE the
#                emission index) + segmented scan over the per-Gaussian
#                contiguous emission ranges. No read-modify-write.
# Env toggle for hardware A/B probes; blend_tiled also takes it as an
# explicit static parameter (tests exercise both without re-importing).
GRAD_REDUCE = _os.environ.get("OLS_GRAD_REDUCE", "scatter")
