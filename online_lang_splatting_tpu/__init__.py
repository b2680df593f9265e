"""online_lang_splatting_tpu — TPU-native Online Language Splatting.

A ground-up JAX/XLA/Pallas re-design of rpng/online_lang_splatting
(MonoGS-style RGB-D Gaussian-splatting SLAM + online open-vocabulary
language mapping). The CUDA tile rasterizer becomes a Pallas TPU kernel,
the SED ConvNeXt-L CLIP dense encoder + high-res head + autoencoders are
Flax modules fused into jitted per-frame programs, and the SLAM loop is a
host-side driver over XLA computations.

Layout:
  ops/       — device math: Lie groups, camera models, SH, losses, KNN,
               and the differentiable Gaussian rasterizer (oracle + Pallas).
  models/    — GaussianModel (SoA pytree) and the language network stack.
  slam/      — frontend (tracking) / backend (mapping) runtime, datasets,
               configs, eval utilities.
  parallel/  — jax.sharding meshes and multi-chip training steps.
  tsdf/      — 16-channel TSDF fusion + 3D semantic eval.
  eval/      — LERF-protocol 2D relevancy eval.
"""

__version__ = "0.1.0"
