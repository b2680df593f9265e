"""Trajectory + rendering evaluation.

Replaces the reference's evo/torchmetrics stack
(/root/reference/utils/eval_utils.py:24-211):
* ATE RMSE via Umeyama (similarity or SE(3)) trajectory alignment — the
  same math evo's APE computes.
* PSNR/SSIM on every 5th non-keyframe frame; rendered 15-d language maps
  saved as lang/{idx}.npy for the LERF-protocol 2D eval.
* LPIPS via the pure-JAX AlexNet port (eval/lpips.py) when converted
  weights are available (config Results.lpips_weights or env
  OLS_LPIPS_WEIGHTS pointing at the npz from tools/convert_weights.py
  --lpips). Without weights the documented substitute 1 − MS-SSIM is
  reported instead, and the metrics JSON labels which metric was used
  ("lpips_metric": "lpips_alex" | "msssim_proxy").
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..ops import lie, losses
from .renderer import render


def umeyama_alignment(x: np.ndarray, y: np.ndarray, with_scale: bool = True):
    """Least-squares similarity transform aligning x (3,N) onto y (3,N).

    Returns (r, t, c) with y ≈ c·R·x + t (Umeyama 1991 — the alignment evo
    uses for APE)."""
    mx, my = x.mean(axis=1), y.mean(axis=1)
    xc, yc = x - mx[:, None], y - my[:, None]
    n = x.shape[1]
    cov = yc @ xc.T / n
    u, d, vt = np.linalg.svd(cov)
    s = np.eye(3)
    if np.linalg.det(u) * np.linalg.det(vt) < 0:
        s[2, 2] = -1
    r = u @ s @ vt
    var_x = np.square(xc).sum() / n
    c = float(np.trace(np.diag(d) @ s) / var_x) if with_scale else 1.0
    t = my - c * r @ mx
    return r, t, c


def ate_rmse(est_poses_w2c, gt_poses_w2c, align_scale=True) -> float:
    """RMS absolute trajectory error over camera centers (meters)."""
    est = np.stack([-p[:3, :3].T @ p[:3, 3] for p in est_poses_w2c], axis=1)
    gt = np.stack([-p[:3, :3].T @ p[:3, 3] for p in gt_poses_w2c], axis=1)
    r, t, c = umeyama_alignment(est, gt, with_scale=align_scale)
    aligned = c * r @ est + t[:, None]
    return float(np.sqrt(np.mean(np.sum((aligned - gt) ** 2, axis=0))))


def eval_ate(cameras: dict, kf_indices, save_dir=None, iterations=0,
             final=False) -> float:
    frames = sorted(kf_indices) if not final else sorted(cameras.keys())
    frames = [i for i in frames if i in cameras]
    # Drop non-finite estimates rather than crashing deep in the SVD: a
    # diverged tracker (e.g. a long-horizon run whose late frames sweep
    # off the mapped scene) should record a number for the frames that
    # tracked, with a loud warning — not kill an hour-long gate run.
    bad = [i for i in frames
           if not (np.isfinite(cameras[i].r).all()
                   and np.isfinite(cameras[i].t).all())]
    if bad:
        print(f"[eval_ate] WARNING: {len(bad)}/{len(frames)} keyframe "
              f"poses non-finite (first {bad[:5]}); scoring the rest")
        frames = [i for i in frames if i not in set(bad)]
    est = [np.asarray(_w2c(cameras[i].r, cameras[i].t)) for i in frames]
    gt = [np.asarray(_w2c(cameras[i].r_gt, cameras[i].t_gt)) for i in frames]
    if len(frames) < 3:
        return float("nan")
    rmse = ate_rmse(est, gt)
    if save_dir is not None:
        out = Path(save_dir) / "plot"
        out.mkdir(parents=True, exist_ok=True)
        with open(out / f"stats_{'final' if final else iterations}.json", "w") as f:
            json.dump({"rmse": rmse}, f, indent=4)
    return rmse


def _w2c(r, t):
    m = np.eye(4, dtype=np.float32)
    m[:3, :3], m[:3, 3] = r, t
    return m


def _make_lpips(config):
    """Real LPIPS if converted AlexNet weights exist, else the documented
    1 − MS-SSIM substitute (see module docstring)."""
    path = (config.get("Results", {}) or {}).get(
        "lpips_weights"
    ) or os.environ.get("OLS_LPIPS_WEIGHTS")
    if path and os.path.exists(path):
        from ..eval import lpips as lpips_mod

        fn = lpips_mod.make_lpips_fn(lpips_mod.load_params(path))
        return lambda a, b: float(fn(a, b)), "lpips_alex"
    return (
        lambda a, b: 1.0 - float(losses.ms_ssim(a, b)),
        "msssim_proxy",
    )


def eval_rendering(slam, save_dir=None, tag="before_opt", every=5):
    """PSNR/SSIM/LPIPS (+ saved language maps) on every `every`-th non-KF
    frame."""
    from .camera import Camera
    from .renderer import activate

    fe, be = slam.frontend, slam.backend
    inputs = activate(be.params, be.aux.active)
    kf_set = set(fe.kf_indices)
    lpips_fn, lpips_name = _make_lpips(slam.config)
    psnrs, ssims, lpipss = [], [], []
    lang_dir = None
    if save_dir is not None:
        lang_dir = Path(save_dir) / tag / "lang"
        lang_dir.mkdir(parents=True, exist_ok=True)
    n = len(slam.dataset)
    for idx in range(0, n, every):
        if idx in kf_set:
            continue
        if idx in fe.cameras and fe.cameras[idx].image is not None:
            cam = fe.cameras[idx]
        else:
            cam = Camera.from_dataset(slam.dataset, idx)
            if idx in fe.cameras:
                cam.r, cam.t = fe.cameras[idx].r, fe.cameras[idx].t
            else:
                continue
        view = jnp.asarray(_w2c(cam.r, cam.t))
        out = render(inputs, view, slam.proj, slam.settings)
        img = jnp.clip(out.color, 0.0, 1.0)
        psnrs.append(float(losses.psnr(img, cam.image)))
        ssims.append(float(losses.ssim(img, cam.image)))
        lpipss.append(lpips_fn(img, cam.image))
        if lang_dir is not None and out.language.shape[0] > 0:
            np.save(lang_dir / f"{idx:05d}.npy", np.asarray(out.language))
    metrics = {
        "mean_psnr": float(np.mean(psnrs)) if psnrs else float("nan"),
        "mean_ssim": float(np.mean(ssims)) if ssims else float("nan"),
        "mean_lpips": float(np.mean(lpipss)) if lpipss else float("nan"),
        "lpips_metric": lpips_name,
        "tag": tag,
    }
    if save_dir is not None:
        with open(Path(save_dir) / f"metrics_{tag}.json", "w") as f:
            json.dump(metrics, f, indent=4)
    return metrics


def evaluate_run(slam, save_dir=None, tag="before_opt", every=5):
    ate = eval_ate(
        slam.frontend.cameras, slam.frontend.kf_indices, save_dir,
        final=True,
    )
    rendering = eval_rendering(slam, save_dir, tag=tag, every=every)
    rendering["ate_rmse"] = ate
    return rendering
