"""Mid-run SLAM checkpoint / resume.

The reference has NO mid-run resume (SURVEY §5: artifacts only — PLY
snapshots + config dump). For production deployment the full SLAM state
is serializable here: Gaussian map + Adam moments + aux, backend
iteration counter and RNG, per-keyframe camera poses/exposures and cached
language supervision, the keyframe pose-optimizer state, window and
visibility bookkeeping, and frontend tracking state. Restoring
reconstructs the device-side FrameStack by re-decoding keyframe frames
from the dataset (images are immutable inputs — no need to store them).

    slam.py --checkpoint-every 50 ...       # snapshot every 50 frames
    slam.py --resume run/ckpt_000100.npz    # continue from a snapshot
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _flatten(prefix: str, tree, out: dict):
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten(f"{prefix}/{k}", v, out)
    elif hasattr(tree, "_fields"):  # NamedTuple
        for k in tree._fields:
            _flatten(f"{prefix}/{k}", getattr(tree, k), out)
    elif isinstance(tree, (tuple, list)):
        for i, v in enumerate(tree):
            _flatten(f"{prefix}/{i}", v, out)
    else:
        out[prefix] = np.asarray(tree)


def save_state(slam, path, frame_idx: int):
    """Snapshot everything needed to continue the run at `frame_idx`."""
    be, fe = slam.backend, slam.frontend
    out: dict = {}
    _flatten("params", be.params, out)
    _flatten("opt", be.opt, out)
    _flatten("aux", be.aux, out)
    if be.keyframe_optimizer_state is not None:
        _flatten("kf_opt", be.keyframe_optimizer_state, out)
    out["rng"] = np.asarray(be.rng)
    out["iteration_count"] = np.int64(be.iteration_count)
    out["frame_idx"] = np.int64(frame_idx)
    out["cap"] = np.int64(be.cap)
    out["max_instances"] = np.int64(be.settings.max_instances)
    kf = sorted(be.viewpoints)
    out["kf_indices"] = np.asarray(kf, np.int64)
    out["fe_kf_indices"] = np.asarray(fe.kf_indices, np.int64)
    out["window"] = np.asarray(be.current_window, np.int64)
    out["median_depth"] = np.float64(fe.median_depth)
    for i in kf:
        cam = be.viewpoints[i]
        out[f"cam/{i}/r"] = np.asarray(cam.r)
        out[f"cam/{i}/t"] = np.asarray(cam.t)
        out[f"cam/{i}/exposure"] = np.asarray(
            [cam.exposure_a, cam.exposure_b]
        )
        if cam.gt_lang_feat is not None:
            out[f"cam/{i}/lang"] = np.asarray(cam.gt_lang_feat)
        if cam.coco_lang_feat is not None:
            out[f"cam/{i}/coco"] = np.asarray(cam.coco_lang_feat)
    for i, occ in be.occ_aware_visibility.items():
        out[f"occ/{i}"] = np.asarray(occ)
    # Tracked (non-KF) camera poses for trajectory eval continuity.
    for i, cam in fe.cameras.items():
        out[f"traj/{i}"] = np.concatenate(
            [np.asarray(cam.r).reshape(-1), np.asarray(cam.t)]
        )
    if slam.backend.online_ae is not None:
        _flatten("online_ae", slam.backend.online_ae.params, out)
    np.savez_compressed(path, **out)
    return path


def load_state(slam, path):
    """Restore a snapshot into a freshly-constructed SLAM. Returns the
    frame index to resume from."""
    import jax.numpy as jnp

    from ..models import gaussians as G
    from .camera import Camera

    data = np.load(path)
    be, fe = slam.backend, slam.frontend

    def unflatten_nt(prefix, template):
        vals = []
        for k in template._fields:
            sub = f"{prefix}/{k}"
            if sub in data:
                vals.append(jnp.asarray(data[sub]))
            else:
                vals.append(unflatten_nt(sub, getattr(template, k)))
        return type(template)(*vals)

    cap = int(data["cap"])
    if cap != be.cap:
        be.cap = cap
        be.params = G.empty_params(
            cap, slam.config["model_params"]["sh_degree"], be.lang_dim
        )
        be.aux = G.empty_aux(cap)
        be.opt = G.init_adam(be.params)
    be.params = unflatten_nt("params", be.params)
    be.opt = unflatten_nt("opt", be.opt)
    be.aux = unflatten_nt("aux", be.aux)
    if "kf_opt/2" in data or "kf_opt/0/0" in data:
        pm = tuple(jnp.asarray(data[f"kf_opt/0/{i}"]) for i in range(4))
        pv = tuple(jnp.asarray(data[f"kf_opt/1/{i}"]) for i in range(4))
        be.keyframe_optimizer_state = (pm, pv, jnp.asarray(data["kf_opt/2"]))
    be.rng = jnp.asarray(data["rng"])
    be.iteration_count = int(data["iteration_count"])
    be.settings = be.settings._replace(
        max_instances=int(data["max_instances"])
    )
    be.current_window = [int(i) for i in data["window"]]
    fe.current_window = list(be.current_window)
    fe.kf_indices = [int(i) for i in data["fe_kf_indices"]]
    fe.median_depth = float(data["median_depth"])

    for i in data["kf_indices"]:
        i = int(i)
        cam = Camera.from_dataset(slam.dataset, i)
        cam.compute_grad_mask(slam.config)
        cam.update_rt(data[f"cam/{i}/r"], data[f"cam/{i}/t"])
        ea, eb = data[f"cam/{i}/exposure"]
        cam.exposure_a, cam.exposure_b = float(ea), float(eb)
        if f"cam/{i}/lang" in data:
            cam.gt_lang_feat = jnp.asarray(data[f"cam/{i}/lang"])
        be.viewpoints[i] = cam
        fe.cameras[i] = cam
        be.frame_size = (cam.height, cam.width)
        # Rebuild the device-side frame stack from the dataset.
        if be.frame_stack is None:
            from .backend import FrameStack

            be.frame_stack = FrameStack(
                cam.height, cam.width, be.lang_dim, cap=64,
                lang_hw=be.lang_hw,
            )
        be.frame_stack.add(i, cam.image, cam.depth)
        if cam.gt_lang_feat is not None and jnp.asarray(
            cam.gt_lang_feat
        ).shape == (be.lang_dim,) + be.lang_hw:
            be.frame_stack.set_lang(i, jnp.asarray(cam.gt_lang_feat))
        if f"cam/{i}/coco" in data:
            cam.coco_lang_feat = jnp.asarray(data[f"cam/{i}/coco"])
            be.frame_stack.set_coco(i, cam.coco_lang_feat)
    for key in data.files:
        if key.startswith("occ/"):
            be.occ_aware_visibility[int(key[4:])] = data[key]
        elif key.startswith("traj/"):
            i = int(key[5:])
            if i not in fe.cameras:
                # Tracked non-keyframes only contribute their pose to the
                # trajectory eval — build a pose-only Camera without
                # decoding the frame (a full `from_dataset` per frame made
                # resume O(dataset) and re-pinned every image the
                # `cam.clean()` memory fix had freed).
                rt = data[key]
                gt = np.asarray(slam.dataset.poses[i], np.float32)
                cam = Camera(
                    uid=i, image=None, depth=None,
                    r_gt=gt[:3, :3], t_gt=gt[:3, 3],
                    fx=slam.dataset.fx, fy=slam.dataset.fy,
                    cx=slam.dataset.cx, cy=slam.dataset.cy,
                    fovx=slam.dataset.fovx, fovy=slam.dataset.fovy,
                    height=slam.dataset.height, width=slam.dataset.width,
                )
                cam.update_rt(rt[:9].reshape(3, 3), rt[9:])
                fe.cameras[i] = cam
    if slam.backend.online_ae is not None and any(
        k.startswith("online_ae/") for k in data.files
    ):
        def rebuild(prefix):
            tree: dict = {}
            for k in data.files:
                if k.startswith(prefix + "/"):
                    parts = k[len(prefix) + 1:].split("/")
                    node = tree
                    for pp in parts[:-1]:
                        node = node.setdefault(pp, {})
                    node[parts[-1]] = jnp.asarray(data[k])
            return tree

        slam.backend.online_ae.params = rebuild("online_ae")
    be.initialized = True
    slam._sync_frontend_state()
    return int(data["frame_idx"])
