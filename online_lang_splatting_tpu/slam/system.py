"""SLAM orchestration: wires frontend + backend, single- or dual-thread.

Equivalent of the reference `SLAM` class + process topology
(/root/reference/slam.py:32-255): the reference runs frontend/backend as
OS processes exchanging CUDA tensors over queues; here they are host
threads (or a lock-step single thread) driving XLA computations. JAX
arrays are immutable, so the reference's whole-model `clone_obj` snapshot
protocol degenerates to handing over pytree references under a lock —
race-free by construction.

Message protocol (matching slam_frontend/slam_backend):
  frontend → backend: ["init", idx, cam, depthmap] |
                      ["keyframe", idx, cam, window, depthmap] |
                      ["color_refinement"] | ["stop"] | ["pause"] | ["unpause"]
  backend → frontend: ["sync_backend", render_inputs, occ_vis, kf_poses] |
                      ["init"/"keyframe" ack]
"""

from __future__ import annotations

import queue
import threading
import time
from pathlib import Path
from typing import Optional

import numpy as np

from ..ops.raster import RasterSettings
from .backend import BackEnd
from .camera import Camera, camera_projection
from .datasets import load_dataset
from .frontend import FrontEnd
from .renderer import activate


class _QueueViewer:
    """Adapter: viewer interface over the GUI's packet queue."""

    def __init__(self, q):
        self.q = q

    def submit(self, pkt):
        try:
            self.q.put_nowait(pkt)
        except queue.Full:
            pass

    def close(self):
        from ..gui.viewer import GaussianPacket

        self.q.put(GaussianPacket(finish=True))


class SLAM:
    def __init__(self, config: dict, lang_extractor=None, online_ae=None,
                 save_dir: Optional[str] = None):
        self.config = config
        self.dataset = load_dataset(config)
        self._campre = None
        if (
            config["Dataset"].get("prefetch", True)
            and config["Dataset"]["type"] != "realsense"  # live streams
            and len(self.dataset) > 0
        ):
            from .prefetch import CameraPrefetcher, PrefetchDataset

            self.dataset = PrefetchDataset(self.dataset)
            # Second stage: build Cameras (device upload + grad-mask
            # dispatch) ahead too — overlaps the tunnel round trips with
            # the current frame's tracking compute.
            self._campre = CameraPrefetcher(self.dataset, config)
        self.save_dir = save_dir
        calib = config["Dataset"]["Calibration"]
        width, height = calib["width"], calib["height"]
        import math

        tanfovx = math.tan(self.dataset.fovx / 2)
        tanfovy = math.tan(self.dataset.fovy / 2)
        lang_dim = config.get("language", {}).get("lang_code_size", 15)
        cap0 = config.get("capacity", 1 << 17)
        avg_dup = config.get("max_instance_factor", 8)
        # Start with a SNUG instance bucket: binning + kernel-grid cost
        # scales with the bucket, and both tracking and mapping grow it
        # on overflow (demand-sized, ops.raster.grow_bucket + replay), so
        # early-run frames with few instances don't pay worst-case
        # capacity and the steady-state bucket stays snug to the scene.
        max_inst = config.get(
            "max_instances_init", min(avg_dup * cap0, 1 << 18)
        )
        # Production tile size: 32 wins the round-4 hardware A/B
        # (demand-sized buckets, production occupancy: 31.2 ms fwd+bwd vs
        # 46.8 ms at tile 16 — 3.1x fewer (Gaussian, tile) instances
        # shrink binning/pack/scatter; /tmp/hwq_r4d steps 36-40, golden
        # parity clean on hardware at tile 32). Tile 16 stays available
        # per-config; the raster-level default (OLS_TILE) is unchanged so
        # kernel-level tests/goldens keep their pinned semantics.
        self.settings = RasterSettings(
            image_height=height, image_width=width,
            tanfovx=tanfovx, tanfovy=tanfovy,
            sh_degree=config["model_params"]["sh_degree"],
            backend=config.get("raster_backend", "tpu"),
            max_instances=max_inst,
            tile=int(config.get("raster_tile", 32)),
        )
        self.proj = camera_projection(
            Camera(
                uid=-1, image=None, depth=None,
                r_gt=np.eye(3), t_gt=np.zeros(3),
                fx=self.dataset.fx, fy=self.dataset.fy,
                cx=self.dataset.cx, cy=self.dataset.cy,
                fovx=self.dataset.fovx, fovy=self.dataset.fovy,
                height=height, width=width,
            )
        )
        # Optional multi-chip execution: config `mesh_devices: N` builds an
        # N-chip dp mesh; mapping shards keyframe slots over it
        # (parallel/mesh.py) and tracking renders band-parallel
        # (parallel/tile_shard.py).
        mesh = None
        n_mesh = config.get("mesh_devices", 0)
        if n_mesh:
            from ..parallel.mesh import make_mesh

            mesh = make_mesh(n_mesh)
        self.backend = BackEnd(
            config, self.settings, self.proj, capacity=cap0,
            lang_extractor=lang_extractor, online_ae=online_ae,
            mesh=mesh,
        )
        self.frontend = FrontEnd(config, self.settings, mesh=mesh)
        self.frontend_queue: "queue.Queue" = queue.Queue()
        self.backend_queue: "queue.Queue" = queue.Queue()
        self.use_every_n_frames = 1
        self.kf_interval = config["Training"]["kf_interval"]
        self.single_thread = config["Training"].get("single_thread", True)
        self.eval_rendering = config.get("Results", {}).get("eval_rendering", False)
        self.fps = None
        self.viewer = None
        self.q_vis2main: "queue.Queue" = queue.Queue()
        self._gui_paused = False
        use_gui = config.get("Results", {}).get("use_gui", False)
        if use_gui == "interactive":
            # Reference open3d window (gui/slam_gui.py) on display-ful
            # hosts; falls back to the headless viewer without open3d.
            try:
                from ..gui import slam_gui

                params = slam_gui.ParamsGUI(
                    q_main2vis=queue.Queue(maxsize=4),
                    q_vis2main=self.q_vis2main,
                    proj=self.proj, settings=self.settings,
                )
                self._gui = slam_gui.SLAM_GUI(params)
                self._gui_thread = threading.Thread(
                    target=self._gui.run, daemon=True
                )
                self._gui_thread.start()
                self.viewer = _QueueViewer(params.q_main2vis)
            except ImportError as e:
                print(f"[gui] {e}; using HeadlessViewer")
                use_gui = True
        if use_gui is True:
            from ..gui.viewer import HeadlessViewer

            out = (save_dir or "results") / "viewer" if save_dir else "results/viewer"
            self.viewer = HeadlessViewer(str(out))

    # -- single-thread driver ----------------------------------------------

    def _check_gui_pause(self):
        """Honor Packet_vis2main(flag_pause) from the interactive viewer
        (reference slam_frontend pause flow)."""
        while True:
            try:
                msg = self.q_vis2main.get_nowait()
                self._gui_paused = bool(getattr(msg, "flag_pause", False))
            except queue.Empty:
                break
        while self._gui_paused:
            time.sleep(0.05)
            try:
                msg = self.q_vis2main.get_nowait()
                self._gui_paused = bool(getattr(msg, "flag_pause", False))
            except queue.Empty:
                pass

    def _sync_frontend_state(self):
        """Give the frontend the backend's current map + keyframe poses."""
        self.frontend.render_inputs = activate(
            self.backend.params, self.backend.aux.active
        )
        # Sync instance-pool growth both ways (each side also grows its own
        # bucket on overflow) so neither ever truncates.
        cap = max(
            self.backend.settings.max_instances,
            self.frontend.settings.max_instances,
        )
        self.frontend.settings = self.backend.settings._replace(
            max_instances=cap
        )
        self.backend.settings = self.backend.settings._replace(
            max_instances=cap
        )
        self.frontend.occ_aware_visibility = dict(
            self.backend.occ_aware_visibility
        )
        for idx, cam in self.backend.viewpoints.items():
            if idx in self.frontend.cameras:
                self.frontend.cameras[idx].update_rt(cam.r, cam.t)

    def close(self):
        """Shut down prefetch worker threads and drop their device-resident
        camera cache (each prefetched Camera pins ~13 MB on device; the
        non-daemon pool threads otherwise outlive the run)."""
        if self._campre is not None:
            self._campre.close()
        if hasattr(self.dataset, "close"):
            self.dataset.close()

    def run(self, max_frames: Optional[int] = None, start_frame: int = 0,
            checkpoint_every: Optional[int] = None):
        try:
            if self.single_thread:
                return self.run_single_thread(
                    max_frames, start_frame=start_frame,
                    checkpoint_every=checkpoint_every,
                )
            return self.run_threaded(max_frames)
        finally:
            self.close()

    def run_single_thread(self, max_frames: Optional[int] = None,
                          start_frame: int = 0,
                          checkpoint_every: Optional[int] = None):
        t_start = time.time()
        n = len(self.dataset)
        if max_frames is not None:
            n = min(n, max_frames)
        fe, be = self.frontend, self.backend
        iter_per_kf = be.mapping_itr_num
        if start_frame > 0:  # resumed from a checkpoint (slam/checkpoint.py)
            cur_window = list(be.current_window)
            last_kf = max(fe.kf_indices) if fe.kf_indices else 0
            frames_since_kf = max(start_frame - 1 - last_kf, 0)
        else:
            cur_window = []
            last_kf = 0
            frames_since_kf = 0
        self._last_ckpt_idx = start_frame
        # Wall-clock phase accounting (reference logs Total FPS,
        # slam.py:165-171; we additionally break it down).
        self.phase_times = {"data": 0.0, "track": 0.0, "map": 0.0,
                            "init": 0.0, "kf_insert": 0.0}

        def _tick(phase, t0):
            now = time.time()
            self.phase_times[phase] += now - t0
            return now

        for idx in range(start_frame, n):
            self._check_gui_pause()
            t0 = time.time()
            if self._campre is not None:
                cam = self._campre.get(idx)
            else:
                cam = Camera.from_dataset(self.dataset, idx)
                cam.compute_grad_mask(self.config)
            fe.cameras[idx] = cam
            t0 = _tick("data", t0)

            if idx == 0:
                import os as _os

                dbg = _os.environ.get("OLS_CHUNK_TIMING")
                cam.update_rt(cam.r_gt, cam.t_gt)
                depthmap = fe.new_keyframe_depth(cam)
                t_a = time.time()
                be.add_next_kf(0, cam, depthmap, init=True)
                t_b = time.time()
                be.initialize_map(0, cam)
                t_c = time.time()
                self._sync_frontend_state()
                if dbg:
                    print(f"[init] add_next_kf={t_b - t_a:.2f}s "
                          f"initialize_map={t_c - t_b:.2f}s "
                          f"sync={time.time() - t_c:.2f}s", flush=True)
                _tick("init", t0)
                cur_window = [0]
                fe.current_window = cur_window
                fe.kf_indices = [0]
                # Visibility of the first keyframe comes from its mapping.
                continue

            prev = fe.cameras[idx - self.use_every_n_frames]
            prev2 = fe.cameras.get(idx - 2 * self.use_every_n_frames)
            visibility = fe.track(cam, prev, self.proj, prev2=prev2)
            t0 = _tick("track", t0)
            frames_since_kf += 1
            if self.viewer is not None:
                from ..gui.viewer import GaussianPacket

                # gt language thumbnail: the latest keyframe's cached
                # supervision map (current frames have none — extraction
                # runs per-KF), like the reference packets' gt_lang panel
                # (gui/gui_utils.py:77-147).
                kf_cam = be.viewpoints.get(last_kf)
                gtlang = kf_cam.gt_lang_feat if kf_cam is not None else None
                self.viewer.submit(GaussianPacket(
                    render_inputs=fe.render_inputs,
                    view=cam.world_view_transform, proj=self.proj,
                    settings=self.settings, gtcolor=cam.image,
                    gtdepth=cam.depth, gtlanguage=gtlang, frame_idx=idx,
                    keyframe_window=list(cur_window),
                    keyframe_poses=[
                        fe.cameras[k].world_view_transform
                        for k in cur_window if k in fe.cameras
                    ] + [cam.world_view_transform],
                ))

            if last_kf in fe.occ_aware_visibility:
                create_kf = frames_since_kf >= self.kf_interval and fe.is_keyframe(
                    idx, last_kf, visibility
                )
            else:
                create_kf = frames_since_kf >= self.kf_interval
            if len(cur_window) < self.frontend.window_size:
                union = np.count_nonzero(
                    visibility | fe.occ_aware_visibility.get(last_kf, visibility)
                )
                intersection = np.count_nonzero(
                    visibility & fe.occ_aware_visibility.get(last_kf, visibility)
                )
                point_ratio = intersection / max(union, 1)
                create_kf = (
                    frames_since_kf >= self.kf_interval
                    and point_ratio < self.config["Training"]["kf_overlap"]
                )
            if not create_kf:
                # Free the frame's device arrays (reference cleanup,
                # slam_frontend.py:676): poses stay for trajectory eval;
                # eval_rendering reloads pixels from the dataset. Without
                # this a Replica-length run pins ~26 GB of frames.
                cam.clean()
                continue

            # Keyframe: window update + backend mapping.
            cur_window, removed = fe.add_to_window(idx, visibility, cur_window)
            fe.current_window = cur_window
            fe.kf_indices.append(idx)
            fe.occ_aware_visibility[idx] = visibility
            import os as _os

            t_kd = time.time()
            depthmap = fe.new_keyframe_depth(cam)
            if _os.environ.get("OLS_CHUNK_TIMING"):
                print(f"[kf] new_kf_depth={time.time() - t_kd:.2f}s",
                      flush=True)
            be.viewpoints[idx] = cam
            be.current_window = cur_window
            be.add_next_kf(idx, cam, depthmap)
            be.reset_keyframe_optimizer(be._n_slots())
            t0 = _tick("kf_insert", t0)
            be.map(cur_window, iters=iter_per_kf, lang_run=be.lang_train)
            be.map(cur_window, prune=True)
            self._sync_frontend_state()
            _tick("map", t0)
            last_kf = idx
            frames_since_kf = 0
            # Keyframe indices are irregular, so an exact `idx % N == 0`
            # match rarely fires; snapshot at the first keyframe boundary
            # >= N frames after the previous checkpoint instead.
            if checkpoint_every and idx - self._last_ckpt_idx >= checkpoint_every:
                from . import checkpoint

                path = (self.save_dir or Path("results")) / (
                    f"ckpt_{idx:06d}.npz"
                )
                Path(path).parent.mkdir(parents=True, exist_ok=True)
                checkpoint.save_state(self, path, idx + 1)
                self._last_ckpt_idx = idx
                print(f"[checkpoint] saved {path}")

        self.fps = (n - start_frame) / (time.time() - t_start)
        return self

    def run_threaded(self, max_frames: Optional[int] = None):
        """Asynchronous frontend/backend (reference `single_thread: False`).

        The reference runs two OS processes sharing one GPU over
        torch.multiprocessing queues (slam.py:110-163); here two host
        threads share one chip: the backend thread drains its queue
        (init / keyframe / stop) and runs idle-time mapping, pushing map
        snapshots (immutable pytrees — no cloning needed) back; the
        frontend tracks frames against its latest snapshot and pauses
        while a keyframe request is in flight, like the reference's
        `requested_keyframe` gate.
        """
        t_start = time.time()
        n = len(self.dataset)
        if max_frames is not None:
            n = min(n, max_frames)
        fe, be = self.frontend, self.backend
        iter_per_kf = be.mapping_itr_num
        state = {"window": [], "requested_kf": 0, "stop": False}
        lock = threading.Lock()

        def push_snapshot():
            snap_inputs = activate(be.params, be.aux.active)
            occ = dict(be.occ_aware_visibility)
            poses = {
                i: (c.r.copy(), c.t.copy()) for i, c in be.viewpoints.items()
            }
            self.frontend_queue.put(
                ["sync_backend", snap_inputs, occ, poses, be.settings]
            )

        def backend_loop():
            try:
                _backend_loop()
            except Exception:
                import traceback

                traceback.print_exc()
                state["backend_error"] = True
                raise

        def _backend_loop():
            while True:
                try:
                    msg = self.backend_queue.get(timeout=0.01)
                except queue.Empty:
                    if be.initialized and be.current_window:
                        be.map(be.current_window, iters=1, lang_run=be.lang_train)
                        if be.iteration_count % 10 == 0:
                            push_snapshot()
                    continue
                if msg[0] == "stop":
                    return
                if msg[0] == "init":
                    _, idx, cam, depthmap = msg
                    be.add_next_kf(idx, cam, depthmap, init=True)
                    be.initialize_map(idx, cam)
                    be.current_window = [idx]
                    push_snapshot()
                    self.frontend_queue.put(["init_done"])
                elif msg[0] == "keyframe":
                    _, idx, cam, window, depthmap = msg
                    be.viewpoints[idx] = cam
                    be.current_window = list(window)
                    be.add_next_kf(idx, cam, depthmap)
                    be.reset_keyframe_optimizer(fe.window_size + 2)
                    be.map(window, iters=iter_per_kf, lang_run=be.lang_train)
                    be.map(window, prune=True)
                    push_snapshot()
                    self.frontend_queue.put(["keyframe_done", idx])
                elif msg[0] == "color_refinement":
                    be.color_refinement()
                    push_snapshot()
                    self.frontend_queue.put(["refine_done"])

        def drain_frontend_queue(block=False):
            while True:
                try:
                    msg = self.frontend_queue.get(timeout=5.0 if block else 0.0)
                except queue.Empty:
                    return
                if msg[0] == "sync_backend":
                    _, snap_inputs, occ, poses, be_settings = msg
                    fe.render_inputs = snap_inputs
                    fe.occ_aware_visibility = occ
                    # Follow backend instance-pool growth (and keep our own).
                    fe.settings = be_settings._replace(
                        max_instances=max(
                            be_settings.max_instances,
                            fe.settings.max_instances,
                        )
                    )
                    for i, (r, t) in poses.items():
                        if i in fe.cameras:
                            fe.cameras[i].update_rt(r, t)
                elif msg[0] in ("init_done", "keyframe_done", "refine_done"):
                    state["requested_kf"] = max(0, state["requested_kf"] - 1)
                if block and state["requested_kf"] == 0:
                    return

        bt = threading.Thread(target=backend_loop, daemon=True)
        bt.start()
        cur_window: list[int] = []
        last_kf = 0
        frames_since_kf = 0
        self.tracked_while_kf_in_flight = 0  # observability for tests
        for idx in range(n):
            self._check_gui_pause()
            t_frame = time.time()
            if self._campre is not None:
                cam = self._campre.get(idx)
            else:
                cam = Camera.from_dataset(self.dataset, idx)
                cam.compute_grad_mask(self.config)
            fe.cameras[idx] = cam
            if idx == 0:
                # The reference frontend blocks while requested_init
                # (slam_frontend.py:569-571) — keep that synchronous. The
                # drain can time out while the backend is still compiling
                # its first mapping program, so loop until the ack lands.
                cam.update_rt(cam.r_gt, cam.t_gt)
                state["requested_kf"] = 1
                self.backend_queue.put(
                    ["init", 0, cam, fe.new_keyframe_depth(cam)]
                )
                while state["requested_kf"] > 0 and bt.is_alive():
                    drain_frontend_queue(block=True)
                cur_window = [0]
                fe.kf_indices = [0]
                continue
            # Async semantics (slam_frontend.py:614-618): keep TRACKING
            # against the latest map snapshot while a keyframe request is
            # in flight; only new-keyframe creation is deferred.
            drain_frontend_queue()
            prev = fe.cameras[idx - 1]
            visibility = fe.track(cam, prev, self.proj,
                                  prev2=fe.cameras.get(idx - 2))
            frames_since_kf += 1
            if state["requested_kf"] > 0:
                self.tracked_while_kf_in_flight += 1
                cam.clean()  # tracked-only frame (reference cleanup)
                continue
            create_kf = frames_since_kf >= self.kf_interval and (
                last_kf in fe.occ_aware_visibility
                and fe.is_keyframe(idx, last_kf, visibility)
            )
            if len(cur_window) < fe.window_size:
                occ0 = fe.occ_aware_visibility.get(last_kf, visibility)
                union = np.count_nonzero(visibility | occ0)
                inter = np.count_nonzero(visibility & occ0)
                create_kf = (
                    frames_since_kf >= self.kf_interval
                    and inter / max(union, 1) < self.config["Training"]["kf_overlap"]
                )
            if not create_kf:
                cam.clean()  # reference cleanup (slam_frontend.py:676)
            if create_kf:
                cur_window, _ = fe.add_to_window(idx, visibility, cur_window)
                fe.kf_indices.append(idx)
                fe.occ_aware_visibility[idx] = visibility
                state["requested_kf"] += 1
                self.backend_queue.put([
                    "keyframe", idx, cam, list(cur_window),
                    fe.new_keyframe_depth(cam),
                ])
                last_kf = idx
                frames_since_kf = 0
                # ≤3 FPS throttle after keyframe insertion
                # (slam_frontend.py:700-704).
                elapsed = time.time() - t_frame
                time.sleep(max(0.01, 1.0 / 3.0 - elapsed))
        while state["requested_kf"] > 0:
            drain_frontend_queue(block=True)
        self.backend_queue.put(["stop"])
        bt.join(timeout=60)
        self._sync_frontend_state()
        self.fps = n / (time.time() - t_start)
        return self

    def finalize(self, color_refinement_iters: Optional[int] = None):
        if color_refinement_iters:
            self.backend.color_refinement(color_refinement_iters)
            self._sync_frontend_state()
        return self
