"""Instance-pool overflow: both tracking and mapping must detect raster
overflow, grow the bucket, and REPLAY (never commit truncated results)."""

import numpy as np

from online_lang_splatting_tpu.ops.raster import grow_bucket
from online_lang_splatting_tpu.slam.config import load_config
from online_lang_splatting_tpu.slam.system import SLAM


def test_grow_bucket_demand_sized():
    q = 8 * 256
    # Demand-sized: 650k demand from a 262k bucket lands on the 917504
    # grid rung (demand x 1.25 snapped to quarter-pow2), not the doubling
    # ladder's 1048576.
    assert grow_bucket(262144, 650_000) == 917504
    assert grow_bucket(262144, 650_000) < 1048576
    # Growth-count bound: never less than 1.5x even for tiny demand
    # (each distinct bucket compiles fresh programs through the relay).
    assert grow_bucket(262144, 0) >= 262144 * 3 // 2
    assert grow_bucket(262144, 265000) >= 262144 * 3 // 2
    # Grid convergence: nearby demands from different observers (tracking
    # whole-frame vs mapping slots) land on the SAME rung, so the
    # frontend/backend bucket merge doesn't mint a third program size.
    assert grow_bucket(262144, 600_000) == grow_bucket(262144, 620_000)
    # Quantum-aligned and strictly growing.
    for cur, dem in [(2048, 0), (2048, 2000), (2048, 5000),
                     (262144, 300000), (1 << 20, 3 << 20)]:
        assert grow_bucket(cur, dem) % q == 0
        assert grow_bucket(cur, dem) > cur
        assert grow_bucket(cur, dem) >= dem


def test_snug_bucket_grows_and_run_completes():
    config = load_config("configs/synthetic/smoke.yaml")
    # Force overflow: the scene needs thousands of instances at tile 16
    # (at the production tile 32 this 96x64 scene is only 3x2 tiles and
    # fits the snug bucket, so nothing would grow).
    config["raster_tile"] = 16
    config["max_instances_init"] = 256
    config["Training"]["init_itr_num"] = 8
    config["Training"]["mapping_itr_num"] = 3
    config["Training"]["tracking_itr_num"] = 6
    slam = SLAM(config)
    slam.run(max_frames=4)
    assert slam.backend.settings.max_instances > 256
    assert slam.frontend.settings.max_instances == (
        slam.backend.settings.max_instances
    )
    # The run still produced a sane map + finite poses after replays.
    assert int(slam.backend.aux.active.sum()) > 50
    for cam in slam.frontend.cameras.values():
        assert np.isfinite(cam.t).all()


def test_frontend_track_overflow_replay():
    """Drive FrontEnd.track itself into the overflow-replay branch
    (slam/frontend.py track(): grow_bucket + redo frame). Round 4 shipped
    a NameError on exactly this path (grow_bucket used without import)
    that the suite missed because the other overflow tests only exercise
    the mapping/backend growth — the backend grows the shared bucket
    during init, so tracking never overflows in a full SLAM.run. Here the
    FRONTEND pool alone is shrunk below the scene's tile-16 instance
    demand after init, so the first track() call must overflow, grow, and
    replay."""
    from online_lang_splatting_tpu.slam.camera import Camera

    config = load_config("configs/synthetic/smoke.yaml")
    config["raster_tile"] = 16   # see test_snug_bucket_grows_and_run_completes
    config["Dataset"]["prefetch"] = False
    config["Training"]["init_itr_num"] = 8
    config["Training"]["tracking_itr_num"] = 6
    slam = SLAM(config)
    fe, be = slam.frontend, slam.backend
    cam0 = Camera.from_dataset(slam.dataset, 0)
    cam0.compute_grad_mask(config)
    fe.cameras[0] = cam0
    cam0.update_rt(cam0.r_gt, cam0.t_gt)
    be.add_next_kf(0, cam0, fe.new_keyframe_depth(cam0), init=True)
    be.initialize_map(0, cam0)
    slam._sync_frontend_state()
    fe.settings = fe.settings._replace(max_instances=256)
    cam1 = Camera.from_dataset(slam.dataset, 1)
    cam1.compute_grad_mask(config)
    fe.cameras[1] = cam1
    visibility = fe.track(cam1, cam0, slam.proj)
    # grow_bucket ran (the pool grew) and the replayed frame committed a
    # finite pose + visibility from a non-truncated render.
    assert fe.settings.max_instances > 256
    assert np.isfinite(cam1.t).all()
    assert visibility.any()


def test_overflow_replay_mid_pipeline(monkeypatch):
    """Overflow while a SECOND chunk is already in flight: the depth-2
    pipelined map() loop (backend._submit_chunk/_finish_chunk) must roll
    back the optimistic lineage, replay the overflowing chunk at the
    grown bucket, and resubmit the in-flight chunk — multi-chunk calls
    (iters > chunk length) with a snug bucket force that path."""
    from online_lang_splatting_tpu.slam.backend import FrameStack

    monkeypatch.setattr(FrameStack, "INIT_CHUNK", 4)
    monkeypatch.setattr(FrameStack, "MAP_CHUNK", 4)
    config = load_config("configs/synthetic/smoke.yaml")
    config["raster_tile"] = 16   # see test_snug_bucket_grows_and_run_completes
    config["max_instances_init"] = 256
    config["Training"]["init_itr_num"] = 12   # 3 pipelined init chunks
    config["Training"]["mapping_itr_num"] = 8  # 2 pipelined map chunks
    config["Training"]["tracking_itr_num"] = 6
    slam = SLAM(config)
    slam.run(max_frames=4)
    assert slam.backend.settings.max_instances > 256
    assert int(slam.backend.aux.active.sum()) > 50
    for cam in slam.frontend.cameras.values():
        assert np.isfinite(cam.t).all()
