"""Isosurface meshing (Surface Nets) on analytic SDFs."""

import numpy as np


def test_sphere_topology_and_accuracy():
    from online_lang_splatting_tpu.tsdf.meshing import surface_nets

    g = np.mgrid[0:32, 0:32, 0:32].astype(np.float32)
    d = np.sqrt(((g - 15.5) ** 2).sum(0)) - 10.0
    verts, faces = surface_nets(d)
    r = np.linalg.norm(verts - 15.5, axis=1)
    assert abs(r.mean() - 10.0) < 0.1
    assert r.std() < 0.05
    # Watertight sphere: V - E + F == 2.
    edges = set()
    for tri in faces:
        for a, b in [(0, 1), (1, 2), (2, 0)]:
            edges.add(tuple(sorted((int(tri[a]), int(tri[b])))))
    assert len(verts) - len(edges) + len(faces) == 2


def test_tsdf_volume_mesh_export(tmp_path):
    from online_lang_splatting_tpu.tsdf.fusion import TSDFVolume
    from online_lang_splatting_tpu.tsdf.meshing import extract_mesh, write_mesh_ply

    h, w = 32, 40
    intr = (40.0, 40.0, 20.0, 16.0)
    depth = np.full((h, w), 2.0, np.float32)
    feat = np.full((3, h, w), 0.5, np.float32)
    vol = TSDFVolume([[-2, 2], [-2, 2], [0.5, 3.0]], 0.08, n_channels=3)
    vol.integrate(feat, depth, intr, np.eye(4, dtype=np.float32))
    verts, faces, vfeat = extract_mesh(vol)
    assert len(verts) > 20 and len(faces) > 20
    assert abs(np.median(verts[:, 2]) - 2.0) < 0.2
    p = tmp_path / "mesh.ply"
    write_mesh_ply(p, verts, faces, colors=vfeat)
    assert p.stat().st_size > 100
