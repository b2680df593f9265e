"""Isosurface meshing (marching cubes + Surface Nets) on analytic SDFs."""

from collections import Counter

import numpy as np

_CORNER_OFFS = [(0, 0, 0), (1, 0, 0), (0, 1, 0), (1, 1, 0),
                (0, 0, 1), (1, 0, 1), (0, 1, 1), (1, 1, 1)]


def _edge_census(faces):
    """(directed edge counter, undirected edge counter)."""
    dir_edges = Counter()
    for a, b, c in faces:
        for e in [(int(a), int(b)), (int(b), int(c)), (int(c), int(a))]:
            dir_edges[e] += 1
    und = Counter()
    for (a, b) in dir_edges:
        und[frozenset((a, b))] += 1
    return dir_edges, und


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


def test_marching_cubes_sphere():
    """Watertight genus-0 mesh, vertices ON the level set (the skimage-
    matching guarantee, fusion.py:307), outward orientation, accurate
    area/volume."""
    from online_lang_splatting_tpu.tsdf.meshing import marching_cubes

    n, r = 40, 14.0
    g = np.arange(n) - (n - 1) / 2.0
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    sdf = np.sqrt(X**2 + Y**2 + Z**2) - r
    verts, faces = marching_cubes(sdf)
    dir_edges, und = _edge_census(faces)
    assert all(v == 1 for v in dir_edges.values())  # consistent orientation
    assert all(v == 2 for v in und.values())        # watertight
    assert len(verts) - len(und) + len(faces) == 2  # sphere topology
    # Linear-interp zero crossings: distance error bounded by curvature.
    c = (n - 1) / 2.0
    d = np.abs(np.sqrt(((verts - c) ** 2).sum(1)) - r)
    assert d.max() < 0.01
    p = (verts - verts.mean(0))[faces]
    vol = np.einsum("ij,ij->i", p[:, 0], np.cross(p[:, 1], p[:, 2])).sum() / 6
    assert vol > 0  # outward normals
    assert abs(vol - 4 / 3 * np.pi * r**3) / (4 / 3 * np.pi * r**3) < 0.01
    area = 0.5 * np.linalg.norm(
        np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0]), axis=1).sum()
    assert abs(area - 4 * np.pi * r**2) / (4 * np.pi * r**2) < 0.01


def test_marching_cubes_random_fields_manifold():
    """Smooth random fields (exercise most of the 256 configs incl.
    ambiguous faces): orientation-consistent, manifold, open edges only
    at the volume boundary."""
    from online_lang_splatting_tpu.tsdf.meshing import marching_cubes

    rng = np.random.default_rng(0)
    k = np.array([1, 4, 6, 4, 1], float)
    k /= k.sum()
    for _ in range(3):
        rep = np.kron(rng.normal(size=(6, 6, 6)), np.ones((4, 4, 4)))
        for ax in range(3):
            rep = np.apply_along_axis(
                lambda m: np.convolve(m, k, mode="same"), ax, rep)
        vol = rep - rep.mean()
        n = vol.shape[0]
        verts, faces = marching_cubes(vol)
        dir_edges, und = _edge_census(faces)
        assert all(v == 1 for v in dir_edges.values())
        assert all(v <= 2 for v in und.values())
        open_vids = {v for e, cnt in und.items() if cnt == 1 for v in e}
        if open_vids:
            ov = verts[list(open_vids)]
            assert ((ov < 1.0) | (ov > n - 2.0)).any(1).all()


def test_marching_cubes_all_256_configs():
    """Every corner-sign configuration meshes a single cell without
    degenerate faces, and its in-cube patch separates the positive from
    the negative corners (triangle count > 0 for mixed configs)."""
    from online_lang_splatting_tpu.tsdf.meshing import marching_cubes

    for cfg in range(256):
        vol = np.empty((2, 2, 2), np.float32)
        for c, (dx, dy, dz) in enumerate(_CORNER_OFFS):
            vol[dx, dy, dz] = 1.0 if (cfg >> c) & 1 else -1.0
        verts, faces = marching_cubes(vol)
        if cfg in (0, 255):
            assert len(faces) == 0
            continue
        assert len(faces) > 0
        assert all(len({int(a), int(b), int(c)}) == 3 for a, b, c in faces)
        assert faces.min() >= 0 and faces.max() < len(verts)
        # Midpoint crossings for ±1 corners: every vertex at an edge mid.
        assert np.allclose(verts * 2, np.round(verts * 2))


def test_tsdf_volume_mesh_export(tmp_path):
    from online_lang_splatting_tpu.tsdf.fusion import TSDFVolume
    from online_lang_splatting_tpu.tsdf.meshing import extract_mesh, write_mesh_ply

    h, w = 32, 40
    intr = (40.0, 40.0, 20.0, 16.0)
    depth = np.full((h, w), 2.0, np.float32)
    feat = np.full((3, h, w), 0.5, np.float32)
    vol = TSDFVolume([[-2, 2], [-2, 2], [0.5, 3.0]], 0.08, n_channels=3)
    vol.integrate(feat, depth, intr, np.eye(4, dtype=np.float32))
    for method in ("marching_cubes", "surface_nets"):
        verts, faces, vfeat = extract_mesh(vol, method=method)
        assert len(verts) > 20 and len(faces) > 20
        assert abs(np.median(verts[:, 2]) - 2.0) < 0.2
    p = tmp_path / "mesh.ply"
    write_mesh_ply(p, verts, faces, colors=vfeat)
    assert p.stat().st_size > 100
