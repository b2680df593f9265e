"""Isosurface meshing of TSDF volumes (naive Surface Nets).

The reference extracts meshes with skimage marching cubes
(/root/reference/tsdf-fusion/fusion.py:295-320). Here we use naive
Surface Nets — one vertex per sign-changing cell placed at the centroid
of its edge crossings, one quad (two triangles) per volume edge with a
sign change — which produces watertight, comparable-quality meshes from
the same volumes with ~50 lines of vectorized numpy instead of the MC
case tables. Per-vertex features are sampled from the feature volume.
"""

from __future__ import annotations

import numpy as np

# Cell-corner offsets and the 12 cube edges as corner-index pairs.
_CORNERS = np.array(
    [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
     [0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1]]
)
_EDGES = np.array(
    [[0, 1], [2, 3], [4, 5], [6, 7], [0, 2], [1, 3], [4, 6], [5, 7],
     [0, 4], [1, 5], [2, 6], [3, 7]]
)


def surface_nets(tsdf: np.ndarray, weights: np.ndarray | None = None,
                 level: float = 0.0):
    """tsdf: (X, Y, Z) signed distance grid → (verts (V,3) in voxel coords,
    faces (F,3) int). Unobserved voxels (weight 0) are treated as outside."""
    vol = tsdf.astype(np.float32).copy()
    observed = np.ones(vol.shape, bool) if weights is None else weights > 0
    vol[~observed] = 1.0
    x, y, z = vol.shape
    # Corner samples for every cell.
    corners = np.stack(
        [vol[dx : x - 1 + dx, dy : y - 1 + dy, dz : z - 1 + dz]
         for dx, dy, dz in _CORNERS],
        axis=-1,
    )  # (X-1, Y-1, Z-1, 8)
    obs_c = np.stack(
        [observed[dx : x - 1 + dx, dy : y - 1 + dy, dz : z - 1 + dz]
         for dx, dy, dz in _CORNERS],
        axis=-1,
    )
    signs = corners > level
    # Cells touching unobserved space would mesh the truncation boundary
    # (a phantom back shell); only fully-observed cells emit geometry.
    active = signs.any(-1) & ~signs.all(-1) & obs_c.all(-1)
    idx = np.full(active.shape, -1, np.int64)
    cells = np.argwhere(active)
    idx[active] = np.arange(len(cells))

    # Vertex position: centroid of edge zero-crossings within the cell.
    c = corners[active]  # (N, 8)
    pos_acc = np.zeros((len(cells), 3))
    cnt = np.zeros((len(cells), 1))
    for e0, e1 in _EDGES:
        v0, v1 = c[:, e0], c[:, e1]
        cross = (v0 > level) != (v1 > level)
        t = np.where(cross, (level - v0) / np.where(cross, v1 - v0, 1.0), 0.0)
        p = _CORNERS[e0] + t[:, None] * (_CORNERS[e1] - _CORNERS[e0])
        pos_acc += np.where(cross[:, None], p, 0.0)
        cnt += cross[:, None]
    verts = cells + pos_acc / np.maximum(cnt, 1)

    # Quads: for each volume edge along axis a with a sign change, connect
    # the 4 cells sharing that edge.
    faces = []
    for axis, (d1, d2) in enumerate([((0, 1, 0), (0, 0, 1)),
                                     ((1, 0, 0), (0, 0, 1)),
                                     ((1, 0, 0), (0, 1, 0))]):
        step = np.zeros(3, int)
        step[axis] = 1
        a = vol[1 : x - 1, 1 : y - 1, 1 : z - 1]
        sl = tuple(
            slice(1 + s, dim - 1 + s)
            for s, dim in zip(step, (x, y, z))
        )
        b = vol[sl]
        change = (a > level) != (b > level)
        flip = a[change] > level
        base = np.argwhere(change) + 1  # grid coords of edge start
        d1 = np.asarray(d1)
        d2 = np.asarray(d2)
        q = []
        for off in [d1 + d2, d2, np.zeros(3, int), d1]:
            cell = base - off
            q.append(idx[cell[:, 0], cell[:, 1], cell[:, 2]])
        q = np.stack(q, axis=1)  # (M, 4)
        ok = (q >= 0).all(axis=1)
        q, fl = q[ok], flip[ok]
        tri1 = np.where(fl[:, None], q[:, [0, 1, 2]], q[:, [0, 2, 1]])
        tri2 = np.where(fl[:, None], q[:, [0, 2, 3]], q[:, [0, 3, 2]])
        faces.append(tri1)
        faces.append(tri2)
    faces = np.concatenate(faces, axis=0) if faces else np.zeros((0, 3), int)
    return verts, faces


def extract_mesh(volume, level: float = 0.0):
    """TSDFVolume → (verts world coords, faces, per-vertex features)."""
    tsdf, feats = volume.get_volume()
    w = np.asarray(volume.weights).reshape(volume.dims)
    verts, faces = surface_nets(tsdf, w, level)
    vi = np.clip(np.round(verts).astype(int), 0, np.asarray(volume.dims) - 1)
    vfeat = feats[:, vi[:, 0], vi[:, 1], vi[:, 2]].T
    world = volume.origin + (verts + 0.5) * volume.voxel_size
    return world.astype(np.float32), faces.astype(np.int32), vfeat


def write_mesh_ply(path, verts, faces, colors=None):
    """Triangle mesh PLY (binary little endian)."""
    import struct

    n, f = len(verts), len(faces)
    header = ["ply", "format binary_little_endian 1.0",
              f"element vertex {n}",
              "property float x", "property float y", "property float z"]
    if colors is not None:
        header += ["property uchar red", "property uchar green",
                   "property uchar blue"]
    header += [f"element face {f}", "property list uchar int vertex_indices",
               "end_header"]
    with open(path, "wb") as out:
        out.write(("\n".join(header) + "\n").encode())
        if colors is not None:
            cols = np.clip(colors * 255, 0, 255).astype(np.uint8)
            for v, c in zip(verts.astype(np.float32), cols):
                out.write(struct.pack("<fff3B", *v, *c))
        else:
            out.write(verts.astype("<f4").tobytes())
        counts = np.full((f, 1), 3, np.uint8)
        body = b"".join(
            struct.pack("<B3i", 3, *tri) for tri in faces
        )
        out.write(body)
