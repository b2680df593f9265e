"""Minimal binary-little-endian PLY writer/reader (plyfile replacement).

Covers the reference's artifact formats: Gaussian snapshots with
f_language_i attributes (gaussian_model.py:478-563) and semantic point
clouds (tsdf-fusion recon outputs)."""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np


def write_ply(path, fields: dict[str, np.ndarray]):
    """fields: name → (N,) float32/int32 column arrays (ordered)."""
    n = len(next(iter(fields.values())))
    type_map = {np.dtype(np.float32): "float", np.dtype(np.int32): "int",
                np.dtype(np.uint8): "uchar"}
    cols = {k: np.ascontiguousarray(v) for k, v in fields.items()}
    header = ["ply", "format binary_little_endian 1.0", f"element vertex {n}"]
    for name, col in cols.items():
        header.append(f"property {type_map[col.dtype]} {name}")
    header.append("end_header")
    rec = np.rec.fromarrays(
        list(cols.values()), names=list(cols.keys())
    )
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode())
        f.write(rec.tobytes())


def read_ply(path) -> dict[str, np.ndarray]:
    with open(path, "rb") as f:
        data = f.read()
    head_end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:head_end].decode().splitlines()
    n = None
    props = []
    type_map = {"float": np.float32, "int": np.int32, "uchar": np.uint8,
                "double": np.float64}
    for line in header:
        parts = line.split()
        if parts[:2] == ["element", "vertex"]:
            n = int(parts[2])
        elif parts and parts[0] == "property" and n is not None:
            props.append((parts[2], type_map[parts[1]]))
    dtype = np.dtype([(name, t) for name, t in props])
    rec = np.frombuffer(data[head_end : head_end + n * dtype.itemsize], dtype)
    return {name: np.array(rec[name]) for name, _ in props}


def save_gaussians_ply(path, params, aux):
    """Reference-format Gaussian snapshot (x, y, z, f_dc_*, f_rest_*,
    f_language_*, opacity, scale_*, rot_*)."""
    import numpy as _np

    active = _np.asarray(aux.active)
    fields = {}
    xyz = _np.asarray(params.xyz)[active]
    for i, c in enumerate("xyz"):
        fields[c] = xyz[:, i].astype(_np.float32)
    for c in "xyz":
        fields[f"n{c}"] = _np.zeros(len(xyz), _np.float32)
    fdc = _np.asarray(params.features_dc)[active].reshape(len(xyz), -1)
    for i in range(fdc.shape[1]):
        fields[f"f_dc_{i}"] = fdc[:, i]
    frest = _np.asarray(params.features_rest)[active].reshape(len(xyz), -1)
    for i in range(frest.shape[1]):
        fields[f"f_rest_{i}"] = frest[:, i]
    lang = _np.asarray(params.language)[active]
    for i in range(lang.shape[1]):
        fields[f"f_language_{i}"] = lang[:, i]
    fields["opacity"] = _np.asarray(params.opacity)[active][:, 0]
    scal = _np.asarray(params.scaling)[active]
    for i in range(scal.shape[1]):
        fields[f"scale_{i}"] = scal[:, i]
    rot = _np.asarray(params.rotation)[active]
    for i in range(rot.shape[1]):
        fields[f"rot_{i}"] = rot[:, i]
    write_ply(path, fields)


def load_gaussians_ply(path, capacity: int | None = None):
    """Read a reference-format snapshot back into (params, aux) at the
    given capacity (defaults to next power of two)."""
    from ..models import gaussians as G
    import jax.numpy as jnp

    d = read_ply(path)
    n = len(d["x"])
    cap = capacity or max(1 << (n - 1).bit_length(), 1024)
    lang_dims = sorted(
        int(k.split("_")[-1]) for k in d if k.startswith("f_language_")
    )
    rest_dims = sorted(
        int(k.split("_")[-1]) for k in d if k.startswith("f_rest_")
    )
    n_rest = (len(rest_dims) // 3) if rest_dims else 0
    sh_degree = int(np.sqrt(n_rest + 1)) - 1
    params = G.empty_params(cap, sh_degree, len(lang_dims))
    aux = G.empty_aux(cap)

    def put(field, value):
        return field.at[:n].set(jnp.asarray(value))

    xyz = np.stack([d["x"], d["y"], d["z"]], -1)
    fdc = np.stack([d[f"f_dc_{i}"] for i in range(3)], -1)[:, None, :]
    if rest_dims:
        frest = np.stack(
            [d[f"f_rest_{i}"] for i in rest_dims], -1
        ).reshape(n, n_rest, 3)
    else:
        frest = np.zeros((n, 0, 3), np.float32)
    lang = (
        np.stack([d[f"f_language_{i}"] for i in lang_dims], -1)
        if lang_dims else np.zeros((n, 0), np.float32)
    )
    scal = np.stack(
        [d[k] for k in sorted(d) if k.startswith("scale_")], -1
    )
    rot = np.stack([d[f"rot_{i}"] for i in range(4)], -1)
    params = G.GaussianParams(
        xyz=put(params.xyz, xyz),
        features_dc=put(params.features_dc, fdc),
        features_rest=put(params.features_rest, frest),
        scaling=put(params.scaling, scal),
        rotation=put(params.rotation, rot),
        opacity=put(params.opacity, d["opacity"][:, None]),
        language=put(params.language, lang),
    )
    aux = aux._replace(active=aux.active.at[:n].set(True))
    return params, aux
