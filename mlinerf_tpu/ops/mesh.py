"""Isosurface extraction: native marching tetrahedra with ctypes bindings.

Host-side counterpart of the reference's pymcubes usage
(projects/neuralangelo/utils/mesh.py). The C++ kernel (native/
marching_tets.cpp) compiles on demand with g++; a pure-numpy vectorized
fallback covers environments without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libmarching_tets.so")
_LIB = None


def _build_native() -> Optional[str]:
    src = os.path.join(_NATIVE_DIR, "marching_tets.cpp")
    if not os.path.exists(src):
        return None
    if os.path.exists(_SO_PATH) and os.path.getmtime(_SO_PATH) >= os.path.getmtime(src):
        return _SO_PATH
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", src, "-o", _SO_PATH],
            check=True, capture_output=True,
        )
        return _SO_PATH
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


def _get_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = _build_native()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.marching_tets.restype = ctypes.c_int
    lib.marching_tets.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ctypes.POINTER(ctypes.c_long),
    ]
    _LIB = lib
    return lib


def marching_tets(field: np.ndarray, iso: float = 0.0) -> np.ndarray:
    """Extract the iso-surface of a [nx,ny,nz] scalar field.

    Returns a triangle soup [T, 3, 3] in grid-index coordinates.
    """
    field = np.ascontiguousarray(field, np.float32)
    nx, ny, nz = field.shape
    lib = _get_lib()
    if lib is not None:
        max_verts = int(3 * 12 * max(nx * ny * nz, 1))
        # Start with a reasonable buffer; grow on overflow.
        cap = min(max_verts, 4_000_000 * 3)
        while True:
            out = np.empty((cap, 3), np.float32)
            n = ctypes.c_long(0)
            ret = lib.marching_tets(
                field.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nx, ny, nz,
                ctypes.c_float(iso), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                ctypes.c_long(cap), ctypes.byref(n),
            )
            if ret == 0:
                return out[: n.value].reshape(-1, 3, 3)
            cap *= 4
    return _marching_tets_numpy(field, iso)


# ---------------------------------------------------------------------------
# Pure-numpy fallback (vectorized over cubes; same tet decomposition).
# ---------------------------------------------------------------------------

_TETS = np.asarray(
    [[0, 5, 1, 6], [0, 1, 2, 6], [0, 2, 3, 6], [0, 3, 7, 6], [0, 7, 4, 6], [0, 4, 5, 6]]
)
_DX = np.asarray([0, 1, 1, 0, 0, 1, 1, 0])
_DY = np.asarray([0, 0, 1, 1, 0, 0, 1, 1])
_DZ = np.asarray([0, 0, 0, 0, 1, 1, 1, 1])


def _marching_tets_numpy(field: np.ndarray, iso: float) -> np.ndarray:
    nx, ny, nz = field.shape
    xi, yi, zi = np.meshgrid(
        np.arange(nx - 1), np.arange(ny - 1), np.arange(nz - 1), indexing="ij"
    )
    xi, yi, zi = xi.ravel(), yi.ravel(), zi.ravel()
    # corner values [C, 8]
    vals = np.stack([field[xi + _DX[c], yi + _DY[c], zi + _DZ[c]] for c in range(8)], axis=1)
    active = ~(np.all(vals < iso, axis=1) | np.all(vals >= iso, axis=1))
    xi, yi, zi, vals = xi[active], yi[active], zi[active], vals[active]
    corners = np.stack(
        [np.stack([xi + _DX[c], yi + _DY[c], zi + _DZ[c]], axis=-1) for c in range(8)], axis=1
    ).astype(np.float32)  # [C,8,3]
    tris = []
    for tet in _TETS:
        p = corners[:, tet]  # [C,4,3]
        v = vals[:, tet]  # [C,4]
        tris.append(_march_tets_batch(p, v, iso))
    if not tris:
        return np.zeros((0, 3, 3), np.float32)
    return np.concatenate([t for t in tris if len(t)], axis=0) if any(len(t) for t in tris) \
        else np.zeros((0, 3, 3), np.float32)


def _interp(iso, p1, p2, v1, v2):
    denom = v2 - v1
    t = np.where(np.abs(denom) > 1e-12, (iso - v1) / np.where(np.abs(denom) > 1e-12, denom, 1.0), 0.5)
    t = np.clip(t, 0, 1)[..., None]
    return p1 + t * (p2 - p1)


def _march_tets_batch(p, v, iso):
    """Vectorized single-tet marching over a batch: p [C,4,3], v [C,4]."""
    inside = v < iso  # [C,4]
    code = inside[:, 0] * 1 + inside[:, 1] * 2 + inside[:, 2] * 4 + inside[:, 3] * 8
    tris = []
    # one-corner cases (and complements): corner a inside (or outside).
    one_corner = {1: 0, 2: 1, 4: 2, 8: 3, 14: 0, 13: 1, 11: 2, 7: 3}
    for c_val, a in one_corner.items():
        m = code == c_val
        if not m.any():
            continue
        others = [i for i in range(4) if i != a]
        e = [_interp(iso, p[m, a], p[m, o], v[m, a], v[m, o]) for o in others]
        tris.append(np.stack([e[0], e[1], e[2]], axis=1))
    # two-corner cases: pairs (a,b) inside -> quad -> two triangles.
    two_corner = {3: (0, 1), 12: (2, 3), 5: (0, 2), 10: (1, 3), 6: (1, 2), 9: (0, 3)}
    for c_val, (a, b) in two_corner.items():
        m = code == c_val
        if not m.any():
            continue
        others = [i for i in range(4) if i not in (a, b)]
        ea0 = _interp(iso, p[m, a], p[m, others[0]], v[m, a], v[m, others[0]])
        ea1 = _interp(iso, p[m, a], p[m, others[1]], v[m, a], v[m, others[1]])
        eb0 = _interp(iso, p[m, b], p[m, others[0]], v[m, b], v[m, others[0]])
        eb1 = _interp(iso, p[m, b], p[m, others[1]], v[m, b], v[m, others[1]])
        tris.append(np.stack([ea0, ea1, eb1], axis=1))
        tris.append(np.stack([ea0, eb1, eb0], axis=1))
    if not tris:
        return np.zeros((0, 3, 3), np.float32)
    return np.concatenate(tris, axis=0)


# ---------------------------------------------------------------------------
# Mesh utilities
# ---------------------------------------------------------------------------


def weld_vertices(tri_soup: np.ndarray, decimals: int = 5) -> Tuple[np.ndarray, np.ndarray]:
    """Triangle soup [T,3,3] -> (vertices [V,3], faces [T,3]) by welding."""
    flat = tri_soup.reshape(-1, 3)
    keys = np.round(flat, decimals)
    uniq, inverse = np.unique(keys, axis=0, return_inverse=True)
    # Use the first occurrence's exact coordinates.
    first = np.zeros(len(uniq), np.int64)
    seen = np.full(len(uniq), -1, np.int64)
    for i, u in enumerate(inverse):
        if seen[u] < 0:
            seen[u] = i
    verts = flat[seen]
    faces = inverse.reshape(-1, 3)
    return verts.astype(np.float32), faces.astype(np.int64)


def save_ply(path: str, verts: np.ndarray, faces: np.ndarray, colors: Optional[np.ndarray] = None):
    """Write a binary-free ASCII PLY (universally readable)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_indices\n")
        f.write("end_header\n")
        for i, v in enumerate(verts):
            line = f"{v[0]:.6f} {v[1]:.6f} {v[2]:.6f}"
            if colors is not None:
                c = colors[i]
                line += f" {int(c[0])} {int(c[1])} {int(c[2])}"
            f.write(line + "\n")
        for face in faces:
            f.write(f"3 {face[0]} {face[1]} {face[2]}\n")
