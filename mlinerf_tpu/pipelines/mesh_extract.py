"""Block-wise SDF mesh extraction.

Counterpart of ``projects/neuralangelo/utils/mesh.py`` +
``scripts/extract_mesh.py``: lattice blocks -> SDF evaluated on device in
fixed-size chunks -> native marching tetrahedra per block on the host ->
concatenated, bounding-sphere filtered, rescaled to the original world frame,
exported as PLY (optionally with vertex colors from the radiance field).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from mlinerf_tpu.ops import mesh as mesh_ops


def lattice_blocks(bounds_min, bounds_max, resolution: int, block_res: int = 128):
    """Yield (origin_idx [3], grid points [bx,by,bz,3]) covering the lattice.

    Blocks overlap by one sample so surfaces are seamless across block
    boundaries (the reference's LatticeGrid with overlap, mesh.py:64-80).
    """
    bounds_min = np.asarray(bounds_min, np.float32)
    bounds_max = np.asarray(bounds_max, np.float32)
    xs = np.linspace(bounds_min[0], bounds_max[0], resolution)
    ys = np.linspace(bounds_min[1], bounds_max[1], resolution)
    zs = np.linspace(bounds_min[2], bounds_max[2], resolution)
    step = block_res - 1
    for i0 in range(0, resolution - 1, step):
        for j0 in range(0, resolution - 1, step):
            for k0 in range(0, resolution - 1, step):
                i1 = min(i0 + block_res, resolution)
                j1 = min(j0 + block_res, resolution)
                k1 = min(k0 + block_res, resolution)
                X, Y, Z = np.meshgrid(xs[i0:i1], ys[j0:j1], zs[k0:k1], indexing="ij")
                pts = np.stack([X, Y, Z], axis=-1).astype(np.float32)
                yield (i0, j0, k0), pts


def extract_mesh(
    sdf_fn,
    bounds_min=(-1, -1, -1),
    bounds_max=(1, 1, 1),
    resolution: int = 256,
    block_res: int = 128,
    intersection_mult: float = 1.0,
    filter_lcc: bool = False,
    sphere_center=(0.0, 0.0, 0.0),
    sphere_radius: float = 1.0,
    chunk: int = 262144,
    texture_fn=None,
    filter_bounding_sphere: bool = True,
):
    """Extract the zero set of ``sdf_fn``.

    Args:
        sdf_fn: [N,3] -> [N] SDF values (jit-compiled by the caller or here).
        sphere_center/radius: world-frame rescale applied to the output
            vertices (undoes the dataset normalization).
        texture_fn: optional [V,3] -> [V,3] RGB in [0,1] for vertex colors.
    Returns:
        (verts [V,3], faces [T,3], colors [V,3] uint8 or None)
    """
    bounds_min = np.asarray(bounds_min, np.float32)
    bounds_max = np.asarray(bounds_max, np.float32)
    cell = (bounds_max - bounds_min) / (resolution - 1)
    soups = []
    for (i0, j0, k0), pts in lattice_blocks(bounds_min, bounds_max, resolution, block_res):
        shape = pts.shape[:3]
        flat = pts.reshape(-1, 3)
        vals = np.empty(len(flat), np.float32)
        for c0 in range(0, len(flat), chunk):
            c1 = min(c0 + chunk, len(flat))
            pad = chunk - (c1 - c0)
            x = flat[c0:c1]
            if pad:
                x = np.concatenate([x, np.zeros((pad, 3), np.float32)])
            v = np.asarray(jax.device_get(sdf_fn(jnp.asarray(x))))
            vals[c0:c1] = v.reshape(-1)[: c1 - c0]
        field = vals.reshape(shape)
        tris = mesh_ops.marching_tets(field, 0.0)
        if len(tris) == 0:
            continue
        # Grid-index coords -> world coords within this block.
        origin = bounds_min + np.asarray([i0, j0, k0], np.float32) * cell
        tris = tris * cell[None, None, :] + origin[None, None, :]
        soups.append(tris)
    if not soups:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64), None
    soup = np.concatenate(soups, axis=0)
    if filter_bounding_sphere:
        centers = soup.mean(axis=1)
        keep = np.linalg.norm(centers, axis=-1) <= 1.0
        soup = soup[keep]
    verts, faces = mesh_ops.weld_vertices(soup)
    if filter_lcc and len(faces):
        verts, faces = filter_largest_cc(verts, faces)
    # Undo dataset normalization: world = v * radius + center.
    verts_world = verts * sphere_radius + np.asarray(sphere_center, np.float32)
    colors = None
    if texture_fn is not None and len(verts):
        rgb = np.asarray(jax.device_get(texture_fn(jnp.asarray(verts))))
        colors = np.clip(rgb * 255, 0, 255).astype(np.uint8)
    return verts_world, faces, colors


def filter_largest_cc(verts, faces):
    """Keep only the connected component with the largest surface area.

    Counterpart of the reference's ``filter_largest_cc`` (trimesh
    ``mesh.split`` + area argmax, projects/neuralangelo/utils/mesh.py:151-158)
    without the trimesh dependency: connected components over the vertex-edge
    graph (vectorized sparse csgraph — production meshes have millions of
    faces, a per-face Python loop takes minutes), per-component triangle-area
    sums, then vertex/face reindexing.
    """
    import scipy.sparse as sp
    from scipy.sparse.csgraph import connected_components

    verts = np.asarray(verts)
    faces = np.asarray(faces)
    n = len(verts)
    rows = np.concatenate([faces[:, 0], faces[:, 0]])
    cols = np.concatenate([faces[:, 1], faces[:, 2]])
    graph = sp.coo_matrix((np.ones(len(rows), np.int8), (rows, cols)), shape=(n, n))
    _, roots = connected_components(graph, directed=False)

    e1 = verts[faces[:, 1]] - verts[faces[:, 0]]
    e2 = verts[faces[:, 2]] - verts[faces[:, 0]]
    areas = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)
    face_root = roots[faces[:, 0]]
    area_by_root = np.zeros(len(verts))
    np.add.at(area_by_root, face_root, areas)
    best = int(np.argmax(area_by_root))

    keep_v = roots == best
    new_index = np.full(len(verts), -1, np.int64)
    new_index[keep_v] = np.arange(int(keep_v.sum()))
    keep_f = keep_v[faces[:, 0]]
    return verts[keep_v], new_index[faces[keep_f]]


def trainer_texture_fn(trainer):
    """Jitted [N,3]->[N,3] RGB probe for vertex colors.

    Views each vertex head-on (ray = -normal, like the reference's
    ``extract_texture``, mesh.py:119-158); for light-conditioned models the
    light sits at the camera (headlight, one unit along the normal).

    Submodules like ``neural_sdf``/``neural_rgb`` are setup-scoped linen
    attributes, so each probe runs as an ``apply`` method closure over the
    bound module.
    """
    from mlinerf_tpu.models import lumen as lumen_models

    cond = trainer.make_cond(jnp.asarray(trainer.current_iteration, jnp.int32))
    params = trainer.eval_params()
    model = trainer.model
    cfg_model = model.cfg_model
    is_lumen = isinstance(model, lumen_models.Model)
    # With appearance embeddings on, the reference probes with a ZERO
    # embedding (extract_texture, mesh.py:59-63) — the head input dim
    # requires it.
    app_dim = cfg_model.appear_embed.dim if cfg_model.appear_embed.enabled else 0

    @jax.jit
    def fn(pts):
        p = pts[None]  # [1,N,3]

        def apply(method, *a, **kw):
            return model.apply({"params": params}, *a, method=method, **kw)

        sdfs, feats = apply(lambda m, x, lm: m.neural_sdf(x, lm),
                            p, cond.get("level_mask"))
        gradients, _ = apply(model.compute_gradients, p, cond, training=False, sdf=sdfs)
        normals = gradients / (jnp.linalg.norm(gradients, axis=-1, keepdims=True) + 1e-12)
        rays = -normals
        app = jnp.zeros(p.shape[:-1] + (app_dim,)) if app_dim else None
        rgb_probe = lambda m, *a, **kw: m.neural_rgb(*a, **kw)
        if is_lumen:
            heads = apply(rgb_probe, p, normals, rays, feats, p + normals, app=app)
            rgb = heads[0] if isinstance(heads, tuple) else heads
        else:
            rgb = apply(rgb_probe, p, normals, rays, feats, app=app)
        return rgb[0]

    return fn


def trainer_sdf_fn(trainer):
    """Jitted [N,3]->[N] SDF closure over the trainer's current params."""
    cond = trainer.make_cond(jnp.asarray(trainer.current_iteration, jnp.int32))
    params = trainer.eval_params()
    model = trainer.model

    @jax.jit
    def fn(pts):
        sdf = model.apply({"params": params}, pts[None], cond,
                          method=model.sdf_only)
        return sdf[0, :, 0]

    return fn
