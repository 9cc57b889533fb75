"""Mesh extraction tests: native marching tets, numpy fallback, pipeline."""

import numpy as np
import jax.numpy as jnp
import pytest

from mlinerf_tpu.ops import mesh as mesh_ops
from mlinerf_tpu.pipelines import mesh_extract


def sphere_field(n=33, radius=10.0, center=16.0):
    g = np.arange(n) - center
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    return (np.sqrt(X**2 + Y**2 + Z**2) - radius).astype(np.float32)


def test_marching_tets_sphere_radius():
    tris = mesh_ops.marching_tets(sphere_field(), 0.0)
    assert len(tris) > 1000
    r = np.linalg.norm(tris.mean(axis=1) - 16.0, axis=-1)
    np.testing.assert_allclose(r.mean(), 10.0, atol=0.05)
    assert r.std() < 0.05


def test_numpy_fallback_matches_native():
    field = sphere_field(n=17, radius=5.0, center=8.0)
    t_np = mesh_ops._marching_tets_numpy(field, 0.0)
    if mesh_ops._get_lib() is not None:
        t_c = mesh_ops.marching_tets(field, 0.0)
        assert len(t_np) == len(t_c)
        # same triangle set (order may differ) — compare sorted centroids
        c1 = np.sort(t_np.mean(axis=1), axis=0)
        c2 = np.sort(t_c.mean(axis=1), axis=0)
        np.testing.assert_allclose(c1, c2, atol=1e-5)


def test_weld_and_ply(tmp_path):
    tris = mesh_ops.marching_tets(sphere_field(n=17, radius=5.0, center=8.0), 0.0)
    verts, faces = mesh_ops.weld_vertices(tris)
    assert len(verts) < 3 * len(faces)  # welding actually shares vertices
    path = str(tmp_path / "m.ply")
    mesh_ops.save_ply(path, verts, faces)
    with open(path) as f:
        head = f.read(200)
    assert "element vertex" in head and "element face" in head


def test_extract_mesh_pipeline_analytic_sdf():
    """Full block-wise pipeline against an analytic sphere SDF (fn is the
    device-eval'd field)."""

    def sdf_fn(pts):
        return jnp.linalg.norm(pts, axis=-1) - 0.5

    verts, faces, _ = mesh_extract.extract_mesh(
        sdf_fn, (-1, -1, -1), (1, 1, 1), resolution=48, block_res=20,
        sphere_radius=2.0, sphere_center=(1.0, 0.0, 0.0),
    )
    assert len(verts) > 100 and len(faces) > 100
    # World-frame: radius 0.5 * 2.0 = 1.0 around (1,0,0).
    r = np.linalg.norm(verts - np.asarray([1.0, 0, 0]), axis=-1)
    np.testing.assert_allclose(r.mean(), 1.0, atol=0.02)
    # Seamless across blocks: every face edge has finite extent
    assert np.isfinite(verts).all()


def test_filter_largest_cc():
    """Union-find LCC filter keeps the larger-area component only
    (reference filter_largest_cc, mesh.py:151-158)."""
    # Two disjoint triangles: one big, one small.
    verts = np.asarray([
        [0, 0, 0], [2, 0, 0], [0, 2, 0],          # area 2.0
        [5, 5, 5], [5.1, 5, 5], [5, 5.1, 5],      # area 0.005
    ], np.float32)
    faces = np.asarray([[0, 1, 2], [3, 4, 5]])
    v2, f2 = mesh_extract.filter_largest_cc(verts, faces)
    assert len(v2) == 3 and len(f2) == 1
    np.testing.assert_array_equal(v2, verts[:3])
    np.testing.assert_array_equal(f2, [[0, 1, 2]])


def test_filter_largest_cc_two_sphere_pipeline():
    """Extract two spheres, keep only the bigger one via filter_lcc."""

    def sdf_fn(pts):
        d1 = jnp.linalg.norm(pts - jnp.asarray([0.4, 0, 0]), axis=-1) - 0.35
        d2 = jnp.linalg.norm(pts + jnp.asarray([0.55, 0, 0]), axis=-1) - 0.12
        return jnp.minimum(d1, d2)

    verts_all, _, _ = mesh_extract.extract_mesh(
        sdf_fn, (-1, -1, -1), (1, 1, 1), resolution=40, block_res=40)
    verts_lcc, faces_lcc, _ = mesh_extract.extract_mesh(
        sdf_fn, (-1, -1, -1), (1, 1, 1), resolution=40, block_res=40,
        filter_lcc=True)
    assert len(verts_lcc) < len(verts_all)
    # Everything that survives belongs to the big sphere around (0.4,0,0).
    r = np.linalg.norm(verts_lcc - np.asarray([0.4, 0, 0]), axis=-1)
    np.testing.assert_allclose(r, 0.35, atol=0.05)
    assert len(faces_lcc) > 50
