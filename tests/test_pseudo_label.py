"""Pseudo-label pipeline tests: ops (kmeans/knn/morphology) and the full
cross-light label generation from a real test_all_light render."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlinerf_tpu.ops import kmeans as kmeans_ops
from mlinerf_tpu.ops import knn as knn_ops
from mlinerf_tpu.ops import morphology as morph
from mlinerf_tpu.pipelines import pseudo_label as pl
from mlinerf_tpu.pipelines.label_store import load_results_all, save_results_all


def test_kmeans_two_blobs():
    rng = np.random.default_rng(0)
    a = rng.normal([0, 0], 0.1, (50, 2))
    b = rng.normal([5, 5], 0.1, (50, 2))
    pts = jnp.asarray(np.concatenate([a, b]), jnp.float32)
    labels, centers = kmeans_ops.kmeans(pts, 2, num_iters=10)
    labels = np.asarray(labels)
    assert len(set(labels[:50])) == 1 and len(set(labels[50:])) == 1
    assert labels[0] != labels[-1]
    c = np.sort(np.asarray(centers), axis=0)
    np.testing.assert_allclose(c[0], [0, 0], atol=0.15)
    np.testing.assert_allclose(c[1], [5, 5], atol=0.15)


def test_kmeans_per_pixel_batched():
    rng = np.random.default_rng(1)
    # 10 pixels, each with 8 lights in 2 clusters
    base = rng.normal(0, 0.05, (10, 8, 2))
    base[:, 4:, :] += 3.0
    labels, centers = kmeans_ops.kmeans_per_pixel(jnp.asarray(base, jnp.float32), 2)
    labels = np.asarray(labels)
    for p in range(10):
        assert len(set(labels[p, :4])) == 1
        assert len(set(labels[p, 4:])) == 1
        assert labels[p, 0] != labels[p, 7]


def test_nearest_neighbor():
    db = jnp.asarray([[0.0, 0], [10, 0], [0, 10]])
    q = jnp.asarray([[1.0, 0], [9, 1], [1, 9]])
    idx, dist = knn_ops.nearest_neighbor(q, db)
    np.testing.assert_array_equal(np.asarray(idx), [0, 1, 2])


def test_masked_nearest_fill():
    values = jnp.asarray([[1.0], [2.0], [999.0]])
    feats = jnp.asarray([[0.0], [10.0], [0.1]])
    valid = jnp.asarray([True, True, False])
    filled = knn_ops.masked_nearest_fill(values, feats, valid)
    # invalid pixel (feat 0.1) takes value of nearest valid (feat 0.0 -> 1.0)
    np.testing.assert_allclose(np.asarray(filled), [[1.0], [2.0], [1.0]])


def test_edge_weight_low_near_boundary():
    x = jnp.zeros((16, 16)).at[4:12, 4:12].set(1.0)
    w = morph.edge_weight(x, 2)
    w = np.asarray(w)
    assert w[8, 8] > 0.9  # interior: certain
    assert w[4, 4] < 0.5  # boundary: uncertain
    assert w[0, 0] > 0.9  # far outside: certain


def test_find_best_ref_majority():
    # 3 lights, 2x2 image, 2 clusters. Light 2 disagrees (cluster 1);
    # majority cluster is 0 -> ref averaged over lights 0,1 only.
    L, H, W = 3, 2, 2
    mask_shading = jnp.ones((L, H, W), bool)
    labels = jnp.asarray(np.array([[[0, 0], [0, 0]], [[0, 0], [0, 0]], [[1, 1], [1, 1]]]))
    shadings = jnp.ones((L, H, W))
    ref = jnp.stack([jnp.full((H, W, 3), 1.0), jnp.full((H, W, 3), 3.0), jnp.full((H, W, 3), 100.0)])
    out = pl.find_best_ref(mask_shading, labels, 2, shadings, 0.5, ref)
    np.testing.assert_allclose(np.asarray(out), 2.0, atol=1e-5)


def test_label_store_roundtrip(tmp_path):
    data = {"0": {"pseudo_reflectance": np.ones((4, 4, 3)),
                  "1": {"pseudo_shading_gamma": np.zeros((4, 4, 1))}}}
    path = str(tmp_path / "store")
    save_results_all(data, path)
    loaded = load_results_all(path)
    np.testing.assert_array_equal(loaded["0"]["pseudo_reflectance"], data["0"]["pseudo_reflectance"])
    np.testing.assert_array_equal(loaded["0"]["1"]["pseudo_shading_gamma"],
                                  data["0"]["1"]["pseudo_shading_gamma"])


def test_full_pipeline_on_synthetic_gt():
    """Run the label pipeline on analytically rendered ground-truth inputs:
    the recovered pseudo reflectance must correlate with the true albedo."""
    from mlinerf_tpu.data.synthetic import (
        SPHERE_RADIUS, look_at_pose, procedural_reflectance, render_sphere_image,
    )

    H = W = 32
    focal = 1.2 * H
    intr = np.asarray([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], np.float32)
    cam_pos = np.asarray([2.0, 0.5, 1.0], np.float32)
    pose = look_at_pose(cam_pos)
    lights = [np.asarray(p, np.float32) for p in ([1.5, 0.5, 1.0], [0.5, 1.5, 1.0], [1.0, -1.0, 1.5], [-0.5, 1.0, 1.5])]
    results_cam = {}
    results_light = {}
    # reconstruct surface normals/points analytically for the normal map
    for li, lp in enumerate(lights):
        img, ref, sha, mask = render_sphere_image(pose, intr, lp, (H, W))
        # analytic visibility = shading > 0 on the sphere
        vis = ((sha[..., :1] > 0) & (mask > 0)).astype(np.float32)
        # normal map in camera frame is not needed precisely; use world normal
        results_light[str(li)] = {
            "rgb_target": img[None],
            "rgb_render": img[None],
            "normal": (np.ones((H, W, 3)) * mask)[None],
            "normal_x_light": sha[..., :1][None] * mask[None],
            "visibility": vis[None],
            "inter_mask": mask[None],
        }
    results_cam["0"] = results_light
    out = pl.generate_pseudo_labels(results_cam, setting="pair")
    assert "pseudo_reflectance" in out["0"]
    pr = out["0"]["pseudo_reflectance"]
    assert pr.shape == (H, W, 3)
    assert np.isfinite(pr).all()
    # On strongly lit sphere pixels the pseudo reflectance should be close to
    # the true albedo (shading division is exact here up to gamma handling).
    img, ref, sha, mask = render_sphere_image(pose, intr, lights[0], (H, W))
    strong = (sha[..., 0] > 0.7) & (mask[..., 0] > 0)
    if strong.sum() > 10:
        err = np.abs(pr[strong] - ref[strong]).mean()
        assert err < 0.25, err
    for li in range(4):
        assert out["0"][str(li)]["pseudo_shading_gamma"].shape == (H, W, 1)
        assert out["0"][str(li)]["visibility_certainty"].shape == (H, W, 1)
