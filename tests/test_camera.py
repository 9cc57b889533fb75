import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlinerf_tpu.utils import camera


def random_rotation(rng):
    """Random rotation via QR decomposition."""
    A = rng.standard_normal((3, 3))
    Q, R = np.linalg.qr(A)
    Q = Q * np.sign(np.diag(R))
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    return Q


def test_pose_invert_roundtrip():
    rng = np.random.default_rng(0)
    R = random_rotation(rng)
    t = rng.standard_normal(3)
    pose = camera.pose_from_Rt(R, t)
    pose_inv = camera.pose_invert(pose)
    composed = camera.pose_compose_pair(pose, pose_inv)
    np.testing.assert_allclose(composed[..., :3], np.eye(3), atol=1e-5)
    np.testing.assert_allclose(composed[..., 3], np.zeros(3), atol=1e-5)


def test_pose_compose_matches_matrix_product():
    rng = np.random.default_rng(1)
    poses = [camera.pose_from_Rt(random_rotation(rng), rng.standard_normal(3)) for _ in range(3)]
    out = camera.pose_compose(poses)

    def to44(p):
        return np.vstack([np.asarray(p), [0, 0, 0, 1]])

    expect = to44(poses[2]) @ to44(poses[1]) @ to44(poses[0])
    np.testing.assert_allclose(out, expect[:3], atol=1e-5)


def test_quaternion_roundtrip():
    rng = np.random.default_rng(2)
    R = random_rotation(rng)
    q = camera.R_to_q(jnp.asarray(R))
    R2 = camera.q_to_R(q)
    np.testing.assert_allclose(R, R2, atol=1e-4)


def test_quaternion_slerp_endpoints():
    rng = np.random.default_rng(3)
    Ra, Rb = random_rotation(rng), random_rotation(rng)
    pa = camera.pose_from_Rt(Ra, rng.standard_normal(3))
    pb = camera.pose_from_Rt(Rb, rng.standard_normal(3))
    p0 = camera.pose_interpolate(pa, pb, jnp.asarray([0.0]))
    p1 = camera.pose_interpolate(pa, pb, jnp.asarray([1.0]))
    np.testing.assert_allclose(p0, pa, atol=1e-4)
    np.testing.assert_allclose(p1, pb, atol=1e-4)


def test_slerp_halfway_angle():
    # Rotating 0 -> 90 deg about Z: halfway must be 45 deg.
    Ra = np.eye(3)
    Rb = np.asarray(camera.angle_to_rotation_matrix(np.pi / 2, "Z"))
    pa = camera.pose_from_Rt(Ra, np.zeros(3))
    pb = camera.pose_from_Rt(Rb, np.zeros(3))
    mid = camera.pose_interpolate(pa, pb, jnp.asarray([0.5]))
    expect = np.asarray(camera.angle_to_rotation_matrix(np.pi / 4, "Z"))
    np.testing.assert_allclose(mid[..., :3], expect, atol=1e-4)


def test_lie_so3_roundtrip():
    rng = np.random.default_rng(4)
    w = rng.standard_normal(3) * 0.5
    R = camera.so3_to_SO3(jnp.asarray(w, jnp.float32))
    w2 = camera.SO3_to_so3(R)
    np.testing.assert_allclose(w, w2, atol=1e-4)


def test_se3_roundtrip():
    rng = np.random.default_rng(5)
    wu = rng.standard_normal(6).astype(np.float32) * 0.3
    Rt = camera.se3_to_SE3(jnp.asarray(wu))
    wu2 = camera.SE3_to_se3(Rt)
    np.testing.assert_allclose(wu, wu2, atol=1e-4)


def test_world_cam_roundtrip():
    rng = np.random.default_rng(6)
    pose = camera.pose_from_Rt(random_rotation(rng), rng.standard_normal(3))
    X = jnp.asarray(rng.standard_normal((10, 3)), jnp.float32)
    X_cam = camera.world2cam(X, pose)
    X_back = camera.cam2world(X_cam, pose)
    np.testing.assert_allclose(X, X_back, atol=1e-4)


def test_get_center_and_ray_pinhole():
    # Identity pose, simple pinhole: ray through pixel center must match
    # K^-1 [u+0.5, v+0.5, 1].
    H, W = 4, 6
    f = 10.0
    intr = jnp.asarray([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    pose = camera.pose_from_Rt(np.eye(3), np.zeros(3))
    center, ray = camera.get_center_and_ray(pose, intr, (H, W))
    assert center.shape == (H * W, 3)
    np.testing.assert_allclose(center, 0, atol=1e-6)
    # pixel (0,0): x=0.5, y=0.5
    expect = np.linalg.inv(np.asarray(intr)) @ np.array([0.5, 0.5, 1.0])
    np.testing.assert_allclose(ray[0], expect, atol=1e-5)
    # batched path
    center_b, ray_b = camera.get_center_and_ray(pose[None], intr[None], (H, W))
    assert center_b.shape == (1, H * W, 3)
    np.testing.assert_allclose(ray_b[0], ray, atol=1e-6)


def test_camera_center_of_lights():
    rng = np.random.default_rng(7)
    R = random_rotation(rng)
    c = rng.standard_normal(3)  # camera center in world
    # world->cam pose: t = -R @ c
    pose = camera.pose_from_Rt(R, -R @ c)
    centers = camera.get_camera_center(jnp.asarray(pose), num_pixels=5)
    np.testing.assert_allclose(centers, np.broadcast_to(c, (5, 3)), atol=1e-5)


def test_inside_camera_view():
    H, W = 8, 8
    f = 8.0
    intr = jnp.asarray([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    pose = camera.pose_from_Rt(np.eye(3), np.zeros(3))
    pts = jnp.asarray([[0.0, 0.0, 2.0], [0.0, 0.0, -1.0], [100.0, 0.0, 1.0]])
    mask = camera.inside_camera_view(intr, pose, (H, W), pts)
    assert bool(mask[0]) and not bool(mask[1]) and not bool(mask[2])


def test_sample_on_spherical_cap():
    """Samples lie on the unit sphere, inside the cap angle, and are roughly
    area-uniform (reference camera.py:457-485 semantics, PRNG-key API)."""
    import jax

    key = jax.random.PRNGKey(0)
    max_angle = 0.4
    for anchor in ([0.0, 0.0, 1.0], [0.6, 0.0, 0.8], [0.0, -0.8, 0.6]):
        a = jnp.asarray(anchor)
        pts = camera.sample_on_spherical_cap(key, a, 2048, max_angle)
        assert pts.shape == (2048, 3)
        np.testing.assert_allclose(np.linalg.norm(pts, axis=-1), 1.0, atol=1e-5)
        cos_to_anchor = np.asarray(pts @ a)
        assert cos_to_anchor.min() >= np.cos(max_angle) - 1e-5
    # Area-uniformity on the cap: z = cos(angle-to-anchor) is uniform on
    # [cos(max_angle), 1] for a uniform cap distribution.
    a = jnp.asarray([0.0, 0.0, 1.0])
    z = np.asarray(camera.sample_on_spherical_cap(key, a, 8192, max_angle))[:, 2]
    u = (z - np.cos(max_angle)) / (1 - np.cos(max_angle))
    hist, _ = np.histogram(u, bins=8, range=(0, 1))
    assert hist.min() > 0.7 * (8192 / 8) and hist.max() < 1.3 * (8192 / 8)


def test_sample_on_spherical_cap_batched_jit():
    import jax

    key = jax.random.PRNGKey(3)
    anchors = jnp.asarray([[0.0, 0.0, 1.0], [0.6, 0.0, 0.8]])
    pts = jax.jit(
        lambda k: camera.sample_on_spherical_cap(k, anchors, 16, 0.5)
    )(key)
    assert pts.shape == (2, 16, 3)
    np.testing.assert_allclose(np.linalg.norm(pts, axis=-1), 1.0, atol=1e-5)


def test_sample_on_spherical_cap_northern():
    """Northern variant: z >= 0 always; with away_from, samples stay on the
    anchor's side (cos(away,anchor) >= cos(away,sample)); fallback collapses
    impossible lanes to the anchor (reference camera.py:488-514)."""
    import jax

    key = jax.random.PRNGKey(1)
    a = jnp.asarray([0.8, 0.0, 0.6])
    pts = camera.sample_on_spherical_cap_northern(key, a, 512, 1.2)
    assert float(pts[..., 2].min()) >= 0.0
    np.testing.assert_allclose(np.linalg.norm(pts, axis=-1), 1.0, atol=1e-5)

    away = jnp.asarray([0.0, 1.0, 0.0])
    pts2 = camera.sample_on_spherical_cap_northern(key, a, 512, 1.0,
                                                   away_from=away)
    cos_ab = float(away @ a)
    cos_ac = np.asarray(pts2 @ away)
    assert (cos_ac <= cos_ab + 1e-5).all()

    # An impossible constraint (away_from == -anchor: cos_ab = -1, so every
    # non-anchor sample is "not outwards") exhausts the reject budget ->
    # lanes collapse to the anchor.
    pts3 = camera.sample_on_spherical_cap_northern(
        key, a, 64, 3.0, away_from=-a, max_reject_count=2)
    frac_anchor = float(np.mean(np.linalg.norm(np.asarray(pts3) - np.asarray(a),
                                               axis=-1) < 1e-5))
    assert frac_anchor > 0.5
