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
