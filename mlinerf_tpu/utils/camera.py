"""Camera and pose math (pure JAX, fixed shapes, vmappable).

Functional re-design of the reference pose/Lie/quaternion toolkit
(``projects/nerf/utils/camera.py``): every op is a pure function over
``[..., 3, 4]`` world-to-camera pose arrays ``[R|t]`` so the whole module
works under ``jit``/``vmap``/``grad`` without device-side control flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Pose ([...,3,4] = [R|t], world->camera convention as in the reference)
# ---------------------------------------------------------------------------


def pose_from_Rt(R=None, t=None):
    """Assemble a [...,3,4] pose from rotation and/or translation."""
    if R is None:
        t = jnp.asarray(t, jnp.float32)
        R = jnp.broadcast_to(jnp.eye(3, dtype=t.dtype), (*t.shape[:-1], 3, 3))
    elif t is None:
        R = jnp.asarray(R, jnp.float32)
        t = jnp.zeros(R.shape[:-1], R.dtype)
    R = jnp.asarray(R, jnp.float32)
    t = jnp.asarray(t, jnp.float32)
    return jnp.concatenate([R, t[..., None]], axis=-1)


def pose_invert(pose):
    """Invert a rigid pose: (R,t) -> (R^T, -R^T t)."""
    R, t = pose[..., :3], pose[..., 3:]
    R_inv = jnp.swapaxes(R, -1, -2)
    t_inv = (-R_inv @ t)[..., 0]
    return pose_from_Rt(R_inv, t_inv)


def pose_compose_pair(pose_a, pose_b):
    """pose_new(x) = pose_b(pose_a(x))."""
    R_a, t_a = pose_a[..., :3], pose_a[..., 3:]
    R_b, t_b = pose_b[..., :3], pose_b[..., 3:]
    R_new = R_b @ R_a
    t_new = (R_b @ t_a + t_b)[..., 0]
    return pose_from_Rt(R_new, t_new)


def pose_compose(pose_list):
    pose_new = pose_list[0]
    for p in pose_list[1:]:
        pose_new = pose_compose_pair(pose_new, p)
    return pose_new


def pose_scale_center(pose, scale):
    """Scale camera center distance from origin (t' = s*t)."""
    R, t = pose[..., :3], pose[..., 3:]
    return jnp.concatenate([R, t * scale], axis=-1)


def pose_interpolate(pose_a, pose_b, alpha):
    """Slerp rotation + lerp translation between two poses.

    ``alpha`` broadcasts over leading dims ([...,1]).
    """
    R_a, t_a = pose_a[..., :3], pose_a[..., 3:]
    R_b, t_b = pose_b[..., :3], pose_b[..., 3:]
    q_a = R_to_q(R_a)
    q_b = R_to_q(R_b)
    q = q_interpolate(q_a, q_b, alpha)
    R = q_to_R(q)
    t = (1 - alpha[..., None]) * t_a + alpha[..., None] * t_b
    return jnp.concatenate([R, t], axis=-1)


# ---------------------------------------------------------------------------
# Quaternions
# ---------------------------------------------------------------------------


def q_to_R(q):
    qa, qb, qc, qd = jnp.moveaxis(q, -1, 0)
    R = jnp.stack(
        [
            jnp.stack([1 - 2 * (qc**2 + qd**2), 2 * (qb * qc - qa * qd), 2 * (qa * qc + qb * qd)], axis=-1),
            jnp.stack([2 * (qb * qc + qa * qd), 1 - 2 * (qb**2 + qd**2), 2 * (qc * qd - qa * qb)], axis=-1),
            jnp.stack([2 * (qb * qd - qa * qc), 2 * (qa * qb + qc * qd), 1 - 2 * (qb**2 + qc**2)], axis=-1),
        ],
        axis=-2,
    )
    return R


def R_to_q(R, eps=1e-6):
    R00, R01, R02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    R10, R11, R12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    R20, R21, R22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    t = R00 + R11 + R22
    r = jnp.sqrt(jnp.clip(1 + t, eps, None))
    qa = 0.5 * r
    qb = jnp.sign(R21 - R12) * 0.5 * jnp.sqrt(jnp.clip(1 + R00 - R11 - R22, eps, None))
    qc = jnp.sign(R02 - R20) * 0.5 * jnp.sqrt(jnp.clip(1 - R00 + R11 - R22, eps, None))
    qd = jnp.sign(R10 - R01) * 0.5 * jnp.sqrt(jnp.clip(1 - R00 - R11 + R22, eps, None))
    return jnp.stack([qa, qb, qc, qd], axis=-1)


def q_invert(q):
    qa, qb, qc, qd = jnp.moveaxis(q, -1, 0)
    norm_sq = jnp.sum(q * q, axis=-1, keepdims=True)
    return jnp.stack([qa, -qb, -qc, -qd], axis=-1) / norm_sq


def q_product(q1, q2):
    a1, b1, c1, d1 = jnp.moveaxis(q1, -1, 0)
    a2, b2, c2, d2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            a1 * a2 - b1 * b2 - c1 * c2 - d1 * d2,
            a1 * b2 + b1 * a2 + c1 * d2 - d1 * c2,
            a1 * c2 - b1 * d2 + c1 * a2 + d1 * b2,
            a1 * d2 + b1 * c2 - c1 * b2 + d1 * a2,
        ],
        axis=-1,
    )


def q_interpolate(q1, q2, alpha, eps=1e-8):
    """Spherical linear interpolation. alpha: [...,1]."""
    cos_angle = jnp.sum(q1 * q2, axis=-1, keepdims=True)
    q1 = jnp.where(cos_angle < 0, -q1, q1)
    theta = jnp.arccos(jnp.clip(jnp.abs(cos_angle), 0.0, 1.0 - eps))
    sin_theta = jnp.sin(theta)
    # Fall back to lerp when the quaternions are (nearly) aligned.
    near = sin_theta < 1e-5
    w1 = jnp.where(near, 1 - alpha, jnp.sin((1 - alpha) * theta) / jnp.where(near, 1.0, sin_theta))
    w2 = jnp.where(near, alpha, jnp.sin(alpha * theta) / jnp.where(near, 1.0, sin_theta))
    q = w1 * q1 + w2 * q2
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# Lie algebra (SO(3)/SE(3))
# ---------------------------------------------------------------------------


def skew_symmetric(w):
    w0, w1, w2 = jnp.moveaxis(w, -1, 0)
    zero = jnp.zeros_like(w0)
    return jnp.stack(
        [
            jnp.stack([zero, -w2, w1], axis=-1),
            jnp.stack([w2, zero, -w0], axis=-1),
            jnp.stack([-w1, w0, zero], axis=-1),
        ],
        axis=-2,
    )


def _taylor_A(x, nth=10):
    # sin(x)/x
    ans = jnp.zeros_like(x)
    denom = 1.0
    for i in range(nth + 1):
        if i > 0:
            denom *= (2 * i) * (2 * i + 1)
        ans = ans + (-1) ** i * x ** (2 * i) / denom
    return ans


def _taylor_B(x, nth=10):
    # (1-cos(x))/x^2
    ans = jnp.zeros_like(x)
    denom = 1.0
    for i in range(nth + 1):
        denom *= (2 * i + 1) * (2 * i + 2)
        ans = ans + (-1) ** i * x ** (2 * i) / denom
    return ans


def _taylor_C(x, nth=10):
    # (x-sin(x))/x^3
    ans = jnp.zeros_like(x)
    denom = 1.0
    for i in range(nth + 1):
        denom *= (2 * i + 2) * (2 * i + 3)
        ans = ans + (-1) ** i * x ** (2 * i) / denom
    return ans


def so3_to_SO3(w):
    wx = skew_symmetric(w)
    theta = jnp.linalg.norm(w, axis=-1)[..., None, None]
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + _taylor_A(theta) * wx + _taylor_B(theta) * (wx @ wx)


def SO3_to_so3(R, eps=1e-7):
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    theta = jnp.arccos(jnp.clip((trace - 1) / 2, -1 + eps, 1 - eps))[..., None, None] % np.pi
    lnR = 1 / (2 * _taylor_A(theta) + 1e-8) * (R - jnp.swapaxes(R, -2, -1))
    w0, w1, w2 = lnR[..., 2, 1], lnR[..., 0, 2], lnR[..., 1, 0]
    return jnp.stack([w0, w1, w2], axis=-1)


def se3_to_SE3(wu):
    w, u = wu[..., :3], wu[..., 3:]
    wx = skew_symmetric(w)
    theta = jnp.linalg.norm(w, axis=-1)[..., None, None]
    eye = jnp.eye(3, dtype=w.dtype)
    R = eye + _taylor_A(theta) * wx + _taylor_B(theta) * (wx @ wx)
    V = eye + _taylor_B(theta) * wx + _taylor_C(theta) * (wx @ wx)
    return jnp.concatenate([R, V @ u[..., None]], axis=-1)


def SE3_to_se3(Rt, eps=1e-8):
    R, t = Rt[..., :3], Rt[..., 3:]
    w = SO3_to_so3(R)
    wx = skew_symmetric(w)
    theta = jnp.linalg.norm(w, axis=-1)[..., None, None]
    eye = jnp.eye(3, dtype=Rt.dtype)
    A, B = _taylor_A(theta), _taylor_B(theta)
    invV = eye - 0.5 * wx + (1 - A / (2 * B)) / (theta**2 + eps) * (wx @ wx)
    u = (invV @ t)[..., 0]
    return jnp.concatenate([w, u], axis=-1)


# ---------------------------------------------------------------------------
# World/camera/image coordinate transforms
# ---------------------------------------------------------------------------


def to_hom(X):
    return jnp.concatenate([X, jnp.ones_like(X[..., :1])], axis=-1)


def world2cam(X, pose):
    return to_hom(X) @ jnp.swapaxes(pose, -1, -2)


def cam2img(X, intr):
    return X @ jnp.swapaxes(intr, -1, -2)


def img2cam(X, intr):
    return X @ jnp.swapaxes(jnp.linalg.inv(intr), -1, -2)


def cam2world(X, pose):
    pose_inv = pose_invert(pose)
    return to_hom(X) @ jnp.swapaxes(pose_inv, -1, -2)


def angle_to_rotation_matrix(a, axis: str):
    """Rotation matrix from Euler angle around X/Y/Z axis."""
    roll = dict(X=1, Y=2, Z=0)[axis]
    a = jnp.asarray(a)
    zero = jnp.zeros_like(a)
    one = jnp.ones_like(a)
    M = jnp.stack(
        [
            jnp.stack([jnp.cos(a), -jnp.sin(a), zero], axis=-1),
            jnp.stack([jnp.sin(a), jnp.cos(a), zero], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )
    return jnp.roll(M, (roll, roll), axis=(-2, -1))


def get_center_and_ray(pose, intr, image_size):
    """Camera centers and (non-unit) pixel rays in world space.

    Args:
        pose: [...,3,4] world->camera pose.
        intr: [...,3,3] intrinsics.
        image_size: (H, W) python ints (static).
    Returns:
        center: [...,HW,3], ray: [...,HW,3] (depth-1 rays, not unit length).
    """
    H, W = image_size
    y = jnp.arange(H, dtype=jnp.float32) + 0.5
    x = jnp.arange(W, dtype=jnp.float32) + 0.5
    Y, X = jnp.meshgrid(y, x, indexing="ij")
    xy_grid = jnp.stack([X, Y], axis=-1).reshape(-1, 2)  # [HW,2]
    if pose.ndim == 3:
        xy_grid = jnp.broadcast_to(xy_grid, (pose.shape[0], *xy_grid.shape))
    grid_3D = img2cam(to_hom(xy_grid), intr)  # [...,HW,3]
    center_3D = jnp.zeros_like(grid_3D)
    grid_3D = cam2world(grid_3D, pose)
    center_3D = cam2world(center_3D, pose)
    ray = grid_3D - center_3D
    return center_3D, ray


def get_camera_center(pose, image_size=None, num_pixels=None):
    """Camera (or light) center in world space, broadcast per pixel.

    TPU-native counterpart of the reference's ``get_center``
    (projects/NeuralLumen/utils/utils.py:61-79): used to give every pixel its
    light-source position.
    """
    if num_pixels is None:
        H, W = image_size
        num_pixels = H * W
    center = jnp.zeros((num_pixels, 3), jnp.float32)
    if pose.ndim == 3:
        center = jnp.broadcast_to(center, (pose.shape[0], num_pixels, 3))
    return cam2world(center, pose)


def get_3D_points_from_dist(center, ray_unit, dist, multi=True):
    """x = c + d*v. If multi, expands center/ray over a samples axis."""
    if multi:
        center, ray_unit = center[..., None, :], ray_unit[..., None, :]
    return center + ray_unit * dist


def convert_NDC(center, ray, intr, near=1):
    """Shift ray origins to the near plane and project to NDC (LLFF-style)."""
    center = center + (near - center[..., 2:]) / ray[..., 2:] * ray
    cx, cy, cz = jnp.moveaxis(center, -1, 0)
    rx, ry, rz = jnp.moveaxis(ray, -1, 0)
    scale_x = intr[..., 0, 0] / intr[..., 0, 2]
    scale_y = intr[..., 1, 1] / intr[..., 1, 2]
    cnx = scale_x[..., None] * (cx / cz)
    cny = scale_y[..., None] * (cy / cz)
    cnz = 1 - 2 * near / cz
    rnx = scale_x[..., None] * (rx / rz - cx / cz)
    rny = scale_y[..., None] * (ry / rz - cy / cz)
    rnz = 2 * near / cz
    center_ndc = jnp.stack([cnx, cny, cnz], axis=-1)
    ray_ndc = jnp.stack([rnx, rny, rnz], axis=-1)
    return center_ndc, ray_ndc


def rotation_distance(R1, R2, eps=1e-7):
    R_diff = R1 @ jnp.swapaxes(R2, -2, -1)
    trace = R_diff[..., 0, 0] + R_diff[..., 1, 1] + R_diff[..., 2, 2]
    return jnp.arccos(jnp.clip((trace - 1) / 2, -1 + eps, 1 - eps))


def inside_camera_view(intr, pose, image_size, pts, z_min=0.0):
    """Whether world points project inside the camera frustum."""
    pts_cam = world2cam(pts, pose)
    z_ok = pts_cam[..., 2] > z_min
    pix = cam2img(pts_cam, intr)
    pts_2d = pix[..., :2] / pix[..., 2:]
    x_min, x_max = 0.5, image_size[0] - 0.5
    y_min, y_max = 0.5, image_size[1] - 0.5
    in_range = (
        (pts_2d[..., 0] >= x_min)
        & (pts_2d[..., 0] <= x_max)
        & (pts_2d[..., 1] >= y_min)
        & (pts_2d[..., 1] <= y_max)
    )
    return in_range & z_ok


def sample_on_spherical_cap(key, anchor, N, max_angle):
    """Uniform samples on the spherical cap of half-angle ``max_angle``
    centered on the unit vector ``anchor``.

    Functional counterpart of the reference's novel-pose sampler
    (projects/nerf/utils/camera.py:457-485): draw uniformly on the unit
    disk, lift to the cap of height ``h = 1 - cos(max_angle)`` around +z
    (area-preserving reparametrization), then rotate +z onto ``anchor``
    with the Rodrigues rotation built from ``anchor x z``. A PRNG key
    replaces torch's global RNG — the draw is pure and jit/vmap-safe.

    Args:
        key: PRNG key.
        anchor: [..., 3] unit vectors (cap centers).
        N: samples per anchor.
        max_angle: cap half-angle (radians).

    Returns:
        [..., N, 3] unit vectors inside the cap.
    """
    batch_shape = anchor.shape[:-1]
    k_r, k_t = jax.random.split(key)
    radius = jax.random.uniform(k_r, batch_shape + (N,))
    theta = jax.random.uniform(k_t, batch_shape + (N,)) * (2.0 * jnp.pi)
    x = jnp.sqrt(radius) * jnp.cos(theta)
    y = jnp.sqrt(radius) * jnp.sin(theta)
    h = 1.0 - jnp.cos(max_angle)  # cap height
    k = h * radius
    s = jnp.sqrt(h * (2.0 - k))
    points = jnp.stack([s * x, s * y, 1.0 - k], axis=-1)  # [...,N,3] around +z
    # Rodrigues: rotate +z onto the anchor (stable for anchor != -z).
    ref_z = jnp.asarray([0.0, 0.0, 1.0], anchor.dtype)
    v = -jnp.cross(anchor, jnp.broadcast_to(ref_z, anchor.shape))
    ss_v = skew_symmetric(v)
    denom = 1.0 + (anchor * ref_z).sum(-1)
    R = jnp.eye(3, dtype=anchor.dtype) + ss_v + (ss_v @ ss_v) / denom[..., None, None]
    # precision pinned: the default dot precision computes in bf16 on TPU
    # and quantizes unit vectors to ~1e-3 off the sphere.
    return jnp.einsum("...nj,...kj->...nk", points, R,
                      precision=jax.lax.Precision.HIGHEST)


def sample_on_spherical_cap_northern(key, anchor, N, max_angle, away_from=None,
                                     max_reject_count=8):
    """Cap samples restricted to the northern hemisphere (z > 0), optionally
    also "outward" of ``away_from`` (reference camera.py:488-514).

    The reference rejection-resamples in a data-dependent Python loop; under
    jit that is a bounded ``lax.fori_loop`` of ``max_reject_count`` fixed
    resample rounds (invalid lanes re-drawn each round). Lanes still invalid
    after the budget collapse to the anchor itself — the reference's own
    ``max_reject_count`` fallback, made shape-static.
    """
    def invalid_mask(points):
        bad = points[..., 2] < 0.0
        if away_from is not None:
            cos_ab = (away_from * anchor).sum(-1, keepdims=True)
            cos_ac = (away_from[..., None, :] * points).sum(-1)
            bad = bad | (cos_ab < cos_ac)
        return bad

    points = sample_on_spherical_cap(key, anchor, N, max_angle)

    def body(i, pts):
        k_i = jax.random.fold_in(key, i + 1)
        fresh = sample_on_spherical_cap(k_i, anchor, N, max_angle)
        return jnp.where(invalid_mask(pts)[..., None], fresh, pts)

    points = jax.lax.fori_loop(0, max_reject_count, body, points)
    anchor_b = jnp.broadcast_to(anchor[..., None, :], points.shape)
    return jnp.where(invalid_mask(points)[..., None], anchor_b, points)
