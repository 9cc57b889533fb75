import jax
import jax.numpy as jnp
import numpy as np

from mlinerf_tpu.utils import render, sampling, geometry, encoding, losses


# ---------------------------- rendering math ----------------------------


def test_alpha_compositing_weights_closed_form():
    alphas = jnp.asarray([[[0.5, 0.5, 1.0]]])
    w = render.alpha_compositing_weights(alphas)
    np.testing.assert_allclose(w[0, 0, :, 0], [0.5, 0.25, 0.25], atol=1e-6)


def test_weights_sum_to_opacity():
    rng = np.random.default_rng(0)
    alphas = jnp.asarray(rng.uniform(0, 1, (2, 3, 16)), jnp.float32)
    w = render.alpha_compositing_weights(alphas)
    opacity = render.composite_opacity(w)
    assert np.all(np.asarray(opacity) <= 1 + 1e-6)
    # opacity = 1 - prod(1 - a)
    expect = 1 - np.prod(1 - np.asarray(alphas), axis=-1, keepdims=True)
    np.testing.assert_allclose(opacity, expect, atol=1e-5)


def test_volume_rendering_weights_match_alpha_form():
    # For piecewise-constant density, T*alpha quadrature equals the alpha
    # compositing of alphas = 1-exp(-sigma*delta).
    rng = np.random.default_rng(1)
    dists = jnp.sort(jnp.asarray(rng.uniform(0.1, 3, (1, 4, 8, 1)), jnp.float32), axis=2)
    densities = jnp.asarray(rng.uniform(0, 5, (1, 4, 8)), jnp.float32)
    w1 = render.volume_rendering_weights_dist(densities, dists)
    alphas = render.volume_rendering_alphas_dist(densities, dists)
    w2 = render.alpha_compositing_weights(alphas)
    np.testing.assert_allclose(w1, w2, atol=1e-5)


def test_composite():
    quantities = jnp.ones((1, 2, 4, 3)) * jnp.arange(1, 5)[None, None, :, None]
    weights = jnp.full((1, 2, 4, 1), 0.25)
    out = render.composite(quantities, weights)
    np.testing.assert_allclose(out, 2.5, atol=1e-6)


# ---------------------------- sampling ----------------------------


def test_sample_dists_deterministic():
    d = sampling.sample_dists((2, 3), (1.0, 2.0), 4, stratified=False)
    assert d.shape == (2, 3, 4, 1)
    np.testing.assert_allclose(d[0, 0, :, 0], [1.125, 1.375, 1.625, 1.875], atol=1e-6)


def test_sample_dists_stratified_in_bins():
    key = jax.random.PRNGKey(0)
    d = sampling.sample_dists((2, 3), (0.0, 1.0), 10, stratified=True, key=key)
    d = np.asarray(d)[..., 0]
    bins = np.floor(d * 10).astype(int)
    np.testing.assert_array_equal(bins, np.broadcast_to(np.arange(10), bins.shape))


def test_sample_dists_from_pdf_concentrates():
    # All weight in bin 2 -> all fine samples inside [bins[2], bins[3]].
    bins = jnp.linspace(0, 1, 9)[None, None, :, None]  # [1,1,9,1]
    weights = jnp.zeros((1, 1, 8)).at[0, 0, 2].set(1.0)
    fine = sampling.sample_dists_from_pdf(bins, weights, intvs_fine=16)
    fine = np.asarray(fine)
    lo, hi = 2 / 8, 3 / 8
    assert fine.min() >= lo - 1e-6 and fine.max() <= hi + 1e-6


def test_sample_dists_from_pdf_uniform():
    bins = jnp.linspace(0, 1, 5)[None, None, :, None]
    weights = jnp.ones((1, 1, 4))
    fine = sampling.sample_dists_from_pdf(bins, weights, intvs_fine=4)
    np.testing.assert_allclose(np.asarray(fine)[0, 0, :, 0], [0.125, 0.375, 0.625, 0.875], atol=1e-5)


def test_random_ray_indices_distinct():
    idx = sampling.random_ray_indices(jax.random.PRNGKey(0), 2, 100, 32)
    assert idx.shape == (2, 32)
    for b in range(2):
        assert len(set(np.asarray(idx[b]).tolist())) == 32


def test_slice_by_ray_idx():
    var = jnp.arange(2 * 10 * 3).reshape(2, 10, 3).astype(jnp.float32)
    idx = jnp.asarray([[1, 3], [0, 9]])
    out = sampling.slice_by_ray_idx(var, idx)
    np.testing.assert_allclose(out[0, 0], var[0, 1])
    np.testing.assert_allclose(out[1, 1], var[1, 9])


# ---------------------------- geometry ----------------------------


def test_intersect_sphere():
    center = jnp.asarray([[0.0, 0.0, -2.0]])
    ray = jnp.asarray([[0.0, 0.0, 1.0]])
    near, far = geometry.intersect_with_sphere(center, ray, radius=1.0)
    np.testing.assert_allclose(near, 1.0, atol=1e-5)
    np.testing.assert_allclose(far, 3.0, atol=1e-5)


def test_dist_bounds_sphere_outside():
    center = jnp.asarray([[0.0, 5.0, -2.0]])  # misses unit sphere
    ray = jnp.asarray([[0.0, 0.0, 1.0]])
    near, far, outside = geometry.dist_bounds_sphere(center, ray)
    assert bool(outside[0, 0])
    np.testing.assert_allclose(near, 1.0)
    np.testing.assert_allclose(far, 1.2)


def test_intersect_aabb():
    aabb = jnp.asarray([-1.0, -1, -1, 1, 1, 1])
    origins = jnp.asarray([[0.0, 0, -3], [0, 3, -3]])
    dirs = jnp.asarray([[0.0, 0, 1], [0, 0, 1]])
    t_min, t_max, outside = geometry.intersect_aabb(origins, dirs, aabb)
    np.testing.assert_allclose(t_min[0], 2.0, atol=1e-5)
    np.testing.assert_allclose(t_max[0], 4.0, atol=1e-5)
    assert not bool(outside[0, 0]) and bool(outside[1, 0])


def test_sphere_tracing_plane():
    # SDF of plane z=0.5: f(p) = 0.5 - p_z for rays marching +z.
    def sdf_fn(pts):
        return (0.5 - pts[..., 2:3])

    center = jnp.zeros((4, 3))
    ray = jnp.asarray([[0.0, 0, 1]] * 4)
    near = jnp.zeros((4, 1))
    far = jnp.ones((4, 1)) * 2
    dist, pts, mask = geometry.sphere_tracing_intersection(sdf_fn, center, ray, near, far)
    np.testing.assert_allclose(dist, 0.5, atol=1e-4)
    np.testing.assert_allclose(pts[:, 2], 0.5, atol=1e-4)
    assert np.all(np.asarray(mask))


def test_sphere_tracing_miss():
    def sdf_fn(pts):
        return jnp.ones_like(pts[..., :1])  # always far from surface

    center = jnp.zeros((2, 3))
    ray = jnp.asarray([[0.0, 0, 1]] * 2)
    near = jnp.zeros((2, 1))
    far = jnp.ones((2, 1)) * 3
    dist, pts, mask = geometry.sphere_tracing_intersection(sdf_fn, center, ray, near, far)
    assert not np.any(np.asarray(mask))  # marched past far -> miss


# ---------------------------- encodings ----------------------------


def test_positional_encoding_values():
    x = jnp.asarray([[0.5]])
    enc = encoding.positional_encoding(x, 2)
    # freqs pi, 2pi: sin(pi/2)=1, sin(pi)=0, cos(pi/2)=0, cos(pi)=-1
    np.testing.assert_allclose(enc[0], [1.0, 0.0, 0.0, -1.0], atol=1e-6)


def test_sh_orthonormality():
    # Monte-Carlo check: int Y_i Y_j over sphere ~ delta_ij / (4pi norm).
    rng = np.random.default_rng(0)
    v = rng.standard_normal((200000, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    Y = np.asarray(encoding.spherical_harmonics(jnp.asarray(v, jnp.float32), 2))
    gram = (Y.T @ Y) / len(v) * 4 * np.pi
    np.testing.assert_allclose(gram, np.eye(9), atol=0.05)


# ---------------------------- losses ----------------------------


def test_eikonal_zero_for_unit_gradients():
    g = jnp.asarray([[[[1.0, 0, 0], [0, 1, 0]]]])
    assert float(losses.eikonal_loss(g)) < 1e-10


def test_eikonal_outside_mask():
    g = jnp.ones((1, 2, 3, 3)) * 2  # ||g|| = 2*sqrt(3)
    outside = jnp.asarray([[[True], [True]]])
    assert float(losses.eikonal_loss(g, outside)) == 0.0


def test_psnr():
    pred = jnp.full((4, 3), 0.5)
    target = jnp.full((4, 3), 0.6)
    expect = -10 * np.log10(0.01)
    np.testing.assert_allclose(float(losses.psnr(pred, target)), expect, atol=1e-3)


def test_regularize_re_loss():
    re = jnp.asarray([-1.0, 0.5])
    # negative part: mean(|-1|, 0) = 0.5 -> *10 = 5; positive: mean(0, .5)=0.25
    np.testing.assert_allclose(float(losses.regularize_re_loss(re)), 5.25, atol=1e-6)
