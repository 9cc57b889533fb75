import numpy as np
import pytest

from mlinerf_tpu.pipelines import metrics as M


def test_psnr_mse():
    a = np.full((16, 16, 3), 0.5)
    b = np.full((16, 16, 3), 0.6)
    assert abs(M.mse(a, b) - 0.01) < 1e-9
    assert abs(M.psnr(a, b) - 20.0) < 1e-6


def test_ssim_identical_is_one():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (32, 32, 3))
    assert abs(M.ssim(img, img) - 1.0) < 1e-9


def test_ssim_decreases_with_noise():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (64, 64))
    small = np.clip(img + rng.normal(0, 0.02, img.shape), 0, 1)
    big = np.clip(img + rng.normal(0, 0.3, img.shape), 0, 1)
    s_small = M.ssim(img, small)
    s_big = M.ssim(img, big)
    assert 0 < s_big < s_small < 1


def test_ssim_luminance_shift_closed_form():
    """For constant images with means ux, uy: SSIM = (2 ux uy + C1)/(ux^2+uy^2+C1)."""
    a = np.full((32, 32), 0.4)
    b = np.full((32, 32), 0.6)
    C1 = 0.01**2
    expect = (2 * 0.4 * 0.6 + C1) / (0.4**2 + 0.6**2 + C1)
    assert abs(M.ssim(a, b) - expect) < 1e-6


def test_lpips_none_without_weights(monkeypatch):
    monkeypatch.setenv("LPIPS_WEIGHTS", "/nonexistent")
    # also ensure the fallback asset path isn't present in CI
    if M.lpips_weights_path() is None:
        assert M.lpips(np.zeros((8, 8, 3)), np.zeros((8, 8, 3))) is None


def test_calculate_metrics_alpha_gamma():
    pred = np.full((16, 16, 3), 0.25)
    gt = np.full((16, 16, 3), 0.25)
    alpha = np.zeros((16, 16, 1))  # fully transparent -> both become white
    m = M.calculate_metrics(pred * 0 + 0.9, gt, alpha=alpha)
    assert m["mse"] < 1e-12
    m2 = M.calculate_metrics(pred, gt, gamma=2.2)
    assert m2["mse"] < 1e-12 and m2["ssim"] > 0.999
