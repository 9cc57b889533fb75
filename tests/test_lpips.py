"""LPIPS(AlexNet) JAX implementation cross-checked against torch.

Real AlexNet weights cannot be downloaded in this environment, so the
implementation is proven on FIXTURE weights with the exact production
layout: the same npz drives the JAX metric (pipelines/metrics.lpips) and a
line-by-line torch reimplementation of the official LPIPS computation
(richzhang/PerceptualSimilarity lpips_2dirs, net='alex', normalize=True —
the reference's metric, projects/NeuralLumen/scripts/compute_metrics.py:15).
Agreement here means the npz produced by scripts/export_lpips_weights.py
from the official files reproduces the reference metric.
"""

import os

import numpy as np
import pytest

from mlinerf_tpu.pipelines import metrics

_ALEX_CH = [(3, 64, 11, 4, 2), (64, 192, 5, 1, 2), (192, 384, 3, 1, 1),
            (384, 256, 3, 1, 1), (256, 256, 3, 1, 1)]


def _fixture_npz(path: str, seed: int = 0):
    rng = np.random.RandomState(seed)
    out = {}
    for i, (cin, cout, k, _s, _p) in enumerate(_ALEX_CH):
        # Kaiming-ish scale keeps activations in a sane range through the
        # stack so the test is numerically meaningful.
        out[f"conv{i}_w"] = rng.randn(k, k, cin, cout).astype(np.float32) * (
            2.0 / (k * k * cin)) ** 0.5
        out[f"conv{i}_b"] = (rng.randn(1, 1, 1, cout) * 0.1).astype(np.float32)
        out[f"lin{i}_w"] = rng.rand(1, 1, cout, 1).astype(np.float32)
    np.savez(path, **out)
    return out


def _torch_lpips(w, im0, im1):
    """The official LPIPS forward, reimplemented on the npz layout."""
    import torch
    import torch.nn.functional as F

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(img):
        x = torch.from_numpy(np.asarray(img, np.float32)).permute(2, 0, 1)[None]
        x = (x * 2.0 - 1.0 - shift) / scale
        taps = []
        for i, (_cin, _cout, _k, s, p) in enumerate(_ALEX_CH):
            wi = torch.from_numpy(np.transpose(w[f"conv{i}_w"], (3, 2, 0, 1)))
            bi = torch.from_numpy(w[f"conv{i}_b"].reshape(-1))
            x = F.conv2d(x, wi, bi, stride=s, padding=p)
            x = F.relu(x)
            taps.append(x)
            if i in (0, 1):
                x = F.max_pool2d(x, kernel_size=3, stride=2)
        return taps

    f0, f1 = feats(im0), feats(im1)
    total = 0.0
    for i in range(5):
        n0 = f0[i] / (f0[i].pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
        n1 = f1[i] / (f1[i].pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
        diff = (n0 - n1) ** 2
        lin = torch.from_numpy(np.transpose(w[f"lin{i}_w"], (3, 2, 0, 1)))
        val = torch.nn.functional.conv2d(diff, lin)
        total = total + val.mean()
    return float(total)


@pytest.fixture()
def fixture_weights(tmp_path, monkeypatch):
    path = str(tmp_path / "lpips_fixture.npz")
    w = _fixture_npz(path)
    monkeypatch.setenv("LPIPS_WEIGHTS", path)
    metrics._LPIPS_CACHE.clear()
    yield w
    metrics._LPIPS_CACHE.clear()


def test_lpips_matches_torch_reference(fixture_weights):
    rng = np.random.RandomState(7)
    im0 = rng.rand(31, 37, 3).astype(np.float32)  # odd sizes: padding paths
    im1 = np.clip(im0 + 0.15 * rng.randn(31, 37, 3).astype(np.float32), 0, 1)
    got = metrics.lpips(im0, im1)
    want = _torch_lpips(fixture_weights, im0, im1)
    assert got is not None
    assert abs(got - want) < 1e-4 * max(1.0, abs(want)), (got, want)


def test_lpips_identity_is_zero(fixture_weights):
    rng = np.random.RandomState(3)
    # >= 64 px: smaller inputs reach an empty tensor after the second pool
    # (AlexNet stride stack), which is also why production use is on full
    # renders, never thumbnails.
    im = rng.rand(64, 64, 3).astype(np.float32)
    assert metrics.lpips(im, im) == pytest.approx(0.0, abs=1e-6)


def test_lpips_missing_weights_warns_not_crashes(tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("LPIPS_WEIGHTS", str(tmp_path / "nope.npz"))
    # Hide the repo-level assets fallback by pointing HOME elsewhere is not
    # needed: lpips_weights_path checks env then assets/; assets is absent
    # in CI checkouts. If assets exist locally, the metric computing is fine
    # too — only assert no exception.
    metrics._LPIPS_CACHE.clear()
    metrics._LPIPS_WARNED = False
    val = metrics.lpips(np.zeros((8, 8, 3)), np.ones((8, 8, 3)))
    if metrics.lpips_weights_path() is None:
        assert val is None
        assert "LPIPS" in capsys.readouterr().err
    metrics._LPIPS_CACHE.clear()


def test_export_from_state_dicts_roundtrip(tmp_path):
    """The torch-only converter maps official state-dict layouts to the npz
    the JAX metric consumes (shape/layout contract)."""
    import torch

    sys_path_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import sys
    sys.path.insert(0, os.path.join(sys_path_root, "scripts"))
    from export_lpips_weights import export_from_state_dicts

    rng = np.random.RandomState(0)
    alex = {}
    for fid, (cin, cout, k, _s, _p) in zip([0, 3, 6, 8, 10], _ALEX_CH):
        alex[f"features.{fid}.weight"] = torch.from_numpy(
            rng.randn(cout, cin, k, k).astype(np.float32))
        alex[f"features.{fid}.bias"] = torch.from_numpy(
            rng.randn(cout).astype(np.float32))
    lins = {f"lin{i}.model.1.weight": torch.from_numpy(
        rng.rand(1, _ALEX_CH[i][1], 1, 1).astype(np.float32)) for i in range(5)}
    ap, lp = str(tmp_path / "alex.pth"), str(tmp_path / "lin.pth")
    torch.save(alex, ap)
    torch.save(lins, lp)
    out = str(tmp_path / "out.npz")
    export_from_state_dicts(ap, lp, out)
    data = np.load(out)
    for i, (cin, cout, k, _s, _p) in enumerate(_ALEX_CH):
        assert data[f"conv{i}_w"].shape == (k, k, cin, cout)
        assert data[f"conv{i}_b"].shape == (1, 1, 1, cout)
        assert data[f"lin{i}_w"].shape == (1, 1, cout, 1)
        # Layout correctness, not just shape: HWIO == transpose of OIHW.
        np.testing.assert_allclose(
            data[f"conv{i}_w"],
            np.transpose(alex[f"features.{[0,3,6,8,10][i]}.weight"].numpy(),
                         (2, 3, 1, 0)))
