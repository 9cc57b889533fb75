"""Quality metrics harness: PSNR / SSIM / LPIPS / MSE.

Counterpart of ``projects/NeuralLumen/scripts/compute_metrics.py``:
alpha-compositing over white before comparison, gamma (1/2.2) on shading
channels, per-component (RGB / Reflectance / Shading) evaluation.

Implementations are dependency-free:
  * SSIM matches skimage's ``structural_similarity`` defaults (uniform 7x7
    window, data_range=1.0, channel-averaged) — the exact configuration the
    reference uses (compute_metrics.py:65-70);
  * LPIPS is the standard AlexNet-backbone metric implemented in JAX; the
    pretrained weights must be supplied as an ``.npz`` (no network access on
    TPU pods) — when absent, LPIPS is reported as None and skipped.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np


def mse(pred: np.ndarray, gt: np.ndarray) -> float:
    return float(np.mean((pred.astype(np.float64) - gt.astype(np.float64)) ** 2))


def psnr(pred: np.ndarray, gt: np.ndarray, data_range: float = 1.0) -> float:
    m = mse(pred, gt)
    return float(10 * np.log10(data_range**2 / max(m, 1e-12)))


def _uniform_filter(img: np.ndarray, size: int) -> np.ndarray:
    """Separable uniform filter with 'reflect' boundary (scipy semantics)."""
    from scipy.ndimage import uniform_filter

    return uniform_filter(img, size=size, mode="reflect")


def ssim(pred: np.ndarray, gt: np.ndarray, data_range: float = 1.0, win_size: int = 7) -> float:
    """Mean SSIM over a [H,W] or [H,W,C] pair, skimage-compatible.

    Uses the uniform filter, sample covariance normalization (N-1), and crops
    the window radius from the borders before averaging — identical to
    ``skimage.metrics.structural_similarity(..., channel_axis=-1)``.
    """
    pred = np.asarray(pred, np.float64)
    gt = np.asarray(gt, np.float64)
    if pred.ndim == 3:
        vals = [ssim(pred[..., c], gt[..., c], data_range, win_size) for c in range(pred.shape[-1])]
        return float(np.mean(vals))
    K1, K2 = 0.01, 0.03
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    NP = win_size**2
    cov_norm = NP / (NP - 1)
    ux = _uniform_filter(pred, win_size)
    uy = _uniform_filter(gt, win_size)
    uxx = _uniform_filter(pred * pred, win_size)
    uyy = _uniform_filter(gt * gt, win_size)
    uxy = _uniform_filter(pred * gt, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    A1 = 2 * ux * uy + C1
    A2 = 2 * vxy + C2
    B1 = ux**2 + uy**2 + C1
    B2 = vx + vy + C2
    S = (A1 * A2) / (B1 * B2)
    pad = (win_size - 1) // 2
    return float(S[pad:-pad, pad:-pad].mean())


# ---------------------------------------------------------------------------
# LPIPS (AlexNet backbone, weights from npz)
# ---------------------------------------------------------------------------

_LPIPS_CACHE = {}

# AlexNet feature extractor config: (out_ch, kernel, stride, pad)
_ALEX_LAYERS = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_ALEX_TAPS = [0, 1, 2, 3, 4]  # relu outputs after each conv
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def lpips_weights_path() -> Optional[str]:
    for cand in (
        os.environ.get("LPIPS_WEIGHTS", ""),
        os.path.join(os.path.dirname(__file__), "..", "..", "assets", "lpips_alex.npz"),
    ):
        if cand and os.path.exists(cand):
            return cand
    return None


_LPIPS_WARNED = False


def _warn_lpips_missing() -> None:
    """One unmissable per-process warning when LPIPS is requested but the
    AlexNet weights are absent (the reference ALWAYS scores LPIPS —
    compute_metrics.py:15). A silent per-image None made a metrics run look
    complete when it wasn't (round-2 verdict item)."""
    global _LPIPS_WARNED
    if _LPIPS_WARNED:
        return
    _LPIPS_WARNED = True
    import sys

    sys.stderr.write(
        "\n[metrics] WARNING: LPIPS weights not found — LPIPS will be MISSING "
        "from this run's results.\n"
        "[metrics]   Export them on any torch+lpips host with\n"
        "[metrics]     python scripts/export_lpips_weights.py --out assets/lpips_alex.npz\n"
        "[metrics]   then copy assets/lpips_alex.npz here (or set LPIPS_WEIGHTS=/path/to.npz).\n"
        "[metrics]   (This host has torch but not torchvision/lpips and no network, so the\n"
        "[metrics]   export cannot run locally.)\n\n"
    )


def lpips(pred: np.ndarray, gt: np.ndarray) -> Optional[float]:
    """LPIPS(AlexNet) on [H,W,3] images in [0,1]; None if weights missing.

    The reference evaluates ``lpips.LPIPS(net='alex')`` with normalize=True
    (compute_metrics.py:15,80-84); this is the same computation given the
    official weights exported to npz (script: scripts/export_lpips_weights.py).
    """
    path = lpips_weights_path()
    if path is None:
        _warn_lpips_missing()
        return None
    import jax
    import jax.numpy as jnp

    if "fn" not in _LPIPS_CACHE:
        data = np.load(path)
        weights = {k: jnp.asarray(data[k]) for k in data.files}

        def forward(img):
            # img [H,W,3] in [0,1] -> normalized, NCHW-free JAX conv stack
            x = (img * 2.0 - 1.0 - _SHIFT) / _SCALE
            x = x[None]  # [1,H,W,3]
            feats = []
            for li, (out_ch, k, s, p) in enumerate(_ALEX_LAYERS):
                w = weights[f"conv{li}_w"]  # [k,k,in,out]
                b = weights[f"conv{li}_b"]
                x = jax.lax.conv_general_dilated(
                    x, w, window_strides=(s, s), padding=[(p, p), (p, p)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                x = x + b
                x = jax.nn.relu(x)
                feats.append(x)
                if li in (0, 1):
                    x = jax.lax.reduce_window(
                        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
                    )
            return feats

        def metric(im0, im1):
            f0, f1 = forward(im0), forward(im1)
            total = 0.0
            for li in _ALEX_TAPS:
                a = f0[li] / (jnp.linalg.norm(f0[li], axis=-1, keepdims=True) + 1e-10)
                b = f1[li] / (jnp.linalg.norm(f1[li], axis=-1, keepdims=True) + 1e-10)
                diff = (a - b) ** 2
                lin = weights[f"lin{li}_w"]  # [1,1,C,1]
                val = jax.lax.conv_general_dilated(
                    diff, lin, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
                )
                total = total + jnp.mean(val)
            return total

        _LPIPS_CACHE["fn"] = jax.jit(metric)
    return float(_LPIPS_CACHE["fn"](np.asarray(pred, np.float32), np.asarray(gt, np.float32)))


# ---------------------------------------------------------------------------
# Harness
# ---------------------------------------------------------------------------


def composite_white(img: np.ndarray, alpha: Optional[np.ndarray]) -> np.ndarray:
    if alpha is None:
        return img
    return img * alpha + (1.0 - alpha)


def calculate_metrics(pred: np.ndarray, gt: np.ndarray, alpha: Optional[np.ndarray] = None,
                      gamma: Optional[float] = None) -> Dict[str, Optional[float]]:
    """All four metrics on a single [H,W,3] pair.

    ``alpha``: optional [H,W,1] matte — both images composite over white.
    ``gamma``: apply x^(1/gamma) to BOTH (used for shading comparisons).
    """
    pred = np.clip(np.asarray(pred, np.float32), 0, 1)
    gt = np.clip(np.asarray(gt, np.float32), 0, 1)
    pred = composite_white(pred, alpha)
    gt = composite_white(gt, alpha)
    if gamma:
        pred = pred ** (1.0 / gamma)
        gt = gt ** (1.0 / gamma)
    return dict(
        psnr=psnr(pred, gt),
        ssim=ssim(pred, gt),
        lpips=lpips(pred, gt),
        mse=mse(pred, gt),
    )


def evaluate_outputs(output_dir: str, dataset, image_size, components=("rgb",),
                     gamma_shading: float = 2.2) -> Dict[str, Dict[str, float]]:
    """Compare dumped ``{idx}_{key}_map.png`` renders against dataset GT.

    components: subset of ('rgb', 'ref', 'sha') — 'ref'/'sha' require the
    dataset to expose GT intrinsics (load_iid).
    """
    from mlinerf_tpu.utils.image_io import load_image

    comp_key = {"rgb": ("rgb_map", "image", None),
                "ref": ("o_r_map", "Ref", None),
                "sha": ("o_s_map", "Sha", gamma_shading)}
    agg: Dict[str, Dict[str, list]] = {c: {} for c in components}
    for i in range(len(dataset)):
        sample = dataset.get_full_sample(i)
        idx = sample.get("idx", i)
        for comp in components:
            pred_key, gt_key, gamma = comp_key[comp]
            path = os.path.join(output_dir, f"{idx}_{pred_key}.png")
            if not os.path.exists(path) or gt_key not in sample:
                continue
            pred = load_image(path)[..., :3]
            gt = np.asarray(sample[gt_key])[..., :3]
            m = calculate_metrics(pred, gt, gamma=gamma)
            for k, v in m.items():
                if v is not None:
                    agg[comp].setdefault(k, []).append(v)
    out = {c: {k: float(np.mean(v)) for k, v in agg[c].items()} for c in components}
    return out


# ---------------------------------------------------------------------------
# Output-layout adapters: map (method, component, index) -> filename. Used to
# score this framework's dumps AND other methods' published outputs against
# the same GT (reference compute_metrics.py:115-192).
# ---------------------------------------------------------------------------

METHOD_LAYOUTS = {
    # ours: {idx}_{o_r|o_s|rgb}_map.png (test.py image mode)
    "ours": lambda path, comp, i: os.path.join(
        path, f"{i}_{ {'Ref': 'o_r', 'Sha': 'o_s', 'Img': 'rgb'}[comp] }_map.png"
    ),
    "IntrinsicNeRF": lambda path, comp, i: os.path.join(
        path, f"{ {'Ref': 'a', 'Sha': 's', 'Img': ''}[comp] }{i:03d}.png"
    ),
    "NRHints": lambda path, comp, i: os.path.join(path, f"rgb_{i:03d}.png"),
    "PIE-Net": lambda path, comp, i: os.path.join(
        path, f"{i:03d}_{ {'Ref': 'ref', 'Sha': 'sha'}[comp] }.png"
    ),
    "InvRender": lambda path, comp, i: os.path.join(
        path, f"{ {'Ref': 'albedo', 'Img': 'sg_rgb_bg'}[comp] }_{i}.png"
    ),
    "TensoIR": lambda path, comp, i: os.path.join(
        path,
        (f"imgs_test_all/brdf/{i:03d}_albedo.png" if comp == "Ref"
         else f"imgs_test_all/nvs_with_radiance_field/{i:03d}_rgb_prediction.png"),
    ),
}


def evaluate_method_outputs(pred_dir: str, gt_dir: str, method: str = "ours",
                            components=("Img",), num_images: int = 100,
                            gamma_shading: float = 2.2):
    """Score a method's dumped images against GT dumps.

    GT layout: ``{i:03d}_{Img|Ref|Sha}.png`` with the Img alpha channel used
    as the compositing matte (the reference's syn_intrinsic layout).
    """
    from mlinerf_tpu.utils.image_io import load_image

    layout = METHOD_LAYOUTS[method]
    agg: Dict[str, Dict[str, list]] = {c: {} for c in components}
    for i in range(num_images):
        gt_img_path = os.path.join(gt_dir, f"{i:03d}_Img.png")
        if not os.path.exists(gt_img_path):
            continue
        gt_rgba = load_image(gt_img_path)
        alpha = gt_rgba[..., 3:4] if gt_rgba.shape[-1] == 4 else None
        for comp in components:
            pred_path = layout(pred_dir, comp, i)
            gt_path = os.path.join(gt_dir, f"{i:03d}_{comp}.png")
            if not (os.path.exists(pred_path) and os.path.exists(gt_path)):
                continue
            pred = load_image(pred_path)[..., :3]
            gt = load_image(gt_path)[..., :3]
            gamma = gamma_shading if comp == "Sha" else None
            m = calculate_metrics(pred, gt, alpha=alpha, gamma=gamma)
            for k, v in m.items():
                if v is not None:
                    agg[comp].setdefault(k, []).append(v)
    return {c: {k: float(np.mean(v)) for k, v in agg[c].items()} for c in components}


def main():  # pragma: no cover - CLI
    import argparse

    parser = argparse.ArgumentParser(description="compute metrics")
    parser.add_argument("--config", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--components", default="rgb")
    parser.add_argument(
        "--allow_missing_lpips", action="store_true",
        help="proceed without LPIPS when assets/lpips_alex.npz is absent "
             "(default: error — the reference always scores LPIPS, "
             "compute_metrics.py:15)")
    args, cfg_cmd = parser.parse_known_args()
    if lpips_weights_path() is None and not args.allow_missing_lpips:
        raise SystemExit(
            "[metrics] ERROR: LPIPS weights not found (assets/lpips_alex.npz "
            "or $LPIPS_WEIGHTS). The reference's metrics always include "
            "LPIPS-AlexNet; refusing to emit a silently incomplete table.\n"
            "  Export once on any torch+lpips host:\n"
            "    python scripts/export_lpips_weights.py --out assets/lpips_alex.npz\n"
            "  or pass --allow_missing_lpips to score PSNR/SSIM/MSE only."
        )
    from mlinerf_tpu.config import Config, resolve

    cfg = Config(args.config, cli_args=cfg_cmd)
    for split in ("train", "val"):
        if "load_iid" in cfg.data.get(split, {}):
            cfg.data[split].load_iid = True
    Dataset = resolve("dataset", cfg.data.type)
    ds = Dataset(cfg, is_inference=True)
    results = evaluate_outputs(args.output_dir, ds, cfg.data.val.image_size,
                               components=args.components.split(","))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
