"""Cross-light pseudo-label generation pipeline.

Counterpart of ``projects/NeuralLumen/scripts/pseudo_label.py``: from the
per-(camera, light) renders of ``test_all_light`` (rgb, normal, visibility,
normal.light), produce per-camera pseudo reflectance and per-light pseudo
shading + visibility-certainty maps for stage-b supervision.

Pipeline (host orchestration, device math):
  1. erode visibility -> pseudo shading = normal.light * eroded visibility;
     multi-scale edge weights -> visibility certainty;
  2. k-means over per-pixel cross-light colors in opponent chroma space
     (jitted batched Lloyd's, ops/kmeans) -> majority-cluster mask;
     ref = img / shading^(1/gamma), averaged over confident, majority-cluster
     lights -> average reflectance;
  3. hole fill by nearest neighbor in (position, normal, color) feature space
     (single masked matmul NN, ops/knn) instead of a scipy KD-tree.
"""

from __future__ import annotations

import math
import os
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from mlinerf_tpu.ops import kmeans as kmeans_ops
from mlinerf_tpu.ops import knn as knn_ops
from mlinerf_tpu.ops import morphology as morph
from mlinerf_tpu.pipelines.label_store import load_results_all, save_results_all
from mlinerf_tpu.utils.image_io import save_image

PARAMS = {
    "unpair": dict(kernel_erosion_visibility=7, edge_step_visibility_certainty=7,
                   kmeans_num_clusters=2, shading_threshold=0.0, shading_threshold_wrt_max=0.6,
                   gamma_correlation_factor=2.2, fill_search_points=10),
    "pair": dict(kernel_erosion_visibility=7, edge_step_visibility_certainty=7,
                 kmeans_num_clusters=3, shading_threshold=0.0, shading_threshold_wrt_max=0.6,
                 gamma_correlation_factor=2.2, fill_search_points=1000),
    "single_light": dict(kernel_erosion_visibility=3, edge_step_visibility_certainty=7,
                         kmeans_num_clusters=1, shading_threshold=0.0, shading_threshold_wrt_max=0.6,
                         gamma_correlation_factor=2.2, fill_search_points=1000),
}


def rgb2opp(imgs):
    """RGB -> opponent chroma (o1, o2): brightness-invariant color features."""
    r, g, b = imgs[..., 0], imgs[..., 1], imgs[..., 2]
    o1 = (r - g) / math.sqrt(2)
    o2 = (r + g - 2.0 * b) / math.sqrt(6)
    return jnp.stack([o1, o2], axis=-1)


def find_best_ref(mask_shading, kmeans_label, num_clusters, pseudo_shadings,
                  shading_threshold_wrt_max, ref):
    """Average reflectance over lights in the per-pixel majority cluster with
    sufficiently bright shading (reference: pseudo_label.py:57-83).

    Shapes: mask_shading/pseudo_shadings [L,H,W], kmeans_label [L,H,W] int,
    ref [L,H,W,3]. Returns [H,W,3].
    """
    L = kmeans_label.shape[0]
    label = jnp.where(mask_shading, kmeans_label, num_clusters)  # invalid -> extra bin
    counts = jnp.stack([(label == i).sum(axis=0) for i in range(num_clusters)])  # [K,H,W]
    max_count = jnp.max(counts, axis=0)  # [H,W]
    is_majority_cluster = counts == max_count[None]  # [K,H,W]
    # gather per light: light l belongs to majority set if its label's count == max
    padded = jnp.concatenate(
        [is_majority_cluster, jnp.zeros_like(is_majority_cluster[:1])], axis=0
    )  # [K+1,H,W]; the extra bin marks invalid-shading pixels
    gathered = jnp.take_along_axis(padded, label.astype(jnp.int32), axis=0)  # [L,H,W]
    shading_max = jnp.max(pseudo_shadings * gathered.astype(pseudo_shadings.dtype), axis=0)
    mask_high = pseudo_shadings > shading_threshold_wrt_max * shading_max[None]
    final_mask = jnp.logical_and(gathered, mask_high)  # [L,H,W]
    masked_ref = jnp.where(final_mask[..., None], ref, 0.0)
    summed = jnp.sum(masked_ref, axis=0)
    n = jnp.clip(jnp.sum(final_mask, axis=0), 1, None)[..., None]
    return summed / n


def fill_holes_nn(ref, normal, color_feature, mask):
    """Fill invalid reflectance pixels from nearest valid pixels in joint
    (position, normal, color) feature space.

    Args:
        ref: [3,H,W] (or [H,W,3]) reflectance; normal [3,H,W]; color_feature
        [O,F,H,W] per-pixel color-cluster centers; mask [H,W] bool (True =
        valid). Mirrors fill_holes_kd (reference pseudo_label.py:210-282) but
        as one masked nearest-neighbor program; for multiple color options the
        min over options is approximated by matching each option and taking
        the globally nearest.
    Returns filled ref in the input layout.
    """
    chw = ref.shape[0] == 3 and ref.ndim == 3 and ref.shape[-1] != 3
    if chw:
        ref_hwc = jnp.moveaxis(ref, 0, -1)
        normal_hwc = jnp.moveaxis(normal, 0, -1)
    else:
        ref_hwc = ref
        normal_hwc = normal if normal.shape[-1] == 3 else jnp.moveaxis(normal, 0, -1)
    H, W = ref_hwc.shape[:2]
    weight_position, weight_normal, weight_color = 4.0, 1.0, 1.0
    ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    pos = jnp.stack([ys, xs], axis=-1).astype(jnp.float32)
    pos = pos / jnp.max(pos) * weight_position
    n = normal_hwc / (jnp.linalg.norm(normal_hwc, axis=-1, keepdims=True) + 1e-10) * weight_normal
    if color_feature.ndim == 4:  # [O,F,H,W] -> use the first option's centers
        cf = jnp.moveaxis(color_feature, (0, 1), (-2, -1)).reshape(H, W, -1) * weight_color
    else:
        cf = color_feature * weight_color
    feats = jnp.concatenate([pos, n, cf], axis=-1).reshape(H * W, -1)
    vals = ref_hwc.reshape(H * W, -1)
    filled = knn_ops.masked_nearest_fill(vals, feats, mask.reshape(-1))
    filled = filled.reshape(H, W, -1)
    return jnp.moveaxis(filled, -1, 0) if chw else filled


def generate_pseudo_labels(results_all: Dict[str, Any], setting: str = "pair",
                           output_path: str = None, save_pngs: bool = False,
                           params: Dict = None) -> Dict[str, Any]:
    """Run the full pipeline over a ``results_all`` nested dict.

    Input layout per (cam, light): maps [1,H,W,C] float (from test_all_light).
    Returns {cam: {'pseudo_reflectance': [H,W,3],
                   light: {'pseudo_shading_gamma': [H,W,1],
                           'visibility_certainty': [H,W,1]}}}.
    """
    para = dict(PARAMS[setting])
    if params:
        para.update(params)
    out_all: Dict[str, Any] = {}
    for cam in results_all:
        cam_data = results_all[cam]
        out_all[str(cam)] = {}
        data_list = {}
        for light in cam_data:
            d = {k: np.asarray(v)[0] for k, v in cam_data[light].items()}  # [H,W,C]
            vis = jnp.asarray(d["visibility"][..., 0])  # [H,W]
            vis_erosion = morph.erosion(vis, para["kernel_erosion_visibility"])
            pseudo_shading = jnp.asarray(d["normal_x_light"][..., 0]) * vis_erosion
            if setting == "unpair":
                pseudo_shading = pseudo_shading * jnp.asarray(d["inter_mask"][..., 0])
            d["pseudo_shading"] = np.asarray(pseudo_shading)
            data_list[light] = d
            vis_certainty = morph.edge_weight(vis, para["edge_step_visibility_certainty"])
            s_gamma = jnp.power(pseudo_shading, 1.0 / para["gamma_correlation_factor"])
            out_all[str(cam)][str(light)] = {
                "visibility_certainty": np.asarray(vis_certainty)[..., None],
                "pseudo_shading_gamma": np.asarray(s_gamma)[..., None],
            }
            if save_pngs and output_path:
                save_image(os.path.join(output_path, f"{cam}_{light}_visibility_certainty.png"),
                           np.asarray(vis_certainty))
                save_image(os.path.join(output_path, f"{cam}_{light}_pseudo_shading_gamma.png"),
                           np.asarray(s_gamma))

        use_key = "rgb_target" if all("rgb_target" in d for d in data_list.values()) else "rgb_render"
        imgs = jnp.stack([jnp.asarray(data_list[k][use_key]) for k in data_list])  # [L,H,W,3]
        L, H, W = imgs.shape[:3]

        # Step 1: k-means over per-pixel cross-light colors (opponent space).
        opp = rgb2opp(imgs)  # [L,H,W,2]
        vectors = jnp.moveaxis(opp.reshape(L, H * W, 2), 0, 1)  # [P,L,2]
        labels, centers = kmeans_ops.kmeans_per_pixel(vectors, para["kmeans_num_clusters"])
        kmeans_label = jnp.moveaxis(labels, 0, 1).reshape(L, H, W)  # [L,H,W]
        kmeans_center = jnp.moveaxis(centers, 0, -1).reshape(
            para["kmeans_num_clusters"], 2, H, W
        )  # [K,2,H,W]

        # Step 2: reflectance from confident shading.
        pseudo_shadings = jnp.stack([jnp.asarray(data_list[k]["pseudo_shading"]) for k in data_list])
        mask_shading = pseudo_shadings > para["shading_threshold"]
        shadings_gamma = jnp.power(pseudo_shadings, 1.0 / para["gamma_correlation_factor"])
        ref = imgs / jnp.clip(shadings_gamma[..., None], 1e-6, None)
        average_ref = find_best_ref(
            mask_shading, kmeans_label, para["kmeans_num_clusters"], pseudo_shadings,
            para["shading_threshold_wrt_max"], ref,
        )  # [H,W,3]

        # Step 3: hole fill.
        first = next(iter(cam_data))
        normal = jnp.asarray(np.asarray(cam_data[first]["normal"])[0])  # [H,W,3]
        mask_valid = jnp.any(mask_shading, axis=0)  # [H,W]
        if setting != "pair":
            inter = jnp.asarray(np.asarray(cam_data[first]["inter_mask"])[0][..., 0]) > 0
            mask_valid = jnp.logical_or(mask_valid, ~inter)
        filled_ref = fill_holes_nn(average_ref, normal, kmeans_center, mask_valid)
        out_all[str(cam)]["pseudo_reflectance"] = np.asarray(filled_ref)
        if save_pngs and output_path:
            save_image(os.path.join(output_path, f"{cam}_average_ref.png"), np.asarray(average_ref))
            save_image(os.path.join(output_path, f"{cam}_pseudo_reflectance.png"),
                       np.asarray(filled_ref))
    if output_path:
        save_results_all(out_all, os.path.join(output_path, "pseudo_label_all"))
    return out_all


def main():  # pragma: no cover - CLI
    import argparse

    parser = argparse.ArgumentParser(description="pseudo label")
    parser.add_argument("--workdir", required=True)
    parser.add_argument("--setting", choices=["pair", "unpair", "single_light"], required=True)
    parser.add_argument("--save_pngs", action="store_true")
    args = parser.parse_args()
    results_all = load_results_all(os.path.join(args.workdir, "results_all"))
    output_path = args.workdir + "_pseudo_label"
    os.makedirs(output_path, exist_ok=True)
    generate_pseudo_labels(results_all, args.setting, output_path, save_pngs=args.save_pngs)
    print(f"Wrote {output_path}/pseudo_label_all.npz")


if __name__ == "__main__":
    main()
