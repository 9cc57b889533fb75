"""Indirect-light hemisphere probe renders.

Counterpart of the reference's ``render_image_light`` indirect-light
visualization (projects/neuralangelo/model.py:154-296): for a sparse grid of
surface points, shoot a Fibonacci hemisphere of secondary rays oriented by
the surface normal, render their radiance, mask rays leaving the camera
frustum, and unwrap each hemisphere onto a square tile — producing the
"what does this point see" mosaic used to study indirect illumination.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mlinerf_tpu.utils import camera, hemisphere


def indirect_light_probe(trainer, data: Dict[str, np.ndarray], image_size,
                         probe_resolution: int = 300, grid_fraction: float = 0.3,
                         num_rays_chunk: Optional[int] = None) -> Dict[str, np.ndarray]:
    """Render the indirect-light mosaic for one view.

    Args:
        trainer: a (lumen/neuralangelo) trainer with a loaded checkpoint.
        data: dict with pose [1,3,4], intr [1,3,3] (+pose_light for lumen).
        probe_resolution: hemisphere ray count = probe_resolution^2.
        grid_fraction: spacing of probed pixels (0.3 -> every ~30% of probe
            res, reference skip_distance semantics, model.py:238-241).
    Returns:
        dict with 'indirect_rgb' [Gh*S, Gw*S, 3] mosaic and the probe grid
        indices.
    """
    H, W = image_size
    N = probe_resolution**2
    # 1. Primary render to find surface points + normals.
    maps = trainer.inference_outputs(data, image_size)
    raw = trainer.render_image(data, image_size)
    # surface points via blended depth along primary rays
    pose = jnp.asarray(data["pose"])
    intr = jnp.asarray(data["intr"])
    center, ray = camera.get_center_and_ray(pose, intr, (H, W))
    ray_unit = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
    depth = jnp.asarray(raw["depth"])  # [1,HW,1]
    dist = depth * jnp.linalg.norm(ray, axis=-1, keepdims=True)
    inter_pts = np.asarray(center + ray_unit * dist).reshape(H, W, 3)
    normals = -np.asarray(raw["gradient"]).reshape(H, W, 3)

    # 2. Probe grid (sparse pixels).
    skip = max(int(probe_resolution * grid_fraction), 1)
    ii = list(range(skip // 2, H, skip))
    jj = list(range(skip // 2, W, skip))
    sel_pts = inter_pts[np.ix_(ii, jj)]  # [Gh,Gw,3]
    sel_nrm = -normals[np.ix_(ii, jj)]   # outward normals

    # 3. Hemisphere rays rotated onto each normal.
    sphere = hemisphere.hemisphere_spiral(N)  # [N,3]
    R = np.asarray(hemisphere.rotation_from_z(jnp.asarray(sel_nrm)))  # [Gh,Gw,3,3]
    dirs = np.einsum("ghij,nj->ghni", R, sphere)  # [Gh,Gw,N,3]
    origins = np.broadcast_to(sel_pts[:, :, None, :], dirs.shape)
    Gh, Gw = dirs.shape[:2]
    dirs_flat = dirs.reshape(1, -1, 3)
    dirs_flat = dirs_flat / np.linalg.norm(dirs_flat, axis=-1, keepdims=True)
    origins_flat = origins.reshape(1, -1, 3)

    # 4. Render secondary rays through the standard chunked renderer.
    sec_data = dict(pose=np.asarray(data["pose"]), intr=np.asarray(data["intr"]))
    chunk = int(num_rays_chunk or trainer.num_val_rays())
    params = trainer.eval_params()
    cond = trainer.make_cond(jnp.asarray(trainer.current_iteration, jnp.int32))
    rng = jax.random.PRNGKey(0)
    rgbs, depths = [], []
    pts_light = None
    if "pose_light" in data and trainer._needs_light():
        lc = camera.get_camera_center(jnp.asarray(data["pose_light"]), num_pixels=1)
        pts_light = jnp.broadcast_to(lc, dirs_flat.shape)
    total = dirs_flat.shape[1]
    for c0 in range(0, total, chunk):
        c1 = min(c0 + chunk, total)
        pad = chunk - (c1 - c0)
        sl = lambda x: np.pad(x[:, c0:c1], ((0, 0), (0, pad), (0, 0))) if pad else x[:, c0:c1]
        kwargs = {}
        if pts_light is not None:
            kwargs["pts_light"] = jnp.asarray(sl(np.asarray(pts_light)))
        out = trainer.model.apply(
            {"params": params}, jnp.asarray(sl(origins_flat)), jnp.asarray(sl(dirs_flat)),
            cond, rng=rng, method=trainer.model.render_chunk, **kwargs,
        )
        rgbs.append(np.asarray(jax.device_get(out["rgb"]))[:, : c1 - c0])
        depths.append(np.asarray(jax.device_get(out["depth"]))[:, : c1 - c0])
    rgb = np.concatenate(rgbs, axis=1)  # [1, Gh*Gw*N, 3]
    depth_sec = np.concatenate(depths, axis=1)

    # 5. Mask rays whose hit points leave the camera frustum (reference
    # model.py:279-283).
    hit_pts = origins_flat + dirs_flat * depth_sec
    in_view = np.asarray(camera.inside_camera_view(
        intr, pose, (H, W), jnp.asarray(hit_pts)))
    rgb[~in_view] = 0.0

    # 6. Unwrap each hemisphere onto a square tile and mosaic.
    index, mask, (S, _) = hemisphere.square_interpolation(N)
    rgb = rgb.reshape(Gh, Gw, N, 3)
    tiles = rgb[:, :, index, :]  # [Gh,Gw,S*S,3]
    tiles[:, :, ~mask, :] = 1.0
    tiles = tiles.reshape(Gh, Gw, S, S, 3)
    mosaic = tiles.transpose(0, 2, 1, 3, 4).reshape(Gh * S, Gw * S, 3)
    return dict(indirect_rgb=mosaic, grid_rows=ii, grid_cols=jj,
                rgb_map=maps.get("rgb_map"))
