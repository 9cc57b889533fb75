"""Camera/light pose visualization (matplotlib; plotly optional).

Counterpart of ``projects/nerf/utils/visualize.py`` (k3d/plotly camera
frustum plots) — renders camera frusta and light positions for dataset
sanity checks without notebook-only dependencies.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def get_camera_mesh(pose: np.ndarray, depth: float = 0.2) -> np.ndarray:
    """Five world-space points forming a camera frustum wireframe.

    pose: [3,4] world->camera. Returns [5,3]: center + 4 image-plane corners.
    """
    corners = np.asarray(
        [[-0.5, -0.5, 1], [0.5, -0.5, 1], [0.5, 0.5, 1], [-0.5, 0.5, 1]], np.float32
    ) * depth
    R, t = pose[:3, :3], pose[:3, 3]
    center = -R.T @ t
    pts = (R.T @ corners.T).T + center
    return np.concatenate([center[None], pts], axis=0)


def plot_poses(poses: Sequence[np.ndarray], lights: Optional[Sequence[np.ndarray]] = None,
               path: Optional[str] = None, depth: float = 0.2):
    """Save (or show) a 3D plot of camera frusta and light centers."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(projection="3d")
    for pose in poses:
        m = get_camera_mesh(np.asarray(pose), depth)
        c = m[0]
        for corner in m[1:]:
            ax.plot(*zip(c, corner), color="tab:blue", linewidth=0.5)
        loop = np.concatenate([m[1:], m[1:2]], axis=0)
        ax.plot(loop[:, 0], loop[:, 1], loop[:, 2], color="tab:blue", linewidth=0.5)
    if lights is not None:
        centers = []
        for lp in lights:
            lp = np.asarray(lp)
            R, t = lp[:3, :3], lp[:3, 3]
            centers.append(-R.T @ t)
        centers = np.stack(centers)
        ax.scatter(centers[:, 0], centers[:, 1], centers[:, 2], color="tab:orange", s=20,
                   label="lights")
        ax.legend()
    ax.set_xlabel("x"), ax.set_ylabel("y"), ax.set_zlabel("z")
    if path:
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return path
    return fig
