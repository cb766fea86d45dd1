"""Debug visualization: projected 3D boxes and depth heatmaps.

Behavioral reference: `lib/vis_utils/image.py` (grid_show, heatmap) and
`lib/pysixd/misc.py` (draw_projected_box3d) as used by the TRAIN.VIS /
TEST.VIS debug paths (`engine.py:370-422`, `catre_evaluator.py:652-673`).
Matplotlib-free except grid_show; cv2 drawing."""

from __future__ import annotations

import numpy as np

from ..eval.nocs_eval import get_3d_bbox
from ..geom.transforms import project_pts

# the 8 corners from get_3d_bbox, edges of the box
_EDGES = [
    (0, 1), (0, 2), (1, 3), (2, 3),  # +y face
    (4, 5), (4, 6), (5, 7), (6, 7),  # -y face
    (0, 4), (1, 5), (2, 6), (3, 7),  # verticals
]


def draw_projected_box3d(image: np.ndarray, scale: np.ndarray, pose: np.ndarray,
                         K: np.ndarray, color=(0, 255, 0), thickness: int = 2) -> np.ndarray:
    """Draw the scale-sized 3D box under pose onto the image (BGR uint8)."""
    import cv2

    import jax.numpy as jnp

    corners = get_3d_bbox(scale).T  # (8, 3)
    uv = np.asarray(project_pts(jnp.asarray(corners.astype(np.float32)),
                                jnp.asarray(K.astype(np.float32)),
                                jnp.asarray(pose[:, :3].astype(np.float32)),
                                jnp.asarray(pose[:, 3].astype(np.float32))))
    img = image.copy()
    pts = uv.round().astype(int)
    for a, b in _EDGES:
        cv2.line(img, tuple(pts[a]), tuple(pts[b]), color, thickness)
    return img


def draw_projected_kps(image: np.ndarray, kps: np.ndarray, scale: np.ndarray,
                       pose: np.ndarray, K: np.ndarray, color=(0, 0, 255),
                       radius: int = 0, thickness: int = 2) -> np.ndarray:
    """Draw normalized keypoints (kps * scale, transformed by pose) as dots.

    Train-time vis analogue of ref `engine.py:388-422` (cv2.circle over
    misc.project_pts of kpts_3d * scale).
    """
    import cv2

    import jax.numpy as jnp

    pts = kps.astype(np.float32) * scale.astype(np.float32)[None]
    uv = np.asarray(project_pts(jnp.asarray(pts),
                                jnp.asarray(K.astype(np.float32)),
                                jnp.asarray(pose[:, :3].astype(np.float32)),
                                jnp.asarray(pose[:, 3].astype(np.float32))))
    img = np.ascontiguousarray(image)
    h, w = img.shape[:2]
    for u, v in uv.round().astype(int):
        if 0 <= u < w and 0 <= v < h:
            cv2.circle(img, (int(u), int(v)), radius, color, thickness)
    return img


def heatmap(data: np.ndarray, to_rgb: bool = False) -> np.ndarray:
    """Normalize a scalar map to a JET colormap image."""
    import cv2

    d = np.asarray(data, dtype=np.float32)
    d = d - d.min()
    if d.max() > 0:
        d = d / d.max()
    img = cv2.applyColorMap((d * 255).astype(np.uint8), cv2.COLORMAP_JET)
    return img[:, :, ::-1] if to_rgb else img


def grid_show(images, titles=None, row: int = 1, col: int = 1, save_path: str | None = None):
    """Matplotlib grid of images; saves when save_path is given (headless)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(row, col, figsize=(4 * col, 4 * row), squeeze=False)
    for i, ax in enumerate(axes.ravel()):
        if i < len(images):
            im = images[i]
            ax.imshow(im if im.ndim == 3 else im, cmap=None if im.ndim == 3 else "viridis")
            if titles and i < len(titles):
                ax.set_title(titles[i])
        ax.axis("off")
    if save_path:
        fig.savefig(save_path, bbox_inches="tight")
    plt.close(fig)
    return save_path
