"""Offline gt-label generation math: Umeyama similarity alignment (RANSAC)
and PnP pose recovery.

Behavioral reference: `preprocess/pose_data.py:56-166` (estimateSimilarity
Umeyama + RANSAC wrapper used for CAMERA gt) and `:342-417` (cv2.solvePnP
path used for REAL train gt).
"""

from __future__ import annotations

import numpy as np


def umeyama_similarity(source: np.ndarray, target: np.ndarray):
    """Least-squares similarity transform target ≈ s R source + t.

    Args:
      source, target: (N, 3)
    Returns:
      (scale: float, R (3,3), t (3,), T (4,4) with T[:3,:3] = s*R)
    """
    assert source.shape == target.shape and source.shape[1] == 3
    n = source.shape[0]
    mu_s = source.mean(axis=0)
    mu_t = target.mean(axis=0)
    cs = source - mu_s
    ct = target - mu_t
    cov = ct.T @ cs / n
    if np.isnan(cov).any():
        raise RuntimeError("NaNs in input points")
    U, D, Vh = np.linalg.svd(cov, full_matrices=True)
    if np.linalg.det(U) * np.linalg.det(Vh) < 0:
        D = D.copy()
        D[-1] = -D[-1]
        U = U.copy()
        U[:, -1] = -U[:, -1]
    R = U @ Vh
    var_s = cs.var(axis=0).sum()
    scale = D.sum() / var_s
    t = mu_t - scale * R @ mu_s
    T = np.eye(4)
    T[:3, :3] = scale * R
    T[:3, 3] = t
    return float(scale), R, t, T


def ransac_umeyama(source: np.ndarray, target: np.ndarray, max_iter: int = 128,
                   confidence: float = 0.99, seed: int = 0, verbose: bool = False):
    """RANSAC wrapper: 5-point hypotheses, inlier threshold 0.1 of the source
    diameter propagated by the hypothesis scale (`pose_data.py:110-166`).

    Returns (scale, R, t, T) or (None,)*4 when degenerate.
    """
    assert source.shape[0] == target.shape[0]
    rng = np.random.default_rng(seed)
    n = source.shape[0]
    centered = source - source.mean(axis=0)
    diameter = 2 * np.linalg.norm(centered, axis=1).max()
    inlier_t = diameter / 10.0

    best_ratio = 0.0
    best_idx = np.arange(n)
    for i in range(max_iter):
        sel = rng.integers(0, n, size=5)
        try:
            scale, R, t, T = umeyama_similarity(source[sel], target[sel])
        except (RuntimeError, np.linalg.LinAlgError):
            continue
        thresh = scale * inlier_t
        resid = np.linalg.norm(target - (source @ (scale * R).T + t), axis=1)
        inliers = np.where(resid < thresh)[0]
        ratio = len(inliers) / n
        if ratio > best_ratio:
            best_ratio = ratio
            best_idx = inliers
        if (1 - (1 - best_ratio ** 5) ** (i + 1)) > confidence:
            break

    if best_ratio < 0.1:
        return None, None, None, None
    return umeyama_similarity(source[best_idx], target[best_idx])


def pnp_pose(points_3d: np.ndarray, points_2d: np.ndarray, K: np.ndarray,
             ransac: bool = True, reproj_err: float = 3.0, iterations: int = 100):
    """Recover [R|t] with cv2 solvePnP (the REAL-train gt path,
    `pose_data.py:342-417` via `lib/pysixd/misc.pnp`).

    Args:
      points_3d: (N, 3); points_2d: (N, 2); K: (3, 3)
    Returns:
      (3, 4) pose
    """
    import cv2

    points_3d = np.ascontiguousarray(points_3d.astype(np.float64)).reshape(-1, 1, 3)
    points_2d = np.ascontiguousarray(points_2d.astype(np.float64)).reshape(-1, 1, 2)
    dist = np.zeros(4)
    if ransac:
        _, rvec, tvec, _ = cv2.solvePnPRansac(
            points_3d, points_2d, K.astype(np.float64), dist,
            reprojectionError=reproj_err, iterationsCount=iterations,
            flags=cv2.SOLVEPNP_EPNP,
        )
    else:
        _, rvec, tvec = cv2.solvePnP(
            points_3d, points_2d, K.astype(np.float64), dist, flags=cv2.SOLVEPNP_EPNP
        )
    R, _ = cv2.Rodrigues(rvec)
    return np.concatenate([R, tvec.reshape(3, 1)], axis=1).astype(np.float32)
