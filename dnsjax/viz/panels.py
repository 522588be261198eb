"""Visual diagnostics: the 3x3 GT/render/residual panel.

Counterpart of the reference's ``fig_plot`` (reference: utils/common.py:682-745):
rows are depth / rgb / semantic label, columns are input / generated /
residual. Saved as ``{out_dir}/{idx:05d}.jpg``.
"""

from __future__ import annotations

import os

import numpy as np


def residual_panel(
    idx: int,
    out_dir: str,
    gt_color: np.ndarray,
    est_color: np.ndarray,
    gt_depth: np.ndarray,
    est_depth: np.ndarray,
    gt_label: np.ndarray,
    est_label: np.ndarray,
    max_label: int = 101,
) -> str:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    color_res = np.abs(gt_color - est_color)
    depth_res = np.abs(gt_depth - est_depth)
    label_res = np.abs(gt_label.astype(np.float64) - est_label.astype(np.float64))

    fig, axs = plt.subplots(3, 3, figsize=(12, 8))
    fig.tight_layout()
    vmax = float(np.max(gt_depth))
    rows = [
        (gt_depth, est_depth, depth_res, dict(cmap="plasma", vmin=0, vmax=vmax),
         ("Input Depth", "Generated Depth", "Depth Residual")),
        (np.clip(gt_color, 0, 1), np.clip(est_color, 0, 1),
         np.clip(color_res, 0, 1), {}, ("Input RGB", "Generated RGB", "RGB Residual")),
        (gt_label, est_label, label_res,
         dict(cmap="plasma", vmin=0, vmax=max_label),
         ("Input Label", "Generated Label", "Label Residual")),
    ]
    for r, (a, b, c, kw, titles) in enumerate(rows):
        for cix, (img, title) in enumerate(zip((a, b, c), titles)):
            axs[r, cix].imshow(img, **kw)
            axs[r, cix].set_title(title)
            axs[r, cix].set_xticks([])
            axs[r, cix].set_yticks([])
    plt.subplots_adjust(wspace=0, hspace=0.2)
    path = os.path.join(out_dir, f"{idx:05d}.jpg")
    plt.savefig(path, bbox_inches="tight", pad_inches=0.3, dpi=150)
    plt.close(fig)
    return path
