"""Trajectory / reconstruction replay visualizer.

Counterpart of the reference visualizer.py + utils/viz.py (an open3d
interactive replay with camera actors, trajectories, and live meshes;
optionally captured to mp4). open3d isn't available in this environment, so
dnsjax renders a matplotlib replay: per-frame 3D trajectory (est vs gt),
camera frustum glyph, and the latest mesh vertices as a point cloud —
written as png frames and optionally assembled to mp4 with ffmpeg if
present.
"""

from __future__ import annotations

import argparse
import glob
import os
import subprocess


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("config", type=str)
    parser.add_argument("--output", type=str, default=None)
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--every", type=int, default=5)
    parser.add_argument("--mp4", action="store_true")
    args = parser.parse_args(argv)

    import numpy as np
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from dnsjax.config import load_config
    from dnsjax.mesh.export import read_ply
    from dnsjax.models.checkpoint import load_checkpoint

    cfg = load_config(
        args.config,
        "configs/slam.yaml" if os.path.exists("configs/slam.yaml") else None,
    )
    out = args.output or os.path.join(
        cfg.get("out_dir", "output"), cfg.get("scene", "scene")
    )
    ckpt = load_checkpoint(args.checkpoint or os.path.join(out, "model.npz"))
    n = ckpt["meta"]["idx"] + 1
    est = ckpt["estimate_c2w"][:n, :3, 3]
    gt = ckpt["gt_c2w"][:n, :3, 3]

    meshes = sorted(glob.glob(os.path.join(out, "mesh_*.ply")))
    mesh_pts = None
    if meshes:
        v, _, c, _ = read_ply(meshes[-1])
        sel = np.random.default_rng(0).choice(
            v.shape[0], size=min(20000, v.shape[0]), replace=False
        )
        mesh_pts = (v[sel], None if c is None else c[sel] / 255.0)

    frame_dir = os.path.join(out, "replay")
    os.makedirs(frame_dir, exist_ok=True)
    for k, idx in enumerate(range(1, n, args.every)):
        fig = plt.figure(figsize=(7, 6))
        ax = fig.add_subplot(projection="3d")
        if mesh_pts is not None:
            ax.scatter(*mesh_pts[0].T, s=0.3, c=mesh_pts[1], alpha=0.35)
        ax.plot(*gt[: idx + 1].T, "-", color="black", label="gt")
        ax.plot(*est[: idx + 1].T, "-", color="tab:red", label="est")
        ax.scatter(*est[idx].T, color="tab:red", s=40, marker="^")
        ax.legend()
        ax.set_title(f"frame {idx}")
        fig.savefig(os.path.join(frame_dir, f"replay_{k:05d}.png"), dpi=100)
        plt.close(fig)
    print(f"wrote {len(range(1, n, args.every))} replay frames to {frame_dir}")

    if args.mp4:
        mp4 = os.path.join(out, "replay.mp4")
        try:
            subprocess.run(
                ["ffmpeg", "-y", "-framerate", "10",
                 "-i", os.path.join(frame_dir, "replay_%05d.png"), mp4],
                check=True, capture_output=True,
            )
            print(f"wrote {mp4}")
        except (FileNotFoundError, subprocess.CalledProcessError) as e:
            print(f"ffmpeg unavailable/failed ({e}); kept png frames")


if __name__ == "__main__":
    main()
