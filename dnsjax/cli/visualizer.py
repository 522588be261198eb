"""Trajectory / reconstruction visualizer: offline replay + live monitor.

Counterpart of the reference visualizer.py + utils/viz.py (an open3d
interactive replay with camera actors, trajectories, and live meshes;
optionally captured to mp4). open3d isn't available in this environment, so
dnsjax renders with matplotlib in two modes:

* replay (default): per-frame 3D view with the reference's camera-actor
  glyph (utils/viz.py:14-42; est red / gt black, accumulated per keyframe),
  est/gt trajectories, and the latest extracted mesh as a flat-shaded
  surface (vertex-colored, decimated) — written as png frames and
  optionally assembled to mp4 with ffmpeg if present (the reference's
  save_rendering capture, utils/viz.py:149-155).
* ``--live``: follow a RUNNING SLAM process (the reference's live-monitor
  use of utils/viz.py:14-209). The driver streams per-frame est/gt poses
  into ``metrics.jsonl`` (slam/driver.py track events); this mode tails the
  file, redraws on every new frame, picks up new ``mesh_*.ply`` files as
  meshing produces them, and keeps ``live.png`` continuously updated until
  the run goes idle.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import time


def _load_mesh(ply_path, max_faces=20000, max_pts=20000):
    """Load a mesh for display: decimated faces + per-face shade colors,
    or a vertex point-cloud fallback when the PLY carries no faces.

    Returns {"tris": (F,3,3), "fc": (F,3|4)} or {"pts": (P,3), "c": ...}.
    """
    import numpy as np
    from dnsjax.mesh.export import read_ply

    v, f, c, _ = read_ply(ply_path)
    if v.shape[0] == 0:
        return None
    rng = np.random.default_rng(0)
    if f is not None and len(f) > 0:
        f = np.asarray(f)
        if f.shape[0] > max_faces:
            f = f[rng.choice(f.shape[0], size=max_faces, replace=False)]
        tris = v[f]  # (F, 3, 3)
        # flat Lambert shade (the matplotlib stand-in for open3d's
        # compute_vertex_normals + shaded render, utils/viz.py:92-102)
        n = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
        n /= np.linalg.norm(n, axis=-1, keepdims=True) + 1e-12
        lam = np.abs(n @ np.asarray([0.3, 0.5, 0.81]))
        base = (
            c[f].mean(axis=1) / 255.0
            if c is not None
            else np.full((f.shape[0], 3), 0.72)
        )
        fc = np.clip(base * (0.35 + 0.65 * lam[:, None]), 0.0, 1.0)
        return {"tris": tris, "fc": fc}
    sel = rng.choice(v.shape[0], size=min(max_pts, v.shape[0]), replace=False)
    return {"pts": v[sel], "c": None if c is None else c[sel] / 255.0}


# the reference camera-actor glyph: 8 canonical points joined by 12 lines
# (utils/viz.py:14-42 — a frustum wireframe plus an 'up' tick), est drawn
# red, gt black, z flipped before drawing (utils/viz.py:192 update_pose)
_CAM_POINTS = [
    [0, 0, 0], [-1, -1, 1.5], [1, -1, 1.5], [1, 1, 1.5],
    [-1, 1, 1.5], [-0.5, 1, 1.5], [0.5, 1, 1.5], [0, 1.2, 1.5],
]
_CAM_LINES = [
    [1, 2], [2, 3], [3, 4], [4, 1], [1, 3], [2, 4],
    [1, 0], [0, 2], [3, 0], [0, 4], [5, 7], [7, 6],
]


def _camera_segments(c2w, scale=0.1):
    """(12, 2, 3) world-space line segments of the camera glyph at pose
    ``c2w`` ((3|4, 4), OpenGL-style camera looking down -z like the
    reference's; the glyph opens along the viewing direction)."""
    import numpy as np

    pts = np.asarray(_CAM_POINTS, np.float64) * scale
    pts[:, 2] *= -1.0  # the reference's z flip (utils/viz.py:192)
    R, t = np.asarray(c2w)[:3, :3], np.asarray(c2w)[:3, 3]
    world = pts @ R.T + t
    return world[np.asarray(_CAM_LINES)]


def _draw(ax, est, gt, mesh, idx, title=None, every=5, cam_scale=0.1):
    """est/gt: (N, 3|4, 4) pose arrays (positions-only (N, 3) also
    accepted: camera actors are then skipped)."""
    import numpy as np
    from mpl_toolkits.mplot3d.art3d import (
        Line3DCollection,
        Poly3DCollection,
    )

    if mesh is not None:
        if "tris" in mesh:
            ax.add_collection3d(
                Poly3DCollection(
                    mesh["tris"], facecolors=mesh["fc"], edgecolors="none"
                )
            )
            lo = mesh["tris"].reshape(-1, 3).min(0)
            hi = mesh["tris"].reshape(-1, 3).max(0)
            ax.auto_scale_xyz(*[(lo[i], hi[i]) for i in range(3)])
        else:
            ax.scatter(*mesh["pts"].T, s=0.3, c=mesh["c"], alpha=0.35)
    est, gt = np.asarray(est), np.asarray(gt)
    has_rot = est.ndim == 3
    est_p = est[:, :3, 3] if has_rot else est
    gt_p = gt[:, :3, 3] if has_rot else gt
    ax.plot(*gt_p[: idx + 1].T, "-", color="black", label="gt")
    ax.plot(*est_p[: idx + 1].T, "-", color="tab:red", label="est")
    if has_rot:
        # accumulated keyframe actors (faint) + the current pose (bold) —
        # the reference adds one actor per tracked frame (utils/viz.py:83-87)
        past = [
            _camera_segments(est[k], cam_scale)
            for k in range(0, idx, max(1, every))
        ]
        if past:
            ax.add_collection3d(Line3DCollection(
                np.concatenate(past), colors="tab:red", lw=0.5, alpha=0.3))
        ax.add_collection3d(Line3DCollection(
            _camera_segments(est[idx], cam_scale), colors="tab:red", lw=1.2))
        ax.add_collection3d(Line3DCollection(
            _camera_segments(gt[idx], cam_scale), colors="black", lw=0.8))
    else:
        ax.scatter(*est_p[idx].T, color="tab:red", s=40, marker="^")
    try:
        ax.set_box_aspect((1, 1, 1))
    except AttributeError:  # older matplotlib
        pass
    ax.legend()
    ax.set_title(title or f"frame {idx}")


def _serve(out, port, interval):
    """Serve <out>/live.png on localhost with an auto-refreshing page.

    The headless-TPU stand-in for the reference's interactive open3d
    window (utils/viz.py:14-209): point a browser at
    http://localhost:<port>/ while the SLAM run and the --live monitor
    are going. stdlib-only; returns the server (daemon thread started).
    """
    import http.server
    import threading

    page = (
        "<!doctype html><title>dnsjax live</title>"
        "<body style='margin:0;background:#111'>"
        "<img id=v src='/live.png' style='max-width:100vw;max-height:100vh'>"
        "<script>setInterval(()=>{v.src='/live.png?'+Date.now()},"
        f"{int(interval * 1000)})</script>"
    )

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path.split("?")[0] == "/live.png":
                try:
                    with open(os.path.join(out, "live.png"), "rb") as f:
                        body = f.read()
                    ctype = "image/png"
                except OSError:
                    self.send_error(404, "no live.png yet")
                    return
            else:
                body, ctype = page.encode(), "text/html"
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Cache-Control", "no-store")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", port), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    print(f"live view: http://127.0.0.1:{srv.server_address[1]}/")
    return srv


def _live(out, interval, idle_timeout):
    """Tail metrics.jsonl and keep <out>/live.png current."""
    import numpy as np
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    path = os.path.join(out, "metrics.jsonl")
    live_png = os.path.join(out, "live.png")
    est, gt, frames = [], [], []
    pos = 0
    mesh_pts, mesh_seen = None, None
    last_new = time.time()
    print(f"live monitor: following {path} (ctrl-c to stop)")
    while True:
        new = 0
        if os.path.exists(path):
            # binary mode: ``pos`` must count BYTES — a text-mode len(line)
            # counts characters and diverges on any non-ASCII event field,
            # landing every later seek mid-line
            with open(path, "rb") as f:
                f.seek(pos)
                for line in f:
                    if not line.endswith(b"\n"):
                        break  # partial write; re-read next poll
                    pos += len(line)
                    try:
                        ev = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    if "c2w" in ev:
                        est.append(np.asarray(ev["c2w"]).reshape(3, 4))
                        gt.append(np.asarray(ev["gt_c2w"]).reshape(3, 4))
                        frames.append(int(ev["frame"]))
                        new += 1
        meshes = sorted(glob.glob(os.path.join(out, "mesh_*.ply")))
        if meshes and meshes[-1] != mesh_seen:
            try:
                # smaller face budget than replay: live redraws every poll
                mesh_pts = _load_mesh(meshes[-1], max_faces=8000)
                mesh_seen = meshes[-1]
                new += 1
            except Exception:
                pass  # mid-write; retry next poll
        if new and est:
            fig = plt.figure(figsize=(7, 6))
            ax = fig.add_subplot(projection="3d")
            _draw(ax, np.asarray(est), np.asarray(gt), mesh_pts,
                  len(est) - 1, title=f"frame {frames[-1]} (live)")
            tmp = os.path.join(out, ".live.tmp.png")
            fig.savefig(tmp, dpi=100)
            plt.close(fig)
            os.replace(tmp, live_png)  # atomic swap for concurrent viewers
            last_new = time.time()
        elif time.time() - last_new > idle_timeout:
            print(f"no new frames for {idle_timeout:.0f}s; stopping "
                  f"({len(est)} frames monitored)")
            return
        time.sleep(interval)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("config", type=str)
    parser.add_argument("--output", type=str, default=None)
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--every", type=int, default=5)
    parser.add_argument("--mp4", action="store_true")
    parser.add_argument("--live", action="store_true",
                        help="follow a running SLAM process (tails "
                        "metrics.jsonl, keeps live.png updated)")
    parser.add_argument("--interval", type=float, default=2.0,
                        help="--live poll period (s)")
    parser.add_argument("--idle-timeout", type=float, default=120.0,
                        help="--live stops after this long with no new data")
    parser.add_argument("--serve", type=int, default=None, metavar="PORT",
                        help="with --live: also serve an auto-refreshing "
                        "view of live.png at http://127.0.0.1:PORT/ "
                        "(0 = pick a free port)")
    args = parser.parse_args(argv)

    import numpy as np
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from dnsjax.config import load_config
    from dnsjax.models.checkpoint import load_checkpoint

    cfg = load_config(
        args.config,
        "configs/slam.yaml" if os.path.exists("configs/slam.yaml") else None,
    )
    out = args.output or os.path.join(
        cfg.get("out_dir", "output"), cfg.get("scene", "scene")
    )

    if args.live:
        srv = None
        if args.serve is not None:
            srv = _serve(out, args.serve, args.interval)
        try:
            _live(out, args.interval, args.idle_timeout)
        finally:
            if srv is not None:
                srv.shutdown()
        return

    ckpt = load_checkpoint(args.checkpoint or os.path.join(out, "model.npz"))
    n = ckpt["meta"]["idx"] + 1
    est = ckpt["estimate_c2w"][:n]
    gt = ckpt["gt_c2w"][:n]

    meshes = sorted(glob.glob(os.path.join(out, "mesh_*.ply")))
    mesh_pts = _load_mesh(meshes[-1]) if meshes else None

    frame_dir = os.path.join(out, "replay")
    os.makedirs(frame_dir, exist_ok=True)
    for k, idx in enumerate(range(1, n, args.every)):
        fig = plt.figure(figsize=(7, 6))
        ax = fig.add_subplot(projection="3d")
        _draw(ax, est, gt, mesh_pts, idx, every=args.every)
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
