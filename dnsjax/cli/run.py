"""SLAM entry point: ``python -m dnsjax.cli.run configs/replica/room_0.yaml``.

Counterpart of the reference run.py:9-46 (seeding, config stack, orchestrator
construction, run).
"""

from __future__ import annotations

import argparse
import os
import random

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description="dnsjax SLAM")
    parser.add_argument("config", type=str, help="scene config yaml")
    parser.add_argument("--input", type=str, default=None, help="dataset dir override")
    parser.add_argument("--output", type=str, default=None, help="output dir override")
    parser.add_argument("--end-frame", type=int, default=None,
                        help="stop after this many frames (debug)")
    parser.add_argument("--resume", type=str, default=None, metavar="CKPT",
                        help="checkpoint (.npz) to resume from")
    parser.add_argument("--resume-latest", action="store_true",
                        help="resume from the newest checkpoint in the "
                             "output dir (model.npz if present, else the "
                             "highest-numbered model_N.npz)")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    random.seed(args.seed)
    np.random.seed(args.seed)

    from dnsjax.config import load_config
    from dnsjax.slam.driver import DNSSLAM

    default = os.path.join(os.path.dirname(args.config), "..", "slam.yaml")
    if not os.path.exists(default):
        default = "configs/slam.yaml"
    cfg = load_config(args.config, default if os.path.exists(default) else None)
    cfg["seed"] = args.seed
    if args.input:
        cfg["input_folder"] = args.input

    out = args.output or os.path.join(
        cfg.get("out_dir", "output"), cfg.get("scene", "scene")
    )
    slam = DNSSLAM(cfg, output_dir=out)
    start = 0
    if args.resume or args.resume_latest:
        ckpt = args.resume
        if args.resume_latest:
            # model.npz is the final save; otherwise highest embedded frame
            # index wins (mtime alone can lie after a preserving copy).
            import glob
            import re

            final = os.path.join(out, "model.npz")
            if os.path.exists(final):
                ckpt = final
            else:
                def frame_no(p):
                    m = re.search(r"model_(\d+)\.npz$", p)
                    return (int(m.group(1)) if m else -1, os.path.getmtime(p))

                cands = sorted(
                    glob.glob(os.path.join(out, "model*.npz")), key=frame_no
                )
                if not cands:
                    parser.error(
                        f"--resume-latest: no model*.npz found in {out}"
                    )
                ckpt = cands[-1]
        start = slam.resume(ckpt)
        print(f"resumed from {ckpt} at frame {start}")
    slam.run(end_frame=args.end_frame, start_frame=start)


if __name__ == "__main__":
    main()
