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
    parser.add_argument("--resume", type=str, nargs="?", const="latest",
                        default=None,
                        help="checkpoint (.npz) to resume from; bare "
                             "--resume picks the newest model*.npz in the "
                             "output dir")
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
    if args.resume:
        ckpt = args.resume
        if ckpt == "latest":
            import glob

            cands = sorted(
                glob.glob(os.path.join(out, "model*.npz")), key=os.path.getmtime
            )
            if not cands:
                parser.error(f"--resume: no model*.npz found in {out}")
            ckpt = cands[-1]
        start = slam.resume(ckpt)
        print(f"resumed from {ckpt} at frame {start}")
    slam.run(end_frame=args.end_frame, start_frame=start)


if __name__ == "__main__":
    main()
