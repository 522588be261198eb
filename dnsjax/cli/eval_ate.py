"""ATE evaluation from a checkpoint: ``python -m dnsjax.cli.eval_ate <config>``.

Counterpart of the reference eval_ate.py:240-295 (loads model.pt, converts
poses, Horn-aligns, prints stats, saves trajectory plot).
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("config", type=str)
    parser.add_argument("--output", type=str, default=None)
    parser.add_argument("--checkpoint", type=str, default=None)
    args = parser.parse_args(argv)

    from dnsjax.config import load_config
    from dnsjax.eval.ate import evaluate_ate
    from dnsjax.models.checkpoint import load_checkpoint

    cfg = load_config(
        args.config,
        "configs/slam.yaml" if os.path.exists("configs/slam.yaml") else None,
    )
    out = args.output or os.path.join(
        cfg.get("out_dir", "output"), cfg.get("scene", "scene")
    )
    ckpt_path = args.checkpoint or os.path.join(out, "model.npz")
    ckpt = load_checkpoint(ckpt_path)
    n = ckpt["meta"]["idx"] + 1
    stats = evaluate_ate(
        ckpt["estimate_c2w"][:n],
        ckpt["gt_c2w"][:n],
        plot_path=os.path.join(out, "ate.png"),
    )
    printable = {k: v for k, v in stats.items() if not hasattr(v, "shape")}
    print(json.dumps(printable, indent=2))
    return stats


if __name__ == "__main__":
    main()
