"""3D mesh evaluation: ``python -m dnsjax.cli.eval_3d rec.ply gt.ply``.

Counterpart of the reference eval_3d.py calc_3d_metric (eval_3d.py:24-42):
accuracy / completion / completion-ratio over 200k surface samples.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("rec_mesh", type=str)
    parser.add_argument("gt_mesh", type=str)
    parser.add_argument("--samples", type=int, default=200_000)
    parser.add_argument("--thresh", type=float, default=0.05)
    args = parser.parse_args(argv)

    from dnsjax.eval.mesh_metrics import mesh_metrics
    from dnsjax.mesh.export import read_ply

    rv, rf, _, _ = read_ply(args.rec_mesh)
    gv, gf, _, _ = read_ply(args.gt_mesh)
    m = mesh_metrics(rv, rf, gv, gf, n_samples=args.samples, thresh=args.thresh)
    print(json.dumps(m, indent=2))
    return m


if __name__ == "__main__":
    main()
