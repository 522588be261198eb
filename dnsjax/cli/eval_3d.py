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
    parser.add_argument("--depth-views", type=int, default=0,
                        help="also compute depth-L1 from N random virtual "
                        "views (reference calc_2d_metric; needs the native "
                        "raycaster)")
    args = parser.parse_args(argv)

    from dnsjax.eval.mesh_metrics import depth_l1_virtual_views, mesh_metrics
    from dnsjax.mesh.export import read_ply

    rv, rf, _, _ = read_ply(args.rec_mesh)
    gv, gf, _, _ = read_ply(args.gt_mesh)
    m = mesh_metrics(rv, rf, gv, gf, n_samples=args.samples, thresh=args.thresh)
    if args.depth_views > 0:
        m.update(depth_l1_virtual_views(rv, rf, gv, gf, n_views=args.depth_views))
    print(json.dumps(m, indent=2))
    return m


if __name__ == "__main__":
    main()
