"""Offline mesh extraction from a checkpoint.

Working counterpart of the reference extract_mesh.py (broken as shipped by a
nonexistent ``Vis`` import, extract_mesh.py:14): rebuild the model from
model.npz and run the Mesher.
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("config", type=str)
    parser.add_argument("--input", type=str, default=None)
    parser.add_argument("--output", type=str, default=None)
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--resolution", type=int, default=None)
    args = parser.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from dnsjax.config import load_config
    from dnsjax.data import get_dataset
    from dnsjax.mesh import Mesher
    from dnsjax.mesh.export import write_ply
    from dnsjax.models.checkpoint import load_checkpoint, restore_params
    from dnsjax.models.decoder import DecoderSpec, init_decoder_params
    from dnsjax.models.encoder import init_encoder_params
    from dnsjax.slam.driver import load_bound
    from dnsjax.slam.keyframes import KeyframeStore

    cfg = load_config(
        args.config,
        "configs/slam.yaml" if os.path.exists("configs/slam.yaml") else None,
    )
    if args.input:
        cfg["input_folder"] = args.input
    out = args.output or os.path.join(
        cfg.get("out_dir", "output"), cfg.get("scene", "scene")
    )
    ckpt = load_checkpoint(args.checkpoint or os.path.join(out, "model.npz"))
    if args.resolution:
        cfg.setdefault("meshing", {})["resolution"] = args.resolution

    input_folder = cfg.get("input_folder") or os.path.join(
        cfg.get("dataset_dir", ""), cfg.get("scene", "")
    )
    ds = get_dataset(cfg, input_folder, float(cfg.get("scale", 1)))
    bound = load_bound(cfg)
    spec = DecoderSpec.from_config(cfg, bound, ds.n_class)
    params = restore_params(init_decoder_params(jax.random.PRNGKey(0), spec), ckpt)
    enc = init_encoder_params(int(cfg.get("seed", 0)))

    # rebuild the keyframe store from the checkpoint
    meta = ckpt["meta"]
    kf = KeyframeStore(int(meta["kf_capacity"]), ds.H, ds.W, int(meta["n_class"]))
    for k in range(ckpt["kf/colors"].shape[0]):
        kf.add(
            {
                "color": ckpt["kf/colors"][k],
                "depth": ckpt["kf/depths"][k],
                "label": ckpt["kf/labels"][k],
                "c2w": ckpt["kf/gt_c2w"][k],
                "index": meta["kf_frame_ids"][k],
            },
            ckpt["kf/est_c2w"][k],
        )

    device_mesh = None
    dp = min(int(cfg.get("tpu", {}).get("data_parallel", 1)), len(jax.devices()))
    if dp > 1:
        from dnsjax.parallel.mesh import ray_mesh

        device_mesh = ray_mesh(dp)
    mesher = Mesher(
        cfg, dict(H=ds.H, W=ds.W, fx=ds.fx, fy=ds.fy, cx=ds.cx, cy=ds.cy),
        bound, spec, device_mesh=device_mesh,
    )
    colors = np.random.default_rng(7).integers(
        0, 256, size=(ds.n_class, 3)
    ).astype(np.uint8)
    mesh = mesher.extract(params, enc, kf, colors)
    idx = meta["idx"]
    path = os.path.join(out, f"mesh_{idx}.ply")
    write_ply(path, mesh["vertices"], mesh["faces"],
              colors=mesh.get("colors"), labels=mesh.get("labels"))
    if "label_colors" in mesh:
        write_ply(
            os.path.join(out, f"mesh_{idx}_semantic.ply"),
            mesh["vertices"], mesh["faces"],
            colors=mesh["label_colors"] / 255.0, labels=mesh.get("labels"),
        )
    print(f"saved {path} ({mesh['vertices'].shape[0]} verts)")


if __name__ == "__main__":
    main()
