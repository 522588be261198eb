"""2D rendering + semantic evaluation from a checkpoint.

Working re-implementation of the reference eval_2d.py (which is broken
as-shipped: nonexistent ``Vis`` import, dataset typo, stale decoder call
signatures — see SURVEY.md §2.8): render every ``--every``-th frame from the
final map, compute PSNR (valid-depth mask), SSIM, MS-SSIM, and semantic
mIoU/fwIoU/accuracies, save rendered color/semantic images, and append
``rendering_eval.txt``.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("config", type=str)
    parser.add_argument("--input", type=str, default=None)
    parser.add_argument("--output", type=str, default=None)
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--every", type=int, default=10)
    parser.add_argument("--max-frames", type=int, default=None)
    parser.add_argument(
        "--self-refs", action="store_true",
        help="condition each render on the evaluated frame's own image "
             "(the reference eval's behavior — it leaks the answer into "
             "the 2D feature pathway and inflates PSNR/mIoU; default is "
             "the three nearest keyframe views from the checkpoint)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from dnsjax.config import load_config
    from dnsjax.data import get_dataset
    from dnsjax.eval.render_metrics import psnr, ssim, ms_ssim, lpips
    from dnsjax.eval.semantic import semantic_metrics
    from dnsjax.geometry.se3 import invert_se3
    from dnsjax.models.checkpoint import load_checkpoint, restore_params
    from dnsjax.models.decoder import DecoderSpec, init_decoder_params
    from dnsjax.models.encoder import init_encoder_params, encode_images
    from dnsjax.render.full import make_full_renderer
    from dnsjax.slam.driver import load_bound

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

    input_folder = cfg.get("input_folder") or os.path.join(
        cfg.get("dataset_dir", ""), cfg.get("scene", "")
    )
    ds = get_dataset(cfg, input_folder, float(cfg.get("scale", 1)))
    bound = load_bound(cfg)
    spec = DecoderSpec.from_config(cfg, bound, ds.n_class)
    params = restore_params(init_decoder_params(jax.random.PRNGKey(0), spec), ckpt)
    enc = init_encoder_params(int(cfg.get("seed", 0)))

    trn = cfg["training"]
    eval_mesh = None
    dp = min(int(cfg.get("tpu", {}).get("data_parallel", 1)), len(jax.devices()))
    if dp > 1:
        from dnsjax.parallel.mesh import ray_mesh

        eval_mesh = ray_mesh(dp)
    renderer = make_full_renderer(
        spec,
        dict(H=ds.H, W=ds.W, fx=ds.fx, fy=ds.fy, cx=ds.cx, cy=ds.cy),
        int(trn["n_samples_ray"]), int(trn["n_surface_ray"]),
        mesh=eval_mesh,
    )
    bound_j = jnp.asarray(bound)
    est = ckpt["estimate_c2w"]

    # Reference views for the 2D feature pathway. The broken reference eval
    # conditioned each frame on its OWN image (3x), feeding the evaluated
    # image back into its reconstruction; we default to the 3 keyframe
    # views nearest by camera position (leak-free — the map was trained on
    # keyframes, so this matches what the live system conditions on,
    # driver.frame_vis uses the same pathway).
    kf_colors = ckpt.get("kf/colors")
    use_kf_refs = kf_colors is not None and not args.self_refs
    if use_kf_refs:
        kf_c2w = np.asarray(ckpt["kf/est_c2w"])  # (K, 4, 4)
        kf_feats_cache = {}

        def kf_feats(k: int):
            if k not in kf_feats_cache:
                kf_feats_cache[k] = encode_images(
                    enc, jnp.asarray(kf_colors[k])[None]
                )[0]
            return kf_feats_cache[k]
    elif not args.self_refs:
        print(
            "WARNING: checkpoint has no keyframe images; falling back to "
            "self-conditioned reference views (optimistic metrics)"
        )

    os.makedirs(os.path.join(out, "renders"), exist_ok=True)
    rows = []
    n = ckpt["meta"]["idx"] + 1
    if args.max_frames:
        n = min(n, args.max_frames)
    import cv2

    for idx in range(0, n, args.every):
        f = ds[idx]
        c2w = jnp.asarray(est[idx])
        if use_kf_refs:
            pos = np.asarray(est[idx])[:3, 3]
            d = np.linalg.norm(kf_c2w[:, :3, 3] - pos[None], axis=-1)
            near = np.argsort(d)[:3].tolist()
            near = (near + [near[-1]] * 3)[:3]  # pad if < 3 keyframes
            refer_c2w = jnp.asarray(kf_c2w[near])
            feats = jnp.stack([kf_feats(k) for k in near])
        else:
            refer_c2w = jnp.stack([c2w, c2w, c2w])
            feats = encode_images(
                enc, jnp.asarray(f["color"])[None].repeat(3, 0)
            )
        color, depth, logits = renderer(
            params, c2w, jnp.asarray(f["depth"]), jnp.asarray(f["label"]),
            invert_se3(refer_c2w), feats, bound_j, jax.random.PRNGKey(idx),
        )
        color = np.asarray(color)
        pred_label = np.asarray(jnp.argmax(logits, -1))
        valid = f["depth"] > 0

        row = {
            "frame": idx,
            "psnr": psnr(f["color"], color, valid),
            "ssim": ssim(f["color"], color),
            "ms_ssim": ms_ssim(f["color"], color),
        }
        lp = lpips(f["color"], color)
        if lp is not None:
            row["lpips"] = lp
        row.update(
            {
                k: v
                for k, v in semantic_metrics(
                    f["label"], pred_label, ds.n_class, valid
                ).items()
                if np.isscalar(v) or isinstance(v, (int, float))
            }
        )
        rows.append(row)
        cv2.imwrite(
            os.path.join(out, "renders", f"color_{idx:05d}.png"),
            cv2.cvtColor((np.clip(color, 0, 1) * 255).astype(np.uint8),
                         cv2.COLOR_RGB2BGR),
        )
        cv2.imwrite(
            os.path.join(out, "renders", f"semantic_{idx:05d}.png"),
            pred_label.astype(np.uint16),
        )
        print(json.dumps({k: round(v, 4) if isinstance(v, float) else v
                          for k, v in row.items()}))

    avg = {
        k: float(np.mean([r[k] for r in rows]))
        for k in rows[0]
        if k != "frame"
    }
    print("AVERAGE:", json.dumps({k: round(v, 4) for k, v in avg.items()}))
    with open(os.path.join(out, "rendering_eval.txt"), "a") as fh:
        fh.write(json.dumps(avg) + "\n")
    return avg


if __name__ == "__main__":
    main()
