"""Profile the end-to-end mesh-extraction wall with per-phase breakdown.

Reproduces bench.py's extraction-wall setup (fitted full-res synthetic
field, 256^3 grid, production meshing config) and prints
``Mesher.last_timings`` so the dominating phase can be attacked directly.
Reference cost center: slams/meshing.py:646-657 (the reference never
reports this wall; its tqdm loop hides it inside mapping).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_mesh_extract.py [--res 256]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--fit-rounds", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dnsjax.config import load_config
    from dnsjax.data.synthetic import SyntheticDataset, synthetic_config
    from dnsjax.geometry.se3 import tensor_from_camera
    from dnsjax.mesh.mesher import Mesher
    from dnsjax.models.decoder import DecoderSpec, init_decoder_params
    from dnsjax.models.encoder import init_encoder_params, encode_images
    from dnsjax.slam.keyframes import KeyframeStore
    from dnsjax.slam.mapper import MapConfig, make_map_fn
    from dnsjax.slam.sampling import class_sorted_pixels

    H, W, T = 680, 1200, 4
    cfg = load_config("configs/replica/replica.yaml", "configs/slam.yaml")
    tpu_cfg = cfg.get("tpu", {})
    trn = cfg["training"]
    mp = cfg.get("mapping", {})
    feature_taps = int(tpu_cfg.get("feature_taps", 4))
    prod_px = int(mp.get("n_pixels", 2000))
    prod_ns = int(trn.get("n_samples_ray", 32))
    prod_nsurf = int(trn.get("n_surface_ray", 15))
    enc = init_encoder_params(0)

    scfg = synthetic_config(H=H, W=W, n_frames=T)
    ds = SyntheticDataset(scfg)
    nc = ds.n_class
    bound_np = np.asarray([[-2.2, 2.2], [-2.2, 2.2], [-2.2, 2.2]], np.float64)
    spec = DecoderSpec.from_config(cfg, bound_np, nc)
    params = init_decoder_params(jax.random.PRNGKey(0), spec)
    mcfg = MapConfig(
        H=H, W=W, fx=ds.fx, fy=ds.fy, cx=ds.cx, cy=ds.cy,
        n_pixels=prod_px, n_samples=prod_ns, n_surface=prod_nsurf,
        smooth_pts=int(trn.get("smooth_pts", 33)),
        smooth_every=int(trn.get("smooth_every", 1)),
        feature_taps=feature_taps,
    )
    map_fn = make_map_fn(spec, mcfg, T, 50)
    frames = [ds[i] for i in range(T)]
    colors = jnp.stack([jnp.asarray(f["color"]) for f in frames])
    depths = jnp.stack([jnp.asarray(f["depth"]) for f in frames])
    labels_np = np.stack([np.asarray(f["label"]) for f in frames])
    est = jnp.stack([jnp.asarray(f["c2w"]) for f in frames])
    si, off = zip(*(class_sorted_pixels(l, nc) for l in labels_np))
    feats = encode_images(enc, jnp.broadcast_to(colors[:, None], (T, 3, H, W, 3)))
    window = {
        "colors": colors, "depths": depths, "labels": jnp.asarray(labels_np),
        "sorted_idx": jnp.stack([jnp.asarray(x) for x in si]),
        "offsets": jnp.stack([jnp.asarray(x) for x in off]),
        "refer_feats": feats,
        "refer_fixed_c2w": jnp.broadcast_to(est[:, None], (T, 3, 4, 4)),
        "refer_src": jnp.full((T, 3), -1, jnp.int32),
        "pose_train": jnp.zeros(T),
        "bound": jnp.asarray(bound_np),
        "lt_gate_iter": jnp.asarray(-1, jnp.int32),
    }
    t7 = tensor_from_camera(est)
    t_fit0 = time.perf_counter()
    for i in range(args.fit_rounds):
        params, _q, _t, aux = map_fn(
            params, t7[:, :4], t7[:, 4:], window, jax.random.PRNGKey(10 + i))
    print(f"fit: loss={float(np.asarray(aux['losses'])[-1]):.4f} "
          f"({time.perf_counter() - t_fit0:.1f}s)")

    kf_store = KeyframeStore(T, H, W, nc)
    for i, f in enumerate(frames):
        kf_store.add(
            {"index": i, "color": f["color"], "depth": f["depth"],
             "label": f["label"], "label_np": np.asarray(f["label"]),
             "c2w": f["c2w"]},
            np.asarray(f["c2w"]),
        )
    mesh_cfg = {
        "meshing": dict(cfg.get("meshing", {}), resolution=args.res,
                        points_batch_size=131072),
        "back_end": {
            "bound": bound_np.tolist(),
            "marching_cubes_bound": bound_np.tolist(),
        },
        "tpu": {"feature_taps": feature_taps},
    }
    mesher = Mesher(
        mesh_cfg, dict(H=H, W=W, fx=ds.fx, fy=ds.fy, cx=ds.cx, cy=ds.cy),
        bound_np, spec, jnp.bfloat16,
    )
    for r in range(args.runs):
        t0 = time.perf_counter()
        out = mesher.extract(params, enc, kf_store)
        wall = time.perf_counter() - t0
        print(f"run {r}: wall={wall:.2f}s verts={out['vertices'].shape[0]}")
        print("  " + json.dumps(
            {k: round(v, 3) for k, v in mesher.last_timings.items()}))


if __name__ == "__main__":
    main()
