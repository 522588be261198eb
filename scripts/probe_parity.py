"""Bisect the TPU-worker crash of the parity A/B variant.

Runs ONE short mapping keystep (10 iters) at the textured-gate shape for a
sequence of specs between the TPU profile and full reference-parity, printing
which component kills the worker. Usage:

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_parity.py [name]

With no argument, runs every probe in its own subprocess (crashes isolated).
"""

import os
import subprocess
import sys

PROBES = {
    # name -> (grid kwargs, compute_dtype, taps)
    "tpu": (dict(n_levels=4, n_features=8, grad_corners=1, gather_bf16=True),
            "bfloat16", 1),
    "grid16x2": (dict(n_levels=16, n_features=2, grad_corners=1,
                      gather_bf16=True), "bfloat16", 1),
    "corners8": (dict(n_levels=4, n_features=8, grad_corners=8,
                      gather_bf16=True), "bfloat16", 1),
    "grid16x2-corners8": (dict(n_levels=16, n_features=2, grad_corners=8,
                               gather_bf16=True), "bfloat16", 1),
    "f32gather": (dict(n_levels=4, n_features=8, grad_corners=1,
                       gather_bf16=False), "bfloat16", 1),
    "f32compute": (dict(n_levels=4, n_features=8, grad_corners=1,
                        gather_bf16=True), "float32", 1),
    "taps4": (dict(n_levels=4, n_features=8, grad_corners=1,
                   gather_bf16=True), "bfloat16", 4),
    "parity": (dict(n_levels=16, n_features=2, grad_corners=8,
                    gather_bf16=False), "float32", 4),
}


def run_probe(name):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from dnsjax.geometry.se3 import tensor_from_camera
    from dnsjax.models.decoder import DecoderSpec, init_decoder_params
    from dnsjax.models.encoder import init_encoder_params, encode_images
    from dnsjax.ops.hashgrid import HashGridSpec
    from dnsjax.slam.mapper import MapConfig, make_map_fn
    from dnsjax.slam.sampling import class_sorted_pixels

    grid_kw, cdt_name, taps = PROBES[name]
    cdt = jnp.bfloat16 if cdt_name == "bfloat16" else jnp.float32
    H, W, T, C = 680, 1200, 4, 30
    fx = 600.0
    cx, cy = 599.5, 339.5
    bound = jnp.asarray([[-2.2, 2.2]] * 3)
    spec = DecoderSpec(
        n_class=C,
        grid=HashGridSpec(log2_hashmap_size=16, base_resolution=16,
                          desired_resolution=220, **grid_kw),
        n_bins=16,
    )
    params = init_decoder_params(jax.random.PRNGKey(0), spec)
    enc = init_encoder_params(0)
    mcfg = MapConfig(H=H, W=W, fx=fx, fy=fx, cx=cx, cy=cy,
                     n_pixels=2000, n_samples=32, n_surface=15,
                     smooth_pts=33, feature_taps=taps)
    map_fn = make_map_fn(spec, mcfg, T, 10, cdt)

    rng = np.random.default_rng(0)
    colors = jnp.asarray(rng.uniform(size=(T, H, W, 3)).astype(np.float32))
    depths = jnp.asarray(rng.uniform(0.5, 3.0, size=(T, H, W)).astype(np.float32))
    labels_np = rng.integers(0, C, size=(T, H, W)).astype(np.int32)
    si, off = zip(*(class_sorted_pixels(l, C) for l in labels_np))
    est = jnp.tile(jnp.eye(4), (T, 1, 1))
    feats = encode_images(enc, jnp.broadcast_to(colors[:, None], (T, 3, H, W, 3)))
    window = {
        "colors": colors, "depths": depths, "labels": jnp.asarray(labels_np),
        "sorted_idx": jnp.stack([jnp.asarray(x) for x in si]),
        "offsets": jnp.stack([jnp.asarray(x) for x in off]),
        "refer_feats": feats,
        "refer_fixed_c2w": jnp.broadcast_to(est[:, None], (T, 3, 4, 4)),
        "refer_src": jnp.full((T, 3), -1, jnp.int32),
        "pose_train": jnp.ones(T),
        "bound": bound,
        "lt_gate_iter": jnp.asarray(-1, jnp.int32),
    }
    t7 = tensor_from_camera(est)
    out = map_fn(params, t7[:, :4], t7[:, 4:], window, jax.random.PRNGKey(1))
    import numpy as _np

    print(f"PROBE {name}: OK losses={_np.asarray(out[3]['losses']).round(3)}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] != "--sweep":
        run_probe(sys.argv[1])
    else:
        here = os.path.abspath(__file__)
        names = sys.argv[2:] or list(PROBES)
        for name in names:
            try:
                p = subprocess.run([sys.executable, here, name],
                                   capture_output=True, text=True,
                                   timeout=2400)
            except subprocess.TimeoutExpired:
                print(f"PROBE {name}: TIMEOUT (2400s)", flush=True)
                continue
            line = next((l for l in p.stdout.splitlines()
                         if l.startswith("PROBE")), None)
            if line:
                print(line, flush=True)
            else:
                err = (p.stderr or "").strip().splitlines()
                print(f"PROBE {name}: FAILED rc={p.returncode} "
                      f"{err[-1][:150] if err else ''}", flush=True)
