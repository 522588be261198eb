"""Mesh-query throughput probe: fused vs unfused view rows at bench shape.

One 131072-point chunk against 16 keyframes (bench.py mesh section shape).
Times the jitted query with a scalar sink, min-of-3 (axon discipline).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_mesh_query.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from dnsjax.mesh.mesher import Mesher
from dnsjax.models.decoder import DecoderSpec, init_decoder_params

H, W = 680, 1200
B, K = 131072, 16
N_CLASS = 52
TUNNEL_S = 0.027


def main():
    rng = np.random.default_rng(0)
    bound_np = np.asarray([[-2.9, 8.9], [-3.2, 5.5], [-3.5, 3.3]])
    bound = jnp.asarray(bound_np)
    from dnsjax.config import load_config

    cfg = load_config("configs/replica/replica.yaml", "configs/slam.yaml")
    spec = DecoderSpec.from_config(cfg, bound_np, N_CLASS)
    params = init_decoder_params(jax.random.PRNGKey(0), spec)
    fx = W / 2.0
    cam = dict(H=H, W=W, fx=fx, fy=fx, cx=(W - 1) / 2.0, cy=(H - 1) / 2.0)

    pts = jnp.asarray(rng.uniform(-2.0, 3.0, size=(B, 3)).astype(np.float32))
    # a Morton-chunk-like compact cluster (0.8 m cube): measures the
    # view-skip's realistic regime, where most keyframes cannot see the chunk
    pts_local = jnp.asarray(
        rng.uniform(0.0, 0.8, size=(B, 3)).astype(np.float32)
        + np.asarray([0.0, 0.0, -2.5], np.float32)
    )
    kf_c2w = jnp.tile(jnp.eye(4), (K, 1, 1))
    # trajectory-like pose spread: yaw k*45deg, offset along the walk
    yaw = np.arange(K) * (np.pi / 4)
    c2ws = np.tile(np.eye(4), (K, 1, 1)).astype(np.float32)
    c2ws[:, 0, 0] = np.cos(yaw)
    c2ws[:, 0, 2] = np.sin(yaw)
    c2ws[:, 2, 0] = -np.sin(yaw)
    c2ws[:, 2, 2] = np.cos(yaw)
    c2ws[:, 0, 3] = np.linspace(-2.0, 3.0, K)
    kf_c2w_spread = jnp.asarray(c2ws)
    kf_valid = jnp.ones(K, bool)
    kf_feats = jnp.asarray(
        rng.normal(size=(K, H // 2, W // 2, 64)).astype(np.float32)
    )
    kf_labels = jnp.asarray(rng.integers(0, N_CLASS, size=(K, H, W)), jnp.int32)
    kf_depths = jnp.asarray(
        rng.uniform(0.5, 5.0, size=(K, H, W)).astype(np.float32)
    )

    cases = [
        # (label, fused, skip, points, poses)
        ("unfused",            False, False, pts, kf_c2w),
        ("fused",              True,  False, pts, kf_c2w),
        # skip overhead: every view sees the chunk (identity poses, spread
        # points) -> the frustum cond always takes the work branch
        ("fused+skip all-vis", True,  True,  pts, kf_c2w),
        # realistic: compact Morton chunk, trajectory poses — most views skip
        ("fused+skip local",   True,  True,  pts_local, kf_c2w_spread),
        ("fused noskip local", True,  False, pts_local, kf_c2w_spread),
    ]
    for label, fused, skip, qpts, poses in cases:
        mcfg = {
            "meshing": {"resolution": 256, "points_batch_size": B,
                        "level_set": 0.0, "clean_mesh": False,
                        "depth_test": True},
            "back_end": {"bound": bound_np.tolist(),
                         "marching_cubes_bound": bound_np.tolist()},
            "tpu": {"feature_taps": 1, "mesh_fused_rows": fused,
                    "mesh_view_skip": skip},
        }
        mesher = Mesher(mcfg, cam, bound_np, spec, jnp.bfloat16)
        feats_in = (
            mesher.fuse_view_maps(kf_feats, kf_depths, kf_labels)
            if fused
            else kf_feats.astype(jnp.bfloat16)
        )
        q = mesher._query

        def run():
            o = q(params, qpts, poses, kf_valid, feats_in, kf_labels,
                  kf_depths, bound)
            return float(jnp.vdot(o[0], o[0]))

        run()  # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        s = min(ts) - TUNNEL_S
        print(f"{label:>20}: {s*1e3:8.1f} ms/chunk  "
              f"{B/s/1e6:6.2f} Mpts/s", flush=True)


if __name__ == "__main__":
    main()
