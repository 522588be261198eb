"""Bisect the mesh dense-grid query cost (all-visible bench shape).

The round-3 bench reads 4.62 Mpts/s all-visible (target >= 5, VERDICT r3
weak #6). This probe splits the 131072-pt x 16-kf fused query into its two
halves and times candidate variants of the expensive one:

  full       : the production Mesher._query (fused rows, view_skip on)
  scan-only  : the per-view scan (project + row gather + merge MLP), no tail
  tail-only  : pos_encode (hashgrid) + fine + out MLPs, no view scan
  unroll4    : scan-only with lax.scan(unroll=4)
  batchK     : per-view work vectorized over K (one gather + one matmul,
               no scan, no skip cond)

Timing discipline (PLAN.md "Timing on this infrastructure"): scalar sink,
min of 3, fresh values each call are NOT needed (no grads, no constant
folding risk: inputs are device arrays passed as args).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_mesh_bisect.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from dnsjax.config import load_config
from dnsjax.geometry.rays import project_points, world_to_camera
from dnsjax.geometry.se3 import invert_se3
from dnsjax.mesh.mesher import Mesher
from dnsjax.models.decoder import (
    DecoderSpec,
    init_decoder_params,
    merge_apply,
    out_apply,
    pos_encode,
    fine_apply,
)
from dnsjax.models.features import nearest_sample

H, W = 680, 1200
B, K = 131072, 16
N_CLASS = 52


def _min3(fn):
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    bound_np = np.asarray([[-2.9, 8.9], [-3.2, 5.5], [-3.5, 3.3]])
    bound = jnp.asarray(bound_np)
    cfg = load_config("configs/replica/replica.yaml", "configs/slam.yaml")
    spec = DecoderSpec.from_config(cfg, bound_np, N_CLASS)
    params = init_decoder_params(jax.random.PRNGKey(0), spec)
    fx = W / 2.0
    cam = dict(H=H, W=W, fx=fx, fy=fx, cx=(W - 1) / 2.0, cy=(H - 1) / 2.0)
    cdt = jnp.bfloat16

    pts = jnp.asarray(rng.uniform(-2.0, 3.0, size=(B, 3)).astype(np.float32))
    kf_c2w = jnp.tile(jnp.eye(4), (K, 1, 1))
    kf_valid = jnp.ones(K, bool)
    kf_feats = jnp.asarray(
        rng.normal(size=(K, H // 2, W // 2, 64)).astype(np.float32)
    )
    kf_labels = jnp.asarray(rng.integers(0, N_CLASS, size=(K, H, W)), jnp.int32)
    kf_depths = jnp.asarray(
        rng.uniform(0.5, 5.0, size=(K, H, W)).astype(np.float32)
    )

    mcfg = {
        "meshing": {"resolution": 256, "points_batch_size": B,
                    "level_set": 0.0, "clean_mesh": False,
                    "depth_test": True},
        "back_end": {"bound": bound_np.tolist(),
                     "marching_cubes_bound": bound_np.tolist()},
        "tpu": {"feature_taps": 1, "mesh_fused_rows": True,
                "mesh_view_skip": True},
        "model": dict(cfg["model"]),
        "scale": 1,
    }
    mesher = Mesher(mcfg, cam, bound_np, spec, compute_dtype=cdt)
    fused = mesher.fuse_view_maps(kf_feats, kf_depths, kf_labels)

    h = spec.hidden_dim

    # ---- variants ----------------------------------------------------
    def scan_body_factory(unroll):
        def scan_only(params, pts, kf_c2w, kf_valid, fused):
            def kf_step(carry, inputs):
                c2w, valid, feats = inputs
                code_sum, count = carry
                w2c = invert_se3(c2w)
                pc = world_to_camera(pts, w2c[None])[0]
                u, v, d = project_points(
                    pc, cam["fx"], cam["fy"], cam["cx"], cam["cy"]
                )
                u = jnp.round(u)
                v = jnp.round(v)
                seen = (
                    (u > 0) & (u < cam["W"] - 1)
                    & (v > 0) & (v < cam["H"] - 1)
                    & (d > 0) & valid
                )
                Hf, Wf = feats.shape[0], feats.shape[1]
                gx = u * ((Wf - 1.0) / (cam["W"] - 1.0))
                gy = v * ((Hf - 1.0) / (cam["H"] - 1.0))
                row = nearest_sample(feats, gx, gy)
                code = row[:, :-2]
                kf_d = row[:, -2].astype(jnp.float32)
                dtest = seen & ((kf_d <= 0) | (d <= kf_d + 0.5))
                trunc = (d > kf_d * 0.95) & (d < kf_d * 1.05) & (kf_d > 0)
                code = code * (dtest & trunc)[:, None]
                rel = pts - c2w[:3, 3]
                merged = merge_apply(params, rel[None], code[None], bound,
                                     spec, cdt)
                code_sum = code_sum + merged * dtest[:, None]
                count = count + dtest.astype(jnp.float32)
                return (code_sum, count), None

            init = (jnp.zeros((B, h)), jnp.zeros((B,)))
            (code_sum, count), _ = jax.lax.scan(
                kf_step, init, (kf_c2w, kf_valid, fused), unroll=unroll
            )
            return code_sum / jnp.maximum(count, 1.0)[:, None]

        return jax.jit(scan_only)

    def batch_k(params, pts, kf_c2w, kf_valid, fused):
        w2c = jax.vmap(invert_se3)(kf_c2w)  # (K,4,4)
        pc = world_to_camera(pts, w2c)  # (K,B,3)
        u, v, d = project_points(
            pc, cam["fx"], cam["fy"], cam["cx"], cam["cy"]
        )
        u = jnp.round(u)
        v = jnp.round(v)
        seen = (
            (u > 0) & (u < cam["W"] - 1)
            & (v > 0) & (v < cam["H"] - 1)
            & (d > 0) & kf_valid[:, None]
        )
        Hf, Wf = fused.shape[1], fused.shape[2]
        gx = u * ((Wf - 1.0) / (cam["W"] - 1.0))
        gy = v * ((Hf - 1.0) / (cam["H"] - 1.0))
        row = jax.vmap(nearest_sample)(fused, gx, gy)  # (K,B,66)
        code = row[..., :-2]
        kf_d = row[..., -2].astype(jnp.float32)
        dtest = seen & ((kf_d <= 0) | (d <= kf_d + 0.5))
        trunc = (d > kf_d * 0.95) & (d < kf_d * 1.05) & (kf_d > 0)
        code = code * (dtest & trunc)[..., None]
        rel = pts[None] - kf_c2w[:, None, :3, 3]  # (K,B,3)
        merged = merge_apply(params, rel, code, bound, spec, cdt)  # (B,h)
        # merge_apply means over the view axis; re-weight by seen count
        count = jnp.sum(dtest.astype(jnp.float32), axis=0)
        return merged * (K / jnp.maximum(count, 1.0))[:, None]

    batch_k = jax.jit(batch_k)

    def tail_only(params, pts, code):
        p01 = (pts - bound[:, 0]) / (bound[:, 1] - bound[:, 0])
        in_bound = jnp.all((p01 >= 0) & (p01 <= 1), axis=-1)
        pe, grid = pos_encode(params, jnp.clip(p01, 0, 1), spec)
        label = jnp.zeros((B,), jnp.int32)
        lat = fine_apply(params, label, pe[:, None, :], grid[:, None, :],
                         cdt)[:, 0]
        occ = jnp.where(in_bound, lat[:, 0], -100.0)
        color, _ = out_apply(
            params, pe, jnp.concatenate([lat[:, 1:], code], -1), cdt
        )
        return occ, color

    tail_only = jax.jit(tail_only)

    code0 = jnp.zeros((B, h))

    # ---- timings -----------------------------------------------------
    q = mesher._query

    def run_full():
        o = q(params, pts, kf_c2w, kf_valid, fused, kf_labels, kf_depths,
              bound)
        _ = float(jnp.vdot(o[0], o[0]))

    scan1 = scan_body_factory(1)
    scan4 = scan_body_factory(4)

    def mk(fn, *args):
        def run():
            o = fn(*args)
            lead = o[0] if isinstance(o, tuple) else o
            _ = float(jnp.vdot(lead, lead))
        return run

    cases = [
        ("full (production)", run_full),
        ("scan-only u1", mk(scan1, params, pts, kf_c2w, kf_valid, fused)),
        ("scan-only u4", mk(scan4, params, pts, kf_c2w, kf_valid, fused)),
        ("batchK", mk(batch_k, params, pts, kf_c2w, kf_valid, fused)),
        ("tail-only", mk(tail_only, params, pts, code0)),
    ]
    for label, run in cases:
        run()  # compile + warm
        s = _min3(run)
        print(f"{label:22s} {s*1e3:8.2f} ms  {B/s/1e6:6.2f} Mpts/s")


if __name__ == "__main__":
    main()
