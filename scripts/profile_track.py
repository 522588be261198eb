"""Ablation profile of the tracking iteration at the bench workload shape
(50 iters x 500 rays x 47 samples; reference: slams/tracking.py:313-340).

Same timing discipline as profile_map.py: every slice is a 20-iteration
lax.scan under one jit ending in float(scalar) (the axon tunnel makes
block_until_ready a no-op and partial fetches pull whole buffers).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_track.py
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dnsjax.models.decoder import (
    DecoderSpec, init_decoder_params, pos_encode, merge_apply,
)
from dnsjax.models.features import match_features
from dnsjax.ops.hashgrid import HashGridSpec, hash_encode
from dnsjax.ops.oneblob import oneblob_encode
from dnsjax.render.pipeline import render_coarse
from dnsjax.slam.tracker import TrackConfig, make_track_fn

H, W = 680, 1200
N_RAY = 500
N_SAMPLES, N_SURFACE = 32, 15
N_CLASS = 52
ITERS = 20
TUNNEL_MS = 27.0


def timed(name, fn, *args):
    out = fn(*args)
    _ = float(out)
    reps = []
    for _i in range(3):
        t0 = time.perf_counter()
        _ = float(fn(*args))
        reps.append(time.perf_counter() - t0)
    ms = (min(reps) * 1e3 - TUNNEL_MS) / ITERS
    print(f"{name:44s} {ms:8.2f} ms/iter")
    return ms


def main(interp="trilinear", n_levels=4, level_dim=8, oneblob_kernel="gaussian",
         n_ray=N_RAY, n_samples=N_SAMPLES, lm_only=False, lm_iters=10):
    fx = W / 2.0
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    bound = jnp.asarray([[-2.9, 8.9], [-3.2, 5.5], [-3.5, 3.3]])
    dim_max = float((bound[:, 1] - bound[:, 0]).max())
    spec = DecoderSpec(
        n_class=N_CLASS,
        grid=HashGridSpec(n_levels, level_dim, 16, 16, int(dim_max / 0.02),
                          grad_corners=1, gather_bf16=True, interp=interp),
        n_bins=16,
        oneblob_kernel=oneblob_kernel,
    )
    params = init_decoder_params(jax.random.PRNGKey(0), spec)
    S = n_samples + N_SURFACE
    NP_ = n_ray * S
    print(f"profile: interp={interp} {n_levels}x{level_dim} "
          f"oneblob={oneblob_kernel}  rays={n_ray} pts={NP_}")

    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(key, (n_ray, S, 3), minval=-2.0, maxval=2.0)
    p01 = jax.random.uniform(key, (NP_, 3))
    z = jnp.sort(jax.random.uniform(key, (n_ray, S), minval=0.1, maxval=5.0), -1)
    rays_d = jax.random.normal(key, (n_ray, 3))
    code = jnp.zeros((n_ray, S, 32))
    keys20 = jax.random.split(key, ITERS)

    if lm_only:
        _full_frames(spec, bound, fx, cx, cy, n_ray, n_samples, adam=False,
                     lm_iters=lm_iters)
        return

    def scan_sink(body):
        @jax.jit
        def run(*args):
            def step(c, k):
                return c, body(k, *args)
            _, outs = jax.lax.scan(step, 0, keys20)
            return jnp.vdot(outs, outs)
        return run

    # oneblob alone (the 3x per-iter cost center: pos PE + 2 merge rel-PEs)
    run = scan_sink(
        lambda k, p: jnp.sum(
            oneblob_encode(p + k[0] * 0.0, 16, oneblob_kernel) ** 2
        )
    )
    timed("oneblob fwd (23.5k pts)", run, p01)

    # hash encode fwd, then fwd + POSITION backward (tracking never takes
    # table grads: the map is frozen, only the pose moves)
    table = params["table"]
    run = scan_sink(
        lambda k, t, p: jnp.sum(hash_encode(t, p + k[0] * 0.0, spec.grid) ** 2)
    )
    timed("hash_encode fwd", run, table, p01)

    def enc_pos_loss(p, t):
        return jnp.sum(hash_encode(t, p, spec.grid) ** 2)
    def enc_bwd(k, t, p):
        l, g = jax.value_and_grad(enc_pos_loss)(p + k[0] * 0.0, t)
        return l + jnp.vdot(g, g)
    run = scan_sink(enc_bwd)
    timed("hash_encode fwd + pos-bwd", run, table, p01)

    # feature matching, 2 views (refer + current), fwd + pose-relevant bwd
    feats = jax.random.normal(key, (2, H // 2, W // 2, 64), jnp.bfloat16)
    w2c = jnp.tile(jnp.eye(4), (2, 1, 1))
    cam = dict(H=H, W=W, fx=fx, fy=fx, cx=cx, cy=cy)

    def fm(pts_):
        c = match_features(params, pts_.reshape(-1, 3), w2c, feats, cam,
                           bound, spec, jnp.bfloat16, taps=1)
        return jnp.sum(c.astype(jnp.float32) ** 2)
    def fm_bwd(k, pts_):
        l, g = jax.value_and_grad(fm)(pts_ + k[0] * 0.0)
        return l + jnp.vdot(g, g)
    run = scan_sink(fm_bwd)
    timed("match_features 2 views fwd+bwd", run, pts)

    # coarse render fwd + pose backward (grads wrt pts/z/rays_d only)
    def rc(pts_, z_, rd_):
        out = render_coarse(params, spec, pts_, z_, rd_, code, bound,
                            jnp.bfloat16)
        return jnp.sum(out.color ** 2) + jnp.sum(out.depth ** 2)
    def rc_bwd(k, pts_):
        l, g = jax.value_and_grad(rc)(pts_ + k[0] * 0.0, z, rays_d)
        return l + jnp.vdot(g, g)
    run = scan_sink(rc_bwd)
    timed("render_coarse fwd+bwd(pts)", run, pts)

    _full_frames(spec, bound, fx, cx, cy, n_ray, n_samples, adam=True,
                 lm_iters=lm_iters)


def _full_frames(spec, bound, fx, cx, cy, n_ray, n_samples, adam=True,
                 lm_iters=10):
    """FULL tracking frames (Adam 50-iter schedule and LM 10-iter) at
    n_ray x (n_samples + N_SURFACE) — ms/frame and FPS."""
    import dataclasses

    params = init_decoder_params(jax.random.PRNGKey(0), spec)
    tcfg = TrackConfig(
        H=H, W=W, fx=fx, fy=fx, cx=cx, cy=cy,
        n_iters=50, n_pixels=n_ray, n_samples=n_samples, n_surface=N_SURFACE,
        ignore_edge=20, feature_taps=1,
    )
    rng = np.random.default_rng(0)
    color = jnp.asarray(rng.uniform(size=(H, W, 3)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(0.5, 5.0, size=(H, W)).astype(np.float32))
    label = jnp.asarray(rng.integers(0, N_CLASS, size=(H, W)), jnp.int32)
    from dnsjax.geometry.se3 import tensor_from_camera

    t7 = tensor_from_camera(jnp.eye(4)[None])[0]
    efeats = jnp.asarray(
        rng.normal(size=(2, H // 2, W // 2, 64)).astype(np.float32)
    )

    def time_frames(track_fn, label_):
        o = track_fn(params, efeats, jnp.eye(4), color, depth, label,
                     t7[:4], t7[4:], bound, jax.random.PRNGKey(0))
        _ = float(o[2]["best_loss"])
        reps = []
        for i in range(3):
            t0 = time.perf_counter()
            o = track_fn(params, efeats, jnp.eye(4), color, depth, label,
                         t7[:4], t7[4:], bound, jax.random.PRNGKey(i + 1))
            _ = float(o[2]["best_loss"])
            reps.append(time.perf_counter() - t0)
        frame_s = min(reps) - TUNNEL_MS / 1e3
        print(f"{label_:44s} {frame_s * 1e3:8.1f} ms "
              f"= {1.0 / frame_s:.2f} FPS")

    if adam:
        time_frames(make_track_fn(spec, tcfg),
                    f"FULL track frame (50 iters, {n_ray}px)")
    track_lm = make_track_fn(spec, dataclasses.replace(tcfg, method="lm",
                                                       lm_iters=lm_iters))
    time_frames(track_lm,
                f"FULL LM track frame ({lm_iters} iters, {n_ray}px)")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--interp", default="trilinear")
    ap.add_argument("--levels", type=int, default=4)
    ap.add_argument("--dim", type=int, default=8)
    ap.add_argument("--oneblob", default="gaussian")
    ap.add_argument("--pixels", type=int, default=N_RAY,
                    help="tracking rays per iteration (tracking.n_pixels)")
    ap.add_argument("--samples", type=int, default=N_SAMPLES,
                    help="stratified samples per ray (n_surface fixed at 15)")
    ap.add_argument("--lm-iters", type=int, default=10,
                    help="damped GN steps per LM frame (tracking.lm_iters)")
    ap.add_argument("--lm-only", action="store_true",
                    help="skip component slices + Adam frame; time only the "
                         "LM frame (fast adoption measurements)")
    a = ap.parse_args()
    main(a.interp, a.levels, a.dim, a.oneblob,
         n_ray=a.pixels, n_samples=a.samples, lm_only=a.lm_only,
         lm_iters=a.lm_iters)
