"""Ablation profile of the mapping iteration at the bench workload shape.

Times progressively-complete slices of the keystep on the real TPU (each as
a 20-iteration lax.scan under one jit, ending in a scalar sink per the axon
timing rules: block_until_ready is a no-op through the tunnel and partial
fetches pull whole buffers, so every timing ends in float(scalar)).

Run: python scripts/profile_map.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from dnsjax.models.decoder import DecoderSpec, init_decoder_params, pos_encode
from dnsjax.models.features import match_features
from dnsjax.ops.hashgrid import HashGridSpec, hash_encode
from dnsjax.render.pipeline import render_fine
from dnsjax.slam.mapper import MapConfig, _build_loss_fn, smoothness_grid_occ

H, W = 680, 1200
N_TARGET = 4
N_PIXELS = 2000
N_SAMPLES, N_SURFACE = 32, 15
N_CLASS = 52
ITERS = 20
TUNNEL_MS = 27.0  # measured axon round-trip floor


def timed(name, fn, *args):
    out = fn(*args)
    _ = float(out)  # compile + warm
    reps = []
    for _i in range(3):
        t0 = time.perf_counter()
        _ = float(fn(*args))
        reps.append(time.perf_counter() - t0)
    ms = (min(reps) * 1e3 - TUNNEL_MS) / ITERS
    print(f"{name:42s} {ms:8.2f} ms/iter")
    return ms


def main():
    fx = W / 2.0
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    bound = jnp.asarray([[-2.9, 8.9], [-3.2, 5.5], [-3.5, 3.3]])
    dim_max = float((bound[:, 1] - bound[:, 0]).max())
    import sys
    interp = sys.argv[1] if len(sys.argv) > 1 else "tet"
    scatter = sys.argv[2] if len(sys.argv) > 2 else "xla"
    gather = sys.argv[3] if len(sys.argv) > 3 else "xla"
    spec = DecoderSpec(
        n_class=N_CLASS,
        grid=HashGridSpec(4, 8, 16, 16, int(dim_max / 0.02), grad_corners=1,
                          gather_bf16=True, interp=interp, scatter=scatter,
                          gather=gather),
        n_bins=16,
    )
    print(f"profile: interp={interp} scatter={scatter} gather={gather}")
    params = init_decoder_params(jax.random.PRNGKey(0), spec)
    mcfg = MapConfig(
        H=H, W=W, fx=fx, fy=fx, cx=cx, cy=cy,
        n_pixels=N_PIXELS, n_samples=N_SAMPLES, n_surface=N_SURFACE,
        smooth_pts=33, feature_taps=1,
    )
    T = N_TARGET
    n_ray = (N_PIXELS // T // 3 * 2 + N_PIXELS // T // 3) * T
    S = N_SAMPLES + N_SURFACE
    NP_ = n_ray * S
    print(f"rays={n_ray} samples/ray={S} points={NP_}")

    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(key, (n_ray, S, 3), minval=-2.0, maxval=2.0)
    p01 = jax.random.uniform(key, (NP_, 3))
    z = jnp.sort(jax.random.uniform(key, (n_ray, S), minval=0.1, maxval=5.0), -1)
    rays_d = jax.random.normal(key, (n_ray, 3))
    classes = jax.random.randint(key, (n_ray,), 0, N_CLASS)
    code = jnp.zeros((n_ray, S, 32))
    keys20 = jax.random.split(key, ITERS)

    def scan_sink(body):
        @jax.jit
        def run(*args):
            def step(c, k):
                return c, body(k, *args)
            _, outs = jax.lax.scan(step, 0, keys20)
            return jnp.vdot(outs, outs)
        return run

    # 1. hash encode forward
    table = params["table"]
    run = scan_sink(lambda k, t, p: jnp.sum(hash_encode(t, p + k[0] * 0.0, spec.grid) ** 2))
    timed("hash_encode fwd (94k pts)", run, table, p01)

    # 2. hash encode fwd+bwd (grad wrt table + pts)
    def enc_loss(t, p):
        return jnp.sum(hash_encode(t, p, spec.grid) ** 2)
    def enc_bwd(k, t, p):
        l, g = jax.value_and_grad(enc_loss, argnums=(0, 1))(t, p + k[0] * 0.0)
        return l + jnp.vdot(g[0], g[0]) + jnp.vdot(g[1], g[1])
    run = scan_sink(enc_bwd)
    timed("hash_encode fwd+bwd", run, table, p01)

    # 3. oneblob half of pos_encode, fwd. Only the perturbed pe output is
    # summed so DCE drops the grid half (measured separately above). NOTE:
    # an earlier version also summed an UNPERTURBED grid term assuming XLA
    # would hoist it out of the scan — it does not reliably, which made
    # this slice read ~2.8 ms/iter of grid work misattributed to the
    # oneblob (isolated oneblob at this shape is ~0 ms, old and flat
    # formulations alike).
    run = scan_sink(
        lambda k, pr, p: jnp.sum(pos_encode(pr, p + k[0] * 0.0, spec)[0] ** 2)
    )
    timed("pos_encode oneblob fwd", run, params, p01)

    # 4. render_fine fwd
    def rf(pr, pts_):
        out = render_fine(pr, spec, pts_, z, rays_d, classes, code, bound)
        return jnp.sum(out.color ** 2) + jnp.sum(out.depth ** 2)
    run = scan_sink(lambda k, pr, pts_: rf(pr, pts_ + k[0] * 0.0))
    timed("render_fine fwd", run, params, pts)

    # 5. render_fine fwd+bwd
    def rf_bwd(k, pr, pts_):
        l, g = jax.value_and_grad(rf, argnums=(0, 1))(pr, pts_ + k[0] * 0.0)
        gsum = sum(jnp.vdot(x, x) for x in jax.tree_util.tree_leaves(g))
        return l + gsum
    run = scan_sink(rf_bwd)
    timed("render_fine fwd+bwd", run, params, pts)

    # 6. feature matching fwd (3 views)
    feats = jax.random.normal(key, (3, H // 2, W // 2, 64), jnp.float32)
    w2c = jnp.tile(jnp.eye(4), (3, 1, 1))
    def fm(pr, pts_):
        c = match_features(pr, pts_.reshape(-1, 3), w2c, feats, mcfg.cam,
                           bound, spec, jnp.bfloat16, taps=1)
        return jnp.sum(c ** 2)
    run = scan_sink(lambda k, pr, pts_: fm(pr, pts_ + k[0] * 0.0))
    timed("match_features fwd (3 views)", run, params, pts)
    def fm_bwd(k, pr, pts_):
        l, g = jax.value_and_grad(fm, argnums=(0, 1))(pr, pts_ + k[0] * 0.0)
        gsum = sum(jnp.vdot(x, x) for x in jax.tree_util.tree_leaves(g))
        return l + gsum
    run = scan_sink(fm_bwd)
    timed("match_features fwd+bwd", run, params, pts)

    # 7. smoothness grid occ (33^3 = 36k pts, encode + coarse)
    def sm(pr, k):
        occ = smoothness_grid_occ(pr, spec, bound, k, mcfg, jnp.bfloat16)
        return jnp.sum(occ ** 2)
    def sm_bwd(k, pr):
        l, g = jax.value_and_grad(sm)(pr, k)
        gsum = sum(jnp.vdot(x, x) for x in jax.tree_util.tree_leaves(g))
        return l + gsum
    run = scan_sink(sm_bwd)
    timed("smoothness fwd+bwd (36k pts)", run, params)

    # 8. full loss fwd+bwd (sampling + features + render + 7 losses)
    loss_fn = _build_loss_fn(spec, mcfg, T, jnp.bfloat16)
    rng = np.random.default_rng(0)
    colors = jnp.asarray(rng.uniform(size=(T, H, W, 3)).astype(np.float32))
    depths = jnp.asarray(rng.uniform(0.5, 5.0, size=(T, H, W)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, N_CLASS, size=(T, H, W)).astype(np.int32))
    from dnsjax.slam.sampling import class_sorted_pixels
    si, off = zip(*(class_sorted_pixels(np.asarray(l), N_CLASS) for l in labels))
    est = jnp.tile(jnp.eye(4), (T, 1, 1))
    feats4 = jax.random.normal(key, (T, 3, H // 2, W // 2, 64), jnp.float32)
    window = {
        "colors": colors, "depths": depths, "labels": labels,
        "sorted_idx": jnp.stack([jnp.asarray(x) for x in si]),
        "offsets": jnp.stack([jnp.asarray(x) for x in off]),
        "refer_feats": feats4,
        "refer_fixed_c2w": jnp.broadcast_to(est[:, None], (T, 3, 4, 4)),
        "refer_src": jnp.full((T, 3), -1, jnp.int32),
        "pose_train": jnp.ones(T),
        "bound": bound,
        "lt_gate_iter": jnp.asarray(-1, jnp.int32),
    }
    from dnsjax.geometry.se3 import tensor_from_camera
    t7 = tensor_from_camera(est)
    quads, Ts = t7[:, :4], t7[:, 4:]

    def full(k, pr, q, tt, win):
        (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
            (pr, q, tt), k, jnp.asarray(0), win
        )
        gsum = sum(jnp.vdot(x, x) for x in jax.tree_util.tree_leaves(g))
        return l + gsum
    run = scan_sink(full)
    timed("FULL loss fwd+bwd", run, params, quads, Ts, window)


if __name__ == "__main__":
    main()
