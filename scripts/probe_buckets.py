"""Decompose the two unexplained mapping-iteration buckets at the bench shape.

The round-3 profile (BASELINE.md) prices the FULL mapping iteration at
27.26 ms with two buckets that look over-priced relative to first-principles
row/bandwidth counts:

  - "2D feature rows"           3.8 ms/iter  (281k nearest-tap rows, bf16,
                                              should be ~1.1 ms at 4 ns/row)
  - "sampling + losses + Adam"  ~4.3 ms/iter (residual after encode/MLP/
                                              features/smoothness)

This probe times each sub-component in ISOLATION (own jit, 20-iter scan,
scalar sink) so the residual buckets get localized to named ops. Mirrors
mapper._build_loss_fn's exact shapes/sequence (slam/mapper.py:146-282) at
the bench workload (bench.py: T=4, n_pixels=2000, S=47, R=3, 680x1200).

Timing rules for the axon tunnel (PLAN.md): scan under one jit ending in a
float(scalar) fetch; FLOAT perturbation of an input per scan step (integer
perturbations constant-fold and let XLA hoist the body out of the scan).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_buckets.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dnsjax.config import load_config
from dnsjax.geometry.rays import (
    project_points,
    ray_box_far,
    rays_from_uv,
    world_to_camera,
)
from dnsjax.geometry.se3 import invert_se3
from dnsjax.models.decoder import DecoderSpec, init_decoder_params, mlp_apply
from dnsjax.models.features import match_features, nearest_sample
from dnsjax.ops.oneblob import oneblob_encode
from dnsjax.render.sampling import sample_along_rays
from dnsjax.slam.sampling import (
    class_sorted_pixels,
    sample_class_balanced_pixels,
    sample_uniform_pixels,
)
from dnsjax.losses.losses import (
    depth_l1_loss,
    freespace_opacity_loss,
    latent_distill_loss,
    photometric_loss,
    semantic_ce_loss,
)

# bench.py workload constants
H, W = 680, 1200
T = 4
N_PIXELS = 2000
N_SAMPLES, N_SURFACE = 32, 15
N_CLASS = 52
R = 3
ITERS = 20
TUNNEL_MS = 27.0

# --smoke: tiny shapes + 2 scan iters, CPU-runnable — validates the script
# end-to-end without a TPU (timings meaningless)
if "--smoke" in sys.argv:
    H, W = 68, 120
    N_PIXELS = 200
    ITERS = 2
    TUNNEL_MS = 0.0
    # the axon sitecustomize overrides the JAX_PLATFORMS env var; only the
    # in-process config update sticks (same pattern as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")

n_pix = N_PIXELS // T
n_uni = n_pix // 3 * 2
n_bal = n_pix // 3
n_ray = n_uni + n_bal          # 498
S = N_SAMPLES + N_SURFACE      # 47
P = n_ray * S                  # 23,406 pts per frame; x T x R = 281k rows
Hf, Wf = H // 2, W // 2


def timed(name, fn, *args):
    out = fn(*args)
    _ = float(out)
    reps = []
    for _i in range(3):
        t0 = time.perf_counter()
        _ = float(fn(*args))
        reps.append(time.perf_counter() - t0)
    ms = (min(reps) * 1e3 - TUNNEL_MS) / ITERS
    print(f"{name:46s} {ms:8.2f} ms/iter", flush=True)
    return ms


def scan_sink(body):
    """jit(scan(body over ITERS keys) -> scalar). body(key, *args) -> array."""

    def make(*args):
        keys = jax.random.split(jax.random.PRNGKey(7), ITERS)

        @jax.jit
        def run(*a):
            def step(c, k):
                o = body(k, *a)
                return c, jnp.vdot(o, o)

            _, outs = jax.lax.scan(step, 0.0, keys)
            return jnp.sum(outs)

        return lambda: run(*args)

    return make


def main():
    cfg = load_config("configs/replica/replica.yaml", "configs/slam.yaml")
    bound_np = np.asarray([[-2.9, 8.9], [-3.2, 5.5], [-3.5, 3.3]])
    bound = jnp.asarray(bound_np)
    spec = DecoderSpec.from_config(cfg, bound_np, N_CLASS)
    params = init_decoder_params(jax.random.PRNGKey(0), spec)

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)
    fx = W / 2.0
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    cam = dict(H=H, W=W, fx=fx, fy=fx, cx=cx, cy=cy)

    pts_w = jnp.asarray(
        rng.uniform(-1.0, 1.0, size=(T, P, 3)).astype(np.float32)
    )
    refer_w2c = jnp.broadcast_to(jnp.eye(4), (T, R, 4, 4))
    feats_half = jnp.asarray(
        rng.standard_normal((T, R, Hf, Wf, 64)).astype(np.float32)
    ).astype(jnp.bfloat16)

    # ---- bucket A: 2D feature rows (profiled 3.8 ms) -----------------------

    def gather_only(k, pw, w2c, fh):
        def one(pw_t, w2c_t, fh_t):
            pc = world_to_camera(pw_t + k[0] * 0.0, w2c_t)
            u, v, depth = project_points(pc, fx, fx, cx, cy)
            u, v = jnp.round(u), jnp.round(v)
            mask = (u > 0) & (u < W - 1) & (v > 0) & (v < H - 1) & (depth > 0)
            gx = u * ((Wf - 1.0) / (W - 1.0))
            gy = v * ((Hf - 1.0) / (H - 1.0))
            code = jax.vmap(nearest_sample)(fh_t, gx, gy)
            return code * mask[..., None]

        return jax.vmap(one)(pw, w2c, fh)

    timed("A1 project+mask+nearest gather (fwd)",
          scan_sink(gather_only)(pts_w, refer_w2c, feats_half))

    def match_full(k, pr, pw, w2c, fh):
        def one(pw_t, w2c_t, fh_t):
            return match_features(
                pr, pw_t + k[0] * 0.0, w2c_t, fh_t, cam, bound, spec,
                jnp.bfloat16, taps=1,
            )

        return jax.vmap(one)(pw, w2c, fh)

    timed("A2 match_features full (fwd)",
          scan_sink(match_full)(params, pts_w, refer_w2c, feats_half))

    def match_bwd(k, pr, pw, w2c, fh):
        def loss(pr_, pw_):
            def one(pw_t, w2c_t, fh_t):
                return match_features(
                    pr_, pw_t, w2c_t, fh_t, cam, bound, spec,
                    jnp.bfloat16, taps=1,
                )

            return jnp.sum(jax.vmap(one)(pw_, w2c, fh) ** 2)

        l, g = jax.value_and_grad(loss, argnums=(0, 1))(pr, pw + k[0] * 0.0)
        leaves = jax.tree_util.tree_leaves(g)
        return l + sum(jnp.vdot(x, x) for x in leaves)

    timed("A3 match_features fwd+grad(params,pts)",
          scan_sink(match_bwd)(params, pts_w, refer_w2c, feats_half))

    rel = jnp.asarray(rng.uniform(-1, 1, size=(T, R, P, 3)).astype(np.float32))

    def pe_only(k, rl):
        p01 = (rl + k[0] * 0.0 - bound[:, 0]) / (bound[:, 1] - bound[:, 0])
        return oneblob_encode(p01, spec.n_bins, spec.oneblob_kernel)

    timed("A4 oneblob PE alone (fwd, %dx%dx%d rows)" % (T, R, P),
          scan_sink(pe_only)(rel))

    merge_in = jnp.asarray(
        rng.standard_normal((T, R, P, spec.pe_dim + 64)).astype(np.float32)
    )

    def merge_only(k, pr, x):
        return jnp.mean(
            mlp_apply(pr["merge"], x + k[0] * 0.0, jnp.bfloat16), axis=1
        )

    timed("A5 merge MLP alone (fwd)", scan_sink(merge_only)(params, merge_in))

    # ---- bucket B: sampling + losses + Adam (~4.3 ms residual) -------------

    labels_np = rng.integers(0, N_CLASS, size=(T, H, W)).astype(np.int32)
    si, off = zip(*(class_sorted_pixels(l, N_CLASS) for l in labels_np))
    sorted_idx = jnp.stack([jnp.asarray(x) for x in si])
    offsets = jnp.stack([jnp.asarray(x) for x in off])
    colors = jnp.asarray(rng.uniform(size=(T, H, W, 3)).astype(np.float32))
    depths = jnp.asarray(
        rng.uniform(0.5, 5.0, size=(T, H, W)).astype(np.float32)
    )
    labels = jnp.asarray(labels_np)

    def pixels_only(k, si_, off_, cf, df, lf):
        def one(kk, t):
            k_u, k_b = jax.random.split(kk)
            pix_u = sample_uniform_pixels(k_u, n_uni, H, W)
            pix_b = sample_class_balanced_pixels(k_b, n_bal, si_[t], off_[t])
            pix = jnp.concatenate([pix_u, pix_b])
            gt_c = cf[t].reshape(-1, 3)[pix]
            gt_d = df[t].reshape(-1)[pix]
            gt_l = lf[t].reshape(-1)[pix]
            return gt_c.sum() + gt_d.sum() + gt_l.sum() + pix.sum()

        ks = jax.random.split(k, T)
        return jax.vmap(one)(ks, jnp.arange(T))

    timed("B1 pixel sampling + gt gathers (fwd)",
          scan_sink(pixels_only)(sorted_idx, offsets, colors, depths, labels))

    c2w = jnp.broadcast_to(jnp.eye(4), (T, 4, 4))
    pix0 = jnp.asarray(
        rng.integers(0, H * W, size=(T, n_ray)).astype(np.int32)
    )
    gt_d0 = jnp.asarray(
        rng.uniform(0.5, 5.0, size=(T, n_ray)).astype(np.float32)
    )

    def rays_z_pts(k, pix, gtd, c2w_):
        def one(kk, pix_t, gtd_t, c2w_t):
            i = (pix_t % W).astype(jnp.float32)
            j = (pix_t // W).astype(jnp.float32)
            ro, rd = rays_from_uv(i, j, c2w_t, fx, fx, cx, cy)
            far = ray_box_far(ro, rd, bound) + 0.01
            z = sample_along_rays(kk, gtd_t + k[0] * 0.0, N_SAMPLES,
                                  N_SURFACE, far)
            pts = ro[:, None, :] + rd[:, None, :] * z[:, :, None]
            return pts.sum() + z.sum()

        ks = jax.random.split(k, T)
        return jax.vmap(one)(ks, pix, gtd, c2w_)

    timed("B2 ray gen + z sampling + pts (fwd)",
          scan_sink(rays_z_pts)(pix0, gt_d0, c2w))

    # z ordering backends (values bit-identical; see render/sampling.py):
    # the 47-wide per-ray sort is a bitonic network with lane shuffles on
    # TPU — the merge replaces it with comparison-count + one-hot placement
    from dnsjax.render import sampling as _S

    far0 = jnp.asarray(
        rng.uniform(3.0, 8.0, size=(T, n_ray)).astype(np.float32)
    )
    for backend in ("sort", "merge"):
        _S.Z_BACKEND = backend

        def z_only(k, gtd, far):
            def one(kk, gtd_t, far_t):
                return _S.sample_along_rays(
                    kk, gtd_t + k[0] * 0.0, N_SAMPLES, N_SURFACE, far_t
                )

            ks = jax.random.split(k, T)
            return jax.vmap(one)(ks, gtd, far)

        timed(f"B2z z sampling alone [{backend}]",
              scan_sink(z_only)(gt_d0, far0))
    _S.Z_BACKEND = "sort"

    # losses at the post-render shapes, fwd + grad wrt rendered tensors
    N = T * n_ray
    h1 = spec.hidden_dim + 1
    outs = dict(
        color=jnp.asarray(rng.uniform(size=(N, 3)).astype(np.float32)),
        depth=jnp.asarray(rng.uniform(0.5, 5, size=(N,)).astype(np.float32)),
        logits=jnp.asarray(
            rng.standard_normal((N, N_CLASS)).astype(np.float32)
        ),
        fine=jnp.asarray(
            rng.standard_normal((N, S, h1)).astype(np.float32)
        ),
        coarse=jnp.asarray(
            rng.standard_normal((N, S, h1)).astype(np.float32)
        ),
    )
    z0 = jnp.asarray(
        np.sort(rng.uniform(0.3, 6, size=(N, S)).astype(np.float32), axis=1)
    )
    gt_c = jnp.asarray(rng.uniform(size=(N, 3)).astype(np.float32))
    gt_dN = jnp.asarray(rng.uniform(0.5, 5, size=(N,)).astype(np.float32))
    gt_lN = jnp.asarray(rng.integers(0, N_CLASS, size=(N,)).astype(np.int32))
    maskN = jnp.ones((N,), bool)

    def losses_all(k, o, z, gc, gd, gl):
        def loss(o_):
            p = photometric_loss(gc, o_["color"] + k[0] * 0.0, maskN)
            d = depth_l1_loss(gd, o_["depth"], maskN)
            l = semantic_ce_loss(gl, o_["logits"], maskN)
            lt = latent_distill_loss(o_["coarse"], o_["fine"],
                                     maskN[:, None, None])
            fs, op = freespace_opacity_loss(z, gd, o_["fine"][..., 0], maskN)
            return 5.0 * p + 5.0 * d + 0.1 * l + 10.0 * lt + 10.0 * fs + 10.0 * op

        l, g = jax.value_and_grad(loss)(o)
        return l + sum(jnp.vdot(x, x) for x in jax.tree_util.tree_leaves(g))

    timed("B3 6 ray losses fwd+grad(rendered)",
          scan_sink(losses_all)(outs, z0, gt_c, gt_dN, gt_lN))

    # Adam: multi_transform update on the real opt_params pytree, grads given
    quads = jnp.broadcast_to(jnp.asarray([1.0, 0, 0, 0]), (T, 4))
    Ts = jnp.zeros((T, 3))
    opt_params = (params, quads, Ts)
    opt = optax.multi_transform(
        {"net": optax.adam(5e-3), "pose": optax.adam(5e-4)},
        ("net", "pose", "pose"),
    )
    opt_state0 = opt.init(opt_params)
    grads0 = jax.tree_util.tree_map(lambda x: x * 1e-3, opt_params)

    keys20 = jax.random.split(jax.random.PRNGKey(7), ITERS)

    @jax.jit
    def adam_run(op_, os_, g_):
        def step(carry, k):
            op, os_i = carry
            g = jax.tree_util.tree_map(lambda x: x + k[0] * 0.0, g_)
            updates, os_i = opt.update(g, os_i)
            op = optax.apply_updates(op, updates)
            return (op, os_i), 0.0

        (op, _), _ = jax.lax.scan(step, (op_, os_), keys20)
        return sum(
            jnp.vdot(x, x) for x in jax.tree_util.tree_leaves(op)
        )

    timed("B4 Adam update alone (multi_transform)",
          lambda: adam_run(opt_params, opt_state0, grads0))


if __name__ == "__main__":
    main()
