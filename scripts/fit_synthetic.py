"""Canonical verification drive: fit the synthetic wall scene end-to-end on
the current backend and report PSNR / depth L1 / semantic accuracy.

This is the .claude/skills/verify "canonical drive" as one command: build a
decoder, render the synthetic scene's rays with render_fine, optimize with
Adam under one jitted scan, and check convergence + edge-case finiteness.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/fit_synthetic.py
Expect (TPU profile, tet4x8 bf16): PSNR > 35 dB, depth L1 < 1 cm, semantic
acc ~= 1.0 in ~1200 iters of 512 rays.
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dnsjax.data.synthetic import SyntheticDataset, synthetic_config
from dnsjax.geometry.rays import rays_from_uv, ray_box_far
from dnsjax.geometry.se3 import invert_se3
from dnsjax.models.decoder import DecoderSpec, init_decoder_params
from dnsjax.models.encoder import init_encoder_params, encode_images
from dnsjax.ops.hashgrid import HashGridSpec
from dnsjax.render.pipeline import render_fine
from dnsjax.render.sampling import sample_along_rays
from dnsjax.slam.sampling import sample_uniform_pixels


def main(iters=1200, n_rays=512):
    H, W = 120, 160
    cfg = synthetic_config(H=H, W=W, n_frames=2)
    ds = SyntheticDataset(cfg)
    f = ds[0]
    color = jnp.asarray(f["color"])
    depth = jnp.asarray(f["depth"])
    label = jnp.asarray(f["label"])
    c2w = jnp.asarray(f["c2w"])
    bound = jnp.asarray([[-2.2, 2.2], [-2.2, 2.2], [-2.2, 2.2]])

    spec = DecoderSpec(
        n_class=ds.n_class,
        grid=HashGridSpec(4, 8, 14, 16, 110, grad_corners=1,
                          gather_bf16=True, interp="tet"),
        n_bins=16,
    )
    params = init_decoder_params(jax.random.PRNGKey(0), spec)
    enc = init_encoder_params(0)
    feats = encode_images(enc, jnp.stack([color, color, color])[None])[0]
    w2c = invert_se3(jnp.stack([c2w] * 3))
    opt = optax.adam(5e-3)

    colorf = color.reshape(-1, 3)
    depthf = depth.reshape(-1)
    labelf = label.reshape(-1)

    def loss_fn(params, key):
        k_pix, k_z = jax.random.split(key)
        pix = sample_uniform_pixels(k_pix, n_rays, H, W)
        gt_c, gt_d, gt_l = colorf[pix], depthf[pix], labelf[pix]
        i = (pix % W).astype(jnp.float32)
        j = (pix // W).astype(jnp.float32)
        ro, rd = rays_from_uv(i, j, c2w, ds.fx, ds.fy, ds.cx, ds.cy)
        far = ray_box_far(ro, rd, bound) + 0.01
        z = sample_along_rays(k_z, gt_d, 24, 11, far)
        pts = ro[:, None, :] + rd[:, None, :] * z[:, :, None]

        from dnsjax.models.features import match_features

        S = z.shape[1]
        code = match_features(
            params, pts.reshape(-1, 3), w2c, feats,
            dict(H=H, W=W, fx=ds.fx, fy=ds.fy, cx=ds.cx, cy=ds.cy),
            bound, spec, jnp.bfloat16, taps=1,
        ).reshape(n_rays, S, -1)
        trunc = (z > gt_d[:, None] * 0.95) & (z < gt_d[:, None] * 1.05)
        code = code * (trunc & (gt_d[:, None] > 0))[..., None]

        out = render_fine(params, spec, pts, z, rd, gt_l, code, bound)
        mask = gt_d > 0.01
        mse = jnp.sum(((out.color - gt_c) ** 2).mean(-1) * mask) / mask.sum()
        dl1 = jnp.sum(jnp.abs(out.depth - gt_d) * mask) / mask.sum()
        ce = optax.softmax_cross_entropy_with_integer_labels(
            out.logits, gt_l
        )
        ce = jnp.sum(ce * mask) / mask.sum()
        acc = jnp.sum((jnp.argmax(out.logits, -1) == gt_l) * mask) / mask.sum()
        loss = 5.0 * mse + 5.0 * dl1 + 0.1 * ce
        return loss, (mse, dl1, acc)

    @jax.jit
    def fit(params, key):
        opt_state = opt.init(params)

        def step(carry, k):
            params, opt_state = carry
            (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(params, k)
            up, opt_state = opt.update(g, opt_state)
            return (optax.apply_updates(params, up), opt_state), (l,) + aux

        keys = jax.random.split(key, iters)
        (params, _), hist = jax.lax.scan(step, (params, opt.init(params)), keys)
        return params, hist

    t0 = time.perf_counter()
    params, (losses, mses, dl1s, accs) = fit(params, jax.random.PRNGKey(1))
    mse = float(mses[-10:].mean())
    psnr = -10.0 * np.log10(mse)
    dl1_cm = float(dl1s[-10:].mean()) * 100
    acc = float(accs[-10:].mean())
    wall = time.perf_counter() - t0
    print(f"fit: {iters} iters x {n_rays} rays in {wall:.1f}s "
          f"(incl. compile)")
    print(f"PSNR {psnr:.1f} dB  depth L1 {dl1_cm:.2f} cm  sem acc {acc:.3f}")

    # edge probes: out-of-bound points, zero depth, max class id
    pts = jnp.asarray([[[9.9, 9.9, 9.9]] * 4, [[0.0, 0.0, -1.0]] * 4])
    z = jnp.asarray([[0.1, 0.2, 0.3, 0.4]] * 2)
    rd = jnp.asarray([[0.0, 0.0, -1.0]] * 2)
    cls = jnp.asarray([ds.n_class - 1, 0])
    code = jnp.zeros((2, 4, spec.hidden_dim))
    out = render_fine(params, spec, pts, z, rd, cls, code, bound)
    assert np.isfinite(np.asarray(out.color)).all()
    assert np.isfinite(np.asarray(out.depth)).all()
    print("edge probes finite: OK")

    ok = psnr > 35.0 and dl1_cm < 1.0 and acc > 0.99
    print("VERIFY", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
