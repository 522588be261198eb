"""Full-frame rendering: every pixel of an image, chunked on device.

Counterpart of the reference's ``frame_vis`` inner loop (reference:
slams/mapping.py:638-724) and the eval renderer (eval_2d.py:262-310), but
chunked with ``lax.map`` over fixed-size blocks inside ONE jit — no Python
chunk loop, no per-chunk dispatch.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from dnsjax.geometry.rays import all_rays, ray_box_far
from dnsjax.models.decoder import DecoderSpec
from dnsjax.models.features import match_features
from dnsjax.render.pipeline import render_fine
from dnsjax.render.sampling import sample_along_rays


def make_full_renderer(
    spec: DecoderSpec,
    cam: Dict[str, Any],
    n_samples: int,
    n_surface: int,
    chunk: int = 4096,
    compute_dtype=jnp.bfloat16,
    mesh=None,
):
    """Returns render_frame(params, c2w, gt_depth, gt_label, refer_w2c,
    refer_feats, bound, key) -> (color (H,W,3), depth (H,W), logits (H,W,C)).

    Class dispatch uses the frame's GT labels, as the reference does for
    visualization and eval (mapping.py:686, 613).

    ``mesh``: optional 1-D jax.sharding.Mesh with axis 'dp' — the ray
    chunks are split across devices (params/frame replicated, no
    collectives), the multi-chip path for vis/eval full-frame renders.
    """
    H, W = int(cam["H"]), int(cam["W"])
    n = H * W
    n_dev = 1 if mesh is None else mesh.devices.size
    step = chunk * n_dev
    n_pad = (n + step - 1) // step * step
    n_chunks = n_pad // chunk
    S = n_samples + n_surface

    @jax.jit
    def render_frame(params, c2w, gt_depth, gt_label, refer_w2c, refer_feats,
                     bound, key):
        rays_o, rays_d = all_rays(H, W, c2w, cam["fx"], cam["fy"], cam["cx"], cam["cy"])
        rays_o = rays_o.reshape(-1, 3)
        rays_d = rays_d.reshape(-1, 3)
        depthf = gt_depth.reshape(-1)
        labelf = gt_label.reshape(-1).astype(jnp.int32)

        far = ray_box_far(rays_o, rays_d, bound) + 0.01
        z = sample_along_rays(key, depthf, n_samples, n_surface, far)

        def pad(x):
            return jnp.concatenate(
                [x, jnp.zeros((n_pad - n,) + x.shape[1:], x.dtype)], 0
            ).reshape(n_chunks, chunk, *x.shape[1:])

        def chunk_loop(params, refer_w2c, refer_feats, bound, padded):
            def body(args):
                ro, rd, zc, lb, gd = args
                pts = ro[:, None, :] + rd[:, None, :] * zc[:, :, None]
                code = match_features(
                    params, pts.reshape(-1, 3), refer_w2c, refer_feats,
                    cam, bound, spec, compute_dtype,
                ).reshape(chunk, S, -1)
                front = zc < gd[:, None] * 0.95
                back = zc > gd[:, None] * 1.05
                trunc = (~front) & (~back) & (gd[:, None] > 0)
                code = code * trunc[..., None]
                out = render_fine(
                    params, spec, pts, zc, rd, lb, code, bound, compute_dtype
                )
                return out.color, out.depth, out.logits

            return jax.lax.map(body, padded)

        padded = (pad(rays_o), pad(rays_d), pad(z), pad(labelf), pad(depthf))
        if mesh is None:
            color, depth, logits = chunk_loop(
                params, refer_w2c, refer_feats, bound, padded
            )
        else:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            color, depth, logits = shard_map(
                chunk_loop,
                mesh=mesh,
                in_specs=(P(), P(), P(), P(), P("dp")),
                out_specs=(P("dp"), P("dp"), P("dp")),
                check_vma=False,
            )(params, refer_w2c, refer_feats, bound, padded)
        color = color.reshape(-1, 3)[:n].reshape(H, W, 3)
        depth = depth.reshape(-1)[:n].reshape(H, W)
        logits = logits.reshape(-1, spec.n_class)[:n].reshape(H, W, spec.n_class)
        return color, depth, logits

    return render_frame
