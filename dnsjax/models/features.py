"""2D feature matching: project sample points into reference views, gather
encoder features, and fuse them with the merge MLP.

Functional counterpart of the reference's ``feature_matching`` +
``feature_searching`` (reference: utils/common.py:632-679). The reference
bilinearly upsamples the half-resolution feature map to full resolution
(align_corners=True) and then nearest-gathers at the rounded projected pixel;
dnsjax instead bilinearly samples the half-res map directly at the
equivalent coordinate — identical values, no HxWx64 materialization.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from dnsjax.geometry.rays import project_points, world_to_camera
from dnsjax.geometry.se3 import invert_se3
from dnsjax.models.decoder import DecoderSpec, merge_apply


def _row_gather(img: jnp.ndarray, yi: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """Gather (H, W, C) rows at integer (yi, xi) via a FLAT single-axis gather.

    ``img[yi, xi]`` lowers to a two-offset-dim gather that TPU executes an
    order of magnitude slower per row than a flat row gather (measured
    13.5 ns/row vs ~1 ns/row for the hashgrid's flat gathers at the bench
    shape — probe_buckets A1 / probe_feat_gather). Flattening to (H*W, C)
    and indexing with yi*W+xi is bit-identical and restores the fast path.
    """
    H, W = img.shape[0], img.shape[1]
    flat = img.reshape(H * W, img.shape[2])
    return flat[yi * W + xi]


def bilinear_sample(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of (H, W, C) at continuous pixel coords (x, y), clamped."""
    H, W = img.shape[0], img.shape[1]
    x = jnp.clip(x, 0.0, W - 1.0)
    y = jnp.clip(y, 0.0, H - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    v00 = _row_gather(img, y0, x0)
    v01 = _row_gather(img, y0, x1)
    v10 = _row_gather(img, y1, x0)
    v11 = _row_gather(img, y1, x1)
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def nearest_sample(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Nearest sample of (H, W, C) at continuous pixel coords, clamped."""
    H, W = img.shape[0], img.shape[1]
    xi = jnp.clip(jnp.round(x), 0, W - 1).astype(jnp.int32)
    yi = jnp.clip(jnp.round(y), 0, H - 1).astype(jnp.int32)
    return _row_gather(img, yi, xi)


def match_features_batched(
    params: Dict[str, Any],
    pts_w: jnp.ndarray,
    refer_w2c: jnp.ndarray,
    feats_half: jnp.ndarray,
    cam: Dict[str, Any],
    bound: jnp.ndarray,
    spec: DecoderSpec,
    compute_dtype=jnp.bfloat16,
    taps: int = 4,
) -> jnp.ndarray:
    """Batched ``match_features`` over T frames with ONE flat feature gather.

    XLA TPU gathers are an order of magnitude slower per row when the
    gather carries operand batching dims (a table per frame/view under
    vmap) than as a flat single-axis gather from one table — 12.3 vs
    ~1 ns/row measured at the mapping shape (probe_buckets A1 /
    probe_feat_flat). So all T*R feature maps are flattened into one
    (T*R*Hf*Wf, C) table and every tap of every view of every frame is
    gathered in a single flat lookup; values are bit-identical to the
    per-view sampler (the flat index arithmetic commutes with the
    reshape). The mapper calls this OUTSIDE its per-frame vmap for
    exactly this reason.

    Args:
      params: decoder params (uses ``merge``).
      pts_w: (T, P, 3) world points per frame.
      refer_w2c: (T, R, 4, 4) world-to-camera of each frame's views.
      feats_half: (T, R, Hf, Wf, C) encoder features at half resolution.
      cam: dict with H, W, fx, fy, cx, cy (full-resolution intrinsics).
      bound: (3, 2) scene bound.
      taps: 4 = bilinear gather (equivalent to the reference's upsample +
        nearest-pixel lookup); 1 = nearest tap at half resolution — 4x fewer
        gather rows (the dominant cost of this op on TPU) at a comparable
        approximation level, since the reference itself rounds to the
        nearest full-res pixel.
    Returns:
      (T, P, hidden_dim) merged codes. Out-of-frustum / behind-camera
      samples contribute a zeroed pixel feature (but still a PE term) to
      the view mean, matching the reference (common.py:665-677).
    """
    H, W = int(cam["H"]), int(cam["W"])
    fx, fy, cx, cy = cam["fx"], cam["fy"], cam["cx"], cam["cy"]
    T, R = refer_w2c.shape[0], refer_w2c.shape[1]
    Hf, Wf, C = feats_half.shape[-3:]

    pts_cam = jax.vmap(world_to_camera)(pts_w, refer_w2c)  # (T, R, P, 3)
    u, v, depth = project_points(pts_cam, fx, fy, cx, cy)
    u = jnp.round(u)
    v = jnp.round(v)
    mask = (u > 0) & (u < W - 1) & (v > 0) & (v < H - 1) & (depth > 0)

    # Full-res pixel -> half-res coordinate under align_corners=True upsampling.
    gx = u * ((Wf - 1.0) / (W - 1.0))
    gy = v * ((Hf - 1.0) / (H - 1.0))

    flat = feats_half.reshape(T * R * Hf * Wf, C)
    # per-(frame, view) row offset into the flat table, broadcast over P
    base = (jnp.arange(T * R, dtype=jnp.int32) * (Hf * Wf)).reshape(T, R, 1)

    if taps == 4:
        x = jnp.clip(gx, 0.0, Wf - 1.0)
        y = jnp.clip(gy, 0.0, Hf - 1.0)
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        x1 = jnp.minimum(x0 + 1, Wf - 1)
        y1 = jnp.minimum(y0 + 1, Hf - 1)
        fxw = (x - x0)[..., None]
        fyw = (y - y0)[..., None]
        code = (
            flat[base + y0 * Wf + x0] * (1 - fxw) * (1 - fyw)
            + flat[base + y0 * Wf + x1] * fxw * (1 - fyw)
            + flat[base + y1 * Wf + x0] * (1 - fxw) * fyw
            + flat[base + y1 * Wf + x1] * fxw * fyw
        )
    else:
        xi = jnp.clip(jnp.round(gx), 0, Wf - 1).astype(jnp.int32)
        yi = jnp.clip(jnp.round(gy), 0, Hf - 1).astype(jnp.int32)
        code = flat[base + yi * Wf + xi]  # (T, R, P, C)
    code = code * mask[..., None]

    refer_c2w = invert_se3(refer_w2c)
    refer_o = refer_c2w[..., :3, 3]  # (T, R, 3)
    rel = pts_w[:, None, :, :] - refer_o[:, :, None, :]  # (T, R, P, 3)
    merge = lambda r, c: merge_apply(params, r, c, bound, spec, compute_dtype)
    return jax.vmap(merge)(rel, code)  # (T, P, hidden)


def match_features(
    params: Dict[str, Any],
    pts_w: jnp.ndarray,
    refer_w2c: jnp.ndarray,
    feats_half: jnp.ndarray,
    cam: Dict[str, Any],
    bound: jnp.ndarray,
    spec: DecoderSpec,
    compute_dtype=jnp.bfloat16,
    taps: int = 4,
) -> jnp.ndarray:
    """Single-frame ``match_features_batched``: pts (P, 3), views (R, 4, 4),
    feats (R, Hf, Wf, C) -> (P, hidden_dim). The views are still fused into
    one flat gather (the fast path) — only the frame batch dim is dropped."""
    return match_features_batched(
        params, pts_w[None], refer_w2c[None], feats_half[None],
        cam, bound, spec, compute_dtype, taps,
    )[0]
