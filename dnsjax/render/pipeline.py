"""Fused field-query + compositing pipelines.

These are the two hot renderers of the system, counterparts of
``Tracker.renderer`` (reference: slams/tracking.py:188-214, coarse head only)
and ``Mapper.renderer`` (reference: slams/mapping.py:603-635, class-dispatched
fine heads + coarse for distillation). Everything is shape-static and fuses
under one jit: normalize -> encode (OneBlob + hash grid) -> MLPs -> composite.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax.numpy as jnp

from dnsjax.models.decoder import (
    DecoderSpec,
    coarse_apply,
    fine_apply,
    out_apply,
    pos_encode,
)
from dnsjax.render.composite import composite_channels, composite_rays


class RenderOut(NamedTuple):
    color: jnp.ndarray       # (N, 3)
    depth: jnp.ndarray       # (N,)
    depth_var: jnp.ndarray   # (N,)
    logits: jnp.ndarray      # (N, n_class)
    weights: jnp.ndarray     # (N, S)
    fine_latents: jnp.ndarray    # (N, S, h+1) or None-like zeros
    coarse_latents: jnp.ndarray  # (N, S, h+1)


def normalize_pts(pts_w: jnp.ndarray, bound: jnp.ndarray) -> jnp.ndarray:
    """World points -> [0,1]^3 by the scene bound (reference: tracking.py:190)."""
    return (pts_w - bound[:, 0]) / (bound[:, 1] - bound[:, 0])


def render_coarse(
    params: Dict[str, Any],
    spec: DecoderSpec,
    pts_w: jnp.ndarray,      # (N, S, 3)
    z_vals: jnp.ndarray,     # (N, S)
    rays_d: jnp.ndarray,     # (N, 3)
    pixel_code: jnp.ndarray, # (N, S, h) merged+truncation-masked 2D features
    bound: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
) -> RenderOut:
    """Tracking renderer: coarse decoder only (reference: tracking.py:188-214)."""
    N, S, _ = pts_w.shape
    p = normalize_pts(pts_w, bound).reshape(N * S, 3)
    pe, grid = pos_encode(params, p, spec)

    latents = coarse_apply(params, pe, grid, compute_dtype)  # (N*S, h+1)
    feat = jnp.concatenate([latents[:, 1:], pixel_code.reshape(N * S, -1)], -1)
    color_pts, logits_pts = out_apply(params, pe, feat, compute_dtype)

    occ = latents[:, 0].reshape(N, S)
    depth, depth_var, color, weights = composite_rays(
        color_pts.reshape(N, S, 3), occ, z_vals, rays_d
    )
    logits = composite_channels(weights, logits_pts.reshape(N, S, -1))
    lat = latents.reshape(N, S, -1)
    return RenderOut(color, depth, depth_var, logits, weights, lat, lat)


def render_fine(
    params: Dict[str, Any],
    spec: DecoderSpec,
    pts_w: jnp.ndarray,      # (N, S, 3)
    z_vals: jnp.ndarray,     # (N, S)
    rays_d: jnp.ndarray,     # (N, 3)
    classes: jnp.ndarray,    # (N,) per-ray GT class id
    pixel_code: jnp.ndarray, # (N, S, h)
    bound: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
) -> RenderOut:
    """Mapping renderer: class-dispatched fine decoders drive occupancy/color;
    coarse latents are returned for the two-way distillation loss
    (reference: mapping.py:603-635)."""
    N, S, _ = pts_w.shape
    p = normalize_pts(pts_w, bound).reshape(N * S, 3)
    pe, grid = pos_encode(params, p, spec)
    coarse_latents = coarse_apply(params, pe, grid, compute_dtype)  # (N*S, h+1)
    return render_fine_pre(
        params, spec, pe, grid, coarse_latents, z_vals, rays_d, classes,
        pixel_code, compute_dtype,
    )


def render_fine_pre(
    params: Dict[str, Any],
    spec: DecoderSpec,
    pe: jnp.ndarray,             # (N*S, pe_dim)
    grid: jnp.ndarray,           # (N*S, grid_dim)
    coarse_latents: jnp.ndarray, # (N*S, h+1)
    z_vals: jnp.ndarray,         # (N, S)
    rays_d: jnp.ndarray,         # (N, 3)
    classes: jnp.ndarray,        # (N,)
    pixel_code: jnp.ndarray,     # (N, S, h)
    compute_dtype=jnp.bfloat16,
) -> RenderOut:
    """render_fine from precomputed encodings/coarse latents — lets callers
    encode extra point sets (e.g. the TV-smoothness subgrid) in the SAME
    fused encode+coarse pass as the ray samples (see mapper._build_loss_fn)."""
    N, S = z_vals.shape
    fine_latents = fine_apply(
        params, classes, pe.reshape(N, S, -1), grid.reshape(N, S, -1), compute_dtype
    )  # (N, S, h+1)

    feat = jnp.concatenate(
        [fine_latents[..., 1:].reshape(N * S, -1), pixel_code.reshape(N * S, -1)], -1
    )
    color_pts, logits_pts = out_apply(params, pe, feat, compute_dtype)

    occ = fine_latents[..., 0]
    depth, depth_var, color, weights = composite_rays(
        color_pts.reshape(N, S, 3), occ, z_vals, rays_d
    )
    logits = composite_channels(weights, logits_pts.reshape(N, S, -1))
    return RenderOut(
        color, depth, depth_var, logits, weights,
        fine_latents, coarse_latents.reshape(N, S, -1),
    )
