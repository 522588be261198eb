"""Occupancy-based volume compositing.

Reimplements the reference's renderer math (reference: utils/common.py:506-537):
in the default occupancy mode, per-sample alpha is ``sigmoid(10 * raw_occ)``
(sample spacing does NOT enter), transmittance is the exclusive cumprod of
``(1 - alpha + 1e-10)``, and the resulting weights are renormalized to sum to
one per ray before integrating color/depth/variance. A classic
volume-density mode (alpha = 1 - exp(-relu(raw) * dist * |d|)) is kept as an
option for parity with the reference's ``occupancy=False`` branch.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def occupancy_alpha(raw_occ: jnp.ndarray) -> jnp.ndarray:
    """alpha = sigmoid(10 * occupancy_logit) (reference: common.py:525)."""
    return jax.nn.sigmoid(10.0 * raw_occ)


def render_weights(
    raw_occ: jnp.ndarray,
    z_vals: jnp.ndarray,
    rays_d: jnp.ndarray,
    occupancy: bool = True,
    eps: float = 1e-10,
) -> jnp.ndarray:
    """Per-sample compositing weights, renormalized to sum 1 per ray.

    Args:
      raw_occ: (N, S) occupancy logits (or raw density if occupancy=False).
      z_vals: (N, S) sample depths along each ray.
      rays_d: (N, 3) unnormalized ray directions.
    Returns:
      (N, S) weights.
    """
    if occupancy:
        alpha = occupancy_alpha(raw_occ)
    else:
        dists = z_vals[..., 1:] - z_vals[..., :-1]
        dists = jnp.concatenate(
            [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1
        )
        dists = dists * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        alpha = 1.0 - jnp.exp(-jax.nn.relu(raw_occ) * dists)

    trans = jnp.cumprod(
        jnp.concatenate(
            [jnp.ones_like(alpha[..., :1]), 1.0 - alpha + eps], axis=-1
        ),
        axis=-1,
    )[..., :-1]
    weights = alpha * trans
    weights = weights / (jnp.sum(weights, axis=-1, keepdims=True) + eps)
    return weights


def composite_rays(
    rgb: jnp.ndarray,
    raw_occ: jnp.ndarray,
    z_vals: jnp.ndarray,
    rays_d: jnp.ndarray,
    occupancy: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full compositing pass.

    Args:
      rgb: (N, S, 3) per-sample color.
      raw_occ: (N, S) occupancy logits.
      z_vals: (N, S).
      rays_d: (N, 3).
    Returns:
      (depth (N,), depth_var (N,), color (N, 3), weights (N, S)) — same
      tuple as the reference's ``raw2nerf_color``.
    """
    weights = render_weights(raw_occ, z_vals, rays_d, occupancy=occupancy)
    color = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth = jnp.sum(weights * z_vals, axis=-1)
    resid = z_vals - depth[..., None]
    depth_var = jnp.sum(weights * resid * resid, axis=-1)
    return depth, depth_var, color, weights


def composite_channels(weights: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """Composite arbitrary per-sample channels (e.g. semantic logits):
    (N, S) weights x (N, S, C) -> (N, C) (reference: tracking.py:212)."""
    return jnp.sum(weights[..., None] * values, axis=-2)
