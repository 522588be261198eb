"""Loss terms for tracking and mapping.

All losses are fixed-shape: where the reference gathers valid rays with a
boolean mask and takes a plain mean (e.g. mapping.py:579-586 + 110-121),
dnsjax keeps every ray and computes a mask-weighted mean — mathematically
identical, but jit-friendly (no dynamic shapes, no recompiles).

Loss inventory and reference pointers:
* photometric MSE                      — tracking.py:85-87, mapping.py:110-112
* depth L1 (mapping)                   — mapping.py:114-117
* depth L1 / sqrt(var) (tracking)      — tracking.py:89-92
* semantic cross-entropy               — tracking.py:94-96, mapping.py:119-121
* coarse<->fine latent distillation    — mapping.py:123-126
* TV smoothness of occupancy grid      — mapping.py:129-159
* free-space + opacity (pseudo-occ)    — utils/common.py:764-802
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

_LOG10 = math.log(10.0)


def mse2psnr(mse: jnp.ndarray) -> jnp.ndarray:
    return -10.0 * jnp.log(mse) / _LOG10


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Mean of x over elements where mask is truthy. mask broadcasts to x."""
    mask = jnp.broadcast_to(mask.astype(x.dtype), x.shape)
    return jnp.sum(x * mask) / (jnp.sum(mask) + eps)


def photometric_loss(gt_color, pred_color, mask=None) -> jnp.ndarray:
    """Masked MSE over rgb channels."""
    sq = (gt_color - pred_color) ** 2
    if mask is None:
        return jnp.mean(sq)
    return masked_mean(sq, mask[..., None])


def depth_l1_loss(gt_depth, pred_depth, mask=None) -> jnp.ndarray:
    """L1 on rays with valid depth (mapping variant)."""
    valid = gt_depth > 0
    if mask is not None:
        valid = valid & mask.astype(bool)
    return masked_mean(jnp.abs(gt_depth - pred_depth), valid)


def depth_var_loss(gt_depth, pred_depth, pred_depth_var, mask) -> jnp.ndarray:
    """|d - d_hat| / sqrt(var + 1e-10), masked (tracking variant)."""
    err = jnp.abs(gt_depth - pred_depth) / jnp.sqrt(pred_depth_var + 1e-10)
    return masked_mean(err, mask)


def semantic_ce_loss(gt_label, pred_logits, mask=None) -> jnp.ndarray:
    """Cross-entropy between composited logits and integer class labels."""
    logp = jax.nn.log_softmax(pred_logits, axis=-1)
    n_class = pred_logits.shape[-1]
    lbl = jnp.clip(gt_label.astype(jnp.int32), 0, n_class - 1)
    nll = -jnp.take_along_axis(logp, lbl[..., None], axis=-1)[..., 0]
    if mask is None:
        return jnp.mean(nll)
    return masked_mean(nll, mask)


def latent_distill_loss(coarse_latents, fine_latents, mask=None) -> jnp.ndarray:
    """MSE between coarse and fine 33-d latents; gradients flow both ways
    (two-way distillation, reference: mapping.py:123-126, 894)."""
    sq = (coarse_latents - fine_latents) ** 2
    if mask is None:
        return jnp.mean(sq)
    return masked_mean(sq, mask)


def tv_smoothness_loss(occ_grid: jnp.ndarray) -> jnp.ndarray:
    """Total-variation smoothness of an occupancy sub-grid.

    occ_grid: (G, G, G) occupancy logits sampled on a regular sub-grid of the
    scene (the caller draws the random grid placement; reference:
    mapping.py:129-159 divides by sample_points**3 where the grid itself is
    (sample_points-1)^3 — semantics kept).
    """
    g = occ_grid.shape[0] + 1  # reference normalizes by (grid+1)^3
    tv_x = jnp.sum((occ_grid[1:, :, :] - occ_grid[:-1, :, :]) ** 2)
    tv_y = jnp.sum((occ_grid[:, 1:, :] - occ_grid[:, :-1, :]) ** 2)
    tv_z = jnp.sum((occ_grid[:, :, 1:] - occ_grid[:, :, :-1]) ** 2)
    return (tv_x + tv_y + tv_z) / float(g**3)


def approx_occ(x: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Gaussian pseudo-occupancy 0.5 exp(-x^2 / 2 sigma^2) (common.py:764-766)."""
    return 0.5 * jnp.exp(-0.5 * (x / sigma) ** 2)


def freespace_opacity_loss(
    z_vals: jnp.ndarray,
    gt_depth: jnp.ndarray,
    occ_logits: jnp.ndarray,
    ray_mask=None,
    truncation: float = 0.2,
    sigma: float = 0.05,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Free-space + opacity losses against a Gaussian pseudo-occupancy.

    Matches reference semantics (common.py:769-802): means are over the FULL
    (rays x samples) tensor, with the front/opacity masks inside the
    squared term. ``ray_mask`` extends this with the caller's valid-ray mask
    (the reference gathers valid rays first; we weight instead).
    """
    occ = jax.nn.sigmoid(10.0 * occ_logits)
    depth = gt_depth[..., None]
    front = (z_vals < depth - truncation).astype(occ.dtype)
    back = (z_vals > depth + truncation).astype(occ.dtype)
    has_depth = (depth > 0.0).astype(occ.dtype)
    opacity_mask = (1.0 - front) * (1.0 - back) * has_depth

    if ray_mask is None:
        denom = jnp.ones(occ.shape[:1], occ.dtype)
    else:
        denom = ray_mask.astype(occ.dtype)
    w = denom[..., None]
    n = jnp.sum(denom) * occ.shape[-1] + 1e-8

    fs_loss = jnp.sum(((occ * front * has_depth) ** 2) * w) / n
    pseudo = approx_occ(z_vals - depth, sigma=sigma)
    opacity_loss = (
        jnp.sum(((occ * opacity_mask - pseudo * opacity_mask) ** 2) * w) / n
    )
    return fs_loss, opacity_loss
