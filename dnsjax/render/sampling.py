"""Depth-guided z-value sampling along rays.

Reimplements the reference's sampler (reference: utils/common.py:561-599)
with an explicit PRNG key and fully static shapes:

* ``n_surface`` samples per ray: for rays with valid depth, uniform in
  ``[0.95 d, 1.05 d]`` using ONE shared random draw for the whole batch, with
  one entry pinned to the bracket midpoint (the reference forces
  ``t[n_surface//2+1] = 0.5``); rays with zero depth instead use a second
  shared draw, uniform in ``[1e-3, max_batch_depth]``.
* ``n_samples`` stratified samples per ray: a deterministic linspace from
  ``1e-3 d`` to ``clamp(far_bb, 0, 1.2 max_batch_depth)`` (no jitter —
  faithful to the reference).
* the two sets are merged and sorted per ray.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_along_rays(
    key: jax.Array,
    gt_depth: jnp.ndarray,
    n_samples: int,
    n_surface: int,
    far_bb: jnp.ndarray,
) -> jnp.ndarray:
    """Sample z values per ray.

    Args:
      key: PRNG key (two shared draws per call, matching the reference's
        batch-shared randomness).
      gt_depth: (N,) per-ray sensor depth (0 = invalid).
      n_samples: stratified sample count (static).
      n_surface: surface-bracket sample count (static).
      far_bb: (N,) far plane from ray-box intersection (already +0.01 padded).

    Returns:
      (N, n_samples + n_surface) sorted z values, float32.
    """
    gt_depth = gt_depth.reshape(-1)
    k_surf, k_zero = jax.random.split(key)

    max_depth = jnp.max(gt_depth)

    if n_surface > 0:
        # --- surface samples (shared t across batch, one pinned midpoint) ---
        t_surf = jax.random.uniform(k_surf, (n_surface,))
        # pin one midpoint sample (reference: common.py:572-574); its index
        # n//2+1 is out of bounds for n_surface == 1, so clamp (a .at[] with
        # an OOB index silently drops the write)
        t_surf = t_surf.at[min(n_surface // 2 + 1, n_surface - 1)].set(0.5)
        z_surf_valid = gt_depth[:, None] * (0.95 + 0.1 * t_surf[None, :])

        t_zero = jax.random.uniform(k_zero, (n_surface,))
        z_surf_zero = 1e-3 * (1.0 - t_zero) + max_depth * t_zero

        has_depth = (gt_depth > 0)[:, None]
        z_surface = jnp.where(has_depth, z_surf_valid, z_surf_zero[None, :])
    else:
        z_surface = jnp.zeros((gt_depth.shape[0], 0), gt_depth.dtype)

    if n_samples > 0:
        # --- stratified samples: deterministic linspace per ray ---
        near = 1e-3 * gt_depth
        far = jnp.clip(far_bb.reshape(-1), 0.0, 1.2 * max_depth)
        t = jnp.linspace(0.0, 1.0, n_samples)
        z_strat = near[:, None] * (1.0 - t[None, :]) + far[:, None] * t[None, :]
        z = jnp.concatenate([z_strat, z_surface], axis=-1)
    else:
        z = z_surface

    return jnp.sort(z, axis=-1).astype(jnp.float32)
