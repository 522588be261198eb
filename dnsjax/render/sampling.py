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

import os

import jax
import jax.numpy as jnp

# z-ordering backend: "sort" = jnp.sort over the 47-wide sample axis (a
# bitonic network with lane shuffles on TPU); "merge" = exploit that BOTH
# sample families are already sorted per ray (the shared t_surf vector is
# pre-sorted once for the whole batch; the stratified linspace is monotone)
# and merge them with comparison-count ranks + one-hot placement — pure
# elementwise/matmul work, no lane shuffles. Output is BIT-IDENTICAL to the
# sort (equal multiset, ascending), so flipping this needs only a timing
# measurement, not a quality gate (scripts/probe_buckets.py times both).
Z_BACKEND_DEFAULT = os.environ.get("DNSJAX_Z_BACKEND", "sort")
Z_BACKEND = Z_BACKEND_DEFAULT


def _merge_sorted(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Merge per-row ascending-sorted a (N, A) and b (N, B) -> (N, A+B).

    Rank of a[i] = i + #{j: b[j] < a[i]}; rank of b[j] = j + #{i: a[i] <=
    b[j]} — the strict/non-strict split makes ranks a permutation even with
    ties, and places equal values in (a, b) order (any order of equal values
    yields the same array). Placement is a one-hot multiply-sum, which XLA
    maps to VPU/MXU work instead of a sorting network."""
    A, B = a.shape[-1], b.shape[-1]
    ra = jnp.arange(A) + jnp.sum(
        (b[:, None, :] < a[:, :, None]), axis=-1
    )  # (N, A)
    rb = jnp.arange(B) + jnp.sum(
        (a[:, None, :] <= b[:, :, None]), axis=-1
    )  # (N, B)
    k = jnp.arange(A + B)
    out = jnp.sum(a[:, :, None] * (ra[:, :, None] == k), axis=1)
    out = out + jnp.sum(b[:, :, None] * (rb[:, :, None] == k), axis=1)
    return out


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
        # single-product lerp, NOT near*(1-t) + far*t: IEEE rounding is
        # monotone in one operand, so near + t*(far-near) is float-monotone
        # in t — the two-product form is not when far is within a few ulps
        # of near, which would violate the merge backend's sorted-input
        # precondition (caught by an adversarial review repro)
        z_strat = near[:, None] + t[None, :] * (far - near)[:, None]
    else:
        z_strat = jnp.zeros((gt_depth.shape[0], 0), gt_depth.dtype)

    if Z_BACKEND == "merge" and n_samples > 0 and n_surface > 0:
        # per-family ascending order comes cheap: both surface vectors are
        # SHARED across the batch (sort 15 elements once; the valid-depth
        # scaling d*(0.95+0.1t) is monotone for d>0, and d==0 rows use the
        # zero-depth vector), and the stratified lerp above is monotone
        # with the direction given by sign(far - near)
        t_sorted = jnp.sort(t_surf)
        zv = gt_depth[:, None] * (0.95 + 0.1 * t_sorted[None, :])
        zz = jnp.sort(z_surf_zero)
        surf_sorted = jnp.where((gt_depth > 0)[:, None], zv, zz[None, :])
        strat_sorted = jnp.where(
            (far >= near)[:, None], z_strat, z_strat[:, ::-1]
        )
        return _merge_sorted(strat_sorted, surf_sorted).astype(jnp.float32)

    z = jnp.concatenate([z_strat, z_surface], axis=-1)
    return jnp.sort(z, axis=-1).astype(jnp.float32)
