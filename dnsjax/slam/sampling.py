"""Pixel sampling strategies (uniform and class-balanced), fixed-shape.

The reference samples pixels with dynamic shapes and per-class Python loops
(reference: utils/common.py:266-403). dnsjax replaces this with:

* uniform sampling: random flat indices into the (cropped) image — same
  with-replacement semantics as the reference's ``torch.randint``.
* class-balanced sampling: each keyframe pre-computes (once, on host) its
  pixels sorted by class label plus per-class offsets; a balanced draw is
  then `class-slot -> uniform offset` gathers — O(n) on device, no loops,
  no recompiles as the set of present classes changes.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


def class_sorted_pixels(label: np.ndarray, n_class: int) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side per-frame preprocessing.

    Args:
      label: (H, W) int class ids.
      n_class: total class count.
    Returns:
      sorted_idx: (H*W,) flat pixel indices sorted by class.
      offsets: (n_class + 1,) prefix offsets; pixels of class c live at
        sorted_idx[offsets[c]:offsets[c+1]].
    """
    flat = label.reshape(-1)
    sorted_idx = np.argsort(flat, kind="stable").astype(np.int32)
    counts = np.bincount(flat, minlength=n_class)
    offsets = np.zeros(n_class + 1, np.int32)
    np.cumsum(counts, out=offsets[1:])
    return sorted_idx, offsets


def sample_uniform_pixels(
    key: jax.Array, n: int, H: int, W: int, edge_h: int = 0, edge_w: int = 0
) -> jnp.ndarray:
    """n flat pixel ids uniform (with replacement) over the inner crop
    [edge_h, H-edge_h) x [edge_w, W-edge_w) (reference: common.py:282-293)."""
    kh, kw = jax.random.split(key)
    j = jax.random.randint(kh, (n,), edge_h, H - edge_h)
    i = jax.random.randint(kw, (n,), edge_w, W - edge_w)
    return j * W + i


def sample_class_balanced_pixels(
    key: jax.Array,
    n: int,
    sorted_idx: jnp.ndarray,
    offsets: jnp.ndarray,
) -> jnp.ndarray:
    """n flat pixel ids, ~equal quota per class present in the frame.

    Equivalent in distribution to the reference's per-class quota sampling
    (common.py:307-338) up to remainder placement: slot s draws from the
    (s mod n_present)-th present class.
    """
    counts = offsets[1:] - offsets[:-1]  # (C,)
    present = counts > 0
    n_present = jnp.maximum(jnp.sum(present.astype(jnp.int32)), 1)
    # rank r -> class id: positions where cumulative present count hits r+1
    cum = jnp.cumsum(present.astype(jnp.int32))
    ranks = jnp.arange(n, dtype=jnp.int32) % n_present
    cls = jnp.searchsorted(cum, ranks + 1, side="left").astype(jnp.int32)

    k1, _ = jax.random.split(key)
    u = jax.random.uniform(k1, (n,))
    lo = offsets[cls]
    cnt = jnp.maximum(counts[cls], 1)
    pick = lo + (u * cnt).astype(jnp.int32)
    return sorted_idx[pick]


def sample_restricted_class_pixels(
    key: jax.Array,
    n: int,
    sorted_idx: jnp.ndarray,
    offsets: jnp.ndarray,
    class_mask: jnp.ndarray,
) -> jnp.ndarray:
    """Class-balanced sampling restricted to ``class_mask`` classes
    (the reference's ``get_samples_by_uniq_class`` used for fine-decoder
    warm-up, common.py:364-403). Classes absent from the frame are skipped."""
    counts = offsets[1:] - offsets[:-1]
    present = (counts > 0) & class_mask.astype(bool)
    # if nothing matches, fall back to all present classes
    any_match = jnp.any(present)
    present = jnp.where(any_match, present, counts > 0)
    n_present = jnp.maximum(jnp.sum(present.astype(jnp.int32)), 1)
    cum = jnp.cumsum(present.astype(jnp.int32))
    ranks = jnp.arange(n, dtype=jnp.int32) % n_present
    cls = jnp.searchsorted(cum, ranks + 1, side="left").astype(jnp.int32)
    u = jax.random.uniform(key, (n,))
    lo = offsets[cls]
    cnt = jnp.maximum(counts[cls], 1)
    pick = lo + (u * cnt).astype(jnp.int32)
    return sorted_idx[pick]
