"""Multi-resolution hash-grid encoding (Instant-NGP style), TPU-native.

Replaces the reference's tcnn ``HashGrid`` CUDA encoding (reference:
models/pos_encoding.py:31-46; config at configs/replica/replica.yaml:16-18).
Semantics follow the Instant-NGP paper (Mueller et al. 2022):

* L levels with per-axis resolution ``N_l = floor(base * scale^l)``,
  ``scale = exp2(log2(desired/base) / (L-1))``.
* levels whose dense vertex count fits the table use direct (dense) indexing;
  larger levels use the spatial hash ``x ^ (y*2654435761) ^ (z*805459861)``
  modulo table size.
* features are trilinearly interpolated from the 8 cell corners and
  concatenated over levels (level-major), giving ``L * F`` output dims.

The forward pass is pure XLA (gathers + fused arithmetic); the backward pass
is JAX autodiff of the gather, which lowers to an efficient scatter-add into
the table. Input points are expected in [0, 1]^3 (callers normalize by the
scene bound, as the reference does at e.g. slams/tracking.py:190).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

# Spatial-hash primes from Teschner et al. / Instant-NGP.
_PRIMES = (1, 2654435761, 805459861)

# Corner offsets of a unit cell, shape (8, 3).
_CORNERS = np.array(
    [[i & 1, (i >> 1) & 1, (i >> 2) & 1] for i in range(8)], dtype=np.int32
)


@dataclass(frozen=True)
class HashGridSpec:
    """Static configuration of the encoding (hashable; safe as a jit static)."""

    n_levels: int = 16
    n_features: int = 2
    log2_hashmap_size: int = 16
    base_resolution: int = 16
    desired_resolution: int = 512

    @property
    def table_size(self) -> int:
        return 1 << self.log2_hashmap_size

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_features

    @property
    def per_level_scale(self) -> float:
        if self.n_levels == 1:
            return 1.0
        return float(
            np.exp2(
                np.log2(self.desired_resolution / self.base_resolution)
                / (self.n_levels - 1)
            )
        )

    def level_resolutions(self) -> np.ndarray:
        s = self.per_level_scale
        return np.array(
            [int(np.floor(self.base_resolution * s**l)) for l in range(self.n_levels)],
            dtype=np.int32,
        )


def init_hash_table(key: jax.Array, spec: HashGridSpec) -> jnp.ndarray:
    """(L, T, F) table, uniform in [-1e-4, 1e-4] (Instant-NGP init)."""
    return jax.random.uniform(
        key,
        (spec.n_levels, spec.table_size, spec.n_features),
        minval=-1e-4,
        maxval=1e-4,
        dtype=jnp.float32,
    )


def _level_indices(ix: jnp.ndarray, res: int, table_size: int) -> jnp.ndarray:
    """Corner integer coords (N, 8, 3) -> table indices (N, 8) for one level."""
    n_verts = res + 1
    if n_verts**3 <= table_size:
        # Dense indexing for small levels (tcnn does the same).
        idx = ix[..., 0] + n_verts * (ix[..., 1] + n_verts * ix[..., 2])
    else:
        ux = ix.astype(jnp.uint32)
        idx = (
            ux[..., 0] * np.uint32(_PRIMES[0])
            ^ ux[..., 1] * np.uint32(_PRIMES[1])
            ^ ux[..., 2] * np.uint32(_PRIMES[2])
        )
        idx = (idx % np.uint32(table_size)).astype(jnp.int32)
    return idx


@partial(jax.jit, static_argnames=("spec",))
def hash_encode(table: jnp.ndarray, pts: jnp.ndarray, spec: HashGridSpec) -> jnp.ndarray:
    """Encode points.

    Args:
      table: (L, T, F) parameters.
      pts: (..., 3) points in [0, 1]^3 (out-of-range points clamp).
      spec: static encoding config.
    Returns:
      (..., L * F) encoded features, float32.
    """
    batch_shape = pts.shape[:-1]
    p = jnp.clip(pts.reshape(-1, 3), 0.0, 1.0)
    resolutions = spec.level_resolutions()

    outs = []
    corners = jnp.asarray(_CORNERS)  # (8, 3)
    for l in range(spec.n_levels):
        res = int(resolutions[l])
        x = p * res  # cell coords in [0, res]
        i0 = jnp.floor(x).astype(jnp.int32)
        i0 = jnp.minimum(i0, res - 1)  # keep the +1 corner in range
        frac = x - i0.astype(x.dtype)

        ix = i0[:, None, :] + corners[None, :, :]  # (N, 8, 3)
        idx = _level_indices(ix, res, spec.table_size)  # (N, 8)
        feats = table[l][idx]  # (N, 8, F)

        # Trilinear weights: prod over dims of (corner ? frac : 1-frac).
        c = corners.astype(x.dtype)  # (8, 3)
        w = jnp.prod(
            c[None, :, :] * frac[:, None, :] + (1.0 - c[None, :, :]) * (1.0 - frac[:, None, :]),
            axis=-1,
        )  # (N, 8)
        outs.append(jnp.sum(w[..., None] * feats, axis=1))  # (N, F)

    out = jnp.concatenate(outs, axis=-1)
    return out.reshape(batch_shape + (spec.out_dim,))


def hash_encode_ref(table: np.ndarray, pts: np.ndarray, spec: HashGridSpec) -> np.ndarray:
    """Pure-numpy oracle of hash_encode (for tests)."""
    p = np.clip(pts.reshape(-1, 3), 0.0, 1.0)
    resolutions = spec.level_resolutions()
    outs = []
    for l in range(spec.n_levels):
        res = int(resolutions[l])
        x = p * res
        i0 = np.minimum(np.floor(x).astype(np.int64), res - 1)
        frac = x - i0
        ix = i0[:, None, :] + _CORNERS[None, :, :]
        n_verts = res + 1
        if n_verts**3 <= spec.table_size:
            idx = ix[..., 0] + n_verts * (ix[..., 1] + n_verts * ix[..., 2])
        else:
            ux = ix.astype(np.uint32)
            idx = (
                ux[..., 0] * np.uint32(_PRIMES[0])
                ^ ux[..., 1] * np.uint32(_PRIMES[1])
                ^ ux[..., 2] * np.uint32(_PRIMES[2])
            ) % np.uint32(spec.table_size)
        feats = table[l][idx]
        c = _CORNERS.astype(np.float64)
        w = np.prod(c[None] * frac[:, None] + (1 - c[None]) * (1 - frac[:, None]), -1)
        outs.append((w[..., None] * feats).sum(1))
    return np.concatenate(outs, -1).astype(np.float32)
