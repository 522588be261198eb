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
    """Static configuration of the encoding (hashable; safe as a jit static).

    ``grad_corners``: corners receiving table gradient per (point, level).
    8 = exact trilinear transpose (reference semantics). 1 = stochastic
    single-corner backward: sample one corner with probability equal to its
    trilinear weight and scatter the unscaled output gradient — an UNBIASED
    estimator of the exact gradient (E[g] = sum_c w_c g) with 8x fewer
    scatter rows. XLA TPU scatter costs ~70ns/row, making the exact
    transpose the dominant cost of map optimization; the stochastic backward
    trades gradient variance (absorbed by Adam over the 100-iteration
    keystep) for an ~8x faster backward. Positions still get exact grads.
    """

    n_levels: int = 16
    n_features: int = 2
    log2_hashmap_size: int = 16
    base_resolution: int = 16
    desired_resolution: int = 512
    grad_corners: int = 8
    # Gather feature rows in bfloat16 (~30% faster on TPU; the master table
    # and its gradients stay float32, only the gathered values are
    # quantized — tcnn stores its hash tables in fp16 outright).
    gather_bf16: bool = False

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


def _corner_indices_weights(p: jnp.ndarray, spec: HashGridSpec):
    """(N,3) in [0,1] -> (idx (N,L,8) flat into (L*T), frac (N,L,3))."""
    resolutions = spec.level_resolutions()
    corners = jnp.asarray(_CORNERS)
    idxs, fracs = [], []
    for l in range(spec.n_levels):
        res = int(resolutions[l])
        x = p * res
        i0 = jnp.minimum(jnp.floor(x).astype(jnp.int32), res - 1)
        frac = x - i0.astype(x.dtype)
        ix = i0[:, None, :] + corners[None, :, :]  # (N, 8, 3)
        idx = _level_indices(ix, res, spec.table_size)  # (N, 8)
        idxs.append(idx + l * spec.table_size)
        fracs.append(frac)
    return jnp.stack(idxs, 1), jnp.stack(fracs, 1)


def _trilerp_weights(frac: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) frac -> (..., 8) trilinear corner weights."""
    c = jnp.asarray(_CORNERS, frac.dtype)  # (8, 3)
    return jnp.prod(
        c * frac[..., None, :] + (1.0 - c) * (1.0 - frac[..., None, :]), axis=-1
    )


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def hash_encode(table: jnp.ndarray, pts: jnp.ndarray, spec: HashGridSpec) -> jnp.ndarray:
    """Encode points.

    Custom VJP: the table gradient is ONE flat scatter-add over all levels
    (the default autodiff transpose lowers to per-level scatters that XLA
    schedules ~4x slower on TPU), and the position gradient reuses the
    gathered corner features.

    Args:
      table: (L, T, F) parameters.
      pts: (..., 3) points in [0, 1]^3 (out-of-range points clamp).
      spec: static encoding config.
    Returns:
      (..., L * F) encoded features, float32.
    """
    out, _ = _hash_encode_fwd(table, pts, spec)
    return out


def _hash_encode_fwd(table, pts, spec: HashGridSpec):
    batch_shape = pts.shape[:-1]
    p = jnp.clip(pts.reshape(-1, 3), 0.0, 1.0)
    idx, frac = _corner_indices_weights(p, spec)  # (N,L,8), (N,L,3)
    flat = table.reshape(-1, spec.n_features)  # (L*T, F)
    if spec.gather_bf16:
        flat = flat.astype(jnp.bfloat16)
    feats = jnp.take(flat, idx.reshape(-1), axis=0).reshape(
        idx.shape + (spec.n_features,)
    )  # (N,L,8,F)
    w = _trilerp_weights(frac)  # (N,L,8)
    out = jnp.sum(w[..., None] * feats.astype(w.dtype), axis=2)  # (N,L,F)
    out = out.reshape(batch_shape + (spec.out_dim,))
    return out, (pts, idx, frac, feats)


def _hash_encode_bwd(spec: HashGridSpec, res, g):
    pts, idx, frac, feats = res
    batch_shape = pts.shape[:-1]
    n = idx.shape[0]
    g = g.reshape(n, spec.n_levels, spec.n_features)  # (N,L,F)
    w = _trilerp_weights(frac)  # (N,L,8)

    if spec.grad_corners >= 8:
        # exact transpose: scatter all 8 corners
        contrib = (w[..., None] * g[:, :, None, :]).reshape(-1, spec.n_features)
        scatter_idx = idx.reshape(-1)
    else:
        # stochastic corner(s): inverse-CDF sample corner ~ trilerp weight.
        # Stateless uniform from the cell hash itself (changes whenever the
        # point moves a cell; ray pixels resample every iteration).
        cdf = jnp.cumsum(w, axis=-1)  # (N,L,8), last == 1
        bits = (idx[..., 0].astype(jnp.uint32) * np.uint32(0x9E3779B9)) ^ (
            idx[..., 7].astype(jnp.uint32) * np.uint32(0x85EBCA6B)
        )
        u = (bits >> np.uint32(8)).astype(jnp.float32) * (1.0 / (1 << 24))
        c_star = jnp.sum((cdf < u[..., None]).astype(jnp.int32), -1)  # (N,L)
        c_star = jnp.clip(c_star, 0, 7)
        picked = jnp.take_along_axis(idx, c_star[..., None], axis=-1)[..., 0]
        contrib = g.reshape(-1, spec.n_features)
        scatter_idx = picked.reshape(-1)

    flat_grad = jnp.zeros(
        (spec.n_levels * spec.table_size, spec.n_features), g.dtype
    ).at[scatter_idx].add(contrib)
    d_table = flat_grad.reshape(spec.n_levels, spec.table_size, spec.n_features)

    # position gradient through the trilerp weights
    # dw/dfrac_k = prod of the other two dims' factors, signed by corner bit
    c = jnp.asarray(_CORNERS, frac.dtype)  # (8,3)
    f = c * frac[..., None, :] + (1 - c) * (1 - frac[..., None, :])  # (N,L,8,3)
    gdotf = jnp.sum(feats.astype(g.dtype) * g[:, :, None, :], axis=-1)  # (N,L,8)
    sign = 2.0 * c - 1.0  # (8,3)
    others = jnp.stack(
        [f[..., 1] * f[..., 2], f[..., 0] * f[..., 2], f[..., 0] * f[..., 1]],
        axis=-1,
    )  # (N,L,8,3)
    dfrac = jnp.sum(gdotf[..., None] * sign * others, axis=2)  # (N,L,3)
    resolutions = jnp.asarray(spec.level_resolutions(), frac.dtype)
    d_p = jnp.sum(dfrac * resolutions[None, :, None], axis=1)  # (N,3)
    # clip boundary: zero gradient outside [0,1]
    p = pts.reshape(-1, 3)
    d_p = jnp.where((p >= 0) & (p <= 1), d_p, 0.0)
    return d_table, d_p.reshape(batch_shape + (3,))


hash_encode.defvjp(_hash_encode_fwd, _hash_encode_bwd)


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
