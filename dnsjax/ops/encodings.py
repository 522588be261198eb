"""Additional coordinate encodings (reference: models/pos_encoding.py:6-97).

The reference's ``get_encoder`` dispatches over tcnn encodings; the SLAM
pipeline only uses OneBlob + HashGrid, but Dense grid, SphericalHarmonics,
Frequency, and Identity are part of its surface. dnsjax provides all of
them; ``get_encoder`` mirrors the reference's factory signature.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from dnsjax.ops.hashgrid import HashGridSpec, hash_encode, init_hash_table
from dnsjax.ops.oneblob import oneblob_encode


@partial(jax.jit, static_argnames=("n_frequencies",))
def frequency_encode(pts: jnp.ndarray, n_frequencies: int = 12) -> jnp.ndarray:
    """NeRF-style frequency encoding: (..., D) -> (..., D * 2 * n_freq)."""
    freqs = 2.0 ** jnp.arange(n_frequencies, dtype=pts.dtype)  # (F,)
    ang = pts[..., None] * freqs * math.pi  # (..., D, F)
    out = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    return out.reshape(pts.shape[:-1] + (pts.shape[-1] * 2 * n_frequencies,))


def identity_encode(pts: jnp.ndarray) -> jnp.ndarray:
    return pts


@partial(jax.jit, static_argnames=("degree",))
def spherical_harmonics_encode(dirs: jnp.ndarray, degree: int = 4) -> jnp.ndarray:
    """Real spherical harmonics of unit directions up to ``degree`` bands
    (degree<=4 supported, matching tcnn's common use): (..., 3) -> (..., degree^2)."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    comps = [0.28209479177387814 * jnp.ones_like(x)]
    if degree > 1:
        comps += [
            -0.48860251190291987 * y,
            0.48860251190291987 * z,
            -0.48860251190291987 * x,
        ]
    if degree > 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        comps += [
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.94617469575755997 * zz - 0.31539156525251999,
            -1.0925484305920792 * xz,
            0.54627421529603959 * (xx - yy),
        ]
    if degree > 3:
        comps += [
            0.59004358992664352 * y * (-3.0 * xx + yy),
            2.8906114426405538 * xy * z,
            0.45704579946446572 * y * (1.0 - 5.0 * zz),
            0.3731763325901154 * z * (5.0 * zz - 3.0),
            0.45704579946446572 * x * (1.0 - 5.0 * zz),
            1.4453057213202769 * z * (xx - yy),
            0.59004358992664352 * x * (-xx + 3.0 * yy),
        ]
    return jnp.stack(comps, axis=-1)


@partial(jax.jit, static_argnames=("spec",))
def dense_grid_encode(
    table: jnp.ndarray, pts: jnp.ndarray, spec: HashGridSpec
) -> jnp.ndarray:
    """Dense multi-level grid (reference 'dense' branch, pos_encoding.py:13-28):
    same trilinear multi-level scheme as hash_encode with table sizes forced
    dense — implemented by requiring every level to fit the table."""
    for res in spec.level_resolutions():
        if (int(res) + 1) ** 3 > spec.table_size:
            raise ValueError(
                f"dense grid level res {res} exceeds table (use a bigger "
                "log2_hashmap_size)"
            )
    return hash_encode(table, pts, spec)


def get_encoder(
    encoding: str,
    input_dim: int = 3,
    degree: int = 4,
    n_bins: int = 16,
    n_frequencies: int = 12,
    n_levels: int = 16,
    level_dim: int = 2,
    base_resolution: int = 16,
    log2_hashmap_size: int = 19,
    desired_resolution: int = 512,
    key=None,
) -> Tuple[Callable, int, dict]:
    """Factory mirroring the reference's get_encoder dispatch
    (pos_encoding.py:6-97). Returns (encode_fn, out_dim, params): params is
    {} for parameter-free encodings, {'table': ...} for grids; encode_fn
    takes (params, pts).
    """
    e = encoding.lower()
    if key is None:
        key = jax.random.PRNGKey(0)

    if "dense" in e:
        # NOTE: like the reference factory (pos_encoding.py:14), the dense
        # branch FORCES n_levels=4 regardless of the n_levels argument
        spec = HashGridSpec(4, level_dim, log2_hashmap_size, base_resolution,
                            desired_resolution)
        table = init_hash_table(key, spec)
        return (
            lambda p, x: dense_grid_encode(p["table"], x, spec),
            spec.out_dim,
            {"table": table},
        )
    if "hash" in e or "tiled" in e:
        spec = HashGridSpec(n_levels, level_dim, log2_hashmap_size,
                            base_resolution, desired_resolution)
        table = init_hash_table(key, spec)
        return (
            lambda p, x: hash_encode(p["table"], x, spec),
            spec.out_dim,
            {"table": table},
        )
    if "spherical" in e:
        return (
            lambda p, x: spherical_harmonics_encode(x, degree),
            degree**2,
            {},
        )
    if "blob" in e:
        return lambda p, x: oneblob_encode(x, n_bins), input_dim * n_bins, {}
    if "freq" in e:
        return (
            lambda p, x: frequency_encode(x, n_frequencies),
            input_dim * 2 * n_frequencies,
            {},
        )
    if "identity" in e:
        return lambda p, x: identity_encode(x), input_dim, {}
    raise ValueError(f"unknown encoding {encoding!r}")
