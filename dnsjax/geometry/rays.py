"""Ray generation, ray-box intersection, and pinhole projection.

Camera convention (matches the reference exactly — this is load-bearing):

* pixel (i, j): i is the x/column coordinate, j the y/row coordinate.
* camera-frame ray direction is ``[(i-cx)/fx, -(j-cy)/fy, -1]`` (OpenGL-style,
  -z forward), rotated into world by the c2w rotation
  (reference: utils/common.py:248-264, 540-559).
* projection of a camera-frame point (x, y, z): view depth is ``-z``;
  ``u = fx*x/(-z) + cx``, ``v = -fy*y/(-z) + cy``. The reference expresses
  this with ad-hoc sign flips in two places (utils/common.py:645-665 flips
  y and z; slams/mapping.py:216 flips x and divides by the negative z) —
  both reduce to this single canonical form.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

# Pose/ray einsums are tiny (3x3) but precision-critical: TPU "default"
# matmul precision routes f32 through bf16 passes, which costs ~1e-3 relative
# error — enough to displace a projection by a pixel. Pin full f32.
_einsum = partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


def pixel_dirs(i: jnp.ndarray, j: jnp.ndarray, fx, fy, cx, cy) -> jnp.ndarray:
    """Camera-frame ray directions for pixel coords (i=x, j=y). (…,) -> (…, 3)."""
    return jnp.stack(
        [(i - cx) / fx, -(j - cy) / fy, -jnp.ones_like(i)], axis=-1
    )


def rays_from_uv(
    i: jnp.ndarray, j: jnp.ndarray, c2w: jnp.ndarray, fx, fy, cx, cy
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rays for pixel coords under pose ``c2w`` (reference: common.py:248-264).

    Returns (rays_o, rays_d), each (…, 3). rays_d is NOT normalized (the
    compositor multiplies dists by |rays_d|, matching the reference).
    """
    dirs = pixel_dirs(i, j, fx, fy, cx, cy)
    R = c2w[..., :3, :3]
    rays_d = _einsum("...ij,...j->...i", R, dirs)
    rays_o = jnp.broadcast_to(c2w[..., :3, 3], rays_d.shape)
    return rays_o, rays_d


def all_rays(H: int, W: int, c2w: jnp.ndarray, fx, fy, cx, cy):
    """Dense H x W ray grid (reference: common.py:540-559). Returns (H, W, 3) x2."""
    j, i = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                        jnp.arange(W, dtype=jnp.float32), indexing="ij")
    return rays_from_uv(i, j, c2w, fx, fy, cx, cy)


def ray_box_far(
    rays_o: jnp.ndarray, rays_d: jnp.ndarray, bound: jnp.ndarray
) -> jnp.ndarray:
    """Distance along each ray to its exit from the axis-aligned scene bound.

    ``bound`` is (3, 2) [min, max] per axis. Matches the reference formula
    ``min_axis(max_plane((bound - o) / d))`` (reference: tracking.py:148-156),
    with a sign-preserving epsilon on near-zero direction components so
    axis-aligned rays (synthetic scenes, dense mesher ray grids) cannot
    produce NaNs from 0/0. Returns (…,) far distances (un-padded; callers
    add +0.01 as the reference does).
    """
    d = rays_d[..., :, None]
    d = jnp.where(jnp.abs(d) < 1e-9, jnp.where(d < 0, -1e-9, 1e-9), d)
    t = (bound[None, :, :] - rays_o[..., :, None]) / d
    return jnp.min(jnp.max(t, axis=-1), axis=-1)


def project_points(
    pts_cam: jnp.ndarray, fx, fy, cx, cy, eps: float = 1e-5
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Project camera-frame points to pixels under the -z-forward convention.

    Returns (u, v, depth) with depth = -z (positive in front of the camera).
    """
    depth = -pts_cam[..., 2]
    u = fx * pts_cam[..., 0] / (depth + eps) + cx
    v = -fy * pts_cam[..., 1] / (depth + eps) + cy
    return u, v, depth


def world_to_camera(pts_w: jnp.ndarray, w2c: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) world points through (…, 4, 4) w2c -> (…, N, 3) camera frame."""
    R = w2c[..., :3, :3]
    t = w2c[..., :3, 3]
    return _einsum("...ij,nj->...ni", R, pts_w) + t[..., None, :]
