"""Differentiable SE(3) / quaternion math.

Conventions match the reference (reference: utils/common.py:406-504):
quaternions are (w, x, y, z); camera tensors are the 7-vector
``[qw, qx, qy, qz, tx, ty, tz]``; poses are camera-to-world 4x4 matrices.

Unlike the reference, rotation->quaternion is a pure-jnp branchless
Shepperd-style conversion (no CPU ``mathutils`` round-trip), so the whole
pose pipeline stays on device and under jit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# 3x3 pose math must not go through bf16 matmul passes (see rays.py).
_einsum = partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


def quat_to_rotation(q: jnp.ndarray) -> jnp.ndarray:
    """(…, 4) wxyz quaternion (not necessarily unit) -> (…, 3, 3) rotation.

    Uses the non-unit-safe form with ``2/|q|^2`` scaling so gradients flow
    through unnormalized optimization variables (reference:
    utils/common.py:406-429).
    """
    qr, qi, qj, qk = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two_s = 2.0 / jnp.sum(q * q, axis=-1)
    r = jnp.stack(
        [
            1 - two_s * (qj**2 + qk**2),
            two_s * (qi * qj - qk * qr),
            two_s * (qi * qk + qj * qr),
            two_s * (qi * qj + qk * qr),
            1 - two_s * (qi**2 + qk**2),
            two_s * (qj * qk - qi * qr),
            two_s * (qi * qk - qj * qr),
            two_s * (qj * qk + qi * qr),
            1 - two_s * (qi**2 + qj**2),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def rotation_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """(…, 3, 3) rotation -> (…, 4) unit wxyz quaternion.

    Branchless Shepperd: compute all four candidate quaternions, pick the one
    anchored on the largest diagonal-derived magnitude. Safe for any proper
    rotation, jit/vmap friendly.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22
    # Four squared magnitudes (up to a common factor of 4): w, x, y, z anchors.
    qw2 = jnp.maximum(0.0, 1.0 + tr)
    qx2 = jnp.maximum(0.0, 1.0 + m00 - m11 - m22)
    qy2 = jnp.maximum(0.0, 1.0 - m00 + m11 - m22)
    qz2 = jnp.maximum(0.0, 1.0 - m00 - m11 + m22)

    # Candidate quaternions (unnormalized), one per anchor.
    cw = jnp.stack([qw2, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    cx = jnp.stack([m21 - m12, qx2, m01 + m10, m02 + m20], axis=-1)
    cy = jnp.stack([m02 - m20, m01 + m10, qy2, m12 + m21], axis=-1)
    cz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, qz2], axis=-1)

    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([cw, cx, cy, cz], axis=-2)  # (..., 4 anchors, 4)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)
    q = q[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # Canonical sign: w >= 0 (mathutils/blender convention used by reference).
    q = q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)
    return q


def camera_from_tensor(t: jnp.ndarray) -> jnp.ndarray:
    """7-vector [quat(wxyz), T] -> (…, 4, 4) c2w (reference: common.py:432-445)."""
    q, T = t[..., :4], t[..., 4:]
    R = quat_to_rotation(q)
    return compose_c2w(R, T)


def tensor_from_camera(c2w: jnp.ndarray) -> jnp.ndarray:
    """(…, 4, 4) or (…, 3, 4) c2w -> 7-vector [quat, T] (reference: common.py:461-483)."""
    R = c2w[..., :3, :3]
    T = c2w[..., :3, 3]
    return jnp.concatenate([rotation_to_quat(R), T], axis=-1)


def compose_c2w(R: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """(…, 3, 3) rotation + (…, 3) translation -> (…, 4, 4) homogeneous."""
    batch = R.shape[:-2]
    top = jnp.concatenate([R, T[..., :, None]], axis=-1)  # (..., 3, 4)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def invert_se3(M: jnp.ndarray) -> jnp.ndarray:
    """Invert a rigid 4x4 transform analytically: [R t]^-1 = [R^T, -R^T t]."""
    R = M[..., :3, :3]
    t = M[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    t_inv = -_einsum("...ij,...j->...i", Rt, t)
    return compose_c2w(Rt, t_inv)


# ---------------------------------------------------------------------------
# Host (numpy) twins — for the driver's per-frame pose bookkeeping. Through
# the remote-TPU tunnel every tiny device computation costs a dispatch AND
# its result fetch costs a full roundtrip; quat<->matrix conversions of ONE
# pose are host work. Semantics identical to the jnp versions above
# (equivalence-tested in tests/test_geometry.py).
# ---------------------------------------------------------------------------

import numpy as _np  # noqa: E402


def quat_to_rotation_np(q: "_np.ndarray") -> "_np.ndarray":
    q = _np.asarray(q, _np.float64)
    qr, qi, qj, qk = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two_s = 2.0 / _np.sum(q * q, axis=-1)
    r = _np.stack(
        [
            1 - two_s * (qj**2 + qk**2),
            two_s * (qi * qj - qk * qr),
            two_s * (qi * qk + qj * qr),
            two_s * (qi * qj + qk * qr),
            1 - two_s * (qi**2 + qk**2),
            two_s * (qj * qk - qi * qr),
            two_s * (qi * qk - qj * qr),
            two_s * (qj * qk + qi * qr),
            1 - two_s * (qi**2 + qj**2),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def rotation_to_quat_np(R: "_np.ndarray") -> "_np.ndarray":
    R = _np.asarray(R, _np.float64)
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    qw2 = _np.maximum(0.0, 1.0 + tr)
    qx2 = _np.maximum(0.0, 1.0 + m00 - m11 - m22)
    qy2 = _np.maximum(0.0, 1.0 - m00 + m11 - m22)
    qz2 = _np.maximum(0.0, 1.0 - m00 - m11 + m22)
    cw = _np.stack([qw2, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    cx = _np.stack([m21 - m12, qx2, m01 + m10, m02 + m20], axis=-1)
    cy = _np.stack([m02 - m20, m01 + m10, qy2, m12 + m21], axis=-1)
    cz = _np.stack([m10 - m01, m02 + m20, m12 + m21, qz2], axis=-1)
    mags = _np.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = _np.argmax(mags, axis=-1)
    cands = _np.stack([cw, cx, cy, cz], axis=-2)
    q = _np.take_along_axis(
        cands, best[..., None, None].repeat(4, -1), axis=-2
    )[..., 0, :]
    q = q / _np.linalg.norm(q, axis=-1, keepdims=True)
    return q * _np.where(q[..., 0:1] < 0, -1.0, 1.0)


def compose_c2w_np(R: "_np.ndarray", T: "_np.ndarray") -> "_np.ndarray":
    batch = R.shape[:-2]
    out = _np.zeros(batch + (4, 4), _np.float64)
    out[..., :3, :3] = R
    out[..., :3, 3] = T
    out[..., 3, 3] = 1.0
    return out


def camera_from_tensor_np(t: "_np.ndarray") -> "_np.ndarray":
    t = _np.asarray(t, _np.float64)
    return compose_c2w_np(quat_to_rotation_np(t[..., :4]), t[..., 4:])


def tensor_from_camera_np(c2w: "_np.ndarray") -> "_np.ndarray":
    c2w = _np.asarray(c2w, _np.float64)
    return _np.concatenate(
        [rotation_to_quat_np(c2w[..., :3, :3]), c2w[..., :3, 3]], axis=-1
    )
