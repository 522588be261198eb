import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dnsjax.geometry import (
    quat_to_rotation,
    rotation_to_quat,
    camera_from_tensor,
    tensor_from_camera,
    invert_se3,
    rays_from_uv,
    all_rays,
    ray_box_far,
    project_points,
)
from dnsjax.geometry.rays import world_to_camera, pixel_dirs


def random_rotation(rng):
    # QR of a random matrix, fixed to det +1
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    return Q


def test_quat_to_rotation_matches_formula(rng):
    q = rng.normal(size=(5, 4))
    R = np.asarray(quat_to_rotation(jnp.asarray(q, jnp.float32)))
    for k in range(5):
        w, x, y, z = q[k]
        s = 2.0 / (q[k] ** 2).sum()
        expect = np.array(
            [
                [1 - s * (y * y + z * z), s * (x * y - z * w), s * (x * z + y * w)],
                [s * (x * y + z * w), 1 - s * (x * x + z * z), s * (y * z - x * w)],
                [s * (x * z - y * w), s * (y * z + x * w), 1 - s * (x * x + y * y)],
            ]
        )
        np.testing.assert_allclose(R[k], expect, rtol=1e-5, atol=1e-5)


def test_quat_rotation_roundtrip(rng):
    for _ in range(20):
        R = random_rotation(rng)
        q = rotation_to_quat(jnp.asarray(R, jnp.float32))
        R2 = quat_to_rotation(q)
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)
        # unit + canonical sign
        assert abs(float(jnp.linalg.norm(q)) - 1.0) < 1e-5
        assert float(q[0]) >= 0.0


def test_rotation_to_quat_degenerate_cases():
    # 180-degree rotations exercise every anchor branch
    for axis in range(3):
        d = -np.ones(3)
        d[axis] = 1.0
        R = np.diag(d)
        q = rotation_to_quat(jnp.asarray(R, jnp.float32))
        R2 = np.asarray(quat_to_rotation(q))
        np.testing.assert_allclose(R2, R, atol=1e-5)
    q = rotation_to_quat(jnp.eye(3))
    np.testing.assert_allclose(np.asarray(q), [1, 0, 0, 0], atol=1e-6)


def test_camera_tensor_roundtrip(rng):
    R = random_rotation(rng)
    T = rng.normal(size=3)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = R
    c2w[:3, 3] = T
    t = tensor_from_camera(jnp.asarray(c2w))
    c2w2 = camera_from_tensor(t)
    np.testing.assert_allclose(np.asarray(c2w2), c2w, atol=1e-5)


def test_invert_se3(rng):
    R = random_rotation(rng)
    T = rng.normal(size=3)
    M = np.eye(4, dtype=np.float32)
    M[:3, :3] = R
    M[:3, 3] = T
    Minv = np.asarray(invert_se3(jnp.asarray(M)))
    np.testing.assert_allclose(Minv @ M, np.eye(4), atol=1e-5)


def test_ray_direction_convention(rng):
    """Rays through the principal point look along -z of the camera frame."""
    fx = fy = 100.0
    cx, cy = 50.0, 40.0
    c2w = jnp.eye(4)
    o, d = rays_from_uv(jnp.array([cx]), jnp.array([cy]), c2w, fx, fy, cx, cy)
    np.testing.assert_allclose(np.asarray(d)[0], [0, 0, -1], atol=1e-6)
    # pixel right of center -> +x; pixel below center (larger j) -> -y
    _, d = rays_from_uv(jnp.array([cx + 10]), jnp.array([cy + 10]), c2w, fx, fy, cx, cy)
    assert float(d[0, 0]) > 0 and float(d[0, 1]) < 0


def test_project_inverts_ray(rng):
    """project(unproject(i,j) * t) == (i,j) for any depth t>0."""
    fx, fy, cx, cy = 120.0, 110.0, 64.0, 48.0
    i = jnp.asarray(rng.uniform(0, 128, size=50), jnp.float32)
    j = jnp.asarray(rng.uniform(0, 96, size=50), jnp.float32)
    dirs = pixel_dirs(i, j, fx, fy, cx, cy)
    t = jnp.asarray(rng.uniform(0.5, 5.0, size=(50, 1)), jnp.float32)
    pts_cam = dirs * t
    u, v, depth = project_points(pts_cam, fx, fy, cx, cy)
    # rtol: f32 rounding at u ~ 100 px is ~1e-5 relative, borderline at a
    # pure atol (same fix as test_project_roundtrip_through_pose)
    np.testing.assert_allclose(np.asarray(u), np.asarray(i), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(v), np.asarray(j), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(t)[:, 0], atol=1e-4)


def test_project_roundtrip_through_pose(rng):
    """World point on a ray projects back to the source pixel in that camera."""
    fx, fy, cx, cy = 200.0, 200.0, 160.0, 120.0
    R = random_rotation(rng)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = R
    c2w[:3, 3] = rng.normal(size=3)
    c2w = jnp.asarray(c2w)
    i = jnp.asarray(rng.uniform(0, 320, size=30), jnp.float32)
    j = jnp.asarray(rng.uniform(0, 240, size=30), jnp.float32)
    o, d = rays_from_uv(i, j, c2w, fx, fy, cx, cy)
    pts_w = o + d * jnp.asarray(rng.uniform(1, 4, size=(30, 1)), jnp.float32)
    w2c = invert_se3(c2w)
    pts_cam = world_to_camera(pts_w, w2c)
    u, v, depth = project_points(pts_cam, fx, fy, cx, cy)
    np.testing.assert_allclose(np.asarray(u), np.asarray(i), rtol=0, atol=2e-2)
    np.testing.assert_allclose(np.asarray(v), np.asarray(j), rtol=0, atol=2e-2)
    assert np.all(np.asarray(depth) > 0)


def test_ray_box_far(rng):
    bound = jnp.asarray([[-1.0, 1.0], [-1.0, 1.0], [-1.0, 1.0]])
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    far = ray_box_far(o, d, bound)
    np.testing.assert_allclose(np.asarray(far), [1.0], atol=1e-6)
    # diagonal ray
    d = jnp.asarray([[1.0, 1.0, 1.0]])
    far = ray_box_far(o, d, bound)
    np.testing.assert_allclose(np.asarray(far), [1.0], atol=1e-6)
    # origin outside on one axis, pointing in
    o = jnp.asarray([[-2.0, 0.0, 0.0]])
    d = jnp.asarray([[1.0, 0.0, 0.001]])
    far = np.asarray(ray_box_far(o, d, bound))
    assert 2.9 < far[0] <= 3.0 + 1e-4


def test_all_rays_shape():
    o, d = all_rays(4, 6, jnp.eye(4), 10.0, 10.0, 3.0, 2.0)
    assert o.shape == (4, 6, 3) and d.shape == (4, 6, 3)
    # ray at pixel (i=3, j=2) is the principal axis
    np.testing.assert_allclose(np.asarray(d)[2, 3], [0, 0, -1], atol=1e-6)


def test_se3_numpy_twins_match_jnp(rng):
    """Host-side quat/pose conversions must equal the jnp versions."""
    import jax
    import jax.numpy as jnp
    from dnsjax.geometry.se3 import (
        camera_from_tensor, camera_from_tensor_np,
        tensor_from_camera, tensor_from_camera_np,
        quat_to_rotation, quat_to_rotation_np,
        rotation_to_quat,
    )

    q = rng.normal(size=(64, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    t = rng.normal(size=(64, 3))
    t7 = np.concatenate([q, t], -1)
    np.testing.assert_allclose(
        camera_from_tensor_np(t7),
        np.asarray(camera_from_tensor(jnp.asarray(t7))),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        quat_to_rotation_np(q),
        np.asarray(quat_to_rotation(jnp.asarray(q))),
        rtol=1e-5, atol=1e-6,
    )
    c2w = camera_from_tensor_np(t7)
    np.testing.assert_allclose(
        tensor_from_camera_np(c2w),
        np.asarray(tensor_from_camera(jnp.asarray(c2w))),
        rtol=1e-5, atol=1e-6,
    )
