import pytest
import numpy as np
import jax
import jax.numpy as jnp

from dnsjax.render import sample_along_rays, composite_rays
from dnsjax.render.composite import render_weights, composite_channels


def test_sample_along_rays_shapes_and_ordering():
    key = jax.random.PRNGKey(0)
    depth = jnp.asarray([2.0, 0.0, 3.5, 1.0])
    far = jnp.asarray([5.0, 5.0, 5.0, 5.0])
    z = sample_along_rays(key, depth, n_samples=32, n_surface=15, far_bb=far)
    assert z.shape == (4, 47)
    zn = np.asarray(z)
    assert np.all(np.diff(zn, axis=-1) >= 0)
    # zero-depth rays legitimately sample z=0 (near = 1e-3*depth = 0,
    # matching the reference); all others are strictly positive
    assert np.all(zn >= 0)
    assert np.all(zn[np.asarray(depth) > 0] > 0)


@pytest.mark.slow
def test_z_merge_backend_bit_identical():
    """The sort-free merge backend (render/sampling.Z_BACKEND="merge") must
    produce BIT-identical z arrays to jnp.sort — including zero-depth rays
    (shared zero-depth vector), far < near rays (descending linspace), and
    duplicate values."""
    from dnsjax.render import sampling as S

    rng = np.random.default_rng(0)
    cases = []
    for i in range(4):
        n = 64
        depth = rng.uniform(0, 5, n).astype(np.float32)
        depth[rng.uniform(size=n) < 0.3] = 0.0  # zero-depth rays
        far = rng.uniform(0.001, 8, n).astype(np.float32)  # some far < near
        cases.append((jnp.asarray(depth), jnp.asarray(far)))
    # all-zero-depth batch: max_depth == 0, zero-vector descending in t
    cases.append((jnp.zeros(16), jnp.full((16,), 2.0)))
    # adversarial: far within a few ulps of near (= 1e-3 * depth) — the
    # regime where a two-product lerp is NOT float-monotone (review repro);
    # the single-product form must stay merge-safe
    d = rng.uniform(0.5, 5, 64).astype(np.float32)
    near = (1e-3 * d).astype(np.float32)
    ulps = rng.integers(-64, 65, 64).astype(np.int32)
    far_ulp = np.frombuffer(
        (np.frombuffer(near.tobytes(), np.int32) + ulps).tobytes(),
        np.float32,
    ).copy()
    far_ulp = np.abs(far_ulp)
    cases.append((jnp.asarray(d), jnp.asarray(far_ulp)))

    prev = S.Z_BACKEND
    try:
        for ci, (depth, far) in enumerate(cases):
            key = jax.random.PRNGKey(ci)
            S.Z_BACKEND = "sort"
            z_sort = np.asarray(
                S.sample_along_rays(key, depth, 32, 15, far)
            )
            S.Z_BACKEND = "merge"
            z_merge = np.asarray(
                S.sample_along_rays(key, depth, 32, 15, far)
            )
            np.testing.assert_array_equal(z_sort, z_merge)
    finally:
        S.Z_BACKEND = prev


def test_surface_samples_bracket_depth():
    key = jax.random.PRNGKey(1)
    depth = jnp.full((8,), 2.0)
    far = jnp.full((8,), 10.0)
    z = np.asarray(sample_along_rays(key, depth, 0, 15, far))
    # all surface samples within [0.95 d, 1.05 d]
    assert z.min() >= 0.95 * 2.0 - 1e-5 and z.max() <= 1.05 * 2.0 + 1e-5
    # one sample pinned at exactly d (midpoint of the bracket)
    assert np.any(np.isclose(z, 2.0, atol=1e-6))


def test_zero_depth_rays_span_space():
    key = jax.random.PRNGKey(2)
    depth = jnp.asarray([0.0, 4.0])
    far = jnp.asarray([6.0, 6.0])
    z = np.asarray(sample_along_rays(key, depth, 0, 15, far))
    # zero-depth ray samples live in [1e-3, max_depth=4]
    assert z[0].min() >= 1e-3 - 1e-7 and z[0].max() <= 4.0 + 1e-5


def test_stratified_far_clamps_to_bound():
    key = jax.random.PRNGKey(3)
    depth = jnp.asarray([2.0])
    far = jnp.asarray([1.5])  # bound exit closer than 1.2*max_depth
    z = np.asarray(sample_along_rays(key, depth, 32, 0, far))
    assert z.max() <= 1.5 + 1e-5


def numpy_composite(rgb, occ, z, rays_d):
    """Independent numpy oracle for the occupancy compositor."""
    alpha = 1.0 / (1.0 + np.exp(-10.0 * occ))
    t = np.cumprod(
        np.concatenate([np.ones_like(alpha[:, :1]), 1 - alpha + 1e-10], -1), -1
    )[:, :-1]
    w = alpha * t
    w = w / (w.sum(-1, keepdims=True) + 1e-10)
    color = (w[..., None] * rgb).sum(-2)
    depth = (w * z).sum(-1)
    var = (w * (z - depth[:, None]) ** 2).sum(-1)
    return depth, var, color, w


def test_composite_matches_numpy_oracle(rng):
    N, S = 16, 23
    rgb = rng.uniform(size=(N, S, 3)).astype(np.float32)
    occ = rng.normal(size=(N, S)).astype(np.float32)
    z = np.sort(rng.uniform(0.1, 5, size=(N, S)).astype(np.float32), -1)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    depth, var, color, w = composite_rays(
        jnp.asarray(rgb), jnp.asarray(occ), jnp.asarray(z), jnp.asarray(d)
    )
    ed, ev, ec, ew = numpy_composite(rgb, occ, z, d)
    np.testing.assert_allclose(np.asarray(w), ew, atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth), ed, atol=1e-4)
    np.testing.assert_allclose(np.asarray(var), ev, atol=1e-4)
    np.testing.assert_allclose(np.asarray(color), ec, atol=1e-5)


def test_weights_sum_to_one(rng):
    occ = jnp.asarray(rng.normal(size=(8, 40)).astype(np.float32))
    z = jnp.sort(jnp.asarray(rng.uniform(0.1, 5, size=(8, 40)).astype(np.float32)), -1)
    d = jnp.ones((8, 3))
    w = render_weights(occ, z, d)
    np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, atol=1e-5)


def test_opaque_surface_localizes_depth():
    """A single strongly-occupied sample should dominate the render."""
    N, S = 4, 30
    z = jnp.broadcast_to(jnp.linspace(0.1, 3.0, S), (N, S))
    occ = jnp.full((N, S), -5.0)
    occ = occ.at[:, 20].set(5.0)
    rgb = jnp.zeros((N, S, 3)).at[:, 20, :].set(1.0)
    depth, var, color, w = composite_rays(rgb, occ, z, jnp.ones((N, 3)))
    np.testing.assert_allclose(np.asarray(depth), float(z[0, 20]), atol=0.02)
    assert np.all(np.asarray(color) > 0.95)


def test_composite_channels(rng):
    w = jnp.asarray(rng.uniform(size=(5, 7)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(5, 7, 9)).astype(np.float32))
    out = composite_channels(w, v)
    np.testing.assert_allclose(
        np.asarray(out), (np.asarray(w)[..., None] * np.asarray(v)).sum(-2), atol=1e-5
    )


def test_density_mode():
    """occupancy=False volume-density branch behaves like classic NeRF alpha."""
    N, S = 2, 10
    z = jnp.broadcast_to(jnp.linspace(0.1, 1.0, S), (N, S))
    raw = jnp.full((N, S), 100.0)  # opaque everywhere -> first sample wins
    d = jnp.ones((N, 3))
    w = render_weights(raw, z, d, occupancy=False)
    assert float(w[0, 0]) > 0.99
