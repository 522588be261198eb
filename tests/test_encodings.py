import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dnsjax.ops.encodings import (
    frequency_encode,
    identity_encode,
    spherical_harmonics_encode,
    get_encoder,
)


def test_frequency_encoding():
    p = jnp.asarray([[0.5, 0.25, 1.0]])
    f = np.asarray(frequency_encode(p, 4))
    assert f.shape == (1, 24)
    # sin(pi * 0.5 * 2^0) = 1
    np.testing.assert_allclose(f[0, 0], 1.0, atol=1e-6)
    assert np.all(np.abs(f) <= 1 + 1e-6)


def test_identity():
    p = jnp.asarray([[1.0, 2.0, 3.0]])
    np.testing.assert_array_equal(np.asarray(identity_encode(p)), [[1, 2, 3]])


def test_spherical_harmonics_orthonormality(rng):
    """Monte-Carlo check: SH bands integrate to ~identity over the sphere."""
    v = rng.normal(size=(20000, 3))
    v = v / np.linalg.norm(v, axis=1, keepdims=True)
    Y = np.asarray(spherical_harmonics_encode(jnp.asarray(v, jnp.float32), 3))
    gram = (Y.T @ Y) / v.shape[0] * (4 * np.pi)
    np.testing.assert_allclose(gram, np.eye(9), atol=0.15)


def test_get_encoder_dispatch(rng):
    pts = jnp.asarray(rng.uniform(size=(10, 3)).astype(np.float32))
    for name, want_dim in [
        ("OneBlob", 48),
        ("Frequency", 72),
        ("Identity", 3),
        ("SphericalHarmonics", 16),
        ("HashGrid", 32),
        ("Dense", 8),
    ]:
        kwargs = {}
        if name == "Dense":
            kwargs = dict(level_dim=2, log2_hashmap_size=18,
                          base_resolution=4, desired_resolution=32)
        fn, dim, params = get_encoder(name, **kwargs)
        assert dim == want_dim, name
        out = fn(params, pts)
        assert out.shape == (10, dim), name
        assert np.all(np.isfinite(np.asarray(out)))


def test_dense_rejects_oversized():
    with pytest.raises(ValueError):
        fn, dim, params = get_encoder(
            "Dense", log2_hashmap_size=8, base_resolution=16,
            desired_resolution=512,
        )
        fn(params, jnp.zeros((2, 3)))
