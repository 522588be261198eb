import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dnsjax.ops.scatter import sorted_scatter_add, _B, _WPAD


def _ref(idx, vals, R):
    out = np.zeros((R, vals.shape[1]), np.float32)
    np.add.at(out, np.asarray(idx), np.asarray(vals))
    return out


def test_small_fallback_path(rng):
    """Below the kernel thresholds the wrapper must use plain XLA scatter."""
    R, M = 512, 100
    idx = jnp.asarray(rng.integers(0, R, M), jnp.int32)
    vals = jnp.asarray(rng.normal(size=(M, 8)).astype(np.float32))
    got = np.asarray(sorted_scatter_add(idx, vals, R))
    np.testing.assert_allclose(got, _ref(idx, vals, R), atol=1e-5)


def test_kernel_path_correct(rng):
    R, M = 65536, 8 * _B
    idx = jnp.asarray(rng.integers(0, R, M), jnp.int32)
    vals = jnp.asarray(rng.normal(size=(M, 8)).astype(np.float32))
    got = np.asarray(sorted_scatter_add(idx, vals, R))
    ref = _ref(idx, vals, R)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_heavy_collisions(rng):
    """Many contributions landing on few rows (the sorted-window worst case
    for naive scatters, and the case where spans shrink for this kernel)."""
    R, M = 65536, 8 * _B
    idx = jnp.asarray(rng.integers(0, 10, M), jnp.int32)  # 10 hot rows
    vals = jnp.asarray(rng.normal(size=(M, 8)).astype(np.float32))
    got = np.asarray(sorted_scatter_add(idx, vals, R))
    np.testing.assert_allclose(got, _ref(idx, vals, R), rtol=1e-4, atol=1e-4)


def test_degenerate_span_falls_back(rng):
    """A block spanning more than the window must still be exact (the
    lax.cond fallback)."""
    R, M = 65536, 8 * _B
    # indices jumping across the whole table within one block
    idx = jnp.asarray(
        (rng.integers(0, 2, M) * (R - 1 - _WPAD * 2) + rng.integers(0, 100, M)),
        jnp.int32,
    )
    vals = jnp.asarray(rng.normal(size=(M, 8)).astype(np.float32))
    got = np.asarray(sorted_scatter_add(idx, vals, R))
    np.testing.assert_allclose(got, _ref(idx, vals, R), rtol=1e-4, atol=1e-4)


def test_unpadded_length(rng):
    R = 65536
    M = 8 * _B + 137  # not a block multiple
    idx = jnp.asarray(rng.integers(0, R, M), jnp.int32)
    vals = jnp.asarray(rng.normal(size=(M, 8)).astype(np.float32))
    got = np.asarray(sorted_scatter_add(idx, vals, R))
    np.testing.assert_allclose(got, _ref(idx, vals, R), rtol=1e-5, atol=1e-5)
