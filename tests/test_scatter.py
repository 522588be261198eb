import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dnsjax.ops.scatter import (
    sorted_scatter_add, sr_bits16, stochastic_round_bf16, _B, _WPAD,
)


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


def test_stochastic_round_bf16_exact_on_grid(rng):
    """Values already on the bf16 grid pass through unchanged for ANY bits."""
    x = jnp.asarray(
        rng.normal(size=4096).astype(np.float32), jnp.float32
    ).astype(jnp.bfloat16).astype(jnp.float32)
    bits = sr_bits16(jnp.arange(4096), jnp.full((4096,), 7))
    got = np.asarray(stochastic_round_bf16(x, bits))
    np.testing.assert_array_equal(got, np.asarray(x))
    # and every output must itself be bf16-representable
    rt = got.astype(np.float32)
    np.testing.assert_array_equal(
        rt, np.asarray(jnp.asarray(rt).astype(jnp.bfloat16).astype(jnp.float32))
    )


def test_stochastic_round_bf16_unbiased():
    """A constant value strictly between two bf16 neighbors must round to a
    mix of both whose mean recovers the value (round-to-nearest would put
    EVERY element on the same neighbor — the per-element bias that
    gate-failed scatter=pallas, AB_QUALITY.md #4)."""
    lo = np.float32(np.float32(1.0078125))  # bf16-representable
    hi = np.asarray(
        jnp.nextafter(jnp.bfloat16(lo), jnp.bfloat16(2.0)), np.float32
    )
    frac = 0.3
    x = np.float32(lo + frac * (hi - lo))
    n = 1 << 16
    xs = jnp.full((n,), x, jnp.float32)
    bits = sr_bits16(jnp.arange(n), jnp.full((n,), 3))
    got = np.asarray(stochastic_round_bf16(xs, bits))
    assert set(np.unique(got)) == {np.float32(lo), np.float32(hi)}
    p_hi = float((got == hi).mean())
    assert abs(p_hi - frac) < 0.02  # binomial 3-sigma at n=65536 is ~0.005
    assert abs(float(got.mean()) - x) < 0.05 * (hi - lo)


def test_sr_bits16_range_and_spread():
    bits = np.asarray(sr_bits16(jnp.arange(1 << 14), jnp.full((1 << 14,), 1)))
    assert bits.min() >= 0 and bits.max() < (1 << 16)
    # crude uniformity: mean within 2% of 2^15, all 16 value-bits exercised
    assert abs(bits.mean() - (1 << 15)) < 0.02 * (1 << 15)
    assert np.unique(bits >> 12).size == 16


def test_unpadded_length(rng):
    R = 65536
    M = 8 * _B + 137  # not a block multiple
    idx = jnp.asarray(rng.integers(0, R, M), jnp.int32)
    vals = jnp.asarray(rng.normal(size=(M, 8)).astype(np.float32))
    got = np.asarray(sorted_scatter_add(idx, vals, R))
    np.testing.assert_allclose(got, _ref(idx, vals, R), rtol=1e-5, atol=1e-5)


def test_dense_scatter_non_window_multiple_table_falls_back(rng):
    """A table whose packed rows don't tile into 512-row windows must take
    the exact XLA path (the window loop would otherwise drop tail rows)."""
    from dnsjax.ops.scatter import dense_matmul_scatter

    R = 1600 * 16  # packed rows 1600 with F=8: not a multiple of 512
    idx = jnp.asarray(rng.integers(0, R, (1, 4096)), jnp.int32)
    vals = jnp.asarray(rng.normal(size=(1, 4096, 8)).astype(np.float32))
    got = np.asarray(dense_matmul_scatter(idx, vals, R))[0]
    np.testing.assert_allclose(got, _ref(idx[0], vals[0], R), rtol=1e-5,
                               atol=1e-6)


def test_dense_scatter_kernel_path_on_cpu(rng):
    """The PRODUCTION dispatch path (pallas_scatter_viable -> pallas
    kernel, interpret mode on CPU) end to end — a pure-fallback suite
    missed a NameError inside the kernel branch in round 5 that only the
    real-TPU bench hit."""
    from dnsjax.ops.scatter import dense_matmul_scatter, pallas_scatter_viable

    L, N, R, F = 2, 1024, 4096, 8
    assert pallas_scatter_viable(R, F, N)
    idx = jnp.asarray(rng.integers(0, R, (L, N)), jnp.int32)
    vals = jnp.asarray(rng.normal(size=(L, N, F)).astype(np.float32))
    got = np.asarray(dense_matmul_scatter(idx, vals, R), np.float32)
    for l in range(L):
        # split=False quantizes contributions to bf16 — compare loosely
        np.testing.assert_allclose(
            got[l], _ref(idx[l], vals[l], R), rtol=2e-2, atol=2e-2
        )
    got_split = np.asarray(
        dense_matmul_scatter(idx, vals, R, split=True), np.float32
    )
    for l in range(L):
        np.testing.assert_allclose(
            got_split[l], _ref(idx[l], vals[l], R), rtol=1e-4, atol=1e-4
        )


def test_level_partitioned_scatter(rng):
    """When the full (R, F) table fails the VMEM gate, levels whose own
    padded table fits must still take the MXU kernel while the rest share
    one XLA scatter — and the assembled (L, R, F) gradient must equal the
    all-XLA reference on every level (the ScanNet log2=20 dispatch,
    VERDICT r4 missing #4)."""
    from dnsjax.ops.scatter import (
        _level_partition, dense_matmul_scatter, pallas_scatter_viable)

    L, N, R, F = 3, 2048, 1 << 19, 8
    rows_used = (4913, 50653, R)
    assert not pallas_scatter_viable(R, F, N)  # full table: VMEM gate fails
    small, big, R_group = _level_partition(R, F, N, rows_used, True)
    assert small == (0, 1) and big == (2,) and R_group == 57344
    idx = jnp.stack([
        jnp.asarray(rng.integers(0, ru, N), jnp.int32) for ru in rows_used
    ])
    vals = jnp.asarray(rng.normal(size=(L, N, F)).astype(np.float32))
    got = np.asarray(
        dense_matmul_scatter(idx, vals, R, split=True, rows_used=rows_used),
        np.float32,
    )
    for l in range(L):
        np.testing.assert_allclose(
            got[l], _ref(idx[l], vals[l], R), rtol=1e-4, atol=1e-4,
            err_msg=f"level {l}",
        )


def test_hash_encode_bwd_level_partitioned(rng):
    """End-to-end through the hash-encode backward: a table past the VMEM
    gate (log2=19) with dense small levels must produce the same d_table
    through the level-partitioned pallas_split path as through plain XLA
    scatter."""
    from dnsjax.ops.hashgrid import HashGridSpec, hash_encode, init_hash_table

    def spec(scatter):
        return HashGridSpec(
            n_levels=3, n_features=8, log2_hashmap_size=19,
            base_resolution=16, desired_resolution=192,
            interp="tet", scatter=scatter,
        )

    pts = jnp.asarray(rng.uniform(size=(512, 3)).astype(np.float32))
    table = init_hash_table(jax.random.PRNGKey(0), spec("xla"))
    cot = jnp.asarray(
        rng.normal(size=(512, spec("xla").out_dim)).astype(np.float32))

    def d_table(s):
        f = lambda t: jnp.vdot(hash_encode(t, pts, s), cot)
        return np.asarray(jax.grad(f)(table), np.float32)

    # hi/lo split is ~f32-exact, not bit-exact: the second matmul's bf16
    # residual-of-residual leaves O(1e-5) absolute error on collided rows
    np.testing.assert_allclose(
        d_table(spec("pallas_split")), d_table(spec("xla")),
        rtol=1e-4, atol=2e-5,
    )
