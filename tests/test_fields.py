import pytest
import numpy as np
import jax
import jax.numpy as jnp

from dnsjax.ops.hashgrid import (
    HashGridSpec,
    hash_encode,
    hash_encode_ref,
    init_hash_table,
)
from dnsjax.ops.oneblob import oneblob_encode
from dnsjax.ops.mlp import (
    init_mlp,
    init_stacked_mlp,
    mlp_apply,
    mlp_apply_gathered,
)


SPEC = HashGridSpec(
    n_levels=4, n_features=2, log2_hashmap_size=10,
    base_resolution=4, desired_resolution=64,
)


def test_hashgrid_matches_numpy_oracle(rng):
    key = jax.random.PRNGKey(0)
    table = init_hash_table(key, SPEC)
    pts = rng.uniform(size=(100, 3)).astype(np.float32)
    got = np.asarray(hash_encode(table, jnp.asarray(pts), SPEC))
    want = hash_encode_ref(np.asarray(table), pts, SPEC)
    assert got.shape == (100, 8)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_hashgrid_interpolation_is_continuous(rng):
    """Tiny input perturbations produce tiny output changes (trilerp)."""
    table = init_hash_table(jax.random.PRNGKey(1), SPEC)
    p = jnp.asarray(rng.uniform(0.1, 0.9, size=(50, 3)).astype(np.float32))
    e = 1e-5
    a = hash_encode(table, p, SPEC)
    b = hash_encode(table, p + e, SPEC)
    assert float(jnp.max(jnp.abs(a - b))) < 1e-3


def test_hashgrid_vertex_exact(rng):
    """At a grid vertex the encoding equals the stored feature (dense level)."""
    spec = HashGridSpec(1, 2, 12, 4, 4)  # one dense 4-res level
    table = init_hash_table(jax.random.PRNGKey(2), spec)
    # vertex (1,2,3) of the 4-res grid -> dense idx = 1 + 5*(2 + 5*3)
    p = jnp.asarray([[0.25, 0.5, 0.75]])
    got = np.asarray(hash_encode(table, p, spec))[0]
    np.testing.assert_allclose(got, np.asarray(table)[0, 1 + 5 * (2 + 5 * 3)], atol=1e-6)


def test_hashgrid_gradients_flow():
    table = init_hash_table(jax.random.PRNGKey(3), SPEC)
    pts = jnp.asarray([[0.3, 0.4, 0.5], [0.7, 0.1, 0.9]])

    def loss(t):
        return jnp.sum(hash_encode(t, pts, SPEC) ** 2)

    g = jax.grad(loss)(table)
    assert float(jnp.sum(jnp.abs(g))) > 0
    # gradient only touches the gathered corners: sparse
    assert int(jnp.sum(jnp.any(g != 0, axis=-1))) <= 2 * 8 * SPEC.n_levels


def test_oneblob_shape_and_mass():
    # bin centers, not edges (0.5 sits exactly between bins 7 and 8)
    pts = jnp.asarray([[0.53125, 0.28125, 0.90625]])
    f = np.asarray(oneblob_encode(pts, 16))
    assert f.shape == (1, 48)
    # bins integrate to ~1 for interior points (Gaussian mass inside [0,1])
    per_dim = f.reshape(3, 16)
    assert per_dim.sum(-1).min() > 0.85
    # peak bin is the one containing x
    assert np.argmax(per_dim[0]) == 8
    assert np.argmax(per_dim[1]) == 4
    assert np.argmax(per_dim[2]) == 14


def test_oneblob_continuity():
    a = oneblob_encode(jnp.asarray([[0.5, 0.5, 0.5]]), 16)
    b = oneblob_encode(jnp.asarray([[0.5001, 0.5, 0.5]]), 16)
    assert float(jnp.max(jnp.abs(a - b))) < 1e-2


def test_mlp_matches_numpy(rng):
    params = init_mlp(jax.random.PRNGKey(0), 8, 16, 4)
    x = rng.normal(size=(10, 8)).astype(np.float32)
    got = np.asarray(mlp_apply(params, jnp.asarray(x), compute_dtype=jnp.float32))
    w0, w1 = [np.asarray(w) for w in params["w"]]
    b0, b1 = [np.asarray(b) for b in params["b"]]
    want = np.maximum(x @ w0 + b0, 0) @ w1 + b1
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_stacked_mlp_gather_matches_per_class(rng):
    C, N, S = 5, 12, 3
    stacked = init_stacked_mlp(jax.random.PRNGKey(1), C, 8, 16, 4)
    classes = jnp.asarray(rng.integers(0, C, size=N))
    x = jnp.asarray(rng.normal(size=(N, S, 8)).astype(np.float32))
    got = np.asarray(mlp_apply_gathered(stacked, classes, x, compute_dtype=jnp.float32))
    for n in range(N):
        c = int(classes[n])
        per = {
            "w": [w[c] for w in stacked["w"]],
            "b": [b[c] for b in stacked["b"]],
        }
        want = np.asarray(mlp_apply(per, x[n], compute_dtype=jnp.float32))
        np.testing.assert_allclose(got[n], want, atol=1e-4)


def test_stacked_mlp_onehot_s1_matches_per_class(rng):
    """S=1 dispatches to the one-hot weight-selection path (the mesh-query
    fast path, ops/mlp.py); it must match the per-class networks exactly
    like the gathered path does, in both compute dtypes."""
    C, N = 7, 23
    stacked = init_stacked_mlp(jax.random.PRNGKey(3), C, 8, 16, 4)
    classes = jnp.asarray(rng.integers(0, C, size=N))
    x = jnp.asarray(rng.normal(size=(N, 1, 8)).astype(np.float32))
    got = np.asarray(
        mlp_apply_gathered(stacked, classes, x, compute_dtype=jnp.float32)
    )
    assert got.shape == (N, 1, 4)
    for n in range(N):
        c = int(classes[n])
        per = {
            "w": [w[c] for w in stacked["w"]],
            "b": [b[c] for b in stacked["b"]],
        }
        want = np.asarray(mlp_apply(per, x[n], compute_dtype=jnp.float32))
        np.testing.assert_allclose(got[n], want, atol=1e-4)
    # bf16: one-hot row selection reproduces the bf16-cast weights exactly,
    # so it stays close to the S>1 gathered path on identical inputs
    x2 = jnp.concatenate([x, x], axis=1)  # (N, 2, 8) -> gathered path
    g2 = np.asarray(
        mlp_apply_gathered(stacked, classes, x2, compute_dtype=jnp.bfloat16)
    )[:, :1]
    g1 = np.asarray(
        mlp_apply_gathered(stacked, classes, x, compute_dtype=jnp.bfloat16)
    )
    np.testing.assert_allclose(g1, g2, rtol=2e-2, atol=2e-2)


def test_mlp_bf16_close_to_f32(rng):
    params = init_mlp(jax.random.PRNGKey(2), 80, 32, 33)
    x = jnp.asarray(rng.normal(size=(64, 80)).astype(np.float32))
    f32 = mlp_apply(params, x, compute_dtype=jnp.float32)
    bf16 = mlp_apply(params, x, compute_dtype=jnp.bfloat16)
    rel = float(jnp.max(jnp.abs(f32 - bf16)) / (jnp.max(jnp.abs(f32)) + 1e-8))
    assert rel < 0.05


# ---------------------------------------------------------------------------
# Tetrahedral (4-corner) interpolation mode
# ---------------------------------------------------------------------------

TET_SPEC = HashGridSpec(
    n_levels=4, n_features=2, log2_hashmap_size=10,
    base_resolution=4, desired_resolution=64, interp="tet",
)


def test_tet_matches_numpy_oracle(rng):
    table = init_hash_table(jax.random.PRNGKey(0), TET_SPEC)
    pts = rng.uniform(size=(100, 3)).astype(np.float32)
    got = np.asarray(hash_encode(table, jnp.asarray(pts), TET_SPEC))
    want = hash_encode_ref(np.asarray(table), pts, TET_SPEC)
    assert got.shape == (100, 8)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_tet_weights_partition_of_unity(rng):
    """Constant table -> constant field (weights sum to 1 everywhere)."""
    spec = TET_SPEC
    table = jnp.full((spec.n_levels, spec.table_size, spec.n_features), 0.37)
    pts = jnp.asarray(rng.uniform(size=(200, 3)).astype(np.float32))
    out = hash_encode(table, pts, spec)
    np.testing.assert_allclose(np.asarray(out), 0.37, atol=1e-6)


def test_tet_continuous_across_cells_and_tets(rng):
    """C0 across cell faces AND internal tetrahedron faces (f_i == f_j)."""
    table = init_hash_table(jax.random.PRNGKey(1), TET_SPEC)
    # points straddling internal tet faces: two equal frac coords
    base = rng.uniform(0.1, 0.9, size=(50, 3)).astype(np.float32)
    base[:, 1] = base[:, 0]  # on the f0 == f1 plane of every level
    p = jnp.asarray(base)
    e = 1e-5
    for d in ([e, -e, 0], [-e, e, 0], [0, 0, e]):
        a = hash_encode(table, p, TET_SPEC)
        b = hash_encode(table, p + jnp.asarray(d), TET_SPEC)
        assert float(jnp.max(jnp.abs(a - b))) < 1e-3
    # and across cell boundaries (integer lattice planes of level 0)
    q = np.copy(base)
    q[:, 0] = np.round(base[:, 0] * 4) / 4
    qj = jnp.asarray(q)
    a = hash_encode(table, qj - jnp.asarray([e, 0, 0]), TET_SPEC)
    b = hash_encode(table, qj + jnp.asarray([e, 0, 0]), TET_SPEC)
    assert float(jnp.max(jnp.abs(a - b))) < 1e-3


def test_tet_vertex_exact():
    spec = HashGridSpec(1, 2, 12, 4, 4, interp="tet")
    table = init_hash_table(jax.random.PRNGKey(2), spec)
    p = jnp.asarray([[0.25, 0.5, 0.75]])
    got = np.asarray(hash_encode(table, p, spec))[0]
    np.testing.assert_allclose(got, np.asarray(table)[0, 1 + 5 * (2 + 5 * 3)], atol=1e-6)


def test_tet_position_gradient_matches_fd(rng):
    """Analytic d/dp == central finite differences (inside one tet)."""
    table = init_hash_table(jax.random.PRNGKey(3), TET_SPEC) * 1e3
    g_out = jnp.asarray(rng.normal(size=(1, 8)).astype(np.float32))

    def f(p):
        return jnp.vdot(hash_encode(table, p[None], TET_SPEC), g_out)

    p0 = jnp.asarray([0.312, 0.571, 0.433])  # distinct fracs at all levels
    grad = np.asarray(jax.grad(f)(p0))
    e = 1e-4
    for k in range(3):
        d = np.zeros(3, np.float32)
        d[k] = e
        fd = (float(f(p0 + d)) - float(f(p0 - d))) / (2 * e)
        np.testing.assert_allclose(grad[k], fd, rtol=2e-2)


@pytest.mark.slow
def test_stochastic_level_backward_unbiased(rng):
    """grad_levels=1 scatter expectation == exact per-level scatter."""
    exact_spec = HashGridSpec(4, 2, 8, 4, 32, grad_corners=8)
    sto_spec = HashGridSpec(4, 2, 8, 4, 32, grad_corners=8, grad_levels=1)
    table = init_hash_table(jax.random.PRNGKey(4), exact_spec)

    def table_grad(spec, pts):
        return jax.grad(lambda t: jnp.sum(hash_encode(t, pts, spec)))(table)

    # expectation over many points: totals per level should agree within
    # sampling noise (the level estimator is unbiased, scaled by L)
    pts = jnp.asarray(rng.uniform(size=(20000, 3)).astype(np.float32))
    ge = np.asarray(table_grad(exact_spec, pts)).sum((1, 2))
    gs = np.asarray(table_grad(sto_spec, pts)).sum((1, 2))
    np.testing.assert_allclose(gs, ge, rtol=0.05)


@pytest.mark.slow
def test_tet_stochastic_corner_unbiased(rng):
    exact_spec = HashGridSpec(2, 2, 8, 4, 16, interp="tet", grad_corners=4)
    sto_spec = HashGridSpec(2, 2, 8, 4, 16, interp="tet", grad_corners=1)
    table = init_hash_table(jax.random.PRNGKey(5), exact_spec)
    pts = jnp.asarray(rng.uniform(size=(30000, 3)).astype(np.float32))

    def table_grad(spec):
        return jax.grad(lambda t: jnp.sum(hash_encode(t, pts, spec)))(table)

    ge = np.asarray(table_grad(exact_spec)).sum((1, 2))
    gs = np.asarray(table_grad(sto_spec)).sum((1, 2))
    np.testing.assert_allclose(gs, ge, rtol=0.05)


def test_oneblob_quartic_close_to_gaussian(rng):
    pts = jnp.asarray(rng.uniform(0.05, 0.95, size=(64, 3)), jnp.float32)
    g = np.asarray(oneblob_encode(pts, 16, "gaussian"))
    q = np.asarray(oneblob_encode(pts, 16, "quartic"))
    # both are unit-mass kernels with matched std; per-bin agreement ~1e-2
    assert np.abs(g - q).max() < 0.05
    # interior points (> sqrt(7)*sigma from the edges): the quartic's finite
    # support puts ALL mass inside [0,1]
    pts_in = jnp.asarray(rng.uniform(0.25, 0.75, size=(64, 3)), jnp.float32)
    mass = np.asarray(oneblob_encode(pts_in, 16, "quartic"))
    mass = mass.reshape(64, 3, 16).sum(-1)
    np.testing.assert_allclose(mass, 1.0, atol=1e-5)


def test_oneblob_quartic_gradients_finite(rng):
    pts = jnp.asarray(rng.uniform(0.0, 1.0, size=(32, 3)), jnp.float32)

    def f(p):
        return jnp.sum(oneblob_encode(p, 16, "quartic") ** 2)

    g = jax.grad(f)(pts)
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.slow
def test_pallas_scatter_backward_matches_xla(rng):
    """The dense matmul-scatter table gradient equals the XLA scatter
    gradient (split mode ~f32-exact; bf16 mode to quantization tolerance),
    for both stochastic-corner and exact-corner backwards."""
    pts = jnp.asarray(rng.uniform(size=(3000, 3)).astype(np.float32))
    for gc in (1, 4):
        base = dict(
            n_levels=2, n_features=8, log2_hashmap_size=11,
            base_resolution=4, desired_resolution=16,
            interp="tet", grad_corners=gc,
        )
        xla = HashGridSpec(**base, scatter="xla")
        pal = HashGridSpec(**base, scatter="pallas_split")
        table = init_hash_table(jax.random.PRNGKey(7), xla)

        def loss(t, spec):
            return jnp.sum(hash_encode(t, pts, spec) ** 2)

        g_x = jax.grad(loss)(table, xla)
        g_p = jax.grad(loss)(table, pal)
        np.testing.assert_allclose(
            np.asarray(g_p), np.asarray(g_x), rtol=2e-4, atol=1e-6,
            err_msg=f"grad_corners={gc}",
        )

        g_b = jax.grad(loss)(table, HashGridSpec(**base, scatter="pallas"))
        scale = np.abs(np.asarray(g_x)).max()
        assert np.abs(np.asarray(g_b) - np.asarray(g_x)).max() < 2e-2 * scale

        # stochastic rounding: same quantization tolerance elementwise, but
        # the aggregate signed error must shrink toward zero (unbiased),
        # unlike plain bf16 round-to-nearest
        g_s = jax.grad(loss)(table, HashGridSpec(**base, scatter="pallas_sr"))
        err = np.asarray(g_s) - np.asarray(g_x)
        assert np.abs(err).max() < 3e-2 * scale
        assert abs(err.mean()) < 5e-5 * scale, f"grad_corners={gc}"


@pytest.mark.slow
def test_pallas_scatter_fallback_big_table(rng):
    """Tables too big for VMEM silently fall back to the XLA scatter."""
    pts = jnp.asarray(rng.uniform(size=(500, 3)).astype(np.float32))
    base = dict(
        n_levels=1, n_features=2, log2_hashmap_size=20,
        base_resolution=4, desired_resolution=512, grad_corners=8,
    )
    xla = HashGridSpec(**base, scatter="xla")
    pal = HashGridSpec(**base, scatter="pallas")
    table = init_hash_table(jax.random.PRNGKey(2), xla)

    def loss(t, spec):
        return jnp.sum(hash_encode(t, pts, spec) ** 2)

    # collision rows accumulate in a different order -> f32 rounding
    np.testing.assert_allclose(
        np.asarray(jax.grad(loss)(table, pal)),
        np.asarray(jax.grad(loss)(table, xla)),
        rtol=1e-4, atol=1e-6,
    )


@pytest.mark.slow
def test_pallas_gather_forward_matches_xla(rng):
    """The fused matmul-gather forward reproduces the gather_bf16 XLA path
    (bf16 rows, f32 weights) to summation-order tolerance, for both interp
    modes, with dense + hashed levels and a non-block-multiple N."""
    pts = jnp.asarray(rng.uniform(size=(3000, 3)).astype(np.float32))
    for interp in ("tet", "trilinear"):
        base = dict(
            n_levels=3, n_features=8, log2_hashmap_size=14,
            base_resolution=4, desired_resolution=32,
            interp=interp, gather_bf16=True,
        )
        xla = HashGridSpec(**base, gather="xla")
        pal = HashGridSpec(**base, gather="pallas")
        table = init_hash_table(jax.random.PRNGKey(3), xla)
        np.testing.assert_allclose(
            np.asarray(hash_encode(table, pts, pal)),
            np.asarray(hash_encode(table, pts, xla)),
            rtol=1e-5, atol=1e-7, err_msg=interp,
        )


@pytest.mark.slow
def test_pallas_gather_gradients_match_xla(rng):
    """Table AND position gradients through the pallas-gather forward match
    the XLA path (the kernel's per-corner feats residual must be the same
    bf16-quantized rows the XLA backward saved)."""
    pts = jnp.asarray(rng.uniform(size=(2000, 3)).astype(np.float32))
    for gc in (1, 4):
        base = dict(
            n_levels=2, n_features=8, log2_hashmap_size=11,
            base_resolution=4, desired_resolution=16,
            interp="tet", grad_corners=gc, gather_bf16=True,
        )
        xla = HashGridSpec(**base, gather="xla")
        pal = HashGridSpec(**base, gather="pallas")
        table = init_hash_table(jax.random.PRNGKey(7), xla)

        def loss(t, q, spec):
            return jnp.sum(hash_encode(t, q, spec) ** 2)

        gt_x, gp_x = jax.grad(loss, argnums=(0, 1))(table, pts, xla)
        gt_p, gp_p = jax.grad(loss, argnums=(0, 1))(table, pts, pal)
        np.testing.assert_allclose(
            np.asarray(gt_p), np.asarray(gt_x), rtol=1e-5, atol=1e-7,
            err_msg=f"table grad, grad_corners={gc}",
        )
        np.testing.assert_allclose(
            np.asarray(gp_p), np.asarray(gp_x), rtol=1e-4, atol=1e-6,
            err_msg=f"pos grad, grad_corners={gc}",
        )


def test_pallas_gather_requires_bf16_and_falls_back(rng):
    """gather=pallas without gather_bf16 (or with an over-size table) must
    silently take the exact XLA path."""
    pts = jnp.asarray(rng.uniform(size=(500, 3)).astype(np.float32))
    f32 = HashGridSpec(4, 2, 10, 4, 64, gather="pallas")  # no gather_bf16
    table = init_hash_table(jax.random.PRNGKey(1), f32)
    np.testing.assert_allclose(
        np.asarray(hash_encode(table, pts, f32)),
        hash_encode_ref(np.asarray(table), np.asarray(pts), f32),
        rtol=1e-5, atol=1e-6,
    )
    big = HashGridSpec(
        1, 2, 21, 4, 512, gather="pallas", gather_bf16=True
    )  # 2^21 x 2 bf16 = 8 MB > VMEM budget -> fallback
    table_b = init_hash_table(jax.random.PRNGKey(2), big)
    xla_b = HashGridSpec(1, 2, 21, 4, 512, gather_bf16=True)
    np.testing.assert_allclose(
        np.asarray(hash_encode(table_b, pts, big)),
        np.asarray(hash_encode(table_b, pts, xla_b)),
        rtol=1e-6, atol=1e-8,
    )
