import pytest
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from dnsjax.losses import (
    masked_mean,
    photometric_loss,
    depth_l1_loss,
    depth_var_loss,
    semantic_ce_loss,
    latent_distill_loss,
    tv_smoothness_loss,
    freespace_opacity_loss,
    approx_occ,
    mse2psnr,
)


def test_masked_mean_equals_subset_mean(rng):
    x = rng.normal(size=(20, 3)).astype(np.float32)
    m = rng.uniform(size=20) > 0.4
    got = float(masked_mean(jnp.asarray(x), jnp.asarray(m)[:, None]))
    np.testing.assert_allclose(got, x[m].mean(), rtol=1e-5)


def test_photometric_matches_torch(rng):
    gt = rng.uniform(size=(50, 3)).astype(np.float32)
    pred = rng.uniform(size=(50, 3)).astype(np.float32)
    m = rng.uniform(size=50) > 0.3
    got = float(photometric_loss(jnp.asarray(gt), jnp.asarray(pred), jnp.asarray(m)))
    want = ((torch.tensor(gt)[m] - torch.tensor(pred)[m]) ** 2).mean().item()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_depth_l1(rng):
    gt = rng.uniform(0, 5, size=60).astype(np.float32)
    gt[:10] = 0.0  # invalid
    pred = rng.uniform(0, 5, size=60).astype(np.float32)
    got = float(depth_l1_loss(jnp.asarray(gt), jnp.asarray(pred)))
    want = np.abs(gt[gt > 0] - pred[gt > 0]).mean()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_depth_var_loss(rng):
    gt = rng.uniform(1, 5, size=40).astype(np.float32)
    pred = rng.uniform(1, 5, size=40).astype(np.float32)
    var = rng.uniform(0.01, 1, size=40).astype(np.float32)
    m = rng.uniform(size=40) > 0.5
    got = float(
        depth_var_loss(jnp.asarray(gt), jnp.asarray(pred), jnp.asarray(var), jnp.asarray(m))
    )
    want = (np.abs(gt - pred) / np.sqrt(var + 1e-10))[m].mean()
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_semantic_ce_matches_torch(rng):
    logits = rng.normal(size=(30, 7)).astype(np.float32)
    labels = rng.integers(0, 7, size=30)
    m = rng.uniform(size=30) > 0.3
    got = float(
        semantic_ce_loss(jnp.asarray(labels), jnp.asarray(logits), jnp.asarray(m))
    )
    want = F.cross_entropy(
        torch.tensor(logits)[m], torch.tensor(labels, dtype=torch.long)[m]
    ).item()
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_latent_distill(rng):
    a = rng.normal(size=(10, 33)).astype(np.float32)
    b = rng.normal(size=(10, 33)).astype(np.float32)
    got = float(latent_distill_loss(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, ((a - b) ** 2).mean(), rtol=1e-5)


def test_tv_smoothness(rng):
    g = rng.normal(size=(7, 7, 7)).astype(np.float32)
    got = float(tv_smoothness_loss(jnp.asarray(g)))
    want = (
        np.sum((g[1:] - g[:-1]) ** 2)
        + np.sum((g[:, 1:] - g[:, :-1]) ** 2)
        + np.sum((g[:, :, 1:] - g[:, :, :-1]) ** 2)
    ) / 8**3
    np.testing.assert_allclose(got, want, rtol=1e-4)
    assert float(tv_smoothness_loss(jnp.ones((7, 7, 7)))) == 0.0


def test_freespace_opacity_matches_reference_semantics(rng):
    """Oracle re-derivation of utils/common.py:769-802 in numpy."""
    N, S = 12, 20
    z = np.sort(rng.uniform(0.1, 5, size=(N, S)).astype(np.float32), -1)
    depth = rng.uniform(1, 4, size=N).astype(np.float32)
    depth[:2] = 0.0
    occ_logit = rng.normal(size=(N, S)).astype(np.float32)
    trunc, sigma = 0.2, 0.05

    occ = 1 / (1 + np.exp(-10 * occ_logit))
    d = depth[:, None]
    front = (z < d - trunc).astype(np.float32)
    back = (z > d + trunc).astype(np.float32)
    dm = (d > 0).astype(np.float32)
    om = (1 - front) * (1 - back) * dm
    want_fs = ((occ * front * dm) ** 2).mean()
    pseudo = 0.5 * np.exp(-0.5 * ((z - d) / sigma) ** 2)
    want_op = ((occ * om - pseudo * om) ** 2).mean()

    fs, op = freespace_opacity_loss(
        jnp.asarray(z), jnp.asarray(depth), jnp.asarray(occ_logit),
        truncation=trunc, sigma=sigma,
    )
    np.testing.assert_allclose(float(fs), want_fs, rtol=1e-4)
    np.testing.assert_allclose(float(op), want_op, rtol=1e-4)


@pytest.mark.slow
def test_freespace_opacity_ray_mask(rng):
    N, S = 10, 8
    z = np.sort(rng.uniform(0.1, 5, size=(N, S)).astype(np.float32), -1)
    depth = rng.uniform(1, 4, size=N).astype(np.float32)
    occ = rng.normal(size=(N, S)).astype(np.float32)
    m = np.zeros(N, bool)
    m[:6] = True
    fs_m, op_m = freespace_opacity_loss(
        jnp.asarray(z), jnp.asarray(depth), jnp.asarray(occ), jnp.asarray(m)
    )
    fs_s, op_s = freespace_opacity_loss(
        jnp.asarray(z[:6]), jnp.asarray(depth[:6]), jnp.asarray(occ[:6])
    )
    np.testing.assert_allclose(float(fs_m), float(fs_s), rtol=1e-4)
    np.testing.assert_allclose(float(op_m), float(op_s), rtol=1e-4)


def test_approx_occ_and_psnr():
    np.testing.assert_allclose(float(approx_occ(jnp.asarray(0.0), 0.05)), 0.5)
    np.testing.assert_allclose(float(mse2psnr(jnp.asarray(0.01))), 20.0, rtol=1e-4)
