import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dnsjax.geometry.se3 import invert_se3
from dnsjax.models import (
    DecoderSpec,
    init_decoder_params,
    init_encoder_params,
    encode_images,
    match_features,
    decoder_param_count,
)
from dnsjax.models.features import bilinear_sample
from dnsjax.ops.hashgrid import HashGridSpec
from dnsjax.render.pipeline import render_coarse, render_fine

SPEC = DecoderSpec(
    n_class=6,
    grid=HashGridSpec(4, 2, 10, 4, 64),
    n_bins=16,
)
BOUND = jnp.asarray([[-1.0, 1.0], [-1.0, 1.0], [-1.0, 1.0]])
CAM = dict(H=48, W=64, fx=40.0, fy=40.0, cx=31.5, cy=23.5)


def _params():
    return init_decoder_params(jax.random.PRNGKey(0), SPEC)


def test_decoder_spec_from_config():
    cfg = {
        "model": {
            "pts_dim": 3,
            "pixel_dim": 64,
            "hidden_dim": 32,
            "pos": {"method": "OneBlob", "n_bins": 16},
            "grid": {"method": "HashGrid", "hash_size": 16, "voxel_size": 0.02},
        }
    }
    bound = np.asarray([[-2.9, 8.9], [-3.2, 5.5], [-3.5, 3.3]])
    spec = DecoderSpec.from_config(cfg, bound, n_class=30)
    assert spec.pe_dim == 48 and spec.grid_dim == 32
    assert spec.grid.desired_resolution == int(11.8 / 0.02)
    assert spec.grid.table_size == 2**16


def test_decoder_param_shapes():
    p = _params()
    assert p["fine"]["w"][0].shape == (6, SPEC.pe_dim + SPEC.grid_dim, 32)
    assert p["logit"]["w"][1].shape == (32, 6)
    assert decoder_param_count(p) > 0


def test_encoder_output_shape(rng):
    enc = init_encoder_params()
    imgs = jnp.asarray(rng.uniform(size=(2, 3, 48, 64, 3)).astype(np.float32))
    f = encode_images(enc, imgs)
    assert f.shape == (2, 3, 24, 32, 64)
    assert np.all(np.asarray(f) >= 0)  # post-ReLU


def test_bilinear_sample_exact_at_pixels(rng):
    img = jnp.asarray(rng.normal(size=(8, 10, 4)).astype(np.float32))
    x = jnp.asarray([0.0, 3.0, 9.0])
    y = jnp.asarray([0.0, 5.0, 7.0])
    got = np.asarray(bilinear_sample(img, x, y))
    for k, (xx, yy) in enumerate(zip([0, 3, 9], [0, 5, 7])):
        np.testing.assert_allclose(got[k], np.asarray(img)[yy, xx], atol=1e-6)


def test_match_features_masks_behind_camera(rng):
    params = _params()
    # one reference camera at origin looking down -z
    w2c = jnp.eye(4)[None]
    feats = jnp.asarray(rng.normal(size=(1, 24, 32, 64)).astype(np.float32))
    pts_front = jnp.asarray([[0.0, 0.0, -2.0]])  # visible
    pts_back = jnp.asarray([[0.0, 0.0, 2.0]])  # behind camera
    code_f = match_features(params, pts_front, w2c, feats, CAM, BOUND, SPEC,
                            compute_dtype=jnp.float32)
    code_b = match_features(params, pts_back, w2c, feats, CAM, BOUND, SPEC,
                            compute_dtype=jnp.float32)
    # behind-camera point gets zeroed pixel features -> different code than
    # front point (which gathers real features)
    assert not np.allclose(np.asarray(code_f), np.asarray(code_b))
    assert code_f.shape == (1, 32)


@pytest.mark.slow
def test_render_coarse_shapes_and_grads(rng):
    params = _params()
    N, S = 8, 11
    pts = jnp.asarray(rng.uniform(-0.9, 0.9, size=(N, S, 3)).astype(np.float32))
    z = jnp.sort(jnp.asarray(rng.uniform(0.1, 3, size=(N, S)).astype(np.float32)), -1)
    d = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    code = jnp.asarray(rng.normal(size=(N, S, 32)).astype(np.float32))

    def loss(p):
        out = render_coarse(p, SPEC, pts, z, d, code, BOUND, jnp.float32)
        return jnp.mean(out.color) + jnp.mean(out.depth) + jnp.mean(out.logits)

    out = render_coarse(params, SPEC, pts, z, d, code, BOUND, jnp.float32)
    assert out.color.shape == (N, 3)
    assert out.logits.shape == (N, 6)
    assert np.all(np.isfinite(np.asarray(out.depth)))
    g = jax.grad(loss)(params)
    # gradients reach the hash table and the coarse/out MLPs
    assert float(jnp.sum(jnp.abs(g["table"]))) > 0
    assert float(jnp.sum(jnp.abs(g["coarse"]["w"][0]))) > 0
    assert float(jnp.sum(jnp.abs(g["color"]["w"][0]))) > 0


@pytest.mark.slow
def test_render_fine_uses_class_decoders(rng):
    params = _params()
    N, S = 6, 7
    pts = jnp.asarray(rng.uniform(-0.9, 0.9, size=(N, S, 3)).astype(np.float32))
    z = jnp.sort(jnp.asarray(rng.uniform(0.1, 3, size=(N, S)).astype(np.float32)), -1)
    d = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    code = jnp.zeros((N, S, 32))
    cls_a = jnp.zeros((N,), jnp.int32)
    cls_b = jnp.ones((N,), jnp.int32)
    out_a = render_fine(params, SPEC, pts, z, d, cls_a, code, BOUND, jnp.float32)
    out_b = render_fine(params, SPEC, pts, z, d, cls_b, code, BOUND, jnp.float32)
    # different class -> different fine decoder -> different occupancy/render
    assert not np.allclose(np.asarray(out_a.depth), np.asarray(out_b.depth))
    # coarse latents identical (class-independent)
    np.testing.assert_allclose(
        np.asarray(out_a.coarse_latents), np.asarray(out_b.coarse_latents), atol=1e-6
    )
    assert out_a.fine_latents.shape == (N, S, 33)


@pytest.mark.slow
def test_fine_grads_only_touch_used_classes(rng):
    params = _params()
    N, S = 4, 5
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, size=(N, S, 3)).astype(np.float32))
    z = jnp.sort(jnp.asarray(rng.uniform(0.1, 2, size=(N, S)).astype(np.float32)), -1)
    d = jnp.ones((N, 3))
    code = jnp.zeros((N, S, 32))
    classes = jnp.asarray([0, 0, 2, 2], jnp.int32)

    def loss(p):
        out = render_fine(p, SPEC, pts, z, d, classes, code, BOUND, jnp.float32)
        return jnp.mean(out.depth)

    g = jax.grad(loss)(params)
    gw = np.asarray(g["fine"]["w"][0])  # (C, in, h)
    used = np.abs(gw).sum(axis=(1, 2))
    assert used[0] > 0 and used[2] > 0
    assert used[1] == 0 and used[3] == 0 and used[5] == 0


def test_gabor_encoder_bank():
    """Procedural conv1 bank: shape, determinism, zero-mean Gabors, He norm."""
    from dnsjax.models.encoder import init_encoder_params, _gabor_bank

    w = _gabor_bank()
    assert w.shape == (7, 7, 3, 64)
    norms = np.sqrt((w**2).sum((0, 1, 2)))
    np.testing.assert_allclose(norms, np.sqrt(2.0), rtol=1e-5)
    # oriented filters are zero-mean (no DC response to flat images)
    means = np.abs(w[..., :48].sum((0, 1, 2)))
    assert means.max() < 1e-5
    p1 = init_encoder_params(0, mode="gabor")
    p2 = init_encoder_params(7, mode="gabor")
    np.testing.assert_array_equal(np.asarray(p1["w"]), np.asarray(p2["w"]))
    # random mode still seeded-deterministic and different from gabor
    r1 = init_encoder_params(0, mode="random")
    assert not np.allclose(np.asarray(r1["w"]), np.asarray(p1["w"]))


def test_gabor_encoder_responds_to_texture():
    """Gabor bank separates textured from flat inputs better than chance."""
    import jax.numpy as jnp
    from dnsjax.models.encoder import init_encoder_params, encode_images

    p = init_encoder_params(0, mode="gabor")
    H, W = 32, 32
    y, x = np.mgrid[0:H, 0:W]
    tex = (0.5 + 0.45 * np.sin(x * 1.3) * np.cos(y * 0.9)).astype(np.float32)
    tex_img = np.repeat(tex[..., None], 3, -1)
    flat_img = np.full((H, W, 3), 0.5, np.float32)
    ft = np.asarray(encode_images(p, jnp.asarray(tex_img)[None])[0])
    ff = np.asarray(encode_images(p, jnp.asarray(flat_img)[None])[0])
    # interior only: SAME-padding edge effects excite even zero-mean filters
    ft, ff = ft[3:-3, 3:-3], ff[3:-3, 3:-3]
    assert ft.std() > 5 * max(ff.std(), 1e-6)
