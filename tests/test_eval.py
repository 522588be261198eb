import numpy as np
import pytest

from dnsjax.eval import align_horn, evaluate_ate, psnr, ssim, ms_ssim
from dnsjax.eval.semantic import semantic_metrics, confusion_matrix
from dnsjax.eval.mesh_metrics import mesh_metrics, sample_surface
from dnsjax.mesh.marching import marching_tetrahedra


def random_rigid(rng):
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    return Q, rng.normal(size=(3, 1))


def test_horn_alignment_exact(rng):
    pts = rng.normal(size=(3, 50))
    R, t = random_rigid(rng)
    moved = R @ pts + t
    R2, t2, err = align_horn(pts, moved)
    assert err.max() < 1e-10
    np.testing.assert_allclose(R2, R, atol=1e-10)


def test_evaluate_ate_stats(rng, tmp_path):
    n = 40
    gt = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
    gt[:, :3, 3] = rng.normal(size=(n, 3))
    R, t = random_rigid(rng)
    est = gt.copy()
    est[:, :3, 3] = (R @ gt[:, :3, 3].T + t).T
    noise = rng.normal(scale=0.01, size=(n, 3))
    est[:, :3, 3] += noise
    stats = evaluate_ate(est, gt, plot_path=str(tmp_path / "traj.png"))
    # alignment removes the rigid offset, leaving ~the injected noise
    assert stats["absolute_translational_error.rmse"] < 0.02
    assert stats["compared_pose_pairs"] == n
    assert (tmp_path / "traj.png").exists()


def test_evaluate_ate_masks_invalid():
    gt = np.tile(np.eye(4), (10, 1, 1))
    gt[3, 0, 3] = np.nan
    est = np.tile(np.eye(4), (10, 1, 1))
    stats = evaluate_ate(est, gt)
    assert stats["compared_pose_pairs"] == 9


def test_psnr():
    a = np.zeros((16, 16, 3))
    b = np.full_like(a, 0.1)
    np.testing.assert_allclose(psnr(a, b), 20.0, atol=1e-6)
    assert psnr(a, a) >= 120.0 - 1


def test_psnr_masked():
    a = np.zeros((8, 8, 3))
    b = a.copy()
    b[0, 0] = 1.0  # corrupt one pixel
    mask = np.ones((8, 8), bool)
    mask[0, 0] = False
    assert psnr(a, b, mask) > 100


def test_ssim_properties(rng):
    img = rng.uniform(size=(64, 64, 3))
    assert ssim(img, img) > 0.999
    noisy = np.clip(img + rng.normal(scale=0.2, size=img.shape), 0, 1)
    s = ssim(img, noisy)
    assert 0.0 < s < 0.9
    # more noise -> lower ssim
    noisier = np.clip(img + rng.normal(scale=0.5, size=img.shape), 0, 1)
    assert ssim(img, noisier) < s


def test_ms_ssim(rng):
    img = rng.uniform(size=(192, 192, 3))
    assert ms_ssim(img, img) > 0.999
    noisy = np.clip(img + rng.normal(scale=0.3, size=img.shape), 0, 1)
    assert ms_ssim(img, noisy) < 0.95


def test_semantic_metrics_perfect():
    gt = np.array([[0, 1], [2, 2]])
    m = semantic_metrics(gt, gt, 3)
    assert m["miou"] == 1.0 and m["total_acc"] == 1.0 and m["fwiou"] == 1.0


def test_semantic_metrics_known_values():
    gt = np.array([0, 0, 1, 1])
    pred = np.array([0, 1, 1, 1])
    m = semantic_metrics(gt, pred, 2)
    # class 0: tp=1 fp=0 fn=1 -> iou 0.5; class 1: tp=2 fp=1 fn=0 -> 2/3
    np.testing.assert_allclose(m["per_class_iou"], [0.5, 2 / 3], atol=1e-9)
    np.testing.assert_allclose(m["miou"], (0.5 + 2 / 3) / 2)
    np.testing.assert_allclose(m["total_acc"], 0.75)


def test_confusion_matrix_ignores_out_of_range():
    gt = np.array([0, 1, -1, 5])
    pred = np.array([0, 1, 0, 0])
    cm = confusion_matrix(gt, pred, 2)
    assert cm.sum() == 2


def test_mesh_metrics_identical_spheres():
    ax = np.linspace(-1.3, 1.3, 32)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    sp = ax[1] - ax[0]
    vals = 1.0 - np.sqrt(X**2 + Y**2 + Z**2)
    v, f = marching_tetrahedra(vals, 0.0, (-1.3,) * 3, (sp,) * 3)
    m = mesh_metrics(v, f, v, f, n_samples=20_000)
    # mean NN distance between two independent 20k samplings of a 12.6 m^2
    # sphere is ~sqrt(A/N)/2 ~ 1.25 cm: that's the sampling-noise floor
    assert m["accuracy_cm"] < 2.0
    assert m["completion_cm"] < 2.0
    assert m["completion_ratio_pct"] > 99.0


def test_mesh_metrics_offset_sphere():
    ax = np.linspace(-1.5, 1.5, 32)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    sp = ax[1] - ax[0]
    v1, f1 = marching_tetrahedra(
        1.0 - np.sqrt(X**2 + Y**2 + Z**2), 0.0, (-1.5,) * 3, (sp,) * 3
    )
    v2 = v1 + np.array([0.1, 0, 0], np.float32)  # 10 cm shift
    m = mesh_metrics(v2, f1, v1, f1, n_samples=20_000)
    assert 2.0 < m["accuracy_cm"] < 11.0


def test_sample_surface_on_mesh():
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    f = np.array([[0, 1, 2]], np.int32)
    pts = sample_surface(v, f, 1000)
    assert np.allclose(pts[:, 2], 0)
    assert (pts[:, 0] >= -1e-9).all() and (pts[:, 1] >= -1e-9).all()
    assert (pts[:, 0] + pts[:, 1] <= 1 + 1e-9).all()


# ---------------------------------------------------------------------------
# LPIPS (tiny random-weight fixture; validates the conv/normalize/head math
# against a direct numpy oracle, plus metric properties)
# ---------------------------------------------------------------------------

def _tiny_lpips_npz(path):
    """Deterministic small-channel AlexNet-shaped LPIPS weights."""
    r = np.random.default_rng(7)
    chans = [(3, 8, 11), (8, 12, 5), (12, 16, 3), (16, 16, 3), (16, 16, 3)]
    out = {}
    for i, (cin, cout, k) in enumerate(chans):
        out[f"conv{i}_w"] = r.normal(scale=0.1, size=(cout, cin, k, k)).astype(np.float32)
        out[f"conv{i}_b"] = r.normal(scale=0.1, size=(cout,)).astype(np.float32)
        out[f"lin{i}_w"] = np.abs(r.normal(size=(cout,))).astype(np.float32)
    out["shift"] = np.array([-0.030, -0.088, -0.188], np.float32)
    out["scale"] = np.array([0.458, 0.448, 0.450], np.float32)
    np.savez(path, **out)
    return out


def _np_conv(x, w, b, stride, pad):
    """Direct NCHW conv oracle via sliding windows."""
    from numpy.lib.stride_tricks import sliding_window_view

    x = np.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    win = sliding_window_view(x, (w.shape[1], w.shape[2], w.shape[3]), axis=(1, 2, 3))
    win = win[:, 0, ::stride, ::stride]  # (N, Ho, Wo, Cin, kh, kw)
    return np.einsum("nhwikl,oikl->nohw", win, w) + b[None, :, None, None]


def _np_lpips(weights, a, b):
    layout = [(4, 2, True), (1, 2, True), (1, 1, False), (1, 1, False), (1, 1, False)]

    def pool(x):
        from numpy.lib.stride_tricks import sliding_window_view

        win = sliding_window_view(x, (3, 3), axis=(2, 3))[:, :, ::2, ::2]
        return win.max((-1, -2))

    def taps(x):
        x = (x - weights["shift"].reshape(1, 3, 1, 1)) / weights["scale"].reshape(1, 3, 1, 1)
        outs = []
        for i, (stride, pad, do_pool) in enumerate(layout):
            x = np.maximum(_np_conv(x, weights[f"conv{i}_w"], weights[f"conv{i}_b"], stride, pad), 0)
            outs.append(x)
            if do_pool:
                x = pool(x)
        return outs

    total = 0.0
    for i, (fa, fb) in enumerate(zip(taps(a), taps(b))):
        na = fa / np.sqrt((fa**2).sum(1, keepdims=True) + 1e-10)
        nb = fb / np.sqrt((fb**2).sum(1, keepdims=True) + 1e-10)
        lin = np.maximum(weights[f"lin{i}_w"], 0)
        total += ((na - nb) ** 2 * lin[None, :, None, None]).sum(1).mean()
    return total


def test_lpips_matches_numpy_oracle(tmp_path, monkeypatch):
    from dnsjax.eval.render_metrics import lpips

    path = str(tmp_path / "tiny_lpips.npz")
    weights = _tiny_lpips_npz(path)
    monkeypatch.setenv("DNSJAX_LPIPS_NPZ", path)
    r = np.random.default_rng(3)
    a = r.uniform(size=(64, 64, 3)).astype(np.float32)
    b = np.clip(a + r.normal(scale=0.1, size=a.shape).astype(np.float32), 0, 1)
    got = lpips(a, b)
    want = _np_lpips(weights, (a * 2 - 1).transpose(2, 0, 1)[None], (b * 2 - 1).transpose(2, 0, 1)[None])
    assert got == pytest.approx(want, rel=1e-3)


def test_lpips_properties(tmp_path, monkeypatch):
    from dnsjax.eval.render_metrics import lpips

    path = str(tmp_path / "tiny_lpips.npz")
    _tiny_lpips_npz(path)
    monkeypatch.setenv("DNSJAX_LPIPS_NPZ", path)
    r = np.random.default_rng(5)
    a = r.uniform(size=(48, 48, 3)).astype(np.float32)
    small = np.clip(a + r.normal(scale=0.02, size=a.shape), 0, 1).astype(np.float32)
    big = np.clip(a + r.normal(scale=0.3, size=a.shape), 0, 1).astype(np.float32)
    assert lpips(a, a) == pytest.approx(0.0, abs=1e-6)
    assert lpips(a, big) > lpips(a, small) > 0
    assert lpips(a, big) == pytest.approx(lpips(big, a), rel=1e-5)


def test_lpips_disabled_without_weights(monkeypatch):
    from dnsjax.eval.render_metrics import lpips

    monkeypatch.delenv("DNSJAX_LPIPS_NPZ", raising=False)
    assert lpips(np.zeros((8, 8, 3)), np.ones((8, 8, 3))) is None


def test_lpips_real_alexnet_schema(tmp_path, monkeypatch):
    """End-to-end LPIPS through an npz with the EXACT schema and shapes
    scripts/export_lpips.py writes (AlexNet-features channel counts),
    synthetic-valued — validates the import pathway before any real
    weight hand-off (reference metric: eval_2d.py:304-305)."""
    from dnsjax.eval.render_metrics import lpips, _LPIPS_CACHE

    rng = np.random.default_rng(3)
    shapes = [  # torchvision alexnet .features convs
        (64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
        (256, 384, 3, 3), (256, 256, 3, 3),
    ]
    out = {}
    for i, s in enumerate(shapes):
        out[f"conv{i}_w"] = (rng.normal(size=s) / np.sqrt(np.prod(s[1:]))).astype(np.float32)
        out[f"conv{i}_b"] = np.zeros(s[0], np.float32)
        out[f"lin{i}_w"] = rng.uniform(0, 0.1, size=s[0]).astype(np.float32)
    out["shift"] = np.asarray([-0.030, -0.088, -0.188], np.float32)
    out["scale"] = np.asarray([0.458, 0.448, 0.450], np.float32)
    path = str(tmp_path / "alex_schema.npz")
    np.savez(path, **out)

    monkeypatch.setenv("DNSJAX_LPIPS_NPZ", path)
    _LPIPS_CACHE.clear()
    a = rng.uniform(size=(64, 72, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(scale=0.1, size=a.shape), 0, 1).astype(np.float32)
    d_ab = lpips(a, b)
    d_aa = lpips(a, a)
    assert d_ab is not None and np.isfinite(d_ab)
    assert d_aa == pytest.approx(0.0, abs=1e-6)
    assert d_ab > d_aa
    _LPIPS_CACHE.clear()


def test_resnet18_npz_import_pathway(tmp_path, monkeypatch):
    """init_encoder_params consumes the exact npz schema
    scripts/export_resnet18.py writes (PyTorch conv1/bn1 layout) and
    folds BN correctly: y = relu(conv(x) * gamma/sqrt(var+eps) +
    (beta - mean * gamma/sqrt(var+eps)))."""
    import jax.numpy as jnp
    from dnsjax.models.encoder import init_encoder_params, encode_images

    rng = np.random.default_rng(4)
    conv1 = rng.normal(scale=0.05, size=(64, 3, 7, 7)).astype(np.float32)
    gamma = rng.uniform(0.5, 1.5, 64).astype(np.float32)
    beta = rng.normal(scale=0.1, size=64).astype(np.float32)
    mean = rng.normal(scale=0.2, size=64).astype(np.float32)
    var = rng.uniform(0.5, 2.0, 64).astype(np.float32)
    path = str(tmp_path / "resnet18_conv1.npz")
    np.savez(path, conv1_weight=conv1, bn1_weight=gamma, bn1_bias=beta,
             bn1_running_mean=mean, bn1_running_var=var)

    monkeypatch.setenv("DNSJAX_RESNET18_NPZ", path)
    p = init_encoder_params(0)
    assert p["w"].shape == (7, 7, 3, 64)
    scale = gamma / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(np.asarray(p["scale"]), scale, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p["bias"]), beta - mean * scale,
                               rtol=1e-5, atol=1e-6)
    # HWIO transpose is the PyTorch OIHW kernel
    np.testing.assert_allclose(
        np.asarray(p["w"]), conv1.transpose(2, 3, 1, 0), rtol=1e-6
    )
    img = jnp.asarray(rng.uniform(size=(1, 1, 32, 40, 3)).astype(np.float32))
    feats = encode_images(p, img)
    assert feats.shape == (1, 1, 16, 20, 64)
    assert np.isfinite(np.asarray(feats)).all()
    assert (np.asarray(feats) >= 0).all()  # post-ReLU
