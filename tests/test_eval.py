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
