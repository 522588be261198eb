import numpy as np
import jax.numpy as jnp

from dnsjax.data import get_dataset
from dnsjax.data.synthetic import SyntheticDataset, synthetic_config
from dnsjax.geometry import all_rays


def test_synthetic_dataset_basic():
    cfg = synthetic_config(H=60, W=80, n_frames=5)
    ds = get_dataset(cfg, "", 1.0)
    assert isinstance(ds, SyntheticDataset)
    assert len(ds) == 5
    f = ds[0]
    assert f["color"].shape == (60, 80, 3)
    assert f["depth"].shape == (60, 80)
    assert f["label"].shape == (60, 80)
    assert f["c2w"].shape == (4, 4)
    assert f["color"].min() >= 0 and f["color"].max() <= 1.3
    assert f["depth"].min() > 0
    assert ds.n_class == 4
    assert set(np.unique(f["label"])).issubset({0, 1, 2, 3})


def test_synthetic_depth_consistent_with_ray_convention():
    """depth stored as ray-parameter t == view depth for -z-forward dirs:
    unprojecting (i, j, depth) with our rays must land on scene geometry
    (inside the room box, on a wall or sphere surface)."""
    cfg = synthetic_config(H=40, W=56, n_frames=3)
    ds = SyntheticDataset(cfg)
    f = ds[1]
    o, d = all_rays(40, 56, jnp.asarray(f["c2w"]), ds.fx, ds.fy, ds.cx, ds.cy)
    pts = np.asarray(o) + np.asarray(d) * f["depth"][..., None]
    # wall pixels must land on the box surface (max |coord| == room_half)
    wall = f["label"] == 0
    m = np.max(np.abs(pts[wall]), axis=-1)
    np.testing.assert_allclose(m, 2.0, atol=1e-4)
    # sphere pixels land on the sphere surface
    for k, (cen, rad, _) in enumerate(ds.spheres):
        sel = f["label"] == k + 1
        if sel.sum() == 0:
            continue
        r = np.linalg.norm(pts[sel] - cen, axis=-1)
        np.testing.assert_allclose(r, rad, atol=1e-4)


def test_synthetic_poses_are_rigid():
    cfg = synthetic_config(n_frames=4)
    ds = SyntheticDataset(cfg)
    for p in ds.poses:
        R = p[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_synthetic_deterministic():
    cfg = synthetic_config(H=24, W=32, n_frames=2)
    a = SyntheticDataset(cfg)[1]
    b = SyntheticDataset(cfg)[1]
    np.testing.assert_array_equal(a["color"], b["color"])
    np.testing.assert_array_equal(a["depth"], b["depth"])
