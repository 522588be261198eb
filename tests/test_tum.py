"""TUM RGB-D loader test against a generated miniature dataset on disk."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from dnsjax.data import get_dataset


def make_tum_fixture(root, n=4):
    os.makedirs(os.path.join(root, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(root, "depth"), exist_ok=True)
    rng = np.random.default_rng(0)
    rgb_lines, depth_lines, gt_lines = [], [], []
    for i in range(n):
        t = 100.0 + i * 0.1
        rgb = (rng.uniform(size=(24, 32, 3)) * 255).astype(np.uint8)
        depth = (rng.uniform(0.5, 3.0, size=(24, 32)) * 5000).astype(np.uint16)
        cv2.imwrite(os.path.join(root, "rgb", f"{t:.4f}.png"), rgb)
        cv2.imwrite(os.path.join(root, "depth", f"{t:.4f}.png"), depth)
        rgb_lines.append(f"{t:.4f} rgb/{t:.4f}.png")
        depth_lines.append(f"{t:.4f} depth/{t:.4f}.png")
        # pose: small translation along x, identity rotation quat (x,y,z,w)
        gt_lines.append(f"{t:.4f} {0.01*i} 0 0 0 0 0 1")
    for name, lines in [("rgb.txt", rgb_lines), ("depth.txt", depth_lines)]:
        with open(os.path.join(root, name), "w") as f:
            f.write("# header\n" * 0 + "\n".join(lines) + "\n")
    with open(os.path.join(root, "groundtruth.txt"), "w") as f:
        f.write("# ts tx ty tz qx qy qz qw\n" + "\n".join(gt_lines) + "\n")


def test_tum_loader(tmp_path):
    root = str(tmp_path / "tum")
    make_tum_fixture(root)
    cfg = {
        "dataset": "tum",
        "cam": {
            "H": 24, "W": 32, "fx": 20.0, "fy": 20.0, "cx": 15.5, "cy": 11.5,
            "png_depth_scale": 5000.0, "crop_edge": 0,
        },
    }
    ds = get_dataset(cfg, root, 1.0)
    assert len(ds) >= 2
    f = ds[0]
    assert f["color"].shape == (24, 32, 3)
    assert f["depth"].shape == (24, 32)
    assert 0.4 < f["depth"].mean() < 3.1
    # first pose is identity normalized THEN axis-flipped (reference order,
    # slam_datasets.py:358-366): diag(1, -1, -1, 1)
    np.testing.assert_allclose(ds.poses[0], np.diag([1.0, -1, -1, 1]), atol=1e-6)
    f1 = ds[1]
    assert abs(f1["c2w"][0, 3] - 0.01) < 1e-5
    assert f1["c2w"][1, 1] == -1.0  # y axis flipped
    # semantic=False -> zero labels
    assert f["label"].max() == 0
