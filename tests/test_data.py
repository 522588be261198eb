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


# ---------------------------------------------------------------------------
# EXR depth (reference: datas/common.py:23-56 readEXR_onlydepth)
# ---------------------------------------------------------------------------

def test_exr_roundtrip_zip(tmp_path):
    from dnsjax.data.exr import read_exr_depth, write_exr

    r = np.random.default_rng(0)
    # >16 rows exercises multiple ZIP chunks; smooth data compresses
    d = (r.uniform(0.5, 5.0, size=(40, 33)).astype(np.float32)).cumsum(1)
    p = str(tmp_path / "d.exr")
    write_exr(p, d)
    back = read_exr_depth(p)
    np.testing.assert_array_equal(back, d)


def test_exr_incompressible_chunks_stored_raw(tmp_path):
    from dnsjax.data.exr import read_exr_depth, write_exr

    r = np.random.default_rng(1)
    d = r.standard_normal((18, 7)).astype(np.float32)  # noise: zlib can't win
    p = str(tmp_path / "noise.exr")
    write_exr(p, d)
    np.testing.assert_array_equal(read_exr_depth(p), d)


def test_exr_half_and_uncompressed(tmp_path):
    """Hand-built NO-compression HALF file exercises the other decode paths."""
    import struct
    from dnsjax.data.exr import read_exr_depth

    H, W = 3, 5
    d = np.arange(H * W, dtype=np.float16).reshape(H, W)

    def attr(name, atype, data):
        return name.encode() + b"\0" + atype.encode() + b"\0" + struct.pack("<i", len(data)) + data

    chlist = b"Z\0" + struct.pack("<iB3xii", 1, 0, 1, 1) + b"\0"
    box = struct.pack("<4i", 0, 0, W - 1, H - 1)
    header = b"".join([
        struct.pack("<iI", 0x01312F76, 2),
        attr("channels", "chlist", chlist),
        attr("compression", "compression", b"\x00"),
        attr("dataWindow", "box2i", box),
        attr("displayWindow", "box2i", box),
        attr("lineOrder", "lineOrder", b"\x00"),
        attr("pixelAspectRatio", "float", struct.pack("<f", 1.0)),
        attr("screenWindowCenter", "v2f", struct.pack("<2f", 0, 0)),
        attr("screenWindowWidth", "float", struct.pack("<f", 1.0)),
        b"\0",
    ])
    chunks = [struct.pack("<ii", y, W * 2) + d[y].tobytes() for y in range(H)]
    base = len(header) + 8 * len(chunks)
    offs, pos = [], base
    for c in chunks:
        offs.append(struct.pack("<Q", pos))
        pos += len(c)
    p = str(tmp_path / "half.exr")
    with open(p, "wb") as f:
        f.write(header + b"".join(offs) + b"".join(chunks))
    np.testing.assert_array_equal(read_exr_depth(p), d.astype(np.float32))


def test_dataset_reads_exr_depth(tmp_path, synthetic_dataset_dir=None):
    """BaseDataset subclass consuming .exr depth frames end to end."""
    import cv2
    from dnsjax.data.base import BaseDataset
    from dnsjax.data.exr import write_exr

    H, W = 12, 16
    r = np.random.default_rng(3)
    color = (r.uniform(size=(H, W, 3)) * 255).astype(np.uint8)
    depth = r.uniform(1.0, 3.0, size=(H, W)).astype(np.float32)
    cv2.imwrite(str(tmp_path / "c0.png"), color)
    write_exr(str(tmp_path / "d0.exr"), depth)

    class ExrSet(BaseDataset):
        semantic = False

        def __init__(self):
            cfg = {
                "cam": {"H": H, "W": W, "fx": 10.0, "fy": 10.0,
                        "cx": W / 2, "cy": H / 2,
                        "png_depth_scale": 1.0, "crop_edge": 0},
            }
            super().__init__(cfg, str(tmp_path), scale=1.0)
            self.n_img = 1
            self.poses = [np.eye(4, dtype=np.float32)]

        def _color_path(self, i):
            return str(tmp_path / "c0.png")

        def _depth_path(self, i):
            return str(tmp_path / "d0.exr")

        def _label_path(self, i):
            raise NotImplementedError

    ds = ExrSet()
    item = ds[0]
    np.testing.assert_allclose(item["depth"], depth, rtol=1e-6)
