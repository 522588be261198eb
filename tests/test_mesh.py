import numpy as np

from dnsjax.mesh.marching import marching_tetrahedra, face_normals
from dnsjax.mesh.export import write_ply, read_ply


def sphere_field(n=40, r=1.0, half=1.3):
    ax = np.linspace(-half, half, n)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    sp = ax[1] - ax[0]
    return r - np.sqrt(X**2 + Y**2 + Z**2), (-half, -half, -half), (sp, sp, sp)


def test_marching_tetrahedra_sphere():
    vals, origin, spacing = sphere_field()
    v, f = marching_tetrahedra(vals, 0.0, origin, spacing)
    assert v.shape[0] > 1000 and f.shape[0] > 2000
    r = np.linalg.norm(v, axis=1)
    np.testing.assert_allclose(r, 1.0, atol=0.01)


def test_marching_tetrahedra_watertight():
    vals, origin, spacing = sphere_field(n=24)
    v, f = marching_tetrahedra(vals, 0.0, origin, spacing)
    edges = np.sort(np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]]), 1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert np.all(counts == 2)  # closed 2-manifold


def test_marching_tetrahedra_winding():
    vals, origin, spacing = sphere_field(n=24)
    v, f = marching_tetrahedra(vals, 0.0, origin, spacing)
    nrm = face_normals(v, f)
    cen = v[f].mean(1)
    # inside = value > level, so normals must point outward (toward lower val)
    assert (np.einsum("ij,ij->i", nrm, cen) > 0).mean() > 0.99


def test_marching_tetrahedra_empty():
    vals = np.full((8, 8, 8), -1.0)
    v, f = marching_tetrahedra(vals, 0.0)
    assert v.shape == (0, 3) and f.shape == (0, 3)


def test_marching_level_offset():
    vals, origin, spacing = sphere_field(n=32, r=1.0)
    # level 0.3 -> isosurface at radius 0.7
    v, _ = marching_tetrahedra(vals, 0.3, origin, spacing)
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 0.7, atol=0.01)


def test_ply_roundtrip(tmp_path, rng):
    vals, origin, spacing = sphere_field(n=16)
    v, f = marching_tetrahedra(vals, 0.0, origin, spacing)
    colors = rng.uniform(size=(v.shape[0], 3)).astype(np.float32)
    labels = rng.integers(0, 5, size=v.shape[0]).astype(np.int32)
    p = str(tmp_path / "m.ply")
    write_ply(p, v, f, colors=colors, labels=labels)
    v2, f2, c2, l2 = read_ply(p)
    np.testing.assert_allclose(v2, v, atol=1e-6)
    np.testing.assert_array_equal(f2, f)
    np.testing.assert_array_equal(l2, labels)
    assert np.abs(c2.astype(np.float32) / 255.0 - colors).max() < 0.01


def test_native_matches_numpy():
    """The C++ and numpy marching-tetrahedra paths produce the same mesh."""
    import os

    import dnsjax.mesh.native as nat
    from dnsjax.mesh.native import marching_tetrahedra_native

    vals, origin, spacing = sphere_field(n=20)
    native = marching_tetrahedra_native(vals.astype(np.float32), 0.0, origin, spacing)
    if native is None:
        import pytest

        pytest.skip("native library unavailable")
    vn, fn = native
    os.environ["DNSJAX_NO_NATIVE"] = "1"
    nat._TRIED = False
    nat._LIB = None
    try:
        vp, fp = marching_tetrahedra(vals, 0.0, origin, spacing)
    finally:
        del os.environ["DNSJAX_NO_NATIVE"]
        nat._TRIED = False
        nat._LIB = None
    assert vn.shape == vp.shape and fn.shape == fp.shape
    sn = set(map(tuple, np.round(vn, 5)))
    sp_ = set(map(tuple, np.round(vp, 5)))
    assert sn == sp_
    # both watertight
    for f in (fn, fp):
        e = np.sort(np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]]), 1)
        _, c = np.unique(e, axis=0, return_counts=True)
        assert np.all(c == 2)


def test_raycaster():
    from dnsjax.mesh.raycast import MeshRaycaster, load

    if load() is None:
        import pytest

        pytest.skip("native raycaster unavailable")
    vals, origin, spacing = sphere_field(n=28)
    v, f = marching_tetrahedra(vals, 0.0, origin, spacing)
    rc = MeshRaycaster(v, f)
    o = np.array([[0, 0, 0], [0, 0, 0], [5, 0, 0]], np.float32)
    d = np.array([[1, 0, 0], [0, 0, 1], [1, 0, 0]], np.float32)
    t = rc.trace(o, d)
    np.testing.assert_allclose(t[:2], 1.0, atol=0.02)
    assert t[2] == 0.0  # pointing away -> miss


def test_depth_l1_virtual_views():
    from dnsjax.eval.mesh_metrics import depth_l1_virtual_views
    from dnsjax.mesh.raycast import load

    if load() is None:
        import pytest

        pytest.skip("native raycaster unavailable")
    vals, origin, spacing = sphere_field(n=24)
    v, f = marching_tetrahedra(vals, 0.0, origin, spacing)
    same = depth_l1_virtual_views(v, f, v, f, n_views=8, H=60, W=80)
    assert same["depth_l1_cm"] < 0.01
    shifted = depth_l1_virtual_views(
        v + np.array([0.05, 0, 0], np.float32), f, v, f, n_views=8, H=60, W=80
    )
    assert 1.0 < shifted["depth_l1_cm"] < 20.0
