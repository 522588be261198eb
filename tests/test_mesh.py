import numpy as np
import pytest

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


@pytest.fixture(scope="module")
def fitted_slam():
    """One fitted synthetic map shared by the extraction-equivalence tests
    below (each compares two extraction modes on the SAME params, so they
    only need a converged map, not their own fit)."""
    from dnsjax.data.synthetic import synthetic_slam_config
    from dnsjax.slam.driver import DNSSLAM

    cfg = synthetic_slam_config(
        H=32, W=40, n_frames=4, n_iters_track=2, n_iters_map=30,
        n_pixels_map=200,
    )
    cfg["use_gt_camera"] = True
    slam = DNSSLAM(cfg, output_dir="/tmp/dnsjax_mesh_fit")
    slam.run()
    return slam


@pytest.mark.slow
def test_vertex_attr_interpolate_matches_requery(fitted_slam):
    """Interpolated vertex colors/labels (single-pass extraction) agree
    with the reference-style vertex re-query on a fitted synthetic map."""
    from dnsjax.mesh.mesher import Mesher

    slam = fitted_slam

    def build(mode):
        mcfg = {
            "meshing": {"resolution": 48, "points_batch_size": 8192,
                        "level_set": 0.0, "clean_mesh": False,
                        "vertex_attr": mode},
            "back_end": {"bound": np.asarray(slam.bound).tolist(),
                         "marching_cubes_bound": np.asarray(slam.bound).tolist()},
        }
        ds = slam.dataset
        m = Mesher(mcfg, dict(H=ds.H, W=ds.W, fx=ds.fx, fy=ds.fy,
                              cx=ds.cx, cy=ds.cy), slam.bound, slam.spec)
        return m.extract(slam.params, slam.enc_params, slam.keyframes)

    a = build("interpolate")
    b = build("requery")
    assert a["vertices"].shape[0] > 100
    np.testing.assert_array_equal(a["vertices"], b["vertices"])
    # colors: sub-voxel lerp vs exact re-evaluation of a smooth field
    dc = np.abs(a["colors"] - b["colors"]).mean()
    assert dc < 0.05, f"mean color deviation {dc}"
    # labels: nearest-endpoint vs re-query may differ on class boundaries
    agree = (a["labels"] == b["labels"]).mean()
    assert agree > 0.95, f"label agreement {agree}"


@pytest.mark.slow
def test_hierarchical_query_matches_dense(fitted_slam):
    """Coarse-to-fine extraction reproduces the dense grid's mesh on a
    fitted synthetic map (the flag criterion must catch every surface
    cell), with far fewer field evaluations."""
    from dnsjax.mesh.mesher import Mesher

    slam = fitted_slam
    calls = []

    def build(hier):
        mcfg = {
            "meshing": {"resolution": 48, "points_batch_size": 8192,
                        "level_set": 0.0, "clean_mesh": False,
                        "hierarchical": hier},
            "back_end": {"bound": np.asarray(slam.bound).tolist(),
                         "marching_cubes_bound": np.asarray(slam.bound).tolist()},
        }
        ds = slam.dataset
        m = Mesher(mcfg, dict(H=ds.H, W=ds.W, fx=ds.fx, fy=ds.fy,
                              cx=ds.cx, cy=ds.cy), slam.bound, slam.spec)
        q0 = m._query
        n_pts = [0]

        def counting(*a, **k):
            n_pts[0] += a[1].shape[0]
            return q0(*a, **k)

        m._query = counting
        out = m.extract(slam.params, slam.enc_params, slam.keyframes)
        calls.append(n_pts[0])
        return out

    h = build(True)
    d = build(False)
    assert calls[0] < 0.6 * calls[1], f"too few savings: {calls}"
    assert h["vertices"].shape[0] > 100
    # the flagged region covers every surface cell -> identical topology
    assert h["faces"].shape == d["faces"].shape, (calls, h["faces"].shape,
                                                  d["faces"].shape)
    np.testing.assert_allclose(h["vertices"], d["vertices"], atol=1e-5)
    agree = (h["labels"] == d["labels"]).mean()
    assert agree > 0.99, f"label agreement {agree}"


@pytest.mark.slow
def test_fused_view_rows_match_unfused():
    """The fused [feats|depth|label] single-row query equals the separate
    full-res gathers when depth/label are bf16-exact and constant per
    pixel block (fusion moves depth/label to half-res nearest + bf16 —
    exact in that regime)."""
    import jax
    import jax.numpy as jnp

    from dnsjax.mesh.mesher import Mesher
    from dnsjax.models.decoder import DecoderSpec, init_decoder_params
    from dnsjax.ops.hashgrid import HashGridSpec

    H, W, K, B, n_class = 34, 40, 3, 64, 5
    cam = dict(H=H, W=W, fx=20.0, fy=20.0, cx=(W - 1) / 2, cy=(H - 1) / 2)
    bound = np.asarray([[-2.0, 2.0], [-2.0, 2.0], [-2.0, 2.0]])
    spec = DecoderSpec(
        n_class=n_class,
        grid=HashGridSpec(2, 8, 10, 4, 16),
        n_bins=4,
    )
    params = init_decoder_params(jax.random.PRNGKey(0), spec)

    rng = np.random.default_rng(3)
    # depth constant 2.0 (bf16-exact); labels constant per 2x2 block so
    # the half-res nearest tap picks the same value as the full-res gather
    # (per-pixel-random labels WOULD disagree at odd pixels — that is the
    # documented fusion deviation, bounded statistically below)
    kf_feats = jnp.asarray(
        rng.normal(size=(K, H // 2, W // 2, 64)).astype(np.float32)
    ).astype(jnp.bfloat16)
    kf_depths = jnp.full((K, H, W), 2.0, jnp.float32)
    lab_blocks = rng.integers(0, n_class, size=(K, (H + 1) // 2, (W + 1) // 2))
    kf_labels = jnp.asarray(
        np.repeat(np.repeat(lab_blocks, 2, 1), 2, 2)[:, :H, :W], jnp.int32
    )
    kf_c2w = jnp.tile(jnp.eye(4), (K, 1, 1))
    kf_valid = jnp.ones(K, bool)
    pts = jnp.asarray(rng.uniform(-1.5, 1.5, size=(B, 3)).astype(np.float32))
    bound_j = jnp.asarray(bound, jnp.float32)

    def build(fused):
        cfg = {
            "meshing": {"resolution": 16, "points_batch_size": B,
                        "level_set": 0.0, "clean_mesh": False,
                        "depth_test": True},
            "back_end": {"bound": bound.tolist()},
            "tpu": {"feature_taps": 1, "mesh_fused_rows": fused},
        }
        return Mesher(cfg, cam, bound, spec, jnp.bfloat16)

    m_ref = build(False)
    occ0, lab0, col0, cnt0 = m_ref._query(
        params, pts, kf_c2w, kf_valid, kf_feats, kf_labels, kf_depths, bound_j
    )
    m_fused = build(True)
    assert m_fused.fuse_rows
    fused_maps = m_fused.fuse_view_maps(kf_feats, kf_depths, kf_labels)
    assert fused_maps.shape == (K, H // 2, W // 2, 66)
    occ1, lab1, col1, cnt1 = m_fused._query(
        params, pts, kf_c2w, kf_valid, fused_maps, kf_labels, kf_depths,
        bound_j,
    )
    np.testing.assert_array_equal(np.asarray(cnt0), np.asarray(cnt1))
    np.testing.assert_array_equal(np.asarray(lab0), np.asarray(lab1))
    np.testing.assert_allclose(np.asarray(occ0), np.asarray(occ1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(col0), np.asarray(col1), atol=1e-5)

    # per-pixel-random labels: fusion may pick the neighboring full-res
    # pixel; bound the disagreement among observed points
    kf_labels_r = jnp.asarray(
        rng.integers(0, n_class, size=(K, H, W)), jnp.int32
    )
    _, labr0, _, _ = m_ref._query(
        params, pts, kf_c2w, kf_valid, kf_feats, kf_labels_r, kf_depths,
        bound_j,
    )
    fused_r = m_fused.fuse_view_maps(kf_feats, kf_depths, kf_labels_r)
    _, labr1, _, _ = m_fused._query(
        params, pts, kf_c2w, kf_valid, fused_r, kf_labels_r, kf_depths,
        bound_j,
    )
    seen = np.asarray(labr0) >= 0
    if seen.sum() > 5:
        agree = (np.asarray(labr0)[seen] == np.asarray(labr1)[seen]).mean()
        # worst case (i.i.d. per-pixel labels): fused picks the same full-res
        # pixel only when u,v are both even -> ~0.25 + 0.75/n_class expected;
        # chance level is 1/n_class = 0.2. Real label maps are
        # segment-constant, where agreement ~ 1 off segment boundaries.
        assert agree > 0.25, f"label agreement {agree} at chance level"


@pytest.mark.slow
def test_view_skip_is_exact():
    """The conservative per-chunk keyframe frustum skip (tpu.mesh_view_skip)
    must be bit-exact: a skipped view is one where no chunk point passes the
    ``seen`` predicate, and every per-view contribution is seen-gated."""
    import jax
    import jax.numpy as jnp

    from dnsjax.mesh.mesher import Mesher
    from dnsjax.models.decoder import DecoderSpec, init_decoder_params
    from dnsjax.ops.hashgrid import HashGridSpec

    H, W, K, B, n_class = 34, 40, 4, 64, 5
    cam = dict(H=H, W=W, fx=20.0, fy=20.0, cx=(W - 1) / 2, cy=(H - 1) / 2)
    bound = np.asarray([[-3.0, 3.0], [-3.0, 3.0], [-3.0, 3.0]])
    spec = DecoderSpec(
        n_class=n_class,
        grid=HashGridSpec(2, 8, 10, 4, 16),
        n_bins=4,
    )
    params = init_decoder_params(jax.random.PRNGKey(0), spec)

    rng = np.random.default_rng(7)
    kf_feats = jnp.asarray(
        rng.normal(size=(K, H // 2, W // 2, 64)).astype(np.float32)
    )
    kf_depths = jnp.asarray(
        rng.uniform(0.5, 4.0, size=(K, H, W)).astype(np.float32)
    )
    kf_labels = jnp.asarray(rng.integers(0, n_class, size=(K, H, W)), jnp.int32)
    # diverse poses: origin looking -z; shifted +x; looking +z (180 deg yaw,
    # sees nothing in front of the others); far away
    flip = np.diag([-1.0, 1.0, -1.0])
    c2ws = np.tile(np.eye(4), (K, 1, 1))
    c2ws[1, :3, 3] = [1.5, 0.0, 0.0]
    c2ws[2, :3, :3] = flip
    c2ws[3, :3, 3] = [50.0, 0.0, 0.0]
    kf_c2w = jnp.asarray(c2ws, jnp.float32)
    kf_valid = jnp.ones(K, bool)
    # a tight cluster in front of cameras 0/1 only (z < 0 is "in front")
    pts = jnp.asarray(
        rng.uniform(-0.4, 0.4, size=(B, 3)).astype(np.float32)
        + np.asarray([0.0, 0.0, -2.0], np.float32)
    )
    bound_j = jnp.asarray(bound, jnp.float32)

    def build(skip):
        cfg = {
            "meshing": {"resolution": 16, "points_batch_size": B,
                        "level_set": 0.0, "clean_mesh": False,
                        "depth_test": True},
            "back_end": {"bound": bound.tolist()},
            "tpu": {"feature_taps": 1, "mesh_fused_rows": False,
                    "mesh_view_skip": skip},
        }
        return Mesher(cfg, cam, bound, spec, jnp.bfloat16)

    outs = []
    for skip in (False, True):
        m = build(skip)
        assert m.view_skip is skip
        outs.append(m._query(
            params, pts, kf_c2w, kf_valid, kf_feats, kf_labels, kf_depths,
            bound_j,
        ))
    for a, b in zip(outs[0], outs[1]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # sanity: the cluster IS observed by someone (the test is not vacuous)
    assert float(np.asarray(outs[0][3]).max()) >= 1.0


def test_morton_order_locality():
    """_morton_order is a permutation whose sequential chunks have smaller
    AABBs than raveled-grid order (the property the view skip relies on)."""
    from dnsjax.mesh.mesher import Mesher

    r = 64
    ax = np.linspace(-1.0, 1.0, r)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    p = np.stack([X.ravel(), Y.ravel(), Z.ravel()], -1)
    sp = (ax[1] - ax[0],) * 3
    order = Mesher._morton_order(p, np.asarray([-1.0, -1.0, -1.0]), sp)
    assert np.array_equal(np.sort(order), np.arange(r**3))

    # raveled chunks are thin slabs spanning the full scene in two axes
    # (sum of extents ~ 4); Morton chunks are compact cubes (~1.5) — the
    # quantity frustum-intersection probability scales with
    def mean_chunk_extent(q, B=4096):
        exts = []
        for a in range(0, q.shape[0], B):
            c = q[a:a + B]
            exts.append(np.sum(c.max(0) - c.min(0)))
        return np.mean(exts)

    assert mean_chunk_extent(p[order]) < 0.5 * mean_chunk_extent(p)


@pytest.mark.slow
def test_extract_with_cached_kf_feats_matches(fitted_slam):
    """Mesher.extract(kf_feats=driver.collect_kf_feats()) — the save_mesh
    fast path that skips re-encoding every keyframe image — produces the
    same mesh as the from-scratch encode (keyframe images are immutable
    after insertion, so the cache is exact)."""
    from dnsjax.mesh.mesher import Mesher

    slam = fitted_slam
    mcfg = {
        "meshing": {"resolution": 40, "points_batch_size": 8192,
                    "level_set": 0.0, "clean_mesh": False},
        "back_end": {"bound": np.asarray(slam.bound).tolist(),
                     "marching_cubes_bound": np.asarray(slam.bound).tolist()},
    }
    ds = slam.dataset
    m = Mesher(mcfg, dict(H=ds.H, W=ds.W, fx=ds.fx, fy=ds.fy,
                          cx=ds.cx, cy=ds.cy), slam.bound, slam.spec,
               slam.compute_dtype)
    feats = slam.collect_kf_feats()
    assert feats is not None and feats.shape[0] == slam.keyframes.capacity
    a = m.extract(slam.params, slam.enc_params, slam.keyframes)
    b = m.extract(slam.params, slam.enc_params, slam.keyframes,
                  kf_feats=feats)
    # vertices: tight allclose, not bit-equal — the cached path encodes the
    # whole store as ONE batch while the cold path encodes per slot, and
    # XLA conv tiling is not guaranteed batch-size-invariant on TPU
    np.testing.assert_allclose(a["vertices"], b["vertices"], atol=1e-5)
    np.testing.assert_array_equal(a["faces"], b["faces"])
    np.testing.assert_allclose(a["colors"], b["colors"], atol=1e-5)
    np.testing.assert_array_equal(a["labels"], b["labels"])
