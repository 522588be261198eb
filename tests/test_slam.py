"""Integration tests: mapping convergence, tracking convergence, full driver."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # integration tier; see conftest.py

from dnsjax.data.synthetic import SyntheticDataset, synthetic_slam_config
from dnsjax.geometry.se3 import tensor_from_camera, camera_from_tensor
from dnsjax.slam.driver import DNSSLAM, load_bound
from dnsjax.slam.sampling import (
    class_sorted_pixels,
    sample_class_balanced_pixels,
    sample_uniform_pixels,
)


def test_load_bound_divisible():
    cfg = {
        "scale": 1,
        "bound_divisible": 0.32,
        "back_end": {"bound": [[-2.9, 8.9], [-3.2, 5.5], [-3.5, 3.3]]},
    }
    b = load_bound(cfg)
    ext = b[:, 1] - b[:, 0]
    np.testing.assert_allclose(ext / 0.32, np.round(ext / 0.32), atol=1e-4)
    assert np.all(b[:, 1] >= np.array([8.9, 5.5, 3.3]))


def test_class_sorted_pixels():
    label = np.array([[0, 2], [2, 1]], np.int32)
    sidx, off = class_sorted_pixels(label, 4)
    assert list(off) == [0, 1, 2, 4, 4]
    assert sidx[0] == 0  # class 0 at flat 0
    assert sidx[1] == 3  # class 1 at flat 3
    assert set(sidx[2:4].tolist()) == {1, 2}


def test_balanced_sampling_hits_all_classes():
    label = np.zeros((20, 20), np.int32)
    label[:2, :2] = 1  # rare class
    label[5:6, 5:9] = 3
    sidx, off = class_sorted_pixels(label, 5)
    pix = np.asarray(
        sample_class_balanced_pixels(
            jax.random.PRNGKey(0), 90, jnp.asarray(sidx), jnp.asarray(off)
        )
    )
    got = label.reshape(-1)[pix]
    counts = np.bincount(got, minlength=5)
    # 3 present classes, 90 draws -> 30 each
    assert counts[0] == 30 and counts[1] == 30 and counts[3] == 30
    assert counts[2] == 0 and counts[4] == 0


def test_uniform_sampling_respects_crop():
    pix = np.asarray(
        sample_uniform_pixels(jax.random.PRNGKey(1), 500, 40, 60, 5, 7)
    )
    j, i = pix // 60, pix % 60
    assert j.min() >= 5 and j.max() < 35
    assert i.min() >= 7 and i.max() < 53


@pytest.fixture(scope="module")
def slam_gt_camera():
    """Driver run with GT poses (mapping-only): BASELINE config-1 analogue."""
    cfg = synthetic_slam_config(n_frames=8, n_iters_map=30)
    cfg["use_gt_camera"] = True
    slam = DNSSLAM(cfg, output_dir="/tmp/dnsjax_test_gt")
    slam.run()
    return slam


def test_mapping_converges(slam_gt_camera):
    slam = slam_gt_camera
    # mapping loss from the bootstrap first iteration vs last keystep
    assert slam.keyframes.count >= 2
    # render quality: the driver logged p_loss at final keystep; re-derive by
    # rendering a frame through the learned map
    from dnsjax.render.pipeline import render_fine
    from dnsjax.render.sampling import sample_along_rays
    from dnsjax.geometry import all_rays, ray_box_far

    ds = slam.dataset
    f = ds[4]
    H, W = ds.H, ds.W
    o, d = all_rays(H, W, jnp.asarray(f["c2w"]), ds.fx, ds.fy, ds.cx, ds.cy)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)
    gd = jnp.asarray(f["depth"]).reshape(-1)
    far = ray_box_far(o, d, slam.bound_j) + 0.01
    z = sample_along_rays(jax.random.PRNGKey(0), gd, 24, 8, far)
    pts = o[:, None, :] + d[:, None, :] * z[..., None]
    lbl = jnp.asarray(f["label"]).reshape(-1)
    code = jnp.zeros((o.shape[0], 32, 32))
    out = render_fine(
        slam.params, slam.spec, pts, z, d, lbl, code, slam.bound_j
    )
    d_err = float(jnp.mean(jnp.abs(out.depth - gd)))
    rgb_mse = float(jnp.mean((out.color - jnp.asarray(f["color"]).reshape(-1, 3)) ** 2))
    assert d_err < 0.15, f"depth err {d_err}"
    assert rgb_mse < 0.02, f"rgb mse {rgb_mse}"


def test_checkpoint_roundtrip(slam_gt_camera, tmp_path):
    from dnsjax.models.checkpoint import load_checkpoint, restore_params

    slam = slam_gt_camera
    # save_checkpoint takes a name relative to out_dir
    slam.save_checkpoint("ck.npz", 7)
    import os

    ckpt = load_checkpoint(os.path.join(slam.out_dir, "ck.npz"))
    params2 = restore_params(slam.params, ckpt)
    a = jax.tree_util.tree_leaves(slam.params)
    b = jax.tree_util.tree_leaves(params2)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert ckpt["meta"]["idx"] == 7
    assert ckpt["estimate_c2w"].shape == slam.estimate_c2w.shape


def test_tracking_recovers_perturbed_pose(slam_gt_camera):
    """With a trained map, tracking from a perturbed init must reduce pose
    error substantially."""
    slam = slam_gt_camera
    ds = slam.dataset
    f = slam._frame_to_device(ds[4])
    gt = np.asarray(f["c2w"])

    # perturb: ~7cm translation + ~3deg rotation (well above the pose-bias
    # floor of the lightly-trained test map, ~1.3cm)
    t7 = np.asarray(tensor_from_camera(jnp.asarray(gt)))
    pert = t7.copy()
    pert[4:] += np.array([0.05, -0.04, 0.03], np.float32)
    pert[1:4] += np.array([0.02, -0.015, 0.01], np.float32)

    from dnsjax.slam.tracker import TrackConfig, make_track_fn

    tcfg = slam.track_cfg.__class__(
        **{**slam.track_cfg.__dict__, "n_iters": 60, "cam_lr": 0.002}
    )
    track = make_track_fn(slam.spec, tcfg, slam.compute_dtype)
    feats = slam._encode(
        slam.enc_params, jnp.stack([jnp.asarray(ds[3]["color"]), f["color"]], 0)
    )
    refer_w2c = jnp.asarray(np.linalg.inv(ds[3]["c2w"]).astype(np.float32))
    quad, T, metrics = track(
        slam.params, feats, refer_w2c, f["color"], f["depth"], f["label"],
        jnp.asarray(pert[:4]), jnp.asarray(pert[4:]),
        slam.bound_j, jax.random.PRNGKey(5),
    )
    got = np.concatenate([np.asarray(quad), np.asarray(T)])
    err_before = np.abs(t7 - pert).mean()
    err_after = np.abs(t7 - got).mean()
    # the map is trained only lightly here, so its pose-bias floor (~1.3cm)
    # bounds achievable recovery; require clear improvement, not perfection
    assert err_after < err_before * 0.85, (err_before, err_after)


def test_tracking_lm_recovers_perturbed_pose(slam_gt_camera):
    """The Levenberg-Marquardt tracker (tracking.method: lm) must recover a
    perturbed pose in ~an order of magnitude fewer iterations than Adam."""
    import dataclasses

    slam = slam_gt_camera
    ds = slam.dataset
    f = slam._frame_to_device(ds[4])
    gt = np.asarray(f["c2w"])

    t7 = np.asarray(tensor_from_camera(jnp.asarray(gt)))
    pert = t7.copy()
    pert[4:] += np.array([0.05, -0.04, 0.03], np.float32)
    pert[1:4] += np.array([0.02, -0.015, 0.01], np.float32)

    from dnsjax.slam.tracker import make_track_fn

    tcfg = dataclasses.replace(slam.track_cfg, method="lm", lm_iters=8)
    track = make_track_fn(slam.spec, tcfg, slam.compute_dtype)
    feats = slam._encode(
        slam.enc_params, jnp.stack([jnp.asarray(ds[3]["color"]), f["color"]], 0)
    )
    refer_w2c = jnp.asarray(np.linalg.inv(ds[3]["c2w"]).astype(np.float32))
    quad, T, metrics = track(
        slam.params, feats, refer_w2c, f["color"], f["depth"], f["label"],
        jnp.asarray(pert[:4]), jnp.asarray(pert[4:]),
        slam.bound_j, jax.random.PRNGKey(5),
    )
    got = np.concatenate([np.asarray(quad), np.asarray(T)])
    err_before = np.abs(t7 - pert).mean()
    err_after = np.abs(t7 - got).mean()
    assert err_after < err_before * 0.85, (err_before, err_after)
    assert int(metrics["n_iters_run"]) == 8
    pk = np.asarray(metrics["packed"])
    assert pk.shape == (10,) and np.isfinite(pk).all()


def test_tracking_lm_patience(slam_gt_camera):
    """lm_patience early exit: with patience >= lm_iters the while_loop
    path must reproduce the scan path's pose exactly; with a small
    patience it must stop early (n_iters_run < lm_iters) and still
    recover the perturbed pose."""
    import dataclasses

    slam = slam_gt_camera
    ds = slam.dataset
    f = slam._frame_to_device(ds[4])
    gt = np.asarray(f["c2w"])

    t7 = np.asarray(tensor_from_camera(jnp.asarray(gt)))
    pert = t7.copy()
    pert[4:] += np.array([0.05, -0.04, 0.03], np.float32)
    pert[1:4] += np.array([0.02, -0.015, 0.01], np.float32)

    from dnsjax.slam.tracker import make_track_fn

    feats = slam._encode(
        slam.enc_params, jnp.stack([jnp.asarray(ds[3]["color"]), f["color"]], 0)
    )
    refer_w2c = jnp.asarray(np.linalg.inv(ds[3]["c2w"]).astype(np.float32))
    args = (slam.params, feats, refer_w2c, f["color"], f["depth"], f["label"],
            jnp.asarray(pert[:4]), jnp.asarray(pert[4:]),
            slam.bound_j, jax.random.PRNGKey(5))

    outs = {}
    for pat in (0, 8, 2):
        tcfg = dataclasses.replace(
            slam.track_cfg, method="lm", lm_iters=8, lm_patience=pat
        )
        quad, T, metrics = make_track_fn(slam.spec, tcfg, slam.compute_dtype)(
            *args
        )
        outs[pat] = (
            np.concatenate([np.asarray(quad), np.asarray(T)]),
            int(metrics["n_iters_run"]),
        )

    # never-triggering patience == exact scan-path trajectory
    np.testing.assert_allclose(outs[8][0], outs[0][0], rtol=0, atol=1e-6)
    assert outs[8][1] <= 8
    # tight patience exits early and still improves the pose clearly
    err_before = np.abs(t7 - pert).mean()
    err_after = np.abs(t7 - outs[2][0]).mean()
    assert err_after < err_before * 0.85, (err_before, err_after)


def test_driver_full_tracking_small():
    """Full tracking+mapping run; poses must stay close to GT."""
    cfg = synthetic_slam_config(n_frames=8, n_iters_track=20, n_iters_map=30)
    slam = DNSSLAM(cfg, output_dir="/tmp/dnsjax_test_track")
    est, gt = slam.run()
    terr = np.linalg.norm(est[:, :3, 3] - gt[:, :3, 3], axis=-1)
    # per-frame motion is ~1.3cm; with this deliberately tiny config (weak
    # map, random-init encoder, low-texture synthetic walls) tracking carries
    # a few-cm bias — require bounded drift, not metric accuracy (full-quality
    # parity is measured on Replica via eval_ate; the 14-frame CLI drive in
    # .claude/skills/verify lands at ATE max ~0.03). The bound sits a margin
    # above the observed ~0.30 so RNG reshuffles don't flap the test.
    assert terr.max() < 0.35, terr
    assert np.all(np.isfinite(est))


def test_sync_method_policies():
    cfg = synthetic_slam_config()
    slam = DNSSLAM.__new__(DNSSLAM)
    slam.optimize_every = 4
    slam.sync_method = "strict"
    assert slam._should_map(8, 4, 100) and not slam._should_map(7, 4, 100)
    assert slam._should_map(99, 96, 100)  # last frame always maps
    slam.sync_method = "loose"
    assert slam._should_map(6, 4, 100) and not slam._should_map(5, 4, 100)
    slam.sync_method = "free"
    assert slam._should_map(5, 4, 100)


def test_resume_roundtrip(slam_gt_camera, tmp_path):
    """A resumed driver continues from the checkpoint with identical state."""
    import os

    slam = slam_gt_camera
    slam.save_checkpoint("resume.npz", 5)
    cfg = synthetic_slam_config(n_frames=8, n_iters_map=30)
    cfg["use_gt_camera"] = True
    slam2 = DNSSLAM(cfg, output_dir="/tmp/dnsjax_resume")
    start = slam2.resume(os.path.join(slam.out_dir, "resume.npz"))
    assert start == 6
    assert slam2.keyframes.count == slam.keyframes.count
    np.testing.assert_allclose(
        np.asarray(slam2.params["table"]), np.asarray(slam.params["table"])
    )
    # continue the run from frame 6
    slam2.run(start_frame=start)
    assert np.isfinite(slam2.estimate_c2w[:8]).all()


def test_checkpoint_partial_load_tolerant(slam_gt_camera):
    """restore_params keeps template leaves for keys missing from the
    checkpoint (the reference's tolerant partial restore, checkpoint.py:40-66)."""
    import os

    from dnsjax.models.checkpoint import load_checkpoint, restore_params

    slam = slam_gt_camera
    slam.save_checkpoint("partial.npz", 3)
    ckpt = load_checkpoint(os.path.join(slam.out_dir, "partial.npz"))
    # drop the coarse-MLP weights from the checkpoint
    dropped = [k for k in list(ckpt) if k.startswith("params/['coarse']")]
    assert dropped, list(ckpt)[:5]
    for k in dropped:
        del ckpt[k]
    template = jax.tree_util.tree_map(jnp.zeros_like, slam.params)
    restored = restore_params(template, ckpt)
    # table restored from checkpoint, coarse kept from template (zeros)
    assert float(jnp.abs(restored["table"]).sum()) > 0
    assert float(jnp.abs(restored["coarse"]["w"][0]).sum()) == 0


def test_full_frame_renderer(slam_gt_camera):
    """make_full_renderer reproduces the trained scene over a whole image."""
    from dnsjax.geometry.se3 import invert_se3
    from dnsjax.render.full import make_full_renderer

    slam = slam_gt_camera
    ds = slam.dataset
    f = slam._frame_to_device(ds[3])
    renderer = make_full_renderer(
        slam.spec,
        dict(H=ds.H, W=ds.W, fx=ds.fx, fy=ds.fy, cx=ds.cx, cy=ds.cy),
        slam.map_cfg.n_samples, slam.map_cfg.n_surface, chunk=1024,
        compute_dtype=slam.compute_dtype,
    )
    c2w = f["c2w"]
    refer_c2w = jnp.stack([c2w, c2w, c2w])
    feats = slam._encode(slam.enc_params, f["color"][None].repeat(3, 0))
    color, depth, logits = renderer(
        slam.params, c2w, f["depth"], f["label"],
        invert_se3(refer_c2w), feats, slam.bound_j, jax.random.PRNGKey(0),
    )
    assert color.shape == (ds.H, ds.W, 3)
    assert depth.shape == (ds.H, ds.W)
    d_err = float(jnp.mean(jnp.abs(depth - f["depth"])))
    assert d_err < 0.2, d_err
    acc = float(jnp.mean(jnp.argmax(logits, -1) == f["label"]))
    assert acc > 0.8, acc


def test_driver_loose_sync(tmp_path):
    """sync_method loose maps about twice as often; run must stay finite."""
    cfg = synthetic_slam_config(
        H=32, W=40, n_frames=6, n_iters_track=4, n_iters_map=6, n_pixels_map=120
    )
    cfg["use_gt_camera"] = True
    cfg["sync_method"] = "loose"
    slam = DNSSLAM(cfg, output_dir=str(tmp_path / "loose"))
    est, gt = slam.run()
    assert np.isfinite(est).all()
    # loose policy: keysteps every optimize_every//2 frames -> more map events
    import json, os

    events = [
        json.loads(l)
        for l in open(os.path.join(slam.out_dir, "metrics.jsonl"))
    ]
    n_maps = sum(1 for e in events if e["event"] == "map")
    # loose (every//2 = 1) keysteps at frames 1..5 = 5 map events; strict
    # over the same run would give only 2 (frames 3 and 5)
    assert n_maps == 5


def test_tracking_early_exit(slam_gt_camera):
    """patience > 0 stops early with the same candidate-selection semantics."""
    from dnsjax.slam.tracker import make_track_fn

    slam = slam_gt_camera
    ds = slam.dataset
    f = slam._frame_to_device(ds[4])
    t7 = np.asarray(tensor_from_camera(f["c2w"]))
    pert = t7.copy()
    pert[4:] += np.array([0.02, -0.015, 0.01], np.float32)
    feats = slam._encode(
        slam.enc_params, jnp.stack([jnp.asarray(ds[3]["color"]), f["color"]], 0)
    )
    refer_w2c = jnp.asarray(np.linalg.inv(ds[3]["c2w"]).astype(np.float32))

    results = {}
    for pat in (0, 8):
        tcfg = slam.track_cfg.__class__(
            **{**slam.track_cfg.__dict__, "n_iters": 30, "patience": pat}
        )
        track = make_track_fn(slam.spec, tcfg, slam.compute_dtype)
        q, T, m = track(
            slam.params, feats, refer_w2c, f["color"], f["depth"], f["label"],
            jnp.asarray(pert[:4]), jnp.asarray(pert[4:]),
            slam.bound_j, jax.random.PRNGKey(9),
        )
        results[pat] = (
            np.concatenate([np.asarray(q), np.asarray(T)]),
            int(m["n_iters_run"]),
            float(m["best_loss"]),
        )
    assert results[0][1] == 30
    assert results[8][1] <= 30
    # early exit must not make the recovered pose dramatically worse
    err0 = np.abs(t7 - results[0][0]).mean()
    err8 = np.abs(t7 - results[8][0]).mean()
    assert err8 < max(err0 * 2.0, 0.02), (err0, err8)


def test_keyframe_eviction_unit():
    """evict() shifts later slots down and keeps insertion order."""
    from dnsjax.slam.keyframes import KeyframeStore

    H, W, C = 8, 10, 3
    store = KeyframeStore(4, H, W, C)
    rng = np.random.default_rng(0)
    for i in range(4):
        store.add(
            {
                "color": rng.uniform(size=(H, W, 3)).astype(np.float32),
                "depth": np.full((H, W), 1.0 + i, np.float32),
                "label": rng.integers(0, C, size=(H, W)).astype(np.int32),
                "c2w": np.eye(4, dtype=np.float32),
                "index": 10 * i,
            },
            np.eye(4, dtype=np.float32),
        )
    store.evict(1)
    assert store.count == 3
    assert store.frame_ids == [0, 20, 30]
    # depths identify frames: slot 1 now holds old slot 2 (depth 3.0)
    assert float(store.depths[1, 0, 0]) == 3.0
    assert float(store.depths[2, 0, 0]) == 4.0
    # adding after eviction reuses the freed tail slot
    store.add(
        {
            "color": np.zeros((H, W, 3), np.float32),
            "depth": np.full((H, W), 9.0, np.float32),
            "label": np.zeros((H, W), np.int32),
            "c2w": np.eye(4, dtype=np.float32),
            "index": 40,
        },
        np.eye(4, dtype=np.float32),
    )
    assert store.count == 4 and store.frame_ids[-1] == 40


def test_driver_keyframe_eviction_end_to_end():
    """A run whose sequence overflows the store completes via eviction."""
    from dnsjax.data.synthetic import synthetic_slam_config
    from dnsjax.slam.driver import DNSSLAM

    cfg = synthetic_slam_config(
        H=32, W=40, n_frames=14, n_iters_track=3, n_iters_map=4,
        n_pixels_map=120,
    )
    cfg["use_gt_camera"] = True
    cfg["mapping"]["max_keyframes"] = 3
    cfg["mapping"]["choose_keyframe_every"] = 2
    slam = DNSSLAM(cfg, output_dir="/tmp/dnsjax_test_evict")
    est, gt = slam.run()
    assert np.isfinite(est).all()
    kf = slam.keyframes
    assert kf.count == 3
    # the bootstrap anchor survives every eviction; the latest keyframe is
    # one of the final frames
    assert kf.frame_ids[0] == 0
    assert kf.frame_ids[-1] >= 10
    assert kf.frame_ids == sorted(kf.frame_ids)


def test_map_fn_smooth_every_stride():
    """smooth_every=k: TV term contributes only every k-th iteration, scaled
    by k; the keystep stays finite and trains."""
    import jax.numpy as jnp
    from dnsjax.models.decoder import DecoderSpec, init_decoder_params
    from dnsjax.models.encoder import init_encoder_params, encode_images
    from dnsjax.ops.hashgrid import HashGridSpec
    from dnsjax.geometry.se3 import tensor_from_camera
    from dnsjax.slam.mapper import MapConfig, _build_loss_fn
    from dnsjax.slam.sampling import class_sorted_pixels

    H, W, T, C = 24, 32, 2, 4
    spec = DecoderSpec(n_class=C, grid=HashGridSpec(4, 2, 10, 4, 32), n_bins=16)
    params = init_decoder_params(jax.random.PRNGKey(0), spec)
    bound = jnp.asarray([[-2.2, 2.2], [-2.2, 2.2], [-2.2, 2.2]])
    cfg = MapConfig(
        H=H, W=W, fx=16.0, fy=16.0, cx=15.5, cy=11.5,
        n_pixels=60, n_samples=8, n_surface=4, smooth_pts=6, smooth_every=3,
    )
    rng = np.random.default_rng(0)
    colors = jnp.asarray(rng.uniform(size=(T, H, W, 3)).astype(np.float32))
    depths = jnp.asarray(rng.uniform(0.5, 3.0, size=(T, H, W)).astype(np.float32))
    labels_np = rng.integers(0, C, size=(T, H, W)).astype(np.int32)
    si, off = zip(*(class_sorted_pixels(l, C) for l in labels_np))
    est = jnp.tile(jnp.eye(4), (T, 1, 1))
    enc = init_encoder_params(0)
    feats = encode_images(
        enc, jnp.broadcast_to(colors[:, None], (T, 3, H, W, 3))
    )
    window = {
        "colors": colors, "depths": depths, "labels": jnp.asarray(labels_np),
        "sorted_idx": jnp.stack([jnp.asarray(x) for x in si]),
        "offsets": jnp.stack([jnp.asarray(x) for x in off]),
        "refer_feats": feats,
        "refer_fixed_c2w": jnp.broadcast_to(est[:, None], (T, 3, 4, 4)),
        "refer_src": jnp.full((T, 3), -1, jnp.int32),
        "pose_train": jnp.ones(T),
        "bound": bound,
        "lt_gate_iter": jnp.asarray(-1, jnp.int32),
    }
    t7 = tensor_from_camera(est)
    loss_fn = _build_loss_fn(spec, cfg, T, jnp.float32)
    opt_params = (params, t7[:, :4], t7[:, 4:])
    key = jax.random.PRNGKey(1)
    _, aux0 = loss_fn(opt_params, key, jnp.asarray(0), window)
    _, aux1 = loss_fn(opt_params, key, jnp.asarray(1), window)
    _, aux3 = loss_fn(opt_params, key, jnp.asarray(3), window)
    assert float(aux1["sm_loss"]) == 0.0          # off-iteration skipped
    assert float(aux0["sm_loss"]) > 0.0           # on-iteration contributes
    # same key, same subgrid: stride-3 value is 3x the every-iter value
    cfg1 = MapConfig(
        H=H, W=W, fx=16.0, fy=16.0, cx=15.5, cy=11.5,
        n_pixels=60, n_samples=8, n_surface=4, smooth_pts=6, smooth_every=1,
    )
    loss1 = _build_loss_fn(spec, cfg1, T, jnp.float32)
    _, aux_ref = loss1(opt_params, key, jnp.asarray(0), window)
    np.testing.assert_allclose(
        float(aux0["sm_loss"]), 3.0 * float(aux_ref["sm_loss"]), rtol=1e-5
    )


def test_map_fn_chunked_matches_single_dispatch():
    """chunk=k splits the keystep into k-iteration dispatches carrying Adam
    state + keys: identical trajectory to the one-dispatch scan."""
    import jax.numpy as jnp
    from dnsjax.models.decoder import DecoderSpec, init_decoder_params
    from dnsjax.models.encoder import init_encoder_params, encode_images
    from dnsjax.ops.hashgrid import HashGridSpec
    from dnsjax.geometry.se3 import tensor_from_camera
    from dnsjax.slam.mapper import MapConfig, make_map_fn
    from dnsjax.slam.sampling import class_sorted_pixels

    H, W, T, C = 24, 32, 2, 4
    spec = DecoderSpec(n_class=C, grid=HashGridSpec(4, 2, 10, 4, 32), n_bins=16)
    params = init_decoder_params(jax.random.PRNGKey(0), spec)
    bound = jnp.asarray([[-2.2, 2.2], [-2.2, 2.2], [-2.2, 2.2]])
    cfg = MapConfig(
        H=H, W=W, fx=16.0, fy=16.0, cx=15.5, cy=11.5,
        n_pixels=60, n_samples=8, n_surface=4, smooth_pts=6,
    )
    rng = np.random.default_rng(0)
    colors = jnp.asarray(rng.uniform(size=(T, H, W, 3)).astype(np.float32))
    depths = jnp.asarray(rng.uniform(0.5, 3.0, size=(T, H, W)).astype(np.float32))
    labels_np = rng.integers(0, C, size=(T, H, W)).astype(np.int32)
    si, off = zip(*(class_sorted_pixels(l, C) for l in labels_np))
    est = jnp.tile(jnp.eye(4), (T, 1, 1))
    enc = init_encoder_params(0)
    feats = encode_images(
        enc, jnp.broadcast_to(colors[:, None], (T, 3, H, W, 3))
    )
    window = {
        "colors": colors, "depths": depths, "labels": jnp.asarray(labels_np),
        "sorted_idx": jnp.stack([jnp.asarray(x) for x in si]),
        "offsets": jnp.stack([jnp.asarray(x) for x in off]),
        "refer_feats": feats,
        "refer_fixed_c2w": jnp.broadcast_to(est[:, None], (T, 3, 4, 4)),
        "refer_src": jnp.full((T, 3), -1, jnp.int32),
        "pose_train": jnp.ones(T),
        "bound": bound,
        "lt_gate_iter": jnp.asarray(3, jnp.int32),  # exercise the it offset
    }
    t7 = tensor_from_camera(est)
    key = jax.random.PRNGKey(7)

    f_one = make_map_fn(spec, cfg, T, 10, jnp.float32)
    f_chk = make_map_fn(spec, cfg, T, 10, jnp.float32, chunk=5)
    p1, q1, T1, a1 = f_one(params, t7[:, :4], t7[:, 4:], window, key)
    p2, q2, T2, a2 = f_chk(params, t7[:, :4], t7[:, 4:], window, key)
    np.testing.assert_allclose(np.asarray(a1["losses"]),
                               np.asarray(a2["losses"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(T1), np.asarray(T2), rtol=1e-5)
    for k in p1:
        np.testing.assert_allclose(
            np.asarray(jax.tree_util.tree_leaves(p1[k])[0]),
            np.asarray(jax.tree_util.tree_leaves(p2[k])[0]),
            rtol=1e-5, atol=1e-7,
        )
    import pytest as _pytest
    with _pytest.raises(ValueError):
        make_map_fn(spec, cfg, T, 10, jnp.float32, chunk=3)


def test_map_fn_chunk_cache_shares_program():
    """Different n_iters with a shared cache reuse one jitted chunk program,
    and the cached program still produces the exact unchunked trajectory."""
    import jax.numpy as jnp
    from dnsjax.models.decoder import DecoderSpec, init_decoder_params
    from dnsjax.models.encoder import init_encoder_params, encode_images
    from dnsjax.ops.hashgrid import HashGridSpec
    from dnsjax.geometry.se3 import tensor_from_camera
    from dnsjax.slam.mapper import MapConfig, make_map_fn
    from dnsjax.slam.sampling import class_sorted_pixels

    H, W, T, C = 24, 32, 2, 4
    spec = DecoderSpec(n_class=C, grid=HashGridSpec(4, 2, 10, 4, 32), n_bins=16)
    params = init_decoder_params(jax.random.PRNGKey(0), spec)
    bound = jnp.asarray([[-2.2, 2.2], [-2.2, 2.2], [-2.2, 2.2]])
    cfg = MapConfig(
        H=H, W=W, fx=16.0, fy=16.0, cx=15.5, cy=11.5,
        n_pixels=60, n_samples=8, n_surface=4, smooth_pts=6,
    )
    rng = np.random.default_rng(0)
    colors = jnp.asarray(rng.uniform(size=(T, H, W, 3)).astype(np.float32))
    depths = jnp.asarray(rng.uniform(0.5, 3.0, size=(T, H, W)).astype(np.float32))
    labels_np = rng.integers(0, C, size=(T, H, W)).astype(np.int32)
    si, off = zip(*(class_sorted_pixels(l, C) for l in labels_np))
    est = jnp.tile(jnp.eye(4), (T, 1, 1))
    enc = init_encoder_params(0)
    feats = encode_images(
        enc, jnp.broadcast_to(colors[:, None], (T, 3, H, W, 3))
    )
    window = {
        "colors": colors, "depths": depths, "labels": jnp.asarray(labels_np),
        "sorted_idx": jnp.stack([jnp.asarray(x) for x in si]),
        "offsets": jnp.stack([jnp.asarray(x) for x in off]),
        "refer_feats": feats,
        "refer_fixed_c2w": jnp.broadcast_to(est[:, None], (T, 3, 4, 4)),
        "refer_src": jnp.full((T, 3), -1, jnp.int32),
        "pose_train": jnp.ones(T),
        "bound": bound,
        "lt_gate_iter": jnp.asarray(-1, jnp.int32),
    }
    t7 = tensor_from_camera(est)
    key = jax.random.PRNGKey(9)

    cache = {}
    f10 = make_map_fn(spec, cfg, T, 10, jnp.float32, chunk=5,
                      _chunk_cache=cache)
    f20 = make_map_fn(spec, cfg, T, 20, jnp.float32, chunk=5,
                      _chunk_cache=cache)
    assert len(cache) == 1  # one shared program for both n_iters

    f_ref = make_map_fn(spec, cfg, T, 10, jnp.float32)
    _, q1, T1, a1 = f10(params, t7[:, :4], t7[:, 4:], window, key)
    _, q2, T2, a2 = f_ref(params, t7[:, :4], t7[:, 4:], window, key)
    np.testing.assert_allclose(np.asarray(a1["losses"]),
                               np.asarray(a2["losses"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), rtol=1e-5)
    # the 20-iter variant runs 4 chunks of the same cached program
    _, _, _, a3 = f20(params, t7[:, :4], t7[:, 4:], window, key)
    assert np.asarray(a3["losses"]).shape == (20,)
    assert np.isfinite(np.asarray(a3["losses"])).all()


def test_chunk_for_routes_steady_keystep_through_shared_program():
    """First (500-iter) and steady (n_iters/2) keysteps share ONE compiled
    chunk program: _chunk_for returns n_iters itself when it fits the
    dispatch bound, and make_map_fn routes chunk == n_iters through the
    cached chunk path (single dispatch) instead of a second jit program."""
    cfg = synthetic_slam_config(H=24, W=32, n_frames=3)
    cfg["mapping"]["n_iters"] = 10
    cfg["mapping"]["n_iters_first"] = 40
    slam = DNSSLAM(cfg, output_dir="/tmp/dnsjax_chunkshare")
    assert slam.max_iters_per_dispatch == 5  # n_iters // 2 default
    assert slam._chunk_for(5) == 5    # steady per-call count -> chunked path
    assert slam._chunk_for(40) == 5   # first keystep -> same chunk size
    assert slam._chunk_for(0) == 0 or True  # no crash on degenerate input

    # chunk == n_iters must reuse the cached program, not compile a new one
    from dnsjax.slam.mapper import make_map_fn
    from dnsjax.models.decoder import DecoderSpec
    from dnsjax.ops.hashgrid import HashGridSpec
    from dnsjax.slam.mapper import MapConfig

    spec = DecoderSpec(n_class=4, grid=HashGridSpec(4, 2, 10, 4, 32), n_bins=16)
    mcfg = MapConfig(H=24, W=32, fx=16.0, fy=16.0, cx=15.5, cy=11.5,
                     n_pixels=60, n_samples=8, n_surface=4, smooth_pts=6)
    cache = {}
    make_map_fn(spec, mcfg, 2, 40, jnp.float32, chunk=5, _chunk_cache=cache)
    make_map_fn(spec, mcfg, 2, 5, jnp.float32, chunk=5, _chunk_cache=cache)
    assert len(cache) == 1


def test_async_keystep_snapshot_semantics(tmp_path):
    """Under async_map the tracker renders against the PREVIOUS keystep's
    params while a keystep is pending (reference: the tracker's deepcopy
    snapshot, tracking.py:76-83), and the pending keystep is consumed at
    the next keystep boundary."""
    cfg = synthetic_slam_config(
        H=32, W=40, n_frames=8, n_iters_track=4, n_iters_map=6,
        n_pixels_map=120,
    )
    cfg["sync_method"] = "strict"
    cfg["tpu"] = dict(cfg.get("tpu", {}) or {}, async_map=True)

    seen = []

    class Probe(DNSSLAM):
        def track_frame(self, idx, cur):
            seen.append(
                (idx, self._pending_map is not None,
                 self._track_params is self.params)
            )
            return super().track_frame(idx, cur)

    slam = Probe(cfg, output_dir=str(tmp_path / "async"))
    est, gt = slam.run()
    assert np.isfinite(est).all()
    # keysteps dispatch at frames 5, 7 (strict, optimize_every=5, last=7);
    # frames tracked after a dispatch must see a pending keystep and a
    # tracker snapshot that is NOT the in-flight params pytree
    pend = [s for s in seen if s[1]]
    assert pend, f"no frame tracked against a pending keystep: {seen}"
    assert all(not same for _, _, same in pend)
    # all pendings consumed by the end
    assert slam._pending_map is None
    # the final map matches the tracker snapshot again
    assert slam._track_params is slam.params


def test_map_device_second_device(tmp_path):
    """tpu.map_device runs keysteps on a second device with the params
    hand-off back to the tracking device (the reference's two-processes-
    one-GPU overlap, dns_slam.py:161-172, done across chips)."""
    cfg = synthetic_slam_config(
        H=32, W=40, n_frames=8, n_iters_track=4, n_iters_map=6,
        n_pixels_map=120,
    )
    cfg["sync_method"] = "loose"
    cfg["tpu"] = dict(cfg.get("tpu", {}) or {}, map_device=1, async_map=True)
    slam = DNSSLAM(cfg, output_dir=str(tmp_path / "mapdev"))
    assert slam.map_device is not None
    est, gt = slam.run()
    assert np.isfinite(est).all()
    # params returned to the tracking device for the tracker/mesher/eval
    leaf = jax.tree_util.tree_leaves(slam.params)[0]
    assert list(leaf.devices())[0] == jax.devices()[0]
    err = np.abs(est[:, :3, 3] - gt[:, :3, 3]).max()
    assert err < 0.5, f"two-device SLAM diverged: {err}"


def test_visualizer_mesh_surface_and_camera_actors(tmp_path):
    """The 3D replay draws the reference's camera-actor glyph
    (utils/viz.py:14-42) and the mesh as a shaded face collection."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from dnsjax.cli.visualizer import _camera_segments, _draw, _load_mesh
    from dnsjax.mesh.export import write_ply

    pose = np.eye(4)
    pose[:3, 3] = [1.0, 2.0, 3.0]
    segs = _camera_segments(pose, scale=0.2)
    assert segs.shape == (12, 2, 3)
    # the glyph apex (point 0) sits at the camera origin
    apex = segs[6, 1]  # line [1, 0] ends at point 0
    assert np.allclose(apex, pose[:3, 3])
    # all other glyph points sit in front of the camera (-z after the
    # reference's z flip, utils/viz.py:192)
    assert (segs.reshape(-1, 3)[:, 2] <= 3.0 + 1e-9).all()

    v = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    f = np.asarray([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]])
    c = np.asarray([[255, 0, 0]] * 4, np.uint8)
    write_ply(str(tmp_path / "mesh_0.ply"), v, f, c)
    mesh = _load_mesh(str(tmp_path / "mesh_0.ply"))
    assert mesh["tris"].shape == (4, 3, 3)
    assert mesh["fc"].shape[0] == 4
    # red vertex colors survive shading (red channel dominates)
    assert (mesh["fc"][:, 0] > mesh["fc"][:, 1]).all()

    poses = np.tile(np.eye(4), (6, 1, 1))
    poses[:, 0, 3] = np.linspace(0, 1, 6)
    fig = plt.figure()
    ax = fig.add_subplot(projection="3d")
    _draw(ax, poses, poses, mesh, idx=5, every=2)
    fig.savefig(str(tmp_path / "frame.png"))
    plt.close(fig)
    assert (tmp_path / "frame.png").stat().st_size > 0


def test_live_visualizer_follows_metrics(tmp_path):
    """cli/visualizer.py --live tails metrics.jsonl track events (with the
    streamed c2w/gt_c2w rows, driver._track) and keeps live.png updated."""
    import json

    from dnsjax.cli.visualizer import _live

    out = str(tmp_path)
    with open(f"{out}/metrics.jsonl", "w") as f:
        for i in range(4):
            c2w = np.eye(4)[:3, :4].copy()
            c2w[0, 3] = 0.1 * i
            f.write(json.dumps({
                "event": "track", "frame": i, "seconds": 0.1,
                "c2w": c2w.reshape(-1).tolist(),
                "gt_c2w": c2w.reshape(-1).tolist(),
            }) + "\n")
        f.write('{"event": "map", "frame": 3}\n')  # no pose: ignored
        f.write('{bad json\n')  # corrupt line: skipped

    _live(out, interval=0.05, idle_timeout=0.3)
    assert (tmp_path / "live.png").exists()


def test_live_visualizer_serve(tmp_path):
    """--serve: the stdlib HTTP viewer returns the auto-refresh page and
    the current live.png, 404s before the first frame, and shuts down."""
    import urllib.error
    import urllib.request

    from dnsjax.cli.visualizer import _serve

    out = str(tmp_path)
    srv = _serve(out, port=0, interval=0.5)
    port = srv.server_address[1]
    try:
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=5).read().decode()
        assert "live.png" in page
        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/live.png", timeout=5)
            assert False, "expected 404 before live.png exists"
        except urllib.error.HTTPError as e:
            assert e.code == 404
        (tmp_path / "live.png").write_bytes(b"\x89PNG fake")
        got = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/live.png?123", timeout=5).read()
        assert got == b"\x89PNG fake"
    finally:
        srv.shutdown()


def test_tracking_retry_on_loss_outlier():
    """When a frame's best loss is an outlier vs recent history, the driver
    re-tracks from the raw previous pose and logs retried=true; with a
    primed low-loss history every frame triggers, and the trajectory must
    still come out finite and bounded (the retry keeps the better of the
    two candidates, so it can only improve the pose)."""
    import json
    import os

    cfg = synthetic_slam_config(n_frames=10, n_iters_track=10, n_iters_map=20)
    cfg["tracking"]["retry_factor"] = 1e-6  # fire on every tracked frame
    out = "/tmp/dnsjax_test_retry"
    os.system(f"rm -rf {out}")
    slam = DNSSLAM(cfg, output_dir=out)
    est, gt = slam.run()
    assert np.all(np.isfinite(est))
    events = [json.loads(l) for l in open(f"{out}/metrics.jsonl")]
    tracked = [e for e in events if e["event"] == "track"]
    # history needs 5 entries before the gate can fire
    assert any(e["retried"] for e in tracked[5:])
    assert all("retried" in e for e in tracked)
