"""Multi-chip validation on the virtual 8-device CPU mesh (conftest forces
JAX_PLATFORMS=cpu with xla_force_host_platform_device_count=8)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_device_count():
    assert len(jax.devices()) == 8


def test_dryrun_multichip_full_mesh():
    """The driver's own multichip validation path on all 8 devices."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_dryrun_multichip_subset():
    import __graft_entry__ as ge

    ge.dryrun_multichip(2)


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
