import os

from dnsjax.config import load_config, update_recursive


def test_update_recursive():
    a = {"x": 1, "sub": {"a": 1, "b": 2}}
    update_recursive(a, {"sub": {"b": 3, "c": 4}, "y": 5})
    assert a == {"x": 1, "sub": {"a": 1, "b": 3, "c": 4}, "y": 5}


def test_inherit_chain(tmp_path):
    (tmp_path / "default.yaml").write_text("a: 1\nmodel: {h: 32, d: 2}\n")
    (tmp_path / "dataset.yaml").write_text("a: 2\nmodel: {d: 3}\n")
    scene = tmp_path / "scene.yaml"
    scene.write_text(f"inherit_from: {tmp_path}/dataset.yaml\nmodel: {{h: 64}}\n")
    cfg = load_config(str(scene), str(tmp_path / "default.yaml"))
    assert cfg["a"] == 2
    assert cfg["model"] == {"h": 64, "d": 3}


def test_inherit_relative_to_config_dir(tmp_path):
    sub = tmp_path / "scenes"
    sub.mkdir()
    (sub / "base.yaml").write_text("k: 1\n")
    (sub / "scene.yaml").write_text("inherit_from: base.yaml\nj: 2\n")
    cfg = load_config(str(sub / "scene.yaml"))
    assert cfg == {"inherit_from": "base.yaml", "k": 1, "j": 2}


def test_repo_configs_load():
    root = os.path.join(os.path.dirname(__file__), "..")
    scene = os.path.join(root, "configs", "replica", "room_0.yaml")
    default = os.path.join(root, "configs", "slam.yaml")
    if not os.path.exists(scene):
        return
    cfg = load_config(scene, default)
    assert cfg["dataset"] == "replica"
    assert cfg["model"]["grid"]["method"] == "HashGrid"
    assert "bound" in cfg["back_end"]


def test_ab_variants_pin_tracking_method():
    """Every A/B variant must pin tracking.method (and the gaussian/quartic +
    smooth_every axes) explicitly: configs/slam.yaml defaults drift as gated
    deviations are adopted, and a variant that omitted a pinned axis would
    silently inherit the new default and stop measuring what its name says
    (this burned the first @kf sweep: the parity anchor inherited the
    adopted tracking.method=lm)."""
    import importlib.util

    root = os.path.join(os.path.dirname(__file__), "..")
    spec = importlib.util.spec_from_file_location(
        "abq", os.path.join(root, "scripts", "ab_quality.py")
    )
    abq = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(abq)
    for name, overrides in abq.VARIANTS.items():
        assert "method" in overrides.get("tracking", {}), name
        assert "kernel" in overrides.get("pos", {}), name
        assert "smooth_every" in overrides.get("training", {}), name
        # an lm variant that omits lm_iters would silently inherit the
        # adopted slam.yaml default (8, was 10) — the exact default-drift
        # failure BASE_SCHEDULE exists to prevent
        if overrides["tracking"]["method"] == "lm":
            assert "lm_iters" in overrides["tracking"], name


def test_production_point_coherent_across_configs():
    """The adopted production operating point (ns16-m50-map10, round 4)
    must be what the shipped scene configs actually resolve to — round 3
    shipped a replica.yaml tracking batch that silently contradicted the
    adopted LM tracker (VERDICT r3 weak #2)."""
    root = os.path.join(os.path.dirname(__file__), "..")
    default = os.path.join(root, "configs", "slam.yaml")
    for scene in ("replica/room_0.yaml", "replica/office_0.yaml"):
        cfg = load_config(os.path.join(root, "configs", scene), default)
        assert cfg["training"]["n_samples_ray"] == 16, scene
        assert cfg["mapping"]["n_iters"] == 50, scene
        assert cfg["mapping"]["optimize_every_n_frames"] == 10, scene
        assert cfg["tracking"]["method"] == "lm", scene
        # gated at 8 damped-GN steps (AB_QUALITY.md conclusion 17)
        assert cfg["tracking"]["lm_iters"] == 8, scene
        # LM frame cost is row-rate linear in n_pixels: big tracking
        # batches are NOT free (they were for Adam)
        assert cfg["tracking"]["n_pixels"] == 500, scene
    scannet = load_config(
        os.path.join(root, "configs", "scannet", "scene0000.yaml"), default
    )
    assert scannet["training"]["n_samples_ray"] == 16
    assert scannet["tracking"]["n_pixels"] == 1000  # reference value


def test_ab_base_schedule_frozen_against_default_drift():
    """scripts/ab_quality.py must assemble variant configs on the REFERENCE
    schedule even though configs/slam.yaml now defaults to the adopted
    production point — otherwise every unpinned variant silently re-shapes
    when a gate adoption lands (the failure mode that burned the first @kf
    sweep via tracking.method)."""
    import importlib.util

    root = os.path.join(os.path.dirname(__file__), "..")
    spec = importlib.util.spec_from_file_location(
        "abq", os.path.join(root, "scripts", "ab_quality.py")
    )
    abq = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(abq)
    cwd = os.getcwd()
    os.chdir(root)
    try:
        cfg = abq.build_variant_cfg(
            "parity", abq.VARIANTS["parity"], frames=40, small=False
        )
    finally:
        os.chdir(cwd)
    assert cfg["training"]["n_samples_ray"] == 32
    assert cfg["mapping"]["n_iters"] == 100
    assert cfg["mapping"]["n_iters_first"] == 500
    assert cfg["mapping"]["optimize_every_n_frames"] == 5
    assert cfg["mapping"]["n_pixels"] == 2000
    assert cfg["tracking"]["n_iters"] == 50
    assert cfg["tracking"]["n_pixels"] == 500
    # variant overrides still win over the frozen base
    cfg = abq.build_variant_cfg(
        "ns16-m50-map10", abq.VARIANTS["ns16-m50-map10"], frames=40,
        small=False,
    )
    assert cfg["training"]["n_samples_ray"] == 16
    assert cfg["mapping"]["n_iters"] == 50
    assert cfg["mapping"]["optimize_every_n_frames"] == 10
