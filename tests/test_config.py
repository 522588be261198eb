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
