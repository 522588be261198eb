"""Checkpoint save/load (reference: models/checkpoint.py:5-66).

The reference pickles module state_dicts plus the whole keyframe dict
(including images) into ``model.pt``. dnsjax stores the same content as one
compressed .npz: flattened parameter pytrees (keyed by path), pose lists,
keyframe store arrays, and small metadata. Loads are tolerant to missing
keys, like the reference's partial restore.
"""

from __future__ import annotations

import io
import json
import os
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp


def _flatten(tree, prefix: str) -> Dict[str, np.ndarray]:
    flat = {}
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves_with_paths:
        key = prefix + "/" + "/".join(str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten_like(template, flat: Dict[str, np.ndarray], prefix: str):
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths:
        key = prefix + "/" + "/".join(str(p) for p in path)
        if key in flat:
            leaves.append(jnp.asarray(flat[key]))
        else:  # tolerant partial load
            leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_checkpoint(
    path: str,
    params,
    enc_params,
    estimate_c2w: np.ndarray,
    gt_c2w: np.ndarray,
    keyframes=None,
    idx: int = 0,
    scene: str = "",
    exist_decoders: Optional[Dict[int, int]] = None,
) -> None:
    out: Dict[str, np.ndarray] = {}
    out.update(_flatten(params, "params"))
    out.update(_flatten(enc_params, "enc"))
    out["estimate_c2w"] = np.asarray(estimate_c2w)
    out["gt_c2w"] = np.asarray(gt_c2w)
    meta = {
        "idx": int(idx),
        "scene": scene,
        "exist_decoders": {str(k): int(v) for k, v in (exist_decoders or {}).items()},
    }
    if keyframes is not None:
        out["kf/colors"] = np.asarray(keyframes.colors[: keyframes.count])
        out["kf/depths"] = np.asarray(keyframes.depths[: keyframes.count])
        out["kf/labels"] = np.asarray(keyframes.labels[: keyframes.count])
        out["kf/gt_c2w"] = np.asarray(keyframes.gt_c2w[: keyframes.count])
        out["kf/est_c2w"] = np.asarray(keyframes.est_c2w[: keyframes.count])
        meta["kf_frame_ids"] = keyframes.frame_ids
        meta["kf_capacity"] = keyframes.capacity
        meta["n_class"] = keyframes.n_class
    out["meta_json"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **out)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Returns the raw dict; use restore_params for pytrees."""
    z = np.load(path, allow_pickle=False)
    data = {k: z[k] for k in z.files}
    meta = json.loads(bytes(data.pop("meta_json").tobytes()).decode("utf-8"))
    data["meta"] = meta
    return data


def restore_params(template, ckpt: Dict[str, Any], prefix: str = "params"):
    return _unflatten_like(template, ckpt, prefix)
