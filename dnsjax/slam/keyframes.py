"""Fixed-capacity on-device keyframe store.

The reference keeps keyframes as a Python list of CPU tensors and re-uploads
windows every keystep (reference: slams/mapping.py:57-58, 975-979,
1082-1089). dnsjax pre-allocates device arrays of capacity ``max_keyframes``
so window assembly is pure device gathers; per-frame class-sorted pixel
indices (for balanced sampling) are computed once at insertion on host.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import jax.numpy as jnp

from dnsjax.slam.sampling import class_sorted_pixels


class KeyframeStore:
    def __init__(self, capacity: int, H: int, W: int, n_class: int,
                 image_dtype=jnp.float32):
        self.capacity = capacity
        self.H, self.W = H, W
        self.n_class = n_class
        self.count = 0
        self.frame_ids: List[int] = []

        self.colors = jnp.zeros((capacity, H, W, 3), image_dtype)
        self.depths = jnp.zeros((capacity, H, W), jnp.float32)
        self.labels = jnp.zeros((capacity, H, W), jnp.int32)
        self.gt_c2w = jnp.tile(jnp.eye(4), (capacity, 1, 1))
        self.est_c2w = jnp.tile(jnp.eye(4), (capacity, 1, 1))
        self.sorted_idx = jnp.zeros((capacity, H * W), jnp.int32)
        self.class_offsets = jnp.zeros((capacity, n_class + 1), jnp.int32)

    def add(self, frame: Dict[str, np.ndarray], est_c2w: np.ndarray) -> int:
        """Insert a keyframe; returns its slot index."""
        if self.count >= self.capacity:
            raise RuntimeError(
                f"keyframe store full ({self.capacity}); raise mapping.max_keyframes"
            )
        k = self.count
        sorted_idx, offsets = class_sorted_pixels(
            np.asarray(frame.get("label_np", frame["label"])), self.n_class
        )
        self.colors = self.colors.at[k].set(
            jnp.asarray(frame["color"], self.colors.dtype)
        )
        self.depths = self.depths.at[k].set(jnp.asarray(frame["depth"]))
        self.labels = self.labels.at[k].set(jnp.asarray(frame["label"]))
        self.gt_c2w = self.gt_c2w.at[k].set(jnp.asarray(frame["c2w"]))
        self.est_c2w = self.est_c2w.at[k].set(jnp.asarray(est_c2w))
        self.sorted_idx = self.sorted_idx.at[k].set(jnp.asarray(sorted_idx))
        self.class_offsets = self.class_offsets.at[k].set(jnp.asarray(offsets))
        self.frame_ids.append(int(frame["index"]))
        self.count += 1
        return k

    def update_pose(self, slot: int, est_c2w) -> None:
        """Write back a BA-refined pose (reference: mapping.py:916-926)."""
        self.est_c2w = self.est_c2w.at[slot].set(jnp.asarray(est_c2w))

    def evict(self, slot: int) -> None:
        """Remove a keyframe, shifting later slots down to keep the store
        ordered by insertion time (the window/refer logic relies on slot
        order == temporal order). The reference never evicts — its keyframe
        list grows without bound (mapping.py:1082-1089); eviction is dnsjax's
        robustness extension for sequences longer than
        capacity * choose_keyframe_every frames."""
        if not (0 <= slot < self.count):
            raise IndexError(f"evict slot {slot} out of range (count {self.count})")
        K = self.count
        if slot < K - 1:
            for name in (
                "colors", "depths", "labels", "gt_c2w", "est_c2w",
                "sorted_idx", "class_offsets",
            ):
                arr = getattr(self, name)
                setattr(self, name, arr.at[slot : K - 1].set(arr[slot + 1 : K]))
        del self.frame_ids[slot]
        self.count -= 1

    def est_poses_np(self) -> np.ndarray:
        return np.asarray(self.est_c2w[: self.count])
