"""SLAM orchestration: deterministic single-process tracker/mapper interleave.

Counterpart of the reference ``DNS_SLAM`` (reference: slams/dns_slam.py),
which spawns two torch.multiprocessing processes that sleep-poll shared
tensors (dns_slam.py:54-67, 161-172; tracking.py:259-269;
mapping.py:988-1004). Under the default ``sync_method: strict`` schedule the
two processes are effectively lock-stepped (track ``optimize_every_n_frames``
frames, then map once); dnsjax makes that schedule explicit: one host loop
interleaves the jit-compiled ``track`` and ``map_step`` programs, which also
makes the reference's benign races (tracker snapshots of a decoder mid-update)
deterministic by construction.

The reference's frozen-at-frame-1 tracking reference view (an operator-
precedence bug at tracking.py:288) is fixed by default — the tracker's
reference frame advances each keystep as intended; set
``tpu.fix_refer_frame_bug: false`` for reference-faithful behavior.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from dnsjax.data import get_dataset
from dnsjax.geometry.se3 import (
    tensor_from_camera,
    camera_from_tensor,
    tensor_from_camera_np,
    camera_from_tensor_np,
)
from dnsjax.models.decoder import DecoderSpec, init_decoder_params, decoder_param_count
from dnsjax.models.encoder import init_encoder_params, encode_images

# shared across driver instances (see DNSSLAM.__init__: self._encode)
_ENCODE_JIT = jax.jit(encode_images, static_argnums=(2,))
from dnsjax.slam.keyframes import KeyframeStore
from dnsjax.slam.mapper import (
    MapConfig,
    make_map_fn,
    make_decoder_init_fn,
    make_overlap_score_fn,
)
from dnsjax.slam.sampling import class_sorted_pixels
from dnsjax.slam.tracker import TrackConfig, make_track_fn, pose_init_const_velocity


def load_bound(cfg: Dict[str, Any]) -> np.ndarray:
    """Scene bound, scaled and enlarged so each extent divides
    ``bound_divisible`` (reference: dns_slam.py:100-107)."""
    scale = float(cfg.get("scale", 1))
    bound = np.asarray(cfg["back_end"]["bound"], np.float64) * scale
    dv = float(cfg.get("bound_divisible", 0.32))
    bound[:, 1] = (
        np.floor((bound[:, 1] - bound[:, 0]) / dv).astype(np.int64) + 1
    ) * dv + bound[:, 0]
    return bound.astype(np.float32)


class DNSSLAM:
    """Build datasets, model, tracker/mapper programs; run the SLAM loop."""

    def __init__(self, cfg: Dict[str, Any], output_dir: Optional[str] = None):
        self.cfg = cfg
        self.verbose = bool(cfg.get("verbose", True))
        self.out_dir = output_dir or cfg.get("out_dir", "output")
        os.makedirs(self.out_dir, exist_ok=True)
        self.scene = cfg.get("scene", "scene")

        scale = float(cfg.get("scale", 1))
        input_folder = cfg.get("input_folder") or os.path.join(
            cfg.get("dataset_dir", ""), cfg.get("scene", "")
        )
        self.dataset = get_dataset(cfg, input_folder, scale)
        self.n_img = len(self.dataset)
        self.n_class = self.dataset.n_class

        self.bound = load_bound(cfg)
        self.bound_j = jnp.asarray(self.bound)
        self.spec = DecoderSpec.from_config(cfg, self.bound, self.n_class)

        tpu_cfg = cfg.get("tpu", {})
        self.compute_dtype = (
            jnp.bfloat16
            if tpu_cfg.get("compute_dtype", "bfloat16") == "bfloat16"
            else jnp.float32
        )
        self.fix_refer_bug = bool(tpu_cfg.get("fix_refer_frame_bug", True))
        feature_taps = int(tpu_cfg.get("feature_taps", 4))
        # "sort" | "merge" — bit-identical z values either way
        # (render/sampling.py); a pure speed knob. ALWAYS assigned (with the
        # module's import-time default) so one DNSSLAM's setting cannot leak
        # into a later instance in the same process.
        from dnsjax.render import sampling as _sampling

        zb = str(tpu_cfg.get("z_backend", _sampling.Z_BACKEND_DEFAULT))
        if zb not in ("sort", "merge"):
            raise ValueError(f"tpu.z_backend={zb!r}: expected sort|merge")
        _sampling.Z_BACKEND = zb
        # data-parallel ray sharding over the first N devices (tpu.data_parallel;
        # each device samples its own cfg.n_pixels rays, grads pmean over ICI)
        self.dp_devices = min(
            int(tpu_cfg.get("data_parallel", 1)), len(jax.devices())
        )

        seed = int(cfg.get("seed", 0))
        self.key = jax.random.PRNGKey(seed)
        self.params = init_decoder_params(self._next_key(), self.spec)
        self.enc_params = init_encoder_params(
            seed, mode=str(tpu_cfg.get("encoder_init", "gabor"))
        )

        ds = self.dataset
        tr, mp, trn = cfg["tracking"], cfg["mapping"], cfg["training"]
        self.track_cfg = TrackConfig(
            H=ds.H, W=ds.W, fx=ds.fx, fy=ds.fy, cx=ds.cx, cy=ds.cy,
            n_iters=int(tr["n_iters"]), n_pixels=int(tr["n_pixels"]),
            n_samples=int(trn["n_samples_ray"]), n_surface=int(trn["n_surface_ray"]),
            ignore_edge=int(tr.get("ignore_edge", 20)),
            cam_lr=float(tr["cam_lr"]),
            separate_lr=bool(cfg.get("seperate_LR", False)),
            feature_taps=feature_taps,
            patience=int(tr.get("patience", 0)),
            method=str(tr.get("method", "adam")),
            lm_iters=int(tr.get("lm_iters", 10)),
            lm_patience=int(tr.get("lm_patience", 0)),
            lm_lambda0=float(tr.get("lm_lambda0", 1e-3)),
            lm_up=float(tr.get("lm_up", 5.0)),
            lm_down=float(tr.get("lm_down", 0.5)),
            lambda_p=float(trn["lambda_color"]), lambda_d=float(trn["lambda_depth"]),
            lambda_l=float(trn["lambda_label"]),
        )
        self.map_cfg = MapConfig(
            H=ds.H, W=ds.W, fx=ds.fx, fy=ds.fy, cx=ds.cx, cy=ds.cy,
            n_pixels=int(mp["n_pixels"]),
            n_samples=int(trn["n_samples_ray"]), n_surface=int(trn["n_surface_ray"]),
            lr=float(trn["lr"]), ba_cam_lr=float(mp["BA_cam_lr"]),
            lambda_p=float(trn["lambda_color"]), lambda_d=float(trn["lambda_depth"]),
            lambda_l=float(trn["lambda_label"]), lambda_sm=float(trn["lambda_smooth"]),
            lambda_fs=float(trn["lambda_fs"]), lambda_op=float(trn["lambda_opacity"]),
            smooth_pts=int(trn["smooth_pts"]),
            smooth_every=int(trn.get("smooth_every", 1)),
            opacity_sigma=float(trn["opacity_sigma"]),
            feature_taps=feature_taps,
        )

        self.n_joint = int(mp["n_joint_optimize_frames"])
        self.n_refer = int(mp["n_refer_frames"])
        if self.n_refer != 2:
            # _refer_slots/_build_window implement the reference's fixed
            # layout of 2 keyframe reference views + the target itself
            # (mapping.py:312-326, 400-411); other counts would need a
            # different window schema.
            raise ValueError(
                f"mapping.n_refer_frames={self.n_refer} unsupported; "
                "only the reference default of 2 is implemented"
            )
        self.optimize_every = int(mp["optimize_every_n_frames"])
        self.keyframe_every = int(mp["choose_keyframe_every"])
        self.start_optimize_idx = int(mp["start_optimize_idx"])
        self.n_iters = int(mp["n_iters"])
        self.n_iters_first = int(mp["n_iters_first"])
        self.vis_every = int(mp.get("vis_every", 0))
        self.mesh_every = int(mp.get("mesh_every", 0))
        self.checkpoint_every = int(mp.get("checkpoint_every", 0))
        self.use_gt_camera = bool(cfg.get("use_gt_camera", False))
        self.const_speed = bool(cfg.get("const_speed_assumption", True))
        self.sync_method = str(cfg.get("sync_method", "strict"))
        # outlier-frame tracking retry (robustness extension; the reference
        # has no recovery path — a failed frame silently poisons the whole
        # trajectory through the const-velocity init): when a frame's best
        # loss exceeds retry_factor x the median of recent frames, re-track
        # from the raw previous pose (no velocity extrapolation) with a
        # fresh ray-sampling key and keep the lower-loss result. 0 = off.
        self.track_retry_factor = float(tr.get("retry_factor", 3.0))
        self._track_loss_hist: List[float] = []

        cap = int(mp.get("max_keyframes", 96))
        self.keyframes = KeyframeStore(cap, ds.H, ds.W, self.n_class)
        # on overflow: "redundant" evicts the most pose-redundant keyframe
        # (never the oldest anchor or the latest), "skip" drops the new frame
        self.kf_eviction = str(mp.get("kf_eviction", "redundant"))
        # bound single-dispatch length (see mapper.make_map_fn chunk).
        # Default = the steady per-call iteration count (n_iters // 2, since
        # each keystep runs 2 outer calls of n_iters/2): the 500-iter first
        # keystep then runs as dispatches of the SAME compiled chunk program
        # the steady keysteps use (one XLA compile per run instead of two;
        # trajectory identical). 0 = whole keystep in one dispatch.
        self.max_iters_per_dispatch = int(
            mp.get("max_iters_per_dispatch", max(self.n_iters // 2, 1))
        )
        self._chunk_cache: Dict[Any, Any] = {}

        self.estimate_c2w = np.tile(np.eye(4, dtype=np.float32), (self.n_img, 1, 1))
        self.gt_c2w = np.tile(np.eye(4, dtype=np.float32), (self.n_img, 1, 1))

        # compiled programs (map fns cached per window size)
        track_mesh = None
        if self.dp_devices > 1:
            from dnsjax.parallel.mesh import ray_mesh

            track_mesh = ray_mesh(self.dp_devices)
        self.track_fn = make_track_fn(
            self.spec, self.track_cfg, self.compute_dtype, mesh=track_mesh
        )
        self._map_fns: Dict[Any, Any] = {}
        self.decoder_init_fn = make_decoder_init_fn(
            self.spec, self.map_cfg, compute_dtype=self.compute_dtype
        )
        self.overlap_fn = make_overlap_score_fn(self.map_cfg)
        # module-level jit (static dtype arg) instead of a per-instance
        # lambda closure, so every driver in the process shares one
        # compiled encode program
        dt = self.compute_dtype
        self._encode = lambda p, imgs: _ENCODE_JIT(p, imgs, dt)

        # mapper host state
        self.exist_decoders: Dict[int, int] = {}
        self.first_frame_optimized = False
        self.rng = np.random.default_rng(seed)

        # encoder-feature caches: keyframe images never change, and the
        # current frame is shared by the two outer mapping calls per keystep
        # (frozen encoder; ~26 MB bf16 per keyframe at Replica resolution)
        self._kf_feats: Dict[int, Any] = {}
        self._cur_feats_idx: int = -1
        self._cur_feats = None
        self._cur_sorted = None

        # --- async keystep (reference: two processes on one GPU,
        # dns_slam.py:161-172; TPU-native equivalent of §2.10) -----------
        # async_map defers consuming the keystep's results (pose
        # write-back, loss fetch, tracker param swap) to the NEXT keystep
        # boundary: the tracker keeps rendering against the PREVIOUS
        # keystep's map — exactly the reference tracker's deepcopy-snapshot
        # semantics under loose sync — so the host never blocks on a
        # running keystep, and with tpu.map_device pointing at a second
        # chip the keystep runs concurrently with tracking in hardware.
        # strict sync keeps the reference's lock-step (finish immediately).
        tpu_cfg = cfg.get("tpu", {}) or {}
        self.async_map = bool(
            tpu_cfg.get("async_map", self.sync_method != "strict")
        )
        self.map_device_idx = int(tpu_cfg.get("map_device", 0))
        devs = jax.devices()
        self.map_device = (
            devs[self.map_device_idx]
            if 0 < self.map_device_idx < len(devs)
            else None
        )
        self.track_device = devs[0] if self.map_device is not None else None
        # The composed multi-chip operating point (BASELINE.md round 5):
        # tracker stays on chip 0, the keystep runs shard_map'd over the
        # map_dp chips starting at map_device — each shard samples
        # n_pixels/map_dp rays (fixed TOTAL ray budget, strong scaling of
        # the keystep wall), grads pmean over ICI. TPU-native answer to
        # the reference's two-process split (dns_slam.py:161-172).
        self.map_dp = int(tpu_cfg.get("map_dp", 1))
        self.map_mesh = None
        if self.map_dp > 1:
            if self.dp_devices > 1:
                raise ValueError(
                    "tpu.map_dp (keystep DP over non-tracker chips) and "
                    "tpu.data_parallel (whole-pipeline DP) are mutually "
                    "exclusive — pick one scale-out axis"
                )
            from dnsjax.parallel.mesh import ray_mesh

            self.map_mesh = ray_mesh(self.map_dp, first=self.map_device_idx)
            self.track_device = devs[0]
        # async mesh extraction (VERDICT r4 next #4): at 7.5 Mpts/s the
        # 256^3 grid query alone is ~2.2 s — every mesh_every otherwise
        # stalls the SLAM loop by more than two keysteps. With a spare
        # device (tpu.map_device / map_dp), run save_mesh in a background
        # thread against snapshot state: extraction is READ-only on the
        # map (same snapshot semantics as async keysteps), the query runs
        # on the map device(s), and the native marching call releases the
        # GIL (ctypes). Reference analog: meshing blocks the mapper
        # process but not the tracker (mapping.py:1092-1107).
        self.mesh_async = bool(tpu_cfg.get("mesh_async", False))
        self._mesh_thread = None
        self._mesh_errors: List[str] = []
        self._pending_map = None
        self._track_params = self.params  # tracker's snapshot of the map

        # tracker reference view state
        self._refer_color: Optional[jnp.ndarray] = None
        self._refer_w2c: Optional[jnp.ndarray] = None
        self._pre_color: Optional[jnp.ndarray] = None

        self.track_times: List[float] = []
        self.map_times: List[float] = []

        # semantic class -> display color (reference: dns_slam.py:70-89 uses
        # a fixed random palette per run)
        self.class_colors = np.random.default_rng(7).integers(
            0, 256, size=(max(self.n_class, 1), 3)
        ).astype(np.uint8)

        self.mesher = None
        if self.mesh_every > 0 and "meshing" in cfg:
            from dnsjax.mesh import Mesher

            device_mesh = None
            if self.map_mesh is not None:
                # composed mode: shard mesh queries over the map chips too
                device_mesh = self.map_mesh
            elif self.dp_devices > 1:
                from dnsjax.parallel.mesh import ray_mesh

                device_mesh = ray_mesh(self.dp_devices)
            self.mesher = Mesher(
                cfg,
                dict(H=ds.H, W=ds.W, fx=ds.fx, fy=ds.fy, cx=ds.cx, cy=ds.cy),
                self.bound,
                self.spec,
                self.compute_dtype,
                device_mesh=device_mesh,
            )

    # ------------------------------------------------------------------
    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def _chunk_for(self, n_iters: int) -> int:
        """Dispatch-chunk size for a keystep of ``n_iters`` (0 = unchunked).

        Returns the largest divisor of n_iters that fits
        max_iters_per_dispatch; when n_iters already fits, returns n_iters
        itself so the call still routes through the shared chunk program
        (single dispatch) instead of compiling a separate whole-keystep
        program. Warns if divisor structure forces a pathologically small
        chunk (e.g. prime n_iters), which would cost one XLA dispatch per
        optimization iteration."""
        m = self.max_iters_per_dispatch
        if m <= 0:
            return 0
        if n_iters <= m:
            return n_iters
        best = 1
        for c in range(m, 0, -1):
            if n_iters % c == 0:
                best = c
                break
        if best < max(m // 4, 1):
            print(
                f"WARNING: n_iters={n_iters} has no divisor near "
                f"max_iters_per_dispatch={m}; using chunk={best} "
                f"(one device dispatch per {best} iters — pick an n_iters "
                f"with a divisor close to the dispatch bound)"
            )
        return best

    def _map_fn(self, n_target: int, n_iters: int):
        k = (n_target, n_iters)
        if k not in self._map_fns:
            if self.map_mesh is not None:
                import dataclasses

                from dnsjax.parallel.mesh import make_map_fn_dp

                # strong scaling: fixed total ray budget, n_pixels/map_dp
                # per shard (vs tpu.data_parallel's weak scaling where
                # every device samples the full n_pixels)
                cfg_dp = dataclasses.replace(
                    self.map_cfg,
                    n_pixels=max(1, self.map_cfg.n_pixels // self.map_dp),
                )
                self._map_fns[k] = make_map_fn_dp(
                    self.spec, cfg_dp, n_target, n_iters,
                    self.map_mesh, self.compute_dtype,
                )
            elif self.dp_devices > 1:
                from dnsjax.parallel.mesh import make_map_fn_dp, ray_mesh

                self._map_fns[k] = make_map_fn_dp(
                    self.spec, self.map_cfg, n_target, n_iters,
                    ray_mesh(self.dp_devices), self.compute_dtype,
                )
            else:
                self._map_fns[k] = make_map_fn(
                    self.spec, self.map_cfg, n_target, n_iters,
                    self.compute_dtype, chunk=self._chunk_for(n_iters),
                    _chunk_cache=self._chunk_cache,
                )
        return self._map_fns[k]

    def _frame_to_device(self, frame: Dict[str, np.ndarray]):
        return {
            "index": frame["index"],
            "color": jnp.asarray(frame["color"]),
            "depth": jnp.asarray(frame["depth"]),
            "label": jnp.asarray(frame["label"]),
            # host copy kept alongside: the keystep needs labels on HOST for
            # class_sorted_pixels / np.unique, and fetching the device array
            # back costs a full-buffer transfer through the remote tunnel
            "label_np": np.asarray(frame["label"]),
            "c2w_np": np.asarray(frame["c2w"]),
            "c2w": jnp.asarray(frame["c2w"]),
        }

    # ------------------------------------------------------------------
    def _evict_keyframe(self) -> None:
        """Evict the most pose-redundant keyframe to make room (dnsjax
        extension; the reference's keyframe list grows without bound,
        mapping.py:1082-1089). Candidates are slots 1..K-2: slot 0 is the
        bootstrap anchor (always a valid refer view) and slot K-1 the latest
        keyframe (always a window target). Redundancy = distance of the
        camera center to its nearest temporal neighbor — evicting the
        argmin removes the least new viewpoint coverage."""
        K = self.keyframes.count
        if K < 3:
            return
        centers = np.asarray(self.keyframes.est_c2w[:K, :3, 3])
        d_prev = np.linalg.norm(centers[1:] - centers[:-1], axis=-1)  # (K-1,)
        # slot i in 1..K-2: min(dist to i-1, dist to i+1)
        redun = np.minimum(d_prev[:-1], d_prev[1:])  # (K-2,) for slots 1..K-2
        victim = 1 + int(np.argmin(redun))
        self.keyframes.evict(victim)
        # shift the encoder-feature cache keys above the vacated slot
        feats = {}
        for slot, f in self._kf_feats.items():
            if slot == victim:
                continue
            feats[slot - 1 if slot > victim else slot] = f
        self._kf_feats = feats
        if self.verbose:
            print(f"evicted keyframe slot {victim} (store at capacity)")

    # ------------------------------------------------------------------
    def _kf_feat(self, slot: int):
        """Encoder feature map for keyframe ``slot``, cached per slot.
        Keyframe images are immutable after insertion (eviction re-keys the
        cache), so entries never go stale."""
        if slot not in self._kf_feats:
            self._kf_feats[slot] = self._encode(
                self.enc_params, self.keyframes.colors[slot][None]
            )[0]
        return self._kf_feats[slot]

    def collect_kf_feats(self):
        """Stacked (capacity, h, w, C) encoder features for the whole
        keyframe store, served from the per-slot cache. Mesh extraction
        previously re-encoded ALL keyframe images on every ``mesh_every``
        call even though the driver already held most maps (VERDICT r3
        weak #6); slots beyond ``count`` are zero-filled — the mesher
        gates every per-view contribution on its keyframe-valid mask."""
        kf = self.keyframes
        if kf.count == 0:
            return None
        # Cold cache (fresh driver / --resume): batch the missing encodes
        # in fixed-size groups instead of one batch-1 dispatch per slot
        # (fixed group shape => one extra compile total, not one per count)
        missing = [s for s in range(kf.count) if s not in self._kf_feats]
        if len(missing) > 2:
            B = 8
            for i in range(0, len(missing), B):
                grp = missing[i:i + B]
                cols = jnp.stack([kf.colors[s] for s in grp])
                if len(grp) < B:
                    pad = jnp.zeros((B - len(grp),) + cols.shape[1:],
                                    cols.dtype)
                    cols = jnp.concatenate([cols, pad])
                feats = self._encode(self.enc_params, cols)
                for j, s in enumerate(grp):
                    self._kf_feats[s] = feats[j]
        rows = [self._kf_feat(s) for s in range(kf.count)]
        if kf.count < kf.capacity:
            rows += [jnp.zeros_like(rows[0])] * (kf.capacity - kf.count)
        return jnp.stack(rows)

    # ------------------------------------------------------------------
    # async mesh extraction (tpu.mesh_async)
    def _join_mesh(self) -> None:
        """Wait for an in-flight background extraction (at most one)."""
        t = self._mesh_thread
        if t is not None:
            t.join()
            self._mesh_thread = None
            if self._mesh_errors:
                print(f"WARNING: async mesh extraction failed: "
                      f"{self._mesh_errors[-1]}")

    def _mesh_snapshot(self, idx: int):
        """Driver-shaped snapshot for a background save_mesh: jnp arrays
        are immutable, so capturing the refs IS a consistent snapshot
        (the keystep/tracker replace, never mutate, them). Inputs are
        staged onto the map device so the query does not contend with
        tracking on chip 0 (under map_dp the mesher's sharded query
        handles placement itself)."""
        from types import SimpleNamespace

        kf = self.keyframes
        feats = self.collect_kf_feats()  # main thread: mutates the cache
        params = self.params
        colors, depths, labels = kf.colors, kf.depths, kf.labels
        est_kf = kf.est_c2w
        if self.map_device is not None and self.map_mesh is None:
            params, colors, depths, labels, est_kf, feats = jax.device_put(
                (params, colors, depths, labels, est_kf, feats),
                self.map_device,
            )
        kf_snap = SimpleNamespace(
            capacity=kf.capacity, count=kf.count, H=kf.H, W=kf.W,
            colors=colors, depths=depths, labels=labels,
            est_c2w=est_kf, gt_c2w=kf.gt_c2w,
            frame_ids=list(kf.frame_ids),
        )
        return SimpleNamespace(
            params=params, enc_params=self.enc_params, keyframes=kf_snap,
            class_colors=getattr(self, "class_colors", None),
            estimate_c2w=self.estimate_c2w[: idx + 1].copy(),
            out_dir=self.out_dir,
            collect_kf_feats=lambda: feats,
        )

    def _save_mesh(self, idx: int) -> None:
        """Extract + export, on a spare device's background thread when
        tpu.mesh_async is on (read-only on SLAM state: the trajectory is
        identical either way — asserted in tests/test_multichip.py)."""
        if self.mesh_async and (
            self.map_device is not None or self.map_mesh is not None
        ):
            self._join_mesh()
            snap = self._mesh_snapshot(idx)

            def work():
                try:
                    self.mesher.save_mesh(snap, idx)
                except Exception as e:  # noqa: BLE001
                    self._mesh_errors.append(repr(e))

            import threading

            self._mesh_thread = threading.Thread(target=work, daemon=True)
            self._mesh_thread.start()
        else:
            self.mesher.save_mesh(self, idx)

    # ------------------------------------------------------------------
    # window selection (host logic; reference: mapping.py:329-436)
    def _select_targets(self, mode: str, cur, cur_c2w) -> List[int]:
        K = self.keyframes.count
        num = min(self.n_joint - 2, K)
        if K < 2:
            picked: List[int] = []
        elif mode == "global":
            picked = list(self.rng.choice(K - 1, size=num, replace=True))
        else:  # overlap
            scores = np.asarray(
                self.overlap_fn(
                    cur["depth"],
                    jnp.asarray(cur_c2w),
                    self.keyframes.est_c2w,
                    jnp.arange(self.keyframes.capacity) < max(K - 1, 0),
                    self._next_key(),
                )
            )[: max(K - 1, 0)]
            order = np.argsort(-scores)
            cand = [int(i) for i in order if scores[i] > 0.05]
            picked = list(self.rng.permutation(cand)[:num])
        if K > 1:
            # dedup, always include the latest keyframe, and drop keyframe 0
            # — the reference does exactly this (mapping.py:367-370:
            # ``target_frame_idx = [x for x in target_frame_idx if x != 0]``);
            # separately, the OLDEST frame of the assembled window is
            # pose-frozen via pose_train (reference: mapping.py:455-459)
            picked = sorted({int(x) for x in picked + [K - 1]} - {0})
        return picked  # current frame appended by caller as -1

    def _refer_slots(self, target_id: int, K: int) -> List[int]:
        """Two keyframe reference views per target (reference:
        mapping.py:400-411); the target itself is the third."""
        if target_id == -1:
            first, second = max(K - 2, 0), max(K - 1, 0)
        elif target_id == K - 1:
            first, second = max(K - 3, 0), max(K - 2, 0)
        else:
            first, second = max(target_id - 1, 0), target_id + 1
        return [first, second]

    def _build_window(self, targets: List[int], cur, cur_c2w):
        """Gather device tensors for one mapping window.

        The window is PADDED to a fixed ``n_joint_optimize_frames`` slots so
        exactly one keystep program compiles per n_iters value (window size
        otherwise varies with keyframe count and each size costs a 30-70 s
        XLA compile). Padding slots duplicate real frames ROUND-ROBIN and
        render through the real slot's live pose (``pose_src``), so an
        underfull window simply gives each real frame a larger share of the
        fixed ray budget — approximating the reference's even n_pixels split
        over its variable-size window (mapping.py:497) — and pose gradients
        flow to the one real variable. Layout: [oldest, <pads>, rest..., cur].
        """
        kf = self.keyframes
        K = kf.count
        real_slots = targets + [-1]
        n_real = len(real_slots)
        n_pad = max(self.n_joint - n_real, 0)
        # round-robin from the NEWEST real frame down (the current frame is
        # the one tracking renders against next; give it the spare budget)
        pad_srcs = [n_real - 1 - (k % n_real) for k in range(n_pad)]
        slots = real_slots[:1] + [real_slots[s] for s in pad_srcs] + real_slots[1:]
        valid = [True] + [False] * n_pad + [True] * (n_real - 1)
        # window position of real slot j: 0 for the oldest, else after pads
        real_pos = [0] + [1 + n_pad + (j - 1) for j in range(1, n_real)]
        pose_src = (
            [0] + [real_pos[s] for s in pad_srcs] + real_pos[1:]
        )
        T = len(slots)

        def gather(arr, cur_val):
            return jnp.stack(
                [cur_val if s == -1 else arr[s] for s in slots], 0
            )

        colors = gather(kf.colors, cur["color"])
        depths = gather(kf.depths, cur["depth"])
        labels = gather(kf.labels, cur["label"])

        if self._cur_feats_idx == int(cur["index"]):
            cur_sorted, cur_off = self._cur_sorted
        else:
            cur_sorted, cur_off = class_sorted_pixels(
                cur["label_np"] if "label_np" in cur
                else np.asarray(cur["label"]), self.n_class
            )
            self._cur_sorted = (cur_sorted, cur_off)
        sorted_idx = gather(kf.sorted_idx, jnp.asarray(cur_sorted))
        offsets = gather(kf.class_offsets, jnp.asarray(cur_off))

        est = gather(kf.est_c2w, jnp.asarray(cur_c2w))
        gt = gather(kf.gt_c2w, jnp.asarray(cur["c2w"]))

        # window position of each real target keyframe (for live refer poses)
        pos_of_target = {}
        for i, (sid, v) in enumerate(zip(slots, valid)):
            if v and sid != -1 and sid not in pos_of_target:
                pos_of_target[sid] = i

        # reference views per target: 2 keyframes + self
        refer_src = np.full((T, 3), -1, np.int32)
        refer_slots = np.zeros((T, 3), np.int32)
        for i, sid in enumerate(slots):
            r = self._refer_slots(sid, K)
            for s, rid in enumerate(r):
                refer_slots[i, s] = rid
                if rid in pos_of_target:
                    refer_src[i, s] = pos_of_target[rid]
            refer_slots[i, 2] = 0  # unused when src >= 0
            refer_src[i, 2] = i  # self
        refer_fixed_c2w = kf.est_c2w[jnp.asarray(refer_slots.reshape(-1))].reshape(
            T, 3, 4, 4
        )

        # assemble reference-view encoder features from caches
        kf_feats = self._kf_feat

        if self._cur_feats_idx != int(cur["index"]):
            self._cur_feats = self._encode(self.enc_params, cur["color"][None])[0]
            self._cur_feats_idx = int(cur["index"])
        per_target = []
        for i, sid in enumerate(slots):
            self_feats = self._cur_feats if sid == -1 else kf_feats(sid)
            per_target.append(
                jnp.stack(
                    [kf_feats(int(refer_slots[i, 0])),
                     kf_feats(int(refer_slots[i, 1])),
                     self_feats]
                )
            )
        refer_feats = jnp.stack(per_target)

        pose_train = np.asarray(valid, np.float32)
        if n_real > 1:
            pose_train[0] = 0.0  # oldest real frame frozen
        if not self.is_ba:
            pose_train[:] = 0.0

        window = {
            "colors": colors,
            "depths": depths,
            "labels": labels,
            "sorted_idx": sorted_idx,
            "offsets": offsets,
            "refer_feats": refer_feats,
            "refer_fixed_c2w": refer_fixed_c2w,
            "refer_src": jnp.asarray(refer_src),
            "pose_train": jnp.asarray(pose_train),
            "pose_src": jnp.asarray(pose_src, jnp.int32),
            "bound": self.bound_j,
            "lt_gate_iter": jnp.asarray(-1, jnp.int32),
        }
        tensors = tensor_from_camera(est)  # (T,7)
        return window, tensors[:, :4], tensors[:, 4:], est, gt, slots, valid

    # ------------------------------------------------------------------
    def _set_decoder_counts(self, label_dict: List[int], cur_idx: int) -> List[int]:
        """Track per-class decoder usage; returns the 'new decoder' list that
        gates the lambda_lt schedule and warm-up (reference: mapping.py:727-761)."""
        new_list = []
        for c in label_dict:
            self.exist_decoders[c] = self.exist_decoders.get(c, 0) + 1
            if self.exist_decoders[c] <= 4:
                new_list.append(c)
        if self.exist_decoders:
            min_c = min(self.exist_decoders, key=self.exist_decoders.get)
            if min_c not in new_list and self.exist_decoders[min_c] < 10:
                self.exist_decoders[min_c] += 1
                new_list.append(min_c)
        return new_list

    def _to_map_device(self, tree):
        """Stage keystep inputs onto the mapping device — replicated over
        the map mesh under tpu.map_dp (no-op single-dev)."""
        if self.map_mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            return jax.device_put(tree, NamedSharding(self.map_mesh, P()))
        if self.map_device is None:
            return tree
        return jax.device_put(tree, self.map_device)

    def _from_map_device(self, tree):
        """Return keystep outputs to the tracking device (async transfer;
        no-op single-dev)."""
        if self.map_mesh is not None:
            return jax.device_put(tree, self.track_device)
        if self.map_device is None:
            return tree
        return jax.device_put(tree, self.track_device)

    def _finish_map(self) -> None:
        """Consume the pending keystep: host pose write-back, loss fetch +
        logging, and the tracker's param-snapshot swap. This is the single
        synchronization point with the mapper (reference: the tracker's
        update_para_from_mapping deepcopy, tracking.py:76-83)."""
        p = self._pending_map
        if p is None:
            return
        self._pending_map = None
        t0 = time.perf_counter()
        idx, aux = p["idx"], p["aux"]
        if p["is_ba"]:
            self.estimate_c2w[idx] = np.asarray(p["cur_c2w"])
            # the frame may have been keyframed while the keystep ran;
            # its store pose predates the BA result — patch it
            if idx in self.keyframes.frame_ids:
                slot = self.keyframes.frame_ids.index(idx)
                self.keyframes.update_pose(slot, p["cur_c2w"])
        self._track_params = self.params
        t_block = time.perf_counter() - t0
        self.map_times.append(p["t_dispatch"] + t_block)
        # ONE packed fetch for the logged scalars (tunnel roundtrips).
        # NOTE: dict.get would build (and dispatch) the fallback stack even
        # when "packed" exists — guard explicitly.
        pk = np.asarray(
            aux["packed"] if "packed" in aux
            else jnp.stack([aux["p_loss"], aux["d_loss"],
                            aux["l_loss"], aux["lt_loss"]]),
            np.float64,
        )
        p_loss, d_loss, l_loss, lt_loss = (float(v) for v in pk[:4])
        if self.verbose:
            psnr = -10.0 * np.log10(max(p_loss, 1e-12))
            line = (
                f"Frame {idx} BACK: rgb {p_loss:.4f} "
                f"psnr {psnr:.2f} "
                f"d {d_loss:.4f} l {l_loss:.4f} "
                f"lt {lt_loss:.4f} "
                f"{p['t_dispatch']:.1f}+{t_block:.1f}s"
            )
            print(line)
            with open(
                os.path.join(self.out_dir, "output_back_fine.txt"), "a"
            ) as f:
                f.write(line + "\n")
        self._log_metric(
            event="map", frame=idx,
            p_loss=p_loss, d_loss=d_loss,
            l_loss=l_loss, lt_loss=lt_loss,
            seconds=self.map_times[-1], dispatch_seconds=p["t_dispatch"],
            n_keyframes=self.keyframes.count,
        )

    def _keystep(self, idx: int, cur) -> None:
        """Dispatch one full mapping keystep (2 outer calls, reference
        mapping.py:1020-1038) without blocking; record it as pending."""
        t0 = time.perf_counter()
        outer = 2
        iters = self.n_iters // outer
        aux = cur_c2w = None
        for o in range(outer):
            mode = "overlap" if o % 2 == 0 else "global"
            aux, cur_c2w = self.map_once(
                idx, cur, iters, mode, False, cur_c2w_dev=cur_c2w
            )
        self._pending_map = {
            "idx": idx,
            "aux": aux,
            "cur_c2w": cur_c2w,
            "is_ba": self.is_ba,
            "t_dispatch": time.perf_counter() - t0,
        }
        if not self.async_map:
            self._finish_map()

    def map_once(self, idx: int, cur, n_iters: int, mode: str, is_first: bool,
                 cur_c2w_dev=None):
        """Dispatch one mapping call; pose write-back stays ON DEVICE (no
        host fetch) so consecutive outer calls and the tracker can proceed
        without blocking on the keystep. Returns (aux, c2w_new_dev) device
        futures; the host-side estimate_c2w write happens in _finish_map."""
        cur_c2w = self.estimate_c2w[idx] if cur_c2w_dev is None else cur_c2w_dev
        self.is_ba = idx >= self.start_optimize_idx
        targets = [] if is_first else self._select_targets(mode, cur, cur_c2w)
        window, quads0, Ts0, est, gt, slots, valid = self._build_window(
            targets, cur, cur_c2w
        )

        # per-window class bookkeeping + new-decoder schedule
        offs = np.asarray(window["offsets"])
        present = np.nonzero((offs[:, 1:] - offs[:, :-1]).sum(0) > 0)[0].tolist()
        new_decoders = self._set_decoder_counts(present, idx)

        if self.first_frame_optimized and new_decoders and idx > 50:
            cur_classes = set(
                np.unique(cur["label_np"] if "label_np" in cur
                          else np.asarray(cur["label"])).tolist()
            )
            warm = [c for c in new_decoders if c in cur_classes]
            if warm:
                mask = np.zeros(self.n_class, bool)
                mask[warm] = True
                frame = {
                    "color": cur["color"],
                    "depth": cur["depth"],
                    "label": cur["label"],
                    "c2w": jnp.asarray(cur_c2w),
                    "bound": self.bound_j,
                    "sorted_idx": window["sorted_idx"][-1],
                    "offsets": window["offsets"][-1],
                    "feats": self._encode(
                        self.enc_params, cur["color"][None]
                    ),
                }
                self.params, _ = self.decoder_init_fn(
                    self.params, frame, jnp.asarray(mask), self._next_key()
                )

        if new_decoders:
            window["lt_gate_iter"] = jnp.asarray(n_iters // 2, jnp.int32)

        map_fn = self._map_fn(len(slots), n_iters)
        params_in, quads0, Ts0, window = self._to_map_device(
            (self.params, quads0, Ts0, window)
        )
        params_out, quads, Ts, aux = map_fn(
            params_in, quads0, Ts0, window, self._next_key()
        )
        self.params = self._from_map_device(params_out)

        # BA write-back (reference: mapping.py:916-940); skip padding slots.
        # All device-side: kf poses get future rows, estimate_c2w (host)
        # is written later in _finish_map.
        c2w_new = self._from_map_device(
            camera_from_tensor(jnp.concatenate([quads, Ts], -1))
        )
        if self.is_ba:
            n_real = len(targets) + 1
            for i, (sid, v) in enumerate(zip(slots[:-1], valid[:-1])):
                if not v:
                    continue
                if i == 0 and n_real > 1:
                    continue  # frozen oldest
                self.keyframes.update_pose(sid, c2w_new[i])
        return aux, c2w_new[-1]

    # ------------------------------------------------------------------
    def frame_vis(self, idx: int, cur) -> None:
        """Render the full current frame and save a 3x3 residual panel
        (reference: mapping.py:638-724 + utils/common.py:682-745)."""
        from dnsjax.render.full import make_full_renderer
        from dnsjax.viz.panels import residual_panel

        if not hasattr(self, "_full_renderer"):
            ds = self.dataset
            vis_mesh = None
            if self.dp_devices > 1:
                from dnsjax.parallel.mesh import ray_mesh

                vis_mesh = ray_mesh(self.dp_devices)
            self._full_renderer = make_full_renderer(
                self.spec,
                dict(H=ds.H, W=ds.W, fx=ds.fx, fy=ds.fy, cx=ds.cx, cy=ds.cy),
                self.map_cfg.n_samples, self.map_cfg.n_surface,
                compute_dtype=self.compute_dtype,
                mesh=vis_mesh,
            )
        K = self.keyframes.count
        cur_c2w = jnp.asarray(self.estimate_c2w[idx])
        refs = [max(K - 2, 0), max(K - 1, 0)]
        refer_c2w = jnp.stack(
            [self.keyframes.est_c2w[refs[0]], self.keyframes.est_c2w[refs[1]], cur_c2w]
        )
        refer_colors = jnp.stack(
            [self.keyframes.colors[refs[0]], self.keyframes.colors[refs[1]], cur["color"]]
        )
        feats = self._encode(self.enc_params, refer_colors)
        from dnsjax.geometry.se3 import invert_se3

        color, depth, logits = self._full_renderer(
            self.params, cur_c2w, cur["depth"], cur["label"],
            invert_se3(refer_c2w), feats, self.bound_j, self._next_key(),
        )
        pred_label = np.asarray(jnp.argmax(logits, -1))
        residual_panel(
            idx, self.out_dir,
            np.asarray(cur["color"]), np.asarray(color),
            np.asarray(cur["depth"]), np.asarray(depth),
            np.asarray(cur["label"]), pred_label,
            max_label=max(self.n_class, 2),
        )

    # ------------------------------------------------------------------
    def track_frame(self, idx: int, cur) -> np.ndarray:
        t0 = time.perf_counter()
        if self._refer_color is None or (
            self.fix_refer_bug
            and (idx - 1) % self.optimize_every == 0
        ):
            self._refer_color = self._pre_color
            self._refer_w2c = jnp.asarray(
                np.linalg.inv(self.estimate_c2w[idx - 1]).astype(np.float32)
            )

        feats = self._encode(
            self.enc_params, jnp.stack([self._refer_color, cur["color"]], 0)
        )
        est0 = pose_init_const_velocity(self.estimate_c2w, idx, self.const_speed)
        # host-side quat conversion + ONE packed fetch per track call: through
        # the remote tunnel every tiny device dispatch/fetch is a roundtrip
        t7 = tensor_from_camera_np(est0).astype(np.float32)
        _, _, metrics = self.track_fn(
            self._track_params, feats, self._refer_w2c,
            cur["color"], cur["depth"], cur["label"],
            jnp.asarray(t7[:4]), jnp.asarray(t7[4:]),
            self.bound_j, self._next_key(),
        )
        pk = np.asarray(metrics["packed"], np.float64)  # [quad, T, bl, p, d]
        best_loss = float(pk[7])
        retried = False
        hist = self._track_loss_hist
        if (
            self.track_retry_factor > 0
            and len(hist) >= 5
            and best_loss > self.track_retry_factor * float(np.median(hist[-20:]))
        ):
            # loss outlier: the const-velocity init likely put the optimizer
            # in a bad basin. Re-track from the raw previous pose with fresh
            # ray sampling; keep whichever candidate scored lower.
            t7r = tensor_from_camera_np(self.estimate_c2w[idx - 1]).astype(
                np.float32
            )
            _, _, metrics_r = self.track_fn(
                self._track_params, feats, self._refer_w2c,
                cur["color"], cur["depth"], cur["label"],
                jnp.asarray(t7r[:4]), jnp.asarray(t7r[4:]),
                self.bound_j, self._next_key(),
            )
            pk_r = np.asarray(metrics_r["packed"], np.float64)
            retried = True
            if float(pk_r[7]) < best_loss:
                pk, best_loss = pk_r, float(pk_r[7])
        hist.append(best_loss)
        p_loss, d_loss = float(pk[8]), float(pk[9])
        c2w = camera_from_tensor_np(pk[:7]).astype(np.float32)
        self.estimate_c2w[idx] = c2w
        dt = time.perf_counter() - t0
        self.track_times.append(dt)
        if self.verbose:
            gt7 = tensor_from_camera_np(
                cur["c2w_np"] if "c2w_np" in cur
                else np.asarray(cur["c2w"])
            )
            err = float(np.abs(gt7 - pk[:7]).mean())
            psnr = -10.0 * np.log10(max(p_loss, 1e-12))
            line = (
                f"Frame {idx} FRONT: rgb {p_loss:.4f} psnr "
                f"{psnr:.2f} "
                f"d {d_loss:.4f} ATE~{err:.6f} {dt:.2f}s"
            )
            print(line)
            with open(os.path.join(self.out_dir, "output_front.txt"), "a") as f:
                f.write(line + "\n")
        self._log_metric(
            event="track", frame=idx, p_loss=p_loss,
            d_loss=d_loss, best_loss=best_loss,
            retried=retried, seconds=dt,
            # streamed poses let `cli/visualizer.py --live` follow the run
            # (reference: utils/viz.py live open3d monitor)
            c2w=np.round(c2w[:3, :4], 6).reshape(-1).tolist(),
            gt_c2w=np.round(self.gt_c2w[idx][:3, :4], 6).reshape(-1).tolist(),
        )
        return c2w

    # ------------------------------------------------------------------
    def _should_map(self, idx: int, last_mapped: int, n: int) -> bool:
        """Interleave policy (reference ``sync_method``, tracking.py:259-269 +
        mapping.py:996-1003): strict maps every optimize_every-th frame;
        loose maps about twice as often; free maps after every frame. The
        last frame always maps."""
        if idx == n - 1:
            return True
        if self.sync_method == "strict":
            return idx % self.optimize_every == 0 and idx > last_mapped
        if self.sync_method == "loose":
            return idx >= last_mapped + max(self.optimize_every // 2, 1)
        return True  # free

    def _log_metric(self, **kw) -> None:
        """Append one JSON line to metrics.jsonl (structured observability;
        the reference only has free-text logs, SURVEY.md §5)."""
        import json

        kw["t"] = time.time()
        with open(os.path.join(self.out_dir, "metrics.jsonl"), "a") as f:
            f.write(json.dumps(kw) + "\n")

    def resume(self, path: str) -> int:
        """Restore a checkpoint saved by save_checkpoint; returns the next
        frame index to process. (The reference defines Checkpoint.load but
        never wires it into the live loop — dns_slam.py:155-158.)"""
        from dnsjax.models.checkpoint import load_checkpoint, restore_params

        ckpt = load_checkpoint(path)
        self.params = restore_params(self.params, ckpt)
        self._track_params = self.params
        self.enc_params = restore_params(self.enc_params, ckpt, "enc")
        self.estimate_c2w[:] = ckpt["estimate_c2w"][: self.n_img]
        self.gt_c2w[:] = ckpt["gt_c2w"][: self.n_img]
        meta = ckpt["meta"]
        self.exist_decoders = {int(k): v for k, v in meta["exist_decoders"].items()}
        if "kf/colors" in ckpt:
            for k in range(ckpt["kf/colors"].shape[0]):
                self.keyframes.add(
                    {
                        "color": ckpt["kf/colors"][k],
                        "depth": ckpt["kf/depths"][k],
                        "label": ckpt["kf/labels"][k],
                        "c2w": ckpt["kf/gt_c2w"][k],
                        "index": meta["kf_frame_ids"][k],
                    },
                    ckpt["kf/est_c2w"][k],
                )
        self.first_frame_optimized = True
        return int(meta["idx"]) + 1

    def run(self, end_frame: Optional[int] = None, start_frame: int = 0):
        """The strict-sync schedule (reference behaviors at tracking.py:259-269
        + mapping.py:988-1016): frames 0-1 use GT poses; mapping runs on
        frame 0 (bootstrap) and every optimize_every-th frame + the last."""
        n = self.n_img if end_frame is None else min(end_frame, self.n_img)

        if start_frame == 0:
            f0 = self._frame_to_device(self.dataset[0])
            self.gt_c2w[0] = np.asarray(f0["c2w"])
            self.estimate_c2w[0] = self.gt_c2w[0]
            # pass device arrays straight through: keyframes.add writes them
            # into device-resident stores, so a host round trip here would be
            # a pure waste of tunnel bandwidth
            self.keyframes.add(
                {k: v for k, v in f0.items() if k != "index"} | {"index": 0},
                self.gt_c2w[0],
            )
            if n > 1:
                f1 = self.dataset[1]
                self.gt_c2w[1] = f1["c2w"]
                self.estimate_c2w[1] = f1["c2w"]

            # bootstrap mapping on frame 0
            t0 = time.perf_counter()
            aux0, _ = self.map_once(
                0, f0, self.n_iters_first, "overlap", is_first=True
            )
            float(aux0["p_loss"])  # sync: honest init timing, warm tracker
            self._track_params = self.params
            self.map_times.append(time.perf_counter() - t0)
            self.first_frame_optimized = True
            self._pre_color = f0["color"]
            if self.verbose:
                print(f"BACK: init mapping done in {self.map_times[-1]:.1f}s")
            self._log_metric(event="init_map", seconds=self.map_times[-1])
            start = 1
        else:
            # resumed: previous frame's image seeds the tracker reference
            start = start_frame
            prev = self._frame_to_device(self.dataset[start - 1])
            self._pre_color = prev["color"]

        last_mapped = start - 1
        for idx in range(start, n):
            cur = self._frame_to_device(self.dataset[idx])
            # host copy, NOT np.asarray(cur["c2w"]): the pose never left the
            # host, and a device fetch is a full tunnel roundtrip per frame
            self.gt_c2w[idx] = cur["c2w_np"]

            if idx <= 1 or self.use_gt_camera:
                self.estimate_c2w[idx] = cur["c2w_np"]
                if self._refer_color is None:
                    self._refer_w2c = jnp.asarray(
                        np.linalg.inv(self.estimate_c2w[idx]).astype(np.float32)
                    )
                    self._refer_color = cur["color"]
            else:
                self.track_frame(idx, cur)

            # mapping keystep, per sync policy
            if self._should_map(idx, last_mapped, n):
                # consume the previous keystep first (its BA poses and the
                # tracker's param snapshot), then dispatch the new one;
                # with async_map the new keystep runs while the next
                # optimize_every frames track against the old map
                self._finish_map()
                self._keystep(idx, cur)
                last_mapped = idx
                if idx == n - 1:
                    self._finish_map()

                # reference runs frame_vis unconditionally on the schedule
                # (mapping.py:1075-1079); vis_every=0 disables
                if self.vis_every > 0 and (idx % self.vis_every == 0 or idx <= 1):
                    self._finish_map()
                    self.frame_vis(idx, cur)

                # keyframe insertion (reference: mapping.py:1082-1089)
                if (
                    idx % self.keyframe_every == 0 or idx == n - 2
                ) and idx not in self.keyframes.frame_ids:
                    if self.keyframes.count >= self.keyframes.capacity:
                        if self.kf_eviction == "skip":
                            print(
                                f"WARNING: keyframe store full "
                                f"({self.keyframes.capacity}); frame {idx} not "
                                f"keyframed — raise mapping.max_keyframes"
                            )
                        else:
                            self._evict_keyframe()
                    if self.keyframes.count < self.keyframes.capacity:
                        self.keyframes.add(
                            {k: v for k, v in cur.items() if k != "index"}
                            | {"index": idx},
                            self.estimate_c2w[idx],
                        )

                if (
                    self.mesh_every > 0
                    and idx % self.mesh_every == 0
                    and self.mesher is not None
                ):
                    self._finish_map()
                    self._save_mesh(idx)

                if (
                    self.checkpoint_every > 0
                    and idx % self.checkpoint_every == 0
                    and idx > 1
                ):
                    self._finish_map()
                    self.save_checkpoint(f"model_{idx}.npz", idx)

            self._pre_color = cur["color"]

        self._finish_map()
        self._join_mesh()
        self.save_checkpoint("model.npz", n - 1)
        if self.verbose:
            print(f"Decoder params: {decoder_param_count(self.params)}")
            print(
                f"track avg {np.mean(self.track_times) if self.track_times else 0:.3f}s "
                f"map avg {np.mean(self.map_times):.2f}s"
            )
        return self.estimate_c2w[:n], self.gt_c2w[:n]

    # ------------------------------------------------------------------
    def save_checkpoint(self, name: str, idx: int):
        from dnsjax.models.checkpoint import save_checkpoint

        save_checkpoint(
            os.path.join(self.out_dir, name),
            params=self.params,
            enc_params=self.enc_params,
            estimate_c2w=self.estimate_c2w,
            gt_c2w=self.gt_c2w,
            keyframes=self.keyframes,
            idx=idx,
            scene=self.scene,
            exist_decoders=self.exist_decoders,
        )
