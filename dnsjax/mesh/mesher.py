"""Mesh extraction: sharded field query + marching tetrahedra + cleanup.

Counterpart of the reference ``Mesher`` (reference: slams/meshing.py). A
uniform grid over the marching-cubes bound (+0.05 pad, meshing.py:535-559) is
evaluated in large fused device chunks; per-point 2D features/labels are
aggregated by scanning over ALL keyframes on device (project -> bilinear
feature gather -> per-view merge -> mean over observing views, last-seen
label — meshing.py:294-377). Out-of-bound points get occupancy -100 and
label -1 (meshing.py:461-532). The isosurface is extracted with marching
tetrahedra, optionally cleaned by visibility (drop faces with never-seen
vertices) and small-component removal, then vertices are re-queried for
color/label and exported as PLY (mesh_{idx}.ply / _semantic.ply / parts).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from dnsjax.geometry.rays import project_points, world_to_camera
from dnsjax.geometry.se3 import invert_se3
from dnsjax.mesh.export import write_ply
from dnsjax.mesh.marching import marching_tetrahedra
from dnsjax.models.decoder import (
    DecoderSpec,
    merge_apply,
    out_apply,
    pos_encode,
    fine_apply,
)
from dnsjax.models.features import _row_gather, bilinear_sample, nearest_sample


class Mesher:
    def __init__(
        self,
        cfg: Dict[str, Any],
        cam: Dict[str, Any],
        bound: np.ndarray,
        spec: DecoderSpec,
        compute_dtype=jnp.bfloat16,
        device_mesh=None,
    ):
        """``device_mesh``: optional 1-D jax.sharding.Mesh with axis 'dp'.
        When given, grid/vertex query chunks are sharded over the mesh
        (points are embarrassingly parallel — params/keyframes replicated,
        each device scans the keyframes over its own point shard; no
        collectives). This is the multi-chip path for the 256^3 = 16.7M-point
        extraction (reference cost center: slams/meshing.py:646-657)."""
        m = cfg["meshing"]
        self.resolution = int(m.get("resolution", 256))
        self.points_batch = int(m.get("points_batch_size", 262144))
        self.level_set = float(m.get("level_set", 0.0))
        self.clean_mesh = bool(m.get("clean_mesh", True))
        # vertex colors/labels: "interpolate" reuses the grid pass's cached
        # color/label field along the marching-tetrahedra edge (every MT
        # vertex lies on a monotone Kuhn edge: endpoints differ by a 0/1
        # offset per axis), eliminating the whole second query pass;
        # "requery" re-evaluates the field exactly at each vertex (the
        # reference's behavior, meshing.py:735-762).
        self.vertex_attr = str(m.get("vertex_attr", "interpolate"))
        # hierarchical grid query: evaluate a half-resolution lattice first
        # and refine only coarse cells that could cross the level set (sign
        # change among corners, or corner margin below the cell's own
        # corner-to-corner spread). Off-surface fine points are filled by
        # trilinear interpolation of the coarse field — they cannot host
        # marching vertices when the flag criterion holds. ~3-5x fewer
        # field evaluations at 256^3; "false" restores the exhaustive
        # reference-style dense query (meshing.py:646-657).
        self.hierarchical = bool(m.get("hierarchical", True))
        self.get_largest = bool(m.get("get_largest_components", False))
        self.small_thresh = float(m.get("remove_small_geometry_threshold", 0.2))
        self.color = bool(m.get("color", True))
        self.label = bool(m.get("label", True))
        self.element = bool(m.get("element", False))
        self.depth_test = bool(m.get("depth_test", False))
        self.use_est_depth = bool(m.get("use_est_depth", False))
        self.show_forecast = bool(m.get("show_forecast", False))
        self.bound_scale = float(m.get("clean_mesh_bound_scale", 1.02))
        self.mask_all_frames = bool(m.get("get_mask_use_all_frames", False))
        # feature sampling taps, same knob as training (tpu.feature_taps):
        # 1 = nearest half-res tap, 4 = bilinear. The keyframe feature
        # gathers (K x B x taps rows per chunk) dominate the query cost.
        self.feature_taps = int(cfg.get("tpu", {}).get("feature_taps", 4))
        # fused view rows: pack [feats | depth | label] into ONE half-res
        # bf16 map per keyframe so each view costs one gather row per point
        # instead of two (TPU gather cost is per ROW). Depth/label move to
        # half-res nearest + bf16 (exact for label ids < 256; depth rel.
        # error 2^-8 ~ 0.4%, small vs the 5% truncation band and the 0.5 m
        # depth-test margin). Defaults on for the taps=1 TPU profile;
        # taps=4 keeps the reference-exact separate full-res gathers.
        self.fuse_rows = bool(
            cfg.get("tpu", {}).get("mesh_fused_rows", self.feature_taps == 1)
        )
        if self.fuse_rows and self.feature_taps != 1:
            # the fused map holds ONE row per view-point (nearest tap); it
            # cannot honor multi-tap bilinear feature sampling — fall back
            # to the reference-exact separate gathers instead of silently
            # downgrading the taps=4 profile to nearest
            import warnings

            warnings.warn(
                "tpu.mesh_fused_rows=true requires tpu.feature_taps=1 "
                f"(got {self.feature_taps}); using separate full-res "
                "gathers instead", stacklevel=2,
            )
            self.fuse_rows = False
        # view skip: per chunk, skip keyframes whose frustum provably sees
        # no chunk point (separating-half-space test on the chunk's AABB
        # corners — conservative, so the skip is EXACT: every per-view
        # contribution below is gated by the same ``seen`` predicate the
        # test bounds). Chunks are Morton-ordered (see ``extract``) so
        # their AABBs are tight; each skipped view saves its gather rows
        # and merge MLP via lax.cond. Addresses the reference cost center
        # slams/meshing.py:294-377 (project into EVERY keyframe).
        self.view_skip = bool(cfg.get("tpu", {}).get("mesh_view_skip", True))
        scale = float(cfg.get("scale", 1))
        self.mc_bound = (
            np.asarray(
                cfg["back_end"].get("marching_cubes_bound", cfg["back_end"]["bound"]),
                np.float64,
            )
            * scale
        )
        self.bound = np.asarray(bound, np.float64)
        self.cam = cam
        self.spec = spec
        self.compute_dtype = compute_dtype
        self.device_mesh = device_mesh
        if device_mesh is not None:
            n_dev = device_mesh.devices.size
            # chunk size must split evenly over the mesh
            self.points_batch = -(-self.points_batch // n_dev) * n_dev
        self._query = self._build_query()

    # ------------------------------------------------------------------
    def _build_query(self):
        spec = self.spec
        cam = self.cam
        cdt = self.compute_dtype

        def query_chunk(params, pts, kf_c2w, kf_valid, kf_feats, kf_labels,
                        kf_depths, bound):
            """pts (B,3) -> occ (B,), label (B,), color (B,3), seen (B,)."""
            B = pts.shape[0]
            h = spec.hidden_dim

            # chunk AABB corners for the per-view visibility test (device
            # local: under the dp shard_map each shard tests its own points)
            p_lo = jnp.min(pts, axis=0)
            p_hi = jnp.max(pts, axis=0)
            cbits = jnp.asarray(
                [[i & 1, (i >> 1) & 1, (i >> 2) & 1] for i in range(8)],
                pts.dtype,
            )
            aabb = p_lo[None] * (1 - cbits) + p_hi[None] * cbits  # (8,3)

            def kf_step(carry, inputs):
                c2w, valid, feats, labels_img, depth_img = inputs
                w2c = invert_se3(c2w)

                def view_body(carry):
                    code_sum, count, label, label_seen = carry
                    pc = world_to_camera(pts, w2c[None])[0]  # (B,3)
                    u, v, d = project_points(
                        pc, cam["fx"], cam["fy"], cam["cx"], cam["cy"]
                    )
                    u = jnp.round(u)
                    v = jnp.round(v)
                    seen = (
                        (u > 0) & (u < cam["W"] - 1)
                        & (v > 0) & (v < cam["H"] - 1)
                        & (d > 0) & valid
                    )
                    Hf, Wf = feats.shape[0], feats.shape[1]
                    gx = u * ((Wf - 1.0) / (cam["W"] - 1.0))
                    gy = v * ((Hf - 1.0) / (cam["H"] - 1.0))
                    if self.fuse_rows:
                        # feats is the fused (Hf, Wf, 64+2) map: one gather
                        # row per view-point yields code + depth + label
                        row = nearest_sample(feats, gx, gy)  # (B, 66)
                        code = row[:, :-2]
                        kf_d = row[:, -2].astype(jnp.float32)
                        lab_f = row[:, -1].astype(jnp.float32)
                    else:
                        sampler = (
                            bilinear_sample if self.feature_taps == 4
                            else nearest_sample
                        )
                        code = sampler(feats, gx, gy)  # (B,64)
                        # depth-truncation mask vs the keyframe's sensor
                        # depth; depth+label gathered as ONE two-channel row
                        # per point (gather cost is per-row on TPU)
                        ui = jnp.clip(u, 0, cam["W"] - 1).astype(jnp.int32)
                        vi = jnp.clip(v, 0, cam["H"] - 1).astype(jnp.int32)
                        dl = _row_gather(
                            jnp.stack(
                                [depth_img, labels_img.astype(depth_img.dtype)],
                                -1,
                            ),
                            vi,
                            ui,
                        )  # (B, 2)
                        kf_d = dl[:, 0]
                        lab_f = dl[:, 1]
                    if self.depth_test:
                        # visibility requires the point to not be far behind
                        # the observed surface (reference: meshing.py:124-291;
                        # zero-depth pixels pass, as the reference fills them
                        # with max depth)
                        seen = seen & ((kf_d <= 0) | (d <= kf_d + 0.5))
                    trunc = (d > kf_d * 0.95) & (d < kf_d * 1.05) & (kf_d > 0)
                    use = seen & trunc
                    code = code * use[:, None]
                    rel = pts - c2w[:3, 3]
                    merged = merge_apply(
                        params, rel[None], code[None], bound, spec, cdt
                    )  # (B,h)
                    code_sum = code_sum + merged * seen[:, None]
                    count = count + seen.astype(jnp.float32)
                    lab = lab_f.astype(jnp.int32)
                    label = jnp.where(seen, lab, label)
                    label_seen = label_seen | seen
                    return (code_sum, count, label, label_seen)

                if not self.view_skip:
                    return view_body(carry), None
                # Conservative skip: with every AABB corner in front of the
                # camera, the (projective) pixel projection of the chunk's
                # convex hull is the convex hull of the projected corners —
                # if all corners sit beyond one image edge, no chunk point
                # can satisfy the ``seen`` predicate above and the view
                # contributes nothing (all accumulation is seen-gated), so
                # skipping it is bit-exact. Any corner behind the camera
                # voids the hull argument -> conservatively visible (unless
                # ALL corners are behind: then every hull point has d <= 0).
                uc, vc, dc = project_points(
                    world_to_camera(aabb, w2c[None])[0],
                    cam["fx"], cam["fy"], cam["cx"], cam["cy"],
                )
                all_behind = jnp.all(dc <= 0)
                sep = (
                    jnp.all(uc <= 0) | jnp.all(uc >= cam["W"] - 1)
                    | jnp.all(vc <= 0) | jnp.all(vc >= cam["H"] - 1)
                )
                maybe = valid & ~all_behind & (jnp.any(dc <= 0) | ~sep)
                carry = jax.lax.cond(maybe, view_body, lambda c: c, carry)
                return carry, None

            init = (
                jnp.zeros((B, h)),
                jnp.zeros((B,)),
                jnp.zeros((B,), jnp.int32),
                jnp.zeros((B,), bool),
            )
            (code_sum, count, label, label_seen), _ = jax.lax.scan(
                kf_step, init,
                (kf_c2w, kf_valid, kf_feats, kf_labels, kf_depths),
            )
            code = code_sum / jnp.maximum(count, 1.0)[:, None]

            p01 = (pts - bound[:, 0]) / (bound[:, 1] - bound[:, 0])
            in_bound = jnp.all((p01 >= 0) & (p01 <= 1), axis=-1)
            pe, grid = pos_encode(params, jnp.clip(p01, 0, 1), spec)
            lat = fine_apply(
                params, label, pe[:, None, :], grid[:, None, :], cdt
            )[:, 0]  # (B, h+1)
            occ = lat[:, 0]
            if self.show_forecast:
                # never-observed points fall back to the class-agnostic
                # coarse field (reference forecast path, meshing.py:447-532)
                from dnsjax.models.decoder import coarse_apply

                occ_c = coarse_apply(params, pe, grid, cdt)[:, 0]
                occ = jnp.where(label_seen, occ, occ_c)
            occ = jnp.where(in_bound, occ, -100.0)
            color, _ = out_apply(
                params, pe, jnp.concatenate([lat[:, 1:], code], -1), cdt
            )
            out_label = jnp.where(in_bound & label_seen, label, -1)
            return occ, out_label, color, count

        if self.device_mesh is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            sharded = shard_map(
                query_chunk,
                mesh=self.device_mesh,
                in_specs=(P(), P("dp"), P(), P(), P(), P(), P(), P()),
                out_specs=(P("dp"), P("dp"), P("dp"), P("dp")),
                check_vma=False,
            )
            return jax.jit(sharded)
        return jax.jit(query_chunk)

    # ------------------------------------------------------------------
    def fuse_view_maps(
        self, feats: jnp.ndarray, depths: jnp.ndarray, labels: jnp.ndarray
    ) -> jnp.ndarray:
        """Pack per-keyframe [feats | depth | label] into one half-res bf16
        map (K, Hf, Wf, C+2) so the per-view query costs a single gather
        row per point (see ``fuse_rows``). Depth/label are nearest-sampled
        at the half-res grid positions of the align_corners mapping the
        query uses (u_full = gx * (W-1)/(Wf-1))."""
        K, Hf, Wf = feats.shape[0], feats.shape[1], feats.shape[2]
        H, W = int(self.cam["H"]), int(self.cam["W"])
        yi = jnp.round(
            jnp.arange(Hf, dtype=jnp.float32) * ((H - 1.0) / (Hf - 1.0))
        ).astype(jnp.int32)
        xi = jnp.round(
            jnp.arange(Wf, dtype=jnp.float32) * ((W - 1.0) / (Wf - 1.0))
        ).astype(jnp.int32)
        d_half = depths[:, yi][:, :, xi]  # (K, Hf, Wf)
        l_half = labels[:, yi][:, :, xi].astype(jnp.float32)
        return jnp.concatenate(
            [
                feats.astype(jnp.bfloat16),
                d_half[..., None].astype(jnp.bfloat16),
                l_half[..., None].astype(jnp.bfloat16),
            ],
            -1,
        )

    # ------------------------------------------------------------------
    def estimated_depths(self, params, keyframes) -> jnp.ndarray:
        """Fill zero-depth keyframe pixels with coarse-rendered depth
        (reference ``depth_render``, meshing.py:62-120; active when
        depth_test + use_est_depth)."""
        from dnsjax.geometry.rays import all_rays, ray_box_far
        from dnsjax.models.decoder import coarse_apply
        from dnsjax.render.composite import composite_rays
        from dnsjax.render.sampling import sample_along_rays

        cam, spec, cdt = self.cam, self.spec, self.compute_dtype
        H, W = int(cam["H"]), int(cam["W"])
        bound = jnp.asarray(self.bound, jnp.float32)
        chunk = 8192
        n = H * W
        n_pad = (n + chunk - 1) // chunk * chunk

        @jax.jit
        def render_depth(params, c2w, depth):
            o, d = all_rays(H, W, c2w, cam["fx"], cam["fy"], cam["cx"], cam["cy"])
            o = o.reshape(-1, 3)
            d = d.reshape(-1, 3)
            df = depth.reshape(-1)
            far = ray_box_far(o, d, bound) + 0.01
            z = sample_along_rays(jax.random.PRNGKey(0), df, 32, 0, far)

            def pad(x):
                return jnp.concatenate(
                    [x, jnp.zeros((n_pad - n,) + x.shape[1:], x.dtype)], 0
                ).reshape(n_pad // chunk, chunk, *x.shape[1:])

            def body(args):
                ro, rd, zc = args
                pts = ro[:, None, :] + rd[:, None, :] * zc[:, :, None]
                p01 = (pts.reshape(-1, 3) - bound[:, 0]) / (
                    bound[:, 1] - bound[:, 0]
                )
                pe, grid = pos_encode(params, jnp.clip(p01, 0, 1), spec)
                occ = coarse_apply(params, pe, grid, cdt)[:, 0].reshape(
                    chunk, -1
                )
                dep, _, _, _ = composite_rays(
                    jnp.zeros(occ.shape + (3,)), occ, zc, rd
                )
                return dep

            est = jax.lax.map(body, (pad(o), pad(d), pad(z))).reshape(-1)[:n]
            return jnp.where(df > 0, df, est).reshape(H, W)

        out = []
        for k in range(keyframes.count):
            out.append(
                render_depth(params, keyframes.est_c2w[k], keyframes.depths[k])
            )
        filled = jnp.stack(out)
        pad_k = keyframes.capacity - keyframes.count
        return jnp.concatenate(
            [filled, keyframes.depths[keyframes.count :]], 0
        ) if pad_k else filled

    def frames_hull(self, keyframes):
        """Convex hull of the back-projected keyframe depth clouds, scaled by
        clean_mesh_bound_scale — replaces the reference's open3d TSDF-volume
        hull (meshing.py:380-445), used to crop forecast geometry."""
        from scipy.spatial import Delaunay

        from dnsjax.geometry.rays import all_rays

        pts = []
        H, W = int(self.cam["H"]), int(self.cam["W"])
        for k in range(keyframes.count):
            o, d = all_rays(
                H, W, keyframes.est_c2w[k],
                self.cam["fx"], self.cam["fy"], self.cam["cx"], self.cam["cy"],
            )
            dep = np.asarray(keyframes.depths[k])[::8, ::8]
            p = np.asarray(o)[::8, ::8] + np.asarray(d)[::8, ::8] * dep[..., None]
            pts.append(p.reshape(-1, 3)[dep.reshape(-1) > 0])
        cloud = np.concatenate(pts, 0)
        centroid = cloud.mean(0)
        cloud = (cloud - centroid) * self.bound_scale + centroid
        return Delaunay(cloud[np.random.default_rng(0).choice(
            cloud.shape[0], size=min(20000, cloud.shape[0]), replace=False)])

    def _grid_axes(self):
        """Per-axis lattice coordinates (f64) + origin/spacing — the full
        (r^3, 3) point tensor is only materialized where actually needed
        (flat query path); the hierarchical path builds its coarse/fine
        point subsets straight from these axes."""
        pad = 0.05
        lo = self.mc_bound[:, 0] - pad
        hi = self.mc_bound[:, 1] + pad
        r = self.resolution
        axes = [np.linspace(lo[k], hi[k], r) for k in range(3)]
        spacing = [(hi[k] - lo[k]) / (r - 1) for k in range(3)]
        return axes, lo, spacing

    def _grid(self):
        axes, lo, spacing = self._grid_axes()
        X, Y, Z = np.meshgrid(*axes, indexing="ij")
        pts = np.stack([X.ravel(), Y.ravel(), Z.ravel()], -1).astype(np.float32)
        return pts, lo, spacing

    def extract(
        self,
        params,
        enc_params,
        keyframes,
        class2color: Optional[np.ndarray] = None,
        all_poses: Optional[np.ndarray] = None,
        kf_feats=None,
    ) -> Dict[str, np.ndarray]:
        """Run the full extraction; returns mesh dict.

        ``kf_feats`` — optional pre-encoded keyframe feature maps of shape
        (capacity, ceil(H/2), ceil(W/2), C). When the caller (the SLAM
        driver) already holds per-keyframe encoder features, passing them
        here skips re-encoding every keyframe image on every ``mesh_every``
        extraction — keyframe images are immutable after insertion, so the
        cached maps are exact."""
        import time as _time

        from dnsjax.models.encoder import encode_images

        # per-phase wall clocks (host-observed, includes dispatch latency);
        # read by bench.py's extraction-wall row and by profiling scripts
        self.last_timings: Dict[str, float] = {}
        _t0 = _time.perf_counter()

        def _mark(name):
            nonlocal _t0
            t = _time.perf_counter()
            self.last_timings[name] = (
                self.last_timings.get(name, 0.0) + t - _t0
            )
            _t0 = t

        kf = keyframes
        K = kf.capacity
        kf_valid = jnp.arange(K) < kf.count
        if kf_feats is not None:
            feats = jnp.asarray(kf_feats).astype(self.compute_dtype)
        else:
            feats = encode_images(
                enc_params, kf.colors, self.compute_dtype
            ).astype(self.compute_dtype)
        kf_depths = kf.depths
        if self.depth_test and self.use_est_depth:
            kf_depths = self.estimated_depths(params, kf)
        if self.fuse_rows:
            feats = self.fuse_view_maps(feats, kf_depths, kf.labels)
        _mark("encode_views")

        grid_axes, lo, spacing = self._grid_axes()
        B = self.points_batch
        interp = self.vertex_attr == "interpolate"
        bound_j = jnp.asarray(self.bound, jnp.float32)

        def query_points(p):
            """Chunked field query: (M,3) -> occ, label, color, seen.

            Points are visited in Morton (Z-curve) order so each chunk is
            spatially compact: the per-view AABB skip in ``query_chunk``
            then prunes keyframes that cannot see the chunk. The ordering
            is a pure permutation (results are scattered back), so outputs
            are identical either way."""
            M = p.shape[0]
            order = None
            if self.view_skip and M > B:
                t0 = _time.perf_counter()
                order = self._morton_order(p, lo, spacing)
                p = p[order]
                self.last_timings["morton"] = (
                    self.last_timings.get("morton", 0.0)
                    + _time.perf_counter() - t0
                )
            o_ = np.empty(M, np.float32)
            l_ = np.empty(M, np.int32)
            c_ = np.empty((M, 3), np.float32)
            s_ = np.empty(M, np.float32)

            # Double-buffered dispatch: chunk i+1 is enqueued (async jax
            # dispatch) BEFORE chunk i's result is fetched, so device
            # compute overlaps the host-side transfer — through the axon
            # tunnel every fetch pays a full RTT, which previously
            # serialized with the query itself. The 4 per-chunk outputs are
            # packed into ONE (B, 6) f32 device array so each chunk costs a
            # single transfer instead of four (labels are small ints, exact
            # in f32).
            def _fetch(pend):
                a, e, packed = pend
                arr = np.asarray(packed)
                o_[a:e] = arr[: e - a, 0]
                l_[a:e] = arr[: e - a, 1].astype(np.int32)
                c_[a:e] = arr[: e - a, 2:5]
                s_[a:e] = arr[: e - a, 5]

            pending = None
            for a in range(0, M, B):
                e = min(a + B, M)
                t0 = _time.perf_counter()
                # pad with the chunk's last point (not zeros): padding must
                # not inflate the chunk AABB the view skip tests
                chunk = np.broadcast_to(p[e - 1], (B, 3)).copy()
                chunk[: e - a] = p[a:e]
                o, l, c, cnt = self._query(
                    params, jnp.asarray(chunk), kf.est_c2w, kf_valid, feats,
                    kf.labels, kf_depths, bound_j,
                )
                packed = jnp.concatenate(
                    [o[:, None], l.astype(jnp.float32)[:, None], c,
                     cnt[:, None]], axis=-1,
                )
                if pending is not None:
                    _fetch(pending)
                pending = (a, e, packed)
                self.last_timings["query_dispatch"] = (
                    self.last_timings.get("query_dispatch", 0.0)
                    + _time.perf_counter() - t0
                )
                self.last_timings["query_points"] = (
                    self.last_timings.get("query_points", 0.0) + (e - a)
                )
                self.last_timings["query_chunks"] = (
                    self.last_timings.get("query_chunks", 0.0) + 1
                )
            if pending is not None:
                t0 = _time.perf_counter()
                _fetch(pending)
                self.last_timings["query_dispatch"] = (
                    self.last_timings.get("query_dispatch", 0.0)
                    + _time.perf_counter() - t0
                )
            if order is not None:
                inv = np.empty(M, np.int64)
                inv[order] = np.arange(M)
                return o_[inv], l_[inv], c_[inv], s_[inv]
            return o_, l_, c_, s_

        _mark("grid_setup")
        r = self.resolution
        if self.hierarchical and r >= 32:
            occ, label, col, seen = self._hierarchical_query(
                grid_axes, query_points
            )
        else:
            X, Y, Z = np.meshgrid(*grid_axes, indexing="ij")
            pts = np.stack(
                [X.ravel(), Y.ravel(), Z.ravel()], -1
            ).astype(np.float32)
            occ, label, col, seen = query_points(pts)
        if not interp:
            col = None
        _mark("grid_query")

        r = self.resolution
        verts, faces = marching_tetrahedra(
            occ.reshape(r, r, r), self.level_set, origin=lo, spacing=spacing
        )
        _mark("marching")
        if verts.shape[0] == 0:
            return {"vertices": verts, "faces": faces}

        if self.clean_mesh:
            if self.show_forecast and kf.count > 0:
                hull = self.frames_hull(kf)
                inside = hull.find_simplex(verts) >= 0
                keep = inside[faces].all(axis=1)
                faces = faces[keep]
            verts, faces = self._clean(
                verts, faces, seen.reshape(r, r, r), lo, spacing,
                all_poses=all_poses,
            )
        _mark("clean")

        # per-vertex color/label
        if interp:
            # every MT vertex sits on a tet edge whose endpoints are grid
            # corners p0, p0 + mask (mask in {0,1}^3): lerp the cached
            # color field, nearest-endpoint the label (falling back to the
            # other endpoint when the nearest was never observed)
            r3 = (self.resolution,) * 3
            g = (verts - lo) / np.asarray(spacing)
            g0 = np.floor(g + 1e-4).astype(np.int64)
            frac = np.clip(g - g0, 0.0, 1.0)
            frac[frac < 1e-4] = 0.0
            t = frac.max(axis=1)
            g1 = np.minimum(g0 + (frac > 0), self.resolution - 1)
            g0 = np.clip(g0, 0, self.resolution - 1)
            f0 = np.ravel_multi_index(tuple(g0.T), r3)
            f1 = np.ravel_multi_index(tuple(g1.T), r3)
            vcol = (1.0 - t)[:, None] * col[f0] + t[:, None] * col[f1]
            near = np.where(t < 0.5, f0, f1)
            far = np.where(t < 0.5, f1, f0)
            vlab = label[near]
            miss = vlab < 0
            vlab[miss] = label[far[miss]]
        else:
            # reference-exact vertex re-query (meshing.py:735-762), through
            # the same chunked path as the grid pass (Morton order + skips)
            _, vlab, vcol, _ = query_points(verts.astype(np.float32))

        _mark("vertex_attrs")
        out = {"vertices": verts, "faces": faces, "colors": vcol, "labels": vlab}
        if class2color is not None:
            out["label_colors"] = class2color[np.clip(vlab, 0, len(class2color) - 1)]
        return out

    # ------------------------------------------------------------------
    _MORTON_SPREAD = None  # lazily-built 1024-entry bit-spread LUT

    @staticmethod
    def _morton_order(p, lo, spacing):
        """Stable argsort of points along a Morton (Z-order) curve of their
        grid lattice coords, so sequential chunks are spatially compact
        (tight AABBs -> more keyframe-view skips in the chunk query).

        Bit interleave via a 1024-entry spread LUT (bit b -> bit 3b): three
        gathers + two shift-ors over the whole point set, vs 30 passes for
        the naive per-bit loop — same codes, same order."""
        if Mesher._MORTON_SPREAD is None:
            v = np.arange(1 << 10, dtype=np.uint64)
            t = np.zeros(1 << 10, np.uint64)
            for b in range(10):
                t |= ((v >> np.uint64(b)) & np.uint64(1)) << np.uint64(3 * b)
            Mesher._MORTON_SPREAD = t
        t = Mesher._MORTON_SPREAD
        g = np.round((np.asarray(p) - lo) / np.asarray(spacing))
        g = np.clip(g, 0, (1 << 10) - 1).astype(np.int64)
        code = (
            t[g[:, 0]]
            | (t[g[:, 1]] << np.uint64(1))
            | (t[g[:, 2]] << np.uint64(2))
        )
        return np.argsort(code, kind="stable")

    # ------------------------------------------------------------------
    def _hierarchical_query(self, grid_axes, query_points):
        """Coarse-to-fine field evaluation over the (r,r,r) lattice.

        Evaluates every 2nd lattice point (plus the last plane per axis),
        flags coarse cells that could cross ``level_set`` (corner sign
        change, or any corner's margin to the level below that cell's own
        corner-to-corner spread), evaluates all fine lattice points of
        flagged cells, and fills the rest by trilinear interpolation of
        the coarse field (sign-safe where the flag criterion holds, so
        marching cannot produce vertices from filled values).
        ``grid_axes`` are the three per-axis lattice coordinate vectors;
        coarse/fine point sets are assembled from them directly (the full
        r^3 x 3 tensor is never materialized).
        Returns occ, label, col, seen as flat (r^3,) / (r^3,3) arrays.
        """
        r = self.resolution
        lv = self.level_set

        ax = np.unique(np.concatenate([np.arange(0, r, 2), [r - 1]]))
        m = ax.size
        cX, cY, cZ = np.meshgrid(
            grid_axes[0][ax], grid_axes[1][ax], grid_axes[2][ax],
            indexing="ij",
        )
        coarse_pts = np.stack(
            [cX.ravel(), cY.ravel(), cZ.ravel()], -1
        ).astype(np.float32)
        co, cl, cc, cs = query_points(coarse_pts)
        co3 = co.reshape(m, m, m)

        # corner stacks of each coarse cell: (8, m-1, m-1, m-1)
        corners = np.stack([
            co3[i:m - 1 + i or None, j:m - 1 + j or None, k:m - 1 + k or None]
            for i in (0, 1) for j in (0, 1) for k in (0, 1)
        ])
        inside = corners > lv
        sign_change = inside.any(0) != inside.all(0)
        spread = corners.max(0) - corners.min(0)
        margin = np.abs(corners - lv).min(0)
        flagged = sign_change | (margin < spread)

        # fine-lattice evaluation mask: all lattice points of flagged cells
        need = np.zeros((r, r, r), bool)
        lo_i, hi_i = ax[:-1], ax[1:]
        fi, fj, fk = np.nonzero(flagged)
        for a, b, c in zip(fi, fj, fk):
            need[lo_i[a]:hi_i[a] + 1, lo_i[b]:hi_i[b] + 1,
                 lo_i[c]:hi_i[c] + 1] = True

        # fill everything from the coarse field first (trilinear occ/seen,
        # nearest label/color), then overwrite evaluated points
        # fractional coarse coordinate of each fine index
        fc = np.interp(np.arange(r), ax, np.arange(m))
        i0 = np.minimum(fc.astype(np.int64), m - 2)
        w1 = fc - i0
        cs3 = cs.reshape(m, m, m)

        def trilerp(src):
            # trilinear interpolation is separable: three successive 1-D
            # lerps (m,m,m)->(r,m,m)->(r,r,m)->(r,r,r) touch ~1.4 r^3
            # elements total vs the 8 full-r^3 gathers of the direct form
            # (same math, ~6x less memory traffic on the 256^3 grid)
            out = src
            for axis in range(3):
                a = np.take(out, i0, axis=axis)
                b = np.take(out, i0 + 1, axis=axis)
                shape = [1, 1, 1]
                shape[axis] = -1
                w = w1.reshape(shape)
                out = a * (1.0 - w) + b * w
            return out.astype(np.float32)

        occ = trilerp(co3)
        seen = trilerp(cs3)
        nn = np.minimum(np.round(fc).astype(np.int64), m - 1)
        cl3 = cl.reshape(m, m, m)
        cc3 = cc.reshape(m, m, m, 3)
        label = cl3[np.ix_(nn, nn, nn)]
        col = cc3[np.ix_(nn, nn, nn)]

        # evaluate the flagged fine points exactly
        where = np.nonzero(need)
        if where[0].size:
            fine_pts = np.stack(
                [grid_axes[0][where[0]], grid_axes[1][where[1]],
                 grid_axes[2][where[2]]], -1,
            ).astype(np.float32)
            fo, fl, fcoln, fs = query_points(fine_pts)
            occ[where] = fo
            label[where] = fl
            col[where] = fcoln
            seen[where] = fs

        frac = where[0].size / float(r ** 3)
        if frac > 0.9:
            print(f"hierarchical mesh query: {frac:.0%} refined "
                  "(little savings; consider meshing.hierarchical: false)")
        return (occ.reshape(-1), label.reshape(-1),
                col.reshape(-1, 3), seen.reshape(-1))

    def _clean(self, verts, faces, seen_grid, lo, spacing, all_poses=None):
        """Cull faces whose vertices were never observed by any keyframe
        (reference seen-mask clean, meshing.py:694-733) + optional small
        connected-component removal. With get_mask_use_all_frames, ANY
        trajectory pose's frustum counts as observation (meshing.py:124-291
        all-frames variant)."""
        idx = np.round((verts - lo) / spacing).astype(np.int64)
        idx = np.clip(idx, 0, self.resolution - 1)
        vseen = seen_grid[idx[:, 0], idx[:, 1], idx[:, 2]] > 0
        if self.mask_all_frames and all_poses is not None:
            vseen = vseen | self._frustum_any(verts, all_poses)
        keep = vseen[faces].all(axis=1)
        faces = faces[keep]

        if self.get_largest or self.small_thresh > 0:
            faces = self._remove_small_components(verts, faces)

        # compact vertices
        used = np.unique(faces)
        remap = np.full(verts.shape[0], -1, np.int64)
        remap[used] = np.arange(used.size)
        return verts[used], remap[faces].astype(np.int32)

    def _frustum_any(self, verts, poses) -> np.ndarray:
        """True for vertices inside any pose's frustum (poses only, no
        depth test)."""
        from dnsjax.geometry.rays import project_points, world_to_camera
        from dnsjax.geometry.se3 import invert_se3

        cam = self.cam
        seen = np.zeros(verts.shape[0], bool)
        v = jnp.asarray(verts)

        @jax.jit
        def check(pose_batch, v):
            w2c = invert_se3(pose_batch)
            pc = world_to_camera(v, w2c)
            u, vv, d = project_points(pc, cam["fx"], cam["fy"], cam["cx"], cam["cy"])
            ok = (u > 0) & (u < cam["W"] - 1) & (vv > 0) & (vv < cam["H"] - 1) & (d > 0)
            return jnp.any(ok, axis=0)

        poses = np.asarray(poses)
        # skip untracked identity placeholders and invalid poses
        is_identity = np.abs(poses - np.eye(4)).max(axis=(1, 2)) < 1e-8
        ok = (~is_identity) & np.isfinite(poses).all((1, 2))
        poses = poses[ok]
        for s0 in range(0, poses.shape[0], 64):
            seen |= np.asarray(check(jnp.asarray(poses[s0:s0+64]), v))
        return seen

    def _remove_small_components(self, verts, faces):
        if faces.shape[0] == 0:
            return faces
        from scipy.sparse import coo_matrix
        from scipy.sparse.csgraph import connected_components

        e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
        g = coo_matrix(
            (np.ones(e.shape[0]), (e[:, 0], e[:, 1])),
            shape=(verts.shape[0], verts.shape[0]),
        )
        n_comp, lab = connected_components(g, directed=False)
        face_comp = lab[faces[:, 0]]
        sizes = np.bincount(lab, minlength=n_comp)
        if self.get_largest:
            keep_comp = {int(np.argmax(sizes))}
        else:
            # drop components smaller than small_thresh fraction of the largest
            thr = sizes.max() * self.small_thresh
            keep_comp = set(np.nonzero(sizes >= thr)[0].tolist())
        keep = np.isin(face_comp, list(keep_comp))
        return faces[keep]

    # ------------------------------------------------------------------
    def save_mesh(self, driver, idx: int):
        """Driver hook: extract + export (reference: mapping.py:1092-1107)."""
        class2color = getattr(driver, "class_colors", None)
        mesh = self.extract(
            driver.params, driver.enc_params, driver.keyframes, class2color,
            all_poses=driver.estimate_c2w[: idx + 1],
            kf_feats=driver.collect_kf_feats(),
        )
        if mesh["faces"].shape[0] == 0:
            print(f"mesh_{idx}: empty")
            return
        path = os.path.join(driver.out_dir, f"mesh_{idx}.ply")
        write_ply(
            path, mesh["vertices"], mesh["faces"],
            colors=mesh.get("colors") if self.color else None,
            labels=mesh.get("labels") if self.label else None,
        )
        if self.label and "label_colors" in mesh:
            write_ply(
                os.path.join(driver.out_dir, f"mesh_{idx}_semantic.ply"),
                mesh["vertices"], mesh["faces"],
                colors=mesh["label_colors"] / 255.0,
                labels=mesh.get("labels"),
            )
        if self.element:
            labs = mesh.get("labels")
            for c in np.unique(labs):
                sel = labs[mesh["faces"]].max(1) == c
                if sel.sum() == 0:
                    continue
                write_ply(
                    os.path.join(driver.out_dir, f"mesh_{idx}_part_{c}.ply"),
                    mesh["vertices"], mesh["faces"][sel],
                    colors=mesh.get("colors"),
                )
        print(f"mesh_{idx}.ply saved ({mesh['vertices'].shape[0]} verts)")
