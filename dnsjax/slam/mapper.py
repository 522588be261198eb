"""Mapping (back end): joint neural-map + keyframe-pose optimization.

Counterpart of the reference ``Mapper`` (reference: slams/mapping.py). One
keystep optimizes a window of target frames (selected keyframes + the
current frame) against the map with a 7-term loss:
photometric, depth L1, semantic CE, coarse<->fine latent distillation, TV
smoothness of occupancy, free-space, and opacity (mapping.py:881-910).

dnsjax compiles the whole keystep into one ``lax.scan`` device program with
fixed shapes:
* ray sampling is 2/3 uniform + 1/3 class-balanced per target frame
  (mapping.py:497-512) using precomputed class-sorted pixel tables;
* fine decoders are one stacked parameter tensor, dispatched per ray by its
  GT label — unused classes get exactly zero gradient, reproducing the
  reference's "only classes in the window train" behavior (mapping.py:438-446)
  without dynamic optimizer construction;
* window frame 0 is pose-frozen and poses only move when BA is active
  (mapping.py:455-459, 871-879), via gradient masks;
* reference-view poses are all stop-gradients, sourced live from the
  optimizer for targets in the window, else from the keyframe store
  (mapping.py:533-548).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from dnsjax.geometry.rays import rays_from_uv, ray_box_far
from dnsjax.geometry.se3 import quat_to_rotation, compose_c2w, invert_se3
from dnsjax.losses import (
    photometric_loss,
    depth_l1_loss,
    semantic_ce_loss,
    latent_distill_loss,
    tv_smoothness_loss,
    freespace_opacity_loss,
    masked_mean,
)
from dnsjax.models.decoder import DecoderSpec, pos_encode, coarse_apply
from dnsjax.models.features import match_features, match_features_batched
from dnsjax.render.pipeline import render_fine
from dnsjax.render.sampling import sample_along_rays
from dnsjax.slam.sampling import (
    sample_uniform_pixels,
    sample_class_balanced_pixels,
    sample_restricted_class_pixels,
)


@dataclass(frozen=True)
class MapConfig:
    H: int
    W: int
    fx: float
    fy: float
    cx: float
    cy: float
    n_pixels: int = 2000
    n_samples: int = 32
    n_surface: int = 15
    lr: float = 5e-3
    ba_cam_lr: float = 5e-4
    lambda_p: float = 5.0
    lambda_d: float = 5.0
    lambda_l: float = 0.1
    lambda_sm: float = 1e-5
    lambda_fs: float = 10.0
    lambda_op: float = 10.0
    smooth_pts: int = 64
    smooth_voxel: float = 0.1
    smooth_margin: float = 0.05
    # Evaluate the TV-smoothness term every k-th iteration, scaled by k —
    # same expected penalty over the keystep (the term is already a
    # stochastic estimator over a random sub-grid; reference evaluates it
    # every iteration, mapping.py:891-907). A/B-gated (scripts/ab_quality.py).
    smooth_every: int = 1
    opacity_sigma: float = 0.05
    truncation: float = 0.2
    feature_taps: int = 4  # 1 = nearest half-res tap (see models/features.py)

    @property
    def cam(self):
        return dict(H=self.H, W=self.W, fx=self.fx, fy=self.fy, cx=self.cx, cy=self.cy)


def smoothness_grid_pts01(bound, key, cfg: MapConfig) -> jnp.ndarray:
    """Bound-normalized points of the randomly-placed TV sub-grid
    (reference: mapping.py:129-159): grid of (smooth_pts-1)^3 cells of
    smooth_voxel size, jittered and offset randomly inside the bound.
    Returns (g^3, 3) in [0,1]."""
    g = cfg.smooth_pts - 1
    k1, k2 = jax.random.split(key)
    extent = bound[:, 1] - bound[:, 0]
    grid_size = g * cfg.smooth_voxel
    offset_max = extent - grid_size - 2 * cfg.smooth_margin
    offset = jax.random.uniform(k1, (3,)) * offset_max + cfg.smooth_margin

    ax = jnp.arange(g, dtype=jnp.float32)
    coords = jnp.stack(jnp.meshgrid(ax, ax, ax, indexing="ij"), -1)  # (g,g,g,3)
    jitter = jax.random.uniform(k2, (1, 1, 1, 3))
    pts = (coords + jitter) * cfg.smooth_voxel + bound[:, 0] + offset
    return ((pts - bound[:, 0]) / extent).reshape(-1, 3)


def smoothness_grid_occ(params, spec, bound, key, cfg: MapConfig, compute_dtype):
    """Occupancy logits on the TV sub-grid, (g,g,g)."""
    g = cfg.smooth_pts - 1
    p01 = smoothness_grid_pts01(bound, key, cfg)
    pe, grid = pos_encode(params, p01, spec)
    occ = coarse_apply(params, pe, grid, compute_dtype)[:, 0]
    return occ.reshape(g, g, g)


def _build_loss_fn(
    spec: DecoderSpec, cfg: MapConfig, n_target: int, compute_dtype=jnp.bfloat16
):
    """The per-iteration mapping loss over a window of ``n_target`` frames
    (shared by the single-chip and data-parallel keysteps).

    Window dict layout:
      colors (T,H,W,3), depths (T,H,W), labels (T,H,W) int32,
      sorted_idx (T,H*W) int32, offsets (T,C+1) int32,
      refer_feats (T,R,Hf,Wf,64), refer_fixed_c2w (T,R,4,4),
      refer_src (T,R) int32 (index into window if the reference view is a
        live target, else -1),
      pose_train (T,) float (0 freezes a frame's pose),
      pose_src (T,) int32, optional (default identity): window position whose
        LIVE pose this slot renders with — windows are padded to a fixed
        n_joint_optimize_frames so one compiled keystep serves every window
        size; padding slots duplicate a real frame's tensors round-robin and
        point pose_src at the real slot, so the frame simply receives that
        slot's share of the ray budget (the reference splits n_pixels evenly
        across its variable-size window, mapping.py:497) and pose gradients
        flow to the one real variable,
      frame_valid (T,) float, optional (default all-ones): 0 additionally
        masks a slot out of every loss term,
      bound (3,2),
      lt_gate_iter () int32 (lambda_lt = 0 while iter <= gate; reference
        mapping.py:898-904).
    """
    T = n_target
    n_pix = cfg.n_pixels // T
    n_uni = n_pix // 3 * 2
    n_bal = n_pix // 3
    n_ray = n_uni + n_bal
    S = cfg.n_samples + cfg.n_surface

    def sample_target(key, c2w_live, t, window):
        """Assemble one target frame's ray batch. Returns per-ray tensors
        plus the frame's reference-view poses; the feature gather itself is
        hoisted OUT of the per-frame vmap into one flat batched lookup
        (match_features_batched — a vmapped per-frame gather carries operand
        batching dims that TPU executes ~12x slower per row)."""
        k_u, k_b, k_z = jax.random.split(key, 3)
        colorf = window["colors"][t].reshape(-1, 3)
        depthf = window["depths"][t].reshape(-1)
        labelf = window["labels"][t].reshape(-1)

        pix_u = sample_uniform_pixels(k_u, n_uni, cfg.H, cfg.W)
        pix_b = sample_class_balanced_pixels(
            k_b, n_bal, window["sorted_idx"][t], window["offsets"][t]
        )
        pix = jnp.concatenate([pix_u, pix_b])

        gt_c = colorf[pix]
        gt_d = depthf[pix]
        gt_l = labelf[pix]
        i = (pix % cfg.W).astype(jnp.float32)
        j = (pix // cfg.W).astype(jnp.float32)
        c2w_t = c2w_live[t]
        rays_o, rays_d = rays_from_uv(i, j, c2w_t, cfg.fx, cfg.fy, cfg.cx, cfg.cy)

        far = ray_box_far(
            jax.lax.stop_gradient(rays_o),
            jax.lax.stop_gradient(rays_d),
            window["bound"],
        )
        inside = far >= gt_d
        far = far + 0.01

        z = sample_along_rays(k_z, gt_d, cfg.n_samples, cfg.n_surface, far)
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z[:, :, None]

        # reference-view poses: live (stop-grad) for window targets, fixed else
        src = window["refer_src"][t]  # (R,)
        live = jax.lax.stop_gradient(c2w_live)[jnp.clip(src, 0, T - 1)]
        fixed = window["refer_fixed_c2w"][t]
        refer_c2w = jnp.where((src >= 0)[:, None, None], live, fixed)
        refer_w2c = invert_se3(refer_c2w)

        return gt_c, gt_d, gt_l, rays_d, z, pts, refer_w2c, inside

    def loss_fn(opt_params, key, it, window):
        params, quads, Ts = opt_params
        k_t, k_sm = jax.random.split(key)
        c2w_live = compose_c2w(quat_to_rotation(quads), Ts)  # (T,4,4)
        if "pose_src" in window:
            c2w_live = c2w_live[window["pose_src"]]

        keys = jax.random.split(k_t, T)
        # one batched assembly instead of T unrolled small-op chains (same
        # math and keys; vmap keeps XLA from scheduling T tiny pipelines)
        per = jax.vmap(
            lambda key, t: sample_target(key, c2w_live, t, window)
        )(keys, jnp.arange(T))
        gt_c, gt_d, gt_l, rays_d, z, pts, refer_w2c, inside = per

        # one flat gather for all T frames x R views (see sample_target doc)
        code = match_features_batched(
            params, pts.reshape(T, n_ray * S, 3), refer_w2c,
            window["refer_feats"], cfg.cam, window["bound"], spec,
            compute_dtype, taps=cfg.feature_taps,
        ).reshape(T, n_ray, S, -1)
        front = z < gt_d[..., None] * 0.95
        back = z > gt_d[..., None] * 1.05
        trunc = (~front) & (~back) & (gt_d[..., None] > 0)
        code = code * trunc[..., None]

        gt_c, gt_d, gt_l, rays_d, z, pts, code, inside = (
            p.reshape((T * n_ray,) + p.shape[2:])
            for p in (gt_c, gt_d, gt_l, rays_d, z, pts, code, inside)
        )

        out = render_fine(
            params, spec, pts, z, rays_d, gt_l.astype(jnp.int32), code,
            window["bound"], compute_dtype,
        )
        if cfg.smooth_every > 1:
            # lax.cond executes only the taken branch: off-iterations skip
            # the subgrid encode+MLP entirely; the k-scaling keeps the
            # expected per-keystep penalty identical
            sm_loss = jax.lax.cond(
                it % cfg.smooth_every == 0,
                lambda _: tv_smoothness_loss(
                    smoothness_grid_occ(
                        params, spec, window["bound"], k_sm, cfg, compute_dtype
                    )
                ) * float(cfg.smooth_every),
                lambda _: 0.0,
                None,
            )
        else:
            # NOTE: folding the sub-grid into the ray batch's encode+coarse
            # pass was tried and measured SLOWER (keystep 2.92 -> 3.05 s on
            # v5e): the output slices copy ~50 MB/iter and the combined
            # barrier-saved residuals grow; two separate passes win.
            occ_grid = smoothness_grid_occ(
                params, spec, window["bound"], k_sm, cfg, compute_dtype
            )
            sm_loss = tv_smoothness_loss(occ_grid)

        mask = inside
        if "frame_valid" in window:
            mask = mask & (jnp.repeat(window["frame_valid"], n_ray) > 0)
        p_loss = photometric_loss(gt_c, out.color, mask)
        d_loss = depth_l1_loss(gt_d, out.depth, mask)
        l_loss = semantic_ce_loss(gt_l, out.logits, mask)
        lt_loss = latent_distill_loss(
            out.coarse_latents, out.fine_latents, mask[:, None, None]
        )
        fs_loss, op_loss = freespace_opacity_loss(
            z, gt_d, out.fine_latents[..., 0], mask,
            truncation=cfg.truncation, sigma=cfg.opacity_sigma,
        )

        lambda_lt = jnp.where(it > window["lt_gate_iter"], 10.0, 0.0)
        loss = (
            cfg.lambda_p * p_loss
            + cfg.lambda_d * d_loss
            + cfg.lambda_l * l_loss
            + lambda_lt * lt_loss
            + cfg.lambda_sm * sm_loss
            + cfg.lambda_fs * fs_loss
            + cfg.lambda_op * op_loss
        )
        aux = {
            "p_loss": p_loss, "d_loss": d_loss, "l_loss": l_loss,
            "lt_loss": lt_loss, "sm_loss": sm_loss,
            "fs_loss": fs_loss, "op_loss": op_loss,
            # one-buffer copy of the scalars the driver logs per keystep:
            # each device->host fetch is a full tunnel roundtrip
            "packed": jnp.stack(
                [p_loss, d_loss, l_loss, lt_loss]
            ).astype(jnp.float32),
        }
        return loss, aux

    return loss_fn


# Process-global program caches: every key is the FULL static configuration
# (frozen all-scalar dataclasses + ints + dtype), so two entries collide only
# when the built programs are identical. Placement is not part of the key on
# purpose — a cached jitted callable re-specializes per input sharding/device
# inside jax.jit's own executable cache.
_MAP_STEP_MEMO: dict = {}
_GLOBAL_CHUNK_CACHE: dict = {}


def make_map_fn(
    spec: DecoderSpec,
    cfg: MapConfig,
    n_target: int,
    n_iters: int,
    compute_dtype=jnp.bfloat16,
    chunk: int = 0,
    _chunk_cache: dict | None = None,
):
    """Build the jitted mapping keystep for a window of ``n_target`` frames
    (see _build_loss_fn for the window layout).

    ``chunk``: max optimization iterations per device dispatch. 0 (default)
    runs the whole keystep as one ``lax.scan`` dispatch. A positive chunk
    (must divide n_iters) splits the keystep into n_iters/chunk dispatches
    carrying the Adam state and the per-iteration PRNG keys across them —
    the optimization trajectory is IDENTICAL (same keys, same Adam state,
    same iteration indices for the lt gate); only the dispatch length is
    bounded. Needed for slow configs on remote/preemptible workers that kill
    long single dispatches (e.g. the reference-parity 8-corner profile at
    the 680x1200 gate shape: ~0.9 s/iter -> a 100-iter dispatch exceeds the
    worker's tolerance; see mapping.max_iters_per_dispatch).

    ``_chunk_cache``: optional dict shared across make_map_fn calls — the
    jitted chunk program is cached per full static config, so DIFFERENT
    n_iters values (the 500-iter first keystep and the 100-iter steady
    state, reference mapping.py:1020-1038) share ONE compiled program
    instead of costing a 30-70 s XLA compile each. When omitted, a
    process-global cache is used, so separate DNSSLAM instances with
    identical static configuration (fresh drivers in one process: tests,
    notebooks, resumed runs) also share programs."""
    chunk = min(chunk, n_iters)
    if chunk <= 0:
        memo_key = (spec, cfg, n_target, n_iters, compute_dtype)
        if memo_key in _MAP_STEP_MEMO:
            return _MAP_STEP_MEMO[memo_key]
    loss_fn = _build_loss_fn(spec, cfg, n_target, compute_dtype)
    opt = optax.multi_transform(
        {
            "net": optax.adam(cfg.lr),
            "pose": optax.adam(cfg.ba_cam_lr),
        },
        ("net", "pose", "pose"),
    )

    def scan_iters(opt_params, opt_state, window, its, keys):
        pose_train = window["pose_train"]  # (T,)

        def step(carry, xs):
            opt_params, opt_state = carry
            it, key = xs
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                opt_params, key, it, window
            )
            gp, gq, gT = grads
            gq = gq * pose_train[:, None]
            gT = gT * pose_train[:, None]
            updates, opt_state = opt.update((gp, gq, gT), opt_state)
            opt_params = optax.apply_updates(opt_params, updates)
            return (opt_params, opt_state), (loss, aux)

        return jax.lax.scan(step, (opt_params, opt_state), (its, keys))

    # chunk == n_iters is a single dispatch THROUGH the chunked program —
    # kept distinct from chunk=0 so a 50-iter steady keystep shares the
    # compiled (n_target, 50) chunk_step with the 500-iter first keystep
    # instead of compiling a second whole-keystep program.
    if chunk <= 0:

        @jax.jit
        def map_step(params, quads0, Ts0, window, key):
            opt_params = (params, quads0, Ts0)
            opt_state = opt.init(opt_params)
            keys = jax.random.split(key, n_iters)
            its = jnp.arange(n_iters)
            (opt_params, _), (losses, auxs) = scan_iters(
                opt_params, opt_state, window, its, keys
            )
            params, quads, Ts = opt_params
            final_aux = jax.tree_util.tree_map(lambda a: a[-1], auxs)
            final_aux["losses"] = losses
            return params, quads, Ts, final_aux

        _MAP_STEP_MEMO[memo_key] = map_step
        return map_step

    if n_iters % chunk != 0:
        raise ValueError(f"chunk {chunk} must divide n_iters {n_iters}")

    if _chunk_cache is None:
        _chunk_cache = _GLOBAL_CHUNK_CACHE
    cache_key = (spec, cfg, n_target, chunk, compute_dtype)
    if _chunk_cache is not None and cache_key in _chunk_cache:
        chunk_step, init_fn = _chunk_cache[cache_key]
    else:

        @jax.jit
        def chunk_step(opt_params, opt_state, window, its, keys):
            (opt_params, opt_state), (losses, auxs) = scan_iters(
                opt_params, opt_state, window, its, keys
            )
            final_aux = jax.tree_util.tree_map(lambda a: a[-1], auxs)
            return opt_params, opt_state, losses, final_aux

        # one fused dispatch for the Adam-state init: the eager opt.init
        # would issue one tiny device op per param leaf, which adds up at
        # remote-tunnel dispatch latencies now that EVERY keystep routes
        # through this wrapper
        init_fn = jax.jit(opt.init)

        if _chunk_cache is not None:
            _chunk_cache[cache_key] = (chunk_step, init_fn)

    def map_step(params, quads0, Ts0, window, key):
        opt_params = (params, quads0, Ts0)
        opt_state = init_fn(opt_params)
        keys = jax.random.split(key, n_iters)
        its = jnp.arange(n_iters)
        loss_parts, final_aux = [], None
        for c in range(n_iters // chunk):
            s = slice(c * chunk, (c + 1) * chunk)
            opt_params, opt_state, losses, final_aux = chunk_step(
                opt_params, opt_state, window, its[s], keys[s]
            )
            loss_parts.append(losses)
        params, quads, Ts = opt_params
        final_aux["losses"] = jnp.concatenate(loss_parts)
        return params, quads, Ts, final_aux

    return map_step


_DECODER_INIT_MEMO: dict = {}


def make_decoder_init_fn(
    spec: DecoderSpec, cfg: MapConfig, n_iters: int = 100, n_pixels: int = 300,
    compute_dtype=jnp.bfloat16,
):
    """Warm-up for newly-seen semantic classes (reference: mapping.py:764-836):
    n_iters steps on class-restricted rays of the current frame, full loss
    minus distillation, optimizing net params only."""
    memo_key = (spec, cfg, n_iters, n_pixels, compute_dtype)
    if memo_key in _DECODER_INIT_MEMO:
        return _DECODER_INIT_MEMO[memo_key]
    S = cfg.n_samples + cfg.n_surface

    def loss_fn(params, key, frame, class_mask):
        k_pix, k_z, k_sm = jax.random.split(key, 3)
        colorf = frame["color"].reshape(-1, 3)
        depthf = frame["depth"].reshape(-1)
        labelf = frame["label"].reshape(-1)

        pix = sample_restricted_class_pixels(
            k_pix, n_pixels, frame["sorted_idx"], frame["offsets"], class_mask
        )
        gt_c, gt_d, gt_l = colorf[pix], depthf[pix], labelf[pix]
        i = (pix % cfg.W).astype(jnp.float32)
        j = (pix // cfg.W).astype(jnp.float32)
        rays_o, rays_d = rays_from_uv(
            i, j, frame["c2w"], cfg.fx, cfg.fy, cfg.cx, cfg.cy
        )
        far = ray_box_far(rays_o, rays_d, frame["bound"])
        inside = far >= gt_d
        far = far + 0.01
        z = sample_along_rays(k_z, gt_d, cfg.n_samples, cfg.n_surface, far)
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z[:, :, None]

        w2c = invert_se3(frame["c2w"])[None]
        code = match_features(
            params, pts.reshape(-1, 3), w2c, frame["feats"],
            cfg.cam, frame["bound"], spec, compute_dtype, taps=cfg.feature_taps,
        ).reshape(n_pixels, S, -1)
        front = z < gt_d[:, None] * 0.95
        back = z > gt_d[:, None] * 1.05
        trunc = (~front) & (~back) & (gt_d[:, None] > 0)
        code = code * trunc[..., None]

        out = render_fine(
            params, spec, pts, z, rays_d, gt_l.astype(jnp.int32), code,
            frame["bound"], compute_dtype,
        )
        mask = (gt_d > 0.01) & inside
        p_loss = photometric_loss(gt_c, out.color, mask)
        d_loss = depth_l1_loss(gt_d, out.depth, mask)
        l_loss = semantic_ce_loss(gt_l, out.logits, mask)
        occ_grid = smoothness_grid_occ(
            params, spec, frame["bound"], k_sm, cfg, compute_dtype
        )
        sm_loss = tv_smoothness_loss(occ_grid)
        fs_loss, op_loss = freespace_opacity_loss(
            z, gt_d, out.fine_latents[..., 0], mask,
            truncation=cfg.truncation, sigma=cfg.opacity_sigma,
        )
        return (
            cfg.lambda_p * p_loss + cfg.lambda_d * d_loss + cfg.lambda_l * l_loss
            + cfg.lambda_fs * fs_loss + cfg.lambda_op * op_loss
            + cfg.lambda_sm * sm_loss
        )

    opt = optax.adam(cfg.lr)

    @jax.jit
    def decoder_init(params, frame, class_mask, key):
        opt_state = opt.init(params)

        def step(carry, key):
            params, opt_state = carry
            loss, g = jax.value_and_grad(loss_fn)(params, key, frame, class_mask)
            updates, opt_state = opt.update(g, opt_state)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        keys = jax.random.split(key, n_iters)
        (params, _), losses = jax.lax.scan(step, (params, opt_state), keys)
        return params, losses

    _DECODER_INIT_MEMO[memo_key] = decoder_init
    return decoder_init


_OVERLAP_FN_MEMO: dict = {}


def make_overlap_score_fn(cfg: MapConfig, n_pixels: int = 100, n_samples: int = 16):
    """Keyframe overlap ranking (reference: mapping.py:171-236): sample rays
    of the current view, lift 16 depth-bracketed points each, project into
    every keyframe, and score by the fraction inside the frustum."""
    memo_key = (cfg, n_pixels, n_samples)
    if memo_key in _OVERLAP_FN_MEMO:
        return _OVERLAP_FN_MEMO[memo_key]

    @jax.jit
    def overlap_scores(depth, c2w, kf_est_c2w, kf_valid, key):
        k_pix, k_dummy = jax.random.split(key)
        depthf = depth.reshape(-1)
        pix = sample_uniform_pixels(k_pix, n_pixels, cfg.H, cfg.W)
        gt_d = depthf[pix]
        i = (pix % cfg.W).astype(jnp.float32)
        j = (pix // cfg.W).astype(jnp.float32)
        rays_o, rays_d = rays_from_uv(i, j, c2w, cfg.fx, cfg.fy, cfg.cx, cfg.cy)
        t = jnp.linspace(0.0, 1.0, n_samples)
        near = gt_d[:, None] * 0.8
        far = gt_d[:, None] + 0.5
        z = near * (1 - t[None]) + far * t[None]
        pts = (rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]).reshape(-1, 3)

        w2c = invert_se3(kf_est_c2w)  # (K,4,4)
        from dnsjax.geometry.rays import world_to_camera, project_points

        cam_pts = world_to_camera(pts, w2c)  # (K,P,3)
        u, v, d = project_points(cam_pts, cfg.fx, cfg.fy, cfg.cx, cfg.cy)
        edge = 10
        ok = (
            (u > edge) & (u < cfg.W - edge) & (v > edge) & (v < cfg.H - edge) & (d > 0)
        )
        score = jnp.mean(ok.astype(jnp.float32), axis=1)  # (K,)
        return jnp.where(kf_valid, score, -1.0)

    _OVERLAP_FN_MEMO[memo_key] = overlap_scores
    return overlap_scores
