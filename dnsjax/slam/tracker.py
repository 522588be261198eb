"""Camera tracking (front end): per-frame pose optimization.

Counterpart of the reference ``Tracker`` (reference: slams/tracking.py).
The reference runs 50 Python-level Adam steps per frame, each re-sampling
pixels, re-rendering the coarse field, and keeping the min-loss pose
candidate (tracking.py:313-340). dnsjax compiles the whole per-frame
optimization into ONE device program: a ``lax.scan`` over iterations with
the Adam state, the running best-loss candidate, and the PRNG key in the
carry — so a frame costs one host->device dispatch instead of 50+ (the
remote-TPU tunnel makes per-step dispatch ~0.3s; see .claude/skills/verify).

Gradient flow matches the reference: pose gradients reach the loss through
both the ray origins/directions and the projection of sample points into
the *current* view for 2D feature matching (tracking.py:316-322).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from dnsjax.geometry.rays import rays_from_uv, ray_box_far
from dnsjax.geometry.se3 import quat_to_rotation, compose_c2w, invert_se3
from dnsjax.losses import (
    photometric_loss,
    depth_var_loss,
    semantic_ce_loss,
)
from dnsjax.models.decoder import DecoderSpec
from dnsjax.models.features import match_features
from dnsjax.render.pipeline import render_coarse
from dnsjax.render.sampling import sample_along_rays
from dnsjax.slam.sampling import sample_uniform_pixels


@dataclass(frozen=True)
class TrackConfig:
    H: int
    W: int
    fx: float
    fy: float
    cx: float
    cy: float
    n_iters: int = 50
    n_pixels: int = 500
    n_samples: int = 32
    n_surface: int = 15
    ignore_edge: int = 20
    cam_lr: float = 1e-3
    separate_lr: bool = False
    # Adam's normalized steps random-walk ~cam_lr*sqrt(n_iters) around the
    # loss minimum. Measured on the synthetic scene: the min-loss-candidate
    # mechanism plus CONSTANT lr beats decay (the candidate keeps sampling
    # near the optimum all scan long), and the effective stabilizer is the
    # per-iteration ray count (drift 0.0054 @ 200 rays vs 0.0020 @ 1000 rays)
    # — rays are nearly free on TPU, so the TPU profile raises
    # tracking.n_pixels instead of decaying. 1.0 = constant lr (default).
    lr_decay: float = 1.0
    feature_taps: int = 4  # 1 = nearest half-res tap (see models/features.py)
    # Early exit: stop the pose optimization once the best loss hasn't
    # improved for `patience` iterations (0 = reference behavior, always run
    # all n_iters). The scan still compiles for n_iters; converged frames
    # skip the remaining iterations' compute via lax.while_loop.
    patience: int = 0
    # Pose optimizer. "adam": the reference's first-order schedule
    # (n_iters steps, per-iteration ray resampling, tracking.py:313-340).
    # "lm": Levenberg-Marquardt on the photometric + depth residuals — a
    # second-order TPU-first alternative: ONE fixed ray batch per frame,
    # lm_iters damped Gauss-Newton steps, each costing one jax.linearize
    # (primal + 7 tangent passes, batched in-program) plus one trial
    # forward. The 7x7 normal equations make pose curvature explicit, so
    # ~8-12 iterations replace 50 first-order ones. Quality must be A/B
    # gated (scripts/ab_quality.py) before becoming a profile default.
    method: str = "adam"
    lm_iters: int = 10
    # Early exit for the LM path, same candidate semantics as `patience`:
    # stop once the min-loss candidate hasn't improved for lm_patience
    # consecutive iterations (0 = always run all lm_iters). Converged
    # frames skip the remaining linearizations via lax.while_loop.
    lm_patience: int = 0
    lm_lambda0: float = 1e-3   # initial LM damping (scaled by diag(JtJ))
    lm_up: float = 5.0         # damping multiplier on a rejected step
    lm_down: float = 0.5       # damping multiplier on an accepted step
    lambda_p: float = 5.0
    lambda_d: float = 5.0
    lambda_l: float = 0.1

    @property
    def cam(self):
        return dict(H=self.H, W=self.W, fx=self.fx, fy=self.fy, cx=self.cx, cy=self.cy)


def make_pose_optimizer(cfg: TrackConfig) -> optax.GradientTransformation:
    """Adam over the (quad, T) tuple; ``seperate_LR`` scales T's lr by 0.2
    (reference: tracking.py:119-124). The lr decays exponentially to
    ``cam_lr * lr_decay`` over the n_iters scan (see TrackConfig.lr_decay)."""

    def sched(base):
        if cfg.lr_decay >= 1.0:
            return base
        return optax.exponential_decay(
            base, cfg.n_iters, cfg.lr_decay, staircase=False
        )

    if cfg.separate_lr:
        return optax.multi_transform(
            {"quad": optax.adam(sched(cfg.cam_lr)),
             "T": optax.adam(sched(cfg.cam_lr * 0.2))},
            ("quad", "T"),
        )
    return optax.adam(sched(cfg.cam_lr))


_TRACK_FN_MEMO: dict = {}


def make_track_fn(
    spec: DecoderSpec, cfg: TrackConfig, compute_dtype=jnp.bfloat16, mesh=None,
):
    """Build the jitted per-frame tracking function.

    Returns track(params, enc_feats, refer_w2c, color, depth, label, quad0,
    T0, bound, key) -> (best_quad, best_T, metrics dict).

    ``mesh``: optional 1-D jax.sharding.Mesh with axis 'dp'. When given, the
    pose optimization is data-parallel over rays: every device samples its
    own cfg.n_pixels rays (per-device PRNG fold) and losses/gradients are
    pmean'd each iteration before the identical replicated Adam update and
    min-loss-candidate bookkeeping — equivalent to one n_devices*n_pixels
    ray batch per iteration (same design as parallel.mesh.make_map_fn_dp).
    """
    if cfg.method not in ("adam", "lm"):
        raise ValueError(f"tracking.method={cfg.method!r}: expected adam|lm")
    # Process-global memo (single-device path): fresh drivers with the same
    # static config (frozen all-scalar dataclasses) share one jitted track
    # program instead of each paying its XLA compile.
    memo_key = (spec, cfg, compute_dtype) if mesh is None else None
    if memo_key is not None and memo_key in _TRACK_FN_MEMO:
        return _TRACK_FN_MEMO[memo_key]
    opt = make_pose_optimizer(cfg)
    S = cfg.n_samples + cfg.n_surface

    def forward(qt, params, enc_feats, refer_w2c, colorf, depthf, labelf, bound, key):
        """Shared batch assembly + coarse render at pose ``qt``. Returns
        (out, gt_c, gt_d, gt_l, mask)."""
        quad, T = qt
        k_pix, k_z = jax.random.split(key)
        R = quat_to_rotation(quad)
        c2w = compose_c2w(R, T)
        w2c = invert_se3(c2w)

        pix = sample_uniform_pixels(
            k_pix, cfg.n_pixels, cfg.H, cfg.W, cfg.ignore_edge, cfg.ignore_edge
        )
        gt_c = colorf[pix]
        gt_d = depthf[pix]
        gt_l = labelf[pix]
        i = (pix % cfg.W).astype(jnp.float32)
        j = (pix // cfg.W).astype(jnp.float32)
        rays_o, rays_d = rays_from_uv(i, j, c2w, cfg.fx, cfg.fy, cfg.cx, cfg.cy)

        far = ray_box_far(
            jax.lax.stop_gradient(rays_o), jax.lax.stop_gradient(rays_d), bound
        )
        inside = far >= gt_d
        far = far + 0.01

        z = sample_along_rays(k_z, gt_d, cfg.n_samples, cfg.n_surface, far)
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z[:, :, None]

        # 2D features from [frozen reference view, live current view]
        w2c_stack = jnp.stack([refer_w2c, w2c], 0)
        code = match_features(
            params, pts.reshape(-1, 3), w2c_stack, enc_feats,
            cfg.cam, bound, spec, compute_dtype, taps=cfg.feature_taps,
        ).reshape(cfg.n_pixels, S, -1)

        # truncation mask: zero 2D features outside +-5% of sensor depth
        # (reference: tracking.py:167-171)
        front = z < gt_d[:, None] * 0.95
        back = z > gt_d[:, None] * 1.05
        trunc = (~front) & (~back) & (gt_d[:, None] > 0)
        code = code * trunc[..., None]

        out = render_coarse(params, spec, pts, z, rays_d, code, bound, compute_dtype)
        mask = (gt_d > 0.01) & inside
        return out, gt_c, gt_d, gt_l, mask

    def losses_from(out, gt_c, gt_d, gt_l, mask):
        p = photometric_loss(gt_c, out.color, mask)
        d = depth_var_loss(gt_d, out.depth, out.depth_var, mask)
        l = semantic_ce_loss(gt_l, out.logits, mask)
        loss = cfg.lambda_p * p + cfg.lambda_d * d + cfg.lambda_l * l
        return loss, (p, d)

    def loss_fn(qt, params, enc_feats, refer_w2c, colorf, depthf, labelf, bound, key):
        out, gt_c, gt_d, gt_l, mask = forward(
            qt, params, enc_feats, refer_w2c, colorf, depthf, labelf, bound, key
        )
        return losses_from(out, gt_c, gt_d, gt_l, mask)

    def resid_fn(qt, params, enc_feats, refer_w2c, colorf, depthf, labelf, bound, key):
        """Weighted residual vector for LM: ||r||^2 == lambda_p * p + an
        IRLS quadratic surrogate of the depth-variance L1 term. The CE
        semantic term (lambda_l = 0.1) is excluded from the normal
        equations but kept in the aux scalar loss used for step
        accept/reject and the min-loss candidate.

        Traced under jax.linearize (forward mode), so the grid encode is
        routed through the JVP-differentiable plain-autodiff variant via
        the decoder's trace-time grid_encode_override hook (hash_encode is
        a custom_vjp, which forward-mode cannot pierce; same hook pattern
        as parallel/tp.py)."""
        from dnsjax.models.decoder import grid_encode_override
        from dnsjax.ops.hashgrid import hash_encode_fwd_mode

        with grid_encode_override(hash_encode_fwd_mode):
            out, gt_c, gt_d, gt_l, mask = forward(
                qt, params, enc_feats, refer_w2c, colorf, depthf, labelf,
                bound, key
            )
        m = mask.astype(jnp.float32)
        n_valid = jnp.sum(m) + 1e-8

        e_c = (out.color - gt_c) * m[:, None]              # (N, 3)
        r_p = jnp.sqrt(cfg.lambda_p / (3.0 * n_valid)) * e_c

        e_d = (out.depth - gt_d) * m                       # (N,)
        s = jnp.sqrt(out.depth_var + 1e-10)
        # IRLS weight for |e|/s: w = 1/(s*(|e|+delta)) so w*e^2 ~ |e|/s;
        # weights are frozen per linearization (stop_gradient)
        w_d = jax.lax.stop_gradient(
            cfg.lambda_d * m / (s * (jnp.abs(e_d) + 1e-3) * n_valid)
        )
        r_d = jnp.sqrt(w_d) * e_d

        r = jnp.concatenate([r_p.reshape(-1), r_d])
        return r, losses_from(out, gt_c, gt_d, gt_l, mask)

    def track_body(params, enc_feats, refer_w2c, color, depth, label, quad0, T0, bound, key):
        colorf = color.reshape(-1, 3)
        depthf = depth.reshape(-1)
        labelf = label.reshape(-1)
        qt0 = (quad0, T0)
        opt_state = opt.init(qt0)
        if mesh is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index("dp"))
        keys = jax.random.split(key, cfg.n_iters)

        def one_iter(qt, opt_state, best_loss, best_qt, best_pd, key):
            (loss, pd), g = jax.value_and_grad(loss_fn, has_aux=True)(
                qt, params, enc_feats, refer_w2c, colorf, depthf, labelf, bound, key
            )
            if mesh is not None:
                loss = jax.lax.pmean(loss, "dp")
                pd = jax.tree_util.tree_map(
                    lambda a: jax.lax.pmean(a, "dp"), pd
                )
                g = jax.tree_util.tree_map(lambda a: jax.lax.pmean(a, "dp"), g)
            # min-loss candidate is the pose *at which* the loss was
            # evaluated, before this update (reference: tracking.py:331-336)
            better = loss < best_loss
            best_loss = jnp.where(better, loss, best_loss)
            best_qt = jax.tree_util.tree_map(
                lambda new, old: jnp.where(better, new, old), qt, best_qt
            )
            best_pd = jax.tree_util.tree_map(
                lambda new, old: jnp.where(better, new, old), pd, best_pd
            )
            updates, opt_state = opt.update(g, opt_state)
            qt = optax.apply_updates(qt, updates)
            return qt, opt_state, best_loss, best_qt, best_pd, loss, better

        if cfg.patience <= 0:
            def step(carry, key):
                qt, opt_state, best_loss, best_qt, best_pd = carry
                qt, opt_state, best_loss, best_qt, best_pd, loss, _ = one_iter(
                    qt, opt_state, best_loss, best_qt, best_pd, key
                )
                return (qt, opt_state, best_loss, best_qt, best_pd), loss

            init = (qt0, opt_state, jnp.inf, qt0, (jnp.inf, jnp.inf))
            (qt, _, best_loss, best_qt, best_pd), losses = jax.lax.scan(
                step, init, keys
            )
            n_done = jnp.asarray(cfg.n_iters)
        else:
            def cond(state):
                it, since, *_ = state
                return (it < cfg.n_iters) & (since < cfg.patience)

            def body(state):
                it, since, qt, opt_state, best_loss, best_qt, best_pd = state
                qt, opt_state, best_loss, best_qt, best_pd, loss, better = one_iter(
                    qt, opt_state, best_loss, best_qt, best_pd, keys[it]
                )
                since = jnp.where(better, 0, since + 1)
                return (it + 1, since, qt, opt_state, best_loss, best_qt, best_pd)

            state = (jnp.asarray(0), jnp.asarray(0), qt0, opt_state,
                     jnp.inf, qt0, (jnp.inf, jnp.inf))
            it, _, qt, _, best_loss, best_qt, best_pd = jax.lax.while_loop(
                cond, body, state
            )
            losses = jnp.full((cfg.n_iters,), jnp.nan)
            n_done = it

        best_quad, best_T = best_qt
        return best_quad, best_T, _metrics(
            best_qt, best_loss, best_pd, losses, n_done
        )

    def _metrics(best_qt, best_loss, best_pd, losses, n_done):
        best_quad, best_T = best_qt
        return {
            "best_loss": best_loss,
            "p_loss": best_pd[0],
            "d_loss": best_pd[1],
            "losses": losses,
            "n_iters_run": n_done,
            # everything the driver needs per frame as ONE buffer: through
            # the remote-TPU tunnel each device->host fetch is a full
            # roundtrip, so the driver reads this single vector instead of
            # 5-6 separate scalars/arrays (host numpy does the quat->c2w)
            "packed": jnp.concatenate(
                [
                    best_quad.astype(jnp.float32),
                    best_T.astype(jnp.float32),
                    jnp.stack([best_loss, best_pd[0], best_pd[1]]).astype(
                        jnp.float32
                    ),
                ]
            ),
        }

    def track_body_lm(params, enc_feats, refer_w2c, color, depth, label,
                      quad0, T0, bound, key):
        """Levenberg-Marquardt pose solve (cfg.method == "lm").

        Each iteration resamples its ray batch (like the Adam path), then:
        linearize the weighted residual vector at the current pose (primal
        + 7 batched tangent passes), form the 7x7 normal equations, damp
        Marquardt-style (lambda * diag), solve, and accept/reject the trial
        pose by the full scalar loss (which keeps the semantic CE term the
        normal equations exclude) evaluated on the SAME batch — within an
        iteration the comparison is deterministic, across iterations the
        batches average out sampling noise. Min-loss-candidate semantics
        match the Adam path."""
        colorf = color.reshape(-1, 3)
        depthf = depth.reshape(-1)
        labelf = label.reshape(-1)
        if mesh is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index("dp"))
        args = (params, enc_feats, refer_w2c, colorf, depthf, labelf, bound)

        eye = jnp.eye(7, dtype=jnp.float32)
        basis = (eye[:, :4], eye[:, 4:])  # tangents for (quad, T)

        def pmean_all(tree):
            if mesh is None:
                return tree
            return jax.tree_util.tree_map(
                lambda a: jax.lax.pmean(a, "dp"), tree
            )

        def eval_loss(qt, k):
            # evaluate through resid_fn's aux, NOT loss_fn: resid_fn routes
            # the encode through the forward-mode (xla-gather) variant, so
            # accept/reject compares losses from ONE encode backend even
            # when spec.gather == "pallas" (the two backends differ at the
            # 1e-5 level — enough to flip near-tie decisions). XLA DCEs the
            # unused residual outputs.
            _, (loss, pd) = resid_fn(qt, *args, k)
            return pmean_all((loss, pd))

        def lm_iter(carry, k):
            qt, lam, best_loss, best_qt, best_pd = carry
            r, f_jvp, (loss, pd) = jax.linearize(
                lambda q: resid_fn(q, *args, k), qt, has_aux=True
            )
            J = jax.vmap(f_jvp)(basis)            # (7, m)
            JTJ, JTr, loss, pd = pmean_all(
                (J @ J.T, J @ r, loss, pd)
            )

            # min-loss candidate at the pose the loss was EVALUATED at
            better = loss < best_loss
            best_loss = jnp.where(better, loss, best_loss)
            best_qt = jax.tree_util.tree_map(
                lambda new, old: jnp.where(better, new, old), qt, best_qt
            )
            best_pd = jax.tree_util.tree_map(
                lambda new, old: jnp.where(better, new, old), pd, best_pd
            )

            A = (
                JTJ
                + lam * jnp.diag(jnp.diagonal(JTJ))
                + 1e-8 * jnp.eye(7, dtype=JTJ.dtype)
            )
            delta = -jnp.linalg.solve(A, JTr)
            # renormalize the quat: quat_to_rotation is scale-invariant, so
            # the raw quat has a gauge (null) direction the solve can drift
            # along; projecting back to the unit sphere keeps the SAME pose
            # while keeping the linearization point (and the raw-parameter
            # trajectory) well-conditioned
            quad_new = qt[0] + delta[:4]
            quad_new = quad_new / jnp.linalg.norm(quad_new)
            qt_new = (quad_new, qt[1] + delta[4:])
            new_loss, _ = eval_loss(qt_new, k)

            accept = new_loss < loss
            qt = jax.tree_util.tree_map(
                lambda new, old: jnp.where(accept, new, old), qt_new, qt
            )
            lam = jnp.clip(
                jnp.where(accept, lam * cfg.lm_down, lam * cfg.lm_up),
                1e-7, 1e7,
            )
            return (qt, lam, best_loss, best_qt, best_pd), loss, better

        qt0 = (quad0, T0)
        keys = jax.random.split(key, cfg.lm_iters + 1)
        init = (qt0, jnp.asarray(cfg.lm_lambda0, jnp.float32),
                jnp.inf, qt0, (jnp.inf, jnp.inf))
        if cfg.lm_patience <= 0:
            def scan_step(carry, k):
                carry, loss, _ = lm_iter(carry, k)
                return carry, loss

            (qt, _, best_loss, best_qt, best_pd), losses = jax.lax.scan(
                scan_step, init, keys[:-1]
            )
            n_done = jnp.asarray(cfg.lm_iters)
        else:
            # same early-exit semantics as the Adam path's `patience`:
            # stop once the min-loss candidate stops improving
            def cond(state):
                it, since, _ = state
                return (it < cfg.lm_iters) & (since < cfg.lm_patience)

            def body(state):
                it, since, carry = state
                carry, _, better = lm_iter(carry, keys[it])
                since = jnp.where(better, 0, since + 1)
                return (it + 1, since, carry)

            it, _, (qt, _, best_loss, best_qt, best_pd) = jax.lax.while_loop(
                cond, body, (jnp.asarray(0), jnp.asarray(0), init)
            )
            losses = jnp.full((cfg.lm_iters,), jnp.nan)
            n_done = it

        # the final accepted pose was never loss-evaluated inside the scan;
        # give it a shot at the candidate slot
        loss_f, pd_f = eval_loss(qt, keys[-1])
        better = loss_f < best_loss
        best_loss = jnp.where(better, loss_f, best_loss)
        best_qt = jax.tree_util.tree_map(
            lambda new, old: jnp.where(better, new, old), qt, best_qt
        )
        best_pd = jax.tree_util.tree_map(
            lambda new, old: jnp.where(better, new, old), pd_f, best_pd
        )

        best_quad, best_T = best_qt
        return best_quad, best_T, _metrics(
            best_qt, best_loss, best_pd, losses, n_done
        )

    track_impl = track_body_lm if cfg.method == "lm" else track_body

    if mesh is None:
        fn = jax.jit(track_impl)
        _TRACK_FN_MEMO[memo_key] = fn
        return fn

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    sharded = shard_map(
        track_impl,
        mesh=mesh,
        in_specs=(P(),) * 10,
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def pose_init_const_velocity(
    est_c2w_list: np.ndarray, idx: int, const_speed: bool = True
) -> np.ndarray:
    """Constant-velocity pose initialization (reference: tracking.py:216-227)."""
    pre = est_c2w_list[idx - 1]
    if const_speed and idx > 2:
        delta = pre @ np.linalg.inv(est_c2w_list[idx - 2])
        return (delta @ pre).astype(np.float32)
    return pre.astype(np.float32)
