"""Tensor parallelism: row-sharded hash-table encode over a 'tp' mesh axis.

The hash table is the model's dominant parameter tensor (e.g. ScanNet
profile 16 x 2^20 x 2). This module shards its ROW axis across the 'tp'
mesh dimension, Megatron-embedding style: every device computes all corner
indices (replicated math), gathers only the rows it owns (masked local
lookup), and the partial interpolated features are ``psum``'d over 'tp'.
The backward is collective-free for the table — each shard scatters only
into its own row range (the stochastic-corner RNG is index-hash driven,
so all shards sample the SAME corner and its row lands on exactly one
shard) — and the position gradient is ``psum``'d like the forward.

The reference has no equivalent (single-GPU tcnn; its NCCL helpers are
dead code — reference: utils/common.py:79-162). This is the TPU-native
scale-out for tables beyond one chip's HBM/VMEM budget, composing with
data-parallel ray sharding (parallel/mesh.py) on a ('dp', 'tp') mesh:
rays fold the key along 'dp'; shards along 'tp' see identical rays.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from dnsjax.models.decoder import DecoderSpec
from dnsjax.ops.hashgrid import (
    HashGridSpec,
    _corner_indices_weights,
    _position_grad,
    _table_grad_contribs,
)
from dnsjax.slam import mapper as _mapper


def dp_tp_mesh(n_dp: int, n_tp: int) -> Mesh:
    """A ('dp', 'tp') mesh over the first n_dp * n_tp devices."""
    devs = np.array(jax.devices()[: n_dp * n_tp]).reshape(n_dp, n_tp)
    return Mesh(devs, ("dp", "tp"))


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def hash_encode_tp(
    table_local: jnp.ndarray,
    pts: jnp.ndarray,
    spec: HashGridSpec,
    axis: str = "tp",
) -> jnp.ndarray:
    """hash_encode against a row-sharded table; call under shard_map.

    Args:
      table_local: (L, T/n, F) this shard's row range of every level
        (shard r owns rows [r*T/n, (r+1)*T/n)).
      pts: (..., 3) in [0,1]^3, replicated along ``axis``.
      spec: FULL-table spec (table_size = T, not T/n).
      axis: mesh axis name the table rows are sharded over.
    Returns:
      (..., L*F) features, identical on every shard (psum'd).

    GRADIENT CAVEAT: take gradients INSIDE the shard_map body (as
    make_map_fn_dp_tp does — loss and grad computed per shard, then
    combined). Differentiating *through* a shard_map boundary built with
    ``check_vma=False`` silently scales the table cotangent by 1/n_shards:
    the psum'd replicated output's incoming cotangent is split across
    shards instead of replicated, and with the varying-manual-axes check
    disabled nothing detects it (verified on a 2-device CPU mesh: outer
    grad = 0.5x the true gradient). With ``check_vma=True`` (default)
    JAX handles the replication correctly.
    """
    out, _ = _tp_fwd(table_local, pts, spec, axis)
    return out


def _local_lookup(table_local, idx, spec: HashGridSpec, axis: str):
    """Masked local gather: feats (N,L,C,F) with zeros for non-owned rows,
    plus the ownership mask. ``idx`` is flat into (L*T) level-major space."""
    Tl = table_local.shape[1]
    lo = jax.lax.axis_index(axis) * Tl
    lvl = idx // spec.table_size  # (N,L,C) — constant per L slice by layout
    row = idx - lvl * spec.table_size
    mine = (row >= lo) & (row < lo + Tl)  # (N,L,C)
    local = jnp.clip(row - lo, 0, Tl - 1) + lvl * Tl
    flat = table_local.reshape(-1, spec.n_features)
    if spec.gather_bf16:
        flat = flat.astype(jnp.bfloat16)
    feats = jnp.take(flat, local.reshape(-1), axis=0).reshape(
        local.shape + (spec.n_features,)
    )
    feats = feats * mine[..., None].astype(feats.dtype)
    return feats, mine


def _tp_fwd(table_local, pts, spec: HashGridSpec, axis: str):
    batch_shape = pts.shape[:-1]
    p = jnp.clip(pts.reshape(-1, 3), 0.0, 1.0)
    idx, w, aux = _corner_indices_weights(p, spec)
    feats, _ = _local_lookup(table_local, idx, spec, axis)
    partial_out = jnp.sum(w[..., None] * feats.astype(w.dtype), axis=2)
    out = jax.lax.psum(partial_out, axis)  # (N,L,F)
    out = out.reshape(batch_shape + (spec.out_dim,))
    # residuals keep the LOCAL (masked) feats: the position gradient's
    # per-shard partial then psums to the exact full-table value
    return out, (pts, idx, w, aux, feats)


def _tp_fwd_vjp(table_local, pts, spec: HashGridSpec, axis: str):
    out, res = _tp_fwd(table_local, pts, spec, axis)
    return out, jax.lax.optimization_barrier(res)


def _tp_bwd(spec: HashGridSpec, axis: str, res, g):
    pts, idx, w, aux, feats = res
    batch_shape = pts.shape[:-1]
    n = idx.shape[0]
    g = g.reshape(n, spec.n_levels, spec.n_features)

    # table gradient: shared contribution logic (identical corner sampling
    # on every shard), scattered into the LOCAL row range only
    scatter_idx, contrib = _table_grad_contribs(spec, idx, w, g)
    L, F, T = spec.n_levels, spec.n_features, spec.table_size
    Tl = T // jax.lax.axis_size(axis)  # axis size is static under shard_map
    lo = jax.lax.axis_index(axis) * Tl
    lvl = scatter_idx // T
    row = scatter_idx - lvl * T
    mine = (row >= lo) & (row < lo + Tl)
    local = jnp.clip(row - lo, 0, Tl - 1) + lvl * Tl
    contrib = contrib * mine[..., None].astype(contrib.dtype)
    d_local = (
        jnp.zeros((L * Tl, F), g.dtype)
        .at[local.reshape(-1)]
        .add(contrib.reshape(-1, F))
        .reshape(L, Tl, F)
    )

    # position gradient: per-shard partial (masked feats) -> psum
    d_p = _position_grad(spec, pts, feats, w, aux, g)
    d_p = jax.lax.psum(d_p, axis)
    return d_local, d_p.reshape(batch_shape + (3,))


hash_encode_tp.defvjp(_tp_fwd_vjp, _tp_bwd)


def make_map_fn_dp_tp(
    spec: DecoderSpec,
    cfg: "_mapper.MapConfig",
    n_target: int,
    n_iters: int,
    mesh: Mesh,
    param_keys,
    compute_dtype=jnp.bfloat16,
):
    """Mapping keystep over a ('dp', 'tp') mesh: data-parallel rays x
    row-sharded hash table. Signature/semantics match make_map_fn, with
    ``params['table']`` sharded (L, T/n_tp, F) per device along 'tp'.

    Ray keys fold along 'dp' only — 'tp' shards of one dp group consume
    identical rays. Grads: table stays shard-local (no collective; the
    encode's psum is the only forward collective and its transpose is
    local), everything else pmean('dp'); MLP grads are already identical
    along 'tp' because the psum'd encode makes all downstream activations
    replicated. Adam is elementwise, so local table updates equal the
    single-chip update of the same rows — the whole keystep is
    numerically identical to make_map_fn_dp.

    ``param_keys``: top-level keys of the params dict (for in/out specs).
    """
    opt = optax.multi_transform(
        {"net": optax.adam(cfg.lr), "pose": optax.adam(cfg.ba_cam_lr)},
        ("net", "pose", "pose"),
    )
    loss_fn = _mapper._build_loss_fn(spec, cfg, n_target, compute_dtype)

    def device_body(params, quads0, Ts0, window, key):
        from dnsjax.models.decoder import grid_encode_override

        # trace-time hook: route the decoder's grid encode through the
        # row-sharded variant for THIS program only (the context manager
        # restores the default on exit; device_body only ever runs under
        # jit tracing)
        with grid_encode_override(
            lambda table, p01, gspec: hash_encode_tp(table, p01, gspec, "tp")
        ):
            dev = jax.lax.axis_index("dp")
            key = jax.random.fold_in(key, dev)
            opt_params = (params, quads0, Ts0)
            opt_state = opt.init(opt_params)
            pose_train = window["pose_train"]

            def step(carry, xs):
                opt_params, opt_state = carry
                it, k = xs
                (loss, aux), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(opt_params, k, it, window)
                gp, gq, gT = grads
                # table grad is shard-local along 'tp' (already exact);
                # every other leaf is replicated along 'tp' -> pmean 'dp'
                gp = jax.tree_util.tree_map(
                    lambda a: jax.lax.pmean(a, "dp"), gp
                )
                gq = jax.lax.pmean(gq, "dp")
                gT = jax.lax.pmean(gT, "dp")
                loss = jax.lax.pmean(loss, "dp")
                aux = jax.tree_util.tree_map(
                    lambda a: jax.lax.pmean(a, "dp"), aux
                )
                gq = gq * pose_train[:, None]
                gT = gT * pose_train[:, None]
                updates, opt_state = opt.update((gp, gq, gT), opt_state)
                opt_params = optax.apply_updates(opt_params, updates)
                return (opt_params, opt_state), (loss, aux)

            keys = jax.random.split(key, n_iters)
            its = jnp.arange(n_iters)
            (opt_params, _), (losses, auxs) = jax.lax.scan(
                step, (opt_params, opt_state), (its, keys)
            )
            params, quads, Ts = opt_params
            final_aux = jax.tree_util.tree_map(lambda a: a[-1], auxs)
            final_aux["losses"] = losses
            return params, quads, Ts, final_aux

    pspec = {
        k: (P(None, "tp", None) if k == "table" else P()) for k in param_keys
    }
    sharded = shard_map(
        device_body,
        mesh=mesh,
        in_specs=(pspec, P(), P(), P(), P()),
        out_specs=(pspec, P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)
