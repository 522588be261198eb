"""Multi-chip scaling: data-parallel ray sharding over a device mesh.

The reference is strictly single-GPU (its NCCL helpers are dead code —
reference: utils/common.py:79-162, never called). dnsjax's scale-out axis is
the ray batch: under ``shard_map`` over a 1-D ``dp`` mesh, every device
samples its own ray sub-batch (per-device PRNG fold), computes local grads,
and ``pmean``s them before an identical replicated Adam update — equivalent
to one big batch of n_devices * n_pixels rays per iteration, with the
collective riding ICI.

Mesh extraction sharding (dnsjax.mesh.grid_query) reuses the same mesh by
sharding grid chunks.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from dnsjax.models.decoder import DecoderSpec
from dnsjax.slam import mapper as _mapper


def ray_mesh(n_devices: int | None = None, first: int = 0) -> Mesh:
    """A 1-D 'dp' mesh over n_devices devices starting at ``first``
    (default: all devices from 0). ``first`` > 0 builds the mesh over the
    NON-tracker chips for the composed operating point (tracker on chip 0,
    keystep DP-sharded over the rest — tpu.map_dp, slam/driver.py)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[first:first + n_devices]
        if len(devs) < n_devices:
            raise ValueError(
                f"ray_mesh: need devices [{first}, {first + n_devices}) "
                f"but only {len(jax.devices())} exist"
            )
    import numpy as np

    return Mesh(np.array(devs), ("dp",))


def make_map_fn_dp(
    spec: DecoderSpec,
    cfg: "_mapper.MapConfig",
    n_target: int,
    n_iters: int,
    mesh: Mesh,
    compute_dtype=jnp.bfloat16,
):
    """Data-parallel variant of slam.mapper.make_map_fn.

    Per-device ray budget is cfg.n_pixels (so total rays scale with mesh
    size). Returns map_step(params, quads0, Ts0, window, key) with identical
    signature/semantics to the single-chip version; params/window replicated,
    PRNG folded per device, grads pmean'd over 'dp'.
    """
    T = n_target
    opt = optax.multi_transform(
        {"net": optax.adam(cfg.lr), "pose": optax.adam(cfg.ba_cam_lr)},
        ("net", "pose", "pose"),
    )
    loss_fn = _mapper._build_loss_fn(spec, cfg, n_target, compute_dtype)

    def device_body(params, quads0, Ts0, window, key):
        # identical on every device except the ray keys
        dev = jax.lax.axis_index("dp")
        key = jax.random.fold_in(key, dev)
        opt_params = (params, quads0, Ts0)
        opt_state = opt.init(opt_params)
        pose_train = window["pose_train"]

        def step(carry, xs):
            opt_params, opt_state = carry
            it, k = xs
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                opt_params, k, it, window
            )
            grads = jax.lax.pmean(grads, "dp")
            loss = jax.lax.pmean(loss, "dp")
            aux = jax.tree_util.tree_map(lambda a: jax.lax.pmean(a, "dp"), aux)
            gp, gq, gT = grads
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

    sharded = shard_map(
        device_body,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)
