"""The neural map: hash grid + OneBlob PE + coarse/fine/out/merge MLPs.

Functional counterpart of the reference's ``Decoder`` module family
(reference: models/decoder.py:7-125) plus the per-class fine decoders the
reference creates incrementally as a dict of tcnn networks (reference:
slams/mapping.py:736-748). dnsjax pre-allocates the fine decoders as ONE
stacked parameter tensor ``[n_class, ...]`` (n_class is known up front from
the dataset scan, reference: datas/slam_datasets.py:271-287) and dispatches
by gathering per-ray weights — a batched matmul instead of a Python loop.

Architecture (dims with default config):
  pe      = OneBlob(pts in [0,1]^3)                      -> 48
  grid    = HashGrid(pts)                                 -> 32
  coarse  = MLP(pe ++ grid = 80 -> 32 -> 33)              [occ, latent_32]
  fine_c  = MLP(pe ++ grid = 80 -> 32 -> 33)  per class   [occ, latent_32]
  merge   = MLP(OneBlob(rel_pos) ++ pixel_feat 64 = 112 -> 32 -> 32), mean
            over reference views
  color   = sigmoid(MLP(pe ++ latent ++ merged = 112 -> 32 -> 3))
  logits  = MLP(pe ++ latent ++ merged = 112 -> 32 -> n_class)
"""

from __future__ import annotations

import contextlib
import contextvars
from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from dnsjax.ops.hashgrid import HashGridSpec, hash_encode, init_hash_table
from dnsjax.ops.mlp import init_mlp, init_stacked_mlp, mlp_apply, mlp_apply_gathered
from dnsjax.ops.oneblob import oneblob_encode

Params = Dict[str, Any]


@dataclass(frozen=True)
class DecoderSpec:
    """Static decoder configuration (hashable; safe as a jit static)."""

    n_class: int
    grid: HashGridSpec
    n_bins: int = 16
    pts_dim: int = 3
    hidden_dim: int = 32
    pixel_dim: int = 64
    # "gaussian" (erf CDF, textbook) or "quartic" (tcnn's polynomial kernel
    # — see ops/oneblob.py; A/B-gated by scripts/ab_quality.py)
    oneblob_kernel: str = "gaussian"

    @property
    def pe_dim(self) -> int:
        return self.pts_dim * self.n_bins  # 48

    @property
    def grid_dim(self) -> int:
        return self.grid.out_dim  # 32

    @staticmethod
    def from_config(cfg: Dict[str, Any], bound, n_class: int) -> "DecoderSpec":
        """Build from the `model:` config section + scene bound.

        desired_resolution = max_extent / voxel_size (reference:
        models/decoder.py:37-43).
        """
        m = cfg["model"]
        import numpy as np

        b = np.asarray(bound, dtype=np.float64)
        dim_max = float((b[:, 1] - b[:, 0]).max())
        grid = HashGridSpec(
            n_levels=int(m["grid"].get("n_levels", 16)),
            n_features=int(m["grid"].get("level_dim", 2)),
            log2_hashmap_size=int(m["grid"]["hash_size"]),
            base_resolution=int(m["grid"].get("base_resolution", 16)),
            desired_resolution=int(dim_max / float(m["grid"]["voxel_size"])),
            grad_corners=int(m["grid"].get("grad_corners", 8)),
            gather_bf16=bool(m["grid"].get("gather_bf16", False)),
            interp=str(m["grid"].get("interp", "trilinear")),
            grad_levels=int(m["grid"].get("grad_levels", 0)),
            scatter=str(m["grid"].get("scatter", "xla")),
            gather=str(m["grid"].get("gather", "xla")),
        )
        return DecoderSpec(
            n_class=n_class,
            grid=grid,
            n_bins=int(m["pos"]["n_bins"]),
            pts_dim=int(m.get("pts_dim", 3)),
            hidden_dim=int(m.get("hidden_dim", 32)),
            pixel_dim=int(m.get("pixel_dim", 64)),
            oneblob_kernel=str(m["pos"].get("kernel", "gaussian")),
        )


def init_decoder_params(key: jax.Array, spec: DecoderSpec) -> Params:
    """All trainable map parameters as one pytree."""
    ks = jax.random.split(key, 6)
    h = spec.hidden_dim
    pe, gd = spec.pe_dim, spec.grid_dim
    return {
        "table": init_hash_table(ks[0], spec.grid),
        "coarse": init_mlp(ks[1], pe + gd, h, h + 1),
        "fine": init_stacked_mlp(ks[2], spec.n_class, pe + gd, h, h + 1),
        "merge": init_mlp(ks[3], pe + spec.pixel_dim, h, h),
        "color": init_mlp(ks[4], pe + 2 * h, h, 3),
        "logit": init_mlp(ks[5], pe + 2 * h, h, spec.n_class),
    }


def decoder_param_count(params: Params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))


# Pluggable grid encode, read at trace time by pos_encode. parallel/tp.py
# swaps in the row-sharded hash_encode_tp and slam/tracker.py the
# forward-mode-differentiable variant, each for the duration of its own
# trace via the context manager below. A ContextVar (not a module global)
# makes the override re-entrant and confines it to the overriding context:
# a concurrently-tracing consumer in another thread sees the default.
_GRID_ENCODE: contextvars.ContextVar = contextvars.ContextVar(
    "dnsjax_grid_encode", default=hash_encode
)


@contextlib.contextmanager
def grid_encode_override(fn):
    """Route pos_encode's grid encode through ``fn`` while tracing inside
    this block (fn has hash_encode's signature: (table, pts01, spec))."""
    token = _GRID_ENCODE.set(fn)
    try:
        yield
    finally:
        _GRID_ENCODE.reset(token)


def pos_encode(
    params: Params, pts01: jnp.ndarray, spec: DecoderSpec
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Points in [0,1]^3 -> (pe (..., 48), grid (..., 32)).

    Reference: models/decoder.py:30-48 (``Pos_Encoding.forward``).
    """
    pe = oneblob_encode(pts01, spec.n_bins, spec.oneblob_kernel)
    grid = _GRID_ENCODE.get()(params["table"], pts01, spec.grid)
    return pe, grid


def coarse_apply(
    params: Params, pe: jnp.ndarray, grid: jnp.ndarray, compute_dtype=jnp.bfloat16
) -> jnp.ndarray:
    """(..., 33) = [occupancy_logit, latent_32] (reference: decoder.py:80-94)."""
    return mlp_apply(params["coarse"], jnp.concatenate([pe, grid], -1), compute_dtype)


def fine_apply(
    params: Params,
    classes: jnp.ndarray,
    pe: jnp.ndarray,
    grid: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Class-dispatched fine decoders.

    Args:
      classes: (N,) int per-ray class (every sample on a ray shares its GT
        label — reference: mapping.py:612-613).
      pe/grid: (N, S, pe_dim)/(N, S, grid_dim).
    Returns:
      (N, S, 33).
    """
    x = jnp.concatenate([pe, grid], axis=-1)
    return mlp_apply_gathered(params["fine"], classes, x, compute_dtype)


def out_apply(
    params: Params, pe: jnp.ndarray, feat: jnp.ndarray, compute_dtype=jnp.bfloat16
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """feat = latent_32 ++ merged_pixel_32 -> (sigmoid rgb (...,3), logits
    (..., n_class)) (reference: decoder.py:97-125)."""
    x = jnp.concatenate([pe, feat], axis=-1)
    color = jax.nn.sigmoid(mlp_apply(params["color"], x, compute_dtype))
    logits = mlp_apply(params["logit"], x, compute_dtype)
    return color, logits


def merge_apply(
    params: Params,
    rel_pos: jnp.ndarray,
    pixel_feats: jnp.ndarray,
    bound: jnp.ndarray,
    spec: DecoderSpec,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Fuse per-reference-view pixel features into one 32-d code per point.

    Args:
      rel_pos: (R, N, 3) point minus reference camera origin, world frame.
      pixel_feats: (R, N, pixel_dim) gathered (and mask-zeroed) features.
      bound: (3, 2) scene bound — the reference normalizes the *relative*
        vector by the absolute bound (quirky but kept; reference:
        models/decoder.py:67-77).
    Returns:
      (N, hidden_dim) mean over reference views.
    """
    p = (rel_pos - bound[:, 0]) / (bound[:, 1] - bound[:, 0])
    pe = oneblob_encode(p, spec.n_bins, spec.oneblob_kernel)
    x = jnp.concatenate([pe, pixel_feats], axis=-1)
    latents = mlp_apply(params["merge"], x, compute_dtype)
    return jnp.mean(latents, axis=0)
