"""EXPERIMENTAL Pallas TPU kernel: sorted segmented scatter-add.

Status: NOT in the production autodiff path. On pre-sorted contributions it
beats XLA scatter 2.7x (18 vs 49 ms at 3M rows), but hash-table gradient
indices arrive unsorted and the required argsort + payload permutation
costs more than the win (measured: argsort 3M keys ~6 ms, permuting 32-byte
payloads ~20 ms). The production backward instead REDUCES scatter rows —
stochastic-corner + stochastic-level sampling in ops/hashgrid.py — which
beats both. The kernel is kept (with its tests) as the building block for
a future sort-free path should a naturally-grouped contribution order
appear.

XLA's TPU scatter-add costs ~70 ns/row (measured; it serializes colliding
updates), which makes the hash-encoding backward the dominant cost of map
optimization. This kernel exploits sortedness: after sorting contributions
by table row, each fixed-size block of B contributions touches a narrow,
contiguous WINDOW of table rows, so the scatter becomes ONE small MXU
matmul per block against a one-hot matrix, accumulated into the full
gradient table, which stays resident in VMEM across the (sequential) grid.

Layout: a (R, F) table with F << 128 would waste 128/F of VMEM (lane
padding), so the kernel works on a PACKED view (R/P, 128) with P = 128/F
table rows per VMEM row. Each contribution's value vector is placed into
its lane slot by an elementwise lane one-hot (VPU), and the row one-hot
matmul (MXU) lands it in the right packed row:

  vals_exp[b, :] = lane_onehot(idx_b mod P) (x) vals[b]        # (B, 128)
  window[g, :]  += sum_b (idx_b div P == g + lo_g) vals_exp[b]  # matmul

Contributions outside a block's window (only for pathologically spread
indices) are dropped by the one-hot; the caller checks block spans and
falls back to XLA scatter via lax.cond. Requires the packed table
(R * F * 4 bytes) to fit in VMEM alongside ~2 MB of scratch; bigger tables
use plain XLA scatter.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_B = 1024        # contributions per grid step (matches s32 XLA layout tiling)
_WPAD = 2048     # table rows coverable per block window
_ALIGN = 128     # window start alignment (keeps packed sublane starts at x8)
_LANES = 128


def _kernel(lo_ref, idx_ref, vals_ref, out_ref):
    """out_ref: packed table (R/P, 128); idx in original row space."""
    F = vals_ref.shape[-1]
    P = _LANES // F
    G = _WPAD // P  # packed rows per window
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    lo = lo_ref[b]  # multiple of _ALIGN
    off = idx_ref[:] - lo  # (B,) in [0, WPAD) when in-window

    # lane placement: vals_exp[b, p*F:(p+1)*F] = vals[b] iff idx_b mod P == p
    # (built with 2-D ops only — Mosaic cannot merge a lane-dim reshape)
    lane_slot = jax.lax.rem(off, P)  # (B,)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (_B, _LANES), 1)
    mask = (lane_ids // F == lane_slot[:, None]).astype(jnp.float32)
    vals_tiled = pltpu.repeat(vals_ref[:], P, axis=1)  # (B, 128)
    vals_exp = vals_tiled * mask

    # packed-row one-hot matmul
    grp = jax.lax.div(off, P)  # (B,) in [0, G)
    rows = jax.lax.broadcasted_iota(jnp.int32, (G, _B), 0)
    oh = (rows == grp[None, :]).astype(jnp.float32)  # (G, B)
    win = jnp.dot(oh, vals_exp, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)  # (G, 128)

    g0 = lo // P
    cur = out_ref[pl.ds(g0, G), :]
    out_ref[pl.ds(g0, G), :] = cur + win


def _pallas_sorted_scatter(sorted_idx, sorted_vals, R: int):
    """sorted_idx (M,) int32 ascending; sorted_vals (M, F) f32 -> (R, F)."""
    M, F = sorted_vals.shape
    P = _LANES // F
    n_blocks = M // _B
    lo = sorted_idx[:: _B]
    lo = (lo // _ALIGN) * _ALIGN
    lo = jnp.minimum(lo, R - _WPAD)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((_B,), lambda b, lo: (b,)),
            pl.BlockSpec((_B, F), lambda b, lo: (b, 0)),
        ],
        out_specs=pl.BlockSpec((R // P, _LANES), lambda b, lo: (0, 0)),
    )
    packed = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R // P, _LANES), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(lo, sorted_idx, sorted_vals)
    return packed.reshape(R, F)


@partial(jax.jit, static_argnames=("R", "use_pallas"))
def sorted_scatter_add(
    idx: jnp.ndarray, vals: jnp.ndarray, R: int, use_pallas: bool = True
) -> jnp.ndarray:
    """Equivalent of ``jnp.zeros((R, F)).at[idx].add(vals)``.

    idx (M,) int32 (unsorted), vals (M, F) float32. F must divide 128.
    """
    M, F = vals.shape
    if (
        not use_pallas
        or _LANES % F != 0
        or R % (_LANES // F) != 0
        or R % _ALIGN != 0
        or R * F * 4 > 13 * 1024 * 1024
        or R < 2 * _WPAD
        or M < 4 * _B
    ):
        return jnp.zeros((R, F), vals.dtype).at[idx].add(vals)

    perm = jnp.argsort(idx)
    sidx = idx[perm].astype(jnp.int32)
    svals = vals[perm]

    # pad M to a block multiple with zero contributions on the last row
    M_pad = (M + _B - 1) // _B * _B
    if M_pad != M:
        sidx = jnp.concatenate([sidx, jnp.full((M_pad - M,), R - 1, jnp.int32)])
        svals = jnp.concatenate([svals, jnp.zeros((M_pad - M, F), svals.dtype)])

    # fallback if any block spans beyond its window (degenerate distribution)
    lo = sidx[:: _B]
    lo_al = jnp.minimum((lo // _ALIGN) * _ALIGN, R - _WPAD)
    hi = sidx[_B - 1 :: _B]
    in_window = jnp.all(hi - lo_al < _WPAD)

    return jax.lax.cond(
        in_window,
        lambda: _pallas_sorted_scatter(sidx, svals, R),
        lambda: jnp.zeros((R, F), vals.dtype).at[idx].add(vals),
    )
