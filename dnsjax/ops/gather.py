"""Pallas TPU fused hash-encode forward: gather + interpolate as MXU matmuls.

Replaces the XLA row-gather in the hash-encode forward (ops/hashgrid.py,
the TPU-native equivalent of tcnn's HashGrid CUDA kernel — reference:
models/pos_encoding.py:31-46). XLA's TPU gather is row-rate bound at
~4 ns/row; the TPU-profile mapping iteration issues ~1.5M corner rows
forward (94k pts x 4 levels x 4 tet corners), ~6.2 ms/iter measured.
This kernel applies the same construction as the production backward
(ops/scatter.dense_matmul_scatter, 4.42 vs 5.8-6.4 ms): keep the table
VMEM-resident in PACKED layout (R/P, 128) with P = 128/F table rows per
VMEM row, and turn the row lookups of each contribution block into ONE
bf16 one-hot matmul per table window:

  acc[b, :]   = sum_g (g == idx_b div P) table_packed[g, :]   # MXU
  feats[b, f] = sum_p acc[b, p*F+f] * (idx_b mod P == p)      # lane select
  out[pt, f] += w_b * feats[b, f]                             # f32 VPU

Semantics exactly match the adopted ``gather_bf16`` path: table rows are
bf16-quantized (the one-hot is exact 0/1 so the matmul reproduces the row
bit-for-bit), interpolation weights stay float32, accumulation is float32.
Only the corner-summation order differs (ulp-level).

Per-LEVEL pallas calls (not one call with a level grid dim): the window
loop is then statically sized by how many table rows the level actually
addresses (dense small levels use n_verts^3 << R rows — level 0 of the
TPU grid profile touches 7.5% of the table), so out-of-range windows are
never built at all rather than skipped at runtime.

The kernel grid is (n_blocks, n_corners), corners fastest: the output
block (one set of points) stays VMEM-resident while its corners
accumulate into it, and the packed level table stays resident across the
whole grid. An optional second output returns the per-corner gathered
features (the custom-VJP residual that the position gradient needs) —
a cheap sequential HBM write, unlike the random-access gather it replaces.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

_LANES = 128


def _gather_kernel(idx_ref, w_ref, table_ref, out_ref, *opt_feats,
                   F, w_rows, n_windows):
    """One (point-block, corner) grid step for one level.

    idx_ref (1, B, 1) int32 table rows in [0, R); w_ref (1, B, 1) f32
    interpolation weights; table_ref (G, 128) bf16 packed level table;
    out_ref (B, F) f32 accumulated over the corner grid dim; optional
    feats_ref (1, B, F) f32 per-corner gathered rows (VJP residual).
    """
    feats_ref = opt_feats[0] if opt_feats else None
    P = _LANES // F
    c = pl.program_id(1)
    B = idx_ref.shape[1]

    idx = idx_ref[0, :, :]  # (B, 1)
    grp = jax.lax.div(idx, P)
    lane_slot = jax.lax.rem(idx, P)

    # windowed one-hot matmuls against the resident packed table
    rows0 = jax.lax.broadcasted_iota(jnp.int32, (B, w_rows), 1)
    dims = (((1,), (0,)), ((), ()))
    acc = jnp.zeros((B, _LANES), jnp.float32)
    for w in range(n_windows):
        oh = (rows0 == grp - w * w_rows).astype(jnp.bfloat16)  # (B, W)
        acc = acc + jax.lax.dot_general(
            oh, table_ref[w * w_rows : (w + 1) * w_rows, :], dims,
            preferred_element_type=jnp.float32,
        )

    # lane select: row b's features live in lanes [slot*F, slot*F + F)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (B, _LANES), 1)
    masked = acc * (lane_ids // F == lane_slot).astype(jnp.float32)
    # lane reduce to (B, F) via a tiny constant matmul (S[j, f] = j%F == f;
    # exact: every output element sums ONE nonzero in f32)
    sr = jax.lax.broadcasted_iota(jnp.int32, (_LANES, F), 0)
    sc = jax.lax.broadcasted_iota(jnp.int32, (_LANES, F), 1)
    S = (jax.lax.rem(sr, F) == sc).astype(jnp.float32)
    feats = jax.lax.dot_general(
        masked, S, dims, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (B, F)

    if feats_ref is not None:
        feats_ref[0, :, :] = feats

    @pl.when(c == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += feats * w_ref[0, :, :]


def _level_gather(idx, w, packed, rows_used, F, want_feats, block):
    """idx/w (C, N, 1) for ONE level; packed (G, 128) bf16 -> (N, F) [, (C, N, F)]."""
    C, N, _ = idx.shape
    G = packed.shape[0]
    w_rows = min(512, G)
    used_packed = -(-int(rows_used) // (_LANES // F))
    n_windows = max(1, -(-min(used_packed, G) // w_rows))

    n_blocks = -(-N // block)
    n_pad = n_blocks * block - N
    if n_pad:
        idx = jnp.concatenate(
            [idx, jnp.zeros((C, n_pad, 1), idx.dtype)], axis=1
        )
        w = jnp.concatenate([w, jnp.zeros((C, n_pad, 1), w.dtype)], axis=1)

    kernel = partial(_gather_kernel, F=F, w_rows=w_rows, n_windows=n_windows)
    out_shapes = [jax.ShapeDtypeStruct((n_blocks * block, F), jnp.float32)]
    out_specs = [pl.BlockSpec((block, F), lambda b, c: (b, 0))]
    if want_feats:
        out_shapes.append(
            jax.ShapeDtypeStruct((C, n_blocks * block, F), jnp.float32)
        )
        out_specs.append(pl.BlockSpec((1, block, F), lambda b, c: (c, b, 0)))

    res = pl.pallas_call(
        kernel,
        grid=(n_blocks, C),
        in_specs=[
            pl.BlockSpec((1, block, 1), lambda b, c: (c, b, 0)),
            pl.BlockSpec((1, block, 1), lambda b, c: (c, b, 0)),
            pl.BlockSpec((G, _LANES), lambda b, c: (0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_blocks * C * block * n_windows * w_rows * _LANES,
            bytes_accessed=C * N * (4 + 4 + 4 * F) + G * _LANES * 2,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(idx.astype(jnp.int32), w.astype(jnp.float32), packed)
    out = res[0][:N]
    if want_feats:
        return out, res[1][:, :N]
    return out, None


def use_pallas_gather(table_size, F, n_pts) -> bool:
    """Kernel applicability: the packed bf16 PER-LEVEL table must fit VMEM
    (levels run as separate pallas calls, so the bound is per level, not
    sum-over-L) and the feature width must pack lanes exactly. Off-TPU the
    interpret-mode matmuls cost real host FLOPs: keep small CI shapes
    (correctness stays tested), fall back to the XLA gather at production
    sizes."""
    P = _LANES // F if 0 < F <= _LANES else 0
    G = table_size // P if P else 0
    return (
        P > 0
        and _LANES % F == 0
        and table_size % P == 0
        and G % 8 == 0
        # windows must tile the packed rows exactly (any power-of-two table
        # qualifies); otherwise the static window loop would slice past G
        and G % min(512, G) == 0
        and table_size * F * 2 <= 4 * 1024 * 1024
        and (jax.default_backend() == "tpu" or n_pts <= 16384)
    )


@partial(jax.jit, static_argnames=("rows_used", "want_feats", "block"))
def dense_matmul_gather(
    idx: jnp.ndarray,
    w: jnp.ndarray,
    table: jnp.ndarray,
    rows_used: tuple,
    want_feats: bool = True,
    block: int = 512,
):
    """Fused per-level gather + interpolation.

    Args:
      idx: (L, C, N) int32 per-level table rows in [0, R).
      w: (L, C, N) float32 interpolation weights.
      table: (L, R, F) float32 master table (bf16-quantized in-kernel,
        matching HashGridSpec.gather_bf16 semantics).
      rows_used: per-level count of addressable rows (static); windows
        above it are never built.
      want_feats: also return the per-corner gathered rows (VJP residual).
    Returns:
      out (L, N, F) f32 interpolated features;
      feats (L, C, N, F) f32 per-corner rows, or None.
    """
    L, C, N = idx.shape
    R, F = table.shape[-2:]
    P = _LANES // F
    packed = (
        table.astype(jnp.bfloat16).reshape(L, R // P, P * F)
    )  # (L, G, 128)

    outs, feats = [], []
    for l in range(L):
        o, f = _level_gather(
            idx[l, :, :, None], w[l, :, :, None], packed[l],
            rows_used[l], F, want_feats, block,
        )
        outs.append(o)
        feats.append(f)
    out = jnp.stack(outs)  # (L, N, F)
    if want_feats:
        return out, jnp.stack(feats)  # (L, C, N, F)
    return out, None
