"""Multi-resolution hash-grid encoding (Instant-NGP style), TPU-native.

Replaces the reference's tcnn ``HashGrid`` CUDA encoding (reference:
models/pos_encoding.py:31-46; config at configs/replica/replica.yaml:16-18).
Semantics follow the Instant-NGP paper (Mueller et al. 2022):

* L levels with per-axis resolution ``N_l = floor(base * scale^l)``,
  ``scale = exp2(log2(desired/base) / (L-1))``.
* levels whose dense vertex count fits the table use direct (dense) indexing;
  larger levels use the spatial hash ``x ^ (y*2654435761) ^ (z*805459861)``
  modulo table size.
* features are trilinearly interpolated from the 8 cell corners and
  concatenated over levels (level-major), giving ``L * F`` output dims.

The forward pass is pure XLA (gathers + fused arithmetic); the backward pass
is JAX autodiff of the gather, which lowers to an efficient scatter-add into
the table. Input points are expected in [0, 1]^3 (callers normalize by the
scene bound, as the reference does at e.g. slams/tracking.py:190).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

# Spatial-hash primes from Teschner et al. / Instant-NGP.
_PRIMES = (1, 2654435761, 805459861)

# Corner offsets of a unit cell, shape (8, 3).
_CORNERS = np.array(
    [[i & 1, (i >> 1) & 1, (i >> 2) & 1] for i in range(8)], dtype=np.int32
)


@dataclass(frozen=True)
class HashGridSpec:
    """Static configuration of the encoding (hashable; safe as a jit static).

    ``grad_corners``: corners receiving table gradient per (point, level).
    8 = exact trilinear transpose (reference semantics). 1 = stochastic
    single-corner backward: sample one corner with probability equal to its
    trilinear weight and scatter the unscaled output gradient — an UNBIASED
    estimator of the exact gradient (E[g] = sum_c w_c g) with 8x fewer
    scatter rows. XLA TPU scatter costs ~70ns/row, making the exact
    transpose the dominant cost of map optimization; the stochastic backward
    trades gradient variance (absorbed by Adam over the 100-iteration
    keystep) for an ~8x faster backward. Positions still get exact grads.
    """

    n_levels: int = 16
    n_features: int = 2
    log2_hashmap_size: int = 16
    base_resolution: int = 16
    desired_resolution: int = 512
    grad_corners: int = 8
    # Gather feature rows in bfloat16 (~30% faster on TPU; the master table
    # and its gradients stay float32, only the gathered values are
    # quantized — tcnn stores its hash tables in fp16 outright).
    gather_bf16: bool = False
    # "trilinear" (8 corners, reference semantics) or "tet" (4 corners):
    # Kuhn-simplex barycentric interpolation over the tetrahedron containing
    # the point. Both are continuous piecewise-linear-per-cell (C0) fields;
    # tet halves the gather/scatter row count, which is the measured cost
    # driver of the encoding on TPU (XLA gathers are per-row-bound, see
    # scripts/profile_map.py). tcnn has no equivalent; quality is gated by
    # scripts/ab_quality.py on the textured synthetic scene.
    interp: str = "trilinear"
    # 0 = scatter table gradients for every level; 1 = sample ONE level per
    # point uniformly and scale by n_levels (unbiased, n_levels x fewer
    # scatter rows; composes with grad_corners=1).
    grad_levels: int = 0
    # Table-gradient scatter backend. "xla" = flat jnp scatter-add
    # (serializes colliding rows, ~16-70 ns/row on TPU). "pallas" = the
    # dense one-hot-matmul MXU kernel (ops/scatter.dense_matmul_scatter):
    # the packed gradient table stays VMEM-resident and each contribution
    # block becomes a bf16 matmul — no sort, no row-rate bound; gradient
    # contributions are bf16-quantized (the accumulation is f32).
    # "pallas_split" = same kernel with a hi/lo split (~f32-exact, 2x
    # matmul cost). "pallas_sr" = single-matmul kernel with contributions
    # stochastically rounded to the bf16 grid first (unbiased, plain-kernel
    # speed — ops/scatter.stochastic_round_bf16). Pallas paths require
    # grad_levels == 0 and a table that fits VMEM, else they silently fall
    # back to XLA scatter.
    scatter: str = "xla"
    # Forward-gather backend. "xla" = row gathers (~4 ns/row on TPU).
    # "pallas" = ops/gather.dense_matmul_gather: the packed bf16 level
    # table stays VMEM-resident and each point block's corner lookups
    # become one-hot MXU matmuls with interpolation fused in-kernel.
    # Requires gather_bf16 (the kernel reproduces exactly that semantic:
    # bf16 rows, f32 weights) and a VMEM-resident table, else falls back.
    gather: str = "xla"

    @property
    def n_corners(self) -> int:
        return 4 if self.interp == "tet" else 8

    @property
    def table_size(self) -> int:
        return 1 << self.log2_hashmap_size

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_features

    @property
    def per_level_scale(self) -> float:
        if self.n_levels == 1:
            return 1.0
        return float(
            np.exp2(
                np.log2(self.desired_resolution / self.base_resolution)
                / (self.n_levels - 1)
            )
        )

    def level_resolutions(self) -> np.ndarray:
        s = self.per_level_scale
        return np.array(
            [int(np.floor(self.base_resolution * s**l)) for l in range(self.n_levels)],
            dtype=np.int32,
        )


def init_hash_table(key: jax.Array, spec: HashGridSpec) -> jnp.ndarray:
    """(L, T, F) table, uniform in [-1e-4, 1e-4] (Instant-NGP init)."""
    return jax.random.uniform(
        key,
        (spec.n_levels, spec.table_size, spec.n_features),
        minval=-1e-4,
        maxval=1e-4,
        dtype=jnp.float32,
    )


def _level_indices(ix: jnp.ndarray, res: int, table_size: int) -> jnp.ndarray:
    """Corner integer coords (N, 8, 3) -> table indices (N, 8) for one level."""
    n_verts = res + 1
    if n_verts**3 <= table_size:
        # Dense indexing for small levels (tcnn does the same).
        idx = ix[..., 0] + n_verts * (ix[..., 1] + n_verts * ix[..., 2])
    else:
        ux = ix.astype(jnp.uint32)
        idx = (
            ux[..., 0] * np.uint32(_PRIMES[0])
            ^ ux[..., 1] * np.uint32(_PRIMES[1])
            ^ ux[..., 2] * np.uint32(_PRIMES[2])
        )
        idx = (idx % np.uint32(table_size)).astype(jnp.int32)
    return idx


def _tet_offsets_weights(f: jnp.ndarray):
    """Kuhn-simplex corners of the cell containing frac ``f`` (N, 3).

    Sort the frac coords descending (ties by axis index); the containing
    tetrahedron walks from corner (0,0,0) to (1,1,1) adding unit steps in
    sorted-axis order. Returns (offsets (N,4,3) int32, barycentric weights
    (N,4), rank (N,3) int32 with 0 = largest coord).
    """
    j = jnp.arange(3)
    a, b = f[:, :, None], f[:, None, :]
    outranks = (a > b) | ((a == b) & (j[:, None] < j[None, :]))
    rank = jnp.sum(outranks, axis=1).astype(jnp.int32)  # (N,3)
    i4 = jnp.arange(4)
    off = (rank[:, None, :] < i4[None, :, None]).astype(jnp.int32)  # (N,4,3)
    f1 = jnp.max(f, -1)
    f3 = jnp.min(f, -1)
    f2 = jnp.sum(f, -1) - f1 - f3
    w = jnp.stack([1.0 - f1, f1 - f2, f2 - f3, f3], -1)
    return off, w, rank


def _corner_indices_weights(p: jnp.ndarray, spec: HashGridSpec):
    """(N,3) in [0,1] -> (idx (N,L,C) flat into (L*T), w (N,L,C), aux).

    aux is the residual the position-gradient needs: frac (N,L,3) for
    trilinear, rank (N,L,3) for tet.
    """
    resolutions = spec.level_resolutions()
    corners = jnp.asarray(_CORNERS)
    idxs, ws, auxs = [], [], []
    for l in range(spec.n_levels):
        res = int(resolutions[l])
        x = p * res
        i0 = jnp.minimum(jnp.floor(x).astype(jnp.int32), res - 1)
        frac = x - i0.astype(x.dtype)
        if spec.interp == "tet":
            off, w, rank = _tet_offsets_weights(frac)
            ix = i0[:, None, :] + off  # (N, 4, 3)
            aux = rank
        else:
            ix = i0[:, None, :] + corners[None, :, :]  # (N, 8, 3)
            w = _trilerp_weights(frac)
            aux = frac
        idx = _level_indices(ix, res, spec.table_size)  # (N, C)
        idxs.append(idx + l * spec.table_size)
        ws.append(w)
        auxs.append(aux)
    return jnp.stack(idxs, 1), jnp.stack(ws, 1), jnp.stack(auxs, 1)


def _trilerp_weights(frac: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) frac -> (..., 8) trilinear corner weights."""
    c = jnp.asarray(_CORNERS, frac.dtype)  # (8, 3)
    return jnp.prod(
        c * frac[..., None, :] + (1.0 - c) * (1.0 - frac[..., None, :]), axis=-1
    )


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def hash_encode(table: jnp.ndarray, pts: jnp.ndarray, spec: HashGridSpec) -> jnp.ndarray:
    """Encode points.

    Custom VJP: the table gradient is ONE flat scatter-add over all levels
    (the default autodiff transpose lowers to per-level scatters that XLA
    schedules ~4x slower on TPU), and the position gradient reuses the
    gathered corner features.

    Args:
      table: (L, T, F) parameters.
      pts: (..., 3) points in [0, 1]^3 (out-of-range points clamp).
      spec: static encoding config.
    Returns:
      (..., L * F) encoded features, float32.
    """
    out, _ = _hash_encode_fwd(table, pts, spec, want_feats=False)
    return out


def _rows_used(spec: HashGridSpec) -> tuple:
    """Per-level count of addressable table rows (dense-indexed small
    levels touch n_verts^3 << T rows); static window-skip input for the
    Pallas gather/scatter kernels."""
    return tuple(
        int(min((int(r) + 1) ** 3, spec.table_size))
        for r in spec.level_resolutions()
    )


def _hash_encode_fwd(table, pts, spec: HashGridSpec, want_feats: bool = True):
    batch_shape = pts.shape[:-1]
    p = jnp.clip(pts.reshape(-1, 3), 0.0, 1.0)
    idx, w, aux = _corner_indices_weights(p, spec)  # (N,L,C), (N,L,C), (N,L,3)

    if spec.gather == "pallas" and spec.gather_bf16:
        from dnsjax.ops.gather import dense_matmul_gather, use_pallas_gather

        n = idx.shape[0]
        if use_pallas_gather(spec.table_size, spec.n_features, n):
            off = jnp.arange(spec.n_levels, dtype=idx.dtype) * spec.table_size
            li = (idx - off[None, :, None]).transpose(1, 2, 0)  # (L, C, N)
            lw = w.transpose(1, 2, 0)
            out_lnf, feats_lcnf = dense_matmul_gather(
                li, lw, table, _rows_used(spec), want_feats=want_feats
            )
            out = out_lnf.transpose(1, 0, 2).reshape(
                batch_shape + (spec.out_dim,)
            )
            feats = (
                feats_lcnf.transpose(2, 0, 1, 3) if want_feats else None
            )  # (N, L, C, F)
            return out, (pts, idx, w, aux, feats)

    flat = table.reshape(-1, spec.n_features)  # (L*T, F)
    if spec.gather_bf16:
        flat = flat.astype(jnp.bfloat16)
    feats = jnp.take(flat, idx.reshape(-1), axis=0).reshape(
        idx.shape + (spec.n_features,)
    )  # (N,L,C,F)
    out = jnp.sum(w[..., None] * feats.astype(w.dtype), axis=2)  # (N,L,F)
    out = out.reshape(batch_shape + (spec.out_dim,))
    return out, (pts, idx, w, aux, feats)


def _stateless_uniform(a: jnp.ndarray, b: jnp.ndarray, salt: int) -> jnp.ndarray:
    """[0,1) uniform from two int arrays (cell-hash driven; points resample
    every iteration, so this is fresh noise per optimization step)."""
    bits = (a.astype(jnp.uint32) * np.uint32(0x9E3779B9)) ^ (
        b.astype(jnp.uint32) * np.uint32(0x85EBCA6B + 2 * salt)
    )
    return (bits >> np.uint32(8)).astype(jnp.float32) * (1.0 / (1 << 24))


def _table_grad_contribs(spec: HashGridSpec, idx, w, g):
    """Scatter contributions for the table gradient: (scatter_idx, contrib).

    Exact mode: every corner gets w_c * g. Stochastic mode (grad_corners <
    n_corners): ONE corner sampled ~ its interpolation weight carries the
    unscaled g (unbiased). Shared by the single-chip backward and the
    row-sharded TP backward (parallel/tp.py) so both have identical
    semantics — including the index-hash-driven RNG, which makes the
    sampled corner identical on every TP shard (the row then lands on
    exactly one shard's local range).
    """
    C = spec.n_corners
    if spec.grad_corners >= C:
        contrib = w[..., None] * g[:, :, None, :]  # (N,L,C,F)
        scatter_idx = idx  # (N,L,C)
    else:
        # stochastic corner: inverse-CDF sample corner ~ interp weight;
        # unbiased (E[g] = sum_c w_c g) with C x fewer scatter rows.
        cdf = jnp.cumsum(w, axis=-1)  # (N,L,C), last == 1
        u = _stateless_uniform(idx[..., 0], idx[..., -1], 0)
        c_star = jnp.clip(
            jnp.sum((cdf < u[..., None]).astype(jnp.int32), -1), 0, C - 1
        )  # (N,L)
        one_hot = (jnp.arange(C) == c_star[..., None]).astype(idx.dtype)
        contrib = g  # (N,L,F)
        scatter_idx = jnp.sum(idx * one_hot, axis=-1)  # (N,L)
    return scatter_idx, contrib


def _position_grad(spec: HashGridSpec, pts, feats, w, aux, g):
    """d(encode)/d(pts) transpose: (N, 3) from gathered corner features."""
    gdotf = jnp.sum(feats.astype(g.dtype) * g[:, :, None, :], axis=-1)  # (N,L,C)
    if spec.interp == "tet":
        # Out = (1-f_(1))F0 + (f_(1)-f_(2))F1 + (f_(2)-f_(3))F2 + f_(3)F3
        # => dOut/df_k = gdotf[rank_k + 1] - gdotf[rank_k]
        rank = aux  # (N,L,3) int32
        i4 = jnp.arange(4)
        sel = (
            (rank[..., None] + 1 == i4).astype(g.dtype)
            - (rank[..., None] == i4).astype(g.dtype)
        )  # (N,L,3,4)
        dfrac = jnp.sum(sel * gdotf[:, :, None, :], axis=-1)  # (N,L,3)
        fdtype = jnp.float32
    else:
        # dw/dfrac_k = prod of the other two dims' factors, signed by bit k
        frac = aux
        c = jnp.asarray(_CORNERS, frac.dtype)  # (8,3)
        f = c * frac[..., None, :] + (1 - c) * (1 - frac[..., None, :])
        sign = 2.0 * c - 1.0  # (8,3)
        others = jnp.stack(
            [f[..., 1] * f[..., 2], f[..., 0] * f[..., 2], f[..., 0] * f[..., 1]],
            axis=-1,
        )  # (N,L,8,3)
        dfrac = jnp.sum(gdotf[..., None] * sign * others, axis=2)  # (N,L,3)
        fdtype = frac.dtype
    resolutions = jnp.asarray(spec.level_resolutions(), fdtype)
    d_p = jnp.sum(dfrac * resolutions[None, :, None], axis=1)  # (N,3)
    # clip boundary: zero gradient outside [0,1]
    p = pts.reshape(-1, 3)
    return jnp.where((p >= 0) & (p <= 1), d_p, 0.0)


def _hash_encode_bwd(spec: HashGridSpec, res, g):
    pts, idx, w, aux, feats = res
    batch_shape = pts.shape[:-1]
    n = idx.shape[0]
    g = g.reshape(n, spec.n_levels, spec.n_features)  # (N,L,F)

    # ---- table gradient: flat scatter-add, optionally stochastic ----------
    # NOTE on implementation style: everything below is pure elementwise math
    # (one-hot select-sums instead of take_along_axis) — TPU gathers cost
    # ~2.4-5 ns per ROW regardless of width, so selecting one of C corners
    # per point via gather costs as much as re-reading the table, while a
    # one-hot multiply-sum over the C axis fuses into the surrounding loop.
    scatter_idx, contrib = _table_grad_contribs(spec, idx, w, g)

    if spec.grad_levels == 1 and spec.n_levels > 1:
        # stochastic level: keep ONE level per point, scaled by L (unbiased)
        u2 = _stateless_uniform(idx[:, 0, 0], idx[:, -1, -1], 1)
        l_star = jnp.minimum(
            (u2 * spec.n_levels).astype(jnp.int32), spec.n_levels - 1
        )  # (N,)
        lvl_hot = jnp.arange(spec.n_levels) == l_star[:, None]  # (N,L)
        lsel = lvl_hot.reshape((n, spec.n_levels) + (1,) * (contrib.ndim - 2))
        contrib = jnp.sum(
            contrib * lsel.astype(contrib.dtype), axis=1
        ) * spec.n_levels
        isel = lvl_hot.reshape((n, spec.n_levels) + (1,) * (scatter_idx.ndim - 2))
        scatter_idx = jnp.sum(scatter_idx * isel.astype(scatter_idx.dtype), axis=1)

    if (
        spec.scatter in ("pallas", "pallas_split", "pallas_sr")
        and spec.grad_levels == 0
    ):
        # per-level layout for the VMEM-resident matmul-scatter kernel
        # (indices carry the flat level offset; strip it back off)
        from dnsjax.ops.scatter import dense_matmul_scatter

        L, F = spec.n_levels, spec.n_features
        off = jnp.arange(L, dtype=scatter_idx.dtype) * spec.table_size
        if scatter_idx.ndim == 2:  # stochastic corner: (N, L); contrib (N,L,F)
            li = (scatter_idx - off[None, :]).T  # (L, N)
            lv = contrib.transpose(1, 0, 2)  # (L, N, F)
        else:  # exact corners: (N, L, C)
            li = (
                (scatter_idx - off[None, :, None])
                .transpose(1, 0, 2)
                .reshape(L, -1)
            )
            lv = contrib.transpose(1, 0, 2, 3).reshape(L, -1, F)
        rows_used = _rows_used(spec)
        lv32 = lv.astype(jnp.float32)
        if spec.scatter == "pallas_sr":
            # stochastically round contributions to the bf16 grid BEFORE the
            # kernel: its internal .astype(bfloat16) is then exact, so the
            # single-matmul path carries an unbiased (E[g]=g) gradient at
            # plain-kernel speed (the round-to-nearest bias is what
            # gate-failed scatter=pallas; split costs 2x matmuls).
            from dnsjax.ops.scatter import sr_bits16, stochastic_round_bf16

            bits = sr_bits16(
                li[..., None],
                jnp.arange(li.shape[1], dtype=jnp.uint32)[None, :, None],
                jnp.arange(F, dtype=jnp.uint32)[None, None, :],
                jnp.arange(L, dtype=jnp.uint32)[:, None, None],
            )
            lv32 = stochastic_round_bf16(lv32, bits)
        d_table = dense_matmul_scatter(
            li, lv32, spec.table_size,
            split=spec.scatter == "pallas_split",
            rows_used=rows_used,
        )
    else:
        flat_grad = (
            jnp.zeros(
                (spec.n_levels * spec.table_size, spec.n_features), g.dtype
            )
            .at[scatter_idx.reshape(-1)]
            .add(contrib.reshape(-1, spec.n_features))
        )
        d_table = flat_grad.reshape(
            spec.n_levels, spec.table_size, spec.n_features
        )

    # ---- position gradient -------------------------------------------------
    d_p = _position_grad(spec, pts, feats, w, aux, g)
    return d_table, d_p.reshape(batch_shape + (3,))


def _hash_encode_fwd_vjp(table, pts, spec: HashGridSpec):
    """VJP forward rule: identical to the primal, but the residuals pass
    through an optimization barrier so XLA SAVES the gathered corner
    features instead of re-gathering them in the backward (measured on
    v5e at the mapping shape: fwd+bwd 16.5 -> 14.8 ms/iter, and the
    tracking pos-grad path 11.0 -> 9.3 ms/iter). The primal path (render /
    mesh query, never differentiated) does not run the barrier, so its
    residual computation still folds away."""
    out, res = _hash_encode_fwd(table, pts, spec)
    return out, jax.lax.optimization_barrier(res)


hash_encode.defvjp(_hash_encode_fwd_vjp, _hash_encode_bwd)


def hash_encode_fwd_mode(
    table: jnp.ndarray, pts: jnp.ndarray, spec: HashGridSpec
) -> jnp.ndarray:
    """JVP-differentiable encode for forward-mode consumers (the LM
    tracker's pose Jacobian, slam/tracker.py): plain XLA autodiff instead
    of the custom_vjp (which has no jvp rule), forcing the XLA gather (the
    Pallas kernel likewise has no jvp rule). Primal values are identical
    to ``hash_encode`` with gather="xla"."""
    if spec.gather != "xla":
        import dataclasses

        spec = dataclasses.replace(spec, gather="xla")
    out, _ = _hash_encode_fwd(table, pts, spec, want_feats=False)
    return out


def hash_encode_ref(table: np.ndarray, pts: np.ndarray, spec: HashGridSpec) -> np.ndarray:
    """Pure-numpy oracle of hash_encode (for tests; both interp modes)."""
    p = np.clip(pts.reshape(-1, 3), 0.0, 1.0)
    resolutions = spec.level_resolutions()
    outs = []
    for l in range(spec.n_levels):
        res = int(resolutions[l])
        x = p * res
        i0 = np.minimum(np.floor(x).astype(np.int64), res - 1)
        frac = x - i0
        if spec.interp == "tet":
            # rank by descending frac, ties by axis index; corner i steps
            # along the top-i axes (independent reimplementation of the
            # Kuhn-simplex walk for verification)
            n = p.shape[0]
            off = np.zeros((n, 4, 3), np.int64)
            w = np.zeros((n, 4))
            for r in range(n):
                order = sorted(range(3), key=lambda k: (-frac[r, k], k))
                fs = frac[r, order]
                w[r] = [1 - fs[0], fs[0] - fs[1], fs[1] - fs[2], fs[2]]
                step = np.zeros(3, np.int64)
                for i, ax in enumerate(order):
                    step = step.copy()
                    step[ax] = 1
                    off[r, i + 1] = step
            ix = i0[:, None, :] + off
        else:
            ix = i0[:, None, :] + _CORNERS[None, :, :]
            c = _CORNERS.astype(np.float64)
            w = np.prod(
                c[None] * frac[:, None] + (1 - c[None]) * (1 - frac[:, None]), -1
            )
        n_verts = res + 1
        if n_verts**3 <= spec.table_size:
            idx = ix[..., 0] + n_verts * (ix[..., 1] + n_verts * ix[..., 2])
        else:
            ux = ix.astype(np.uint32)
            idx = (
                ux[..., 0] * np.uint32(_PRIMES[0])
                ^ ux[..., 1] * np.uint32(_PRIMES[1])
                ^ ux[..., 2] * np.uint32(_PRIMES[2])
            ) % np.uint32(spec.table_size)
        feats = table[l][idx]
        outs.append((w[..., None] * feats).sum(1))
    return np.concatenate(outs, -1).astype(np.float32)
