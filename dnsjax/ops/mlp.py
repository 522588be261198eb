"""Tiny fused MLPs (the tcnn ``CutlassMLP`` replacement).

Every trainable network in the reference is a 1-hidden-layer, 32-neuron,
ReLU MLP with linear output (reference: models/decoder.py:58-65, 84-91,
101-117; slams/mapping.py:737-744). Here an MLP is a plain pytree
``{"w": [W0, W1, ...], "b": [b0, b1, ...]}`` applied functionally; matmuls
run in a configurable compute dtype (bfloat16 on TPU — these 32-wide GEMMs
ride the MXU) with float32 accumulation and float32 parameters.

tcnn networks are bias-free but pad inputs with ones (an implicit bias);
we use explicit biases — same capacity, clearer code.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp


def _precision_for(compute_dtype):
    return (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def init_mlp(
    key: jax.Array,
    in_dim: int,
    hidden_dim: int,
    out_dim: int,
    n_hidden_layers: int = 1,
) -> Dict[str, List[jnp.ndarray]]:
    """Kaiming-uniform init, matching tcnn's default scale for ReLU nets."""
    dims = [in_dim] + [hidden_dim] * n_hidden_layers + [out_dim]
    ws, bs = [], []
    for i in range(len(dims) - 1):
        key, sub = jax.random.split(key)
        bound = (6.0 / dims[i]) ** 0.5
        ws.append(
            jax.random.uniform(
                sub, (dims[i], dims[i + 1]), minval=-bound, maxval=bound,
                dtype=jnp.float32,
            )
        )
        bs.append(jnp.zeros((dims[i + 1],), jnp.float32))
    return {"w": ws, "b": bs}


def mlp_apply(
    params: Dict[str, Sequence[jnp.ndarray]],
    x: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """ReLU MLP forward; returns float32. Hidden activations stay in
    compute_dtype, accumulation is float32 (preferred_element_type). When
    compute_dtype is float32, precision is pinned to HIGHEST (TPU otherwise
    routes f32 matmuls through bf16 passes)."""
    prec = _precision_for(compute_dtype)
    h = x.astype(compute_dtype)
    n = len(params["w"])
    for i, (w, b) in enumerate(zip(params["w"], params["b"])):
        h = (
            jnp.dot(h, w.astype(compute_dtype),
                    preferred_element_type=jnp.float32, precision=prec)
            + b
        )
        if i < n - 1:
            h = jax.nn.relu(h).astype(compute_dtype)
    return h.astype(jnp.float32)


def mlp_apply_gathered(
    stacked: Dict[str, Sequence[jnp.ndarray]],
    classes: jnp.ndarray,
    x: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Per-row class-dispatched MLP (the fine-decoder TPU design).

    The reference keeps a Python dict of per-class tcnn networks and scatters
    points between them (reference: slams/mapping.py:590-601). Since the class
    of every sample comes from its *ray's* GT label, dnsjax stores one stacked
    parameter tensor per layer ``[n_class, in, out]`` and gathers each row's
    weights, turning dispatch into a batched matmul.

    Args:
      stacked: {"w": [(C, in, h), (C, h, out)], "b": [(C, h), (C, out)]}.
      classes: (N,) int class id per row.
      x: (N, S, in) — S samples per row (all share the row's class).
    Returns:
      (N, S, out) float32.
    """
    if x.shape[1] == 1:
        # S=1 (mesh/vertex queries): the per-row weight-matrix take writes
        # and re-reads ~1 GB of gathered weights per 131k-point chunk with
        # nothing to amortize it over. Build each row's weights as a
        # one-hot x stacked-weights matmul instead — 0/1 selection in bf16
        # is exact (same rows bit-for-bit), and the MXU matmul measured 6x
        # faster than the take at the mesh bench shape (scripts/
        # probe_mesh_bisect2.py: 1.1 vs 6.9 ms for 131072 rows, 52 classes).
        # Clamp like jnp.take does on the S>1 path below: one_hot would
        # ZERO out-of-range ids (selecting all-zero weights), silently
        # diverging from the take path's clamp-to-nearest semantics.
        C = stacked["w"][0].shape[0]
        oh = jax.nn.one_hot(jnp.clip(classes, 0, C - 1), C,
                            dtype=compute_dtype)
        return _mlp_apply_onehot(stacked, oh, x[:, 0], compute_dtype)[:, None]
    prec = _precision_for(compute_dtype)
    h = x.astype(compute_dtype)
    n = len(stacked["w"])
    for i, (w, b) in enumerate(zip(stacked["w"], stacked["b"])):
        wg = jnp.take(w, classes, axis=0).astype(compute_dtype)  # (N, in, out)
        bg = jnp.take(b, classes, axis=0)  # (N, out)
        h = (
            jnp.einsum("nsi,nio->nso", h, wg,
                       preferred_element_type=jnp.float32, precision=prec)
            + bg[:, None, :]
        )
        if i < n - 1:
            h = jax.nn.relu(h).astype(compute_dtype)
    return h.astype(jnp.float32)


def _mlp_apply_onehot(
    stacked: Dict[str, Sequence[jnp.ndarray]],
    oh: jnp.ndarray,
    x: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Class-dispatched MLP via one-hot weight selection: ``oh (N, C)``
    0/1 rows, ``x (N, in)``. Equivalent to gathering each row's class
    weights (one-hot matmul against bf16-cast weights reproduces the cast
    rows exactly: 1.0*w round-trips bf16 and adding zeros is exact)."""
    prec = _precision_for(compute_dtype)
    h = x.astype(compute_dtype)
    n = len(stacked["w"])
    for i, (w, b) in enumerate(zip(stacked["w"], stacked["b"])):
        C, I, O = w.shape
        weff = jnp.matmul(
            oh, w.reshape(C, I * O).astype(compute_dtype),
            preferred_element_type=compute_dtype, precision=prec,
        ).reshape(-1, I, O)
        bg = jnp.matmul(oh, b, preferred_element_type=jnp.float32,
                        precision=prec)
        h = (
            jnp.einsum("ni,nio->no", h, weff,
                       preferred_element_type=jnp.float32, precision=prec)
            + bg
        )
        if i < n - 1:
            h = jax.nn.relu(h).astype(compute_dtype)
    return h.astype(jnp.float32)


def init_stacked_mlp(
    key: jax.Array,
    n_stack: int,
    in_dim: int,
    hidden_dim: int,
    out_dim: int,
    n_hidden_layers: int = 1,
) -> Dict[str, List[jnp.ndarray]]:
    """Stack of independently-initialized MLPs: params lead with axis C."""
    keys = jax.random.split(key, n_stack)
    per = [init_mlp(k, in_dim, hidden_dim, out_dim, n_hidden_layers) for k in keys]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *per)
