"""Sub-bisect the mesh-query TAIL (probe_mesh_bisect found tail ~12.5 ms
on-device vs scan ~9.5 ms at the 131072x16 bench shape; ~27 ms tunnel RTT
rides on every number below — compare deltas, not absolutes).

Cases:
  pe-only     : oneblob + hashgrid encode (the 2.1M tiny-row hash gathers)
  oneblob-only: oneblob alone (polynomial, should be ~free)
  fine-only   : class-dispatched fine MLP from precomputed pe/grid
                (the per-point weight-matrix take + einsum)
  fine-onehot : same math as one-hot matmul (MXU instead of row gathers)
  out-only    : color head from precomputed inputs (logits DCEd in _query)

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_mesh_bisect2.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from dnsjax.config import load_config
from dnsjax.models.decoder import (
    DecoderSpec,
    init_decoder_params,
    out_apply,
    pos_encode,
    fine_apply,
)
from dnsjax.ops.oneblob import oneblob_encode

B = 131072
N_CLASS = 52


def _min3(fn):
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    bound_np = np.asarray([[-2.9, 8.9], [-3.2, 5.5], [-3.5, 3.3]])
    cfg = load_config("configs/replica/replica.yaml", "configs/slam.yaml")
    spec = DecoderSpec.from_config(cfg, bound_np, N_CLASS)
    params = init_decoder_params(jax.random.PRNGKey(0), spec)
    cdt = jnp.bfloat16
    h = spec.hidden_dim

    pts01 = jnp.asarray(rng.uniform(0, 1, size=(B, 3)).astype(np.float32))
    classes = jnp.asarray(rng.integers(0, N_CLASS, size=(B,)), jnp.int32)

    @jax.jit
    def pe_only(params, pts01):
        pe, grid = pos_encode(params, pts01, spec)
        return pe.sum() + grid.sum()

    @jax.jit
    def ob_only(pts01):
        return oneblob_encode(pts01, spec.n_bins, spec.oneblob_kernel).sum()

    pe_v, grid_v = jax.jit(
        lambda p, x: pos_encode(p, x, spec)
    )(params, pts01)
    pe_v, grid_v = jax.block_until_ready(pe_v), jax.block_until_ready(grid_v)

    @jax.jit
    def fine_only(params, classes, pe, grid):
        return fine_apply(
            params, classes, pe[:, None, :], grid[:, None, :], cdt
        )[:, 0]

    @jax.jit
    def fine_onehot(params, classes, pe, grid):
        x = jnp.concatenate([pe, grid], -1).astype(cdt)
        oh = jax.nn.one_hot(classes, N_CLASS, dtype=cdt)  # (N, C)
        hdn = x
        ws, bs = params["fine"]["w"], params["fine"]["b"]
        n = len(ws)
        for i, (w, b) in enumerate(zip(ws, bs)):
            C, I, O = w.shape
            weff = jnp.matmul(
                oh, w.reshape(C, I * O).astype(cdt),
                preferred_element_type=cdt,
            ).reshape(B, I, O)
            bg = jnp.matmul(oh, b.astype(cdt),
                            preferred_element_type=jnp.float32)
            hdn = (
                jnp.einsum("ni,nio->no", hdn, weff,
                           preferred_element_type=jnp.float32)
                + bg
            )
            if i < n - 1:
                hdn = jax.nn.relu(hdn).astype(cdt)
        return hdn

    lat = jax.block_until_ready(fine_only(params, classes, pe_v, grid_v))
    code = jnp.zeros((B, h))

    @jax.jit
    def out_only(params, pe, lat, code):
        color, _ = out_apply(
            params, pe, jnp.concatenate([lat[:, 1:], code], -1), cdt
        )
        return color

    # correctness: onehot == gathered (same precision config)
    a = np.asarray(fine_only(params, classes, pe_v, grid_v))
    b = np.asarray(fine_onehot(params, classes, pe_v, grid_v))
    err = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    print(f"fine onehot vs gathered rel err: {err:.2e}")

    def mk(fn, *args):
        def run():
            o = fn(*args)
            _ = float(jnp.vdot(o, o)) if o.ndim else float(o)
        return run

    cases = [
        ("pe-only", mk(pe_only, params, pts01)),
        ("oneblob-only", mk(ob_only, pts01)),
        ("fine-only", mk(fine_only, params, classes, pe_v, grid_v)),
        ("fine-onehot", mk(fine_onehot, params, classes, pe_v, grid_v)),
        ("out-only", mk(out_only, params, pe_v, lat, code)),
    ]
    for label, run in cases:
        run()
        s = _min3(run)
        print(f"{label:14s} {s*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
