"""True raw-scatter costs + pallas-backend encode table-grad.

probe_encode_bwd.py localized ~6.2 ms/iter in the table gradient, yet
profile_scatter.py's "raw" rows measured ~0.4 ms — because its integer
perturbation (idx + (k[0]*0)) constant-folds, so XLA hoisted the
loop-invariant scatter out of the timing scan. (Float perturbations
p + k[0]*0.0 survive: 0*x -> 0 is not a valid f32 rewrite under NaN
semantics.) Here every iteration derives indices from per-iteration RNG,
so nothing hoists.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_scatter2.py
"""

import time

import jax
import jax.numpy as jnp

from dnsjax.ops.hashgrid import HashGridSpec, hash_encode
from dnsjax.ops.scatter import dense_matmul_scatter

N_PTS = 93624
L, F = 4, 8
R = 1 << 16
ITERS = 20
TUNNEL_MS = 27.0


def timed(name, fn, *args):
    out = fn(*args)
    _ = float(out)
    reps = []
    for _i in range(3):
        t0 = time.perf_counter()
        _ = float(fn(*args))
        reps.append(time.perf_counter() - t0)
    ms = (min(reps) * 1e3 - TUNNEL_MS) / ITERS
    print(f"{name:52s} {ms:8.2f} ms/iter", flush=True)
    return ms


def scan_sink(body, keys):
    @jax.jit
    def run(*args):
        def step(c, k):
            return c, body(k, *args)
        _, outs = jax.lax.scan(step, 0, keys)
        return jnp.vdot(outs, outs)
    return run


def main():
    key = jax.random.PRNGKey(0)
    keys20 = jax.random.split(key, ITERS)
    vals = jax.random.normal(key, (L, N_PTS, F), jnp.float32)

    # RNG cost floor (shared by every row below)
    def rng_only(k, v):
        u = jax.random.uniform(k, (L, N_PTS))
        return jnp.sum(u) + v[0, 0, 0]

    timed("per-iter RNG floor", scan_sink(rng_only, keys20), vals)

    def uniform_idx(k):
        u = jax.random.uniform(k, (L, N_PTS))
        return (u * R).astype(jnp.int32)

    def clustered_idx(k):
        # level-0-like clustering: 94k contributions over ~4.9k rows
        u = jax.random.uniform(k, (L, N_PTS))
        return (u * 4913).astype(jnp.int32)

    for idx_name, idx_fn in (("uniform", uniform_idx),
                             ("clustered-5k", clustered_idx)):
        def xla_s(k, v, idx_fn=idx_fn):
            out = dense_matmul_scatter(idx_fn(k), v, R, use_pallas=False)
            return jnp.vdot(out, out)

        timed(f"XLA scatter-add [{idx_name} idx]",
              scan_sink(xla_s, keys20), vals)

        def pal_s(k, v, idx_fn=idx_fn):
            out = dense_matmul_scatter(idx_fn(k), v, R)
            return jnp.vdot(out, out)

        timed(f"dense_matmul_scatter [{idx_name} idx]",
              scan_sink(pal_s, keys20), vals)

        def pal_split(k, v, idx_fn=idx_fn):
            out = dense_matmul_scatter(idx_fn(k), v, R, split=True)
            return jnp.vdot(out, out)

        timed(f"dense_matmul_scatter split [{idx_name} idx]",
              scan_sink(pal_split, keys20), vals)

    # encode grad(table)-only through each backend
    p01 = jax.random.uniform(key, (N_PTS, 3))
    for backend in ("xla", "pallas", "pallas_split", "pallas_sr"):
        spec = HashGridSpec(L, F, 16, 16, 600, grad_corners=1,
                            gather_bf16=True, interp="tet", scatter=backend)
        table = jax.random.normal(key, (L, R, F), jnp.float32) * 0.01

        def bwd_table(k, t, p, spec=spec):
            def loss(tt, pp):
                return jnp.sum(hash_encode(tt, pp, spec) ** 2)
            l, g = jax.value_and_grad(loss)(t, p + k[0] * 0.0)
            return l + jnp.vdot(g, g)

        timed(f"encode fwd + grad(table) [{backend}]",
              scan_sink(bwd_table, keys20), table, p01)


if __name__ == "__main__":
    main()
