"""Focused A/B of the hash-encode table-gradient scatter backends.

Times hash_encode forward and fwd+bwd at the bench mapping shape (94k
points, TPU tet4x8 grid profile) for scatter = xla | pallas | pallas_split
in ONE process, plus the raw dense_matmul_scatter kernel against the XLA
scatter-add it replaces. Same axon timing discipline as profile_map.py
(scan under one jit, scalar sink fed by the grads, min-of-3).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_scatter.py
"""

import time

import jax
import jax.numpy as jnp

from dnsjax.ops.hashgrid import HashGridSpec, hash_encode
from dnsjax.ops.scatter import dense_matmul_scatter

N_PTS = 93624
ITERS = 20
TUNNEL_MS = 27.0


def timed(name, fn, *args):
    out = fn(*args)
    _ = float(out)  # compile + warm
    reps = []
    for _i in range(3):
        t0 = time.perf_counter()
        _ = float(fn(*args))
        reps.append(time.perf_counter() - t0)
    ms = (min(reps) * 1e3 - TUNNEL_MS) / ITERS
    print(f"{name:46s} {ms:8.2f} ms/iter", flush=True)
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
    p01 = jax.random.uniform(key, (N_PTS, 3))

    for backend in ("xla", "pallas", "pallas_split"):
        spec = HashGridSpec(
            4, 8, 16, 16, 600, grad_corners=1, gather_bf16=True,
            interp="tet", scatter=backend,
        )
        table = jax.random.normal(key, (4, spec.table_size, 8), jnp.float32) * 0.01

        def enc_loss(t, p, spec=spec):
            return jnp.sum(hash_encode(t, p, spec) ** 2)

        def enc_bwd(k, t, p, enc_loss=enc_loss):
            l, g = jax.value_and_grad(enc_loss, argnums=(0, 1))(t, p + k[0] * 0.0)
            return l + jnp.vdot(g[0], g[0]) + jnp.vdot(g[1], g[1])

        run = scan_sink(enc_bwd, keys20)
        timed(f"hash_encode fwd+bwd [{backend}]", run, table, p01)

    # raw kernel vs raw XLA scatter at the same contribution shape
    # (stochastic corner: N rows per level)
    R = 1 << 16
    idx = jax.random.randint(key, (4, N_PTS), 0, R, jnp.int32)
    vals = jax.random.normal(key, (4, N_PTS, 8), jnp.float32)

    for name, fn in (
        ("raw XLA scatter-add", lambda i, v: dense_matmul_scatter(
            i, v, R, use_pallas=False)),
        ("raw dense_matmul_scatter", lambda i, v: dense_matmul_scatter(
            i, v, R)),
        ("raw dense_matmul_scatter split", lambda i, v: dense_matmul_scatter(
            i, v, R, split=True)),
    ):
        run = scan_sink(
            lambda k, i, v, fn=fn: jnp.vdot(fn(i + (k[0] * 0).astype(i.dtype), v),
                                            fn(i, v)),
            keys20,
        )
        timed(name, run, idx, vals)


if __name__ == "__main__":
    main()
