"""Microbenchmarks: hash-table gradient scatter strategies on the real TPU.

Shapes mirror one mapping iteration of the TPU Replica profile
(configs/slam.yaml model.grid: 4 levels x 2^16 rows x 8 feats;
n_pixels=2000 x 47 samples/ray, stochastic-corner backward -> one
contribution row per (point, level)).

Timing per .claude/skills/verify: end in a true scalar, time float(),
min-of-3 on a warm process, subtract the ~27 ms tunnel roundtrip.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

TUNNEL_S = 0.027
L, T, F = 4, 1 << 16, 8
N = 2000 * 47  # contributions per level


def timeit(name, fn, *args):
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    t = min(ts[1:]) - TUNNEL_S
    print(f"{name:42s} {t*1e3:8.2f} ms")
    return t


def main():
    print("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (L, N), 0, T, dtype=jnp.int32)
    vals = jax.random.normal(key, (L, N, F), jnp.float32)
    flat_idx = (idx + jnp.arange(L)[:, None] * T).reshape(-1)
    flat_vals = vals.reshape(-1, F)
    table = jax.random.normal(key, (L * T, F), jnp.float32)

    # --- forward gather rate (ceiling reference) -------------------------
    gidx = jax.random.randint(key, (L * N * 4,), 0, L * T, dtype=jnp.int32)

    @jax.jit
    def gather_sink(table, gidx):
        rows = jnp.take(table, gidx, axis=0)
        return jnp.vdot(rows, rows)

    t = timeit(f"XLA gather {gidx.size} rows f32", gather_sink, table, gidx)
    print(f"    -> {t/gidx.size*1e9:.2f} ns/row")

    @jax.jit
    def gather_sink_bf16(table, gidx):
        rows = jnp.take(table.astype(jnp.bfloat16), gidx, axis=0)
        return jnp.vdot(rows, rows)

    t = timeit(f"XLA gather {gidx.size} rows bf16", gather_sink_bf16, table, gidx)
    print(f"    -> {t/gidx.size*1e9:.2f} ns/row")

    # --- XLA scatter-add (status quo backward) ---------------------------
    @jax.jit
    def xla_scatter(flat_idx, flat_vals):
        g = jnp.zeros((L * T, F), jnp.float32).at[flat_idx].add(flat_vals)
        return jnp.vdot(g, g)

    t = timeit(f"XLA scatter-add {L*N} rows", xla_scatter, flat_idx, flat_vals)
    print(f"    -> {t/(L*N)*1e9:.2f} ns/row")

    # --- Pallas dense matmul scatter ------------------------------------
    from dnsjax.ops.scatter import dense_matmul_scatter

    @jax.jit
    def pallas_scatter(idx, vals):
        g = dense_matmul_scatter(idx, vals, T)
        return jnp.vdot(g, g)

    # correctness check first
    g_ref = np.zeros((L * T, F), np.float32)
    np.add.at(g_ref, np.asarray(flat_idx), np.asarray(flat_vals))
    g_pal = np.asarray(dense_matmul_scatter(idx, vals, T)).reshape(L * T, F)
    err = np.abs(g_pal - g_ref).max() / (np.abs(g_ref).max() + 1e-9)
    print(f"pallas dense matmul scatter rel err: {err:.2e}")

    t = timeit(f"Pallas matmul-scatter {L*N} rows", pallas_scatter, idx, vals)
    print(f"    -> {t/(L*N)*1e9:.2f} ns/row")


if __name__ == "__main__":
    main()
