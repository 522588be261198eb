"""Decompose the hash-encode backward cost at the bench mapping shape.

profile_scatter.py showed the raw table scatter is ~0.4 ms while the full
encode fwd+bwd is ~15 ms against a ~6 ms forward — ~9 ms of backward is NOT
the scatter. This probe times grad-wrt-table-only, grad-wrt-pts-only, and
both, plus the forward with the residual barrier on/off, to locate it.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_encode_bwd.py
"""

import time

import jax
import jax.numpy as jnp

from dnsjax.ops.hashgrid import HashGridSpec, hash_encode

N_PTS = 93624
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

    spec = HashGridSpec(4, 8, 16, 16, 600, grad_corners=1, gather_bf16=True,
                        interp="tet")
    table = jax.random.normal(key, (4, spec.table_size, 8), jnp.float32) * 0.01

    def enc_loss(t, p):
        return jnp.sum(hash_encode(t, p, spec) ** 2)

    run = scan_sink(lambda k, t, p: enc_loss(t, p + k[0] * 0.0), keys20)
    timed("fwd only", run, table, p01)

    def bwd_table(k, t, p):
        l, g = jax.value_and_grad(enc_loss, argnums=0)(t, p + k[0] * 0.0)
        return l + jnp.vdot(g, g)

    run = scan_sink(bwd_table, keys20)
    timed("fwd + grad(table)", run, table, p01)

    def bwd_pts(k, t, p):
        l, g = jax.value_and_grad(enc_loss, argnums=1)(t, p + k[0] * 0.0)
        return l + jnp.vdot(g, g)

    run = scan_sink(bwd_pts, keys20)
    timed("fwd + grad(pts)", run, table, p01)

    def bwd_both(k, t, p):
        l, g = jax.value_and_grad(enc_loss, argnums=(0, 1))(t, p + k[0] * 0.0)
        return l + jnp.vdot(g[0], g[0]) + jnp.vdot(g[1], g[1])

    run = scan_sink(bwd_both, keys20)
    timed("fwd + grad(table, pts)", run, table, p01)

    # exact-corner scatter variant (C=4 rows/pt/level instead of 1)
    spec_c4 = HashGridSpec(4, 8, 16, 16, 600, grad_corners=4,
                           gather_bf16=True, interp="tet")

    def enc_loss_c4(t, p):
        return jnp.sum(hash_encode(t, p, spec_c4) ** 2)

    def bwd_both_c4(k, t, p):
        l, g = jax.value_and_grad(enc_loss_c4, argnums=(0, 1))(t, p + k[0] * 0.0)
        return l + jnp.vdot(g[0], g[0]) + jnp.vdot(g[1], g[1])

    run = scan_sink(bwd_both_c4, keys20)
    timed("fwd + grad(table, pts) exact corners", run, table, p01)

    # f32 gathers (no bf16 cast on the table rows)
    spec_f32 = HashGridSpec(4, 8, 16, 16, 600, grad_corners=1,
                            gather_bf16=False, interp="tet")

    def enc_loss_f(t, p):
        return jnp.sum(hash_encode(t, p, spec_f32) ** 2)

    def bwd_both_f(k, t, p):
        l, g = jax.value_and_grad(enc_loss_f, argnums=(0, 1))(t, p + k[0] * 0.0)
        return l + jnp.vdot(g[0], g[0]) + jnp.vdot(g[1], g[1])

    run = scan_sink(bwd_both_f, keys20)
    timed("fwd + grad(table, pts) f32 gathers", run, table, p01)


if __name__ == "__main__":
    main()
