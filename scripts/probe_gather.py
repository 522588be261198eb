"""Measure the Pallas matmul-gather forward vs the XLA row gather.

Three rows per backend at the mapping shape (94k pts, TPU grid profile
4x2^16x8 tet4x8, gather_bf16): forward-only encode, fwd+bwd with grads fed
to the scalar sink (DCE-proofed), and the raw dense_matmul_gather kernel.
Points are derived from per-iteration RNG so nothing hoists out of the
timing scan (see probe_scatter2.py docstring for why integer perturbations
are NOT a valid alternative).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_gather.py
"""

import sys
import time

import jax
import jax.numpy as jnp

from dnsjax.ops.hashgrid import HashGridSpec, hash_encode, init_hash_table

# default: the mapping shape; pass e.g. 23500 for the tracking shape
# (500 rays x 47 samples)
N_PTS = int(sys.argv[1]) if len(sys.argv) > 1 else 93624
ITERS = 20
TUNNEL_MS = 27.0

BASE = dict(
    n_levels=4, n_features=8, log2_hashmap_size=16,
    base_resolution=16, desired_resolution=220,
    interp="tet", grad_corners=1, gather_bf16=True, scatter="pallas_sr",
)


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
    print("backend:", jax.default_backend(), jax.devices()[0], flush=True)
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, ITERS)

    for gather in ("xla", "pallas"):
        spec = HashGridSpec(**BASE, gather=gather)
        table = init_hash_table(jax.random.PRNGKey(1), spec)

        def fwd(k, t, spec=spec):
            p = jax.random.uniform(k, (N_PTS, 3))
            e = hash_encode(t, p, spec)
            return jnp.vdot(e, e)

        def fwdbwd(k, t, spec=spec):
            p = jax.random.uniform(k, (N_PTS, 3))

            def loss(t, p):
                e = hash_encode(t, p, spec)
                return jnp.sum(e * (1.0 + 1e-3 * e))

            l, (gt, gp) = jax.value_and_grad(loss, argnums=(0, 1))(t, p)
            return l + jnp.vdot(gt, gt) + jnp.vdot(gp, gp)

        timed(f"encode fwd        [gather={gather}]",
              scan_sink(fwd, keys), table)
        timed(f"encode fwd+bwd    [gather={gather}]",
              scan_sink(fwdbwd, keys), table)

    # raw kernel in isolation (no index/weight computation, no VJP):
    # C uniform random rows + weights per level per iteration
    from dnsjax.ops.gather import dense_matmul_gather
    from dnsjax.ops.hashgrid import _rows_used

    spec = HashGridSpec(**BASE, gather="pallas")
    table = init_hash_table(jax.random.PRNGKey(1), spec)
    L, C = spec.n_levels, spec.n_corners
    R = spec.table_size
    rows_used = _rows_used(spec)

    for wf in (False, True):
        def raw(k, t, wf=wf):
            ki, kw = jax.random.split(k)
            li = jax.random.randint(ki, (L, C, N_PTS), 0, R)
            lw = jax.random.uniform(kw, (L, C, N_PTS))
            out, feats = dense_matmul_gather(
                li, lw, t, rows_used, want_feats=wf
            )
            s = jnp.vdot(out, out)
            if wf:
                s = s + jnp.vdot(feats, feats)
            return s

        timed(f"raw dense_matmul_gather  [want_feats={wf}]",
              scan_sink(raw, keys), table)

    # real-shape equivalence: both backends bf16-quantize rows and
    # accumulate f32; only corner-summation order may differ (ulp-level)
    p = jax.random.uniform(jax.random.PRNGKey(3), (N_PTS, 3))
    outs = {}
    for gather in ("xla", "pallas"):
        spec = HashGridSpec(**BASE, gather=gather)

        @jax.jit
        def enc(t, p, spec=spec):
            return hash_encode(t, p, spec)

        outs[gather] = jax.device_get(enc(table, p))
    d = float(jnp.abs(jnp.asarray(outs["xla"]) - outs["pallas"]).max())
    print(f"fwd equivalence max|xla - pallas| = {d:.3e} "
          f"({'OK' if d < 1e-5 else 'MISMATCH'})", flush=True)


if __name__ == "__main__":
    main()
