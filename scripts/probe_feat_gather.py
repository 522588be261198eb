"""Time the 2D-feature row gather: 2D-index gather vs flat single-axis gather.

probe_buckets A1 priced the nearest-tap feature gather (R=3 views x ~94k
pts, rows of 64 bf16 from a 340x600 half-res map) at 3.80 ms/iter —
~13.5 ns/row, vs ~1 ns/row for the hashgrid's FLAT row gathers at the same
bench workload. Hypothesis: ``img[yi, xi]`` (two offset dims, vmapped over
views) hits a slow TPU gather lowering; reshaping to (H*W, C) and indexing
with yi*W+xi is bit-identical and should restore the fast path.

This probe times both forms in isolation (jit + 20-iter scan + float
perturbation + scalar sink, per PLAN.md tunnel timing rules) and checks
bit-equality.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_feat_gather.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

R, Hf, Wf, C = 3, 340, 600, 64
P = 93_624  # bench mapping pts per view (T=4 windows x 2000 px x ~47 smp / 4)

ITERS = 20


def timed(fn, *args):
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    float(out)  # warm fetch
    t0 = time.perf_counter()
    v = float(jax.jit(fn)(*args))
    t1 = time.perf_counter()
    return (t1 - t0) / ITERS * 1e3, v


def main():
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind)
    key = jax.random.PRNGKey(0)
    feats = jax.random.normal(key, (R, Hf, Wf, C), jnp.bfloat16)
    gx = jax.random.uniform(key, (R, P), jnp.float32, 0, Wf - 1)
    gy = jax.random.uniform(key, (R, P), jnp.float32, 0, Hf - 1)

    def body_2d(feats, gx, gy):
        def step(c, _):
            gx2 = gx + c * 1e-20  # float perturbation: defeats hoisting
            xi = jnp.clip(jnp.round(gx2), 0, Wf - 1).astype(jnp.int32)
            yi = jnp.clip(jnp.round(gy), 0, Hf - 1).astype(jnp.int32)
            rows = jax.vmap(lambda im, y, x: im[y, x])(feats, yi, xi)
            return c + rows.astype(jnp.float32).sum() * 1e-30, None

        c, _ = jax.lax.scan(step, 0.0, None, length=ITERS)
        return c

    def body_flat(feats, gx, gy):
        flat = feats.reshape(R, Hf * Wf, C)

        def step(c, _):
            gx2 = gx + c * 1e-20
            xi = jnp.clip(jnp.round(gx2), 0, Wf - 1).astype(jnp.int32)
            yi = jnp.clip(jnp.round(gy), 0, Hf - 1).astype(jnp.int32)
            rows = jax.vmap(lambda fl, i: fl[i])(flat, yi * Wf + xi)
            return c + rows.astype(jnp.float32).sum() * 1e-30, None

        c, _ = jax.lax.scan(step, 0.0, None, length=ITERS)
        return c

    def body_flat1(feats, gx, gy):
        # single un-vmapped gather over a stacked (R*Hf*Wf, C) table
        flat = feats.reshape(R * Hf * Wf, C)

        def step(c, _):
            gx2 = gx + c * 1e-20
            xi = jnp.clip(jnp.round(gx2), 0, Wf - 1).astype(jnp.int32)
            yi = jnp.clip(jnp.round(gy), 0, Hf - 1).astype(jnp.int32)
            off = (jnp.arange(R, dtype=jnp.int32) * (Hf * Wf))[:, None]
            rows = flat[(yi * Wf + xi + off).reshape(-1)]
            return c + rows.astype(jnp.float32).sum() * 1e-30, None

        c, _ = jax.lax.scan(step, 0.0, None, length=ITERS)
        return c

    ms2d, v2d = timed(body_2d, feats, gx, gy)
    msfl, vfl = timed(body_flat, feats, gx, gy)
    msf1, vf1 = timed(body_flat1, feats, gx, gy)
    print(f"2D-index gather (vmap R)        {ms2d:8.2f} ms/iter")
    print(f"flat row gather (vmap R)        {msfl:8.2f} ms/iter")
    print(f"flat row gather (stacked 1-hop) {msf1:8.2f} ms/iter")
    ok = np.isclose(v2d, vfl, rtol=1e-5) and np.isclose(v2d, vf1, rtol=1e-5)
    print(f"checksums: {v2d:.6e} {vfl:.6e} {vf1:.6e} ({'OK' if ok else 'MISMATCH'})")


if __name__ == "__main__":
    main()
