"""Probe: flatten the 2D feature-row gather across frames x views.

probe_buckets A1 measured the mapping iteration's feature gather at
3.46 ms for 281k bf16 rows (~12 ns/row) — an order of magnitude off the
~1 ns/row flat single-axis gather the hash encode gets. The difference:
the mapper vmaps over T frames and match_features vmaps over R views,
each (t, r) with its OWN (Hf, Wf, C) table, so XLA lowers a gather with
operand batching dims instead of the fast flat path.

Variants (all bit-identical values to the current code):
  proj    projection + mask only (no gather) — floor for the bucket
  a1      current: vmap(T) x vmap(R), per-table flat gather
  flatR   vmap over T; inside, ONE (R*Hf*Wf, C) flat table per frame
  flatTR  no vmap: ONE (T*R*Hf*Wf, C) flat table, global indices

If flatTR ~= proj + rows/1ns the fix is to hoist the gather out of the
per-frame vmap (mapper) and flatten views inside match_features
(tracker/full-render path gets flatR for free).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_feat_flat.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from dnsjax.geometry.rays import project_points, world_to_camera
from dnsjax.models.features import nearest_sample

H, W = 680, 1200
T, R = 4, 3
ITERS = 20
TUNNEL_MS = 27.0

if "--smoke" in sys.argv:
    H, W = 68, 120
    ITERS = 2
    TUNNEL_MS = 0.0
    jax.config.update("jax_platforms", "cpu")

n_ray = 498
S = 47
P = n_ray * S
Hf, Wf = H // 2, W // 2
fx = W / 2.0
cx, cy = (W - 1) / 2.0, (H - 1) / 2.0


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


def scan_sink(body):
    def make(*args):
        keys = jax.random.split(jax.random.PRNGKey(7), ITERS)

        @jax.jit
        def run(*a):
            def step(c, k):
                o = body(k, *a)
                return c, jnp.vdot(o, o)

            _, outs = jax.lax.scan(step, 0.0, keys)
            return jnp.sum(outs)

        return lambda: run(*args)

    return make


def _project(k, pw_t, w2c_t):
    pc = world_to_camera(pw_t + k[0] * 0.0, w2c_t)
    u, v, depth = project_points(pc, fx, fx, cx, cy)
    u, v = jnp.round(u), jnp.round(v)
    mask = (u > 0) & (u < W - 1) & (v > 0) & (v < H - 1) & (depth > 0)
    gx = u * ((Wf - 1.0) / (W - 1.0))
    gy = v * ((Hf - 1.0) / (H - 1.0))
    xi = jnp.clip(jnp.round(gx), 0, Wf - 1).astype(jnp.int32)
    yi = jnp.clip(jnp.round(gy), 0, Hf - 1).astype(jnp.int32)
    return xi, yi, mask


def proj_only(k, pw, w2c, fh):
    def one(pw_t, w2c_t):
        xi, yi, mask = _project(k, pw_t, w2c_t)
        return (xi + yi) * mask

    return jax.vmap(one)(pw, w2c)


def a1(k, pw, w2c, fh):
    def one(pw_t, w2c_t, fh_t):
        xi, yi, mask = _project(k, pw_t, w2c_t)
        code = jax.vmap(
            lambda img, x, y: img.reshape(Hf * Wf, -1)[y * Wf + x]
        )(fh_t, xi, yi)
        return code * mask[..., None]

    return jax.vmap(one)(pw, w2c, fh)


def flat_r(k, pw, w2c, fh):
    def one(pw_t, w2c_t, fh_t):
        xi, yi, mask = _project(k, pw_t, w2c_t)  # (R, P)
        r = jax.lax.broadcasted_iota(jnp.int32, xi.shape, 0)
        idx = (r * Hf + yi) * Wf + xi
        code = fh_t.reshape(R * Hf * Wf, -1)[idx]
        return code * mask[..., None]

    return jax.vmap(one)(pw, w2c, fh)


def flat_tr(k, pw, w2c, fh):
    xi, yi, mask = jax.vmap(lambda p, m: _project(k, p, m))(pw, w2c)  # (T,R,P)
    t = jax.lax.broadcasted_iota(jnp.int32, xi.shape, 0)
    r = jax.lax.broadcasted_iota(jnp.int32, xi.shape, 1)
    idx = (((t * R + r) * Hf) + yi) * Wf + xi
    code = fh.reshape(T * R * Hf * Wf, -1)[idx]
    return code * mask[..., None]


def main():
    rng = np.random.default_rng(0)
    pw = jnp.asarray(rng.uniform(-1, 1, size=(T, P, 3)).astype(np.float32))
    w2c = jnp.broadcast_to(jnp.eye(4), (T, R, 4, 4))
    fh = jnp.asarray(
        rng.standard_normal((T, R, Hf, Wf, 64)).astype(np.float32)
    ).astype(jnp.bfloat16)

    print("backend:", jax.default_backend(), jax.devices()[0].device_kind,
          flush=True)

    k = jax.random.PRNGKey(3)
    ref = a1(k, pw, w2c, fh)
    for name, fn in [("flatR", flat_r), ("flatTR", flat_tr)]:
        got = fn(k, pw, w2c, fh)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                    - got.astype(jnp.float32))))
        print(f"{name} equivalence max|a1 - {name}| = {err:.3e}"
              f" ({'OK' if err == 0.0 else 'MISMATCH'})", flush=True)

    timed("proj+mask only (no gather)", scan_sink(proj_only)(pw, w2c, fh))
    timed("a1 current vmapT x vmapR", scan_sink(a1)(pw, w2c, fh))
    timed("flatR (vmap T, flat over views)", scan_sink(flat_r)(pw, w2c, fh))
    timed("flatTR (one global flat gather)", scan_sink(flat_tr)(pw, w2c, fh))


if __name__ == "__main__":
    main()
