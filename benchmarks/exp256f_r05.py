#!/usr/bin/env python
"""Round-5 256^3 step-overhead probe: phase kicks + Neumann ghost copy.

perf_table r05 measures the production 256^3 SS2 step at 32.4 ms while
the bare matfunc runs 29.3 ms — ~3 ms in the two planar phase kicks and
the per-step no-flux ghost copy. This times those pieces in k-long
fori_loops, interleaved:

  kick        one planar phase kick (cos/sin rotation + density)
  kick_bc     kick + neumann_no_velocity_3d (the 6 .at[].set face copies)
  kick_clip   kick + the same BC as ONE clamped-index formulation
              (u[clip(z), clip(y), clip(x)] — algebraically identical to
              the ordered face copies, see the derivation in
              ops/boundaries.py if adopted)

Usage: python benchmarks/exp256f_r05.py [--n 256] [--reps 5] [--k 200]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--k", type=int, default=200)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from nlsolvers_tpu.models import nlse as nlse_mod
    from nlsolvers_tpu.models.nonlinearities import nlse_density_planar
    from nlsolvers_tpu.ops import boundaries as bcs

    n = args.n
    shape = (n, n, n)
    R = n * n
    rng = np.random.default_rng(0)
    u0 = (0.1 * rng.standard_normal((2, R, n))).astype(np.float32)
    m2 = jnp.ones((R, n), jnp.float32)
    rho = nlse_density_planar("cubic", m2)

    iz = jnp.asarray(np.clip(np.arange(n), 1, n - 2))

    def clip_bc(ug):                       # (2, nz, ny, nx)
        # one clamped-index gather per axis == the ordered 6-face copy
        ug = jnp.take(ug, iz, axis=1)
        ug = jnp.take(ug, iz, axis=2)
        return jnp.take(ug, iz, axis=3)

    def kick(up):
        return nlse_mod.phase_kick_planar(up, rho(up), 0.5 * 1e-4)

    def body_kick(i, up):
        del i
        return kick(up)

    def body_kick_bc(i, up):
        del i
        up = kick(up)
        return bcs.neumann_no_velocity_3d(
            up.reshape((2,) + shape)).reshape(2, R, n)

    def body_kick_clip(i, up):
        del i
        up = kick(up)
        return clip_bc(up.reshape((2,) + shape)).reshape(2, R, n)

    zi = jnp.arange(n).reshape(n, 1, 1)
    yi = jnp.arange(n).reshape(1, n, 1)
    xi = jnp.arange(n).reshape(1, 1, n)
    int_y = (yi >= 1) & (yi <= n - 2)
    int_z = (zi >= 1) & (zi <= n - 2)

    def where_bc(u):
        # same ordered face copies as neumann_no_velocity_3d, as a
        # where-chain (fusable into one elementwise pass)
        u = jnp.where((xi == 0) & int_y & int_z, u[..., :, :, 1:2], u)
        u = jnp.where((xi == n - 1) & int_y & int_z, u[..., :, :, -2:-1], u)
        u = jnp.where((yi == 0) & int_z, u[..., :, 1:2, :], u)
        u = jnp.where((yi == n - 1) & int_z, u[..., :, -2:-1, :], u)
        u = jnp.where(zi == 0, u[..., 1:2, :, :], u)
        u = jnp.where(zi == n - 1, u[..., -2:-1, :, :], u)
        return u

    def body_kick_where(i, up):
        del i
        up = kick(up)
        return where_bc(up.reshape((2,) + shape)).reshape(2, R, n)

    variants = []
    for name, body in (("kick", body_kick), ("kick_bc", body_kick_bc),
                       ("kick_clip", body_kick_clip),
                       ("kick_where", body_kick_where)):
        fn = jax.jit(lambda x, body=body: lax.fori_loop(0, args.k, body, x))
        out = fn(jnp.asarray(u0))
        np.asarray(out[:, :1, :8])
        variants.append((name, fn))

    times = {name: [] for name, _ in variants}
    state = {name: jnp.asarray(u0) for name, _ in variants}
    for rep in range(args.reps):
        for name, fn in variants:
            t0 = time.time()
            state[name] = fn(state[name])
            np.asarray(state[name][:, :1, :8])
            times[name].append((time.time() - t0) / args.k)
    for name, _ in variants:
        ts = sorted(times[name])
        print(json.dumps({
            "metric": f"exp256f_{name}", "n": n, "k": args.k,
            "ms_median": round(1e3 * float(np.median(ts)), 3),
            "ms_min": round(1e3 * ts[0], 3),
        }), flush=True)

    # sanity: the clip formulation equals the ordered face copies
    x = jnp.asarray(u0).reshape((2,) + shape)
    a = np.asarray(bcs.neumann_no_velocity_3d(x)[:, :2, :4, :4])
    b = np.asarray(clip_bc(x)[:, :2, :4, :4])
    print(json.dumps({"metric": "exp256f_clip_equals_setchain",
                      "ok": bool(np.array_equal(
                          np.asarray(bcs.neumann_no_velocity_3d(x)),
                          np.asarray(clip_bc(x))))}), flush=True)
    print(json.dumps({"metric": "exp256f_where_equals_setchain",
                      "ok": bool(np.array_equal(
                          np.asarray(bcs.neumann_no_velocity_3d(x)),
                          np.asarray(where_bc(x))))}), flush=True)


if __name__ == "__main__":
    main()
