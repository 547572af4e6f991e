#!/usr/bin/env python
"""Round-5 256^3 kernel-level isolation: pass1 vs pass2, brick-shape sweep.

exp256b_r05.py pinned the non-combine overhead INSIDE the Lanczos loop
(~0.8 ms/iteration j-independent on top of ~0.77 TB/s streaming). This
script times the pass1 and pass2 kernels SEPARATELY in chunked
fori_loops (the reliable unit through the tunnel) at early/late j, plus
the full matfunc under forced brick shapes, to locate the overhead:
per-program grain, halo streams, or stream-count scaling.

All timed loops feed the kernel output back into one input so nothing is
dead-code eliminated; W_0..W_{j-1} stay loop-constant (they are re-read
from HBM each call, exactly like production).

Usage: python benchmarks/exp256d_r05.py [--n 256] [--reps 5] [--k 30]
"""

import argparse
import json
import os
import sys
import time
from contextlib import contextmanager

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@contextmanager
def patched(obj, **repl):
    old = {k: getattr(obj, k) for k in repl}
    for k, v in repl.items():
        setattr(obj, k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            setattr(obj, k, v)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--k", type=int, default=240)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from nlsolvers_tpu.ops import operators as ops
    from nlsolvers_tpu.ops.pallas import lanczos2d as l2
    from nlsolvers_tpu.ops.pallas import lanczos3d_pipe as l3

    n = args.n
    shape = (n, n, n)
    P, R, nx = 2, n * n, n
    nz = ny = n
    dx = 2 * 10.0 / (n - 1)
    lap = ops.laplacian_3d(shape, dx, dtype=jnp.float32)
    desc = lap._pallas_desc
    scale, sign, variant = desc["scale"], desc["sign"], desc["variant"]
    t = np.complex64(1e-4j)
    rng = np.random.default_rng(0)
    u0 = (0.1 * rng.standard_normal((P, R, nx))).astype(np.float32)

    # loop-constant basis columns (random, unit-ish scale)
    def mk_w():
        return jnp.asarray(
            (0.1 * rng.standard_normal((P, nz, ny, nx))).astype(np.float32))

    results = []

    def timeit(name, fn, state, bytes_model):
        state = fn(state)
        jax.tree.map(lambda x: np.asarray(x[..., :1, :8])
                     if hasattr(x, "shape") and x.ndim >= 2 else None,
                     state)
        ts = []
        for _ in range(args.reps):
            t0 = time.time()
            state = fn(state)
            np.asarray(state[:, :1, :1, :8] if state.ndim == 4
                       else state[:, :1, :8])
            ts.append((time.time() - t0) / args.k)
        ts.sort()
        med = 1e3 * float(np.median(ts))
        row = {
            "metric": name, "ms_median": round(med, 3),
            "ms_min": round(1e3 * ts[0], 3),
            "model_gb": round(bytes_model / 1e9, 3),
            "eff_tbs": round(bytes_model / (med * 1e-3) / 1e12, 3),
        }
        print(json.dumps(row), flush=True)
        results.append(row)

    sc = P * nz * ny * nx * 4

    # --- pass1 (brick) at j in {2, 8} ------------------------------------
    # NB the basis columns are passed as jit ARGUMENTS: closure constants
    # would be baked into the compile upload (134 MB each -> HTTP 413
    # through the tunnel's remote_compile endpoint)
    for j in (2, 8):
        tz, ty = l3.pick_brick3d(nz, ny, nx, j, P, 0)
        Ws = [mk_w() for _ in range(j)]
        scal = jnp.asarray([[1.0, 0.0]], jnp.float32)
        call = l3._pass1zy_call(j, P, nz, ny, nx, tz, ty, scale, sign,
                                variant, False)

        def run1(x, *Ws, call=call, ty=ty):
            def body(i, x):
                h = l3.gather_y_halos(x, ty, variant)
                w, raw = call(scal, x, h, x, x, *Ws)
                return w.reshape(P, nz, ny, nx)
            return lax.fori_loop(0, args.k, body, x)

        fn = jax.jit(run1)
        timeit(f"pass1_brick_j{j}_tz{tz}_ty{ty}",
               lambda x, fn=fn, Ws=Ws: fn(x, *Ws), mk_w(), (j + 2) * sc)

    # --- pass2 at j in {2, 8}, default and enlarged tiles -----------------
    for j, tile in ((2, None), (8, None), (2, 1024), (8, 1024),
                    (8, 2048)):
        Ws = [jnp.asarray(mk_w().reshape(P, R, nx)) for _ in range(j + 1)]
        q = jnp.asarray(0.01 * rng.standard_normal((j + 1, 2)), jnp.float32)
        if tile is None:
            tile = l2._pick_tile(R, nx, j + 4, nplanes=P)
        if 2 * (j + 4) * tile * P * nx * 4 > 110 * 2**20:
            continue
        call = l2._pass2_call(j, P, R, nx, tile, False)

        def run2(x, *Ws, call=call):
            def body(i, x):
                wn, nsq = call(q, x, *Ws)
                return wn
            return lax.fori_loop(0, args.k, body, x)

        fn = jax.jit(run2)
        timeit(f"pass2_j{j}_tile{tile}",
               lambda x, fn=fn, Ws=Ws: fn(x, *Ws),
               jnp.asarray(mk_w().reshape(P, R, nx)), (j + 3) * sc)

    # --- full matfunc under forced brick shapes --------------------------
    def mf_fn():
        def body(i, x):
            del i
            return l2.matfunc_apply_planar(x, desc, t, "exp", 10)
        return jax.jit(lambda x: lax.fori_loop(0, args.k // 3, body, x))

    for shape_opt in (None, (8, 128), (16, 64), (64, 16), (128, 8)):
        name = "auto" if shape_opt is None else ("tz%d_ty%d" % shape_opt)
        if shape_opt is None:
            fn = mf_fn()
        else:
            forced = shape_opt
            with patched(l3, pick_brick3d=lambda *a, f=forced: f):
                fn = mf_fn()
                out = fn(jnp.asarray(u0))
                np.asarray(out[:, :1, :8])
        st = jnp.asarray(u0)
        st = fn(st)
        np.asarray(st[:, :1, :8])
        ts = []
        for _ in range(args.reps):
            t0 = time.time()
            st = fn(st)
            np.asarray(st[:, :1, :8])
            ts.append((time.time() - t0) / (args.k // 3))
        ts.sort()
        print(json.dumps({
            "metric": f"matfunc_brick_{name}",
            "ms_median": round(1e3 * float(np.median(ts)), 2),
            "ms_min": round(1e3 * ts[0], 2),
        }), flush=True)


if __name__ == "__main__":
    main()
