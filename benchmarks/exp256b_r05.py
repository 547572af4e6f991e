#!/usr/bin/env python
"""Round-5 256^3 overhead isolation (follow-up to exp256_r05.py).

The m-sweep in exp256_r05.py fits the 256^3 m=10 matfunc (32.75 ms) to
kernels streaming at ~0.77 TB/s PLUS ~0.8 ms/iteration and ~3 ms/matfunc
of non-bandwidth overhead (~10 ms total). This script isolates the
suspects by timing m=10 matfunc variants INTERLEAVED (timing-only
monkeypatches — outputs of patched variants are wrong and never checked):

  base       production matfunc_apply_planar
  noeigh     tridiag_eigh replaced by (alpha, I) — isolates the 10x10
             jnp.linalg.eigh (QDWH) cost
  nogather   gather_y_halos replaced by cheap zeros — isolates the
             jnp-side y-halo gather (take + .at.set + stack) traffic
  lanczos    lanczos_planar alone (no eigh, no coefficient solve, no
             final MAC combine) — the pure two-kernel iteration loop

Usage: python benchmarks/exp256b_r05.py [--n 256] [--reps 5] [--k 12]
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
    ap.add_argument("--k", type=int, default=12)
    ap.add_argument("--m", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from nlsolvers_tpu.ops import operators as ops
    from nlsolvers_tpu.ops.pallas import lanczos2d as l2
    from nlsolvers_tpu.ops.pallas import lanczos3d_pipe as l3

    n, m = args.n, args.m
    shape = (n, n, n)
    R = n * n
    dx = 2 * 10.0 / (n - 1)
    lap = ops.laplacian_3d(shape, dx, dtype=jnp.float32)
    desc = lap._pallas_desc
    t = np.complex64(1e-4j)
    rng = np.random.default_rng(0)
    u0 = (0.1 * rng.standard_normal((2, R, n))).astype(np.float32)

    def cheap_eigh(alpha, beta):
        return alpha, jnp.eye(alpha.shape[0], dtype=jnp.float32)

    def zero_gather(a4, ty, variant):
        P, nz, ny, nx = a4.shape
        return jnp.zeros((P, nz, ny // ty, 2, nx), a4.dtype)

    def compile_variant(body, patches):
        with patches:
            fn = jax.jit(lambda x: lax.fori_loop(0, args.k, body, x))
            out = fn(jnp.asarray(u0))
            np.asarray(out[:, :1, :8])
        return fn

    def mf_body(i, x):
        del i
        return l2.matfunc_apply_planar(x, desc, t, "exp", m)

    def lanczos_body(i, x):
        del i
        W, s, alphas, betas, beta0 = l2.lanczos_planar(x, desc, m)
        # data-dependent tie-back so nothing is dead-code eliminated;
        # one extra elementwise AXPY over two columns (~0.5 ms)
        return W[0] + betas[-1] * 1e-6 * W[m - 1]

    @contextmanager
    def nullctx():
        yield

    variants = [
        ("base", compile_variant(mf_body, nullctx())),
        ("noeigh", compile_variant(mf_body,
                                   patched(l2, tridiag_eigh=cheap_eigh))),
        ("nogather", compile_variant(mf_body,
                                     patched(l3,
                                             gather_y_halos=zero_gather))),
        ("lanczos", compile_variant(lanczos_body, nullctx())),
    ]

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
            "metric": f"exp256b_{name}", "n": n, "m": m, "k": args.k,
            "matfunc_ms_median": round(1e3 * float(np.median(ts)), 2),
            "matfunc_ms_min": round(1e3 * ts[0], 2),
            "matfunc_ms_max": round(1e3 * ts[-1], 2),
        }), flush=True)


if __name__ == "__main__":
    main()
