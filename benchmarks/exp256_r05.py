#!/usr/bin/env python
"""Round-5 256^3 decomposition experiments (VERDICT r4 next #1).

The 256^3 brick two-pass sits at 0.62 of stream peak vs 0.84-0.86
everywhere else; the round-4 diagnosis ("late iterations' ~50 MB
double-buffered working sets crowd VMEM") was never tested. This script
measures FULL m=10 matfuncs (the only reliable unit through the axon
tunnel — per-kernel timings are up to 10x off, benchmarks/README.md) for
several variants INTERLEAVED in one process:

  base        current production: brick pass1 (64 MB budget) + pass2
  brick32     pass1 bricks picked against a 32 MB budget (smaller bricks)
  brick100    pass1 bricks picked against a 100 MB budget (bigger bricks)
  m4/m6       Krylov m sweep at the base budget: the per-iteration cost
              profile (is the degradation concentrated in late fat
              iterations?) falls out of the differences.

Usage: python benchmarks/exp256_r05.py [--n 256] [--reps 5] [--k 12]
Prints one JSON line per variant (median of reps, interleaved).
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
    ap.add_argument("--k", type=int, default=12,
                    help="matfunc applications per timed chunk")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from nlsolvers_tpu.ops import operators as ops
    from nlsolvers_tpu.ops.pallas import lanczos2d as l2
    from nlsolvers_tpu.ops.pallas import lanczos3d_pipe as l3
    from nlsolvers_tpu.ops.pallas.lanczos2d import matfunc_apply_planar

    n = args.n
    shape = (n, n, n)
    R = n * n
    dx = 2 * 10.0 / (n - 1)
    lap = ops.laplacian_3d(shape, dx, dtype=jnp.float32)
    desc = lap._pallas_desc
    t = np.complex64(1e-4j)
    rng = np.random.default_rng(0)
    u0 = (0.1 * rng.standard_normal((2, R, n))).astype(np.float32)

    def make_chunk(m, budget):
        old = l3._VMEM_BUDGET
        l3._VMEM_BUDGET = budget
        try:
            def body(i, x):
                del i
                return matfunc_apply_planar(x, desc, t, "exp", m)

            fn = jax.jit(lambda x: lax.fori_loop(0, args.k, body, x))
            # trace+compile NOW, while the budget patch is active
            u = jnp.asarray(u0)
            out = fn(u)
            np.asarray(out[:, :1, :8])
        finally:
            l3._VMEM_BUDGET = old
        return fn

    variants = [
        ("base_m10", make_chunk(10, 64 * 2**20)),
        ("brick32_m10", make_chunk(10, 32 * 2**20)),
        ("brick100_m10", make_chunk(10, 100 * 2**20)),
        ("base_m6", make_chunk(6, 64 * 2**20)),
        ("base_m4", make_chunk(4, 64 * 2**20)),
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
            "metric": f"exp256_{name}", "n": n, "k": args.k,
            "matfunc_ms_median": round(1e3 * float(np.median(ts)), 2),
            "matfunc_ms_min": round(1e3 * ts[0], 2),
            "matfunc_ms_max": round(1e3 * ts[-1], 2),
        }), flush=True)


if __name__ == "__main__":
    main()
