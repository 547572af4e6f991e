#!/usr/bin/env python
"""Round-5 256^3 VMEM-budget sweep with RTT-proof chunks.

exp256_r05.py's budget probe (32/64/100 MB at k=12) hinted smaller
working sets help slightly; exp256d showed per-chunk tunnel RTT inflated
k=12 numbers by ~1.5 ms/matfunc. This sweeps the 3D pick budget with
k=36 chunks, interleaved. The budget gates BOTH pick_ty3d (how long the
full-z y-slab geometry persists) and pick_brick3d (brick sizes).

Usage: python benchmarks/exp256e_r05.py [--n 256] [--reps 5] [--k 36]
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
    ap.add_argument("--k", type=int, default=36)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from nlsolvers_tpu.ops import operators as ops
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

    def make_chunk(budget):
        old = l3._VMEM_BUDGET
        l3._VMEM_BUDGET = budget
        try:
            def body(i, x):
                del i
                return matfunc_apply_planar(x, desc, t, "exp", 10)

            fn = jax.jit(lambda x: lax.fori_loop(0, args.k, body, x))
            u = jnp.asarray(u0)
            out = fn(u)
            np.asarray(out[:, :1, :8])
        finally:
            l3._VMEM_BUDGET = old
        return fn

    variants = [(f"budget{mb}", make_chunk(mb * 2**20))
                for mb in (16, 24, 32, 48, 64)]

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
            "metric": f"exp256e_{name}", "n": n, "k": args.k,
            "matfunc_ms_median": round(1e3 * float(np.median(ts)), 2),
            "matfunc_ms_min": round(1e3 * ts[0], 2),
        }), flush=True)


if __name__ == "__main__":
    main()
