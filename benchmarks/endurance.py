#!/usr/bin/env python
"""Production-endurance receipt: a LONG on-chip run with conservation gates.

The CPU test suite pins parity at f64 over short horizons; this script runs
the PRODUCTION configuration (complex64, fused planar kernels, one chip)
for many thousands of steps and reports the mass drift — the conserved
NLSE invariant — plus throughput. SS2's linear substep is unitary to
rounding (exp(i dt L) via Lanczos) and the phase kicks preserve |u|
pointwise, so mass drift measures accumulated f32 roundoff of the whole
fused path; a kernel bug (wrong BC write, seam error, bad beta) shows up
as secular drift instead.

Usage: python benchmarks/endurance.py [--n 1024] [--steps 10000]
Prints one JSON line.
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
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--dim", type=int, default=2, choices=[2, 3])
    ap.add_argument("--chunk", type=int, default=1000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from nlsolvers_tpu.models import problems

    n = args.n
    shape = (n,) * args.dim
    LX, DT = 10.0, 1e-4
    x = [np.linspace(-LX, LX, n, dtype=np.float32) for _ in range(args.dim)]
    mesh = np.meshgrid(*x, indexing="ij")
    r2 = sum(g ** 2 for g in mesh)
    env = np.exp(-r2 / 4).astype(np.float32)
    u0 = np.stack([env * np.cos(0.5 * mesh[-1]),
                   env * np.sin(0.5 * mesh[-1])])
    mf = np.ones(shape, np.float32)
    prob = problems.nlse_problem("cubic", shape, LX, DT, m_field=mf,
                                 krylov_m=10, dtype=jnp.complex64)
    planar = prob.meta.get("planar_state", False)

    def chunk(s):
        return lax.fori_loop(0, args.chunk,
                             lambda i, st: prob.step(st, i + 1), s)

    chunk_j = jax.jit(chunk)

    def mass(s):
        # tiny readback: reduce on device, pull one scalar
        return float(np.asarray(jax.jit(jnp.sum)(s * s)))

    if planar:
        state = prob.init(u0)
    else:
        from nlsolvers_tpu.utils.complexio import unpack_complex
        state = unpack_complex(jnp.asarray(u0))
    m0 = mass(state)
    state = chunk_j(state)                 # compile outside the timer
    done0 = args.chunk
    t0 = time.time()
    done = 0
    worst = 0.0
    while done0 + done < args.steps:
        state = chunk_j(state)
        done += args.chunk
        drift = abs(mass(state) - m0) / m0
        worst = max(worst, drift)
        print(f"  {done0 + done} steps: relative mass drift {drift:.3e}",
              file=sys.stderr, flush=True)
    wall = time.time() - t0
    print(json.dumps({
        "metric": f"nlse{args.dim}d_endurance_{n}_mass_drift",
        "steps": done0 + done,
        "worst_rel_mass_drift": float(f"{worst:.3e}"),
        "steps_per_sec": round(done / wall, 1),
        "planar_path": bool(planar),
    }))


if __name__ == "__main__":
    main()
