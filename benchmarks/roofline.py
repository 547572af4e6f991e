#!/usr/bin/env python
"""HBM roofline probes backing the README's roofline section.

Measures, in one dispatch each (the axon tunnel's per-call RPC latency
otherwise dominates — a 50-call host loop measures 0.23 TB/s for the same
triad):

  1. stream triad (2R/1W) — the practical HBM peak;
  2. a 9R/1W read-heavy mix — the Lanczos-projection-like access pattern;
  3. the headline step's effective bandwidth: bench.py steps/s x the
     two-pass fused Lanczos traffic model (117 column-streams/step at
     1024^2 m=10 complex64, see README).

Prints one JSON line.
"""

import json
import time

import numpy as np

N_TRIAD = 16 * 1024 * 1024      # 64 MB f32
REPS = 200
COLUMN_BYTES = 1024 * 1024 * 4 * 2          # complex64 as 2 f32 planes
LANCZOS_COLUMN_STREAMS = sum((j + 2) + (j + 3) for j in range(9))   # 117


def measure_triad():
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def triad_loop(a, b):
        return lax.fori_loop(0, REPS, lambda i, y: y + 2.0 * b, a)

    x = jnp.ones((N_TRIAD,), jnp.float32)
    b = jnp.full((N_TRIAD,), 1e-9, jnp.float32)
    y = triad_loop(x, b)
    _ = np.asarray(y[:1])                   # force compile + completion
    t0 = time.perf_counter()
    y = triad_loop(y, b)
    _ = np.asarray(y[:1])
    dt = time.perf_counter() - t0
    return REPS * 3 * N_TRIAD * 4 / dt / 1e9


def measure_read_heavy(k=8):
    import jax
    import jax.numpy as jnp
    from jax import lax

    xs = [jnp.full((N_TRIAD,), float(i + 1), jnp.float32) for i in range(k)]

    # xs must be ARGUMENTS: closed-over jnp constants get folded by XLA and
    # the "reads" disappear (measured 4.7 TB/s — a give-away, not bandwidth)
    @jax.jit
    def loop(acc, xs):
        def body(i, a):
            s = a
            for x in xs:
                s = s + x * 1e-9
            return s
        return lax.fori_loop(0, REPS, body, acc)

    y = loop(jnp.zeros((N_TRIAD,), jnp.float32), xs)
    _ = np.asarray(y[:1])
    t0 = time.perf_counter()
    y = loop(y, xs)
    _ = np.asarray(y[:1])
    dt = time.perf_counter() - t0
    return REPS * (k + 2) * N_TRIAD * 4 / dt / 1e9


def main(steps_per_sec=None):
    triad = measure_triad()
    read_heavy = measure_read_heavy()
    out = {
        "metric": "hbm_roofline_probes",
        "triad_gbs": round(triad, 0),
        "read_heavy_9r1w_gbs": round(read_heavy, 0),
        "unit": "GB/s",
        "lanczos_traffic_model_gb_per_step": round(
            LANCZOS_COLUMN_STREAMS * COLUMN_BYTES / 1e9, 3),
    }
    if steps_per_sec:
        eff = steps_per_sec * LANCZOS_COLUMN_STREAMS * COLUMN_BYTES / 1e9
        out["effective_gbs_at_steps_per_sec"] = round(eff, 0)
        out["fraction_of_triad"] = round(eff / triad, 3)
    out["value"] = out.get("effective_gbs_at_steps_per_sec", round(triad, 0))
    print(json.dumps(out))


if __name__ == "__main__":
    import sys
    main(float(sys.argv[1]) if len(sys.argv) > 1 else None)
