#!/usr/bin/env python
"""Round-5 decomposition of the sharded engine's 1-shard overhead.

VERDICT r4 weak #2 / next #3: at 128^3 the sharded step on a (1,1,1) mesh
ran 280 steps/s vs the unsharded planar path's 339 (0.71 vs 0.86 of triad)
— a 17% loss before any communication happens — and nothing decomposed
where it goes. This script times the FULL SS2 step (the only reliable unit
through the axon tunnel) for a ladder of variants INTERLEAVED in one
process; consecutive differences isolate each suspect:

  unsharded   production planar path (prob.step)          } the gap being
  sharded     full sharded step, (1,1,1) mesh             } decomposed
  nopermute   sharded with lax.ppermute edges replaced by zeros — the
              exact world-size-1 semantics (edge shards receive zeros)
              minus the collective; the halo splice .at.set writes remain
  nopsum      nopermute + all Lanczos psums removed (legal at world size
              1: local reductions ARE global) — isolates the per-iteration
              packed psum + final-norm psum
  nogather    nopsum + the y-halo gather (jnp.take + .at.set splices)
              replaced with zeros. TIMING-ONLY: halo VALUES are wrong, so
              this variant's output is never checked — it bounds the
              jnp-side gather/splice traffic.

What remains between `nogather` and `unsharded` is intrinsic structure:
the deferred-norm-CGS pass shape and the sharded iso pass1's streamed
`diag` column (1 extra weight-column read per iteration, ~4% of step
traffic at m=10 — the unsharded kernel builds the diagonal from iotas
in-register). Both paths apply the fused bc3d ghost-copy kernel (round
5), so the BC is not a differencing term.

Usage: python benchmarks/exp_shard_r05.py [--n 128] [--chunk 100] [--reps 5]
Prints one JSON line per variant plus a decomposition line.
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
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=100)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.sharding import Mesh
    from nlsolvers_tpu.models import problems
    from nlsolvers_tpu.ops.pallas import lanczos2d as l2
    from nlsolvers_tpu.parallel import spatial

    n = args.n
    shape = (n, n, n)
    Lx, dt = 10.0, 1e-4
    rng = np.random.default_rng(3)
    u0 = 0.1 * rng.standard_normal((2,) + shape).astype(np.float32)
    mf = np.ones(shape, np.float32)

    def compile_sharded(tag, patches):
        """Build + trace a sharded step under the given module patches;
        the compiled executable keeps the patched structure."""
        mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1, 1),
                    ("gz", "gy", "gx"))
        with patches:
            step1 = spatial.make_sharded_nlse_step(
                "cubic", shape, Lx, dt, mesh,
                axis_names=("gz", "gy", "gx"), krylov_m=10,
                dtype=jnp.complex64, variant="clean")
            mfj = jnp.asarray(mf)

            def chunk_fn(s):
                return lax.fori_loop(0, args.chunk,
                                     lambda i, st: step1(st, mfj), s)

            cj = jax.jit(chunk_fn)
            out = cj(jnp.asarray(u0))
            np.asarray(out[:, :1, :8])         # force compile under patch
        return cj

    @contextmanager
    def nullctx():
        yield

    # world-size-1 ppermute semantics EXACTLY (edge shards receive zeros:
    # no pairs), minus the collective — nopermute/nopsum stay numerically
    # correct on the (1,1,1) mesh; only `nogather` is timing-only
    ident_edge = lambda slab, axis_name: jnp.zeros_like(slab)

    def cgs_nopsum(u, m, chat, gsum, safe_inv, p1, p2):
        del gsum
        return _orig_cgs(u, m, chat, lambda x: x, safe_inv, p1, p2)

    _orig_cgs = l2._deferred_norm_cgs

    from nlsolvers_tpu.ops.pallas import lanczos3d_pipe as l3

    def zero_gather(a4, ty, variant):
        P, nz, ny, nx = a4.shape
        return jnp.zeros((P, nz, ny // ty, 2, nx), a4.dtype)

    no_permute = dict(_recv_from_next=ident_edge, _recv_from_prev=ident_edge)

    variants = {}
    # unsharded production step
    prob = problems.nlse_problem("cubic", shape, Lx, dt, m_field=mf,
                                 krylov_m=10, dtype=jnp.complex64)
    assert prob.meta["planar_state"]
    state_u = prob.init(u0)

    def chunk_unsh(s):
        return lax.fori_loop(0, args.chunk,
                             lambda i, st: prob.step(st, i + 1), s)

    cu = jax.jit(chunk_unsh)
    su = cu(state_u)
    np.asarray(su[:, :1, :8])
    variants["unsharded"] = (cu, su)

    variants["sharded"] = (compile_sharded("sharded", nullctx()),
                           jnp.asarray(u0))
    variants["nopermute"] = (
        compile_sharded("nopermute",
                        patched(l2, **no_permute)), jnp.asarray(u0))
    # spatial's own edge exchanges (neumann ghosts) also ppermute
    variants["nopsum"] = (
        compile_sharded("nopsum",
                        patched(l2, _deferred_norm_cgs=cgs_nopsum,
                                **no_permute)), jnp.asarray(u0))
    with patched(l3, gather_y_halos=zero_gather):
        variants["nogather"] = (
            compile_sharded("nogather",
                            patched(l2, _deferred_norm_cgs=cgs_nopsum,
                                    **no_permute)), jnp.asarray(u0))

    order = ["unsharded", "sharded", "nopermute", "nopsum", "nogather"]
    times = {k: [] for k in order}
    states = {k: v[1] for k, v in variants.items()}
    for rep in range(args.reps):
        for k in order:
            fn = variants[k][0]
            t0 = time.time()
            states[k] = fn(states[k])
            np.asarray(states[k][:, :1, :8])
            times[k].append(args.chunk / (time.time() - t0))

    med = {}
    for k in order:
        ts = sorted(times[k])
        med[k] = float(np.median(ts))
        print(json.dumps({
            "metric": f"shard_decomp_{k}", "n": n,
            "steps_per_sec": round(med[k], 1),
            "min": round(ts[0], 1), "max": round(ts[-1], 1),
        }), flush=True)

    ms = {k: 1e3 / med[k] for k in order}
    print(json.dumps({
        "metric": "shard_decomp_summary", "n": n,
        "total_overhead_ms": round(ms["sharded"] - ms["unsharded"], 3),
        "ppermute_ms": round(ms["sharded"] - ms["nopermute"], 3),
        "psum_ms": round(ms["nopermute"] - ms["nopsum"], 3),
        "halo_gather_ms": round(ms["nopsum"] - ms["nogather"], 3),
        "residual_structure_ms": round(ms["nogather"] - ms["unsharded"], 3),
    }), flush=True)


if __name__ == "__main__":
    main()
