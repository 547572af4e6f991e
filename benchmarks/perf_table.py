#!/usr/bin/env python
"""Measure every README performance-table row + its HBM traffic model.

VERDICT r2 weak #2/#6: the README's roofline accounting covered only the
headline shape, with a stale two-pass traffic model (117 column-streams)
after the pipelined kernels became the production path (73). This script
measures each operating point on the real chip (median of REPEATS timed
chunks, like bench.py) and derives its bytes/step from the ACTUAL kernel
stream counts, so each row gets an honest fraction-of-stream-peak.

Traffic models (bytes; sc = state column = P*prod(shape)*4, wc = weight
column = prod(shape)*4; halo rows are O(nx) and ignored):

* pipelined 2D Lanczos (production for iso2d/aniso2d,
  ops/pallas/lanczos2d._lanczos_pipe):
    init pass1(0):       2 sc  (+2 wc aniso)
    pipe iter j<m-2:     (j+4) sc  (+~3 wc aniso: wx, wy, wy-halo)
    last iter (j=m-2):   (m+1) sc
    combine (k specs):   m sc read once (XLA fuses chains) + k sc written
* two-pass 3D Lanczos (y-slab pass1, lanczos3d_pipe._pass1y_call +
  lanczos2d._pass2_call):
    pass1(j): (j+2) sc — the z-stencil is internal to the y-slab blocks
              (+3 wc aniso3d: wx, wy, wz)
    pass2(j): (j+3) sc
    combine as above.
* SS2 step: 1 matfunc + 2 pointwise phases (2 sc + 1 wc each).
* Gautschi real-wave step (models/realwave.gautschi_step): matfunc_multi
  (1 Lanczos + 2-spec combine) + g pointwise (2 sc + 1 wc) + 1 matfunc +
  final update (4 sc).

Usage: python benchmarks/perf_table.py [--rows iso2d,aniso2d,sg2d,iso3d,aniso3d]
Prints one JSON line per row plus the triad probe.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def col_bytes(shape, planes):
    return planes * int(np.prod(shape)) * 4


def lanczos_bytes(shape, m, planes, mode, n_specs=1):
    sc = col_bytes(shape, planes)
    wc = col_bytes(shape, 1)
    total = 0
    if mode in ("iso2d", "aniso2d"):                      # pipelined
        total += 2 * sc + (2 * wc if mode == "aniso2d" else 0)
        for j in range(m - 1):
            if j == m - 2:
                total += (m + 1) * sc
            else:
                total += (j + 4) * sc
                if mode == "aniso2d":
                    total += 3 * wc
    else:                                                 # two-pass 3D
        # Mirror lanczos_planar's dispatch per iteration: y-slab pass1
        # (j+2 streams, 3 aniso weight cols — z-stencil internal) when
        # pick_ty3d accepts the shape at that j; the BRICK pass1 for iso
        # grids past the slab budget (also j+2 streams — both halo
        # families are O(face), ignored like the 2D halo rows); otherwise
        # the row-tiled kernels (2 extra z-offset streams of W_j; aniso
        # reads 4 full weight cols — wx, wy, wz at two z offsets).
        from nlsolvers_tpu.ops.pallas.lanczos3d_pipe import (pick_brick3d,
                                                             pick_ty3d)
        nop_pipe = 0 if mode == "iso3d" else 4
        for j in range(m - 1):
            yslab = pick_ty3d(shape[0], shape[1], shape[2], j, planes,
                              nop_pipe) >= 8
            nop_b = 0 if mode == "iso3d" else 5
            brick = (not yslab
                     and pick_brick3d(shape[0], shape[1], shape[2], j,
                                      planes, nop_b) is not None)
            total += (j + 2 + (0 if yslab or brick else 2)) * sc  # pass1
            if mode == "aniso3d":
                total += (3 if yslab or brick else 4) * wc
            total += (j + 3) * sc                         # pass2
    total += m * sc + n_specs * sc                        # combine
    return total


def ss2_bytes(shape, m, mode):
    sc = col_bytes(shape, 2)
    wc = col_bytes(shape, 1)
    return lanczos_bytes(shape, m, 2, mode) + 2 * (2 * sc + wc)


def gautschi_bytes(shape, m, mode):
    sc = col_bytes(shape, 1)
    wc = col_bytes(shape, 1)
    return (lanczos_bytes(shape, m, 1, mode, n_specs=2)   # filter + cos
            + (2 * sc + wc)                               # g pointwise
            + lanczos_bytes(shape, m, 1, mode)            # sinc2
            + 4 * sc)                                     # final update


def time_chunk(step, state, chunk, repeats, materialize):
    import jax
    from jax import lax

    def run(s):
        return lax.fori_loop(0, chunk, lambda i, st: step(st, i + 1), s)

    runj = jax.jit(run)
    state = runj(state)
    materialize(state)                    # compile + settle
    rates = []
    for _ in range(repeats):
        t0 = time.time()
        state = runj(state)
        materialize(state)
        rates.append(chunk / (time.time() - t0))
    return sorted(rates), state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows",
                    default="iso2d,aniso2d,sg2d,iso3d,aniso3d,shard3d")
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--krylov-m", type=int, default=10)
    ap.add_argument("--pallas", default="auto", choices=["auto", "off"],
                    help="'off' measures the pure-XLA column of the table")
    ap.add_argument("--no-triad", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from nlsolvers_tpu import config
    from nlsolvers_tpu.models import problems
    from nlsolvers_tpu.utils.complexio import pack_complex, unpack_complex
    from benchmarks.roofline import measure_triad

    config.pallas_mode = args.pallas
    tag = "" if args.pallas == "auto" else "_xla"
    m_kry = args.krylov_m
    triad = 930.0 if args.no_triad else measure_triad()
    if not args.no_triad:
        print(json.dumps({"metric": "triad_gbs", "value": round(triad, 0)}),
              flush=True)

    rng = np.random.default_rng(0)

    def nlse_row(name, shape, mode, c=None, chunk=None):
        Lx = 10.0
        x = [np.linspace(-Lx, Lx, n, dtype=np.float32) for n in shape]
        mesh = np.meshgrid(*x, indexing="ij")
        r2 = sum(g**2 for g in mesh)
        env = np.exp(-r2 / 4).astype(np.float32)
        u0 = np.stack([env * np.cos(0.5 * mesh[-1]),
                       env * np.sin(0.5 * mesh[-1])])
        mf = np.ones(shape, np.float32)
        prob = problems.nlse_problem("cubic", shape, Lx, 1e-4, m_field=mf,
                                     c_field=c, krylov_m=m_kry,
                                     dtype=jnp.complex64)

        def step(s, i):
            return prob.step(s, i)

        # materialize a SMALL slice only: the device computes the full
        # state either way, but a full-array D2H readback through the axon
        # tunnel costs seconds at 256^3 (134 MB) and once made this row
        # look 3x slower than the step actually runs (tunnel rule:
        # benchmarks/README.md)
        if prob.meta.get("planar_state", False):
            state = prob.init(u0)                 # planar (2, R, nx) f32
            mat = lambda s: np.asarray(s[:, :1, :8])
        else:
            state = unpack_complex(jnp.asarray(u0))
            mat = lambda s: np.asarray(pack_complex(s)[..., :1, :8])
        chunk = chunk or (2000 if len(shape) == 2 else 300)
        rates, _ = time_chunk(step, state, chunk, args.repeats, mat)
        med = float(np.median(rates))
        bs = ss2_bytes(shape, m_kry, mode)
        emit(name, shape, med, rates, bs)

    def sg_row(name, shape, mode, chunk=2000):
        Lx = 10.0
        x = [np.linspace(-Lx, Lx, n, dtype=np.float32) for n in shape]
        mesh = np.meshgrid(*x, indexing="ij")
        u0 = (4.0 * np.arctan(np.exp(mesh[-1] / 1.5))).astype(np.float32)
        v0 = np.zeros_like(u0)
        mf = np.ones(shape, np.float32)
        prob = problems.realwave_problem("sine_gordon", shape, Lx, 1e-4,
                                         m_field=mf, integrator="gautschi",
                                         krylov_m=m_kry, dtype=jnp.float32)
        state = prob.init(jnp.asarray(u0), jnp.asarray(v0))
        rates, _ = time_chunk(prob.step, state, chunk, args.repeats,
                              lambda s: np.asarray(s[0][:1, :8]))
        med = float(np.median(rates))
        emit(name, shape, med, rates, gautschi_bytes(shape, m_kry, mode))

    def emit(name, shape, med, rates, bytes_per_step):
        eff = med * bytes_per_step / 1e9
        print(json.dumps({
            "metric": name + tag, "shape": list(shape),
            "steps_per_sec": round(med, 1),
            "min": round(rates[0], 1), "max": round(rates[-1], 1),
            "model_gb_per_step": round(bytes_per_step / 1e9, 3),
            "effective_gbs": round(eff, 0),
            "fraction_of_triad": round(eff / triad, 3),
        }), flush=True)

    def shard3d_row(name, shape):
        """Grid-sharded 3D engine on a (1,1,1) mesh: the per-shard kernel
        speedup of the new shard3d fused path (multi-chip meshes are not
        available in this image; cross-shard ppermutes are no-ops here, so
        this isolates kernel time, not ICI)."""
        from jax.sharding import Mesh
        from nlsolvers_tpu.parallel import spatial
        mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1, 1),
                    ("gz", "gy", "gx"))
        Lx = 10.0
        step1 = spatial.make_sharded_nlse_step(
            "cubic", shape, Lx, 1e-4, mesh,
            axis_names=("gz", "gy", "gx"), krylov_m=m_kry,
            dtype=jnp.complex64, variant="clean")
        rng_l = np.random.default_rng(3)
        u0 = 0.1 * rng_l.standard_normal((2,) + shape).astype(np.float32)
        mf = np.ones(shape, np.float32)

        def step(s, i):
            del i
            return step1(s, jnp.asarray(mf))

        rates, _ = time_chunk(step, jnp.asarray(u0), 100, args.repeats,
                              lambda s: np.asarray(s[:, :1, :8]))
        med = float(np.median(rates))
        emit(name, shape, med, rates, ss2_bytes(shape, m_kry, "iso3d"))

    rows = set(args.rows.split(","))
    if "iso2d" in rows:
        nlse_row("nlse2d_1024_ss2", (1024, 1024), "iso2d")
    if "aniso2d" in rows:
        c2 = (1.0 + 0.4 * rng.random((1024, 1024))).astype(np.float32)
        nlse_row("nlse2d_1024_ss2_aniso", (1024, 1024), "aniso2d", c=c2)
    if "sg2d" in rows:
        sg_row("sg2d_1024_gautschi", (1024, 1024), "iso2d")
    if "iso3d" in rows:
        nlse_row("nlse3d_128_ss2", (128, 128, 128), "iso3d")
    if "aniso3d" in rows:
        c3 = (1.0 + 0.4 * rng.random((128, 128, 128))).astype(np.float32)
        nlse_row("nlse3d_128_ss2_aniso", (128, 128, 128), "aniso3d", c=c3)
    if "shard3d" in rows:
        shard3d_row("nlse3d_128_ss2_sharded_1shard", (128, 128, 128))
    if "sg3d" in rows:
        sg_row("sg3d_128_gautschi", (128, 128, 128), "iso3d", chunk=200)
    if "iso3d_256" in rows:
        # production-aspiration scale ("collect 2TB for 3d cases",
        # final_todo.txt:36): 256^3 complex64 state = 134 MB, m=10 Krylov
        # basis ~1.5 GB — single chip, brick pass1 geometry (round 4)
        nlse_row("nlse3d_256_ss2", (256, 256, 256), "iso3d", chunk=50)
    if "aniso3d_256" in rows:
        c6 = (1.0 + 0.4 * rng.random((256, 256, 256))).astype(np.float32)
        nlse_row("nlse3d_256_ss2_aniso", (256, 256, 256), "aniso3d", c=c6,
                 chunk=50)


if __name__ == "__main__":
    main()
