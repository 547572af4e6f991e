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


def sewi_bytes(shape, m, mode, fused=False):
    """Planar sEWI step (models/nlse.sewi_step_planar): B(u) pointwise
    (read up + m field, write Bp), then 3 Lanczos matfuncs — sinc(B),
    exp(psi), exp(2tau, u_prev) — or 2 with the fused exp*sinc variant,
    then the final combine e2 - 2 dt i e1 (read 2, write 1)."""
    sc = col_bytes(shape, 2)
    wc = col_bytes(shape, 1)
    n_mf = 2 if fused else 3
    return (n_mf * lanczos_bytes(shape, m, 2, mode)
            + (2 * sc + wc)                           # B(u) pointwise
            + 3 * sc)                                 # final combine


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

    def nlse_row(name, shape, mode, c=None, chunk=None, integrator="ss2"):
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
                                     integrator=integrator,
                                     dtype=jnp.complex64)
        two_step = integrator in ("sewi", "sewi_fused", "gautschi")

        def step(s, i):
            return prob.step(s, i)

        # materialize a SMALL slice only: the device computes the full
        # state either way, but a full-array D2H readback through the axon
        # tunnel costs seconds at 256^3 (134 MB) and once made this row
        # look 3x slower than the step actually runs (tunnel rule:
        # benchmarks/README.md)
        first = (lambda s: s[0]) if two_step else (lambda s: s)
        if prob.meta.get("planar_state", False):
            state = prob.init(u0)                 # planar (2, R, nx) f32
            mat = lambda s: np.asarray(first(s)[:, :1, :8])
        else:                                     # complex path (XLA column)
            state = prob.init(u0[0] + 1j * u0[1])
            mat = lambda s: np.asarray(pack_complex(first(s))[..., :1, :8])
        chunk = chunk or (2000 if len(shape) == 2 else 300)
        rates, _ = time_chunk(step, state, chunk, args.repeats, mat)
        med = float(np.median(rates))
        if integrator == "ss2":
            bs = ss2_bytes(shape, m_kry, mode)
        else:
            bs = sewi_bytes(shape, m_kry, mode,
                            fused=integrator == "sewi_fused")
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

    def shard_row(name, shape, chunk=100):
        """Grid-sharded engine on a 1-device mesh: the per-shard kernel
        speed of the sharded fused path (multi-chip meshes are not
        available in this image; cross-shard ppermutes are no-ops here, so
        this isolates kernel time, not ICI). The measured rate anchors the
        iter_compute_us inputs of benchmarks/ici_model.py (VERDICT r4
        next #8: the 2D model previously rested on a back-derived number
        that the 3D data showed overstates sharded per-shard speed)."""
        from jax.sharding import Mesh
        from nlsolvers_tpu.parallel import spatial
        dim = len(shape)
        names = ("gz", "gy", "gx")[-dim:]
        mesh = Mesh(np.array(jax.devices()[:1]).reshape((1,) * dim), names)
        Lx = 10.0
        step1 = spatial.make_sharded_nlse_step(
            "cubic", shape, Lx, 1e-4, mesh,
            axis_names=names, krylov_m=m_kry,
            dtype=jnp.complex64, variant="clean")
        rng_l = np.random.default_rng(3)
        u0 = 0.1 * rng_l.standard_normal((2,) + shape).astype(np.float32)
        mf = np.ones(shape, np.float32)

        def step(s, i):
            del i
            return step1(s, jnp.asarray(mf))

        rates, _ = time_chunk(step, jnp.asarray(u0), chunk, args.repeats,
                              lambda s: np.asarray(s[:, :1, :8]))
        med = float(np.median(rates))
        mode = "iso2d" if dim == 2 else "iso3d"
        emit(name, shape, med, rates, ss2_bytes(shape, m_kry, mode))

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
        shard_row("nlse3d_128_ss2_sharded_1shard", (128, 128, 128))
    if "shard2d_2048" in rows:
        # the local-shard shape the "pays off from ~2048^2" claim rests on
        # (VERDICT r4 next #8): measured anchor for ici_model's 2D rows
        shard_row("nlse2d_2048_ss2_sharded_1shard", (2048, 2048), chunk=200)
    if "shard3d_256" in rows:
        # 256^3-local shards (512^3 on 2x2x2): the brick-pass1-in-shard_map
        # operating point (VERDICT r4 next #2); anchors ici_model's
        # 512^3-on-2x2x2 row
        shard_row("nlse3d_256_ss2_sharded_1shard", (256, 256, 256),
                  chunk=30)
    if "sewi2d" in rows:
        nlse_row("nlse2d_1024_sewi", (1024, 1024), "iso2d",
                 integrator="sewi")
    if "sewi3d" in rows:
        nlse_row("nlse3d_128_sewi", (128, 128, 128), "iso3d",
                 integrator="sewi", chunk=150)
    if "sewi3d_fused" in rows:
        nlse_row("nlse3d_128_sewi_fused", (128, 128, 128), "iso3d",
                 integrator="sewi_fused", chunk=150)
    if "sg3d" in rows:
        sg_row("sg3d_128_gautschi", (128, 128, 128), "iso3d", chunk=200)
    if "sg3d_256" in rows:
        # real-wave at the 2TB-production scale (VERDICT r4 next #9): P=1
        # f32 fields keep even 256^3 on the y-slab kernels for m=10
        sg_row("sg3d_256_gautschi", (256, 256, 256), "iso3d", chunk=30)
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
