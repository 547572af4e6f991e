#!/usr/bin/env python
"""Round-4 experiment: why do the 3D y-slab kernels run at ~0.5 of stream
peak when the same-traffic 2D kernels reach 0.71?

Hypothesis under test: the per-program projection-dot reductions (j+1
full-block jnp.sum's per pass1 program) lower to poor Mosaic code on the 4D
(P, nz, ty, nx) blocks — at theoretical VPU rate they'd be ~20% of the DMA
time, so a >=2x codegen gap would flip the kernel from bandwidth- to
compute-bound, which is exactly what the round-3 single-pass-pipe experiment
showed (45% less traffic, measured slower).

Each variant below is a drop-in replacement for lanczos3d_pipe._pass1y_call
with IDENTICAL outputs (different reduction structure only), monkeypatched
into the production two-pass loop and timed as full m=10 matfuncs in a
jitted fori_loop chain, interleaved min-of-rounds per the tunnel protocol
(see .claude/skills/verify or benchmarks/README).

Variants:
  base   current kernel (jnp.sum over the 4D block per dot)
  r3     reshape blocks to (P, nz*ty, nx) before the dot loop
  acc8   two-stage: products summed to an (8, 128) accumulator vreg-wise
         (leading-dim partial sum), then ONE cross-lane reduce per dot
  lane   per-lane partials: sum to (128,) over leading axes, then reduce
"""

import argparse
import sys
import time
import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_pass1y(dot_style):
    from nlsolvers_tpu.ops.pallas.lanczos2d import _compiler_params
    from nlsolvers_tpu.ops.pallas import lanczos3d_pipe as l3
    _stencil_3d_y = l3._stencil_3d_y
    _stencil_aniso_3d_y = l3._stencil_aniso_3d_y

    def _pass1y_call(j, P, nz, ny, nx, ty, scale, sign, variant, interpret,
                     mode):
        nblk = ny // ty
        grid = (nblk,)
        blk = (P, nz, ty, nx)
        wblk = (1, nz, ty, nx)
        nop = {"iso3d": 0, "aniso3d": 4}[mode]

        def dots(Wi, w):
            # returns (re, im) scalars; w/Wi are (P, nz, ty, nx)
            if dot_style == "r3":
                Wi = Wi.reshape(P, nz * ty, nx)
                w = w.reshape(P, nz * ty, nx)
                if P == 1:
                    return jnp.sum(Wi[0] * w[0]), jnp.float32(0.0)
                re = jnp.sum(Wi[0] * w[0] + Wi[1] * w[1])
                im = jnp.sum(Wi[0] * w[1] - Wi[1] * w[0])
                return re, im
            if dot_style == "acc8":
                K = P * nz * ty // 8
                Wi = Wi.reshape(K, 8, nx)
                w_ = w.reshape(K, 8, nx)
                if P == 1:
                    return jnp.sum(jnp.sum(Wi * w_, axis=0)), jnp.float32(0.0)
                h = K // 2
                re = jnp.sum(jnp.sum(Wi[:h] * w_[:h], axis=0)
                             + jnp.sum(Wi[h:] * w_[h:], axis=0))
                im = jnp.sum(jnp.sum(Wi[:h] * w_[h:], axis=0)
                             - jnp.sum(Wi[h:] * w_[:h], axis=0))
                return re, im
            if dot_style == "lane":
                # accumulate over the leading z axis (vreg-wise adds on
                # (ty, nx) tiles), one 2D reduce at the end
                if P == 1:
                    part = jnp.sum(Wi[0] * w[0], axis=0)
                    return jnp.sum(part), jnp.float32(0.0)
                pre = jnp.sum(Wi[0] * w[0] + Wi[1] * w[1], axis=0)
                pim = jnp.sum(Wi[0] * w[1] - Wi[1] * w[0], axis=0)
                return jnp.sum(pre), jnp.sum(pim)
            return l3._dots4(P, Wi, w)

        def kernel(scal, u_ref, h_ref, *rest):
            ops_ = rest[:nop]
            wrefs = rest[nop:nop + j]
            w_out, raw_out = rest[nop + j], rest[nop + j + 1]
            i = pl.program_id(0)
            u = u_ref[...]
            h = h_ref[...]
            up = h[:, :, 0, 0, :][:, :, None, :]
            dn = h[:, :, 0, 1, :][:, :, None, :]
            if mode == "aniso3d":
                av = _stencil_aniso_3d_y(u, up, dn, ops_[0][...],
                                         ops_[1][...],
                                         ops_[2][:, :, 0, 0, :][:, :, None, :],
                                         ops_[3][...], ty, scale, sign)
            else:
                av = _stencil_3d_y(u, up, dn, i * ty, ty, nz, ny, nx, scale,
                                   sign, variant)
            w = scal[0, 0] * av
            if j > 0:
                w = w - scal[0, 1] * wrefs[j - 1][...]
            w_out[...] = w

            @pl.when(i == 0)
            def _():
                for idx in range(j + 1):
                    raw_out[idx, 0] = 0.0
                    raw_out[idx, 1] = 0.0

            for idx in range(j + 1):
                Wi = u if idx == j else wrefs[idx][...]
                re, im = dots(Wi, w)
                raw_out[idx, 0] += re
                raw_out[idx, 1] += im

        center = lambda i: (0, 0, i, 0)
        blkspec = pl.BlockSpec(blk, center, memory_space=pltpu.VMEM)
        in_specs = [
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            blkspec,
            pl.BlockSpec((P, nz, 1, 2, nx), lambda i: (0, 0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        if mode == "aniso3d":
            wspec = pl.BlockSpec(wblk, center, memory_space=pltpu.VMEM)
            in_specs += [wspec, wspec,
                         pl.BlockSpec((1, nz, 1, 1, nx),
                                      lambda i: (0, 0, i, 0, 0),
                                      memory_space=pltpu.VMEM),
                         wspec]
        in_specs += [blkspec for _ in range(j)]
        out_specs = [
            blkspec,
            pl.BlockSpec((j + 1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ]
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=[jax.ShapeDtypeStruct((P, nz, ny, nx), jnp.float32),
                       jax.ShapeDtypeStruct((j + 1, 2), jnp.float32)],
            compiler_params=_compiler_params(j + 3 + nop, nz * ty, nx, P),
            interpret=interpret,
        )

    return _pass1y_call


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="base,r3,acc8,lane")
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--m", type=int, default=10)
    ap.add_argument("--chunk", type=int, default=30)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--aniso", action="store_true")
    args = ap.parse_args()

    from nlsolvers_tpu.ops import operators as ops
    from nlsolvers_tpu.ops.pallas import lanczos3d_pipe as l3
    from nlsolvers_tpu.ops.pallas.lanczos2d import matfunc_apply_planar

    n = args.n
    dx = 2 * 10.0 / (n - 1)
    if args.aniso:
        rng = np.random.default_rng(1)
        c = (1.0 + 0.4 * rng.random((n, n, n))).astype(np.float32)
        lap = ops.anisotropic_laplacian_3d(c, dx)
    else:
        lap = ops.laplacian_3d((n, n, n), dx, dtype=jnp.float32)
    desc = lap._pallas_desc
    rng = np.random.default_rng(0)
    u0 = jnp.asarray(
        0.1 * rng.standard_normal((2, n * n, n)).astype(np.float32))

    def chain(u):
        def body(_, u):
            y = matfunc_apply_planar(u, desc, 1e-3, "cos_sqrt", args.m)
            return y * lax.rsqrt(jnp.mean(y * y) + 1e-12)
        return lax.fori_loop(0, args.chunk, body, u)

    fns = {}
    orig = l3._pass1y_call
    for v in args.variants.split(","):
        l3._pass1y_call = orig if v == "base" else make_pass1y(v)
        fns[v] = jax.jit(chain)
        out = np.asarray(fns[v](u0)[:, :1, :1])   # compile + sync
        assert np.isfinite(out).all(), v
    l3._pass1y_call = orig

    best = {k: float("inf") for k in fns}
    for r in range(args.rounds):
        for k, f in fns.items():
            t0 = time.perf_counter()
            np.asarray(f(u0)[:, :1, :1])
            dt = (time.perf_counter() - t0) / args.chunk
            best[k] = min(best[k], dt)
        print(f"round {r}: " + "  ".join(
            f"{k}={best[k]*1e3:.3f}ms" for k in fns), flush=True)
    print("\nfinal (min ms/matfunc, m=%d, %d^3%s):"
          % (args.m, n, " aniso" if args.aniso else ""))
    for k, v in best.items():
        print(f"  {k:6s} {v*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
