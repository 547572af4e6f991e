#!/usr/bin/env python
"""On-chip fused-vs-XLA parity for every Pallas kernel family.

VERDICT r3 weak #4: all Pallas parity evidence was interpret-mode on CPU —
a Mosaic compilation bug would ship silently. This script runs each kernel
family ON THE REAL TPU at small lane-aligned shapes and compares against
the pure-XLA path (config.pallas_mode = "off") computed in the same
process, with the CPU test suite's tolerance gates. Small shapes keep
readbacks tiny (tunnel rule) and compiles short; parity needs no timing,
so per-call dispatch is fine here.

Writes benchmarks/results/tpu_parity_<tag>.json: one record per family
with the relative-L2 / max-abs errors and a pass bool. Exit code 1 if any
family fails. The verify skill runs this after kernel changes.

Families:
  pipe2d_iso / pipe2d_aniso     pipelined 2D (_lanczos_pipe), production
  twopass2d_iso / _aniso        two-pass 2D (pallas_pipeline=False)
  yslab3d_iso / _aniso          y-slab two-pass 3D, production
  rowtile3d_iso / _aniso        row-tiled 3D (pallas_ytile_3d=False)
  pipe3d_iso                    opt-in single-pass 3D pipe
  fused_iter2d                  opt-in single-kernel 2D iteration
  gautschi_multi                P=1 two-spec combine (realwave path)
  brick3d_iso / _aniso          the 256^3-class brick pass1, forced via a
                                shrunken VMEM budget at small shapes
  shard3d_iso / _aniso          sharded y-slab kernels on a 1x1x1 mesh
                                (--shard; compile-heavy, ~minutes)
"""

import argparse
import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RTOL, ATOL = 3e-4, 3e-5   # the CPU suite's gates (tests/test_pallas.py)


def rel_l2(a, b):
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r04")
    ap.add_argument("--shard", action="store_true",
                    help="include the sharded families (slow compiles)")
    ap.add_argument("--m", type=int, default=10)
    ap.add_argument("--interpret", action="store_true",
                    help="CPU validation of the harness itself")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from nlsolvers_tpu import config
    from nlsolvers_tpu.ops import operators as ops
    from nlsolvers_tpu.ops.pallas import lanczos2d as l2
    from nlsolvers_tpu.ops.pallas.lanczos2d import (
        matfunc_apply_planar, matfunc_apply_planar_multi)

    m = args.m
    rng = np.random.default_rng(7)
    results = []

    def lap2(n, aniso=False):
        dx = 2 * 5.0 / (n - 1)
        if aniso:
            c = (1.0 + 0.4 * rng.random((n, n))).astype(np.float32)
            return ops.anisotropic_laplacian_2d(c, dx, dx)
        return ops.laplacian_2d((n, n), dx, dx, dtype=jnp.float32)

    def lap3(shape, aniso=False):
        dx = 2 * 5.0 / (shape[-1] - 1)
        if aniso:
            c = (1.0 + 0.4 * rng.random(shape)).astype(np.float32)
            return ops.anisotropic_laplacian_3d(c, dx)
        return ops.laplacian_3d(shape, dx, dtype=jnp.float32)

    def check(name, desc, P, R, nx, spec, flags, nat_shape=None):
        """Run fused-vs-XLA for one family; record the result. nat_shape
        is the operator's natural field shape ((nz, ny, nx) for 3D)."""
        nat = nat_shape or (R, nx)
        u = jnp.asarray(0.1 * rng.standard_normal((P, R, nx))
                        .astype(np.float32))
        old = {k: getattr(config, k) for k in flags if k != "_FUSED_ITER"}
        old_fi = l2._FUSED_ITER
        try:
            for k, v in flags.items():
                if k == "_FUSED_ITER":
                    l2._FUSED_ITER = v
                else:
                    setattr(config, k, v)
            fused = np.asarray(jax.jit(
                lambda x: matfunc_apply_planar_multi(
                    x, desc, spec, m, interpret=args.interpret))(u))
        finally:
            for k, v in old.items():
                setattr(config, k, v)
            l2._FUSED_ITER = old_fi
        # XLA reference: same public entry with the kernels disabled would
        # not exercise matfunc_apply_planar, so rebuild from ops/krylov on
        # the complex/real view.
        from nlsolvers_tpu.ops import krylov
        matvec = desc.pop("_matvec")

        def ref_fn(x):
            if P == 2:
                z = jax.lax.complex(x[0], x[1]).reshape(nat)
                outs = krylov.matfunc_apply_multi(
                    matvec, z, [(t, f) for (t, f) in spec], m)
                outs = [o.reshape(R, nx) for o in outs]
                return jnp.stack([jnp.stack([jnp.real(o), jnp.imag(o)])
                                  for o in outs])
            outs = krylov.matfunc_apply_multi(
                matvec, x[0].reshape(nat), [(t, f) for (t, f) in spec], m)
            return jnp.stack([o.reshape(R, nx)[None] for o in outs])

        old_mode = config.pallas_mode
        config.pallas_mode = "off"       # force the pure-XLA Lanczos
        try:
            ref = np.asarray(jax.jit(ref_fn)(u))
        finally:
            config.pallas_mode = old_mode
        errs = []
        ok = True
        for k in range(len(spec)):
            f, r = fused[k], ref[k]
            e = rel_l2(f, r)
            bad = int(np.sum(np.abs(f - r) > RTOL * np.abs(r) + ATOL))
            errs.append(e)
            ok = ok and bad == 0 and np.isfinite(f).all()
        rec = dict(family=name, rel_l2=[round(e, 9) for e in errs],
                   ok=bool(ok))
        results.append(rec)
        print(json.dumps(rec), flush=True)

    def with_matvec(lap):
        d = dict(lap._pallas_desc)
        d["_matvec"] = lap
        return d

    n2, s3 = 256, (32, 32, 128)
    R3 = s3[0] * s3[1]
    specs_exp = ((np.complex64(1e-3j), "exp"),)
    specs_g = ((1e-3, "cos_sqrt"), (1e-3, "sinc2_sqrt"))

    li2, la2 = lap2(n2), lap2(n2, aniso=True)
    li3, la3 = lap3(s3), lap3(s3, aniso=True)

    check("pipe2d_iso", with_matvec(li2), 2, n2, n2, specs_exp,
          dict(pallas_mode="on", pallas_pipeline=True))
    check("pipe2d_aniso", with_matvec(la2), 2, n2, n2, specs_exp,
          dict(pallas_mode="on", pallas_pipeline=True))
    check("twopass2d_iso", with_matvec(li2), 2, n2, n2, specs_exp,
          dict(pallas_mode="on", pallas_pipeline=False))
    check("twopass2d_aniso", with_matvec(la2), 2, n2, n2, specs_exp,
          dict(pallas_mode="on", pallas_pipeline=False))
    check("yslab3d_iso", with_matvec(li3), 2, R3, s3[2], specs_exp,
          dict(pallas_mode="on", pallas_ytile_3d=True,
               pallas_pipeline_3d=False), nat_shape=s3)
    check("yslab3d_aniso", with_matvec(la3), 2, R3, s3[2], specs_exp,
          dict(pallas_mode="on", pallas_ytile_3d=True,
               pallas_pipeline_3d=False), nat_shape=s3)
    check("rowtile3d_iso", with_matvec(li3), 2, R3, s3[2], specs_exp,
          dict(pallas_mode="on", pallas_ytile_3d=False), nat_shape=s3)
    check("rowtile3d_aniso", with_matvec(la3), 2, R3, s3[2], specs_exp,
          dict(pallas_mode="on", pallas_ytile_3d=False), nat_shape=s3)
    check("pipe3d_iso", with_matvec(li3), 2, R3, s3[2], specs_exp,
          dict(pallas_mode="on", pallas_ytile_3d=True,
               pallas_pipeline_3d=True), nat_shape=s3)
    check("gautschi_multi", with_matvec(li2), 1, n2, n2, specs_g,
          dict(pallas_mode="on", pallas_pipeline=True))

    def check_sewi(name, lap, shape, fuse=False):
        """Step-level planar sEWI vs the complex XLA sewi_step (round 5:
        the planar two-step path, models/nlse.sewi_step_planar) — B-term,
        three matfuncs (two when fused), and the planar i-rotation combine
        all exercised on-chip."""
        from nlsolvers_tpu.models import nlse as nlse_mod
        from nlsolvers_tpu.models.nonlinearities import (nlse_density,
                                                         nlse_density_planar)
        R, nx = int(np.prod(shape[:-1])), shape[-1]
        u = 0.1 * rng.standard_normal((2, R, nx)).astype(np.float32)
        mf = np.ones(shape, np.float32)
        dt = 1e-3
        desc = dict(lap._pallas_desc)
        rho_p = nlse_density_planar("cubic", jnp.asarray(mf.reshape(R, nx)))

        def fused_fn(x):
            up, upp = x, x
            for _ in range(2):
                up, upp = nlse_mod.sewi_step_planar(
                    up, upp, desc, rho_p, dt, m=m,
                    interpret=args.interpret, fuse_exp_sinc=fuse)
            return up

        old_mode = config.pallas_mode
        config.pallas_mode = "on"
        try:
            fused = np.asarray(jax.jit(fused_fn)(jnp.asarray(u)))
        finally:
            config.pallas_mode = old_mode
        rho_c = nlse_density("cubic", jnp.asarray(mf))

        def ref_fn(x):
            z = jax.lax.complex(x[0], x[1]).reshape(shape)
            zp = z
            for _ in range(2):
                z, zp = nlse_mod.sewi_step(z, zp, lap, rho_c, dt, m=m,
                                           fuse_exp_sinc=fuse)
            z = z.reshape(R, nx)
            return jnp.stack([jnp.real(z), jnp.imag(z)])

        config.pallas_mode = "off"
        try:
            ref = np.asarray(jax.jit(ref_fn)(jnp.asarray(u)))
        finally:
            config.pallas_mode = old_mode
        e = rel_l2(fused, ref)
        bad = int(np.sum(np.abs(fused - ref) > RTOL * np.abs(ref) + ATOL))
        rec = dict(family=name, rel_l2=[round(e, 9)],
                   ok=bool(bad == 0 and np.isfinite(fused).all()))
        results.append(rec)
        print(json.dumps(rec), flush=True)

    check_sewi("sewi2d_step", li2, (n2, n2))
    check_sewi("sewi2d_step_fused", li2, (n2, n2), fuse=True)
    check_sewi("sewi3d_step", li3, s3)
    check("fused_iter2d", with_matvec(li2), 2, n2, n2, specs_exp,
          dict(pallas_mode="on", pallas_pipeline=False, _FUSED_ITER=True))
    # brick pass1 (the 256^3 geometry) forced at this small shape by
    # shrinking the 3D module's VMEM budget below the y-slab requirement
    from nlsolvers_tpu.ops.pallas import lanczos3d_pipe as l3
    old_budget = l3._VMEM_BUDGET
    try:
        l3._VMEM_BUDGET = 4 * 2**20
        assert l3.pick_ty3d(s3[0], s3[1], s3[2], m - 2, 2, 0) == 0
        assert l3.pick_brick3d(s3[0], s3[1], s3[2], m - 2, 2, 0)
        check("brick3d_iso", with_matvec(li3), 2, R3, s3[2], specs_exp,
              dict(pallas_mode="on", pallas_ytile_3d=True,
                   pallas_pipeline_3d=False), nat_shape=s3)
        check("brick3d_aniso", with_matvec(la3), 2, R3, s3[2], specs_exp,
              dict(pallas_mode="on", pallas_ytile_3d=True,
                   pallas_pipeline_3d=False), nat_shape=s3)
    finally:
        l3._VMEM_BUDGET = old_budget

    # fused ghost-copy kernel (ops/pallas/bc3d.py) vs the .at[].set chain
    # — exact equality (pure copies)
    from nlsolvers_tpu.ops import boundaries as bcs
    from nlsolvers_tpu.ops.pallas.bc3d import neumann_bc_planar_3d
    ub = jnp.asarray(rng.standard_normal((2, R3, s3[2])).astype(np.float32))
    got_bc = np.asarray(jax.jit(
        lambda x: neumann_bc_planar_3d(x, s3))(ub))
    ref_bc = np.asarray(bcs.neumann_no_velocity_3d(
        ub.reshape((2,) + s3)).reshape(2, R3, s3[2]))
    rec = dict(family="bc3d", rel_l2=[rel_l2(got_bc, ref_bc)],
               ok=bool(np.array_equal(got_bc, ref_bc)))
    results.append(rec)
    print(json.dumps(rec), flush=True)

    if args.shard:
        shard_parity(results)

    out = Path(__file__).parent / "results" / f"tpu_parity_{args.tag}.json"
    out.parent.mkdir(exist_ok=True)
    payload = dict(backend=jax.default_backend(),
                   rtol=RTOL, atol=ATOL, krylov_m=m, families=results,
                   all_ok=all(r["ok"] for r in results))
    out.write_text(json.dumps(payload, indent=1))
    print(f"wrote {out}; all_ok={payload['all_ok']}")
    sys.exit(0 if payload["all_ok"] else 1)


def shard_parity(results):
    """Sharded y-slab kernels vs sharded XLA on a 1x1x1 mesh (the real
    chip; ppermutes are no-ops, psums identity — validates the Mosaic
    compilation of the sharded kernels and the deferred-norm scalar
    recovery on hardware)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from nlsolvers_tpu import config
    from nlsolvers_tpu.parallel import spatial

    rng = np.random.default_rng(11)
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1, 1),
                ("gz", "gy", "gx"))
    shape = (32, 32, 128)
    mf = np.ones(shape, np.float32)
    c = (1.0 + 0.4 * rng.random(shape)).astype(np.float32)
    u0 = 0.1 * rng.standard_normal((2,) + shape).astype(np.float32)
    from nlsolvers_tpu.ops.pallas import lanczos3d_pipe as l3

    def one(name, use_c, budget=None):
        kw = dict(axis_names=("gz", "gy", "gx"), krylov_m=6,
                  dtype=jnp.complex64, variant="clean", use_c=use_c)
        a = ((jnp.asarray(u0), jnp.asarray(mf), jnp.asarray(c)) if use_c
             else (jnp.asarray(u0), jnp.asarray(mf)))
        old = l3._VMEM_BUDGET
        config.pallas_mode = "on"
        try:
            # a shrunken budget forces pick_ty3d < 8 at this shape, so the
            # sharded dispatch routes through the BRICK pass1 kernels
            # (the 256^3-local geometry, VERDICT r4 next #2) — Mosaic
            # compilation validated on the real chip at harness scale
            if budget is not None:
                l3._VMEM_BUDGET = budget
            step = spatial.make_sharded_nlse_step("cubic", shape, 5.0,
                                                  1e-4, mesh, **kw)
            got = np.asarray(step(*a))
        finally:
            l3._VMEM_BUDGET = old
        config.pallas_mode = "off"
        step_ref = spatial.make_sharded_nlse_step("cubic", shape, 5.0,
                                                  1e-4, mesh, **kw)
        ref = np.asarray(step_ref(*a))
        config.pallas_mode = "auto"
        bad = int(np.sum(np.abs(got - ref) > RTOL * np.abs(ref) + ATOL))
        rec = dict(family=name, rel_l2=[rel_l2(got, ref)],
                   ok=bool(bad == 0 and np.isfinite(got).all()))
        results.append(rec)
        print(json.dumps(rec), flush=True)

    one("shard3d_iso", False)
    one("shard3d_aniso", True)
    one("shard3d_iso_brick", False, budget=4 * 2**20)
    one("shard3d_aniso_brick", True, budget=4 * 2**20)


if __name__ == "__main__":
    main()
