#!/usr/bin/env python
"""Where do the production 3D SS2 step's milliseconds go?

The bare fused matfunc chain measures ~2.8 ms at 128^3 m=10 (~0.75 of
same-session triad — 2D-level efficiency), but the production step runs at
~4.8 ms. This interleaved A/B isolates the wrapper costs:

  matfunc   planar cos_sqrt chain (no complex, no conversions)
  expm      planar chain through krylov.matfunc_apply on COMPLEX input
            (pack/unpack + complex pointwise normalization)
  step      full problems.nlse_problem("cubic").step chain
  phases    the SS2 pointwise half-kicks alone (complex exp, no matfunc)
"""

import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

N, M, CHUNK, ROUNDS = 128, 10, 30, 5


def main():
    from nlsolvers_tpu.ops import operators as ops
    from nlsolvers_tpu.ops import krylov
    from nlsolvers_tpu.ops.pallas.lanczos2d import matfunc_apply_planar
    from nlsolvers_tpu.models import problems
    from nlsolvers_tpu.utils.complexio import pack_complex, unpack_complex

    n = N
    dx = 2 * 10.0 / (n - 1)
    lap = ops.laplacian_3d((n, n, n), dx, dtype=jnp.float32)
    desc = lap._pallas_desc
    rng = np.random.default_rng(0)
    up0 = jnp.asarray(
        0.1 * rng.standard_normal((2, n * n, n)).astype(np.float32))
    up3 = up0.reshape(2, n, n, n)
    mf = np.ones((n, n, n), np.float32)

    def norm(y):
        return y * lax.rsqrt(jnp.mean(y * y) + 1e-12)

    def f_matfunc(u):
        def body(_, u):
            return norm(matfunc_apply_planar(u, desc, 1e-3, "cos_sqrt", M))
        return lax.fori_loop(0, CHUNK, body, u)

    def f_expm(up):
        def body(_, up):
            u = lax.complex(up[0], up[1])
            y = krylov.expm_apply(lap, u, np.complex64(1e-3j), m=M)
            y = y * lax.rsqrt(jnp.mean(jnp.abs(y) ** 2) + 1e-12)
            return jnp.stack([jnp.real(y), jnp.imag(y)])
        return lax.fori_loop(0, CHUNK, body, up)

    # NB the committed r04 "step" numbers (4.62 ms) measured the ROUND-3
    # complex-state step; since the planar fast path landed, nlse_problem
    # returns a planar-state problem on TPU, so the chain below is
    # contract-aware (it now measures the CURRENT production step).
    prob = problems.nlse_problem("cubic", (n, n, n), 10.0, 1e-4,
                                 m_field=mf, krylov_m=M,
                                 dtype=jnp.complex64)
    planar_prob = prob.meta.get("planar_state", False)

    def f_step(up):
        def body(_, up):
            if planar_prob:
                return prob.step(up.reshape(2, n * n * n // n, n), 1
                                 ).reshape(up.shape)
            u = lax.complex(up[0], up[1])
            u = prob.step(u, 1)
            return jnp.stack([jnp.real(u), jnp.imag(u)])
        return lax.fori_loop(0, CHUNK, body, up)

    mfj = jnp.asarray(mf)

    def f_phases(up):
        def body(_, up):
            u = lax.complex(up[0], up[1])
            rho = mfj * (jnp.real(u) ** 2 + jnp.imag(u) ** 2)
            u = u * jnp.exp(1j * 5e-5 * rho)
            rho2 = mfj * (jnp.real(u) ** 2 + jnp.imag(u) ** 2)
            u = u * jnp.exp(1j * 5e-5 * rho2)
            return jnp.stack([jnp.real(u), jnp.imag(u)])
        return lax.fori_loop(0, CHUNK, body, up)

    fns = {
        "matfunc": (jax.jit(f_matfunc), up0),
        "expm": (jax.jit(f_expm), up3),
        "step": (jax.jit(f_step), up3),
        "phases": (jax.jit(f_phases), up3),
    }
    for k, (f, x) in fns.items():
        out = np.asarray(f(x)[:, :1, :1])
        assert np.isfinite(out).all(), k
        print(f"compiled {k}", flush=True)

    best = {k: float("inf") for k in fns}
    for r in range(ROUNDS):
        for k, (f, x) in fns.items():
            t0 = time.perf_counter()
            np.asarray(f(x)[:, :1, :1])
            best[k] = min(best[k], (time.perf_counter() - t0) / CHUNK)
        print(f"round {r}: " + "  ".join(f"{k}={best[k]*1e3:.3f}ms"
                                         for k in fns), flush=True)
    print("\nfinal (min ms/iter):")
    for k, v in best.items():
        print(f"  {k:8s} {v*1e3:8.3f} ms")


def planar_probe():
    """Second probe: f32 planar formulations of the wrapper pieces."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    import numpy as np
    import time
    from nlsolvers_tpu.ops import operators as ops
    from nlsolvers_tpu.ops.pallas.lanczos2d import matfunc_apply_planar

    n, M, CHUNK, ROUNDS = N, 10, 30, 5
    dx = 2 * 10.0 / (n - 1)
    lap = ops.laplacian_3d((n, n, n), dx, dtype=jnp.float32)
    desc = lap._pallas_desc
    rng = np.random.default_rng(0)
    up0 = jnp.asarray(
        0.1 * rng.standard_normal((2, n * n, n)).astype(np.float32))
    mfp = jnp.asarray(np.ones((n * n, n), np.float32))

    def kick(up, tau):
        rho = mfp * (up[0] * up[0] + up[1] * up[1])
        c, s = jnp.cos(tau * rho), jnp.sin(tau * rho)
        return jnp.stack([up[0] * c - up[1] * s, up[0] * s + up[1] * c])

    def f_phases_planar(up):
        def body(_, up):
            return kick(kick(up, 5e-5), 5e-5)
        return lax.fori_loop(0, CHUNK, body, up)

    def f_step_planar(up):
        # full SS2 on planar state: kick / expm via fused planar / kick
        def body(_, up):
            up = kick(up, 5e-5)
            y = matfunc_apply_planar(up, desc, 1e-4j, "exp", M)
            y = y * lax.rsqrt(jnp.mean(y * y) + 1e-12)
            return kick(y, 5e-5)
        return lax.fori_loop(0, CHUNK, body, up)

    fns = {"phases_planar": jax.jit(f_phases_planar),
           "step_planar": jax.jit(f_step_planar)}
    best = {}
    for k, f in fns.items():
        out = np.asarray(f(up0)[:, :1, :1])
        assert np.isfinite(out).all(), k
        best[k] = float("inf")
        print(f"compiled {k}", flush=True)
    for r in range(ROUNDS):
        for k, f in fns.items():
            t0 = time.perf_counter()
            np.asarray(f(up0)[:, :1, :1])
            best[k] = min(best[k], (time.perf_counter() - t0) / CHUNK)
        print(f"round {r}: " + "  ".join(f"{k}={best[k]*1e3:.3f}ms"
                                         for k in fns), flush=True)


if __name__ == "__main__":
    import sys as _s
    if "--planar" in _s.argv:
        planar_probe()
    else:
        main()
