#!/usr/bin/env python
"""Component-level timing of the headline 1024^2 NLSE SS2 step.

Interleaved-rounds methodology (the axon tunnel drifts between processes):
every candidate is timed in the same process, ROUNDS passes, min per
candidate. A D2H materialization fences each timing (block_until_ready
returns immediately on this backend).

Stages:
  identity   : fori_loop of a scalar multiply (loop + D2H floor)
  pointwise  : the two nonlinear half-phases only
  lanczos_pl : fused-Pallas m=10 Lanczos, no eigh/recombination
  matfunc_pl : full fused matfunc (lanczos + eigh + recombination)
  step_pl    : production ss2_step (fused path)
  step_xla   : production ss2_step (pure XLA path)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 1024
M = 10
LX = 10.0
DT = 1e-4
CHUNK = 200
ROUNDS = 4


def main():
    from nlsolvers_tpu import config
    from nlsolvers_tpu.ops import operators
    from nlsolvers_tpu.ops.pallas import lanczos2d
    from nlsolvers_tpu.models import nlse
    from nlsolvers_tpu.models.nonlinearities import nlse_density
    from nlsolvers_tpu.utils.complexio import pack_complex, unpack_complex

    x = np.linspace(-LX, LX, N, dtype=np.float32)
    X, Y = np.meshgrid(x, x, indexing="ij")
    env = np.exp(-(X**2 + Y**2) / 4).astype(np.float32)
    u0p = jnp.asarray(np.stack([env * np.cos(0.5 * X),
                                env * np.sin(0.5 * X)]))
    dx = 2 * LX / (N - 1)
    lap = operators.laplacian_2d((N, N), dx, dx, dtype=jnp.float32)
    desc = lap._pallas_desc
    rho = nlse_density("cubic", np.ones((N, N), np.float32))
    tau = np.complex64(1j * DT)
    interp = jax.default_backend() not in ("tpu", "axon")

    def loop_c(body):
        def fn(up):
            u = unpack_complex(up)
            u = jax.lax.fori_loop(0, CHUNK, lambda i, s: body(s), u)
            return pack_complex(u)
        return jax.jit(fn)

    def loop_p(body):
        def fn(up):
            return jax.lax.fori_loop(0, CHUNK, lambda i, s: body(s), up)
        return jax.jit(fn)

    def lanczos_only(up):
        W, s, a, b, b0 = lanczos2d.lanczos_planar(up, desc, M,
                                                  interpret=interp)
        out = W[-1] * (s[-1] * b0 + jnp.stack(a).sum() + jnp.stack(b).sum())
        return out.astype(up.dtype)

    def step_xla(u):
        config_val = nlse.ss2_step(u, lap, rho, DT, m=M)
        return config_val

    cands = {
        "identity": loop_c(lambda u: u * np.complex64(1.000001)),
        "pointwise": loop_c(lambda u: jnp.exp(0.5 * tau * rho(u)) * u),
        "lanczos_pl": loop_p(lanczos_only),
        "matfunc_pl": loop_p(lambda up: lanczos2d.matfunc_apply_planar(
            up, desc, tau, "exp", M, interpret=interp)),
    }
    config.pallas_mode = "auto"
    cands["step_pl"] = loop_c(lambda u: nlse.ss2_step(u, lap, rho, DT, m=M))

    results = {}
    args = {k: u0p for k in cands}
    for k, f in cands.items():
        np.asarray(f(args[k]))          # compile + warm
    # time step_xla separately (pallas_mode is read at trace time)
    config.pallas_mode = "off"
    f_xla = loop_c(lambda u: nlse.ss2_step(u, lap, rho, DT, m=M))
    np.asarray(f_xla(u0p))
    cands["step_xla"] = f_xla
    args["step_xla"] = u0p

    best = {k: float("inf") for k in cands}
    for r in range(ROUNDS):
        for k, f in cands.items():
            t0 = time.perf_counter()
            np.asarray(f(args[k]))
            best[k] = min(best[k], (time.perf_counter() - t0) / CHUNK)
    for k, v in best.items():
        print(f"{k:12s} {v*1e3:8.3f} ms/step   {1.0/v:8.1f} steps/s")


if __name__ == "__main__":
    main()
