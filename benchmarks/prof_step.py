#!/usr/bin/env python
"""Component-level timing of the headline 1024^2 NLSE SS2 step.

Breaks the step into stages to locate the HBM-bandwidth sinks:
  pointwise : the two nonlinear half-phases only
  matvec    : 9 bare stencil applies (the Lanczos matvec budget at m=10)
  lanczos   : full m=10 Lanczos (matvecs + dots + full reorth), no eigh
  eigh      : lanczos + tridiagonal eigh + linear combination
  step      : the production ss2_step
Each stage is looped CHUNK times inside one jit to amortize dispatch.
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


def timeit(name, fn, u):
    # axon's block_until_ready returns immediately; a device->host
    # materialization (np.asarray) is the only reliable completion fence.
    f = jax.jit(fn)
    np.asarray(f(u))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(f(u))
        ts.append(time.perf_counter() - t0)
    per = min(ts) / CHUNK
    print(f"{name:12s} {per*1e3:8.3f} ms/step   {1.0/per:8.1f} steps/s")
    return per


def main():
    from nlsolvers_tpu.ops import operators
    from nlsolvers_tpu.ops.krylov import lanczos, expm_apply
    from nlsolvers_tpu.models import nlse
    from nlsolvers_tpu.models.nonlinearities import nlse_density
    from nlsolvers_tpu.utils.complexio import pack_complex, unpack_complex

    x = np.linspace(-LX, LX, N, dtype=np.float32)
    X, Y = np.meshgrid(x, x, indexing="ij")
    env = np.exp(-(X**2 + Y**2) / 4).astype(np.float32)
    u0p = jnp.asarray(np.stack([env * np.cos(0.5 * X), env * np.sin(0.5 * X)]))

    dx = 2 * LX / (N - 1)
    lap = operators.laplacian_2d((N, N), dx, dx, dtype=jnp.float32)
    rho = nlse_density("cubic", np.ones((N, N), np.float32))
    tau = np.complex64(1j * DT)

    def loop(body):
        def fn(up):
            u = unpack_complex(up)
            u = jax.lax.fori_loop(0, CHUNK, lambda i, s: body(s), u)
            return pack_complex(u)
        return fn

    timeit("identity", loop(lambda u: u * np.complex64(1.000001)), u0p)
    timeit("pointwise", loop(lambda u: jnp.exp(0.5 * tau * rho(u)) * u), u0p)
    timeit("matvec x9", loop(lambda u: jax.lax.fori_loop(
        0, M - 1, lambda i, s: lap(s).astype(s.dtype), u)), u0p)

    def lanczos_only(u):
        V, a, b, b0 = lanczos(lap, u, M)
        return (V[-1] * b0).astype(u.dtype)

    timeit("lanczos", loop(lanczos_only), u0p)
    timeit("lancz+eigh", loop(
        lambda u: expm_apply(lap, u, tau, m=M)), u0p)
    timeit("ss2 step", loop(
        lambda u: nlse.ss2_step(u, lap, rho, DT, m=M)), u0p)
    timeit("noreorth", loop(
        lambda u: nlse.ss2_step(u, lap, rho, DT, m=M, reorth=False)), u0p)


if __name__ == "__main__":
    main()
