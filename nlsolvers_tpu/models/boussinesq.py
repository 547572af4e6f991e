"""Boussinesq equation steppers (gen-1 capability, root bouss_solver.hpp).

    u_tt - Lap u + 3 (u^2)_xx - u_xxxx = 0
    =>  u_tt + L u = g(u),   L = -Lap - d^4/dx^4,   g(u) = -3 (u^2)_xx

Gautschi step (bouss_solver.hpp:48-67):
    u_{n+1} = 2 cos(dt W) u - u_past + dt^2 sinc^2(dt/2 W) g(F u),  F = dt W
Stiff Stormer-Verlet (bouss_solver.hpp:69-81):
    u_{n+1} = 2u - u_past + dt^2 (L u + 3 (u^2)_xx)
    (the reference passes the same L closure; note its L sign convention means
    this integrates u_tt = L u + 3 (u^2)_xx with whatever L the caller built.)

`uxx_1d` reproduces the reference's hand-rolled second derivative along x with
its one-sided boundary closure (bouss_solver.hpp:17-45):
    row ends: (u[1] - u[0])/dx^2 and (u[-2] - u[-1])/dx^2.
"""

import jax.numpy as jnp

from nlsolvers_tpu.ops.krylov import matfunc_apply, matfunc_apply_multi
from nlsolvers_tpu.ops.operators import laplacian_2d, biharmonic_x
from nlsolvers_tpu.config import default_krylov_m

__all__ = ["uxx_1d", "boussinesq_omega2", "gautschi_step", "stiff_sv_step"]


def uxx_1d(u, dx):
    """Second derivative along the last axis with one-sided row-end closures."""
    inv = 1.0 / (dx * dx)
    interior = (u[..., :-2] - 2.0 * u[..., 1:-1] + u[..., 2:]) * inv
    left = ((u[..., 1] - u[..., 0]) * inv)[..., None]
    right = ((u[..., -2] - u[..., -1]) * inv)[..., None]
    return jnp.concatenate([left, interior, right], axis=-1)


def boussinesq_omega2(shape, dx, dtype=jnp.float64, variant="reference"):
    """L = -Lap - d4/dx4 as a matrix-free closure (bouss_solver.hpp:3-15)."""
    lap = laplacian_2d(shape, dx, dx, variant=variant, dtype=dtype)
    bih = biharmonic_x(shape, dx, dtype=dtype)

    def apply(u):
        return -lap(u) - bih(u)

    return apply


def gautschi_step(u, u_past, omega2, dx, dt, m=default_krylov_m, reorth=True):
    """One Boussinesq Gautschi step; returns (u_new, u).

    Filter and cosine share one Lanczos decomposition of u (bit-identical
    to separate runs, see ops/krylov.matfunc_apply_multi): 2 Lanczos per
    step where the reference does 3 (bouss_solver.hpp:48-67).
    """
    fu, cu = matfunc_apply_multi(omega2, u,
                                 ((dt, "id_sqrt"), (dt, "cos_sqrt")),
                                 m=m, reorth=reorth)
    g = -3.0 * uxx_1d(fu * fu, dx)
    s2 = matfunc_apply(omega2, g, dt, "sinc2_sqrt_half", m=m, reorth=reorth)
    return 2.0 * cu - u_past + (dt * dt) * s2, u


def stiff_sv_step(u, u_past, L_apply, dx, dt):
    """One stiff SV step; returns (u_new, u) (bouss_solver.hpp:69-81)."""
    accel = L_apply(u) + 3.0 * uxx_1d(u * u, dx)
    return 2.0 * u - u_past + (dt * dt) * accel, u
