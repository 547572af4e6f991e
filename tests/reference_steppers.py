"""Numpy ports of the reference's time steppers (golden oracles for tests).

Each function reproduces one reference step() verbatim, driving the dense
matrices from reference_ops.py through the numpy Lanczos pipeline — so the
JAX steppers can be tested for exact algorithm parity (1e-9), not just
qualitative agreement.
"""

import numpy as np

from reference_ops import matfunc_multiply


def neumann_bc(u2d):
    u = u2d.copy()
    u[0, 1:-1] = u[1, 1:-1]
    u[-1, 1:-1] = u[-2, 1:-1]
    u[:, 0] = u[:, 1]
    u[:, -1] = u[:, -2]
    return u


def _exp(t, lam):
    return np.exp(t * lam)


def _sinc(t, lam):
    x = t * lam
    return np.where(np.abs(x) < 1e-8, 1.0, np.sin(np.where(x == 0, 1, x)) / np.where(x == 0, 1, x))


def _cos_sqrt(t, lam):
    return np.cos(t * np.sqrt(np.abs(lam)))


def _id_sqrt(t, lam):
    return t * np.sqrt(np.abs(lam))


def _sinc2_sqrt_half(t, lam):
    th = t / 2 * np.sqrt(np.abs(lam))
    s = np.where(np.abs(th) < 1e-8, 1.0, np.sin(np.where(th == 0, 1, th)) / np.where(th == 0, 1, th))
    return s * s


def _mod_cosine(t, lam):
    th = t * np.sqrt(np.abs(lam))
    val = np.where(np.abs(th) < 1e-12, 1.0,
                   np.cos(th / 2) ** 2 * np.sin(np.where(th == 0, 1, th)) / np.where(th == 0, 1, th))
    return val * val


def nlse_ss2_step(u, L, m, dt, krylov_m):
    """NLSESolver::step (nlse_cubic_solver.hpp:54-74), flat vectors."""
    tau = 1j * dt
    rho = m * (u.real**2 + u.imag**2)
    u = np.exp(0.5 * tau * rho) * u
    u = matfunc_multiply(L.astype(complex), u, tau, _exp, m=krylov_m)
    rho = m * (u.real**2 + u.imag**2)
    return np.exp(0.5 * tau * rho) * u


def nlse_sewi_step(u, u_prev, L, m, dt, krylov_m):
    """NLSESolverDevice::step_sewi, non-bootstrap branch (nlse_dev.hpp:210-228)."""
    tau = 1j * dt
    B = -m * (u.real**2 + u.imag**2) * u
    psi = matfunc_multiply(L.astype(complex), B, dt, _sinc, m=krylov_m)
    e1 = matfunc_multiply(L.astype(complex), psi, tau, _exp, m=krylov_m)
    e2 = matfunc_multiply(L.astype(complex), u_prev, 2 * tau, _exp, m=krylov_m)
    return e2 - 2 * tau * e1, u


def realwave_gautschi_step(u, u_past, L, m, dt, g, krylov_m, filter_="id_sqrt"):
    """SGESolver/KGESolver/Phi4Solver::step pattern (sg_single_solver.hpp:42-59)."""
    filt = {"id_sqrt": _id_sqrt, "mod_cosine": _mod_cosine}[filter_]
    fu = matfunc_multiply(L, u, dt, filt, m=krylov_m)
    b = -m * g(fu)
    s2 = matfunc_multiply(L, b, dt, _sinc2_sqrt_half, m=krylov_m)
    cu = matfunc_multiply(L, u, dt, _cos_sqrt, m=krylov_m)
    return 2 * cu - u_past + dt * dt * s2, u


def realwave_sv_step(u, u_past, L, m, dt, g):
    """SGESolverSV::step pattern (sg_single_sv_solver.hpp:7-20)."""
    accel = L @ u - m * g(u)
    return 2 * u - u_past + dt * dt * accel, u
