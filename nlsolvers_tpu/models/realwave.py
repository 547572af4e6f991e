"""Real-wave steppers: Gautschi trigonometric integrator and Stormer-Verlet.

All real-wave equations in the suite share the form

    u_tt = Lap_c u - m(x) g(u)          (Lap_c = div(c grad .) or plain Lap)

with g from models/nonlinearities.py. Two-step schemes carry (u, u_past).

Gautschi (parity: SGESolver::step sg_single_solver.hpp:42-59, KGESolver::step
kg_solver.hpp:12-22, Phi4Solver, SGEDoubleSolver, SGEHyperbolicSolver):

    u_{n+1} = 2 cos(dt W) u - u_past + dt^2 sinc^2(dt/2 W) (-m g(F u))

where W = sqrt(|L|) via Lanczos (ops/krylov.py) and F is a filter —
mod_cosine for single sine-Gordon, id_sqrt (= dt*W) for the others. The
reference passes +Lap or -Lap inconsistently (sg_single_driver.cpp:93 vs
kg_driver.cpp:92); all its matfuncs take |lambda| so both signs agree — we
take the operator closure as given and do the same.

Stormer-Verlet (parity: SGESolverSV sg_single_sv_solver.hpp:7-20, KGESVSolver,
Phi4SVSolver — whose buf2 self-initialization UB we obviously fix):

    u_{n+1} = 2u - u_past + dt^2 (Lap u - m g(u))

Stochastic phi-4 SV (parity: device::SP4Solver::step stochastic_phi4.cuh:19-80)
adds white noise inside the force: -m (u - u^3 + xi), xi ~ sigma N(0,1) per
grid point per step. The reference seeds with time(nullptr)+idx; we use a
counter-based JAX PRNG key per step — reproducible by construction.
"""

import jax
import jax.numpy as jnp

from nlsolvers_tpu.ops.krylov import matfunc_apply, matfunc_apply_multi
from nlsolvers_tpu.config import default_krylov_m

__all__ = ["gautschi_step", "sv_step", "stochastic_sv_step"]


def gautschi_step(u, u_past, omega2, m_field, g_fn, dt,
                  m=default_krylov_m, filter_func="id_sqrt", reorth=True,
                  axis_names=()):
    """One Gautschi step; returns (u_new, u).

    `omega2` applies L = Omega^2 (sign-insensitive, see module docstring);
    `filter_func` is "mod_cosine" for single sine-Gordon (sg_single_solver.hpp:52)
    or "id_sqrt" for the rest.

    The filter and the cosine act on the SAME vector u, so they share one
    Lanczos decomposition (matfunc_apply_multi — bit-identical to separate
    runs): 2 Lanczos per step where the reference does 3
    (sg_single_solver.hpp:52-57).
    """
    fu, cu = matfunc_apply_multi(omega2, u,
                                 ((dt, filter_func), (dt, "cos_sqrt")),
                                 m=m, reorth=reorth, axis_names=axis_names)
    b = -(m_field * g_fn(fu))
    s2 = matfunc_apply(omega2, b, dt, "sinc2_sqrt_half", m=m, reorth=reorth,
                       axis_names=axis_names)
    return 2.0 * cu - u_past + (dt * dt) * s2, u


def sv_step(u, u_past, lap, m_field, g_fn, dt):
    """One Stormer-Verlet step; returns (u_new, u). `lap` applies +Lap."""
    accel = lap(u) - m_field * g_fn(u)
    return 2.0 * u - u_past + (dt * dt) * accel, u


def stochastic_sv_step(u, u_past, key, lap, m_field, dt, noise_strength):
    """One stochastic phi-4 SV step; returns (u_new, u).

    Force: Lap u - m (u - u^3 + sigma xi), xi ~ N(0,1) iid per point
    (stochastic_phi4.cuh:38-53).
    """
    xi = jax.random.normal(key, u.shape, u.dtype)
    accel = lap(u) - m_field * (u - u**3 + noise_strength * xi)
    return 2.0 * u - u_past + (dt * dt) * accel, u
