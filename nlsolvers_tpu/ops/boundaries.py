"""No-flux (Neumann) and experimental radiating boundary updates.

Functional equivalents of the reference's in-place ghost-row copies
(`nlsolvers/host/include/boundaries.hpp`, `boundaries_3d.hpp`,
`device/include/boundaries.cuh`). Each function returns new arrays (JAX is
functional); all operate on `(..., ny, nx)` / `(..., nz, ny, nx)` fields and
are batch-transparent.

Update order matters at corners and is preserved exactly:
2D (boundaries.hpp:10-57): first the two x-edge rows over interior columns
only, then the two full y-edge columns (which also set corners).
3D (boundaries_3d.hpp:8-31): x-faces over interior (y,z), then y-faces over
interior z / all x, then z-faces over all (x,y).
"""

import jax.numpy as jnp

__all__ = [
    "neumann_no_velocity_2d",
    "neumann_2d",
    "neumann_no_velocity_3d",
    "radiating_nlse_2d",
]


def neumann_no_velocity_2d(u):
    """u-only ghost copy (boundaries.hpp:41-57)."""
    u = u.at[..., 0, 1:-1].set(u[..., 1, 1:-1])
    u = u.at[..., -1, 1:-1].set(u[..., -2, 1:-1])
    u = u.at[..., :, 0].set(u[..., :, 1])
    u = u.at[..., :, -1].set(u[..., :, -2])
    return u


def neumann_2d(u, v):
    """Ghost copy on u, zero rim velocity (boundaries.hpp:10-38)."""
    u = neumann_no_velocity_2d(u)
    v = v.at[..., 0, 1:-1].set(0)
    v = v.at[..., -1, 1:-1].set(0)
    v = v.at[..., 1:-1, 0].set(0)
    v = v.at[..., 1:-1, -1].set(0)
    return u, v


def neumann_no_velocity_3d(u):
    """6-face ghost copy (boundaries_3d.hpp:8-31), preserving update order."""
    # x faces, interior y and z only
    u = u.at[..., 1:-1, 1:-1, 0].set(u[..., 1:-1, 1:-1, 1])
    u = u.at[..., 1:-1, 1:-1, -1].set(u[..., 1:-1, 1:-1, -2])
    # y faces, interior z, all x
    u = u.at[..., 1:-1, 0, :].set(u[..., 1:-1, 1, :])
    u = u.at[..., 1:-1, -1, :].set(u[..., 1:-1, -2, :])
    # z faces, all x and y
    u = u.at[..., 0, :, :].set(u[..., 1, :, :])
    u = u.at[..., -1, :, :].set(u[..., -2, :, :])
    return u


def radiating_nlse_2d(u, m, dx, dy):
    """Experimental radiating envelope BC (boundaries.hpp:59-121).

    Estimates a local effective wavenumber k from the discrete Laplacian plus
    the nonlinear term, clamps it to the Nyquist limit, and phase-shifts the
    boundary ring from the adjacent interior ring: u_edge = e^{-i k h} u_next.
    Corners are averaged from their two edge neighbors. Not used by production
    drivers in the reference; provided for capability parity.
    """
    uc = u
    h2 = dx * dx  # reference uses the per-direction h for each face

    def k_eff(inner, nb_sum, m_row, h):
        lap = (nb_sum - 4.0 * inner) / (h * h)
        nonlinear = m_row * jnp.abs(inner) ** 2
        k2 = jnp.real(-lap / inner + nonlinear)
        bad = ~jnp.isfinite(k2) | (k2 < 0)
        k2 = jnp.where(bad, jnp.abs(nonlinear), k2)
        k2 = jnp.minimum(k2, 2.0 / (h * h))
        return jnp.sqrt(k2)

    def face(inner, nbs, m_row, h):
        k = k_eff(inner, nbs, m_row, h)
        return jnp.exp(-1j * k * h) * inner

    # Left/right faces: interior ring rows i=1 and i=ny-2 (grid (..., ny, nx));
    # reference idx(i,j): i is the first grid axis. Neighbor sums of the ring
    # cells use the frozen copy uc.
    def nb4(i, j_slice):
        return (uc[..., i + 1, j_slice] + uc[..., i - 1, j_slice]
                + jnp.roll(uc, -1, axis=-1)[..., i, j_slice]
                + jnp.roll(uc, 1, axis=-1)[..., i, j_slice])

    ny, nx = u.shape[-2], u.shape[-1]
    js = slice(1, -1)
    u = u.at[..., 0, js].set(face(uc[..., 1, js], nb4(1, js), m[..., 1, js], dx))
    u = u.at[..., -1, js].set(
        face(uc[..., -2, js], nb4(ny - 2, js), m[..., -2, js], dx))

    def nb4_col(j):
        return (uc[..., :, j + 1] + uc[..., :, j - 1]
                + jnp.roll(uc, -1, axis=-2)[..., :, j]
                + jnp.roll(uc, 1, axis=-2)[..., :, j])

    is_ = slice(1, -1)
    u = u.at[..., is_, 0].set(
        face(uc[..., is_, 1], nb4_col(1)[..., is_], m[..., is_, 1], dy))
    u = u.at[..., is_, -1].set(
        face(uc[..., is_, -2], nb4_col(nx - 2)[..., is_], m[..., is_, -2], dy))

    # corners: average of the two adjacent edge cells (boundaries.hpp:117-120)
    u = u.at[..., 0, 0].set(0.5 * (u[..., 0, 1] + u[..., 1, 0]))
    u = u.at[..., 0, -1].set(0.5 * (u[..., 0, -2] + u[..., 1, -1]))
    u = u.at[..., -1, 0].set(0.5 * (u[..., -2, 0] + u[..., -1, 1]))
    u = u.at[..., -1, -1].set(0.5 * (u[..., -2, -1] + u[..., -1, -2]))
    return u
