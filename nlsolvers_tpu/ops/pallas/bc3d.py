"""Fused no-flux ghost-copy kernel for planar 3D states.

The production 3D step applies the reference's 6-face Neumann ghost copy
every step (driver loops: nlse_cubic_driver_2d.cpp:107-110 /
nlse_cubic_sewi_driver_3d.cpp:118; semantics boundaries_3d.hpp:8-31). As
a jnp `.at[].set` chain this costs ~1.57 ms at 256^3 (~2.6 full-array
passes of XLA copies — benchmarks/exp256f_r05.py; a where-chain is worse,
4.0 ms, and clamped-index gathers 2.9 ms). This kernel streams the state
once (1 read + 1 write) and applies the ordered face selects in VMEM.

Block geometry: (P, tp, ny, nx) z-plane groups with tp >= 2 dividing nz,
so every face's source value is IN-BLOCK: x/y faces copy within a plane,
and the z=0 / z=nz-1 faces read planes 1 / nz-2, which sit in the same
first/last block. The select order (x faces on interior y,z; then y
faces on interior z; then z faces) matches `neumann_no_velocity_3d`
exactly, corners included — parity-pinned in tests/test_pallas.py and on
chip by the `bc3d` family of benchmarks/tpu_parity.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nlsolvers_tpu.ops.pallas.lanczos2d import _VMEM_BUDGET, _compiler_params

__all__ = ["pick_tp_bc", "neumann_bc_planar_3d"]


def pick_tp_bc(nz, ny, nx, P):
    """Largest z-plane group (>= 2, divides nz) whose in+out blocks fit
    the VMEM budget double-buffered."""
    best = 0
    tp = 2
    while tp <= nz:
        if nz % tp == 0:
            blk = P * tp * ny * nx * 4
            if 2 * 2 * blk <= _VMEM_BUDGET:
                best = tp
        tp += 2
    return best


def _bc_call(P, nz, ny, nx, tp, interpret):
    grid = (nz // tp,)
    blk = (P, tp, ny, nx)

    def kernel(u_ref, out_ref):
        i = pl.program_id(0)
        u = u_ref[...]
        zi = lax.broadcasted_iota(jnp.int32, (1, tp, 1, 1), 1) + i * tp
        yi = lax.broadcasted_iota(jnp.int32, (1, 1, ny, 1), 2)
        xi = lax.broadcasted_iota(jnp.int32, (1, 1, 1, nx), 3)
        int_y = (yi >= 1) & (yi <= ny - 2)
        int_z = (zi >= 1) & (zi <= nz - 2)
        # x faces (interior y, z), then y faces (interior z), then z faces
        # — boundaries_3d.hpp order; each select reads the updated field
        u = jnp.where((xi == 0) & int_y & int_z, u[..., 1:2], u)
        u = jnp.where((xi == nx - 1) & int_y & int_z, u[..., nx - 2:nx - 1],
                      u)
        u = jnp.where((yi == 0) & int_z, u[:, :, 1:2, :], u)
        u = jnp.where((yi == ny - 1) & int_z, u[:, :, ny - 2:ny - 1, :], u)
        # z faces: only program 0 holds z=0 (source plane 1 in-block) and
        # only the last holds z=nz-1 (source plane tp-2 in-block)
        u = jnp.where(zi == 0, u[:, 1:2, :, :], u)
        u = jnp.where(zi == nz - 1, u[:, tp - 2:tp - 1, :, :], u)
        out_ref[...] = u

    spec = pl.BlockSpec(blk, lambda i: (0, i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((P, nz, ny, nx), jnp.float32),
        compiler_params=_compiler_params(3, tp * ny, nx, P),
        interpret=interpret,
    )


def neumann_bc_planar_3d(up, shape, interpret=False):
    """Ghost copy on a planar (P, R, nx) float32 state; returns the same
    layout. Caller gates on `pick_tp_bc(...) >= 2` and lane alignment."""
    nz, ny, nx = shape
    P = up.shape[0]
    tp = pick_tp_bc(nz, ny, nx, P)
    u4 = up.reshape(P, nz, ny, nx)
    out = _bc_call(P, nz, ny, nx, tp, interpret)(u4)
    return out.reshape(P, nz * ny, nx)
