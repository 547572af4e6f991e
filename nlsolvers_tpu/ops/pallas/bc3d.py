"""Fused no-flux ghost-copy kernel for planar 3D states (+ sharded grids).

The production 3D step applies the reference's 6-face Neumann ghost copy
every step (driver loops: nlse_cubic_driver_2d.cpp:107-110 /
nlse_cubic_sewi_driver_3d.cpp:118; semantics boundaries_3d.hpp:8-31). As
a jnp `.at[].set` chain this costs ~1.57 ms at 256^3 (~2.6 full-array
passes of XLA copies — benchmarks/exp256f_r05.py; a where-chain is worse,
4.0 ms, and clamped-index gathers 2.9 ms). This kernel streams the state
once (1 read + 1 write) and applies the ordered face selects in VMEM.

Block geometry: (P, tp, lny, nx) z-plane groups with tp >= 2 dividing
lnz, so every face's source value is IN-BLOCK: x/y faces copy within a
plane, and the z-face sources (planes 1 / NZ-2) sit in the same first/
last block. The select order (x faces on interior y,z; then y faces on
interior z; then z faces) matches `neumann_no_velocity_3d` exactly,
corners included — parity-pinned in tests/test_pallas.py and on chip by
the `bc3d` family of benchmarks/tpu_parity.py.

Sharded grids: face membership is decided by GLOBAL coordinates while
sources stay shard-local (local blocks >= 2 per axis — the same contract
as parallel/spatial.sharded_neumann_3d, whose where-chain this replaces
on the planar fast path). The shard's global offsets arrive as an SMEM
scalar triple, so one compiled kernel serves every shard.
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


def _bc_call(P, lnz, lny, nx, tp, NZ, NY, NX, interpret):
    grid = (lnz // tp,)
    blk = (P, tp, lny, nx)

    def kernel(offs, u_ref, out_ref):
        i = pl.program_id(0)
        u = u_ref[...]
        z0, y0, x0 = offs[0, 0], offs[0, 1], offs[0, 2]
        zi = (lax.broadcasted_iota(jnp.int32, (1, tp, 1, 1), 1)
              + i * tp + z0)                        # global z
        yi = lax.broadcasted_iota(jnp.int32, (1, 1, lny, 1), 2) + y0
        xi = lax.broadcasted_iota(jnp.int32, (1, 1, 1, nx), 3) + x0
        int_y = (yi >= 1) & (yi <= NY - 2)
        int_z = (zi >= 1) & (zi <= NZ - 2)
        # x faces (interior y, z), then y faces (interior z), then z faces
        # — boundaries_3d.hpp order; each select reads the updated field.
        # Sources are in-block: local index 1 / last-1 on the face's shard.
        u = jnp.where((xi == 0) & int_y & int_z, u[..., 1:2], u)
        u = jnp.where((xi == NX - 1) & int_y & int_z, u[..., nx - 2:nx - 1],
                      u)
        u = jnp.where((yi == 0) & int_z, u[:, :, 1:2, :], u)
        u = jnp.where((yi == NY - 1) & int_z, u[:, :, lny - 2:lny - 1, :],
                      u)
        # z faces: global plane 0 is local plane 0 of program 0 on the
        # z0 == 0 shard (source: local plane 1, in-block); global NZ-1 is
        # the last local plane of the last program on the top shard
        # (source: local plane tp-2, in-block)
        u = jnp.where(zi == 0, u[:, 1:2, :, :], u)
        u = jnp.where(zi == NZ - 1, u[:, tp - 2:tp - 1, :, :], u)
        out_ref[...] = u

    spec = pl.BlockSpec(blk, lambda i: (0, i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, 3), lambda i: (0, 0),
                               memory_space=pltpu.SMEM), spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((P, lnz, lny, nx), jnp.float32),
        compiler_params=_compiler_params(3, tp * lny, nx, P),
        interpret=interpret,
    )


def neumann_bc_planar_3d(up, shape, global_shape=None, offsets=None,
                         interpret=False):
    """Ghost copy on a planar (P, R, nx) float32 state; returns the same
    layout. `shape` is the (local) grid; for sharded grids pass the
    GLOBAL `global_shape` and the shard's `offsets` (z0, y0, x0) as
    traced int32 scalars. Caller gates on `pick_tp_bc(...) >= 2`, lane
    alignment, and local blocks >= 2 per axis."""
    lnz, lny, nx = shape
    NZ, NY, NX = global_shape if global_shape is not None else shape
    P = up.shape[0]
    tp = pick_tp_bc(lnz, lny, nx, P)
    if offsets is None:
        offs = jnp.zeros((1, 3), jnp.int32)
    else:
        offs = jnp.stack([jnp.asarray(o, jnp.int32)
                          for o in offsets]).reshape(1, 3)
    u4 = up.reshape(P, lnz, lny, nx)
    out = _bc_call(P, lnz, lny, nx, tp, NZ, NY, NX, interpret)(offs, u4)
    return out.reshape(P, lnz * lny, nx)
