"""Spatial domain decomposition: grids sharded over a device mesh.

NEW capability relative to the reference, which never decomposes a grid —
one trajectory always owns one whole device there (SURVEY.md §5, "the operator
is global CSR"). Here the (ny, nx) grid is split over mesh axes, the 5-point
stencil exchanges one-deep halos with `lax.ppermute` over ICI neighbors, and
every Lanczos inner product / norm is a `psum` (ops/krylov.py axis_names).

Everything runs inside `shard_map`; the helpers below build *local* operator
closures that are drop-in replacements for the single-device stencils in
ops/operators.py, verified bit-for-bit against them in tests/test_parallel.py.

Layout notes:
  * halo slabs are width-1; the edge shard of each mesh axis receives zeros
    from ppermute (no wraparound pairs), which is exactly the no-flux stencil's
    missing-neighbor semantics — the halo IS the boundary condition.
  * the reference-variant diagonal (-4/-3 ring) and the Neumann ghost copies
    need global coordinates, reconstructed from lax.axis_index.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nlsolvers_tpu.config import real_dtype_of
from nlsolvers_tpu.models import nlse as nlse_mod
from nlsolvers_tpu.models import realwave as rw
from nlsolvers_tpu.models.nonlinearities import nlse_density, realwave_g

__all__ = [
    "halo_neighbor_sum",
    "sharded_laplacian_2d",
    "sharded_anisotropic_laplacian_2d",
    "sharded_neumann_2d",
    "sharded_laplacian_3d",
    "sharded_neumann_3d",
    "make_sharded_nlse_step",
    "make_sharded_realwave_step",
]


def _axis_size(axis_name):
    return lax.psum(1, axis_name)


def _recv_from_next(slab, axis_name):
    """Each shard receives the given slab from its successor (last gets 0)."""
    size = lax.axis_size(axis_name)
    perm = [(i, i - 1) for i in range(1, size)]
    return lax.ppermute(slab, axis_name, perm)


def _recv_from_prev(slab, axis_name):
    """Each shard receives the given slab from its predecessor (first gets 0)."""
    size = lax.axis_size(axis_name)
    perm = [(i, i + 1) for i in range(size - 1)]
    return lax.ppermute(slab, axis_name, perm)


def halo_neighbor_sum(u, axis, axis_name):
    """Distributed analogue of ops.operators.neighbor_sum along one grid axis
    sharded over `axis_name`: u[i-1] + u[i+1] with cross-shard halos and zeros
    at the global ends."""
    n = u.shape[axis]
    fwd = lax.slice_in_dim(u, 1, n, axis=axis)
    bwd = lax.slice_in_dim(u, 0, n - 1, axis=axis)
    first = lax.slice_in_dim(u, 0, 1, axis=axis)
    last = lax.slice_in_dim(u, n - 1, n, axis=axis)
    halo_next = _recv_from_next(first, axis_name)  # successor's first row
    halo_prev = _recv_from_prev(last, axis_name)   # predecessor's last row
    return (jnp.concatenate([fwd, halo_next], axis=axis)
            + jnp.concatenate([halo_prev, bwd], axis=axis))


def _global_coords(local_shape, axis_names):
    """Global (row, col) index arrays of the local block, each (lny, lnx)."""
    lny, lnx = local_shape
    ay, ax = axis_names
    gy = (lax.axis_index(ay) * lny
          + lax.broadcasted_iota(jnp.int32, (lny, lnx), 0))
    gx = (lax.axis_index(ax) * lnx
          + lax.broadcasted_iota(jnp.int32, (lny, lnx), 1))
    return gy, gx


def sharded_laplacian_2d(global_shape, dx, dy, axis_names,
                         variant="reference", dtype=jnp.float32):
    """Local closure for the 2D no-flux Laplacian on a (ay, ax)-sharded grid.

    Semantics identical to ops.operators.laplacian_2d on the gathered global
    array (parity: laplacians.hpp:10-52, including the -3 ring diagonal).
    """
    NY, NX = global_shape
    ay, ax = axis_names
    scale = 1.0 / (dx * dy)

    def apply(u):
        lny, lnx = u.shape[-2:]
        gy, gx = _global_coords((lny, lnx), axis_names)
        ring = ((gy == 0) | (gy == NY - 1) | (gx == 0) | (gx == NX - 1))
        if variant == "reference":
            diag = jnp.where(ring, -3.0, -4.0).astype(dtype)
        elif variant == "clean":
            nnb = (4.0
                   - (gy == 0) - (gy == NY - 1)
                   - (gx == 0) - (gx == NX - 1))
            diag = (-nnb).astype(dtype)
        else:
            raise ValueError(f"unknown variant {variant!r}")
        nb = (halo_neighbor_sum(u, -1, ax) + halo_neighbor_sum(u, -2, ay))
        return (nb + diag * u) * scale

    # descriptor for the fused Pallas Lanczos kernels: the sharded mode
    # ppermutes halos and psums kernel reductions (ops/pallas/lanczos2d.py)
    apply._pallas_desc = dict(kind="shard2d", NY=int(NY), NX=int(NX),
                              scale=float(scale), sign=1.0, variant=variant,
                              ay=ay, ax=ax)
    return apply


def sharded_neumann_2d(global_shape, axis_names):
    """Local closure for the Neumann ghost copy on a sharded grid.

    Same update order as boundaries.hpp:41-57: edge rows over interior global
    columns first, then full edge columns. Uses where-masks on global
    coordinates; requires local blocks of at least 2 rows/cols.
    """
    NY, NX = global_shape

    def apply(u):
        lny, lnx = u.shape[-2:]
        gy, gx = _global_coords((lny, lnx), axis_names)
        interior_x = (gx >= 1) & (gx <= NX - 2)
        u = jnp.where((gy == 0) & interior_x, u[..., 1:2, :], u)
        u = jnp.where((gy == NY - 1) & interior_x, u[..., -2:-1, :], u)
        u = jnp.where(gx == 0, u[..., :, 1:2], u)
        u = jnp.where(gx == NX - 1, u[..., :, -2:-1], u)
        return u

    return apply


def _global_coords_3d(local_shape, axis_names):
    """Global (z, y, x) index arrays of the local block."""
    lnz, lny, lnx = local_shape
    az, ay, ax = axis_names
    shape = (lnz, lny, lnx)
    gz = (lax.axis_index(az) * lnz
          + lax.broadcasted_iota(jnp.int32, shape, 0))
    gy = (lax.axis_index(ay) * lny
          + lax.broadcasted_iota(jnp.int32, shape, 1))
    gx = (lax.axis_index(ax) * lnx
          + lax.broadcasted_iota(jnp.int32, shape, 2))
    return gz, gy, gx


def sharded_laplacian_3d(global_shape, dx, axis_names,
                         variant="clean", dtype=jnp.float32):
    """Local closure for the 3D no-flux Laplacian on a (az, ay, ax)-sharded
    grid, scaled 1/dx^2 like the reference (laplacians.hpp:105-156).

    variant="clean" (diagonal = -#neighbors, no seam couplings) works under
    any sharding. variant="reference" reproduces the cross-plane y-seam quirk
    (SURVEY.md, ops/operators.py laplacian_3d) and is only supported when the
    z and y mesh axes are singletons — the seam links the last y-row of each
    z-plane to the next plane's first row, which stays shard-local only if
    z*y is unsplit; a ValueError at trace time keeps wrong answers impossible.
    """
    NZ, NY, NX = global_shape
    az, ay, ax = axis_names
    scale = 1.0 / (dx * dx)

    def apply(u):
        lnz, lny, lnx = u.shape[-3:]
        gz, gy, gx = _global_coords_3d((lnz, lny, lnx), axis_names)
        boundary = ((gz == 0) | (gz == NZ - 1) | (gy == 0) | (gy == NY - 1)
                    | (gx == 0) | (gx == NX - 1))
        nb = (halo_neighbor_sum(u, -1, ax)
              + halo_neighbor_sum(u, -3, az))
        if variant == "reference":
            if lnz != NZ or lny != NY:
                raise ValueError(
                    "variant='reference' 3D sharding requires unsplit z and "
                    "y axes (the y-seam quirk is not shard-local); use "
                    "variant='clean' or shard only gx")
            diag = jnp.where(boundary, -5.0, -6.0).astype(dtype)
            # y-neighbors over the merged (z*y, x) view — the reference's
            # flat-index loop couples across plane seams (laplacians.hpp:140).
            v = u.reshape(u.shape[:-3] + (lnz * lny, lnx))
            nb = nb + neighbor_sum_local(v, -2).reshape(u.shape)
        elif variant == "clean":
            nnb = (6.0
                   - (gz == 0) - (gz == NZ - 1)
                   - (gy == 0) - (gy == NY - 1)
                   - (gx == 0) - (gx == NX - 1))
            diag = (-nnb).astype(dtype)
            nb = nb + halo_neighbor_sum(u, -2, ay)
        else:
            raise ValueError(f"unknown variant {variant!r}")
        return (nb + diag * u) * scale

    return apply


def sharded_anisotropic_laplacian_2d(global_shape, dx, dy, axis_names):
    """Local closure for finite-volume div(c grad u) on a sharded 2D grid.

    Semantics identical to ops.operators.anisotropic_laplacian_2d on the
    gathered global array (laplacians.hpp:54-103): face coupling = mean of
    the two cell c values, conservative diagonal. Cross-shard faces use
    ppermute'd edge columns/rows of BOTH u and c; global-boundary faces are
    masked to zero (no flux). Returns apply(u, c) — c is a per-call local
    field so per-trajectory coefficient sweeps stay one compiled program.
    """
    NY, NX = global_shape
    ay, ax = axis_names
    scale = 1.0 / (dx * dy)

    def apply(u, c):
        lny, lnx = u.shape[-2:]
        gy, gx = _global_coords((lny, lnx), axis_names)

        # --- x faces -----------------------------------------------------
        u_rcol = _recv_from_next(u[..., :, :1], ax)      # neighbor's col 0
        c_rcol = _recv_from_next(c[..., :, :1], ax)
        u_r = jnp.concatenate([u[..., :, 1:], u_rcol], axis=-1)
        c_r = jnp.concatenate([c[..., :, 1:], c_rcol], axis=-1)
        wx = 0.5 * (c + c_r)
        fx = wx * (u_r - u)
        fx = jnp.where(gx == NX - 1, 0.0, fx)            # no face past edge
        u_lcol = _recv_from_prev(u[..., :, -1:], ax)     # neighbor's last col
        c_lcol = _recv_from_prev(c[..., :, -1:], ax)
        fx_edge = 0.5 * (c_lcol + c[..., :, :1]) * (u[..., :, :1] - u_lcol)
        fx_l = jnp.concatenate([fx_edge, fx[..., :, :-1]], axis=-1)
        fx_l = jnp.where(gx == 0, 0.0, fx_l)

        # --- y faces -----------------------------------------------------
        u_brow = _recv_from_next(u[..., :1, :], ay)
        c_brow = _recv_from_next(c[..., :1, :], ay)
        u_b = jnp.concatenate([u[..., 1:, :], u_brow], axis=-2)
        c_b = jnp.concatenate([c[..., 1:, :], c_brow], axis=-2)
        wy = 0.5 * (c + c_b)
        fy = wy * (u_b - u)
        fy = jnp.where(gy == NY - 1, 0.0, fy)
        u_trow = _recv_from_prev(u[..., -1:, :], ay)
        c_trow = _recv_from_prev(c[..., -1:, :], ay)
        fy_edge = 0.5 * (c_trow + c[..., :1, :]) * (u[..., :1, :] - u_trow)
        fy_t = jnp.concatenate([fy_edge, fy[..., :-1, :]], axis=-2)
        fy_t = jnp.where(gy == 0, 0.0, fy_t)

        return (fx - fx_l + fy - fy_t) * scale

    return apply


def neighbor_sum_local(u, axis):
    """Shard-local neighbor sum (no halo) — for merged-view seam terms."""
    n = u.shape[axis]
    fwd = lax.slice_in_dim(u, 1, n, axis=axis)
    bwd = lax.slice_in_dim(u, 0, n - 1, axis=axis)
    shape = list(u.shape)
    shape[axis] = 1
    z = jnp.zeros(shape, u.dtype)
    return (jnp.concatenate([fwd, z], axis=axis)
            + jnp.concatenate([z, bwd], axis=axis))


def sharded_neumann_3d(global_shape, axis_names):
    """Neumann ghost copy on a sharded 3D grid (boundaries_3d.hpp:8-31
    semantics via where-masks; requires local blocks >= 2 in each direction).
    """
    NZ, NY, NX = global_shape

    def apply(u):
        lnz, lny, lnx = u.shape[-3:]
        gz, gy, gx = _global_coords_3d((lnz, lny, lnx), axis_names)
        int_z = (gz >= 1) & (gz <= NZ - 2)
        int_y = (gy >= 1) & (gy <= NY - 2)
        # Same update order as ops.boundaries.neumann_no_velocity_3d:
        # x faces (interior y,z), y faces (interior z), z faces (all).
        u = jnp.where((gx == 0) & int_y & int_z, u[..., :, :, 1:2], u)
        u = jnp.where((gx == NX - 1) & int_y & int_z, u[..., :, :, -2:-1], u)
        u = jnp.where((gy == 0) & int_z, u[..., :, 1:2, :], u)
        u = jnp.where((gy == NY - 1) & int_z, u[..., :, -2:-1, :], u)
        u = jnp.where(gz == 0, u[..., 1:2, :, :], u)
        u = jnp.where(gz == NZ - 1, u[..., -2:-1, :, :], u)
        return u

    return apply


def _sharded_lap(global_shape, dx, axis_names, variant, rdtype):
    if len(global_shape) == 2:
        return sharded_laplacian_2d(global_shape, dx, dx, axis_names,
                                    variant=variant, dtype=rdtype)
    return sharded_laplacian_3d(global_shape, dx, axis_names,
                                variant=variant, dtype=rdtype)


def _sharded_neumann(global_shape, axis_names):
    if len(global_shape) == 2:
        return sharded_neumann_2d(global_shape, axis_names)
    return sharded_neumann_3d(global_shape, axis_names)


def _spec(mesh_axes, batch_axis):
    if batch_axis is None:
        return P(*mesh_axes)
    return P(batch_axis, *mesh_axes)


def make_sharded_nlse_step(kind, global_shape, Lx, dt, mesh,
                           axis_names=("gy", "gx"), batch_axis=None,
                           sigma1=1.0, sigma2=-0.1, kappa=1.0,
                           krylov_m=10, dtype=jnp.complex64,
                           variant="reference", apply_bc=True, reorth=True,
                           use_c=False):
    """Builds a jitted SS2 step over a spatially sharded (optionally also
    trajectory-batched) grid.

    Returns step(u_packed, m_field) -> u_packed, operating on GLOBAL arrays:
    u_packed is (2, *grid) stacked real/imag (or (2, B, *grid) with a batch
    axis), m_field is (*grid) / (B, *grid). Shardings follow the mesh axes;
    3D grids take axis_names=("gz", "gy", "gx"). With use_c=True the step
    takes an extra anisotropy field and applies the finite-volume
    div(c grad u) operator (2D only) with cross-shard face fluxes.
    """
    nx = global_shape[-1]
    dx = 2.0 * Lx / (nx - 1)
    rdtype = real_dtype_of(dtype)

    if use_c:
        if len(global_shape) != 2:
            raise ValueError("use_c sharding is 2D-only for now")
        aniso = sharded_anisotropic_laplacian_2d(global_shape, dx, dx,
                                                 axis_names)
    else:
        lap = _sharded_lap(global_shape, dx, axis_names, variant, rdtype)
    neumann = (_sharded_neumann(global_shape, axis_names) if apply_bc
               else (lambda u: u))

    def local_single(u, mloc, cloc=None):
        if use_c:
            op = lambda v: aniso(v, cloc)
            # per-call descriptor (c is a tracer) for the fused kernels
            op._pallas_desc = dict(kind="shard2d_aniso", NY=global_shape[0],
                                   NX=global_shape[1],
                                   scale=1.0 / (dx * dx), sign=1.0,
                                   variant="aniso", ay=axis_names[0],
                                   ax=axis_names[1], c=cloc)
        else:
            op = lap
        rho = nlse_density(kind, mloc, sigma1=sigma1, sigma2=sigma2,
                           kappa=kappa)
        u = nlse_mod.ss2_step(u, op, rho, dt, m=krylov_m, reorth=reorth,
                              axis_names=axis_names)
        return neumann(u)

    def local_step(u_packed, mloc, cloc=None):
        u = lax.complex(u_packed[0], u_packed[1])
        if batch_axis is None:
            u = local_single(u, mloc, cloc)
        elif use_c:
            u = jax.vmap(local_single)(u, mloc, cloc)
        else:
            u = jax.vmap(local_single)(u, mloc)
        return jnp.stack([jnp.real(u), jnp.imag(u)])

    grid_spec = _spec(axis_names, batch_axis)
    u_spec = (P(None, *axis_names) if batch_axis is None
              else P(None, batch_axis, *axis_names))
    in_specs = ((u_spec, grid_spec, grid_spec) if use_c
                else (u_spec, grid_spec))
    sharded = jax.shard_map(local_step, mesh=mesh,
                            in_specs=in_specs,
                            out_specs=u_spec, check_vma=False)
    return jax.jit(sharded)


def make_sharded_realwave_step(kind, global_shape, Lx, dt, mesh,
                               axis_names=("gy", "gx"), batch_axis=None,
                               integrator="gautschi", krylov_m=10,
                               dtype=jnp.float32, variant="reference",
                               apply_bc=True, reorth=True):
    """Builds a jitted real-wave step (Gautschi or SV) on a sharded grid.

    Returns step(u, u_past, m_field) -> (u_new, u) on GLOBAL (*grid) arrays
    (or (B, *grid) with batch_axis); 3D takes axis_names=("gz", "gy", "gx").
    """
    dx = 2.0 * Lx / (global_shape[-1] - 1)
    rdtype = real_dtype_of(dtype)
    g = realwave_g(kind)
    filter_func = "mod_cosine" if kind == "sine_gordon" else "id_sqrt"

    lap = _sharded_lap(global_shape, dx, axis_names, variant, rdtype)
    omega2 = lambda u: -lap(u)
    _d = getattr(lap, "_pallas_desc", None)
    if _d is not None:
        omega2._pallas_desc = dict(_d, sign=-_d["sign"])
    neumann = (_sharded_neumann(global_shape, axis_names) if apply_bc
               else (lambda u: u))

    def local_single(u, u_past, mloc):
        if integrator == "gautschi":
            u_new, u_past_new = rw.gautschi_step(
                u, u_past, omega2, mloc, g, dt, m=krylov_m,
                filter_func=filter_func, reorth=reorth,
                axis_names=axis_names)
        else:
            u_new, u_past_new = rw.sv_step(u, u_past, lap, mloc, g, dt)
        return neumann(u_new), u_past_new

    def local_step(u, u_past, mloc):
        if batch_axis is None:
            return local_single(u, u_past, mloc)
        return jax.vmap(local_single)(u, u_past, mloc)

    spec = _spec(axis_names, batch_axis)
    sharded = jax.shard_map(local_step, mesh=mesh,
                            in_specs=(spec, spec, spec),
                            out_specs=(spec, spec), check_vma=False)
    return jax.jit(sharded)
