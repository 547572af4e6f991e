"""Pipelined single-pass fused Lanczos for unsharded 3D grids (y-tiled).

The 2D pipelined kernel (`lanczos2d._pipe_call`) fuses iteration j's
reconstruction with iteration j+1's stencil in one kernel, streaming j+2
columns per iteration instead of the two-pass path's 2j+3. Porting that
to 3D was blocked by the z-neighbor: on the merged (nz*ny, nx) row view
the 7-point stencil needs the RECONSTRUCTED field one whole plane (ny
rows) away, which doesn't exist in HBM inside the fusing kernel.

The fix here is a different block geometry: blocks are (P, nz, ty, nx) —
the FULL z-extent over a y-slab. Then

* z-neighbors are internal shifts along the block's own nz axis (the
  missing neighbors at z = 0 / nz-1 are exact zero planes — no-flux);
* y-neighbors cross blocks only through single-row halo slabs
  (P, nz, 1, nx), which the kernel reconstructs from a stacked halo input
  by the same linear combination as the block itself — exactly the 2D
  pipe's gathered-halo trick, generalized per z;
* the reference variant's cross-plane y-seam couplings
  (laplacians.hpp:140's flat-index loop: row (z, ny-1) couples to
  (z+1, 0)) are carried IN the gathered slabs — the y=0 block's up-slab
  is u(z-1, ny-1, ·) with the z=0 plane zeroed, and symmetrically for
  the y=ny-1 block — so the kernel needs no seam masks at all.

No scratch, no dynamic VMEM addressing, short grids (ny/ty programs of
MB-scale blocks): the same streaming regime in which the 2D pipe reaches
~0.7 of measured HBM peak. Two earlier designs of this kernel (row-tiled
and plane-grouped blocks with rolling VMEM scratch windows over the
sequential grid) were built and measured ~1.1-1.2x over two-pass only —
Mosaic's dynamically-sliced VMEM access and the scratch round-trips ate
the traffic win.

HBM traffic per iteration: j+2 column reads + 2 writes (same as the 2D
pipe) vs the 3D two-pass kernels' (2j+6)+2. The scalar recurrence
(projections recovered from the previous kernel's d-dots and the gram
terms two kernels back) is exactly `lanczos2d._lanczos_pipe`'s.

Semantics parity: `build_laplacian_noflux_3d` and the anisotropic 3D
builder (laplacians.hpp:105-218); tests pin this path against the
pure-XLA operators and the two-pass kernels (tests/test_pallas.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nlsolvers_tpu.ops.pallas.lanczos2d import (
    _VMEM_BUDGET, _compiler_params, _pass1_call, _pick_tile, _pipe_call)

__all__ = ["lanczos_pipe3d", "lanczos_twopass3d_y", "pick_ty3d",
           "pick_brick3d"]


def pick_ty3d(nz, ny, nx, j, P, nop):
    """Largest y-tile (multiple of 8, divides ny) whose double-buffered
    stream set fits the VMEM budget. Streams: av + (j+1) W + 2 outputs +
    halo stack (worth ~(j+2)*2 rows) + nop aniso weight columns."""
    best = 0
    t = 8
    while t <= ny:
        if ny % t == 0:
            blk = P * nz * t * nx * 4
            halo = (j + 2) * P * nz * 2 * nx * 4
            if 2 * ((j + 5 + nop) * blk + halo) <= _VMEM_BUDGET:
                best = t
        t += 8
    return best


def pick_brick3d(nz, ny, nx, j, P, nop):
    """(tz, ty) brick for `_pass1zy_call` when the full-z y-slab blocks
    exceed VMEM (256^3-class grids): blocks are (P, tz, ty, nx) with BOTH
    z- and y-halos gathered jnp-side. Prefers the largest block area with
    the fattest y-tile (ty is the sublane dim). Returns None if nothing
    >= (8, 8) fits."""
    best = None
    best_score = (0, 0, 0)
    for ty in range(8 * (ny // 8), 7, -8):
        if ny % ty:
            continue
        for tz in range(nz, 7, -1):   # tz >= 8: thinner-z bricks re-enter
            if nz % tz:               # the program-grain-bound regime this
                continue              # geometry exists to avoid
            blk = P * tz * ty * nx * 4
            halos = P * (tz * 2 + 2 * ty) * nx * 4
            if 2 * ((j + 5 + nop) * blk + halos) <= _VMEM_BUDGET:
                # among max-area bricks prefer balanced ones (both halo
                # families stay small), then fatter y-tiles (sublane dim)
                score = (tz * ty, min(tz, ty), ty)
                if score > best_score:
                    best, best_score = (tz, ty), score
                break                      # larger tz won't fit either
    return best



def _dots4(P, Wi, w):
    """Inner-product partials of a (P, nz, ty, nx) block pair."""
    if P == 1:
        return jnp.sum(Wi[0] * w[0]), jnp.float32(0.0)
    re = jnp.sum(Wi[0] * w[0] + Wi[1] * w[1])
    im = jnp.sum(Wi[0] * w[1] - Wi[1] * w[0])
    return re, im


def _stencil_3d_y(u, up, dn, y0, ty, nz, ny, nx, scale, sign, variant):
    """7-point no-flux Laplacian of a (P, nz, ty, nx) y-slab block.

    `up`/`dn` are (P, nz, 1, nx) halo slabs carrying the exact y-neighbor
    values (including the reference variant's cross-plane seam couplings
    and the domain-edge zeros), so no y masks are needed in-kernel.
    Parity: `build_laplacian_noflux_3d` (laplacians.hpp:105-156) /
    ops/operators.laplacian_3d.
    """
    zc = jnp.zeros(u.shape[:3] + (1,), u.dtype)
    cols = lax.broadcasted_iota(jnp.int32, (1, 1, ty, nx), 3)
    lft, rgt = cols == 0, cols == nx - 1
    # the concats already place the zero column at the x edges, so no
    # where-select is needed on the shifted fields (r5: two fewer
    # full-block VPU selects — the 256^3 kernels are VPU-bound per
    # iteration, benchmarks/exp256b_r05.py); lft/rgt still feed the diag
    left = jnp.concatenate([zc, u[..., :-1]], axis=3)
    right = jnp.concatenate([u[..., 1:], zc], axis=3)
    above = jnp.concatenate([up, u[:, :, :-1, :]], axis=2)
    below = jnp.concatenate([u[:, :, 1:, :], dn], axis=2)
    zplane = jnp.zeros_like(u[:, :1])
    z_above = jnp.concatenate([zplane, u[:, :-1]], axis=1)
    z_below = jnp.concatenate([u[:, 1:], zplane], axis=1)
    zs = lax.broadcasted_iota(jnp.int32, (1, nz, ty, nx), 1)
    ys = lax.broadcasted_iota(jnp.int32, (1, nz, ty, nx), 2) + y0
    zb = (zs == 0) | (zs == nz - 1)
    yb = (ys == 0) | (ys == ny - 1)
    if variant == "reference":
        diag = jnp.where(zb | yb | lft | rgt, -5.0, -6.0)
    else:
        cnt = jnp.zeros((1, nz, ty, nx), u.dtype)
        for mask in (zs == 0, zs == nz - 1, ys == 0, ys == ny - 1,
                     lft, rgt):
            cnt = cnt + mask.astype(u.dtype)
        diag = -(6.0 - cnt)
    nb = above + below + z_above + z_below + left + right
    return (nb + diag * u) * (scale * sign)


def _stencil_aniso_3d_y(u, up, dn, wx, wy, wyh, wz, ty, scale, sign):
    """Finite-volume div(c grad u) of a (P, nz, ty, nx) y-slab block.

    Weights arrive zero-padded on their no-flux faces (see
    ops/operators.anisotropic_laplacian_3d), `up`/`dn` carry the exact
    y-neighbor slabs (seam-aware), `wyh` the block's -y face-weight halo
    slab (zeros where no face exists), and wz's -z shift is internal with
    a zero plane at z=0. Parity: laplacians.hpp:158-218.
    """
    zc = jnp.zeros(u.shape[:3] + (1,), u.dtype)
    u_r = jnp.concatenate([u[..., 1:], zc], axis=3)
    fx = wx * (u_r - u)                                 # 0 at col nx-1
    zc1 = jnp.zeros(fx.shape[:3] + (1,), fx.dtype)
    fx_l = jnp.concatenate([zc1, fx[..., :-1]], axis=3)
    below = jnp.concatenate([u[:, :, 1:, :], dn], axis=2)
    fy = wy * (below - u)                               # 0 where padded
    above = jnp.concatenate([up, u[:, :, :-1, :]], axis=2)
    wy_up = jnp.concatenate([wyh, wy[:, :, :-1, :]], axis=2)
    fy_m1 = wy_up * (u - above)                         # wyh = 0 at y = 0
    zplane = jnp.zeros_like(u[:, :1])
    z_below = jnp.concatenate([u[:, 1:], zplane], axis=1)
    fz = wz * (z_below - u)                             # 0 at z = nz-1
    z_above = jnp.concatenate([zplane, u[:, :-1]], axis=1)
    wzp = jnp.zeros_like(wz[:, :1])
    wz_up = jnp.concatenate([wzp, wz[:, :-1]], axis=1)
    fz_m = wz_up * (u - z_above)                        # 0 at z = 0
    return (fx - fx_l + fy - fy_m1 + fz - fz_m) * (scale * sign)


def _stencil_3d_brick(u, up, dn, zup, zdn, z0, y0, tz, ty, nz, ny, nx,
                      scale, sign, variant):
    """7-point no-flux Laplacian of a (P, tz, ty, nx) BRICK block.

    Generalizes `_stencil_3d_y` to z-tiled bricks: the z-neighbors at the
    brick faces arrive as exact gathered halo planes `zup`/`zdn`
    (P, 1, ty, nx) — zeros at the true domain ends — instead of being
    internal zero planes; `up`/`dn` are the y-halo slabs as before. The
    variant diagonal uses global (z0+*, y0+*) coordinates.
    """
    zc = jnp.zeros(u.shape[:3] + (1,), u.dtype)
    cols = lax.broadcasted_iota(jnp.int32, (1, 1, ty, nx), 3)
    lft, rgt = cols == 0, cols == nx - 1
    # concats already zero the x edges — no where-select (see
    # _stencil_3d_y; benchmarks/exp256b_r05.py)
    left = jnp.concatenate([zc, u[..., :-1]], axis=3)
    right = jnp.concatenate([u[..., 1:], zc], axis=3)
    above = jnp.concatenate([up, u[:, :, :-1, :]], axis=2)
    below = jnp.concatenate([u[:, :, 1:, :], dn], axis=2)
    z_above = jnp.concatenate([zup, u[:, :-1]], axis=1)
    z_below = jnp.concatenate([u[:, 1:], zdn], axis=1)
    zs = lax.broadcasted_iota(jnp.int32, (1, tz, ty, nx), 1) + z0
    ys = lax.broadcasted_iota(jnp.int32, (1, tz, ty, nx), 2) + y0
    zb = (zs == 0) | (zs == nz - 1)
    yb = (ys == 0) | (ys == ny - 1)
    if variant == "reference":
        diag = jnp.where(zb | yb | lft | rgt, -5.0, -6.0)
    else:
        cnt = jnp.zeros((1, tz, ty, nx), u.dtype)
        for mask in (zs == 0, zs == nz - 1, ys == 0, ys == ny - 1,
                     lft, rgt):
            cnt = cnt + mask.astype(u.dtype)
        diag = -(6.0 - cnt)
    nb = above + below + z_above + z_below + left + right
    return (nb + diag * u) * (scale * sign)


def _stencil_aniso_3d_brick(u, up, dn, zup, zdn, wx, wy, wyh, wz, wzh,
                            scale, sign):
    """Finite-volume div(c grad u) of a (P, tz, ty, nx) BRICK block.

    Like `_stencil_aniso_3d_y` with z-brick faces: the -z/-z-weight planes
    at the brick's first plane arrive as exact gathered halos `zup`/`wzh`
    (zeros where the domain has no face), `zdn` the +z neighbor plane.
    """
    zc = jnp.zeros(u.shape[:3] + (1,), u.dtype)
    u_r = jnp.concatenate([u[..., 1:], zc], axis=3)
    fx = wx * (u_r - u)                                 # 0 at col nx-1
    zc1 = jnp.zeros(fx.shape[:3] + (1,), fx.dtype)
    fx_l = jnp.concatenate([zc1, fx[..., :-1]], axis=3)
    below = jnp.concatenate([u[:, :, 1:, :], dn], axis=2)
    fy = wy * (below - u)
    above = jnp.concatenate([up, u[:, :, :-1, :]], axis=2)
    wy_up = jnp.concatenate([wyh, wy[:, :, :-1, :]], axis=2)
    fy_m1 = wy_up * (u - above)
    z_below = jnp.concatenate([u[:, 1:], zdn], axis=1)
    fz = wz * (z_below - u)
    z_above = jnp.concatenate([zup, u[:, :-1]], axis=1)
    wz_up = jnp.concatenate([wzh, wz[:, :-1]], axis=1)
    fz_m = wz_up * (u - z_above)
    return (fx - fx_l + fy - fy_m1 + fz - fz_m) * (scale * sign)



def _pass1zy_call(j, P, nz, ny, nx, tz, ty, scale, sign, variant,
                  interpret, mode="iso3d"):
    """Two-pass pass1 on (P, tz, ty, nx) BRICKS — the 256^3-class geometry.

    Same math as `_pass1y_call`, but with a 2D (nz/tz, ny/ty) program grid.
    The y-halo slabs arrive gathered jnp-side (seam-aware,
    `gather_y_halos` — they are thin rows); the z-halo planes are streamed
    DIRECTLY from the W_j array via clamped block index maps (plane
    iz*tz-1 / (iz+1)*tz) with the domain-end zeros applied in-kernel from
    the global-z iota — round 5: the round-4 version gathered them with
    jnp.take/.at.set, which cost ~0.8 ms/iteration of XLA gather+copy
    traffic at 256^3, the bulk of the 0.62-of-peak gap (VERDICT r4 next
    #1; measured in benchmarks/exp256_r05.py + /tmp gather probes). The
    aniso mode streams the face weights per brick, with the -z face weight
    (wz at plane iz*tz-1) streamed the same clamped way. Restores the
    ~0.5-4 MB block-stream regime the y-slab kernels run in at 128^3 when
    the full-z slabs no longer fit VMEM (pick_ty3d returns 0)."""
    nzb, nyb = nz // tz, ny // ty
    grid = (nzb, nyb)
    blk = (P, tz, ty, nx)
    wblk = (1, tz, ty, nx)
    nop = {"iso3d": 0, "aniso3d": 5}[mode]

    def kernel(scal, u_ref, h_ref, zup_ref, zdn_ref, *rest):
        ops_ = rest[:nop]
        wrefs = rest[nop:nop + j]
        w_out, raw_out = rest[nop + j], rest[nop + j + 1]
        iz, iy = pl.program_id(0), pl.program_id(1)
        u = u_ref[...]
        h = h_ref[...]                        # (P, tz, 1, 2, nx)
        up = h[:, :, 0, 0, :][:, :, None, :]
        dn = h[:, :, 0, 1, :][:, :, None, :]
        # clamped streams carry a real neighbor plane everywhere; the
        # missing-neighbor zeros at the domain ends are scalar per-program
        # conditions (brick 0's up-plane, the last brick's down-plane)
        zup = jnp.where(iz == 0, 0.0, zup_ref[...])
        zdn = jnp.where(iz == nzb - 1, 0.0, zdn_ref[...])
        if mode == "aniso3d":
            wz_up = jnp.where(iz == 0, 0.0, ops_[4][...])
            av = _stencil_aniso_3d_brick(
                u, up, dn, zup, zdn, ops_[0][...], ops_[1][...],
                ops_[2][...][:, :, 0, :, :], ops_[3][...],
                wz_up, scale, sign)
        else:
            av = _stencil_3d_brick(u, up, dn, zup, zdn, iz * tz, iy * ty,
                                   tz, ty, nz, ny, nx, scale, sign,
                                   variant)
        w = scal[0, 0] * av
        if j > 0:
            w = w - scal[0, 1] * wrefs[j - 1][...]
        w_out[...] = w

        @pl.when((iz == 0) & (iy == 0))
        def _():
            for idx in range(j + 1):
                raw_out[idx, 0] = 0.0
                raw_out[idx, 1] = 0.0

        for idx in range(j + 1):
            Wi = u if idx == j else wrefs[idx][...]
            re, im = _dots4(P, Wi, w)
            raw_out[idx, 0] += re
            raw_out[idx, 1] += im

    center = lambda iz, iy: (0, iz, iy, 0)
    blkspec = pl.BlockSpec(blk, center, memory_space=pltpu.VMEM)
    zplane = (P, 1, ty, nx)
    zup_map = lambda iz, iy: (0, jnp.maximum(iz * tz - 1, 0), iy, 0)
    zdn_map = lambda iz, iy: (0, jnp.minimum((iz + 1) * tz, nz - 1), iy, 0)
    in_specs = [
        pl.BlockSpec((1, 2), lambda iz, iy: (0, 0),
                     memory_space=pltpu.SMEM),
        blkspec,
        pl.BlockSpec((P, tz, 1, 2, nx), lambda iz, iy: (0, iz, iy, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(zplane, zup_map, memory_space=pltpu.VMEM),
        pl.BlockSpec(zplane, zdn_map, memory_space=pltpu.VMEM),
    ]
    if mode == "aniso3d":
        wspec = pl.BlockSpec(wblk, center, memory_space=pltpu.VMEM)
        in_specs += [
            wspec, wspec,                              # wx, wy
            pl.BlockSpec((1, tz, 1, 1, nx),            # wy halo slabs
                         lambda iz, iy: (0, iz, iy, 0, 0),
                         memory_space=pltpu.VMEM),
            wspec,                                     # wz
            pl.BlockSpec((1, 1, ty, nx), zup_map,      # wz at plane -1
                         memory_space=pltpu.VMEM),
        ]
    in_specs += [blkspec for _ in range(j)]
    out_specs = [
        blkspec,
        pl.BlockSpec((j + 1, 2), lambda iz, iy: (0, 0),
                     memory_space=pltpu.SMEM),
    ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((P, nz, ny, nx), jnp.float32),
                   jax.ShapeDtypeStruct((j + 1, 2), jnp.float32)],
        compiler_params=_compiler_params(j + 4 + nop, tz * ty, nx, P),
        interpret=interpret,
    )


def gather_y_halos(a4, ty, variant):
    """Per-y-block halo slabs of a (P, nz, ny, nx) field:
    (P, nz, nblk, 2, nx) where [..., k, 0, :] is the row above block k and
    [..., k, 1, :] the row below — with the reference variant's cross-plane
    seam values (z-shifted edge rows, domain ends zeroed) at the first/last
    block, exact zeros there otherwise."""
    P, nz, ny, nx = a4.shape
    nblk = ny // ty
    ks = np.arange(nblk)
    up = jnp.take(a4, jnp.asarray(np.maximum(ks * ty - 1, 0)), axis=2)
    dn = jnp.take(a4, jnp.asarray(np.minimum((ks + 1) * ty, ny - 1)),
                  axis=2)                                # (P, nz, nblk, nx)
    zrow = jnp.zeros_like(a4[:, :1, 0, :])
    if variant in ("reference", "seam"):
        # "seam": anisotropic operators always get seam-valued u halos —
        # whether they contribute is decided by the wy face weights (the
        # reference merged-row padding carries a nonzero seam face, the
        # clean padding zeros it), so the data stays correct either way.
        seam_up = jnp.concatenate([zrow, a4[:, :-1, -1, :]], axis=1)
        seam_dn = jnp.concatenate([a4[:, 1:, 0, :], zrow], axis=1)
    else:
        seam_up = jnp.zeros_like(up[:, :, 0, :])
        seam_dn = seam_up
    up = up.at[:, :, 0, :].set(seam_up)
    dn = dn.at[:, :, nblk - 1, :].set(seam_dn)
    return jnp.stack([up, dn], axis=3)                   # (P,nz,nblk,2,nx)


def _gather_wy_halos(wy4, ty):
    """-y face-weight halo slabs (1, nz, nblk, 1, nx): block k's first row
    uses the face weight at y = k*ty - 1; block 0's is the z-shifted seam
    face wy(z-1, ny-1) — automatically zero when the operator was built
    with the clean (per-plane zero-padded) weights."""
    _, nz, ny, nx = wy4.shape
    nblk = ny // ty
    ks = np.arange(nblk)
    wyh = jnp.take(wy4, jnp.asarray(np.maximum(ks * ty - 1, 0)), axis=2)
    zrow = jnp.zeros_like(wy4[:, :1, 0, :])
    seam = jnp.concatenate([zrow, wy4[:, :-1, -1, :]], axis=1)
    wyh = wyh.at[:, :, 0, :].set(seam)
    return wyh[:, :, :, None, :]                         # (1,nz,nblk,1,nx)


def _pass1y_call(j, P, nz, ny, nx, ty, scale, sign, variant, interpret,
                 mode):
    """Two-pass pass1 on y-slab blocks: w = s_j·A(W_j) − bs·W_{j-1} fused
    with the projection dots <W_i, w>, i <= j.

    Identical math to `lanczos2d._pass1_call` mode iso3d/aniso3d, but with
    the (P, nz, ty, nx) block geometry: the z-stencil is internal (no ±K
    z-offset block streams — 2 fewer streams of W_j), the y-halos arrive
    as exact gathered slabs, and the grid is ny/ty fat programs instead of
    nz·ny/tile row-tiles — the row-tiled 3D kernels run program-grain
    bound at ~0.5 of stream peak on v5e.

    Inputs: scal (1, 2) SMEM [s_j, bs], W_j block, W_j halo slabs,
    aniso weights (wx, wy, wyh slabs, wz), W_0..W_{j-1} blocks.
    Outputs: w block, raw (j+1, 2) SMEM.
    """
    nblk = ny // ty
    grid = (nblk,)
    blk = (P, nz, ty, nx)
    wblk = (1, nz, ty, nx)
    nop = {"iso3d": 0, "aniso3d": 4}[mode]

    def kernel(scal, u_ref, h_ref, *rest):
        ops_ = rest[:nop]
        wrefs = rest[nop:nop + j]
        w_out, raw_out = rest[nop + j], rest[nop + j + 1]
        i = pl.program_id(0)
        u = u_ref[...]
        h = h_ref[...]                       # (P, nz, 1, 2, nx)
        up = h[:, :, 0, 0, :][:, :, None, :]
        dn = h[:, :, 0, 1, :][:, :, None, :]
        if mode == "aniso3d":
            av = _stencil_aniso_3d_y(u, up, dn, ops_[0][...], ops_[1][...],
                                     ops_[2][:, :, 0, 0, :][:, :, None, :],
                                     ops_[3][...], ty, scale, sign)
        else:
            av = _stencil_3d_y(u, up, dn, i * ty, ty, nz, ny, nx, scale,
                               sign, variant)
        w = scal[0, 0] * av
        if j > 0:
            w = w - scal[0, 1] * wrefs[j - 1][...]
        w_out[...] = w

        @pl.when(i == 0)
        def _():
            for idx in range(j + 1):
                raw_out[idx, 0] = 0.0
                raw_out[idx, 1] = 0.0

        for idx in range(j + 1):
            Wi = u if idx == j else wrefs[idx][...]
            re, im = _dots4(P, Wi, w)
            raw_out[idx, 0] += re
            raw_out[idx, 1] += im

    center = lambda i: (0, 0, i, 0)
    blkspec = pl.BlockSpec(blk, center, memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        blkspec,
        pl.BlockSpec((P, nz, 1, 2, nx), lambda i: (0, 0, i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if mode == "aniso3d":
        wspec = pl.BlockSpec(wblk, center, memory_space=pltpu.VMEM)
        in_specs += [wspec, wspec,
                     pl.BlockSpec((1, nz, 1, 1, nx),
                                  lambda i: (0, 0, i, 0, 0),
                                  memory_space=pltpu.VMEM),
                     wspec]
    in_specs += [blkspec for _ in range(j)]
    out_specs = [
        blkspec,
        pl.BlockSpec((j + 1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((P, nz, ny, nx), jnp.float32),
                   jax.ShapeDtypeStruct((j + 1, 2), jnp.float32)],
        compiler_params=_compiler_params(j + 3 + nop, nz * ty, nx, P),
        interpret=interpret,
    )


def lanczos_twopass3d_y(u, m, P, R, nx, scale, sign, variant, mode, geom,
                        weights, safe_inv, interpret):
    """Two-pass Lanczos with the y-slab pass1 (`_pass1y_call`) and the
    geometry-agnostic `lanczos2d._pass2_call` on the merged row view —
    the production 3D fused path. Same recurrence as the row-tiled
    two-pass loop in `lanczos2d.lanczos_planar`, bit-comparable results
    (different block partition changes only reduction grouping)."""
    from nlsolvers_tpu.ops.pallas.lanczos2d import _pass2_call

    nz, ny = geom
    nop_pipe = 0 if mode == "iso3d" else 4
    halo_variant = "seam" if mode == "aniso3d" else variant
    if mode == "aniso3d":
        wx4, wy4, wz4 = (w.reshape(1, nz, ny, nx) for w in weights)
        wyh_cache = {}
    as4 = lambda a: a.reshape(P, nz, ny, nx)
    beta0 = jnp.sqrt(jnp.sum(u * u))
    W = [u]
    s = [safe_inv(beta0)]
    alphas, betas = [], []
    for j in range(m - 1):
        ty = pick_ty3d(nz, ny, nx, j, P, nop_pipe)
        bs = (betas[j - 1] * s[j - 1]) if j > 0 else jnp.float32(0.0)
        scal = jnp.stack([s[j].astype(jnp.float32),
                          bs.astype(jnp.float32)]).reshape(1, 2)
        if ty >= 8:
            halos = gather_y_halos(as4(W[j]), ty, halo_variant)
            args = [scal, as4(W[j]), halos]
            if mode == "aniso3d":
                if ty not in wyh_cache:
                    wyh_cache[ty] = _gather_wy_halos(wy4, ty)
                args += [wx4, wy4, wyh_cache[ty], wz4]
            args.extend(as4(a) for a in W[:j])
            w, raw = _pass1y_call(j, P, nz, ny, nx, ty, scale, sign,
                                  variant, interpret, mode)(*args)
        else:
            # 256^3-class late iterations: full-z slabs no longer fit —
            # brick geometry; z-halo planes stream straight from W_j via
            # clamped index maps (no jnp-side gather, r5)
            nop_brick = 0 if mode == "iso3d" else 5
            tz, tyb = pick_brick3d(nz, ny, nx, j, P, nop_brick)
            w4 = as4(W[j])
            halos = gather_y_halos(w4, tyb, halo_variant)
            args = [scal, w4, halos, w4, w4]
            if mode == "aniso3d":
                if tyb not in wyh_cache:
                    wyh_cache[tyb] = _gather_wy_halos(wy4, tyb)
                args += [wx4, wy4, wyh_cache[tyb], wz4, wz4]
            args.extend(as4(a) for a in W[:j])
            w, raw = _pass1zy_call(j, P, nz, ny, nx, tz, tyb, scale, sign,
                                   variant, interpret, mode)(*args)
        w = w.reshape(P, R, nx)
        sv = jnp.stack([si.astype(jnp.float32) for si in s])     # (j+1,)
        proj = sv[:, None] * raw                                  # (j+1, 2)
        alphas.append(proj[j, 0])
        q = sv[:, None] * proj
        tile2 = _pick_tile(R, nx, j + 4, nplanes=P)
        wn, nsq = _pass2_call(j, P, R, nx, tile2, interpret)(
            q, w, *W[:j + 1])
        b = jnp.sqrt(nsq[0, 0])
        W.append(wn)
        s.append(safe_inv(b))
        betas.append(b)
    return W, s, alphas, betas, beta0


def _shard_diag(gz, gy, gx, NZ, NY, NX, variant, dtype):
    """Per-cell variant diagonal from GLOBAL coordinate iotas — the same
    formula the caller used to build the streamed diag column; computed
    in-register instead (round 5: the streamed column costs a full
    weight-column read per iteration — 67 MB at 256^3-local shards)."""
    if variant == "reference":
        bnd = ((gz == 0) | (gz == NZ - 1) | (gy == 0) | (gy == NY - 1)
               | (gx == 0) | (gx == NX - 1))
        return jnp.where(bnd, -5.0, -6.0).astype(dtype)
    nnb = (6.0 - (gz == 0) - (gz == NZ - 1) - (gy == 0)
           - (gy == NY - 1) - (gx == 0) - (gx == NX - 1))
    return (-nnb).astype(dtype)


def _pass1y_shard_call(j, P, lnz, lny, nx, ty, scale, sign, NZ, NY, NX,
                       variant, interpret):
    """Sharded y-slab pass1 (7-point iso Laplacian on a SHARDED 3D grid):
    w = (A/chat)·W_j fused with the shard-local projection dots (the
    caller psums them; deferred-norm CGS, scal = [1/chat, 0]).

    All boundary/seam structure lives in jnp-side data or global-coord
    iotas: the variant diagonal is generated in-kernel from the shard's
    global offsets (SMEM triple — round 5; previously a streamed
    (1, lnz, ty, nx) column, one extra weight-column read per iteration),
    the y-halo slabs carry ppermute'd ay rows (or the reference variant's
    seam rows) with zeros at true domain edges, `hc` the ppermute'd x
    columns, and `zht`/`zhb` the ppermute'd z-neighbor planes that
    replace the unsharded kernel's zero planes. Parity target:
    laplacians.hpp:105-156 via parallel/spatial.sharded_laplacian_3d.

    Inputs: scal (1,2) SMEM [s_j, bs], offs (1,3) SMEM int32 (z0, y0, x0),
    W_j block (P, lnz, ty, nx), halo slabs (P, lnz, nblk, 2, nx), hc
    x-columns (P, lnz, ty, 2), zht/zhb z-halo planes (P, 1, ty, nx slices
    of the (P, 1, lny, nx) slabs), W_0..W_{j-1} blocks. Outputs: w, raw
    SMEM. The caller passes scal = [1/chat, 0] (deferred-norm CGS, see
    lanczos_twopass3d_y_sharded).
    """
    nblk = lny // ty
    grid = (nblk,)
    blk = (P, lnz, ty, nx)

    def kernel(scal, offs, u_ref, h_ref, hc_ref, zht_ref, zhb_ref,
               *rest):
        wrefs = rest[:j]
        w_out, raw_out = rest[j], rest[j + 1]
        i = pl.program_id(0)
        u = u_ref[...]
        h = h_ref[...]
        up = h[:, :, 0, 0, :][:, :, None, :]
        dn = h[:, :, 0, 1, :][:, :, None, :]
        hc = hc_ref[...]
        left = jnp.concatenate([hc[..., 0:1], u[..., :-1]], axis=3)
        right = jnp.concatenate([u[..., 1:], hc[..., 1:2]], axis=3)
        above = jnp.concatenate([up, u[:, :, :-1, :]], axis=2)
        below = jnp.concatenate([u[:, :, 1:, :], dn], axis=2)
        z_above = jnp.concatenate([zht_ref[...], u[:, :-1]], axis=1)
        z_below = jnp.concatenate([u[:, 1:], zhb_ref[...]], axis=1)
        nb = above + below + z_above + z_below + left + right
        gz = (lax.broadcasted_iota(jnp.int32, (1, lnz, 1, 1), 1)
              + offs[0, 0])
        gy = (lax.broadcasted_iota(jnp.int32, (1, 1, ty, 1), 2)
              + i * ty + offs[0, 1])
        gx = (lax.broadcasted_iota(jnp.int32, (1, 1, 1, nx), 3)
              + offs[0, 2])
        diag = _shard_diag(gz, gy, gx, NZ, NY, NX, variant, u.dtype)
        av = (nb + diag * u) * (scale * sign)
        w = scal[0, 0] * av
        if j > 0:
            w = w - scal[0, 1] * wrefs[j - 1][...]
        w_out[...] = w

        @pl.when(i == 0)
        def _():
            for idx in range(j + 1):
                raw_out[idx, 0] = 0.0
                raw_out[idx, 1] = 0.0

        for idx in range(j + 1):
            Wi = u if idx == j else wrefs[idx][...]
            re, im = _dots4(P, Wi, w)
            raw_out[idx, 0] += re
            raw_out[idx, 1] += im

    center = lambda i: (0, 0, i, 0)
    blkspec = pl.BlockSpec(blk, center, memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
        blkspec,
        pl.BlockSpec((P, lnz, 1, 2, nx), lambda i: (0, 0, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((P, lnz, ty, 2), center, memory_space=pltpu.VMEM),
        pl.BlockSpec((P, 1, ty, nx), center, memory_space=pltpu.VMEM),
        pl.BlockSpec((P, 1, ty, nx), center, memory_space=pltpu.VMEM),
    ] + [blkspec for _ in range(j)]
    out_specs = [
        blkspec,
        pl.BlockSpec((j + 1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((P, lnz, lny, nx), jnp.float32),
                   jax.ShapeDtypeStruct((j + 1, 2), jnp.float32)],
        compiler_params=_compiler_params(j + 4, lnz * ty, nx, P),
        interpret=interpret,
    )


def _pass1y_shard_aniso_call(j, P, lnz, lny, nx, ty, scale, sign,
                             interpret):
    """Sharded ANISO y-slab pass1: finite-volume div(c grad u) on a
    SHARDED 3D grid, fused with the shard-local projection dots.

    Mask-free like `_pass1y_shard_call`: all boundary/seam/shard structure
    lives in the jnp-side data — padded face weights (zero on true no-flux
    faces, cross-shard faces ppermute-averaged), `wyh`/`wzh`/`wxl` the -y /
    -z / -x face-weight halos, `up`/`dn`/`hc`/`zht`/`zhb` the u halos. The
    z-stencil is internal to the (P, lnz, ty, nx) block (no z-offset block
    re-streams — the row-tiled aniso kernel's 2 extra u streams and wz
    re-fetch disappear). Parity: laplacians.hpp:158-218 via
    parallel/spatial.sharded_anisotropic_laplacian_3d.

    Inputs: scal (1,2) SMEM [1/chat, 0], W_j block, u halo slabs, hc
    x-columns, zht/zhb z-halo planes, wx/wy/wz (1, lnz, ty, nx) face
    weights, wyh (1, lnz, 1, 1, nx) -y face halo slabs, wzh (1, 1, ty, nx)
    -z face plane, wxl (1, lnz, ty, 1) -x face columns, W_0..W_{j-1}.
    Outputs: w block, raw (j+1, 2) SMEM.
    """
    nblk = lny // ty
    grid = (nblk,)
    blk = (P, lnz, ty, nx)
    wblk = (1, lnz, ty, nx)

    def kernel(scal, u_ref, h_ref, hc_ref, zht_ref, zhb_ref, wx_ref,
               wy_ref, wyh_ref, wz_ref, wzh_ref, wxl_ref, *rest):
        wrefs = rest[:j]
        w_out, raw_out = rest[j], rest[j + 1]
        u = u_ref[...]
        h = h_ref[...]
        up = h[:, :, 0, 0, :][:, :, None, :]
        dn = h[:, :, 0, 1, :][:, :, None, :]
        hc = hc_ref[...]
        wx, wy, wz = wx_ref[...], wy_ref[...], wz_ref[...]
        u_r = jnp.concatenate([u[..., 1:], hc[..., 1:2]], axis=3)
        fx = wx * (u_r - u)                       # zero at true +x edge
        fx_l = jnp.concatenate(
            [wxl_ref[...] * (u[..., 0:1] - hc[..., 0:1]), fx[..., :-1]],
            axis=3)
        below = jnp.concatenate([u[:, :, 1:, :], dn], axis=2)
        fy = wy * (below - u)
        above = jnp.concatenate([up, u[:, :, :-1, :]], axis=2)
        wy_up = jnp.concatenate([wyh_ref[...][:, :, 0, :, :],
                                 wy[:, :, :-1, :]], axis=2)
        fy_m1 = wy_up * (u - above)
        z_below = jnp.concatenate([u[:, 1:], zhb_ref[...]], axis=1)
        fz = wz * (z_below - u)
        z_above = jnp.concatenate([zht_ref[...], u[:, :-1]], axis=1)
        wz_up = jnp.concatenate([wzh_ref[...], wz[:, :-1]], axis=1)
        fz_m = wz_up * (u - z_above)
        av = (fx - fx_l + fy - fy_m1 + fz - fz_m) * (scale * sign)
        w = scal[0, 0] * av
        if j > 0:
            w = w - scal[0, 1] * wrefs[j - 1][...]
        w_out[...] = w

        @pl.when(pl.program_id(0) == 0)
        def _():
            for idx in range(j + 1):
                raw_out[idx, 0] = 0.0
                raw_out[idx, 1] = 0.0

        for idx in range(j + 1):
            Wi = u if idx == j else wrefs[idx][...]
            re, im = _dots4(P, Wi, w)
            raw_out[idx, 0] += re
            raw_out[idx, 1] += im

    center = lambda i: (0, 0, i, 0)
    blkspec = pl.BlockSpec(blk, center, memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec(wblk, center, memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        blkspec,
        pl.BlockSpec((P, lnz, 1, 2, nx), lambda i: (0, 0, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((P, lnz, ty, 2), center, memory_space=pltpu.VMEM),
        pl.BlockSpec((P, 1, ty, nx), center, memory_space=pltpu.VMEM),
        pl.BlockSpec((P, 1, ty, nx), center, memory_space=pltpu.VMEM),
        wspec,                                    # wx
        wspec,                                    # wy
        pl.BlockSpec((1, lnz, 1, 1, nx), lambda i: (0, 0, i, 0, 0),
                     memory_space=pltpu.VMEM),    # wyh slabs
        wspec,                                    # wz
        pl.BlockSpec((1, 1, ty, nx), center,
                     memory_space=pltpu.VMEM),    # wzh plane
        pl.BlockSpec((1, lnz, ty, 1), center,
                     memory_space=pltpu.VMEM),    # wxl columns
    ] + [blkspec for _ in range(j)]
    out_specs = [
        blkspec,
        pl.BlockSpec((j + 1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((P, lnz, lny, nx), jnp.float32),
                   jax.ShapeDtypeStruct((j + 1, 2), jnp.float32)],
        compiler_params=_compiler_params(j + 8, lnz * ty, nx, P),
        interpret=interpret,
    )


def _pass1zy_shard_call(j, P, lnz, lny, nx, tz, ty, scale, sign, NZ, NY,
                        NX, variant, interpret):
    """Sharded BRICK pass1 (7-point iso Laplacian): the 256^3-local-shard
    geometry inside shard_map (round 5, VERDICT r4 next #2 — without it,
    512^3 on a 2x2x2 mesh collapsed to the row-tiled kernels).

    Mask-free halos like `_pass1y_shard_call`: the variant diagonal is
    generated in-kernel from the shard's global offsets (SMEM triple —
    previously a streamed weight column, a 67 MB/iteration read at
    256^3-local shards), the y-halo slabs arrive gathered with the
    cross-shard ppermute edges spliced in by the caller (zeros at true
    domain ends), `hc` carries the ppermute'd x columns. The z-neighbor
    planes stream DIRECTLY from the local W_j array via clamped index
    maps; only the two boundary bricks select the ppermute'd az slabs
    `zht`/`zhb` instead (scalar per-program select — no jnp-side z
    gather, same r5 optimization as `_pass1zy_call`). 2D (nzb, nyb)
    program grid.

    Inputs: scal (1,2) SMEM [1/chat, 0], offs (1,3) SMEM int32, W_j brick
    (P, tz, ty, nx), y-halo slabs (P, lnz, nyb, 2, nx), zup/zdn clamped
    plane streams of W_j, zht/zhb az-halo slabs (P, 1, lny, nx), hc
    (P, lnz, lny, 2), W_0..W_{j-1} bricks. Outputs: w, raw (j+1, 2) SMEM.
    Parity: laplacians.hpp:105-156 via
    parallel/spatial.sharded_laplacian_3d.
    """
    nzb, nyb = lnz // tz, lny // ty
    grid = (nzb, nyb)
    blk = (P, tz, ty, nx)

    def kernel(scal, offs, u_ref, h_ref, zup_ref, zdn_ref, zht_ref,
               zhb_ref, hc_ref, *rest):
        wrefs = rest[:j]
        w_out, raw_out = rest[j], rest[j + 1]
        iz, iy = pl.program_id(0), pl.program_id(1)
        u = u_ref[...]
        h = h_ref[...]                        # (P, tz, 1, 2, nx)
        up = h[:, :, 0, 0, :][:, :, None, :]
        dn = h[:, :, 0, 1, :][:, :, None, :]
        zup = jnp.where(iz == 0, zht_ref[...], zup_ref[...])
        zdn = jnp.where(iz == nzb - 1, zhb_ref[...], zdn_ref[...])
        hc = hc_ref[...]                      # (P, tz, ty, 2)
        left = jnp.concatenate([hc[..., 0:1], u[..., :-1]], axis=3)
        right = jnp.concatenate([u[..., 1:], hc[..., 1:2]], axis=3)
        above = jnp.concatenate([up, u[:, :, :-1, :]], axis=2)
        below = jnp.concatenate([u[:, :, 1:, :], dn], axis=2)
        z_above = jnp.concatenate([zup, u[:, :-1]], axis=1)
        z_below = jnp.concatenate([u[:, 1:], zdn], axis=1)
        nb = above + below + z_above + z_below + left + right
        gz = (lax.broadcasted_iota(jnp.int32, (1, tz, 1, 1), 1)
              + iz * tz + offs[0, 0])
        gy = (lax.broadcasted_iota(jnp.int32, (1, 1, ty, 1), 2)
              + iy * ty + offs[0, 1])
        gx = (lax.broadcasted_iota(jnp.int32, (1, 1, 1, nx), 3)
              + offs[0, 2])
        diag = _shard_diag(gz, gy, gx, NZ, NY, NX, variant, u.dtype)
        av = (nb + diag * u) * (scale * sign)
        w = scal[0, 0] * av
        if j > 0:
            w = w - scal[0, 1] * wrefs[j - 1][...]
        w_out[...] = w

        @pl.when((iz == 0) & (iy == 0))
        def _():
            for idx in range(j + 1):
                raw_out[idx, 0] = 0.0
                raw_out[idx, 1] = 0.0

        for idx in range(j + 1):
            Wi = u if idx == j else wrefs[idx][...]
            re, im = _dots4(P, Wi, w)
            raw_out[idx, 0] += re
            raw_out[idx, 1] += im

    center = lambda iz, iy: (0, iz, iy, 0)
    blkspec = pl.BlockSpec(blk, center, memory_space=pltpu.VMEM)
    zplane = (P, 1, ty, nx)
    zup_map = lambda iz, iy: (0, jnp.maximum(iz * tz - 1, 0), iy, 0)
    zdn_map = lambda iz, iy: (0, jnp.minimum((iz + 1) * tz, lnz - 1), iy, 0)
    zh_map = lambda iz, iy: (0, 0, iy, 0)
    in_specs = [
        pl.BlockSpec((1, 2), lambda iz, iy: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 3), lambda iz, iy: (0, 0),
                     memory_space=pltpu.SMEM),
        blkspec,
        pl.BlockSpec((P, tz, 1, 2, nx), lambda iz, iy: (0, iz, iy, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(zplane, zup_map, memory_space=pltpu.VMEM),
        pl.BlockSpec(zplane, zdn_map, memory_space=pltpu.VMEM),
        pl.BlockSpec(zplane, zh_map, memory_space=pltpu.VMEM),
        pl.BlockSpec(zplane, zh_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((P, tz, ty, 2), center, memory_space=pltpu.VMEM),
    ] + [blkspec for _ in range(j)]
    out_specs = [
        blkspec,
        pl.BlockSpec((j + 1, 2), lambda iz, iy: (0, 0),
                     memory_space=pltpu.SMEM),
    ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((P, lnz, lny, nx), jnp.float32),
                   jax.ShapeDtypeStruct((j + 1, 2), jnp.float32)],
        compiler_params=_compiler_params(j + 4, tz * ty, nx, P),
        interpret=interpret,
    )


def _pass1zy_shard_aniso_call(j, P, lnz, lny, nx, tz, ty, scale, sign,
                              interpret):
    """Sharded BRICK ANISO pass1: finite-volume div(c grad u) on
    256^3-class local shards. Face weights arrive padded (cross-shard
    faces ppermute-averaged, zeros at true no-flux faces) and streamed per
    brick; `wyh` is the gathered -y face-weight halo slabs with the
    cross-shard splices, `wxl` the -x face-weight columns. The u
    z-neighbors and the -z face weight stream DIRECTLY via clamped plane
    maps, with the ppermute'd az slabs (`zht`/`zhb`/`wzh`) selected at the
    boundary bricks (r5 — no jnp-side z gathers).

    Inputs: scal, W_j brick, y-halo slabs, zup/zdn clamped plane streams,
    zht/zhb az-halo slabs, hc, wx, wy, wz (1, tz, ty, nx) face-weight
    bricks, wyh (1, tz, nyb, 1, nx) slabs, wz_up clamped -z face-weight
    plane stream, wzh (1, 1, lny, nx) az face-weight slab, wxl
    (1, tz, ty, 1) columns, W_0..W_{j-1}. Outputs: w, raw. Parity:
    laplacians.hpp:158-218 via
    parallel/spatial.sharded_anisotropic_laplacian_3d.
    """
    nzb, nyb = lnz // tz, lny // ty
    grid = (nzb, nyb)
    blk = (P, tz, ty, nx)
    wblk = (1, tz, ty, nx)

    def kernel(scal, u_ref, h_ref, zup_ref, zdn_ref, zht_ref, zhb_ref,
               hc_ref, wx_ref, wy_ref, wyh_ref, wz_ref, wzu_ref, wzh_ref,
               wxl_ref, *rest):
        wrefs = rest[:j]
        w_out, raw_out = rest[j], rest[j + 1]
        iz, iy = pl.program_id(0), pl.program_id(1)
        u = u_ref[...]
        h = h_ref[...]
        up = h[:, :, 0, 0, :][:, :, None, :]
        dn = h[:, :, 0, 1, :][:, :, None, :]
        zup = jnp.where(iz == 0, zht_ref[...], zup_ref[...])
        zdn = jnp.where(iz == nzb - 1, zhb_ref[...], zdn_ref[...])
        hc = hc_ref[...]
        wx, wy, wz = wx_ref[...], wy_ref[...], wz_ref[...]
        u_r = jnp.concatenate([u[..., 1:], hc[..., 1:2]], axis=3)
        fx = wx * (u_r - u)                   # zero at true +x edge
        fx_l = jnp.concatenate(
            [wxl_ref[...] * (u[..., 0:1] - hc[..., 0:1]), fx[..., :-1]],
            axis=3)
        below = jnp.concatenate([u[:, :, 1:, :], dn], axis=2)
        fy = wy * (below - u)
        above = jnp.concatenate([up, u[:, :, :-1, :]], axis=2)
        wy_up = jnp.concatenate([wyh_ref[...][:, :, 0, :, :],
                                 wy[:, :, :-1, :]], axis=2)
        fy_m1 = wy_up * (u - above)
        z_below = jnp.concatenate([u[:, 1:], zdn], axis=1)
        fz = wz * (z_below - u)
        z_above = jnp.concatenate([zup, u[:, :-1]], axis=1)
        wzu = jnp.where(iz == 0, wzh_ref[...], wzu_ref[...])
        wz_up = jnp.concatenate([wzu, wz[:, :-1]], axis=1)
        fz_m = wz_up * (u - z_above)
        av = (fx - fx_l + fy - fy_m1 + fz - fz_m) * (scale * sign)
        w = scal[0, 0] * av
        if j > 0:
            w = w - scal[0, 1] * wrefs[j - 1][...]
        w_out[...] = w

        @pl.when((iz == 0) & (iy == 0))
        def _():
            for idx in range(j + 1):
                raw_out[idx, 0] = 0.0
                raw_out[idx, 1] = 0.0

        for idx in range(j + 1):
            Wi = u if idx == j else wrefs[idx][...]
            re, im = _dots4(P, Wi, w)
            raw_out[idx, 0] += re
            raw_out[idx, 1] += im

    center = lambda iz, iy: (0, iz, iy, 0)
    blkspec = pl.BlockSpec(blk, center, memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec(wblk, center, memory_space=pltpu.VMEM)
    zplane = (P, 1, ty, nx)
    zup_map = lambda iz, iy: (0, jnp.maximum(iz * tz - 1, 0), iy, 0)
    zdn_map = lambda iz, iy: (0, jnp.minimum((iz + 1) * tz, lnz - 1), iy, 0)
    zh_map = lambda iz, iy: (0, 0, iy, 0)
    in_specs = [
        pl.BlockSpec((1, 2), lambda iz, iy: (0, 0),
                     memory_space=pltpu.SMEM),
        blkspec,
        pl.BlockSpec((P, tz, 1, 2, nx), lambda iz, iy: (0, iz, iy, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(zplane, zup_map, memory_space=pltpu.VMEM),
        pl.BlockSpec(zplane, zdn_map, memory_space=pltpu.VMEM),
        pl.BlockSpec(zplane, zh_map, memory_space=pltpu.VMEM),
        pl.BlockSpec(zplane, zh_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((P, tz, ty, 2), center, memory_space=pltpu.VMEM),
        wspec, wspec,                                  # wx, wy
        pl.BlockSpec((1, tz, 1, 1, nx), lambda iz, iy: (0, iz, iy, 0, 0),
                     memory_space=pltpu.VMEM),         # wyh slabs
        wspec,                                         # wz
        pl.BlockSpec((1, 1, ty, nx), zup_map,
                     memory_space=pltpu.VMEM),         # wz_up plane stream
        pl.BlockSpec((1, 1, ty, nx), zh_map,
                     memory_space=pltpu.VMEM),         # wzh az slab
        pl.BlockSpec((1, tz, ty, 1), center,
                     memory_space=pltpu.VMEM),         # wxl columns
    ] + [blkspec for _ in range(j)]
    out_specs = [
        blkspec,
        pl.BlockSpec((j + 1, 2), lambda iz, iy: (0, 0),
                     memory_space=pltpu.SMEM),
    ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((P, lnz, lny, nx), jnp.float32),
                   jax.ShapeDtypeStruct((j + 1, 2), jnp.float32)],
        compiler_params=_compiler_params(j + 8, tz * ty, nx, P),
        interpret=interpret,
    )


def lanczos_twopass3d_y_sharded(u, m, P, R, nx, scale, sign, variant,
                                desc, safe_inv, interpret, axis_names,
                                aniso=None):
    """Two-pass Lanczos on a SHARDED 3D grid with the y-slab pass1
    (`_pass1y_shard_call` / `_pass1y_shard_aniso_call`): per-shard y-slab
    blocks, ppermute'd halos, psum'd reductions — the sharded analogue of
    `lanczos_twopass3d_y`. `aniso`, when set, carries the caller-built
    padded face weights on the merged (R, nx) view:
    (wxp, wyp, wy_top, wxl, wzp, wzh, plane_splice).
    """
    from nlsolvers_tpu.ops.pallas.lanczos2d import (_pass2_call,
                                                    _recv_from_next,
                                                    _recv_from_prev)

    az, ay, ax = desc["az"], desc["ay"], desc["ax"]
    NZ, NY, NX = desc["NZ"], desc["NY"], desc["NX"]
    lnz, lny = desc["lnz"], desc["lny"]
    as4 = lambda a: a.reshape(P, lnz, lny, nx)

    if aniso is None:
        # shard's global offsets for the in-kernel variant diagonal
        # (round 5: replaces the streamed per-cell diag column)
        offs = jnp.stack([
            (lax.axis_index(az) * lnz).astype(jnp.int32),
            (lax.axis_index(ay) * lny).astype(jnp.int32),
            (lax.axis_index(ax) * nx).astype(jnp.int32)]).reshape(1, 3)
    else:
        wxp, wyp, wy_top, wxl, wzp, wzh, plane_splice = aniso
        wx4 = wxp.reshape(1, lnz, lny, nx)
        wy4 = wyp.reshape(1, lnz, lny, nx)
        wz4 = wzp.reshape(1, lnz, lny, nx)
        wxl4 = wxl.reshape(1, lnz, lny, 1)
        wzh4 = wzh.reshape(1, 1, lny, nx)
        wyh_cache = {}

        def wyh_slabs(ty):
            """-y face-weight halo slabs (1, lnz, nblk, 1, nx): block k's
            first row uses the face at local y = k*ty - 1; block 0's is
            the cross-shard face (ay ppermute, plane_splice) or the
            merged-seam z-shifted face (reference, unsplit z/y)."""
            nblk = lny // ty
            ks = np.arange(nblk)
            wyh = jnp.take(wy4, jnp.asarray(np.maximum(ks * ty - 1, 0)),
                           axis=2)                     # (1, lnz, nblk, nx)
            if plane_splice:
                wyh = wyh.at[:, :, 0, :].set(wy_top[0][None])
            else:
                zrow = jnp.zeros_like(wy4[:, :1, 0, :])
                seam = jnp.concatenate([zrow, wy4[:, :-1, -1, :]], axis=1)
                wyh = wyh.at[:, :, 0, :].set(seam)
            return wyh[:, :, :, None, :]

    def gsum(x):
        return lax.psum(x, axis_names)

    def shard_halos(wj, ty):
        w4 = as4(wj)
        if variant == "reference":
            # only legal with unsplit z/y (supported_desc): the seam rows
            # come from the local field, the ay/az ppermutes would yield
            # zeros — identical to the unsharded gather
            h = gather_y_halos(w4, ty, "reference")
        else:
            h = gather_y_halos(w4, ty, "clean")        # zeros at local edges
            ytop = _recv_from_prev(w4[:, :, -1, :], ay)   # (P, lnz, nx)
            ybot = _recv_from_next(w4[:, :, 0, :], ay)
            h = h.at[:, :, 0, 0, :].set(ytop)
            h = h.at[:, :, lny // ty - 1, 1, :].set(ybot)
        lcol = _recv_from_prev(wj[:, :, -1:], ax)      # (P, R, 1)
        rcol = _recv_from_next(wj[:, :, :1], ax)
        hc = jnp.concatenate([lcol, rcol],
                             axis=2).reshape(P, lnz, lny, 2)
        zht = _recv_from_prev(w4[:, -1, :, :], az)[:, None]   # (P,1,lny,nx)
        zhb = _recv_from_next(w4[:, 0, :, :], az)[:, None]
        return h, hc, zht, zhb


    # Deferred-norm CGS: ONE psum per iteration + one final — see the twin
    # branch in lanczos2d.lanczos_planar for the full derivation. pass1
    # applies (A/chat) W_j with chat a Gershgorin bound (12*scale iso;
    # pmax'd face-weight bound aniso) and no three-term pre-subtraction;
    # pass2's LOCAL ||W_{j+1}||^2 rides the next iteration's raw psum, so
    # every global norm is exact and T is recovered from exact Rayleigh
    # quotients and norm ratios.
    if aniso is None:
        chat = jnp.float32(12.0 * abs(scale))
    else:
        ghat = lax.pmax(4.0 * (jnp.max(wx4) + jnp.max(wy4)
                               + jnp.max(wz4)), axis_names)
        chat = (ghat * abs(scale)).astype(jnp.float32)
    nop = 2 if aniso is None else 6      # hc + z-slabs | + wx/wy/wz
    nop_brick = 0 if aniso is None else 6

    def p1(j, scal, W):
        ty = pick_ty3d(lnz, lny, nx, j, P, nop)
        if ty < 8:
            # 256^3-class local shards: full-z y-slabs exceed VMEM — brick
            # pass1 (round 5; previously this collapsed to the row-tiled
            # kernels, VERDICT r4 next #2). z-neighbors stream directly
            # from the local array via clamped maps; boundary bricks
            # select the az ppermute slabs in-kernel.
            tz, tyb = pick_brick3d(lnz, lny, nx, j, P, nop_brick)
            h, hc4, zht, zhb = shard_halos(W[j], tyb)
            hc4 = hc4.reshape(P, lnz, lny, 2)
            w4 = as4(W[j])
            if aniso is None:
                w, raw = _pass1zy_shard_call(j, P, lnz, lny, nx, tz, tyb,
                                             scale, sign, NZ, NY, NX,
                                             variant, interpret)(
                    scal, offs, w4, h, w4, w4, zht, zhb, hc4,
                    *(as4(a) for a in W[:j]))
            else:
                if ("y", tyb) not in wyh_cache:
                    wyh_cache[("y", tyb)] = wyh_slabs(tyb)
                w, raw = _pass1zy_shard_aniso_call(
                    j, P, lnz, lny, nx, tz, tyb, scale, sign, interpret)(
                    scal, w4, h, w4, w4, zht, zhb, hc4, wx4, wy4,
                    wyh_cache[("y", tyb)], wz4, wz4, wzh4, wxl4,
                    *(as4(a) for a in W[:j]))
            return w.reshape(P, R, nx), raw
        h, hc, zht, zhb = shard_halos(W[j], ty)
        if aniso is None:
            w, raw = _pass1y_shard_call(j, P, lnz, lny, nx, ty, scale,
                                        sign, NZ, NY, NX, variant,
                                        interpret)(
                scal, offs, as4(W[j]), h, hc, zht, zhb,
                *(as4(a) for a in W[:j]))
        else:
            if ty not in wyh_cache:
                wyh_cache[ty] = wyh_slabs(ty)
            w, raw = _pass1y_shard_aniso_call(j, P, lnz, lny, nx, ty,
                                              scale, sign, interpret)(
                scal, as4(W[j]), h, hc, zht, zhb, wx4, wy4,
                wyh_cache[ty], wz4, wzh4, wxl4,
                *(as4(a) for a in W[:j]))
        return w.reshape(P, R, nx), raw

    def p2(j, q, w, W):
        tile2 = _pick_tile(R, nx, j + 4, nplanes=P)
        return _pass2_call(j, P, R, nx, tile2, interpret)(q, w, *W[:j + 1])

    from nlsolvers_tpu.ops.pallas.lanczos2d import _deferred_norm_cgs
    return _deferred_norm_cgs(u, m, chat, gsum, safe_inv, p1, p2)


def _pipe3d_call(j, P, nz, ny, nx, ty, scale, sign, variant, interpret,
                 mode):
    """ONE-kernel pipelined 3D Lanczos iteration on y-slab blocks:
    pass2(j) fused with pass1(j+1), mirroring `lanczos2d._pipe_call`.

    Inputs: scal (j+2, 2) SMEM [(s_j, 0), c_0..c_j], av_j block, stacked
    halo slabs ((j+2)*P, nz, nblk, 2, nx) of [av_j, W_0..W_j], aniso
    weight streams (wx, wy, wy-halo slabs, wz), W_0..W_j blocks.
    Outputs: W_{j+1}, av_{j+1}, SMEM nsq (1,1), gram (j+1,2), d (j+2,2).
    """
    nblk = ny // ty
    grid = (nblk,)
    blk = (P, nz, ty, nx)
    wblk = (1, nz, ty, nx)
    nop = {"iso3d": 0, "aniso3d": 4}[mode]

    def kernel(scal, av_ref, h_ref, *rest):
        ops_ = rest[:nop]
        wrefs = rest[nop:nop + j + 1]
        wn_out, av_out, nsq_out, gram_out, d_out = rest[nop + j + 1:]
        i = pl.program_id(0)
        s = scal[0, 0]
        av = av_ref[...]
        Ws = [wrefs[idx][...] for idx in range(j + 1)]
        a0 = s * av[0]
        a1 = s * av[1] if P == 2 else None
        for idx in range(j + 1):
            cr = scal[1 + idx, 0]
            if P == 1:
                a0 = a0 - cr * Ws[idx][0]
            else:
                ci = scal[1 + idx, 1]
                a0 = a0 - (cr * Ws[idx][0] - ci * Ws[idx][1])
                a1 = a1 - (cr * Ws[idx][1] + ci * Ws[idx][0])
        wn = a0[None] if P == 1 else jnp.stack([a0, a1])
        wn_out[...] = wn

        @pl.when(i == 0)
        def _():
            nsq_out[0, 0] = 0.0
            for idx in range(j + 1):
                gram_out[idx, 0] = 0.0
                gram_out[idx, 1] = 0.0
            for idx in range(j + 2):
                d_out[idx, 0] = 0.0
                d_out[idx, 1] = 0.0

        nsq = jnp.sum(a0 * a0)
        if P == 2:
            nsq = nsq + jnp.sum(a1 * a1)
        nsq_out[0, 0] += nsq
        for idx in range(j + 1):
            re, im = _dots4(P, Ws[idx], wn)
            gram_out[idx, 0] += re
            gram_out[idx, 1] += im

        # Halo slabs of the reconstructed column: the same linear
        # combination applied to the inputs' gathered slabs (pointwise, so
        # it commutes with row selection).
        h = h_ref[...]                   # ((j+2)*P, nz, 1, 2, nx)
        hs = []                          # per plane: [up, dn] as (nz, nx)
        for p in range(P):
            hs.append([s * h[p, :, 0, 0, :], s * h[p, :, 0, 1, :]])
        for idx in range(j + 1):
            cr = scal[1 + idx, 0]
            base = (1 + idx) * P
            if P == 1:
                hs[0][0] = hs[0][0] - cr * h[base, :, 0, 0, :]
                hs[0][1] = hs[0][1] - cr * h[base, :, 0, 1, :]
            else:
                ci = scal[1 + idx, 1]
                w0u, w1u = h[base, :, 0, 0, :], h[base + 1, :, 0, 0, :]
                w0d, w1d = h[base, :, 0, 1, :], h[base + 1, :, 0, 1, :]
                hs[0][0] = hs[0][0] - (cr * w0u - ci * w1u)
                hs[0][1] = hs[0][1] - (cr * w0d - ci * w1d)
                hs[1][0] = hs[1][0] - (cr * w1u + ci * w0u)
                hs[1][1] = hs[1][1] - (cr * w1d + ci * w0d)
        up = jnp.stack([hs[p][0] for p in range(P)])[:, :, None, :]
        dn = jnp.stack([hs[p][1] for p in range(P)])[:, :, None, :]
        if mode == "aniso3d":
            avn = _stencil_aniso_3d_y(wn, up, dn, ops_[0][...], ops_[1][...],
                                      ops_[2][:, :, 0, 0, :][:, :, None, :],
                                      ops_[3][...], ty, scale, sign)
        else:
            avn = _stencil_3d_y(wn, up, dn, i * ty, ty, nz, ny, nx, scale,
                                sign, variant)
        av_out[...] = avn
        for idx in range(j + 1):
            re, im = _dots4(P, Ws[idx], avn)
            d_out[idx, 0] += re
            d_out[idx, 1] += im
        re, im = _dots4(P, wn, avn)
        d_out[j + 1, 0] += re
        d_out[j + 1, 1] += im

    center = lambda i: (0, 0, i, 0)
    blkspec = pl.BlockSpec(blk, center, memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((j + 2, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        blkspec,                                              # av_j
        pl.BlockSpec(((j + 2) * P, nz, 1, 2, nx),             # halo stack
                     lambda i: (0, 0, i, 0, 0), memory_space=pltpu.VMEM),
    ]
    if mode == "aniso3d":
        wspec = pl.BlockSpec(wblk, center, memory_space=pltpu.VMEM)
        in_specs += [wspec, wspec,                            # wx, wy
                     pl.BlockSpec((1, nz, 1, 1, nx),          # wy halo slabs
                                  lambda i: (0, 0, i, 0, 0),
                                  memory_space=pltpu.VMEM),
                     wspec]                                   # wz
    in_specs += [blkspec for _ in range(j + 1)]               # W_0..W_j
    out_specs = [
        blkspec,                                              # W_{j+1}
        blkspec,                                              # av_{j+1}
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((j + 1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((j + 2, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((P, nz, ny, nx), jnp.float32),
                 jax.ShapeDtypeStruct((P, nz, ny, nx), jnp.float32),
                 jax.ShapeDtypeStruct((1, 1), jnp.float32),
                 jax.ShapeDtypeStruct((j + 1, 2), jnp.float32),
                 jax.ShapeDtypeStruct((j + 2, 2), jnp.float32)]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=_compiler_params(j + 5 + nop - (-2 * (j + 2) // ty),
                                         nz * ty, nx, P),
        interpret=interpret,
    )


def lanczos_pipe3d(u, m, P, R, nx, scale, sign, variant, mode, geom,
                   op_args, weights, safe_inv, n_op, interpret):
    """Pipelined single-pass Lanczos driver for unsharded 3D grids.

    Same scalar recurrence as `lanczos2d._lanczos_pipe` (projections
    raw_i = ⟨W_i, w_j⟩ recovered as s_j·d_i − bs·⟨W_i, W_{j-1}⟩ from the
    previous kernel's d-dots and the gram terms two kernels back). The
    init av_0/d_0 uses the two-pass `_pass1_call(0)` on the merged row
    view, the final (stencil-free) iteration the mode-independent
    `_pipe_call(last=True)`; mid iterations run the y-slab `_pipe3d_call`
    with reshape-only view changes. `weights` holds the aniso padded
    face-weight arrays (wx, wy, wz) as (1, R, nx), or None for iso3d.
    """
    nz, ny = geom
    nop_pipe = 0 if mode == "iso3d" else 4
    nsq0 = jnp.sum(u * u)
    beta0 = jnp.sqrt(nsq0)
    tile0 = _pick_tile(ny, nx, 2 + n_op, nplanes=P)
    scal0 = jnp.asarray([[1.0, 0.0]], jnp.float32)
    av, d_prev = _pass1_call(0, P, R, nx, tile0, scale, sign, variant,
                             interpret, mode=mode,
                             geom=geom)(scal0, *op_args(u, tile0))
    if mode == "aniso3d":
        wx4, wy4, wz4 = (w.reshape(1, nz, ny, nx) for w in weights)
        # aniso u-halos are always seam-valued ("seam" mode in
        # gather_y_halos): whether the seam flux contributes is decided by
        # the wy face weights, which carry the reference-vs-clean padding
        # in their data
        halo_variant = "seam"
        wyh_cache = {}
    else:
        halo_variant = variant
    W, s = [u], [safe_inv(beta0)]
    alphas, betas = [], []
    g_prev = g_prev2 = None
    zero = jnp.float32(0.0)
    for j in range(m - 1):
        sj = s[j].astype(jnp.float32)
        if j == 0:
            raw = sj * d_prev
            bs = zero
        else:
            bs = (betas[j - 1] * s[j - 1]).astype(jnp.float32)
            parts = []
            if j >= 2:
                parts.append(g_prev2)                       # i <= j-2
            nb2 = (betas[j - 2] ** 2) if j >= 2 else nsq0   # i = j-1
            parts.append(jnp.stack([nb2.astype(jnp.float32), zero])[None])
            parts.append(jnp.stack([g_prev[j - 1, 0],       # i = j (conj)
                                    -g_prev[j - 1, 1]])[None])
            raw = sj * d_prev - bs * jnp.concatenate(parts, axis=0)
        sv = jnp.stack([si.astype(jnp.float32) for si in s])   # (j+1,)
        proj = sv[:, None] * raw
        alphas.append(proj[j, 0])
        q = sv[:, None] * proj
        c = q if j == 0 else q.at[j - 1, 0].add(bs)
        scal = jnp.concatenate([jnp.stack([sj, zero])[None], c], axis=0)
        lastk = j == m - 2
        if lastk:
            tile = _pick_tile(ny, nx, j + 4, nplanes=P)
            res = _pipe_call(j, P, R, nx, tile, scale, sign, variant,
                             interpret, mode="iso2d", last=True)(
                scal, av, *W)
            wn, nsq, gram = res
        else:
            ty = pick_ty3d(nz, ny, nx, j, P, nop_pipe)
            as4 = lambda a: a.reshape(P, nz, ny, nx)
            halos = jnp.stack([gather_y_halos(as4(a), ty, halo_variant)
                               for a in [av] + W])
            halos = halos.reshape((j + 2) * P, nz, ny // ty, 2, nx)
            args = [scal, as4(av), halos]
            if mode == "aniso3d":
                if ty not in wyh_cache:
                    wyh_cache[ty] = _gather_wy_halos(wy4, ty)
                args += [wx4, wy4, wyh_cache[ty], wz4]
            args.extend(as4(a) for a in W)
            res = _pipe3d_call(j, P, nz, ny, nx, ty, scale, sign, variant,
                               interpret, mode)(*args)
            wn, av, nsq, gram, d_prev = res
            wn = wn.reshape(P, R, nx)
            av = av.reshape(P, R, nx)
        b = jnp.sqrt(nsq[0, 0])
        W.append(wn)
        betas.append(b)
        s.append(safe_inv(b))
        g_prev2, g_prev = g_prev, gram
    return W, s, alphas, betas, beta0
