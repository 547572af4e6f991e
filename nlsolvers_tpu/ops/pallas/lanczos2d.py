"""Fused Pallas TPU kernels for the 2D Lanczos matrix-function hot loop.

This is the TPU-native answer to the reference's fused-Lanczos attempt
(`device/include/lanczos_complex.hpp:215-319`, `fused_lanczos_step` — written
but commented out of the CUDA call path) and to its matfunc applicators
(`device/include/matfunc_complex.hpp`, `matfunc_real.hpp`). Design:

* State is PLANAR float32: a complex field is (2, ny, nx) (re, im planes),
  a real field (1, ny, nx). Mosaic has no complex dtype, and the planar
  layout keeps the 128-lane tiling on the x axis.
* Krylov columns are stored UNNORMALIZED with their inverse norms tracked as
  scalars. Normalization folds into the next iteration's matvec for free
  (A(w/b) = (A w)/b) — the separate scale pass of the textbook loop (and of
  ops/krylov.py) never touches HBM.
* Each Lanczos iteration is exactly TWO kernel launches:
    pass1: w = s_j * A(W_j) - beta_{j-1} s_{j-1} W_{j-1}, fused with the
           projection dots <W_i, w> for all i <= j (classical Gram-Schmidt
           with full reorthogonalization — same math as ops/krylov.py).
    pass2: w' = w - sum_i q_i W_i fused with ||w'||^2.
  The 5-point no-flux stencil (matching ops/operators.laplacian_2d, i.e.
  `build_laplacian_noflux`, laplacians.hpp:10-52) is computed in-kernel from
  iota masks — the diagonal costs no HBM traffic at all.
* The (j+1)-column dot/reconstruction streams are separate input refs —
  no (m, n) stacking, no copies. HBM traffic per step at 1024^2, m=10 is
  ~0.9 GB vs ~2.4 GB for the pure-XLA path (benchmarks/ab_lanczos.py).
* Cross-tile reductions use the sequential TPU grid: accumulator outputs
  with a constant index_map stay resident in SMEM across programs.

The public entry is `matfunc_apply_planar` (and the `matvec_descriptor`
helper operators attach to their closures so ops/krylov.matfunc_apply can
dispatch here automatically on TPU).
"""


import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nlsolvers_tpu.ops.krylov import MATFUNCS, tridiag_eigh

__all__ = ["matvec_descriptor", "matfunc_apply_planar",
           "matfunc_apply_planar_multi", "supported_desc", "lanczos_planar"]

# Per-kernel VMEM target. The default scoped limit is 16 MB but v5e has 128
# MB physical VMEM (empirically up to >=100 MB usable via
# CompilerParams.vmem_limit_bytes); large row-tiles amortize DMA setup.
_VMEM_BUDGET = 64 * 2**20

# Single-kernel Lanczos iterations (_iter_call) hold w as full-field VMEM
# scratch, eliminating its 16 MB/iter HBM round-trip — but measured SLOWER
# on v5e (834 vs 914 steps/s at 1024^2): Mosaic's full-array VMEM scratch
# access doesn't pipeline like streamed blocks (same finding as
# resident2d.py). Off by default; kept for future codegen.
_FUSED_ITER = False


def _compiler_params(n_streams, tile, nx, nplanes):
    blk = nplanes * tile * nx * 4
    return pltpu.CompilerParams(
        vmem_limit_bytes=min(3 * n_streams * blk + 4 * 2**20,
                             110 * 2**20))


def matvec_descriptor(kind, shape, scale, sign=1.0, variant="reference"):
    """Static description of a stencil operator the fused kernels implement.

    kind: only "laplacian_2d" for now (5-point no-flux, reference or clean
    diagonal variant). `sign` multiplies the whole operator (real-wave
    steppers use Omega^2 = -L, kg_driver.cpp:92-93).
    """
    ny, nx = shape
    return dict(kind=kind, ny=int(ny), nx=int(nx), scale=float(scale),
                sign=float(sign), variant=variant)


def supported_desc(desc, u_shape, dtype):
    """Can the fused path run this operator/field combination?"""
    if desc is None:
        return False
    kind = desc.get("kind")
    if kind == "laplacian_2d":
        if desc.get("variant") not in ("reference", "clean"):
            return False
    elif kind == "aniso_laplacian_2d":
        if desc.get("wx") is None or desc.get("wy") is None:
            return False
    elif kind == "shard2d":
        if desc.get("variant") not in ("reference", "clean"):
            return False
        if dtype not in (jnp.complex64, jnp.float32):
            return False
        lny, lnx = u_shape[-2:]
        return (lnx % 128 == 0 and lny % 8 == 0
                and _pick_tile(lny, lnx, 30) >= 8)
    elif kind == "shard2d_aniso":
        if desc.get("c") is None:
            return False
        if dtype not in (jnp.complex64, jnp.float32):
            return False
        lny, lnx = u_shape[-2:]
        return (lnx % 128 == 0 and lny % 8 == 0
                and _pick_tile(lny, lnx, 30) >= 8)
    elif kind in ("shard3d", "shard3d_aniso"):
        if desc.get("variant") not in ("reference", "clean"):
            return False
        if kind == "shard3d_aniso" and desc.get("c") is None:
            return False
        if dtype not in (jnp.complex64, jnp.float32):
            return False
        if len(u_shape) != 3:
            return False
        lnz, lny, lnx = u_shape
        if desc["variant"] == "reference" and (lnz != desc["NZ"]
                                               or lny != desc["NY"]):
            # the merged y-seam coupling is only shard-local with unsplit
            # z/y axes (same rule as parallel/spatial.sharded_laplacian_3d)
            return False
        # worst case: shard3d_aniso streams 14 ops + j columns
        return (lnx % 128 == 0 and lny % 8 == 0
                and _pick_tile(lny, lnx, 34) >= 8)
    elif kind in ("laplacian_3d", "aniso_laplacian_3d"):
        if kind == "laplacian_3d":
            if desc.get("variant") not in ("reference", "clean"):
                return False
        elif desc.get("wx") is None or desc.get("wz") is None:
            return False
        if tuple(u_shape) != (desc["nz"], desc["ny"], desc["nx"]):
            return False
        if dtype not in (jnp.complex64, jnp.float32):
            return False
        nz, ny, nx = desc["nz"], desc["ny"], desc["nx"]
        # worst-case stream count: j = m-2 at m = 20 with the aniso3d
        # operator (9 op streams) -> ~30 concurrent block streams
        return (nx % 128 == 0 and ny % 8 == 0
                and _pick_tile(ny, nx, 30) >= 8)
    else:
        return False
    if tuple(u_shape) != (desc["ny"], desc["nx"]):
        return False
    if dtype not in (jnp.complex64, jnp.float32):
        return False
    ny, nx = desc["ny"], desc["nx"]
    # lane/sublane alignment: full rows stream as (tile, nx) f32 blocks;
    # 30 streams = worst late-iteration count at m=20 (see 3D case above)
    return nx % 128 == 0 and ny % 8 == 0 and _pick_tile(ny, nx, 30) >= 8


def _gather_halo_rows(arr, tile, rows_total, per_block=2):
    """Gathered halo rows shaped (planes, nblk, per_block, nx): block i gets
    global rows i*tile-1 and (i+1)*tile (clamped) — 2 rows/block instead of
    re-streaming whole neighbor tiles (which triples W_j's HBM reads)."""
    nblk = rows_total // tile
    nx = arr.shape[-1]
    blocks = np.arange(nblk)
    if per_block == 1:
        idx = np.maximum(blocks * tile - 1, 0)
    else:
        idx = np.empty(2 * nblk, np.int64)
        idx[0::2] = np.maximum(blocks * tile - 1, 0)
        idx[1::2] = np.minimum((blocks + 1) * tile, rows_total - 1)
    g = jnp.take(arr, jnp.asarray(idx), axis=1)
    return g.reshape(arr.shape[0], nblk, per_block, nx)


def _recv_from_prev(slab, axis_name):
    """Each shard receives `slab` from its predecessor (first shard gets
    zeros — exactly the no-flux missing-neighbor semantics)."""
    size = lax.axis_size(axis_name)
    return lax.ppermute(slab, axis_name,
                        [(i, i + 1) for i in range(size - 1)])


def _recv_from_next(slab, axis_name):
    size = lax.axis_size(axis_name)
    return lax.ppermute(slab, axis_name,
                        [(i, i - 1) for i in range(1, size)])


def _pick_tile(ny, nx, n_streams, nplanes=2):
    """Largest row-tile (multiple of 8, divides ny) fitting the VMEM budget
    with double buffering across `n_streams` block streams."""
    per_row = nplanes * nx * 4
    best = 0
    t = 8
    while t <= min(ny, 512):
        if ny % t == 0 and 2 * n_streams * t * per_row <= _VMEM_BUDGET:
            best = t
        t += 8
    return best


def _stencil(u, up_row, dn_row, row0, tile, ny, nx, scale, sign, variant):
    """5-point no-flux Laplacian of a (P, tile, nx) block.

    `up_row`/`dn_row` are single (P, 1, nx) halo rows (the rows just outside
    the tile, clamped at grid edges and gathered host-side — reading whole
    neighbor tiles would re-stream W_j 3x); out-of-grid neighbors contribute
    zero, matching ops/operators.neighbor_sum. The diagonal is -4 (+1 on the
    global boundary ring for variant="reference"; -(neighbor count) for
    "clean"), generated from iota — no HBM traffic.
    """
    above = jnp.concatenate([up_row, u[:, :-1, :]], axis=1)
    below = jnp.concatenate([u[:, 1:, :], dn_row], axis=1)
    rows = lax.broadcasted_iota(jnp.int32, (1, tile, nx), 1) + row0
    cols = lax.broadcasted_iota(jnp.int32, (1, tile, nx), 2)
    top, bot = rows == 0, rows == ny - 1
    lft, rgt = cols == 0, cols == nx - 1
    above = jnp.where(top, 0.0, above)
    below = jnp.where(bot, 0.0, below)
    zc = jnp.zeros(u.shape[:2] + (1,), u.dtype)
    left = jnp.concatenate([zc, u[:, :, :-1]], axis=2)
    right = jnp.concatenate([u[:, :, 1:], zc], axis=2)
    left = jnp.where(lft, 0.0, left)
    right = jnp.where(rgt, 0.0, right)
    if variant == "reference":
        diag = jnp.where(top | bot | lft | rgt, -3.0, -4.0)
    else:   # clean: -(number of existing neighbors)
        diag = -(4.0 - top.astype(u.dtype) - bot.astype(u.dtype)
                 - lft.astype(u.dtype) - rgt.astype(u.dtype))
    return (above + below + left + right + diag * u) * (scale * sign)


def _stencil_aniso(u, up_row, dn_row, wx, wyc, wy_up_row, row0, tile, ny,
                   nx, scale, sign):
    """Finite-volume div(c grad u) of a (P, tile, nx) block.

    Parity: ops/operators.anisotropic_laplacian_2d (laplacians.hpp:54-103).
    `wx`/`wyc` are the zero-padded face weights for this row-tile;
    `up_row`/`dn_row`/`wy_up_row` are single halo rows (see _stencil).
    Lu[i,j] = fx[i,j] - fx[i,j-1] + fy[i,j] - fy[i-1,j] with
    fx = wx*(u[.,j+1]-u), fy = wy*(u[i+1,.]-u); the padded zero faces kill
    out-of-grid fluxes.
    """
    zc = jnp.zeros(u.shape[:2] + (1,), u.dtype)
    u_r = jnp.concatenate([u[:, :, 1:], zc], axis=2)      # u[., j+1]
    fx = wx * (u_r - u)                                    # zero at j=nx-1
    zc1 = jnp.zeros(fx.shape[:2] + (1,), fx.dtype)
    fx_l = jnp.concatenate([zc1, fx[:, :, :-1]], axis=2)   # fx[., j-1]
    below = jnp.concatenate([u[:, 1:, :], dn_row], axis=1)
    fy = wyc * (below - u)                                 # zero at i=ny-1
    above = jnp.concatenate([up_row, u[:, :-1, :]], axis=1)
    wy_up = jnp.concatenate([wy_up_row, wyc[:, :-1, :]], axis=1)
    fy_m1 = wy_up * (u - above)                            # fy[i-1, .]
    rows = lax.broadcasted_iota(jnp.int32, (1, tile, nx), 1) + row0
    fy_m1 = jnp.where(rows == 0, 0.0, fy_m1)   # no face above global row 0
    return (fx - fx_l + fy - fy_m1) * (scale * sign)


def _stencil_3d(u, yup, ydn, zup, zdn, row0, tile, nz, ny, nx, scale, sign,
                variant):
    """7-point no-flux Laplacian on the merged (nz*ny, nx) row view.

    Parity: ops/operators.laplacian_3d (`build_laplacian_noflux_3d`,
    laplacians.hpp:105-156). In the merged view the reference's y-neighbor
    loop IS row +-1 (including its cross-plane seam couplings, carried in
    single halo rows `yup`/`ydn`), and the z-neighbor is row +-ny — so
    `zup`/`zdn` are whole blocks at tile offset +-ny/tile.
    variant="clean" masks the seams and uses -(neighbor count).
    """
    R = nz * ny
    merged = lax.broadcasted_iota(jnp.int32, (1, tile, nx), 1) + row0
    zc_ = merged // ny
    yc_ = merged % ny
    cols = lax.broadcasted_iota(jnp.int32, (1, tile, nx), 2)
    lft, rgt = cols == 0, cols == nx - 1

    above = jnp.concatenate([yup, u[:, :-1, :]], axis=1)
    below = jnp.concatenate([u[:, 1:, :], ydn], axis=1)
    if variant == "reference":     # seams couple across planes
        above = jnp.where(merged == 0, 0.0, above)
        below = jnp.where(merged == R - 1, 0.0, below)
    else:
        above = jnp.where(yc_ == 0, 0.0, above)
        below = jnp.where(yc_ == ny - 1, 0.0, below)

    z_above = jnp.where(zc_ == 0, 0.0, zup[...])
    z_below = jnp.where(zc_ == nz - 1, 0.0, zdn[...])

    zcol = jnp.zeros(u.shape[:2] + (1,), u.dtype)
    left = jnp.where(lft, 0.0, jnp.concatenate([zcol, u[:, :, :-1]], axis=2))
    right = jnp.where(rgt, 0.0, jnp.concatenate([u[:, :, 1:], zcol], axis=2))

    top3 = (zc_ == 0) | (zc_ == nz - 1)
    ybnd = (yc_ == 0) | (yc_ == ny - 1)
    if variant == "reference":
        diag = jnp.where(top3 | ybnd | lft | rgt, -5.0, -6.0)
    else:
        cnt = jnp.zeros(merged.shape, u.dtype)
        for mask in (zc_ == 0, zc_ == nz - 1, yc_ == 0, yc_ == ny - 1,
                     lft, rgt):
            cnt = cnt + mask.astype(u.dtype)
        diag = -(6.0 - cnt)
    nb = above + below + z_above + z_below + left + right
    return (nb + diag * u) * (scale * sign)


def _stencil_aniso_3d(u, up_row, dn_row, zup, zdn, wx, wym, wym_up_row,
                      wz, wz_up, row0, tile, nz, ny, nx, scale, sign):
    """Finite-volume div(c grad u) on the merged (nz*ny, nx) row view.

    Parity: ops/operators.anisotropic_laplacian_3d (laplacians.hpp:158-218).
    All face weights arrive zero-padded on their no-flux faces (see
    operators.anisotropic_laplacian_3d), so boundary AND plane-seam
    structure (reference vs clean variant) is already baked in — the kernel
    only masks the two halo-clamp artifacts (merged row 0, z plane 0).
    `zup`/`zdn`/`wz_up` are whole blocks at tile offset +-ny/tile.
    """
    merged = lax.broadcasted_iota(jnp.int32, (1, tile, nx), 1) + row0
    zc_ = merged // ny
    zcol = jnp.zeros(u.shape[:2] + (1,), u.dtype)
    u_r = jnp.concatenate([u[:, :, 1:], zcol], axis=2)
    fx = wx * (u_r - u)                                    # 0 at col nx-1
    zc1 = jnp.zeros(fx.shape[:2] + (1,), fx.dtype)
    fx_l = jnp.concatenate([zc1, fx[:, :, :-1]], axis=2)
    below = jnp.concatenate([u[:, 1:, :], dn_row], axis=1)
    fy = wym * (below - u)                                 # 0 at padded rows
    above = jnp.concatenate([up_row, u[:, :-1, :]], axis=1)
    wym_up = jnp.concatenate([wym_up_row, wym[:, :-1, :]], axis=1)
    fy_m1 = jnp.where(merged == 0, 0.0, wym_up * (u - above))
    fz = wz * (zdn[...] - u)                               # 0 at z = nz-1
    fz_m = jnp.where(zc_ == 0, 0.0, wz_up[...] * (u - zup[...]))
    return (fx - fx_l + fy - fy_m1 + fz - fz_m) * (scale * sign)


def _stencil_shard2d(u, up_row, dn_row, hc, diag, scale, sign):
    """5-point stencil on a SHARDED local block: neighbor rows/cols outside
    the shard arrive as ppermute'd halos (zeros at true domain edges — the
    halo IS the no-flux boundary, parallel/spatial.py), and the variant's
    diagonal is streamed as a per-cell array built from global coordinates.
    No masks needed in-kernel."""
    above = jnp.concatenate([up_row, u[:, :-1, :]], axis=1)
    below = jnp.concatenate([u[:, 1:, :], dn_row], axis=1)
    left = jnp.concatenate([hc[:, :, 0:1], u[:, :, :-1]], axis=2)
    right = jnp.concatenate([u[:, :, 1:], hc[:, :, 1:2]], axis=2)
    return (above + below + left + right + diag * u) * (scale * sign)


def _stencil_shard2d_aniso(u, up_row, dn_row, hc, wx, wy, wyh_row, wxl,
                           scale, sign):
    """Finite-volume div(c grad u) on a SHARDED local block.

    All no-flux and cross-shard face structure is baked into the weights on
    the jnp side (parallel/spatial.sharded_anisotropic_laplacian_2d math):
    `wx`/`wy` are local padded face weights whose LAST col/row hold the
    cross-shard face (zero at the true domain edge); `wxl` is the face
    weight column to the LEFT neighbor (zero at the domain edge); `wyh_row`
    is this tile's upper face-weight halo row. `hc` carries the ppermute'd
    u columns [left, right]; `up_row`/`dn_row` the u halo rows.
    """
    lcol, rcol = hc[:, :, 0:1], hc[:, :, 1:2]
    u_r = jnp.concatenate([u[:, :, 1:], rcol], axis=2)
    fx = wx * (u_r - u)                       # last col = cross-shard flux
    fxl_edge = wxl * (u[:, :, :1] - lcol)
    fx_l = jnp.concatenate([fxl_edge, fx[:, :, :-1]], axis=2)
    below = jnp.concatenate([u[:, 1:, :], dn_row], axis=1)
    fy = wy * (below - u)                     # last row = cross-shard flux
    above = jnp.concatenate([up_row, u[:, :-1, :]], axis=1)
    wy_up = jnp.concatenate([wyh_row, wy[:, :-1, :]], axis=1)
    fy_m1 = wy_up * (u - above)               # wyh_row = 0 at domain top
    return (fx - fx_l + fy - fy_m1) * (scale * sign)


def _stencil_shard3d(u, up_row, dn_row, hc, diag, zup, zdn, zht, zhb,
                     blk_i, K, nblk, scale, sign):
    """7-point Laplacian on a SHARDED 3D grid, merged (lnz*lny, lnx) view.

    All boundary/seam structure lives in jnp-side data: `diag` is the
    per-cell variant diagonal from global coordinates, halo rows/cols are
    ppermute'd (zeros at true domain edges — the halo IS the no-flux BC,
    parallel/spatial.sharded_laplacian_3d), and the y-halo rows were
    spliced into the gathered rows at plane-boundary blocks. The z-neighbor
    is row +-lny, streamed as whole blocks at tile offset +-K; blocks in the
    first/last local z-plane select the az-halo streams instead. No
    in-kernel masks. Parity target: laplacians.hpp:105-156.
    """
    above = jnp.concatenate([up_row, u[:, :-1, :]], axis=1)
    below = jnp.concatenate([u[:, 1:, :], dn_row], axis=1)
    left = jnp.concatenate([hc[:, :, 0:1], u[:, :, :-1]], axis=2)
    right = jnp.concatenate([u[:, :, 1:], hc[:, :, 1:2]], axis=2)
    z_above = jnp.where(blk_i < K, zht[...], zup[...])
    z_below = jnp.where(blk_i >= nblk - K, zhb[...], zdn[...])
    nb = above + below + left + right + z_above + z_below
    return (nb + diag * u) * (scale * sign)


def _stencil_shard3d_aniso(u, up_row, dn_row, hc, wx, wy, wyh_row, wxl,
                           wz, wz_up, zup, zdn, zht, zhb, wzh_row,
                           blk_i, K, nblk, scale, sign):
    """Finite-volume div(c grad u) on a SHARDED 3D grid, merged row view.

    Face weights arrive padded from the jnp side (cross-shard faces from
    ppermute'd c edges, zeros at true domain faces — see
    parallel/spatial.sharded_anisotropic_laplacian_3d): `wx`/`wy`/`wz` are
    this block's +x/+y/+z face weights, `wxl` the -x face weight column,
    `wyh_row` the -y face weight halo row (spliced at plane boundaries),
    `wz_up` the -z face weights (wz at tile offset -K), `wzh_row` its
    az-halo for the first local plane. `zup`/`zdn`/`zht`/`zhb` carry the u
    z-neighbors as in _stencil_shard3d. Parity: laplacians.hpp:158-218.
    """
    lcol, rcol = hc[:, :, 0:1], hc[:, :, 1:2]
    u_r = jnp.concatenate([u[:, :, 1:], rcol], axis=2)
    fx = wx * (u_r - u)                       # last col = cross-shard flux
    fxl_edge = wxl * (u[:, :, :1] - lcol)
    fx_l = jnp.concatenate([fxl_edge, fx[:, :, :-1]], axis=2)
    below = jnp.concatenate([u[:, 1:, :], dn_row], axis=1)
    fy = wy * (below - u)
    above = jnp.concatenate([up_row, u[:, :-1, :]], axis=1)
    wy_up = jnp.concatenate([wyh_row, wy[:, :-1, :]], axis=1)
    fy_m1 = wy_up * (u - above)
    z_above = jnp.where(blk_i < K, zht[...], zup[...])
    z_below = jnp.where(blk_i >= nblk - K, zhb[...], zdn[...])
    wzu = jnp.where(blk_i < K, wzh_row[...], wz_up[...])
    fz = wz * (z_below - u)
    fz_m = wzu * (u - z_above)
    return (fx - fx_l + fy - fy_m1 + fz - fz_m) * (scale * sign)


def _dots(P, Wi, w):
    """(Hermitian) inner product partials of a planar block pair: returns
    (re, im) scalars; im == 0.0 for real fields (P == 1)."""
    if P == 1:
        return jnp.sum(Wi[0] * w[0]), jnp.float32(0.0)
    re = jnp.sum(Wi[0] * w[0] + Wi[1] * w[1])
    im = jnp.sum(Wi[0] * w[1] - Wi[1] * w[0])
    return re, im


def _deferred_norm_cgs(u, m, chat, gsum, safe_inv, pass1, pass2):
    """Shared driver for the SHARDED deferred-norm unnormalized-CGS loops
    (one psum per iteration + one final; exact norms one collective late).

    pass1(j, scal, W) -> (w, raw) applies w = (A/chat) W_j fused with the
    shard-local dots <W_i, w>; pass2(j, q, w, W) -> (wn, nsq2) subtracts
    the CGS projections and emits the local ||W_{j+1}||^2. The scalar
    recovery (packed psum, q = raw/||W_i||^2, T from Rayleigh quotients +
    exact norm ratios) lives HERE so the 2D/row-tiled and 3D y-slab/brick
    drivers cannot drift apart. Full derivation in lanczos_planar's
    sharded branch comment."""
    zero = jnp.float32(0.0)
    scal = jnp.stack([(1.0 / chat).astype(jnp.float32),
                      zero]).reshape(1, 2)
    W = [u]
    nsq_loc = jnp.sum(u * u)                 # local ||W_0||^2
    nsqs = []                                # exact GLOBAL ||W_i||^2
    at = []                                  # alpha-tilde (entries of T~)
    for j in range(m - 1):
        w, raw = pass1(j, scal, W)
        packed = gsum(jnp.concatenate(
            [raw, jnp.stack([nsq_loc.astype(jnp.float32), zero])[None]],
            axis=0))
        raw_g = packed[:j + 1]               # <W_i, A~ W_j> global
        nsqs.append(packed[j + 1, 0])
        invn = jnp.stack([jnp.where(n > 0, 1.0 / jnp.where(n > 0, n, 1),
                                    0.0) for n in nsqs])
        q = invn[:, None] * raw_g            # CGS coefficients
        at.append(q[j, 0])
        wn, nsq2 = pass2(j, q, w, W)
        nsq_loc = nsq2[0, 0]
        W.append(wn)
    nsqs.append(gsum(nsq_loc))               # final column's exact norm
    s = [safe_inv(jnp.sqrt(n)) for n in nsqs]
    beta0 = jnp.sqrt(nsqs[0])
    alphas = [chat * a for a in at]
    betas = [chat * jnp.sqrt(jnp.where(
        nsqs[j] > 0, nsqs[j + 1] / jnp.where(nsqs[j] > 0, nsqs[j], 1),
        0.0)) for j in range(m - 1)]
    return W, s, alphas, betas, beta0


def _pass1_call(j, P, ny, nx, tile, scale, sign, variant, interpret,
                mode="iso2d", geom=None):
    """pallas_call computing w = s_j A W_j - bs W_{j-1} and raw dots
    <W_i, w> for i <= j.

    Inputs: scal (1,2) SMEM [s_j, bs], W_j's operator streams (center block
    + a (P, 2, nx) gathered-halo-rows block for 2D; 3D adds two whole-block
    z streams where `ny` is the merged nz*ny row count and
    geom=(nz, true_ny); anisotropic adds wx/wy blocks + a wy halo row),
    then W_0..W_{j-1}. Outputs: w, raw (j+1, 2) SMEM.

    Sharded callers pass scal = [1/chat, 0]: then w is just (A/chat) W_j
    (deferred-norm CGS, see lanczos_planar's sharded branch) and the same
    kernel serves both schemes."""
    grid = (ny // tile,)
    blk = (P, tile, nx)
    wblk = (1, tile, nx)
    last = grid[0] - 1
    nop = {"iso2d": 2, "aniso2d": 5, "iso3d": 4, "aniso3d": 9,
           "shard2d": 4, "shard2d_aniso": 7, "shard3d": 8,
           "shard3d_aniso": 14}[mode]
    if mode in ("iso3d", "aniso3d", "shard3d", "shard3d_aniso"):
        K = geom[1] // tile     # z-neighbor block offset (tile divides ny)

    def kernel(scal, *rest):
        ops_, wrefs = rest[:nop], rest[nop:nop + j]
        w_out, raw_out = rest[nop + j], rest[nop + j + 1]
        i = pl.program_id(0)
        u = ops_[0][...]
        halo = ops_[1]
        up_row, dn_row = halo[:, 0, 0:1, :], halo[:, 0, 1:2, :]
        if mode == "aniso2d":
            av = _stencil_aniso(u, up_row, dn_row, ops_[2][...],
                                ops_[3][...], ops_[4][:, 0, :, :], i * tile,
                                tile, ny, nx, scale, sign)
        elif mode == "iso3d":
            av = _stencil_3d(u, up_row, dn_row, ops_[2], ops_[3], i * tile,
                             tile, geom[0], geom[1], nx, scale, sign,
                             variant)
        elif mode == "aniso3d":
            av = _stencil_aniso_3d(u, up_row, dn_row, ops_[2], ops_[3],
                                   ops_[4][...], ops_[5][...],
                                   ops_[6][:, 0, :, :], ops_[7][...],
                                   ops_[8], i * tile, tile, geom[0],
                                   geom[1], nx, scale, sign)
        elif mode == "shard2d":
            av = _stencil_shard2d(u, up_row, dn_row, ops_[2][...],
                                  ops_[3][...], scale, sign)
        elif mode == "shard2d_aniso":
            av = _stencil_shard2d_aniso(u, up_row, dn_row, ops_[2][...],
                                        ops_[3][...], ops_[4][...],
                                        ops_[5][:, 0, :, :], ops_[6][...],
                                        scale, sign)
        elif mode == "shard3d":
            av = _stencil_shard3d(u, up_row, dn_row, ops_[2][...],
                                  ops_[3][...], ops_[4], ops_[5], ops_[6],
                                  ops_[7], i, K, grid[0], scale, sign)
        elif mode == "shard3d_aniso":
            av = _stencil_shard3d_aniso(
                u, up_row, dn_row, ops_[2][...], ops_[3][...], ops_[4][...],
                ops_[5][:, 0, :, :], ops_[6][...], ops_[7][...], ops_[8],
                ops_[9], ops_[10], ops_[11], ops_[12], ops_[13], i, K,
                grid[0], scale, sign)
        else:
            av = _stencil(u, up_row, dn_row, i * tile, tile, ny, nx, scale,
                          sign, variant)
        w = scal[0, 0] * av
        if j > 0:
            w = w - scal[0, 1] * wrefs[j - 1][...]
        w_out[...] = w

        @pl.when(i == 0)
        def _():
            # SMEM only takes scalar stores — zero entrywise
            for idx in range(j + 1):
                raw_out[idx, 0] = 0.0
                raw_out[idx, 1] = 0.0

        for idx in range(j + 1):
            Wi = u if idx == j else wrefs[idx][...]
            re, im = _dots(P, Wi, w)
            raw_out[idx, 0] += re
            raw_out[idx, 1] += im

    blkspec = lambda im_: pl.BlockSpec(blk, im_, memory_space=pltpu.VMEM)
    wspec = lambda im_: pl.BlockSpec(wblk, im_, memory_space=pltpu.VMEM)
    center = lambda i: (0, i, 0)
    # halo arrays are 4D (P, nblk, rows, nx) so the block's last two dims
    # equal the array's (Mosaic's alignment rule for sub-8 row counts)
    halo4 = lambda i: (0, i, 0, 0)
    halospec = pl.BlockSpec((P, 1, 2, nx), halo4, memory_space=pltpu.VMEM)
    op_specs = [blkspec(center), halospec]
    if mode == "aniso2d":
        op_specs += [wspec(center), wspec(center),
                     pl.BlockSpec((1, 1, 1, nx), halo4,
                                  memory_space=pltpu.VMEM)]
    elif mode == "iso3d":
        op_specs += [blkspec(lambda i: (0, jnp.maximum(i - K, 0), 0)),
                     blkspec(lambda i: (0, jnp.minimum(i + K, last), 0))]
    elif mode == "aniso3d":
        zup = lambda i: (0, jnp.maximum(i - K, 0), 0)
        zdn = lambda i: (0, jnp.minimum(i + K, last), 0)
        op_specs += [blkspec(zup), blkspec(zdn),
                     wspec(center), wspec(center),
                     pl.BlockSpec((1, 1, 1, nx), halo4,
                                  memory_space=pltpu.VMEM),
                     wspec(center), wspec(zup)]
    elif mode == "shard2d":
        # halo columns (P, lny, 2): lane dim 2 == full array dim (legal)
        op_specs += [pl.BlockSpec((P, tile, 2), center,
                                  memory_space=pltpu.VMEM),
                     wspec(center)]
    elif mode == "shard2d_aniso":
        op_specs += [pl.BlockSpec((P, tile, 2), center,   # u col halos
                                  memory_space=pltpu.VMEM),
                     wspec(center), wspec(center),         # wx, wy
                     pl.BlockSpec((1, 1, 1, nx), halo4,    # wy halo rows
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((1, tile, 1), center,    # wx left col
                                  memory_space=pltpu.VMEM)]
    elif mode in ("shard3d", "shard3d_aniso"):
        nblk = grid[0]
        zup = lambda i: (0, jnp.maximum(i - K, 0), 0)
        zdn = lambda i: (0, jnp.minimum(i + K, last), 0)
        # az-halo streams: (., lny, nx) arrays = K blocks; only blocks in
        # the first/last local z-plane read them, the clamped maps keep the
        # fetch resident for the rest of the sweep
        zht = lambda i: (0, jnp.minimum(i, K - 1), 0)
        zhb = lambda i: (0, jnp.maximum(i - (nblk - K), 0), 0)
        colspec = pl.BlockSpec((P, tile, 2), center, memory_space=pltpu.VMEM)
        if mode == "shard3d":
            op_specs += [colspec, wspec(center),          # hc, diag
                         blkspec(zup), blkspec(zdn),      # u z-neighbors
                         blkspec(zht), blkspec(zhb)]      # az u halos
        else:
            op_specs += [colspec,
                         wspec(center), wspec(center),    # wx, wy
                         pl.BlockSpec((1, 1, 1, nx), halo4,  # wy halo rows
                                      memory_space=pltpu.VMEM),
                         pl.BlockSpec((1, tile, 1), center,  # wx left col
                                      memory_space=pltpu.VMEM),
                         wspec(center), wspec(zup),       # wz, wz_up
                         blkspec(zup), blkspec(zdn),      # u z-neighbors
                         blkspec(zht), blkspec(zhb),      # az u halos
                         wspec(zht)]                      # wz az halo
    in_specs = [
        pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ] + op_specs + [blkspec(center) for _ in range(j)]
    out_specs = [
        blkspec(center),
        pl.BlockSpec((j + 1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((P, ny, nx), jnp.float32),
                   jax.ShapeDtypeStruct((j + 1, 2), jnp.float32)],
        compiler_params=_compiler_params(j + 2 + nop, tile, nx, P),
        interpret=interpret,
    )


def _iter_call(j, P, ny, nx, tile, scale, sign, variant, interpret,
               mode="iso2d", geom=None):
    """Whole Lanczos iteration j in ONE kernel: grid (2, nblk), phase-major.

    Phase 0 (= _pass1_call) writes w into a persistent full-field VMEM
    scratch and accumulates the projection dots in SMEM; phase 1
    (= _pass2_call) computes q = s_i^2 * raw in-kernel from that SMEM
    accumulator, subtracts the projections from the scratch tile, and emits
    W_{j+1} + ||w'||^2. Eliminates the 16 MB/iteration HBM round-trip of the
    w intermediate and halves kernel launches. Inputs: scal (1, j+3) SMEM
    [s_j, beta*s_{j-1}, s_0..s_j], operator streams, W_0..W_{j-1}.
    Outputs: W_{j+1}, raw (j+1, 2) SMEM, norm^2 (1, 1) SMEM.

    Phase-inactive streams (halos, weights, z-blocks) collapse their index
    maps to block 0 during the other phase so nothing is re-fetched; the
    W_{j+1} output maps every phase-0 step to block 0, so the only HBM
    write-backs are phase 1's real tiles (plus one overwritten dummy).
    """
    nblk = ny // tile
    grid = (2, nblk)
    blk = (P, tile, nx)
    wblk = (1, tile, nx)
    last = nblk - 1
    nop = {"iso2d": 2, "aniso2d": 5, "iso3d": 4}[mode]
    if mode == "iso3d":
        K = geom[1] // tile

    def kernel(scal, *rest):
        ops_, wrefs = rest[:nop], rest[nop:nop + j]
        wn_out, raw_out, nrm_out = (rest[nop + j], rest[nop + j + 1],
                                    rest[nop + j + 2])
        scr = rest[nop + j + 3]
        p = pl.program_id(0)
        i = pl.program_id(1)
        u = ops_[0][...]

        @pl.when(p == 0)
        def _phase1():
            halo = ops_[1]
            up_row, dn_row = halo[:, 0, 0:1, :], halo[:, 0, 1:2, :]
            if mode == "aniso2d":
                av = _stencil_aniso(u, up_row, dn_row, ops_[2][...],
                                    ops_[3][...], ops_[4][:, 0, :, :],
                                    i * tile, tile, ny, nx, scale, sign)
            elif mode == "iso3d":
                av = _stencil_3d(u, up_row, dn_row, ops_[2], ops_[3],
                                 i * tile, tile, geom[0], geom[1], nx,
                                 scale, sign, variant)
            else:
                av = _stencil(u, up_row, dn_row, i * tile, tile, ny, nx,
                              scale, sign, variant)
            w = scal[0, 0] * av
            if j > 0:
                w = w - scal[0, 1] * wrefs[j - 1][...]
            scr[:, pl.ds(i * tile, tile), :] = w

            @pl.when(i == 0)
            def _():
                for idx in range(j + 1):
                    raw_out[idx, 0] = 0.0
                    raw_out[idx, 1] = 0.0

            for idx in range(j + 1):
                Wi = u if idx == j else wrefs[idx][...]
                re, im = _dots(P, Wi, w)
                raw_out[idx, 0] += re
                raw_out[idx, 1] += im

        @pl.when(p == 1)
        def _phase2():
            w = scr[:, pl.ds(i * tile, tile), :]
            a0 = w[0]
            a1 = w[1] if P == 2 else None
            for idx in range(j + 1):
                si = scal[0, 2 + idx]
                qr = si * si * raw_out[idx, 0]
                Wi = u if idx == j else wrefs[idx][...]
                if P == 1:
                    a0 = a0 - qr * Wi[0]
                else:
                    qi = si * si * raw_out[idx, 1]
                    a0 = a0 - (qr * Wi[0] - qi * Wi[1])
                    a1 = a1 - (qr * Wi[1] + qi * Wi[0])
            wn_out[...] = a0[None] if P == 1 else jnp.stack([a0, a1])

            @pl.when(i == 0)
            def _():
                nrm_out[0, 0] = 0.0

            nsq = jnp.sum(a0 * a0)
            if P == 2:
                nsq = nsq + jnp.sum(a1 * a1)
            nrm_out[0, 0] += nsq

    blkspec = lambda im_: pl.BlockSpec(blk, im_, memory_space=pltpu.VMEM)
    center = lambda p, i: (0, i, 0)
    p0 = lambda p, i: jnp.where(p == 0, i, 0)      # fetched in phase 0 only
    halospec = pl.BlockSpec((P, 1, 2, nx), lambda p, i: (0, p0(p, i), 0, 0),
                            memory_space=pltpu.VMEM)
    op_specs = [blkspec(center), halospec]
    if mode == "aniso2d":
        wmap = lambda p, i: (0, p0(p, i), 0)
        op_specs += [pl.BlockSpec(wblk, wmap, memory_space=pltpu.VMEM),
                     pl.BlockSpec(wblk, wmap, memory_space=pltpu.VMEM),
                     pl.BlockSpec((1, 1, 1, nx),
                                  lambda p, i: (0, p0(p, i), 0, 0),
                                  memory_space=pltpu.VMEM)]
    elif mode == "iso3d":
        op_specs += [
            blkspec(lambda p, i: (0, jnp.where(p == 0,
                                               jnp.maximum(i - K, 0), 0), 0)),
            blkspec(lambda p, i: (0, jnp.where(p == 0,
                                               jnp.minimum(i + K, last), 0),
                                  0)),
        ]
    in_specs = [
        pl.BlockSpec((1, j + 3), lambda p, i: (0, 0),
                     memory_space=pltpu.SMEM),
    ] + op_specs + [blkspec(center) for _ in range(j)]
    out_specs = [
        blkspec(lambda p, i: (0, jnp.where(p == 0, 0, i), 0)),
        pl.BlockSpec((j + 1, 2), lambda p, i: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1), lambda p, i: (0, 0), memory_space=pltpu.SMEM),
    ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((P, ny, nx), jnp.float32),
                   jax.ShapeDtypeStruct((j + 1, 2), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((P, ny, nx), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                3 * (j + 3 + nop) * P * tile * nx * 4
                + P * ny * nx * 4 + 8 * 2**20, 120 * 2**20)),
        interpret=interpret,
    )


def _pipe_call(j, P, ny, nx, tile, scale, sign, variant, interpret,
               mode="iso2d", last=False):
    """ONE-kernel pipelined Lanczos iteration: pass2(j) fused with pass1(j+1).

    Reconstructs W_{j+1} = s_j*av_j - sum_i c_i W_i IN-REGISTER from the
    unscaled stencil image av_j = A(W_j) written by the previous pipe kernel,
    computes ||W_{j+1}||^2 and the gram dots <W_i, W_{j+1}>, then stencils
    the reconstructed block (halo rows reconstructed from a stacked halo
    input by the same linear combination) and emits av_{j+1} = A(W_{j+1})
    with its projection dots <W_i, av_{j+1}> — so iteration j+1's pass1
    never re-reads the basis. Each iteration streams j+2 columns + 2 writes
    instead of the two-pass (2j+3) + 2: 73 vs 117 column-streams per m=10
    matfunc (the caller, lanczos_planar, folds the -beta*s*W_{j-1} recurrence
    term and the <W_i, W_{j-1}> cross-dots into the c_i / raw scalars).

    Inputs: scal (j+2, 2) SMEM [(s_j, 0), c_0..c_j complex], av_j block,
    stacked halo rows ((j+2)*P, nblk, 2, nx) of [av_j, W_0..W_j] (omitted
    when last), aniso weight streams (wx, wy, wy halo row; iso2d has none),
    W_0..W_j blocks. Outputs: W_{j+1}, av_{j+1}*, SMEM nsq (1,1),
    gram (j+1, 2), d (j+2, 2)*.  (* omitted when last=True.)
    """
    grid = (ny // tile,)
    blk = (P, tile, nx)
    wblk = (1, tile, nx)
    # The last iteration skips the stencil entirely, so don't stream the
    # aniso weight columns (wx, wy, wy halo) for it.
    nop = 0 if last else {"iso2d": 0, "aniso2d": 3}[mode]
    nh = 0 if last else 1

    def kernel(scal, av_ref, *rest):
        h_ref = None if last else rest[0]
        ops_ = rest[nh:nh + nop]
        wrefs = rest[nh + nop:nh + nop + j + 1]
        outs = rest[nh + nop + j + 1:]
        if last:
            wn_out, nsq_out, gram_out = outs
        else:
            wn_out, av_out, nsq_out, gram_out, d_out = outs
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
            if not last:
                for idx in range(j + 2):
                    d_out[idx, 0] = 0.0
                    d_out[idx, 1] = 0.0

        nsq = jnp.sum(a0 * a0)
        if P == 2:
            nsq = nsq + jnp.sum(a1 * a1)
        nsq_out[0, 0] += nsq
        for idx in range(j + 1):
            re, im = _dots(P, Ws[idx], wn)
            gram_out[idx, 0] += re
            gram_out[idx, 1] += im

        if last:
            return
        # Halo rows of the reconstructed column: same linear combination
        # applied to the inputs' gathered halo rows (reconstruction is
        # globally pointwise, so it commutes with row selection).
        h = h_ref[...]                      # ((j+2)*P, 1, 2, nx)
        hrows = []                          # per plane: (up, dn) as (1, nx)
        for p in range(P):
            hu = s * h[p, 0, 0:1, :]
            hd = s * h[p, 0, 1:2, :]
            hrows.append([hu, hd])
        for idx in range(j + 1):
            cr = scal[1 + idx, 0]
            base = (1 + idx) * P
            if P == 1:
                hrows[0][0] = hrows[0][0] - cr * h[base, 0, 0:1, :]
                hrows[0][1] = hrows[0][1] - cr * h[base, 0, 1:2, :]
            else:
                ci = scal[1 + idx, 1]
                w0u, w1u = h[base, 0, 0:1, :], h[base + 1, 0, 0:1, :]
                w0d, w1d = h[base, 0, 1:2, :], h[base + 1, 0, 1:2, :]
                hrows[0][0] = hrows[0][0] - (cr * w0u - ci * w1u)
                hrows[0][1] = hrows[0][1] - (cr * w0d - ci * w1d)
                hrows[1][0] = hrows[1][0] - (cr * w1u + ci * w0u)
                hrows[1][1] = hrows[1][1] - (cr * w1d + ci * w0d)
        up = jnp.stack([hrows[p][0] for p in range(P)])     # (P, 1, nx)
        dn = jnp.stack([hrows[p][1] for p in range(P)])
        if mode == "aniso2d":
            avn = _stencil_aniso(wn, up, dn, ops_[0][...], ops_[1][...],
                                 ops_[2][:, 0, :, :], i * tile, tile, ny,
                                 nx, scale, sign)
        else:
            avn = _stencil(wn, up, dn, i * tile, tile, ny, nx, scale,
                           sign, variant)
        av_out[...] = avn
        for idx in range(j + 1):
            re, im = _dots(P, Ws[idx], avn)
            d_out[idx, 0] += re
            d_out[idx, 1] += im
        re, im = _dots(P, wn, avn)
        d_out[j + 1, 0] += re
        d_out[j + 1, 1] += im

    center = lambda i: (0, i, 0)
    blkspec = pl.BlockSpec(blk, center, memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((j + 2, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        blkspec,                                             # av_j
    ]
    if not last:
        in_specs.append(pl.BlockSpec(((j + 2) * P, 1, 2, nx),
                                     lambda i: (0, i, 0, 0),
                                     memory_space=pltpu.VMEM))
    if mode == "aniso2d" and not last:
        wspec = pl.BlockSpec(wblk, center, memory_space=pltpu.VMEM)
        in_specs += [wspec, wspec,
                     pl.BlockSpec((1, 1, 1, nx), lambda i: (0, i, 0, 0),
                                  memory_space=pltpu.VMEM)]
    in_specs += [blkspec for _ in range(j + 1)]
    out_specs = [
        blkspec,
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((j + 1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((P, ny, nx), jnp.float32),
                 jax.ShapeDtypeStruct((1, 1), jnp.float32),
                 jax.ShapeDtypeStruct((j + 1, 2), jnp.float32)]
    if not last:
        out_specs.insert(1, blkspec)
        out_shape.insert(1, jax.ShapeDtypeStruct((P, ny, nx), jnp.float32))
        out_specs.append(pl.BlockSpec((j + 2, 2), lambda i: (0, 0),
                                      memory_space=pltpu.SMEM))
        out_shape.append(jax.ShapeDtypeStruct((j + 2, 2), jnp.float32))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=_compiler_params(j + 5 + nop, tile, nx, P),
        interpret=interpret,
    )


def _pass2_call(j, P, ny, nx, tile, interpret):
    """pallas_call computing w' = w - sum_i q_i W_i (complex coefficients)
    fused with ||w'||^2. Inputs: q (j+1, 2) SMEM, w, W_0..W_j. Outputs:
    w' and the squared norm (1, 1) SMEM."""
    grid = (ny // tile,)
    blk = (P, tile, nx)

    def kernel(q, w_ref, *rest):
        wn_out, nrm_out = rest[j + 1], rest[j + 2]
        wrefs = rest[:j + 1]
        i = pl.program_id(0)
        w = w_ref[...]
        a0 = w[0]
        a1 = w[1] if P == 2 else None
        for idx in range(j + 1):
            Wi = wrefs[idx][...]
            qr = q[idx, 0]
            if P == 1:
                a0 = a0 - qr * Wi[0]
            else:
                qi = q[idx, 1]
                a0 = a0 - (qr * Wi[0] - qi * Wi[1])
                a1 = a1 - (qr * Wi[1] + qi * Wi[0])
        out = a0[None] if P == 1 else jnp.stack([a0, a1])
        wn_out[...] = out

        @pl.when(i == 0)
        def _():
            nrm_out[0, 0] = 0.0

        nsq = jnp.sum(a0 * a0)
        if P == 2:
            nsq = nsq + jnp.sum(a1 * a1)
        nrm_out[0, 0] += nsq

    blkspec = pl.BlockSpec(blk, lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((j + 1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        blkspec,
    ] + [blkspec for _ in range(j + 1)]
    out_specs = [
        blkspec,
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((P, ny, nx), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)],
        compiler_params=_compiler_params(j + 4, tile, nx, P),
        interpret=interpret,
    )


# descriptor kinds routed through the fused combine kernel (_combine_call)
# instead of the XLA MAC chain — all of them: measured 4.0 -> ~2.0 ms at
# 256^3 m=10 (exp256b_r05.py), and at 1024^2 ss2 991 -> 1016 steps/s /
# sewi 268 -> 295 interleaved on-chip (the XLA chain splits the wide
# fusion and re-streams intermediates at every size tested).
_COMBINE_KINDS = ("laplacian_2d", "aniso_laplacian_2d",
                  "shard2d", "shard2d_aniso",
                  "laplacian_3d", "aniso_laplacian_3d",
                  "shard3d", "shard3d_aniso")


def _combine_call(m, k, P, ny, nx, tile, interpret):
    """pallas_call for the final combine y_spec = sum_i q[spec, i] W_i
    (complex coefficients on planar columns, q[spec, i] already folded
    with s_i).

    Replaces the XLA-fused MAC chain for the 3D paths: at 256^3 m=10 the
    10-input fused chain measured ~4.0 ms against a ~1.9 ms byte-ideal
    (benchmarks/exp256b_r05.py — XLA splits the wide fusion and
    re-streams intermediates); this kernel streams each W_i exactly once
    for ALL specs, like `_pass2_call` without the norm. Inputs: q SMEM
    (k, m, 2), W_0..W_{m-1} blocks. Outputs: k blocks.
    """
    grid = (ny // tile,)
    blk = (P, tile, nx)

    def kernel(q, *rest):
        wrefs = rest[:m]
        outs = rest[m:]
        Ws = [wrefs[i][...] for i in range(m)]
        for spec in range(k):
            if P == 1:
                acc = q[spec, 0, 0] * Ws[0][0]
                for i in range(1, m):
                    acc = acc + q[spec, i, 0] * Ws[i][0]
                outs[spec][...] = acc[None]
            else:
                a, b = q[spec, 0, 0], q[spec, 0, 1]
                y0 = a * Ws[0][0] - b * Ws[0][1]
                y1 = a * Ws[0][1] + b * Ws[0][0]
                for i in range(1, m):
                    a, b = q[spec, i, 0], q[spec, i, 1]
                    y0 = y0 + a * Ws[i][0] - b * Ws[i][1]
                    y1 = y1 + a * Ws[i][1] + b * Ws[i][0]
                outs[spec][...] = jnp.stack([y0, y1])

    blkspec = pl.BlockSpec(blk, lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((k, m, 2), lambda i: (0, 0, 0),
                     memory_space=pltpu.SMEM),
    ] + [blkspec for _ in range(m)]
    out_specs = [blkspec for _ in range(k)]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((P, ny, nx), jnp.float32)
                   for _ in range(k)],
        compiler_params=_compiler_params(m + k + 1, tile, nx, P),
        interpret=interpret,
    )


def _lanczos_pipe(u, m, P, ny, nx, scale, sign, variant, mode, op_args,
                  extra_ops, safe_inv, n_op, interpret):
    """Pipelined single-pass Lanczos driver (kernels: _pipe_call).

    Scalar recurrence: w_j = s_j av_j - bs W_{j-1} (bs = beta_{j-1} s_{j-1})
    is never materialized. Its projections raw_i = <W_i, w_j> are recovered
    exactly as s_j d_i - bs <W_i, W_{j-1}> with d_i = <W_i, av_j> from the
    previous pipe kernel, and the gram terms <W_i, W_{j-1}> from the kernel
    before that (i = j-1: beta_{j-2}^2; i = j: conj of the previous gram's
    last entry — <a, b> = conj(<b, a>)). The reconstruction coefficients
    fold the recurrence term in: c_i = s_i^2 raw_i + (i == j-1) bs. Same
    linear algebra as the two-pass loop; differs only in dot/FMA rounding
    (tests/test_pallas.py pins both against the pure-XLA path).
    """
    nsq0 = jnp.sum(u * u)
    beta0 = jnp.sqrt(nsq0)
    # init kernel: av_0 = A(W_0) and d^{(0)}_0 = <W_0, av_0> — pass1 with
    # scal = [1, 0] computes exactly that (w = 1*A(W_0) - 0).
    tile0 = _pick_tile(ny, nx, 2 + n_op + 2 * (mode == "aniso2d"),
                       nplanes=P)
    scal0 = jnp.asarray([[1.0, 0.0]], jnp.float32)
    av, d_prev = _pass1_call(0, P, ny, nx, tile0, scale, sign, variant,
                             interpret, mode=mode)(scal0, *op_args(u, tile0))
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
            parts.append(jnp.stack([g_prev[j - 1, 0],      # i = j (conj)
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
            # final iteration streams no halo stack and no weight columns
            tile = _pick_tile(ny, nx, j + 4, nplanes=P)
        else:
            # fold the stacked-halo input ((j+2)*P, ., 2, nx) into the
            # stream count: it is worth ceil(2*(j+2)/tile) block-equivalents
            # of VMEM, which matters at high m with small tiles
            n_str = j + 5 + 3 * (mode == "aniso2d")
            tile = _pick_tile(ny, nx, n_str, nplanes=P)
            halo_eq = -(-2 * (j + 2) // max(tile, 8))
            tile = _pick_tile(ny, nx, n_str + halo_eq, nplanes=P)
        args = [scal, av]
        if not lastk:
            halos = jnp.stack(
                [_gather_halo_rows(a, tile, ny) for a in [av] + W])
            args.append(halos.reshape((j + 2) * P, ny // tile, 2, nx))
            args.extend(extra_ops(tile))
        args.extend(W)
        res = _pipe_call(j, P, ny, nx, tile, scale, sign, variant,
                         interpret, mode=mode, last=lastk)(*args)
        if lastk:
            wn, nsq, gram = res
        else:
            wn, av, nsq, gram, d_prev = res
        b = jnp.sqrt(nsq[0, 0])
        W.append(wn)
        betas.append(b)
        s.append(safe_inv(b))
        g_prev2, g_prev = g_prev, gram
    return W, s, alphas, betas, beta0


def lanczos_planar(u, desc, m, interpret=False, axis_names=()):
    """Fused-kernel Lanczos on a planar (P, ny, nx) float32 field.

    Returns (W, s, alpha, beta, beta0): unnormalized Krylov columns W (list,
    W[i]/|W[i]| is the reference's v_i), their inverse norms s (list of
    scalars), and the T entries — same semantics as ops/krylov.lanczos
    (eigen_krylov_real.hpp:8-55 with full reorthogonalization).

    With a "shard2d" descriptor this runs inside shard_map on a spatially
    sharded grid: the kernels see the LOCAL block, cross-shard stencil rows/
    cols arrive as ppermute'd halos, and every reduction (the raw projection
    dots, the norms) is psum'd over `axis_names` — the distributed analogue
    of parallel/spatial.sharded_laplacian_2d's halo_neighbor_sum.
    """
    axis_names = tuple(axis_names)
    P, ny, nx = u.shape          # ny = merged nz*ny row count for 3D
    scale, sign, variant = desc["scale"], desc["sign"], desc["variant"]
    kind = desc["kind"]

    def gsum(x):
        return lax.psum(x, axis_names) if axis_names else x

    geom = None
    shard_halo = None
    if kind == "shard2d":
        mode, n_op = "shard2d", 4
        ay, ax = desc["ay"], desc["ax"]
        NY, NX = desc["NY"], desc["NX"]
        # variant diagonal from GLOBAL coordinates (unscaled; the kernel
        # applies scale*sign) — one loop-invariant (lny, lnx) array
        gy = (lax.axis_index(ay) * ny
              + lax.broadcasted_iota(jnp.int32, (ny, nx), 0))
        gx = (lax.axis_index(ax) * nx
              + lax.broadcasted_iota(jnp.int32, (ny, nx), 1))
        ring = (gy == 0) | (gy == NY - 1) | (gx == 0) | (gx == NX - 1)
        if variant == "reference":
            diag = jnp.where(ring, -3.0, -4.0).astype(jnp.float32)
        else:
            nnb = (4.0 - (gy == 0) - (gy == NY - 1)
                   - (gx == 0) - (gx == NX - 1))
            diag = (-nnb).astype(jnp.float32)
        diag = diag[None]                              # (1, lny, lnx)

        def shard_halo(wj, tile):
            """Halo rows/cols with cross-shard ppermute edges (zeros at the
            true domain boundary — the halo IS the no-flux BC)."""
            nblk = ny // tile
            h = _gather_halo_rows(wj, tile, ny)
            top = _recv_from_prev(wj[:, -1:, :], ay)   # row above shard
            bot = _recv_from_next(wj[:, :1, :], ay)    # row below shard
            h = h.at[:, 0, 0, :].set(top[:, 0, :])
            h = h.at[:, nblk - 1, 1, :].set(bot[:, 0, :])
            lcol = _recv_from_prev(wj[:, :, -1:], ax)
            rcol = _recv_from_next(wj[:, :, :1], ax)
            hc = jnp.concatenate([lcol, rcol], axis=2)  # (P, lny, 2)
            return h, hc
    elif kind == "shard2d_aniso":
        mode, n_op = "shard2d_aniso", 7
        ay, ax = desc["ay"], desc["ax"]
        NY, NX = desc["NY"], desc["NX"]
        c = jnp.asarray(desc["c"], jnp.float32)
        gy = (lax.axis_index(ay) * ny
              + lax.broadcasted_iota(jnp.int32, (ny, nx), 0))
        gx = (lax.axis_index(ax) * nx
              + lax.broadcasted_iota(jnp.int32, (ny, nx), 1))
        # padded face weights; last col/row = cross-shard face, masked to
        # zero at the true domain boundary (parity with
        # parallel/spatial.sharded_anisotropic_laplacian_2d)
        c_rcol = _recv_from_next(c[:, :1], ax)
        c_r = jnp.concatenate([c[:, 1:], c_rcol], axis=1)
        wxp = jnp.where(gx == NX - 1, 0.0, 0.5 * (c + c_r))[None]
        c_brow = _recv_from_next(c[:1, :], ay)
        c_b = jnp.concatenate([c[1:, :], c_brow], axis=0)
        wyp = jnp.where(gy == NY - 1, 0.0, 0.5 * (c + c_b))[None]
        c_lcol = _recv_from_prev(c[:, -1:], ax)
        wxl = jnp.where(gx[:, :1] == 0, 0.0,
                        0.5 * (c_lcol + c[:, :1]))[None]      # (1, lny, 1)
        c_trow = _recv_from_prev(c[-1:, :], ay)
        wy_top = jnp.where(gy[:1, :] == 0, 0.0,
                           0.5 * (c_trow + c[:1, :]))[None]   # (1, 1, lnx)

        def shard_halo(wj, tile):
            nblk = ny // tile
            h = _gather_halo_rows(wj, tile, ny)
            top = _recv_from_prev(wj[:, -1:, :], ay)
            bot = _recv_from_next(wj[:, :1, :], ay)
            h = h.at[:, 0, 0, :].set(top[:, 0, :])
            h = h.at[:, nblk - 1, 1, :].set(bot[:, 0, :])
            lcol = _recv_from_prev(wj[:, :, -1:], ax)
            rcol = _recv_from_next(wj[:, :, :1], ax)
            hc = jnp.concatenate([lcol, rcol], axis=2)
            # per-tile wy upper-face halo rows: local rows i*tile-1 of the
            # padded wy, except block 0 whose face weight is cross-shard
            wyh = _gather_halo_rows(wyp, tile, ny, per_block=1)
            wyh = wyh.at[:, 0, 0, :].set(wy_top[:, 0, :])
            return h, hc, wyh
    elif kind in ("shard3d", "shard3d_aniso"):
        az, ay, ax = desc["az"], desc["ay"], desc["ax"]
        NZ, NY, NX = desc["NZ"], desc["NY"], desc["NX"]
        lnz, lny = desc["lnz"], desc["lny"]       # local dims (static)
        R = lnz * lny                              # = ny (merged rows)
        geom = (lnz, lny)
        # global coordinates of the local block, merged (R, nx) view
        shp = (lnz, lny, nx)
        gz = (lax.axis_index(az) * lnz
              + lax.broadcasted_iota(jnp.int32, shp, 0)).reshape(R, nx)
        gy = (lax.axis_index(ay) * lny
              + lax.broadcasted_iota(jnp.int32, shp, 1)).reshape(R, nx)
        gx = (lax.axis_index(ax) * nx
              + lax.broadcasted_iota(jnp.int32, shp, 2)).reshape(R, nx)
        merged = lax.broadcasted_iota(jnp.int32, (R, nx), 0)
        # y-seam handling: variant="clean" splices ay-halo rows at every
        # plane boundary; variant="reference" keeps the merged cross-plane
        # coupling (laplacians.hpp:140's flat-index loop) and is only legal
        # with unsplit z/y axes (enforced in supported_desc), where the ay
        # ppermute over a singleton axis yields the required edge zeros.
        plane_splice = variant != "reference"

        def shard_halo(wj, tile):
            """u halos: merged gathered rows with ay-halo splices at plane
            boundaries, ax columns, and az plane slabs."""
            nblk = R // tile
            Kb = lny // tile
            h = _gather_halo_rows(wj, tile, R)
            w3 = wj.reshape(P, lnz, lny, nx)
            ytop = _recv_from_prev(w3[:, :, -1, :], ay)    # (P, lnz, nx)
            ybot = _recv_from_next(w3[:, :, 0, :], ay)
            zs = np.arange(lnz)
            if plane_splice:
                h = h.at[:, zs * Kb, 0, :].set(ytop)
                h = h.at[:, (zs + 1) * Kb - 1, 1, :].set(ybot)
            else:
                h = h.at[:, 0, 0, :].set(ytop[:, 0, :])
                h = h.at[:, nblk - 1, 1, :].set(ybot[:, -1, :])
            lcol = _recv_from_prev(wj[:, :, -1:], ax)
            rcol = _recv_from_next(wj[:, :, :1], ax)
            hc = jnp.concatenate([lcol, rcol], axis=2)      # (P, R, 2)
            zht = _recv_from_prev(w3[:, -1, :, :], az)      # (P, lny, nx)
            zhb = _recv_from_next(w3[:, 0, :, :], az)
            return h, hc, zht, zhb

        if kind == "shard3d":
            mode, n_op = "shard3d", 8
            if variant == "reference":
                bnd = ((gz == 0) | (gz == NZ - 1) | (gy == 0)
                       | (gy == NY - 1) | (gx == 0) | (gx == NX - 1))
                diag = jnp.where(bnd, -5.0, -6.0).astype(jnp.float32)
            else:
                nnb = (6.0 - (gz == 0) - (gz == NZ - 1) - (gy == 0)
                       - (gy == NY - 1) - (gx == 0) - (gx == NX - 1))
                diag = (-nnb).astype(jnp.float32)
            diag = diag[None]                              # (1, R, nx)
        else:
            mode, n_op = "shard3d_aniso", 14
            c = jnp.asarray(desc["c"], jnp.float32)        # (lnz, lny, lnx)
            cm = c.reshape(R, nx)
            # +x faces (last col cross-shard, zero past the domain)
            c_rcol = _recv_from_next(cm[:, :1], ax)
            c_r = jnp.concatenate([cm[:, 1:], c_rcol], axis=1)
            wxp = jnp.where(gx == NX - 1, 0.0, 0.5 * (cm + c_r))[None]
            c_lcol = _recv_from_prev(cm[:, -1:], ax)
            wxl = jnp.where(gx[:, :1] == 0, 0.0,
                            0.5 * (c_lcol + cm[:, :1]))[None]  # (1, R, 1)
            # +y faces
            if plane_splice:
                c_brow = _recv_from_next(c[:, 0, :], ay)   # (lnz, nx)
                c_b3 = jnp.concatenate([c[:, 1:, :], c_brow[:, None, :]],
                                       axis=1)
                wyp = jnp.where(gy == NY - 1, 0.0,
                                0.5 * (cm + c_b3.reshape(R, nx)))[None]
                c_trow = _recv_from_prev(c[:, -1, :], ay)  # (lnz, nx)
                wy_top = jnp.where(gy.reshape(lnz, lny, nx)[:, 0, :] == 0,
                                   0.0, 0.5 * (c_trow + c[:, 0, :]))
                wy_top = wy_top[None]                      # (1, lnz, nx)
            else:
                # merged-seam faces (reference variant, unsplit z/y)
                zrow = jnp.zeros((1, nx), cm.dtype)
                c_b = jnp.concatenate([cm[1:, :], zrow], axis=0)
                wyp = jnp.where(merged == R - 1, 0.0,
                                0.5 * (cm + c_b))[None]
                wy_top = jnp.zeros((1, 1, nx), jnp.float32)
            # +z faces (local z lnz-1 cross-shard via az, zero past domain)
            c_znext = _recv_from_next(c[0, :, :], az)      # (lny, nx)
            c_z3 = jnp.concatenate([c[1:, :, :], c_znext[None]], axis=0)
            wzp = jnp.where(gz == NZ - 1, 0.0,
                            0.5 * (cm + c_z3.reshape(R, nx)))[None]
            # -z face weights for the first local plane: face to az-prev
            c_zprev = _recv_from_prev(c[-1, :, :], az)     # (lny, nx)
            wzh = jnp.where(gz.reshape(lnz, lny, nx)[0] == 0, 0.0,
                            0.5 * (c_zprev + c[0, :, :]))[None]  # (1,lny,nx)

            def wy_halo(tile):
                """-y face weight halo rows per tile block (1, nblk, 1, nx):
                wyp gathered at row i*tile-1 with plane-boundary splices."""
                wyh = _gather_halo_rows(wyp, tile, R, per_block=1)
                Kb = lny // tile
                zs = np.arange(lnz)
                if plane_splice:
                    wyh = wyh.at[:, zs * Kb, 0, :].set(wy_top)
                else:
                    wyh = wyh.at[:, 0, 0, :].set(wy_top[:, 0, :])
                return wyh
    elif kind == "aniso_laplacian_2d":
        mode, n_op = "aniso2d", 3      # wx/wy blocks ~ one extra full stream
        wx = jnp.asarray(desc["wx"], jnp.float32).reshape(1, ny, nx)
        wy = jnp.asarray(desc["wy"], jnp.float32).reshape(1, ny, nx)
    elif kind == "laplacian_3d":
        mode, n_op = "iso3d", 4        # center + halo rows + 2 z streams
        geom = (desc["nz"], desc["ny"])
    elif kind == "aniso_laplacian_3d":
        mode, n_op = "aniso3d", 9
        geom = (desc["nz"], desc["ny"])
        wx = jnp.asarray(desc["wx"], jnp.float32).reshape(1, ny, nx)
        wym = jnp.asarray(desc["wy"], jnp.float32).reshape(1, ny, nx)
        wz = jnp.asarray(desc["wz"], jnp.float32).reshape(1, ny, nx)
    else:
        mode, n_op = "iso2d", 2        # center + halo rows

    # row-tile must divide the true ny for the 3D z-offset trick
    tile_div = geom[1] if geom else ny

    def halo_rows(arr, tile, per_block=2):
        return _gather_halo_rows(arr, tile, ny, per_block=per_block)

    def op_args(wj, tile):
        if mode == "shard2d":
            h, hc = shard_halo(wj, tile)
            return (wj, h, hc, diag)
        if mode == "shard2d_aniso":
            h, hc, wyh = shard_halo(wj, tile)
            return (wj, h, hc, wxp, wyp, wyh, wxl)
        if mode == "shard3d":
            h, hc, zht, zhb = shard_halo(wj, tile)
            return (wj, h, hc, diag, wj, wj, zht, zhb)
        if mode == "shard3d_aniso":
            h, hc, zht, zhb = shard_halo(wj, tile)
            return (wj, h, hc, wxp, wyp, wy_halo(tile), wxl, wzp, wzp,
                    wj, wj, zht, zhb, wzh)
        h = halo_rows(wj, tile)
        if mode == "aniso2d":
            return (wj, h, wx, wy, halo_rows(wy, tile, per_block=1))
        if mode == "iso3d":
            return (wj, h, wj, wj)
        if mode == "aniso3d":
            return (wj, h, wj, wj, wx, wym,
                    halo_rows(wym, tile, per_block=1), wz, wz)
        return (wj, h)

    fused_iter = (_FUSED_ITER
                  and mode not in ("shard2d", "shard2d_aniso", "shard3d",
                                   "shard3d_aniso")
                  and P * ny * nx * 4 <= 32 * 2**20)

    # Inverse norms are safe against zero columns (zero start vector or
    # exact breakdown): the inverse is set to 0, so the column contributes
    # nothing and the final combination (scaled by beta0) stays finite —
    # mirrors the safe_div in ops/krylov._lanczos_cols.
    def safe_inv(nrm):
        return jnp.where(nrm > 0, 1.0 / jnp.where(nrm > 0, nrm, 1), 0.0)

    from nlsolvers_tpu import config as _cfg
    # _lanczos_pipe performs no psum reductions (nsq/gram/d are shard-local),
    # so sharded callers (axis_names set) must take the gsum'd two-pass loop.
    if (_cfg.pallas_pipeline and not fused_iter and m > 1
            and not axis_names and mode in ("iso2d", "aniso2d")):
        def extra_ops(tile):
            if mode == "aniso2d":
                return (wx, wy, halo_rows(wy, tile, per_block=1))
            return ()

        return _lanczos_pipe(u, m, P, ny, nx, scale, sign, variant, mode,
                             op_args, extra_ops, safe_inv, n_op, interpret)

    # 3D y-slab branches gate on pallas_ytile_3d ALONE: pallas_pipeline is
    # the 2D pipeline switch (config.py) and must not silently demote the 3D
    # paths to row-tiled kernels ("Off -> the original row-tiled kernels"
    # refers to pallas_ytile_3d itself).
    if (_cfg.pallas_ytile_3d and m > 1
            and axis_names and kind in ("shard3d", "shard3d_aniso")):
        from nlsolvers_tpu.ops.pallas.lanczos3d_pipe import (
            lanczos_twopass3d_y_sharded, pick_brick3d, pick_ty3d)
        # extra block-equivalent streams beyond av/W/out: hc + z-slabs +
        # diag (iso) or + wx/wy/wz face-weight columns (aniso)
        nop_ys = 3 if kind == "shard3d" else 6
        nop_brick = 1 if kind == "shard3d" else 6
        jmax = max(m - 2, 0)
        # 256^3-class LOCAL shards (512^3 on 2x2x2): when the full-z y-slab
        # blocks exceed VMEM the driver drops to the brick pass1 per
        # iteration instead of collapsing to the row-tiled kernels (r5)
        if (pick_ty3d(desc["lnz"], desc["lny"], nx, jmax, P, nop_ys) >= 8
                or pick_brick3d(desc["lnz"], desc["lny"], nx, jmax, P,
                                nop_brick) is not None):
            aniso_w = (None if kind == "shard3d" else
                       (wxp, wyp, wy_top, wxl, wzp, wzh, plane_splice))
            return lanczos_twopass3d_y_sharded(u, m, P, ny, nx, scale, sign,
                                               variant, desc, safe_inv,
                                               interpret, axis_names,
                                               aniso=aniso_w)

    if (_cfg.pallas_ytile_3d and not fused_iter
            and m > 1 and not axis_names and mode in ("iso3d", "aniso3d")):
        from nlsolvers_tpu.ops.pallas.lanczos3d_pipe import (
            lanczos_pipe3d, lanczos_twopass3d_y, pick_brick3d, pick_ty3d)
        nop_pipe = 0 if mode == "iso3d" else 4
        jmax = max(m - 2, 0)
        fits_yslab = pick_ty3d(geom[0], geom[1], nx, jmax, P, nop_pipe) >= 8
        # 256^3-class grids where the full-z slabs exceed VMEM take the
        # brick pass1 (z- AND y-tiled, gathered z-halo planes) for the late
        # iterations; the two-pass driver picks per iteration.
        nop_brick = 0 if mode == "iso3d" else 5
        fits_brick = (pick_brick3d(geom[0], geom[1], nx, jmax, P,
                                   nop_brick) is not None)
        if fits_yslab or fits_brick:
            weights = (wx, wym, wz) if mode == "aniso3d" else None
            if _cfg.pallas_pipeline_3d and fits_yslab:
                # opt-in single-pass pipe (see config.pallas_pipeline_3d)
                return lanczos_pipe3d(u, m, P, ny, nx, scale, sign, variant,
                                      mode, geom, op_args, weights,
                                      safe_inv, n_op, interpret)
            return lanczos_twopass3d_y(u, m, P, ny, nx, scale, sign,
                                       variant, mode, geom, weights,
                                       safe_inv, interpret)

    if axis_names and not fused_iter and m > 1:
        # ---- deferred-norm CGS: ONE psum per iteration (plus one final) --
        # The normalized loop below needs TWO blocking psums per iteration
        # (raw after pass1, nsq after pass2) because s_{j+1} = 1/||w'||
        # gates the next pass1. Sharded callers instead run the recurrence
        # on UNNORMALIZED columns: pass1 applies w = (A/chat) W_j with a
        # STATIC scaling chat >= ||A|| (Gershgorin; keeps column norms
        # decaying geometrically, no overflow) and NO three-term
        # pre-subtraction — the j-1/j components fall out in pass2's full
        # CGS like every other projection. pass2's LOCAL ||W_{j+1}||^2 then
        # rides the NEXT iteration's raw psum, so every global norm is
        # EXACT, one collective later: T is recovered from exact Rayleigh
        # quotients (alpha_j = chat <W_j, A~ W_j>/||W_j||^2) and exact norm
        # ratios (beta_j = chat sqrt(||W_{j+1}||^2/||W_j||^2)). Halves the
        # blocking-collective count per iteration on ICI meshes.
        if mode == "shard2d":
            ghat = 8.0                       # |diag| + 4 unit neighbors
        elif mode == "shard3d":
            ghat = 12.0
        elif mode == "shard2d_aniso":
            # Gershgorin row sum <= 2*(2 max wx + 2 max wy); cross-shard
            # faces are <= some shard's local face max, so pmax covers them
            ghat = lax.pmax(4.0 * (jnp.max(wxp) + jnp.max(wyp)), axis_names)
        else:                                # shard3d_aniso
            ghat = lax.pmax(4.0 * (jnp.max(wxp) + jnp.max(wyp)
                                   + jnp.max(wzp)), axis_names)
        chat = (ghat * abs(scale)).astype(jnp.float32) if hasattr(
            ghat, "astype") else jnp.float32(ghat * abs(scale))

        def p1(j, scal, W):
            tile = _pick_tile(tile_div, nx, j + 2 + n_op, nplanes=P)
            return _pass1_call(j, P, ny, nx, tile, scale, sign, variant,
                               interpret, mode=mode, geom=geom)(
                scal, *op_args(W[j], tile), *W[:j])

        def p2(j, q, w, W):
            tile2 = _pick_tile(ny, nx, j + 4, nplanes=P)
            return _pass2_call(j, P, ny, nx, tile2, interpret)(
                q, w, *W[:j + 1])

        return _deferred_norm_cgs(u, m, chat, gsum, safe_inv, p1, p2)

    beta0 = jnp.sqrt(gsum(jnp.sum(u * u)))
    W = [u]
    s = [safe_inv(beta0)]
    alphas, betas = [], []
    for j in range(m - 1):
        # scal is SMEM; operator streams + weights + j dots + 1 out + slack
        n_streams = j + 2 + n_op + 2 * (mode == "aniso2d")
        tile = _pick_tile(tile_div, nx, n_streams, nplanes=P)
        bs = (betas[j - 1] * s[j - 1]) if j > 0 else jnp.float32(0.0)
        if fused_iter:
            scal = jnp.stack([s[j].astype(jnp.float32),
                              bs.astype(jnp.float32)]
                             + [si.astype(jnp.float32) for si in s]
                             ).reshape(1, j + 3)
            wn, raw, nsq = _iter_call(j, P, ny, nx, tile, scale, sign,
                                      variant, interpret, mode=mode,
                                      geom=geom)(
                scal, *op_args(W[j], tile), *W[:j])
            alphas.append(s[j].astype(jnp.float32) * raw[j, 0])
        else:
            scal = jnp.stack([s[j].astype(jnp.float32),
                              bs.astype(jnp.float32)]).reshape(1, 2)
            w, raw = _pass1_call(j, P, ny, nx, tile, scale, sign, variant,
                                 interpret, mode=mode, geom=geom)(
                scal, *op_args(W[j], tile), *W[:j])
            raw = gsum(raw)
            sv = jnp.stack([si.astype(jnp.float32) for si in s])  # (j+1,)
            proj = sv[:, None] * raw                               # (j+1, 2)
            alphas.append(proj[j, 0])
            q = sv[:, None] * proj
            tile2 = _pick_tile(ny, nx, j + 4, nplanes=P)
            wn, nsq = _pass2_call(j, P, ny, nx, tile2, interpret)(
                q, w, *W[:j + 1])
        b = jnp.sqrt(gsum(nsq[0, 0]))
        W.append(wn)
        s.append(safe_inv(b))
        betas.append(b)
    return W, s, alphas, betas, beta0


def matfunc_apply_planar(u, desc, t, func, m, interpret=False,
                         axis_names=()):
    """y = f(t * sign*scale*L) u on a planar (P, ny, nx) float32 field.

    Drop-in fused equivalent of ops/krylov.matfunc_apply for operators with
    a pallas descriptor; same function table (MATFUNCS), same T handling.
    With axis_names (shard2d descriptors) it runs on spatially sharded
    grids inside shard_map.
    """
    return matfunc_apply_planar_multi(u, desc, ((t, func),), m,
                                      interpret=interpret,
                                      axis_names=axis_names)[0]


def matfunc_apply_planar_multi(u, desc, specs, m, interpret=False,
                               axis_names=()):
    """[f(t L) u for (t, f) in specs] from ONE fused-kernel Lanczos run.

    The expensive part (the two-kernel iteration over W) runs once; each
    spec only adds its own coefficient solve on the shared tridiagonal and a
    final MAC pass over the columns (XLA fuses the chains into one read of
    each W_i). See ops/krylov.matfunc_apply_multi for the semantics.
    """
    P = u.shape[0]
    W, s, alphas, betas, beta0 = lanczos_planar(u, desc, m,
                                                interpret=interpret,
                                                axis_names=axis_names)
    zero = jnp.zeros((), jnp.float32) * beta0
    alpha = jnp.stack(alphas + [zero]) if alphas else jnp.zeros((m,),
                                                                jnp.float32)
    beta = jnp.stack(betas) if betas else jnp.zeros((0,), jnp.float32)
    lam, Q = tridiag_eigh(alpha, beta)
    svec = [jnp.asarray(si, jnp.float32) for si in s]

    if desc.get("kind") in _COMBINE_KINDS and m >= 2:
        # fused combine kernel for the 3D paths (see _combine_call): the
        # XLA MAC chain over m wide columns re-streams intermediates at
        # 256^3-class sizes. Same accumulation order as the chain below.
        sv = jnp.stack(svec)                          # (m,)
        qrows = []
        for t, func in specs:
            f = MATFUNCS[func] if isinstance(func, str) else func
            fvals = f(np.asarray(t), lam)
            coef = beta0 * jnp.matmul(Q, fvals * Q[0, :],
                                      precision=jax.lax.Precision.HIGHEST)
            qrows.append(jnp.stack(
                [jnp.real(coef).astype(jnp.float32) * sv,
                 jnp.imag(coef).astype(jnp.float32) * sv], axis=-1))
        q = jnp.stack(qrows)                          # (k, m, 2)
        ny, nx = u.shape[1], u.shape[2]
        tile = _pick_tile(ny, nx, m + len(specs) + 1, nplanes=P)
        if tile >= 8:
            return tuple(_combine_call(m, len(specs), P, ny, nx, tile,
                                       interpret)(q, *W))

    outs = []
    for t, func in specs:
        f = MATFUNCS[func] if isinstance(func, str) else func
        fvals = f(np.asarray(t), lam)
        # full-f32 matmul precision: see ops/krylov._HI
        coef = beta0 * jnp.matmul(Q, fvals * Q[0, :],
                                  precision=jax.lax.Precision.HIGHEST)
        # y = sum_i coef_i v_i = sum_i (coef_i s_i) W_i — one fused MAC pass.
        if P == 1:
            cr = jnp.real(coef).astype(jnp.float32)
            out = (cr[0] * svec[0]) * W[0][0]
            for i in range(1, m):
                out = out + (cr[i] * svec[i]) * W[i][0]
            outs.append(out[None])
            continue
        cr = jnp.real(coef).astype(jnp.float32)
        ci = jnp.imag(coef).astype(jnp.float32)
        a, b = cr[0] * svec[0], ci[0] * svec[0]
        y0 = a * W[0][0] - b * W[0][1]
        y1 = a * W[0][1] + b * W[0][0]
        for i in range(1, m):
            a, b = cr[i] * svec[i], ci[i] * svec[i]
            y0 = y0 + a * W[i][0] - b * W[i][1]
            y1 = y1 + a * W[i][1] + b * W[i][0]
        outs.append(jnp.stack([y0, y1]))
    return tuple(outs)
