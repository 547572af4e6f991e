"""Fully VMEM-resident fused SS2 step for 2D NLSE: ONE Pallas kernel.

The streaming kernels (lanczos2d.py) cut HBM traffic ~3x but still stream
the Krylov basis from HBM every projection (~0.7 GB/step at 1024^2, m=10).
On a v5e core with 128 MB VMEM the whole basis FITS on chip: this kernel
keeps every Krylov column in VMEM scratch and performs the complete SS2
step — first nonlinear half-kick, m-step Lanczos with full
reorthogonalization, exp(tau*T)e1, basis recombination, second half-kick,
Neumann ghost-ring copy — in a single pallas_call. HBM traffic per step is
just read u + read m(x) + write u' (~20 MB at 1024^2 vs ~700 MB streaming).

Replaces the tridiagonal eigendecomposition with an in-kernel Taylor series
for exp(tau*T)e1 (Mosaic cannot lower eigh): tau*T has purely imaginary
spectrum bounded by theta_max = dt * 8 * scale (the exact lambda_max of the
5-point no-flux Laplacian is < 8/h^2), which is STATIC, so the Taylor
degree is chosen at trace time for < 1e-8 truncation error and the kernel
is gated on theta_max <= 3.5 (production operating points are ~0.5-2).
Everything else matches the reference SS2 semantics
(nlse_cubic_solver.hpp:54-74, nlse_dev.hpp:187-203) and the streaming path
bit-for-bit up to f32 rounding (tests/test_resident.py).

Eligibility (`supported_resident`): 2D isotropic no-flux Laplacian
descriptor, complex64 state, lane-aligned grid, basis fits the VMEM budget,
theta_max small enough. Everything else falls back to lanczos2d/XLA.
"""


import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["supported_resident", "ss2_resident_step"]

_VMEM_CEILING = 112 * 2**20     # empirically probed on v5e (benchmarks)
_THETA_MAX = 3.5


def _taylor_degree(theta):
    """Smallest degree d with theta^(d+1)/(d+1)! < 1e-8 (exp(i*theta) has
    unit modulus, so truncation error is absolute ~= relative)."""
    err = theta
    d = 1
    while err > 1e-8 and d < 30:
        d += 1
        err = err * theta / (d + 1)
    return max(d, 4)


def supported_resident(desc, u_shape, dtype, m, dt):
    """Can the VMEM-resident kernel run this configuration?"""
    if desc is None or desc.get("kind") != "laplacian_2d":
        return False
    if desc.get("variant") not in ("reference", "clean"):
        return False
    if dtype != jnp.complex64:
        return False
    ny, nx = desc["ny"], desc["nx"]
    if tuple(u_shape) != (ny, nx) or nx % 128 != 0 or ny % 8 != 0:
        return False
    theta = abs(dt) * 8.0 * abs(desc["scale"] * desc["sign"])
    if theta > _THETA_MAX:
        return False
    col = 2 * ny * nx * 4
    # basis + in/out blocks + m-field + chunked stencil temps
    return (m + 4) * col + ny * nx * 4 <= _VMEM_CEILING


def _phase_mul(re, im, rho, half_dt):
    """(re, im) * exp(i * half_dt * rho) — the SS2 nonlinear kick."""
    c = jnp.cos(half_dt * rho)
    s = jnp.sin(half_dt * rho)
    return re * c - im * s, re * s + im * c


def _rho(kind, mfld, re, im, sigma1, sigma2, kappa):
    """Nonlinear density rho(u) (models/nonlinearities.nlse_density)."""
    a2 = re * re + im * im
    if kind == "cubic":
        return mfld * a2
    if kind == "cubic_quintic":
        return mfld * (sigma1 * a2 + sigma2 * a2 * a2)
    if kind == "saturable":
        return mfld * a2 / (1.0 + kappa * a2)
    raise ValueError(kind)


def ss2_resident_step(u, m_field, desc, dt, m, kind="cubic", sigma1=1.0,
                      sigma2=-0.1, kappa=1.0, apply_bc=True,
                      interpret=False):
    """One full SS2 step on a planar (2, ny, nx) float32 field.

    Equivalent to: u1 = e^{i dt/2 rho(u)} u; u2 = exp(i dt L) u1 (Lanczos
    m, full reorth); u3 = e^{i dt/2 rho(u2)} u2; Neumann ghost copy.
    """
    P, ny, nx = u.shape
    assert P == 2
    scale = desc["scale"] * desc["sign"]
    variant = desc["variant"]
    theta = abs(dt) * 8.0 * abs(scale)
    deg = _taylor_degree(theta)
    half_dt = np.float32(0.5 * dt)
    # stencil row-chunks keep concat temporaries ~1 MB
    chunk = ny
    for cand in (128, 64, 32, 16, 8):
        if ny % cand == 0:
            chunk = cand
            break
    nch = ny // chunk

    def stencil_rows(scr, j, r0, rows):
        """Laplacian rows [r0, r0+rows) of column j, all operands in VMEM."""
        v = scr[j, :, pl.ds(r0, rows), :]
        up = scr[j, :, pl.ds(max(r0 - 1, 0), 1), :]
        dn = scr[j, :, pl.ds(min(r0 + rows, ny - 1), 1), :]
        above = jnp.concatenate([up, v[:, :-1, :]], axis=1)
        below = jnp.concatenate([v[:, 1:, :], dn], axis=1)
        rid = lax.broadcasted_iota(jnp.int32, (1, rows, nx), 1) + r0
        cid = lax.broadcasted_iota(jnp.int32, (1, rows, nx), 2)
        top, bot = rid == 0, rid == ny - 1
        lft, rgt = cid == 0, cid == nx - 1
        above = jnp.where(top, 0.0, above)
        below = jnp.where(bot, 0.0, below)
        zc = jnp.zeros((2, rows, 1), jnp.float32)
        left = jnp.where(lft, 0.0,
                         jnp.concatenate([zc, v[:, :, :-1]], axis=2))
        right = jnp.where(rgt, 0.0,
                          jnp.concatenate([v[:, :, 1:], zc], axis=2))
        if variant == "reference":
            diag = jnp.where(top | bot | lft | rgt, -3.0, -4.0)
        else:
            diag = -(4.0 - top.astype(jnp.float32) - bot.astype(jnp.float32)
                     - lft.astype(jnp.float32) - rgt.astype(jnp.float32))
        return (above + below + left + right + diag * v) * scale

    def kernel(u_ref, m_ref, y_ref, scr):
        mfld = m_ref[...]
        re0, im0 = u_ref[0], u_ref[1]
        # --- first half-kick (|u| is phase-invariant: rho from raw u) ----
        rho = _rho(kind, mfld, re0, im0, sigma1, sigma2, kappa)
        re1, im1 = _phase_mul(re0, im0, rho, half_dt)
        scr[0, 0] = re1
        scr[0, 1] = im1

        # --- Lanczos, fully VMEM-resident --------------------------------
        b0sq = jnp.sum(re1 * re1) + jnp.sum(im1 * im1)
        beta0 = jnp.sqrt(b0sq)
        # safe inverse: zero columns contribute nothing instead of NaN
        # (mirrors ops/krylov._lanczos_cols.safe_div)
        def safe_inv(nrm):
            return jnp.where(nrm > 0, 1.0 / jnp.where(nrm > 0, nrm, 1), 0.0)
        svals = [safe_inv(beta0)]
        alphas, betas = [], []
        for j in range(m - 1):
            # w = s_j * L W_j - beta_{j-1} s_{j-1} W_{j-1}, chunked
            for cb in range(nch):
                av = stencil_rows(scr, j, cb * chunk, chunk)
                wchunk = svals[j] * av
                if j > 0:
                    bs = betas[j - 1] * svals[j - 1]
                    wchunk = wchunk - bs * scr[j - 1, :,
                                               pl.ds(cb * chunk, chunk), :]
                scr[j + 1, :, pl.ds(cb * chunk, chunk), :] = wchunk
            # full-reorth projections (CGS, matches lanczos2d/krylov)
            wre, wim = scr[j + 1, 0], scr[j + 1, 1]
            qs = []
            for i in range(j + 1):
                vr, vi = scr[i, 0], scr[i, 1]
                raw_re = jnp.sum(vr * wre) + jnp.sum(vi * wim)
                raw_im = jnp.sum(vr * wim) - jnp.sum(vi * wre)
                if i == j:
                    alphas.append(svals[j] * raw_re)
                si2 = svals[i] * svals[i]
                qs.append((si2 * raw_re, si2 * raw_im))
            accr, acci = wre, wim
            for i in range(j + 1):
                qr, qi = qs[i]
                vr, vi = scr[i, 0], scr[i, 1]
                accr = accr - (qr * vr - qi * vi)
                acci = acci - (qr * vi + qi * vr)
            scr[j + 1, 0] = accr
            scr[j + 1, 1] = acci
            nsq = jnp.sum(accr * accr) + jnp.sum(acci * acci)
            b = jnp.sqrt(nsq)
            betas.append(b)
            svals.append(safe_inv(b))
        alphas.append(jnp.float32(0.0))   # T(m-1, m-1) stays 0 (reference)

        # --- exp(i dt T) e1 via Taylor (tridiagonal matvecs on scalars) --
        tre = [jnp.float32(1.0)] + [jnp.float32(0.0)] * (m - 1)
        tim = [jnp.float32(0.0)] * m
        yre, yim = list(tre), list(tim)
        for k in range(1, deg + 1):
            nre = [jnp.float32(0.0)] * m
            nim = [jnp.float32(0.0)] * m
            for i in range(m):
                ar, ai = alphas[i] * tre[i], alphas[i] * tim[i]
                if i > 0:
                    ar += betas[i - 1] * tre[i - 1]
                    ai += betas[i - 1] * tim[i - 1]
                if i < m - 1:
                    ar += betas[i] * tre[i + 1]
                    ai += betas[i] * tim[i + 1]
                # multiply by (i * dt) / k
                f = np.float32(dt / k)
                nre[i] = -f * ai
                nim[i] = f * ar
            tre, tim = nre, nim
            yre = [a + b for a, b in zip(yre, tre)]
            yim = [a + b for a, b in zip(yim, tim)]

        # --- recombination: y = beta0 sum_i coef_i s_i W_i ---------------
        outr = jnp.zeros((ny, nx), jnp.float32)
        outi = jnp.zeros((ny, nx), jnp.float32)
        for i in range(m):
            cr = beta0 * svals[i] * yre[i]
            ci = beta0 * svals[i] * yim[i]
            vr, vi = scr[i, 0], scr[i, 1]
            outr = outr + cr * vr - ci * vi
            outi = outi + cr * vi + ci * vr

        # --- second half-kick --------------------------------------------
        rho2 = _rho(kind, mfld, outr, outi, sigma1, sigma2, kappa)
        outr, outi = _phase_mul(outr, outi, rho2, half_dt)

        # --- Neumann ghost-ring copy (ops/boundaries.neumann_no_velocity) -
        # full-row-then-column concats are net-equivalent to the reference's
        # interior-row-then-column .at[] order (corners end up u[1,1] etc.)
        if apply_bc:
            def bc(a):
                a = jnp.concatenate([a[1:2, :], a[1:, :]], axis=0)
                a = jnp.concatenate([a[:-1, :], a[-2:-1, :]], axis=0)
                a = jnp.concatenate([a[:, 1:2], a[:, 1:]], axis=1)
                a = jnp.concatenate([a[:, :-1], a[:, -2:-1]], axis=1)
                return a
            outr, outi = bc(outr), bc(outi)

        y_ref[0] = outr
        y_ref[1] = outi

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, ny, nx), jnp.float32),
        scratch_shapes=[pltpu.VMEM((m, 2, ny, nx), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min((m + 5) * 2 * ny * nx * 4 + 8 * 2**20,
                                 120 * 2**20)),
        interpret=interpret,
    )(u, m_field)
