"""Lanczos matrix-function core: y = f(t·g(L)) u for matrix-free operators.

TPU-native replacement for the reference's Krylov pipeline
(host/include/eigen_krylov_real.hpp, eigen_krylov_complex.hpp;
device/include/lanczos.hpp, lanczos_complex.hpp, matfunc_real.hpp,
matfunc_complex.hpp). Differences by design:

* The operator is a matrix-free closure (stencil), not CSR SpMV.
* The whole Lanczos iteration lives inside one jitted `lax.fori_loop`; the
  m x m tridiagonal eigendecomposition runs on-device via `jnp.linalg.eigh`
  (m <= 20, trivial) — zero host round trips, unlike the reference device path
  which stages T entries through the host every iteration
  (lanczos_complex.hpp, pointer-mode-host dots; noted as its serialization
  bottleneck in SURVEY.md section 3.1).
* Full reorthogonalization is one fused pair of matvecs against the V block
  (projection + reconstruction), the batched analogue of the reference's
  two-Dgemv MGS (lanczos.hpp:208-267). Zero-initialized columns beyond the
  current iteration contribute nothing, so no masking is needed.
* For Hermitian operators the Rayleigh quotients are mathematically real; we
  store T as a real tridiagonal even in the complex case (the reference keeps
  complex storage whose imaginary parts are rounding noise).

Function-table parity (all applied to eigenvalues `lam` of T):
  exp            exp(t*lam),  t may be complex     (eigen_krylov_complex.hpp:54-83)
  sinc           sinc(t*lam)                       (eigen_krylov_complex.hpp:85-103)
  cos_sqrt       cos(t*sqrt(|lam|))                (eigen_krylov_real.hpp:57-87)
  sinc2_sqrt     sinc(t*sqrt(|lam|))^2             (eigen_krylov_real.hpp:89-123)
  id_sqrt        t*sqrt(|lam|)                     (eigen_krylov_real.hpp:125-152)
  sinc2_sqrt_half sinc(t/2*sqrt(|lam|))^2          (eigen_krylov_real.hpp:154-183)
  mod_cosine     (cos(th/2)^2 * sinc(th))^2, th=t*sqrt(|lam|)
                                                   (eigen_krylov_real.hpp:185-209)
The sqrt(|lam|) absolute values are reference semantics: its drivers pass +Delta
or -Delta inconsistently (e.g. sg_single_driver.cpp:93 vs kg_driver.cpp:92) and
rely on |lam| making the sign irrelevant. Reproduced verbatim.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from nlsolvers_tpu.config import default_krylov_m, real_dtype_of

__all__ = ["lanczos", "tridiag_eigh", "matfunc_apply", "matfunc_apply_multi",
           "expm_apply", "MATFUNCS"]

# TPU MXU matmuls default to bfloat16 inputs; for the Lanczos projections,
# the T eigendecomposition, and the coefficient solve that precision loss
# compounds into ~1e-2 energy drift per 50 Gautschi steps (measured: CPU f32
# drifts 1.6e-4, TPU f32 with default precision 1.65e-2 on the same run).
# Every dot/matmul in this module therefore pins HIGHEST (full f32) —
# these are bandwidth-bound GEMVs and 10x10 ops, so the cost is nil.
_HI = jax.lax.Precision.HIGHEST


def _sinc(x):
    """sin(x)/x with the reference's 1e-8 guard (eigen_krylov_real.hpp:93)."""
    safe = jnp.where(jnp.abs(x) < 1e-8, 1.0, x)
    return jnp.where(jnp.abs(x) < 1e-8, 1.0, jnp.sin(safe) / safe)


def _mod_cosine(theta):
    """Gautschi mod-cosine filter: cos(th/2)^2 * sinc(th), guarded at 1e-12."""
    safe = jnp.where(jnp.abs(theta) < 1e-12, 1.0, theta)
    val = jnp.cos(safe / 2.0) ** 2 * jnp.sin(safe) / safe
    return jnp.where(jnp.abs(theta) < 1e-12, 1.0, val)


def _phi1(x):
    """phi_1(x) = (exp(x) - 1)/x, -> 1 at 0 (guard mirrors _sinc's).

    Used by the Gautschi-NLSE drivers' first-order bootstrap
    (nlse_cubic_gautschi_solver.hpp phi1m_multiply: expm then a SparseLU
    solve of tau*L — here a single matrix function, same object)."""
    safe = jnp.where(jnp.abs(x) < 1e-8, 1.0, x)
    return jnp.where(jnp.abs(x) < 1e-8, 1.0, (jnp.exp(safe) - 1.0) / safe)


MATFUNCS = {
    "exp": lambda t, lam: jnp.exp(t * lam),
    "sinc": lambda t, lam: _sinc(t * lam),
    "phi1": lambda t, lam: _phi1(t * lam),
    "cos_sqrt": lambda t, lam: jnp.cos(t * jnp.sqrt(jnp.abs(lam))),
    "sinc2_sqrt": lambda t, lam: _sinc(t * jnp.sqrt(jnp.abs(lam))) ** 2,
    "id_sqrt": lambda t, lam: t * jnp.sqrt(jnp.abs(lam)),
    "sinc2_sqrt_half":
        lambda t, lam: _sinc(t / 2.0 * jnp.sqrt(jnp.abs(lam))) ** 2,
    "mod_cosine": lambda t, lam: _mod_cosine(t * jnp.sqrt(jnp.abs(lam))) ** 2,
}


def lanczos(matvec, u, m, reorth=True, axis_names=()):
    """m-step (Hermitian) Lanczos of a matrix-free operator.

    Args:
      matvec: closure applying the symmetric/Hermitian operator to a field.
      u: start field, any shape, real or complex dtype.
      m: Krylov dimension (static).
      reorth: full reorthogonalization against all previous basis vectors
        (the reference always does this: eigen_krylov_real.hpp:31-38).
      axis_names: mesh axis names the field is spatially sharded over (inside
        shard_map). All inner products / norms are psum-reduced across them,
        so the iteration runs on distributed grids — new capability vs the
        reference, whose operator is always a single-device CSR (SURVEY.md §5).

    Returns:
      V: (m,) + u.shape Krylov basis, alpha: (m,) real diagonal of T,
      beta: (m-1,) real off-diagonal of T, beta0: real norm of u.

    Matches the reference recurrence (eigen_krylov_real.hpp:8-55) including the
    absence of a breakdown early-exit (commented out there as well).
    """
    vs, alphas, betas, beta0 = _lanczos_cols(matvec, u, m, reorth=reorth,
                                             axis_names=axis_names)
    rdtype = real_dtype_of(u.dtype)
    V = jnp.stack(vs) if m > 1 else vs[0][None]
    # alpha[m-1] stays 0: the reference's loop never writes T(m-1, m-1) either
    # (zero-initialized, eigen_krylov_real.hpp:14,23-49), and f(T) sees that 0.
    zero = jnp.zeros((), rdtype) * beta0   # data-derived zero: stays
    # shard-varying inside shard_map over extra (e.g. batch) mesh axes.
    alpha = jnp.stack(alphas + [zero]) if alphas else jnp.zeros((m,), rdtype)
    beta = jnp.stack(betas) if betas else jnp.zeros((0,), rdtype)
    return V, alpha, beta, beta0


def _lanczos_cols(matvec, u, m, reorth=True, axis_names=()):
    """Lanczos keeping the basis as a list of columns (no (m, n) stack).

    Internal form used by matfunc_apply: the final linear combination is a
    fused multiply-add chain over the columns, so the basis never needs to be
    materialized as one contiguous array — at 1024^2, m=10 that saves a
    ~160 MB/step copy (benchmarks/ab_lanczos.py).
    """
    axis_names = tuple(axis_names)
    rdtype = real_dtype_of(u.dtype)

    def gsum(x):
        return lax.psum(x, axis_names) if axis_names else x

    def gnorm(x):
        s = gsum(jnp.sum(jnp.real(x) ** 2 + (jnp.imag(x) ** 2
                                             if jnp.iscomplexobj(x) else 0.0)))
        return jnp.sqrt(s).astype(rdtype)

    def vdot(a, b):
        return gsum(jnp.vdot(a.reshape(-1), b.reshape(-1), precision=_HI))

    # Safe normalization: a zero start vector (e.g. sEWI's B(u) with the
    # reference's default m = 0, nlse_cubic_driver.cpp:64) or an exact
    # mid-iteration breakdown yields ZERO columns instead of NaN. The
    # reference divides by the raw norm (eigen_krylov_complex.hpp:21,46 —
    # its launchers always supply a nonzero m, so it never trips); when the
    # norm is positive this is bit-identical to the raw division, and
    # matfunc_apply scales the final combination by beta0, so f(L)·0 = 0.
    def safe_div(x, nrm):
        return (x / jnp.where(nrm > 0, nrm, 1)).astype(u.dtype)

    beta0 = gnorm(u)
    v0 = safe_div(u, beta0)

    n = u.size

    # The iteration is UNROLLED over j (m <= 20 always): with a static j the
    # full-reorthogonalization projection touches only the j+1 columns that
    # exist so far, instead of a fixed (m, n) block where m-j-1 rows are
    # still zero. The basis lives as a python list of columns; the per-
    # iteration jnp.stack is a real copy, but A/B-measured on the v5e
    # (benchmarks/ab_lanczos.py) it beats both a preallocated (m, n) buffer
    # updated with .at[j].set (XLA copies the whole buffer per set: +1.4
    # GB/step at 1024^2 m=10) and per-column vdots (2.4x slower: one
    # reduction kernel per column).
    vs = [v0]
    alphas = []
    betas = []
    for j in range(m - 1):
        vj = vs[j]
        w = matvec(vj).astype(u.dtype)
        if j > 0:
            w = w - betas[j - 1] * vs[j - 1]
        if reorth:
            # One fused classical-Gram-Schmidt pass: a single (j+1, n)
            # projection matvec yields alpha (= last entry, the Rayleigh
            # quotient v_j . w) AND the full-reorthogonalization
            # coefficients, then one reconstruction matvec subtracts every
            # component. Numerically this is the reference's MGS alpha-step
            # + full reorth (lanczos.hpp:208-267) collapsed into two
            # bandwidth-optimal passes over the live basis; the Rayleigh
            # quotient is identical, the reorth correction agrees to
            # rounding (tests/test_krylov.py pins both).
            Vm = jnp.stack([v.reshape(n) for v in vs])      # (j+1, n)
            proj = gsum(jnp.matmul(jnp.conj(Vm), w.reshape(n),
                                   precision=_HI))          # (j+1,)
            a = jnp.real(proj[j]).astype(rdtype)
            w = w - jnp.matmul(proj, Vm, precision=_HI).reshape(u.shape)
        else:
            a = jnp.real(vdot(vj, w)).astype(rdtype)
            w = w - a * vj
        b = gnorm(w)
        vs.append(safe_div(w, b))
        alphas.append(a)
        betas.append(b)

    return vs, alphas, betas, beta0


def tridiag_eigh(alpha, beta):
    """Eigendecomposition of the real symmetric tridiagonal T(alpha, beta).

    Pinned to full-f32 matmul precision: eigh's internal QDWH/Jacobi matmuls
    at TPU default (bf16) precision corrupt the eigenvectors at ~1e-3, which
    dominates the whole matfunc's error budget (see _HI note above).
    """
    T = jnp.diag(alpha) + jnp.diag(beta, 1) + jnp.diag(beta, -1)
    with jax.default_matmul_precision("highest"):
        return jnp.linalg.eigh(T)


def matfunc_apply(matvec, u, t, func, m=default_krylov_m, reorth=True,
                  axis_names=()):
    """y = beta0 * V @ (Q f(t, D) Q^T e1) — the full reference matfunc apply.

    `func` is a key of MATFUNCS or a callable (t, lam) -> f values. `t` may be
    complex (for "exp" with tau = i*dt as in SS2). With `axis_names` the whole
    pipeline runs on spatially sharded fields: the tiny T eigh is computed
    redundantly per shard (it is replicated after the psums), which costs
    nothing and needs no extra communication.
    """
    return matfunc_apply_multi(matvec, u, ((t, func),), m=m, reorth=reorth,
                               axis_names=axis_names)[0]


def matfunc_apply_multi(matvec, u, specs, m=default_krylov_m, reorth=True,
                        axis_names=()):
    """[f1(t1 L) u, f2(t2 L) u, ...] from ONE Lanczos decomposition of u.

    `specs` is a sequence of (t, func) pairs. All outputs share the same
    Krylov basis V and tridiagonal T, so each result is BIT-IDENTICAL to a
    standalone matfunc_apply call with that spec — Lanczos is deterministic
    in u — while the expensive iteration (matvecs + reorthogonalization) runs
    once. The reference always re-runs Lanczos per matfunc even on the same
    vector (e.g. the Gautschi step's filter + cos pair, sg_single_solver.hpp:
    52-57 — 3 Lanczos runs where 2 suffice); this is the TPU build's structural
    win on every Gautschi-type stepper. Returns a tuple, one field per spec.
    """
    specs = tuple(specs)
    fused = _fused_pallas_path(matvec, u, specs, m, reorth, axis_names)
    if fused is not None:
        return fused
    vs, alphas, betas, beta0 = _lanczos_cols(matvec, u, m, reorth=reorth,
                                             axis_names=axis_names)
    rdtype = real_dtype_of(u.dtype)
    zero = jnp.zeros((), rdtype) * beta0   # data-derived, shard-varying
    alpha = jnp.stack(alphas + [zero]) if alphas else jnp.zeros((m,), rdtype)
    beta = jnp.stack(betas) if betas else jnp.zeros((0,), rdtype)
    lam, Q = tridiag_eigh(alpha, beta)
    outs = []
    for t, func in specs:
        f = MATFUNCS[func] if isinstance(func, str) else func
        fvals = f(np.asarray(t), lam)   # numpy scalar: safe jit constant
        # y = beta0 * V (Q f(D) Q^T e1); Q^T e1 is Q's first row. The tiny
        # m-vector algebra may promote to 64-bit (np scalar t under x64); the
        # field-sized result always stays in the state dtype — otherwise a
        # float32 scan carry silently becomes float64 mid-trajectory.
        coef = (beta0 * jnp.matmul(Q, fvals * Q[0, :],
                                   precision=_HI)).astype(u.dtype)
        # Fused multiply-add chain over the live columns: one HBM pass, no
        # contiguous (m, n) stack of the basis (see _lanczos_cols docstring).
        # Multiple specs re-walk the same columns; XLA fuses the chains into
        # one read of each v_i.
        out = coef[0] * vs[0]
        for i in range(1, m):
            out = out + coef[i] * vs[i]
        outs.append(out.astype(u.dtype))
    return tuple(outs)


def _fused_pallas_path(matvec, u, specs, m, reorth, axis_names):
    """Dispatch to the fused Pallas Lanczos kernels (ops/pallas/lanczos2d)
    when the operator carries a descriptor and the configuration allows it.
    Returns None when the pure-XLA path should run instead. The fused path
    always does full reorthogonalization, so reorth=False falls through."""
    from nlsolvers_tpu.config import pallas_dispatch

    desc = getattr(matvec, "_pallas_desc", None)
    if desc is None or not reorth or u.ndim not in (2, 3):
        return None
    kind = desc.get("kind")
    if axis_names:
        # sharded grids: only the shard* descriptors know how to ppermute
        # halos and psum the kernel reductions (ops/pallas/lanczos2d.py)
        if kind in ("shard2d", "shard2d_aniso"):
            if tuple(axis_names) != (desc["ay"], desc["ax"]):
                return None
        elif kind in ("shard3d", "shard3d_aniso"):
            if tuple(axis_names) != (desc["az"], desc["ay"], desc["ax"]):
                return None
            # kernels need the static local dims for the merged-row view
            desc = dict(desc, lnz=u.shape[0], lny=u.shape[1])
        else:
            return None
    elif kind in ("shard2d", "shard2d_aniso", "shard3d", "shard3d_aniso"):
        return None
    use, interpret = pallas_dispatch()
    if not use:
        return None
    from nlsolvers_tpu.ops.pallas.lanczos2d import (matfunc_apply_planar_multi,
                                                    supported_desc)
    if not supported_desc(desc, u.shape, u.dtype):
        return None
    # 3D fields run on the merged (nz*ny, nx) row view — the kernels handle
    # plane seams and z-offsets natively (ops/pallas/lanczos2d._stencil_3d).
    planar_shape = ((u.shape[0] * u.shape[1], u.shape[2]) if u.ndim == 3
                    else u.shape)
    if u.dtype == jnp.complex64:
        planar = jnp.stack([jnp.real(u).reshape(planar_shape),
                            jnp.imag(u).reshape(planar_shape)])
        outs = matfunc_apply_planar_multi(planar, desc, specs, m,
                                          interpret=interpret,
                                          axis_names=axis_names)
        return tuple(lax.complex(o[0], o[1]).reshape(u.shape).astype(u.dtype)
                     for o in outs)
    planar = u.reshape(planar_shape)[None].astype(jnp.float32)
    outs = matfunc_apply_planar_multi(planar, desc, specs, m,
                                      interpret=interpret,
                                      axis_names=axis_names)
    return tuple(o[0].reshape(u.shape).astype(u.dtype) for o in outs)


def expm_apply(matvec, u, t, m=default_krylov_m, reorth=True, axis_names=()):
    """exp(t L) u — reference `expm_multiply` (eigen_krylov_complex.hpp:54-83)."""
    return matfunc_apply(matvec, u, t, "exp", m=m, reorth=reorth,
                         axis_names=axis_names)
