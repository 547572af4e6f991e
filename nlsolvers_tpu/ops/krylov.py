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

__all__ = ["lanczos", "tridiag_eigh", "matfunc_apply", "expm_apply", "MATFUNCS"]


def _sinc(x):
    """sin(x)/x with the reference's 1e-8 guard (eigen_krylov_real.hpp:93)."""
    safe = jnp.where(jnp.abs(x) < 1e-8, 1.0, x)
    return jnp.where(jnp.abs(x) < 1e-8, 1.0, jnp.sin(safe) / safe)


def _mod_cosine(theta):
    """Gautschi mod-cosine filter: cos(th/2)^2 * sinc(th), guarded at 1e-12."""
    safe = jnp.where(jnp.abs(theta) < 1e-12, 1.0, theta)
    val = jnp.cos(safe / 2.0) ** 2 * jnp.sin(safe) / safe
    return jnp.where(jnp.abs(theta) < 1e-12, 1.0, val)


MATFUNCS = {
    "exp": lambda t, lam: jnp.exp(t * lam),
    "sinc": lambda t, lam: _sinc(t * lam),
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
    axis_names = tuple(axis_names)
    rdtype = real_dtype_of(u.dtype)

    def gsum(x):
        return lax.psum(x, axis_names) if axis_names else x

    def gnorm(x):
        s = gsum(jnp.sum(jnp.real(x) ** 2 + (jnp.imag(x) ** 2
                                             if jnp.iscomplexobj(x) else 0.0)))
        return jnp.sqrt(s).astype(rdtype)

    def vdot(a, b):
        return gsum(jnp.vdot(a.reshape(-1), b.reshape(-1)))

    beta0 = gnorm(u)
    v0 = (u / beta0).astype(u.dtype)

    n = u.size

    # The iteration is UNROLLED over j (m <= 20 always): with a static j the
    # full-reorthogonalization projection touches only the j+1 columns that
    # exist so far, instead of a fixed (m, n) block where m-j-1 rows are
    # still zero. That halves reorth HBM traffic — the dominant cost of the
    # whole solver (SURVEY.md section 3.1's hot loop) — relative to the
    # lax.fori_loop formulation, and lets XLA fuse per-iteration chains.
    vs = [v0]
    alphas = []
    betas = []
    w = None
    for j in range(m - 1):
        vj = vs[j]
        w = matvec(vj)
        if j > 0:
            w = w - betas[j - 1] * vs[j - 1]
        a = jnp.real(vdot(vj, w)).astype(rdtype)
        w = w - a * vj
        if reorth:
            # Full Gram-Schmidt against the live columns in two fused
            # matvecs (projection + reconstruction), the batched analogue of
            # the reference's two-Dgemv MGS (lanczos.hpp:208-267).
            Vm = jnp.stack([v.reshape(n) for v in vs])      # (j+1, n)
            proj = gsum(jnp.conj(Vm) @ w.reshape(n))        # (j+1,)
            w = w - (proj @ Vm).reshape(u.shape)
        b = gnorm(w)
        vs.append((w / b).astype(u.dtype))
        alphas.append(a)
        betas.append(b)

    V = jnp.stack(vs) if m > 1 else v0[None]
    # alpha[m-1] stays 0: the reference's loop never writes T(m-1, m-1) either
    # (zero-initialized, eigen_krylov_real.hpp:14,23-49), and f(T) sees that 0.
    zero = jnp.zeros((), rdtype) * beta0   # data-derived zero: stays
    # shard-varying inside shard_map over extra (e.g. batch) mesh axes.
    alpha = jnp.stack(alphas + [zero]) if alphas else jnp.zeros((m,), rdtype)
    beta = jnp.stack(betas) if betas else jnp.zeros((0,), rdtype)
    return V, alpha, beta, beta0


def tridiag_eigh(alpha, beta):
    """Eigendecomposition of the real symmetric tridiagonal T(alpha, beta)."""
    T = jnp.diag(alpha) + jnp.diag(beta, 1) + jnp.diag(beta, -1)
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
    V, alpha, beta, beta0 = lanczos(matvec, u, m, reorth=reorth,
                                    axis_names=axis_names)
    lam, Q = tridiag_eigh(alpha, beta)
    f = MATFUNCS[func] if isinstance(func, str) else func
    fvals = f(np.asarray(t), lam)   # numpy scalar: safe jit constant
    # y = beta0 * V (Q f(D) Q^T e1); Q^T e1 is Q's first row. The tiny
    # m-vector algebra may promote to 64-bit (np scalar t under x64); the
    # field-sized result always stays in the state dtype — otherwise a
    # float32 scan carry silently becomes float64 mid-trajectory.
    coef = beta0 * (Q @ (fvals * Q[0, :]))
    out = jnp.tensordot(coef, V.reshape(m, -1), axes=1)
    return out.reshape(u.shape).astype(u.dtype)


def expm_apply(matvec, u, t, m=default_krylov_m, reorth=True, axis_names=()):
    """exp(t L) u — reference `expm_multiply` (eigen_krylov_complex.hpp:54-83)."""
    return matfunc_apply(matvec, u, t, "exp", m=m, reorth=reorth,
                         axis_names=axis_names)
