"""Operator parity tests: matrix-free stencils vs the reference's CSR matrices.

Mirrors the reference's own verification style (device/test_spmv.cpp: build the
same operator two ways, compare the applied result on random vectors).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nlsolvers_tpu.ops import operators as ops
import reference_ops as ref

RNG = np.random.default_rng(0)


def rand_field(shape, complex_=False):
    x = RNG.standard_normal(shape)
    if complex_:
        x = x + 1j * RNG.standard_normal(shape)
    return x


@pytest.mark.parametrize("n_interior", [6, 13])
@pytest.mark.parametrize("complex_", [False, True])
def test_laplacian_2d_reference(n_interior, complex_):
    dx = dy = 0.37
    nf = n_interior + 2
    L = ref.build_laplacian_noflux(n_interior, n_interior, dx, dy)
    u = rand_field((nf, nf), complex_)
    want = (L @ u.reshape(-1)).reshape(nf, nf)
    apply = ops.laplacian_2d((nf, nf), dx, dy, dtype=jnp.float64)
    got = apply(jnp.asarray(u))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12, atol=1e-12)


def test_laplacian_2d_batched():
    dx = dy = 0.2
    nf = 9
    apply = ops.laplacian_2d((nf, nf), dx, dy, dtype=jnp.float64)
    u = rand_field((4, nf, nf))
    got = apply(jnp.asarray(u))
    for b in range(4):
        np.testing.assert_allclose(np.asarray(got[b]),
                                   np.asarray(apply(jnp.asarray(u[b]))))


def test_laplacian_2d_clean_row_sums():
    # clean variant must have zero row sums (exact no-flux conservation)
    nf = 8
    apply = ops.laplacian_2d((nf, nf), 0.1, 0.1, variant="clean",
                             dtype=jnp.float64)
    ones = jnp.ones((nf, nf), jnp.float64)
    np.testing.assert_allclose(np.asarray(apply(ones)), 0.0, atol=1e-12)


@pytest.mark.parametrize("n_interior", [4, 7])
def test_laplacian_3d_reference(n_interior):
    dx = 0.21
    nf = n_interior + 2
    L = ref.build_laplacian_noflux_3d(n_interior, n_interior, n_interior, dx)
    u = rand_field((nf, nf, nf))
    want = (L @ u.reshape(-1)).reshape(nf, nf, nf)
    apply = ops.laplacian_3d((nf, nf, nf), dx, dtype=jnp.float64)
    got = apply(jnp.asarray(u))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("n_interior", [5, 10])
def test_anisotropic_laplacian_2d_reference(n_interior):
    dx = dy = 0.15
    nf = n_interior + 2
    c = RNG.uniform(0.5, 2.0, nf * nf)
    L = ref.build_anisotropic_laplacian_noflux(n_interior, n_interior, dx, dy, c)
    u = rand_field((nf, nf))
    want = (L @ u.reshape(-1)).reshape(nf, nf)
    apply = ops.anisotropic_laplacian_2d(jnp.asarray(c.reshape(nf, nf)), dx, dy)
    got = apply(jnp.asarray(u))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12, atol=1e-12)


def test_anisotropic_laplacian_3d_reference():
    n_interior, dx = 4, 0.3
    nf = n_interior + 2
    c = RNG.uniform(0.5, 2.0, nf**3)
    L = ref.build_anisotropic_laplacian_noflux_3d(n_interior, dx, c)
    u = rand_field((nf, nf, nf))
    want = (L @ u.reshape(-1)).reshape(nf, nf, nf)
    apply = ops.anisotropic_laplacian_3d(jnp.asarray(c.reshape(nf, nf, nf)), dx)
    got = apply(jnp.asarray(u))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12, atol=1e-12)


def test_separated_laplacian_reference():
    n_interior, dx = 6, 0.11
    nf = n_interior + 2
    Lx, Ly = ref.build_separated_laplacian_noflux(n_interior, dx, dx)
    u = rand_field((nf, nf))
    ax, ay = ops.separated_laplacian_2d((nf, nf), dx, dx, dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(ax(jnp.asarray(u))),
                               (Lx @ u.reshape(-1)).reshape(nf, nf),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ay(jnp.asarray(u))),
                               (Ly @ u.reshape(-1)).reshape(nf, nf),
                               rtol=1e-12, atol=1e-12)


def test_biharmonic_reference():
    n_interior, dx = 8, 0.17
    nf = n_interior + 2
    L4 = ref.build_xxxx_noflux(n_interior, dx)
    u = rand_field((nf, nf))
    apply = ops.biharmonic_x((nf, nf), dx, dtype=jnp.float64)
    got = apply(jnp.asarray(u))
    want = (L4 @ u.reshape(-1)).reshape(nf, nf)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-11, atol=1e-11)


def test_boundaries_2d():
    from nlsolvers_tpu.ops import boundaries as bc
    nf = 7
    u = jnp.asarray(rand_field((nf, nf)))
    v = jnp.asarray(rand_field((nf, nf)))
    # numpy port from boundaries.hpp:14-24 docstring
    un = np.asarray(u).copy()
    un[0, 1:-1] = un[1, 1:-1]
    un[-1, 1:-1] = un[-2, 1:-1]
    un[:, 0] = un[:, 1]
    un[:, -1] = un[:, -2]
    np.testing.assert_allclose(np.asarray(bc.neumann_no_velocity_2d(u)), un)
    u2, v2 = bc.neumann_2d(u, v)
    vn = np.asarray(v).copy()
    vn[0, 1:-1] = 0
    vn[-1, 1:-1] = 0
    vn[1:-1, 0] = 0
    vn[1:-1, -1] = 0
    np.testing.assert_allclose(np.asarray(v2), vn)


def test_boundaries_3d():
    from nlsolvers_tpu.ops import boundaries as bc
    nf = 6
    u = jnp.asarray(rand_field((nf, nf, nf)))
    un = np.asarray(u).copy()
    # boundaries_3d.hpp order: x faces (interior y,z), y faces (interior z),
    # z faces (all). Index order in our arrays: (z, y, x).
    un[1:-1, 1:-1, 0] = un[1:-1, 1:-1, 1]
    un[1:-1, 1:-1, -1] = un[1:-1, 1:-1, -2]
    un[1:-1, 0, :] = un[1:-1, 1, :]
    un[1:-1, -1, :] = un[1:-1, -2, :]
    un[0, :, :] = un[1, :, :]
    un[-1, :, :] = un[-2, :, :]
    np.testing.assert_allclose(np.asarray(bc.neumann_no_velocity_3d(u)), un)
