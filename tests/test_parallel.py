"""Multi-device tests on the 8-virtual-CPU-device mesh: spatial domain
decomposition must be bit-compatible with the single-device path, and batch
sharding must reproduce per-trajectory runs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nlsolvers_tpu.models import problems
from nlsolvers_tpu.parallel import batch as pbatch
from nlsolvers_tpu.parallel import mesh as pmesh
from nlsolvers_tpu.parallel import spatial

RNG = np.random.default_rng(11)
N = 32
LX = 4.0
DT = 2e-3


def need_devices(k):
    if len(jax.devices()) < k:
        pytest.skip(f"needs {k} devices")


def test_factor_devices():
    assert pmesh.factor_devices(8, 3) == (2, 2, 2)
    assert pmesh.factor_devices(4, 3) == (2, 2, 1)
    assert pmesh.factor_devices(1, 3) == (1, 1, 1)
    assert np.prod(pmesh.factor_devices(6, 3)) == 6


def test_sharded_nlse_step_matches_single_device():
    need_devices(4)
    mesh = pmesh.make_mesh(("gy", "gx"), shape=(2, 2),
                           devices=jax.devices()[:4])
    m = RNG.uniform(0.5, 1.5, (N, N))
    env = np.exp(-(np.linspace(-1, 1, N)[:, None] ** 2
                   + np.linspace(-1, 1, N)[None, :] ** 2))
    u0 = (env * np.exp(1j * env)).astype(np.complex128)

    prob = problems.nlse_problem("cubic", (N, N), LX, DT, m_field=m,
                                 krylov_m=8, dtype=jnp.complex128)
    ref_state = prob.init(u0)
    for i in range(3):
        ref_state = prob.step(ref_state, i + 1)

    step = spatial.make_sharded_nlse_step(
        "cubic", (N, N), LX, DT, mesh, axis_names=("gy", "gx"),
        krylov_m=8, dtype=jnp.complex128)
    up = jnp.stack([jnp.real(jnp.asarray(u0)), jnp.imag(jnp.asarray(u0))])
    mj = jnp.asarray(m)
    for _ in range(3):
        up = step(up, mj)
    got = np.asarray(up[0]) + 1j * np.asarray(up[1])
    np.testing.assert_allclose(got, np.asarray(ref_state), rtol=1e-10,
                               atol=1e-12)


@pytest.mark.parametrize("integrator", ["gautschi", "sv"])
def test_sharded_realwave_step_matches_single_device(integrator):
    need_devices(4)
    mesh = pmesh.make_mesh(("gy", "gx"), shape=(2, 2),
                           devices=jax.devices()[:4])
    m = RNG.uniform(0.5, 1.5, (N, N))
    u0 = 0.4 * RNG.standard_normal((N, N))
    v0 = 0.1 * RNG.standard_normal((N, N))

    prob = problems.realwave_problem("sine_gordon", (N, N), LX, DT,
                                     m_field=m, integrator=integrator,
                                     krylov_m=8, dtype=jnp.float64)
    ref_state = prob.init(u0, v0)
    for i in range(3):
        ref_state = prob.step(ref_state, i + 1)

    step = spatial.make_sharded_realwave_step(
        "sine_gordon", (N, N), LX, DT, mesh, axis_names=("gy", "gx"),
        integrator=integrator, krylov_m=8, dtype=jnp.float64)
    u = jnp.asarray(u0)
    u_past = jnp.asarray(u0 - DT * v0)
    mj = jnp.asarray(m)
    for _ in range(3):
        u, u_past = step(u, u_past, mj)
    np.testing.assert_allclose(np.asarray(u), np.asarray(ref_state[0]),
                               rtol=1e-10, atol=1e-12)


def test_sharded_with_batch_axis():
    need_devices(8)
    mesh = pmesh.make_mesh(("batch", "gy", "gx"), shape=(2, 2, 2))
    B = 4
    m = RNG.uniform(0.5, 1.5, (B, N, N))
    u0 = (RNG.standard_normal((B, N, N))
          + 1j * RNG.standard_normal((B, N, N))) * 0.1

    step = spatial.make_sharded_nlse_step(
        "cubic", (N, N), LX, DT, mesh, axis_names=("gy", "gx"),
        batch_axis="batch", krylov_m=6, dtype=jnp.complex128)
    up = jnp.stack([jnp.asarray(u0.real), jnp.asarray(u0.imag)])
    up = step(up, jnp.asarray(m))

    # per-sample single-device reference
    for b in range(B):
        prob = problems.nlse_problem("cubic", (N, N), LX, DT, m_field=m[b],
                                     krylov_m=6, dtype=jnp.complex128)
        want = prob.step(prob.init(u0[b]), 1)
        got = np.asarray(up[0, b]) + 1j * np.asarray(up[1, b])
        np.testing.assert_allclose(got, np.asarray(want), rtol=1e-10,
                                   atol=1e-12)


def test_batched_evolve_matches_sequential():
    need_devices(2)
    mesh = pmesh.make_mesh(("batch",), shape=(2,),
                           devices=jax.devices()[:2])
    B = 4
    m = np.ones((N, N))
    u0 = (RNG.standard_normal((B, N, N))
          + 1j * RNG.standard_normal((B, N, N))) * 0.1
    prob = problems.nlse_problem("cubic", (N, N), LX, DT, m_field=m,
                                 krylov_m=6, dtype=jnp.complex128)
    states0 = jax.vmap(prob.init)(jnp.asarray(u0))
    snaps = pbatch.batched_evolve(prob, states0, num_snapshots=3,
                                  snapshot_freq=2, mesh=mesh)
    assert snaps.shape == (B, 3, N, N)
    for b in range(2):
        st = prob.init(u0[b])
        for i in range(4):
            st = prob.step(st, i + 1)
        np.testing.assert_allclose(np.asarray(snaps[b, 2]), np.asarray(st),
                                   rtol=1e-9, atol=1e-12)
