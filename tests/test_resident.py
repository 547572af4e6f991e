"""VMEM-resident single-kernel SS2 step vs the reference SS2 composition."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nlsolvers_tpu import config
from nlsolvers_tpu.models import problems
from nlsolvers_tpu.ops import operators
from nlsolvers_tpu.ops.pallas import resident2d


@pytest.fixture
def interp_mode():
    old = config.pallas_mode
    old_res = config.resident_mode
    config.pallas_mode = "interpret"
    config.resident_mode = "auto"
    yield
    config.pallas_mode = old
    config.resident_mode = old_res


def _u0(n, seed=0):
    rng = np.random.default_rng(seed)
    x = np.linspace(-5, 5, n, dtype=np.float32)
    env = np.exp(-(x[:, None] ** 2 + x[None, :] ** 2) / 4)
    return (env * np.exp(0.3j * x[None, :])
            + 0.01 * rng.standard_normal((n, n))).astype(np.complex64)


@pytest.mark.parametrize("kind,params", [
    ("cubic", {}),
    ("cubic_quintic", dict(sigma1=1.0, sigma2=-0.08)),
    ("saturable", dict(kappa=0.7)),
])
def test_resident_matches_reference_ss2(kind, params, interp_mode):
    n, m, dt = 128, 8, 5e-4
    mf = (1.0 + 0.2 * np.sin(np.linspace(0, 3, n))[:, None]
          * np.ones((1, n))).astype(np.float32)
    prob = problems.nlse_problem(kind, (n, n), 5.0, dt, m_field=mf,
                                 krylov_m=m, dtype=jnp.complex64, **params)
    assert prob.meta["equation"] == f"nlse_{kind}"
    u0 = prob.init(_u0(n))
    got = jax.jit(prob.step)(u0, 1)

    config.pallas_mode = "off"
    prob_ref = problems.nlse_problem(kind, (n, n), 5.0, dt, m_field=mf,
                                     krylov_m=m, dtype=jnp.complex64,
                                     **params)
    ref = jax.jit(prob_ref.step)(u0, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-4, atol=3e-5)


def test_resident_multi_step_conservation(interp_mode):
    n, m, dt = 128, 8, 1e-3
    prob = problems.nlse_problem("cubic", (n, n), 5.0, dt,
                                 m_field=np.ones((n, n), np.float32),
                                 krylov_m=m, dtype=jnp.complex64)
    u = prob.init(_u0(n, 1))
    step = jax.jit(prob.step)
    m0 = float(jnp.sum(jnp.abs(u) ** 2))
    for i in range(20):
        u = step(u, i + 1)
    m1 = float(jnp.sum(jnp.abs(u) ** 2))
    assert abs(m1 - m0) / m0 < 1e-4
    assert np.isfinite(np.asarray(u)).all()


def test_resident_gating():
    lap = operators.laplacian_2d((128, 128), 0.1, 0.1, dtype=jnp.float32)
    d = lap._pallas_desc
    ok = resident2d.supported_resident(d, (128, 128), jnp.complex64, 10,
                                       1e-4)
    assert ok
    # theta too large (huge dt) -> fall back
    assert not resident2d.supported_resident(d, (128, 128), jnp.complex64,
                                             10, 1.0)
    # basis would blow VMEM -> fall back
    big = operators.laplacian_2d((4096, 4096), 0.1, 0.1)._pallas_desc
    assert not resident2d.supported_resident(big, (4096, 4096),
                                             jnp.complex64, 10, 1e-6)
    # real dtype -> fall back
    assert not resident2d.supported_resident(d, (128, 128), jnp.float32,
                                             10, 1e-4)


def test_taylor_degree_bounds():
    assert resident2d._taylor_degree(0.1) >= 4
    d = resident2d._taylor_degree(3.5)
    assert 10 <= d <= 30
    # truncation bound actually holds
    import math
    theta = 3.5
    err = theta ** (d + 1) / math.factorial(d + 1)
    assert err < 1e-7
