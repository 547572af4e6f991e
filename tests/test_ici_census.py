"""Machine-check of the ICI model's collective census (VERDICT r4 weak #5).

benchmarks/ici_model.py prices the sharded engine's per-iteration latency
from a census of the collectives the sharded Lanczos issues (4 ppermutes +
1 psum per iteration in 2D, 6 + 1 in 3D, plus one final psum per run).
These tests trace the ACTUAL sharded SS2 step on the 8-virtual-device CPU
mesh, count the `ppermute`/`psum` equations in its jaxpr, and assert exact
equality with the census — so a refactor of parallel/spatial.py or the
sharded kernel drivers that changes the collective count fails CI instead
of silently rotting the committed model numbers.
"""

import sys
from collections import Counter
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax._src import core as jcore
from jax.sharding import Mesh

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from benchmarks.ici_model import expected_step_collectives
from nlsolvers_tpu import config
from nlsolvers_tpu.parallel import spatial

M = 4  # small Krylov m keeps the trace fast; counts scale with m - 1


def count_collectives(closed_jaxpr):
    """Recursively count every primitive in a (closed) jaxpr, descending
    into pjit/shard_map/scan/cond sub-jaxprs carried in eqn params."""

    def walk(jaxpr, c):
        for eqn in jaxpr.eqns:
            c[eqn.primitive.name] += 1
            for v in eqn.params.values():
                vs = v if isinstance(v, (list, tuple)) else [v]
                for x in vs:
                    if isinstance(x, jcore.ClosedJaxpr):
                        walk(x.jaxpr, c)
                    elif isinstance(x, jcore.Jaxpr):
                        walk(x, c)
        return c

    return walk(closed_jaxpr.jaxpr, Counter())


def _census(step, *args):
    jaxpr = jax.make_jaxpr(lambda *a: step(*a))(*args)
    counts = count_collectives(jaxpr)
    return {k: counts.get(k, 0) for k in ("ppermute", "psum")}


@pytest.fixture(autouse=True)
def _interpret_mode():
    # the census describes the PRODUCTION sharded planar path (fused
    # kernels + deferred-norm CGS); on CPU that needs the interpreter
    old = config.pallas_mode
    config.pallas_mode = "interpret"
    yield
    config.pallas_mode = old


def test_census_2d_iso():
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("gy", "gx"))
    step = spatial.make_sharded_nlse_step(
        "cubic", (256, 512), 10.0, 1e-3, mesh, axis_names=("gy", "gx"),
        krylov_m=M, dtype=jnp.complex64, variant="clean")
    u0 = np.zeros((2, 256, 512), np.float32)
    mf = np.ones((256, 512), np.float32)
    assert _census(step, u0, mf) == expected_step_collectives(2, M)


def test_census_2d_aniso():
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("gy", "gx"))
    step = spatial.make_sharded_nlse_step(
        "cubic", (256, 512), 10.0, 1e-3, mesh, axis_names=("gy", "gx"),
        krylov_m=M, dtype=jnp.complex64, variant="clean", use_c=True)
    u0 = np.zeros((2, 256, 512), np.float32)
    mf = np.ones((256, 512), np.float32)
    cf = np.ones((256, 512), np.float32)
    assert _census(step, u0, mf, cf) == expected_step_collectives(
        2, M, aniso=True)


def test_census_3d_iso():
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 2, 2),
                ("gz", "gy", "gx"))
    step = spatial.make_sharded_nlse_step(
        "cubic", (16, 16, 256), 10.0, 1e-3, mesh,
        axis_names=("gz", "gy", "gx"), krylov_m=M, dtype=jnp.complex64,
        variant="clean")
    u0 = np.zeros((2, 16, 16, 256), np.float32)
    mf = np.ones((16, 16, 256), np.float32)
    assert _census(step, u0, mf) == expected_step_collectives(3, M)


def test_census_3d_aniso():
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 2, 2),
                ("gz", "gy", "gx"))
    step = spatial.make_sharded_nlse_step(
        "cubic", (16, 16, 256), 10.0, 1e-3, mesh,
        axis_names=("gz", "gy", "gx"), krylov_m=M, dtype=jnp.complex64,
        variant="clean", use_c=True)
    u0 = np.zeros((2, 16, 16, 256), np.float32)
    mf = np.ones((16, 16, 256), np.float32)
    cf = np.ones((16, 16, 256), np.float32)
    assert _census(step, u0, mf, cf) == expected_step_collectives(
        3, M, aniso=True)
