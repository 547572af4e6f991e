"""Pipeline layer tests: field generators, phenomenon samplers, parameter
spaces, downsampling. Strategy: every registered generator/phenomenon must
produce finite arrays of the right shape/dtype for every registered variant
(the reference has no tests here at all; its implicit contract is 'launcher
never crashes and trajectories stay finite')."""

import numpy as np
import pytest

from nlsolvers_tpu.pipeline import downsample as ds
from nlsolvers_tpu.pipeline import fields, spaces
from nlsolvers_tpu.pipeline.grids import (Grid2D, Grid3D,
                                          gaussian_random_field,
                                          resolve_param_ranges)
from nlsolvers_tpu.pipeline.samplers import (NLSE3DSampler,
                                             NLSEPhenomenonSampler,
                                             RealWaveSampler,
                                             RealWaveSampler3d)
from nlsolvers_tpu.pipeline.samplers import nlse2d, nlse3d, realwave2d
from nlsolvers_tpu.pipeline.samplers import realwave3d

N = 48
L = 5.0
GRID2 = Grid2D(N, N, L)
GRID3 = Grid3D(16, 16, 16, 3.0)


def rng():
    return np.random.default_rng(1234)


# --------------------------------------------------------------------------
# fields
# --------------------------------------------------------------------------

@pytest.mark.parametrize("kind", sorted(fields.C_FIELD_TYPES))
def test_c_fields_2d(kind):
    f, params = fields.sample_c_field(GRID2, rng(), kind=kind)
    assert f.shape == (N, N)
    assert np.all(np.isfinite(f))
    assert params["type"] == kind


@pytest.mark.parametrize("kind", sorted(fields.M_FIELD_TYPES))
def test_m_fields_2d(kind):
    r = rng()
    c = fields.c_field("periodic", GRID2, r)
    f, params = fields.sample_m_field(GRID2, r, kind=kind, c=c)
    assert f.shape == (N, N)
    assert np.all(np.isfinite(f))


@pytest.mark.parametrize("kind", ["constant", "periodic", "piecewise_layers",
                                  "quasiperiodic", "turbulent"])
def test_c_fields_3d(kind):
    f, _ = fields.sample_c_field(GRID3, rng(), kind=kind)
    assert f.shape == (16, 16, 16)
    assert np.all(np.isfinite(f))


def test_m_field_floors():
    f, _ = fields.sample_m_field(GRID2, rng(), kind="defects")
    assert np.min(f) >= 0.1 - 1e-12


def test_fields_reproducible():
    f1, _ = fields.sample_c_field(GRID2, np.random.default_rng(7),
                                  kind="turbulent")
    f2, _ = fields.sample_c_field(GRID2, np.random.default_rng(7),
                                  kind="turbulent")
    np.testing.assert_array_equal(f1, f2)


# --------------------------------------------------------------------------
# GRF + param resolution
# --------------------------------------------------------------------------

def test_grf_normalization():
    g = gaussian_random_field(GRID2, rng(), length_scale=1.0, amplitude=2.5)
    assert g.shape == (N, N)
    np.testing.assert_allclose(np.std(g), 2.5, rtol=1e-10)


def test_resolve_param_ranges():
    r = rng()
    p = resolve_param_ranges(r, {"a": [1, 2, 3], "b": (0.0, 1.0),
                                 "c": (1, 5)}, fixed={"d": "x"})
    assert p["a"] in (1, 2, 3)
    assert 0.0 <= p["b"] <= 1.0
    assert p["c"] in range(1, 6) and isinstance(p["c"], int)
    assert p["d"] == "x"


# --------------------------------------------------------------------------
# NLSE 2D phenomena
# --------------------------------------------------------------------------

@pytest.mark.parametrize("phen", sorted(nlse2d.PHENOMENA))
def test_nlse2d_phenomena(phen):
    s = NLSEPhenomenonSampler(N, N, L, seed=0)
    u = s.generate_sample(phen)
    assert u.shape == (N, N)
    assert np.iscomplexobj(u)
    assert np.all(np.isfinite(u))


@pytest.mark.parametrize("system", nlse2d.SYSTEM_TYPES)
def test_nlse2d_soliton_systems(system):
    s = NLSEPhenomenonSampler(N, N, L, seed=0)
    u = s.generate_sample("fundamental_soliton", system_type=system)
    assert np.all(np.isfinite(u))
    assert np.max(np.abs(u)) > 0


def test_nlse2d_spaces_all_runnable():
    """Every curated parameter space draws a valid sample."""
    s = NLSEPhenomenonSampler(32, 32, L, seed=3)
    name_map = {"multi_soliton": "multi_soliton"}
    for phen, space in spaces.nlse_parameter_spaces().items():
        space = dict(space)
        space.pop("system_type", None)
        kwargs = resolve_param_ranges(s.rng, space)
        if kwargs.get("t_param", 0) is None:
            kwargs.pop("t_param")
        u = s.generate_sample(name_map.get(phen, phen), **kwargs)
        assert np.all(np.isfinite(u)), phen


def test_nlse2d_diverse_ensemble():
    s = NLSEPhenomenonSampler(32, 32, L, seed=5)
    samples = s.generate_diverse_ensemble(
        "fundamental_soliton", n_samples=4, max_attempts=50,
        parameter_ranges={"width": (0.5, 2.0), "amplitude": (0.5, 2.0),
                          "position": [(-2.0, 0.0), (0.0, 0.0),
                                       (2.0, 1.0), (-1.0, 2.0)]})
    assert len(samples) >= 2
    # normalized on acceptance
    for u in samples:
        np.testing.assert_allclose(np.max(np.abs(u)), 1.0, rtol=1e-12)


# --------------------------------------------------------------------------
# Real-wave 2D phenomena
# --------------------------------------------------------------------------

@pytest.mark.parametrize("phen", sorted(realwave2d.PHENOMENA))
def test_realwave2d_phenomena(phen):
    s = RealWaveSampler(N, N, L, seed=0)
    u, v = s.generate_sample(phenomenon_type=phen)
    assert u.shape == (N, N) and v.shape == (N, N)
    assert np.all(np.isfinite(u)) and np.all(np.isfinite(v))


@pytest.mark.parametrize("system", realwave2d.SYSTEM_TYPES)
@pytest.mark.parametrize("phen", ["kink_solution", "breather_solution",
                                  "ring_soliton"])
def test_realwave2d_systems(system, phen):
    s = RealWaveSampler(N, N, L, seed=0)
    u, v = s.generate_sample(system_type=system, phenomenon_type=phen)
    assert np.all(np.isfinite(u)) and np.all(np.isfinite(v))


def test_realwave2d_velocity_types():
    s = RealWaveSampler(N, N, L, seed=0)
    _, v_fit = s.generate_sample(phenomenon_type="kink_solution",
                                 velocity=(0.3, 0.0),
                                 velocity_type="fitting")
    _, v_zero = s.generate_sample(phenomenon_type="kink_solution",
                                  velocity=(0.3, 0.0), velocity_type="zero")
    _, v_grf = s.generate_sample(phenomenon_type="kink_solution",
                                 velocity_type="grf")
    assert np.max(np.abs(v_fit)) > 0
    assert np.all(v_zero == 0)
    assert np.max(np.abs(v_grf)) > 0


def test_realwave2d_spaces_all_runnable():
    s = RealWaveSampler(32, 32, L, seed=11)
    for phen, space in spaces.realwave_parameter_spaces(L).items():
        space = dict(space)
        system = "sine_gordon"
        if "system_type" in space:
            system = space.pop("system_type")[0]
        kwargs = resolve_param_ranges(s.rng, space)
        u, v = s.generate_sample(system_type=system, phenomenon_type=phen,
                                 **kwargs)
        assert np.all(np.isfinite(u)) and np.all(np.isfinite(v)), phen


def test_realwave2d_diverse_ensemble():
    s = RealWaveSampler(32, 32, L, seed=6)
    samples = s.generate_diverse_ensemble(
        phenomenon_type="kink_solution", n_samples=3, max_attempts=60,
        parameter_ranges={"width": (0.4, 2.5),
                          "orientation": (0.0, 6.28)})
    assert len(samples) >= 2
    assert all(isinstance(x, tuple) and len(x) == 2 for x in samples)


# --------------------------------------------------------------------------
# 3D samplers
# --------------------------------------------------------------------------

@pytest.mark.parametrize("phen", sorted(nlse3d.PHENOMENA))
def test_nlse3d_phenomena(phen):
    s = NLSE3DSampler(16, 16, 16, 3.0, seed=0)
    u = s.generate_sample(phen)
    assert u.shape == (16, 16, 16)
    assert np.all(np.isfinite(u))


def test_nlse3d_ic_normalized():
    s = NLSE3DSampler(16, 16, 16, 3.0, seed=0)
    u = s.generate_initial_condition(phenomenon_type="multi_soliton_state")
    np.testing.assert_allclose(np.max(np.abs(u)), 1.0, rtol=1e-12)


@pytest.mark.parametrize("phen", sorted(realwave3d.PHENOMENA))
def test_realwave3d_phenomena(phen):
    s = RealWaveSampler3d(16, 16, 16, 3.0, seed=0)
    u, v = s.generate_sample(phenomenon_type=phen)
    assert u.shape == (16, 16, 16)
    assert np.all(np.isfinite(u)) and np.all(np.isfinite(v))


def test_spaces_3d_runnable():
    s3 = NLSE3DSampler(12, 12, 12, 3.0, seed=2)
    for phen, space in spaces.nlse_parameter_spaces_3d().items():
        space = dict(space)
        space.pop("system_type", None)
        kwargs = resolve_param_ranges(s3.rng, space)
        u = s3.generate_sample(phen, **kwargs)
        assert np.all(np.isfinite(u)), phen
    r3 = RealWaveSampler3d(12, 12, 12, 3.0, seed=2)
    for phen, space in spaces.realwave_parameter_spaces_3d(3.0).items():
        space = dict(space)
        space.pop("system_type", None)
        kwargs = resolve_param_ranges(r3.rng, space)
        u, v = r3.generate_sample(phenomenon_type=phen, **kwargs)
        assert np.all(np.isfinite(u)) and np.all(np.isfinite(v)), phen


# --------------------------------------------------------------------------
# downsampling
# --------------------------------------------------------------------------

def test_downsample_fft_roundtrip_2d():
    """Band-limited data survives crop + pad exactly."""
    x = np.linspace(-np.pi, np.pi, 64, endpoint=False)
    u = np.stack([np.sin(3 * x[:, None] + 2 * x[None, :]),
                  np.cos(2 * x[:, None]) * np.ones_like(x)[None, :]])
    d = ds.downsample_fft(u, (32, 32))
    r = ds.reconstruct_fft(d, (64, 64))
    np.testing.assert_allclose(r, u, atol=1e-12)


def test_downsample_fft_complex():
    u = (np.random.default_rng(0).standard_normal((2, 32, 32))
         + 1j * np.random.default_rng(1).standard_normal((2, 32, 32)))
    d = ds.downsample_fft(u, (16, 16))
    assert d.shape == (2, 16, 16) and np.iscomplexobj(d)


def test_downsample_interpolation_2d():
    x = np.linspace(-L, L, 64)
    u = np.stack([np.exp(-(x[:, None] ** 2 + x[None, :] ** 2))] * 3)
    d = ds.downsample_interpolation(u, (32, 32), L)
    assert d.shape == (3, 32, 32)
    # smooth field: coarse grid still matches to interpolation error
    x32 = np.linspace(-L, L, 32)
    want = np.exp(-(x32[:, None] ** 2 + x32[None, :] ** 2))
    np.testing.assert_allclose(d[0], want, atol=2e-2)


def test_downsample_interpolation_3d():
    u = np.random.default_rng(0).standard_normal((2, 16, 16, 16))
    d = ds.downsample_interpolation(u, (8, 8, 8), 3.0)
    assert d.shape == (2, 8, 8, 8)
    r = ds.reconstruct_interpolation(d, (16, 16, 16), 3.0)
    assert r.shape == (2, 16, 16, 16)


def test_downsample_trajectory_dispatch():
    u = (np.random.default_rng(0).standard_normal((2, 32, 32))
         + 1j * np.random.default_rng(1).standard_normal((2, 32, 32)))
    d = ds.downsample_trajectory(u, (16, 16), L)
    assert d.shape == (2, 16, 16) and np.iscomplexobj(d)
    same = ds.downsample_trajectory(u, (32, 32), L)
    assert same is u
