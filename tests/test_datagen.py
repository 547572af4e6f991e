"""Datagen stack: batched engine parity, HDF5 schema, launcher + CLI e2e.

The engine must reproduce the single-trajectory Problem path exactly (same
steppers, fields now traced arguments), and archives must follow the
reference HDF5 layout (complex_launcher_2d.py:196-240) so reference
post-processing reads them unchanged.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nlsolvers_tpu.models import problems
from nlsolvers_tpu.pipeline import io_hdf5
from nlsolvers_tpu.pipeline.datagen import Datagen, DatagenConfig
from nlsolvers_tpu.pipeline.engine import (make_nlse_trajectory_fn,
                                           make_realwave_trajectory_fn)

N, LX, DT = 32, 5.0, 1e-3
SNAPS, FREQ = 4, 5


def _rng_fields(b, seed=0):
    rng = np.random.default_rng(seed)
    m = 1.0 + 0.1 * rng.standard_normal((b, N, N))
    c = 1.0 + 0.1 * rng.standard_normal((b, N, N))
    return m.astype(np.float64), c.astype(np.float64)


def _gauss_ic(b, complex_=True, seed=1):
    rng = np.random.default_rng(seed)
    x = np.linspace(-LX, LX, N)
    out = []
    for i in range(b):
        env = np.exp(-(x[:, None] ** 2 + x[None, :] ** 2)
                     / (2.0 + 0.5 * i))
        if complex_:
            out.append(env * np.exp(1j * 0.3 * i * x[None, :]))
        else:
            out.append(env)
    return np.stack(out)


@pytest.mark.parametrize("integrator", ["ss2", "sewi"])
def test_engine_nlse_matches_problem(integrator):
    """Batched traced-field engine == per-sample Problem evolution."""
    B = 2
    m, c = _rng_fields(B)
    u0 = _gauss_ic(B)
    traj_fn = make_nlse_trajectory_fn(
        "cubic", (N, N), LX, DT, integrator=integrator, krylov_m=6,
        dtype=jnp.complex128)
    packed = np.stack([u0.real, u0.imag], axis=1)
    out = np.asarray(traj_fn(packed, m, c, SNAPS, FREQ))
    batched = out[:, :, 0] + 1j * out[:, :, 1]

    for b in range(B):
        prob = problems.nlse_problem(
            "cubic", (N, N), LX, DT, m_field=m[b], c_field=c[b],
            integrator=integrator, krylov_m=6, dtype=jnp.complex128)
        ref = np.asarray(problems.run(prob, prob.init(u0[b]), SNAPS, FREQ))
        np.testing.assert_allclose(batched[b], ref, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("integrator", ["gautschi", "sv"])
def test_engine_realwave_matches_problem(integrator):
    B = 2
    m, c = _rng_fields(B, seed=2)
    u0 = _gauss_ic(B, complex_=False)
    v0 = 0.1 * _gauss_ic(B, complex_=False, seed=3)
    traj_fn = make_realwave_trajectory_fn(
        "sine_gordon", (N, N), LX, DT, integrator=integrator, krylov_m=6,
        dtype=jnp.float64)
    u_t, v_t = traj_fn(u0, v0, m, c, SNAPS, FREQ)
    u_t, v_t = np.asarray(u_t), np.asarray(v_t)

    for b in range(B):
        prob = problems.realwave_problem(
            "sine_gordon", (N, N), LX, DT, m_field=m[b], c_field=c[b],
            integrator=integrator, krylov_m=6, dtype=jnp.float64)
        ref_u, ref_v = problems.run(prob, prob.init(u0[b], v0[b]),
                                    SNAPS, FREQ)
        np.testing.assert_allclose(u_t[b], np.asarray(ref_u),
                                   rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(v_t[b], np.asarray(ref_v),
                                   rtol=1e-8, atol=1e-10)


def test_engine_stochastic_reproducible():
    B = 2
    m, _ = _rng_fields(B, seed=4)
    u0 = _gauss_ic(B, complex_=False)
    v0 = np.zeros_like(u0)
    fn = make_realwave_trajectory_fn(
        "stochastic_phi4", (N, N), LX, DT, noise_strength=0.1, seed=7,
        dtype=jnp.float64, use_c=False)
    u1, _ = fn(u0, v0, m, None, SNAPS, FREQ)
    u2, _ = fn(u0, v0, m, None, SNAPS, FREQ)
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))
    # per-sample noise must differ (fold_in over the batch index)
    assert not np.allclose(np.asarray(u1)[0], np.asarray(u1)[1])


def test_hdf5_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    u = rng.standard_normal((SNAPS, N, N)) + 1j * rng.standard_normal(
        (SNAPS, N, N))
    path = io_hdf5.save_run(
        tmp_path / "run.h5", problem_type="cubic", run_id="abc",
        run_index=3, phenomenon="multi_soliton",
        phenomenon_params={"coherence": 0.5}, shape=(N, N),
        extents=(LX, LX), T=1.0, nt=100, num_snapshots=SNAPS,
        u0=u[0], u=u, m=np.ones((N, N)), c=np.ones((N, N)),
        m_type="constant", elapsed_time=1.25)
    out = io_hdf5.load_run(path)
    assert out["metadata"]["problem_type"] == "cubic"
    assert out["metadata"]["phenomenon_coherence"] == "0.5"
    assert out["grid"]["nx"] == N and out["grid"]["Lx"] == LX
    assert out["time"]["nt"] == 100
    np.testing.assert_array_equal(out["u"], u)
    np.testing.assert_array_equal(out["u0"], u[0])
    assert out["X"].shape == (N, N)


def test_datagen_nlse_end_to_end(tmp_path):
    cfg = DatagenConfig(
        family="nlse", phenomenon="multi_soliton", system="cubic",
        nx=N, Lx=LX, T=0.01, nt=10, snapshots=3, num_runs=2, batch_size=2,
        anisotropy_type="periodic_structure", m_type="piecewise",
        krylov_m=6, seed=11, output_dir=str(tmp_path))
    paths = Datagen(cfg).run()
    assert len(paths) == 2
    out = io_hdf5.load_run(paths[0])
    assert out["u"].shape == (3, N, N)
    assert np.iscomplexobj(out["u"])
    assert np.isfinite(out["u"]).all()
    # snapshot 0 is the (normalized) IC
    np.testing.assert_allclose(np.abs(out["u"][0]).max(), 1.0, rtol=1e-6)
    assert out["metadata"]["problem_type"] == "cubic"
    assert (tmp_path / f"params_{out['metadata']['run_id']}.txt").exists()


def test_datagen_resume(tmp_path):
    """Sweep resume: a relaunch skips fully-archived batches, re-evolves
    batches with missing runs, and produces byte-identical trajectories to
    an uninterrupted sweep (the sampler RNG stream stays aligned because
    skipped batches still consume their draws)."""
    mk = lambda: DatagenConfig(
        family="nlse", phenomenon="multi_soliton", system="cubic",
        nx=N, Lx=LX, T=0.01, nt=10, snapshots=3, num_runs=4, batch_size=2,
        krylov_m=6, seed=77, output_dir=str(tmp_path), resume=True)
    paths = Datagen(mk()).run()
    assert len(paths) == 4
    ref = {p.name: io_hdf5.load_run(p)["u"] for p in paths}

    # simulate a crash that lost the second batch (runs 2, 3)
    paths[2].unlink()
    kept_mtime = paths[0].stat().st_mtime_ns
    new_paths = Datagen(mk()).run()
    # only the damaged batch re-evolved and re-archived
    assert sorted(p.name for p in new_paths) == [paths[2].name,
                                                 paths[3].name]
    assert paths[0].stat().st_mtime_ns == kept_mtime  # untouched
    for p in paths:
        np.testing.assert_array_equal(io_hdf5.load_run(p)["u"],
                                      ref[p.name])

    # a third launch with everything present evolves nothing
    assert Datagen(mk()).run() == []


def test_datagen_realwave_end_to_end(tmp_path):
    cfg = DatagenConfig(
        family="realwave", phenomenon="kink_field", system="sine_gordon",
        nx=N, Lx=LX, T=0.01, nt=10, snapshots=3, num_runs=1,
        krylov_m=6, seed=5, output_dir=str(tmp_path), dr_target=16)
    paths = Datagen(cfg).run()
    out = io_hdf5.load_run(paths[0])
    assert out["u"].shape == (3, 16, 16)      # downsampled
    assert out["v"].shape == (3, 16, 16)
    assert out["u0"].shape == (N, N)          # IC kept at full resolution
    assert np.isfinite(out["v"]).all()


def test_cli_smoke(tmp_path):
    from nlsolvers_tpu.pipeline.__main__ import main
    rc = main(["nlse", "--phenomenon", "multi_soliton", "--nx", str(N),
               "--T", "0.01", "--nt", "10", "--snapshots", "2",
               "--num-runs", "1", "--krylov-m", "6",
               "--output-dir", str(tmp_path)])
    assert rc == 0
    assert len(list((tmp_path / "hdf5").glob("*.h5"))) == 1


def test_datagen_sharded_batch(tmp_path):
    """Batch axis sharded over an 8-device CPU mesh; pad path exercised by
    num_runs not divisible by the mesh size."""
    import jax
    from nlsolvers_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(("batch",), shape=(8,), devices=jax.devices()[:8])
    cfg = DatagenConfig(
        family="nlse", phenomenon="multi_soliton", system="cubic",
        nx=N, Lx=LX, T=0.01, nt=10, snapshots=2, num_runs=3, batch_size=3,
        krylov_m=6, seed=21, output_dir=str(tmp_path), mesh=mesh)
    paths = Datagen(cfg).run()
    assert len(paths) == 3
    out = io_hdf5.load_run(paths[-1])
    assert np.isfinite(out["u"]).all()


def test_cli_shard_batch(tmp_path):
    from nlsolvers_tpu.pipeline.__main__ import main
    rc = main(["realwave", "--phenomenon", "kink_field", "--system",
               "sine_gordon", "--integrator", "sv", "--nx", str(N),
               "--T", "0.01", "--nt", "8", "--snapshots", "2",
               "--num-runs", "2", "--krylov-m", "6", "--shard-batch", "-1",
               "--output-dir", str(tmp_path)])
    assert rc == 0
    assert len(list((tmp_path / "hdf5").glob("*.h5"))) == 2


def test_datagen_grid_sharded_matches_unsharded(tmp_path):
    """Grid-sharded datagen end-to-end: each trajectory's GRID decomposed
    over a (2, 4) spatial mesh (the large-single-trajectory path). Archives
    must be valid AND match the unsharded engine run bit-for-tolerance
    (same seed => same sampled ICs/fields since grid sharding pads nothing).
    """
    cfg_kw = dict(
        family="nlse", phenomenon="multi_soliton", system="cubic",
        nx=N, Lx=LX, T=0.01, nt=10, snapshots=3, num_runs=2, batch_size=2,
        anisotropy_type="periodic_structure", m_type="piecewise",
        krylov_m=6, seed=11)
    ref_paths = Datagen(DatagenConfig(output_dir=str(tmp_path / "ref"),
                                      **cfg_kw)).run()
    got_paths = Datagen(DatagenConfig(output_dir=str(tmp_path / "shard"),
                                      shard_grid=(2, 4), **cfg_kw)).run()
    assert len(got_paths) == len(ref_paths) == 2
    for rp, gp in zip(ref_paths, got_paths):
        ref = io_hdf5.load_run(rp)
        got = io_hdf5.load_run(gp)
        assert got["u"].shape == (3, N, N)
        assert np.isfinite(got["u"]).all()
        np.testing.assert_array_equal(got["u0"], ref["u0"])
        np.testing.assert_array_equal(got["c"], ref["c"])
        np.testing.assert_allclose(got["u"], ref["u"], rtol=2e-4, atol=2e-5)


def test_datagen_grid_sharded_realwave(tmp_path):
    cfg = DatagenConfig(
        family="realwave", phenomenon="kink_field", system="sine_gordon",
        nx=N, Lx=LX, T=0.01, nt=10, snapshots=3, num_runs=1,
        krylov_m=6, seed=5, output_dir=str(tmp_path), shard_grid=(2, 4))
    paths = Datagen(cfg).run()
    out = io_hdf5.load_run(paths[0])
    assert out["u"].shape == (3, N, N)
    assert np.isfinite(out["u"]).all()
    assert np.isfinite(out["v"]).all()


def test_datagen_grid_sharded_guard_energy(tmp_path):
    """VERDICT r2 missing #4: --shard-grid + --record-energy must produce
    an archive with an energy/ series (psum'd across the spatial mesh) that
    matches the host-side mass of the archived trajectory."""
    import h5py
    cfg = DatagenConfig(
        family="nlse", phenomenon="multi_soliton", system="cubic",
        nx=N, Lx=LX, T=0.01, nt=10, snapshots=3, num_runs=1, krylov_m=6,
        seed=11, output_dir=str(tmp_path), shard_grid=(2, 4),
        guard=True, record_energy=True)
    written = Datagen(cfg).run()
    assert len(written) == 1
    with h5py.File(written[0], "r") as f:
        assert "energy" in f, list(f)
        mass = np.asarray(f["energy/mass"])
        u = np.asarray(f["u"])
    assert mass.shape == (3,)
    dx = 2 * LX / (N - 1)
    host_mass = np.sum(np.abs(u) ** 2, axis=(1, 2)) * dx * dx
    np.testing.assert_allclose(mass, host_mass, rtol=1e-5)


def test_datagen_grid_sharded_guard_early_exit(tmp_path):
    """A diverging run on the grid-sharded engine must be caught by the
    cross-shard guard (psum'd finiteness) and skipped, not archived."""
    cfg = DatagenConfig(
        family="realwave", phenomenon="kink_field", system="klein_gordon",
        nx=N, Lx=LX, T=500.0, nt=10, snapshots=5, num_runs=1, krylov_m=6,
        integrator="sv", seed=3, output_dir=str(tmp_path),
        shard_grid=(2, 4), guard=True)
    written = Datagen(cfg).run()
    assert written == []
    assert list((tmp_path / "hdf5").glob("*.h5")) == []


def test_grid_sharded_realwave_energy_matches_unsharded():
    """Sharded energy series (halo-aware gradients + psum) == unsharded
    engine energy to roundoff."""
    from jax.sharding import Mesh
    from nlsolvers_tpu.parallel import spatial
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("gy", "gx"))
    B, snaps = 2, 3
    m, c = _rng_fields(B, seed=5)
    u0 = 0.3 * _gauss_ic(B, complex_=False)
    v0 = np.zeros_like(u0)
    fn_ref = make_realwave_trajectory_fn(
        "sine_gordon", (N, N), LX, 1e-3, integrator="sv", krylov_m=6,
        dtype=jnp.float64, guard=True, record_energy=True)
    _, _, bad_ref, ser_ref = fn_ref(u0, v0, m, c, snaps, 2)
    fn_sh = spatial.make_sharded_realwave_trajectory_fn(
        "sine_gordon", (N, N), LX, 1e-3, mesh, axis_names=("gy", "gx"),
        integrator="sv", krylov_m=6, dtype=jnp.float64, guard=True,
        record_energy=True)
    _, _, bad_sh, ser_sh = fn_sh(u0, v0, m, c, snaps, 2)
    np.testing.assert_array_equal(np.asarray(bad_sh), np.asarray(bad_ref))
    np.testing.assert_allclose(np.asarray(ser_sh["energy"]),
                               np.asarray(ser_ref["energy"]), rtol=1e-10)


def test_grid_sharded_3d_energy_matches_unsharded():
    """3-axis sharded energy (halo-aware gradients over gz/gy/gx + psum)
    == unsharded engine energy to roundoff."""
    from jax.sharding import Mesh
    from nlsolvers_tpu.parallel import spatial
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 2, 2),
                ("gz", "gy", "gx"))
    n3, B, snaps = 16, 1, 3
    rng = np.random.default_rng(9)
    shape = (n3, n3, n3)
    m = np.ones((B,) + shape, np.float64)
    c = np.ones((B,) + shape, np.float64)
    u0 = 0.3 * rng.standard_normal((B,) + shape)
    v0 = np.zeros_like(u0)
    fn_ref = make_realwave_trajectory_fn(
        "klein_gordon", shape, LX, 1e-3, integrator="sv", krylov_m=4,
        dtype=jnp.float64, guard=True, record_energy=True,
        variant="clean")
    _, _, bad_ref, ser_ref = fn_ref(u0, v0, m, c, snaps, 2)
    fn_sh = spatial.make_sharded_realwave_trajectory_fn(
        "klein_gordon", shape, LX, 1e-3, mesh,
        axis_names=("gz", "gy", "gx"), integrator="sv", krylov_m=4,
        dtype=jnp.float64, guard=True, record_energy=True,
        variant="clean")
    _, _, bad_sh, ser_sh = fn_sh(u0, v0, m, c, snaps, 2)
    np.testing.assert_array_equal(np.asarray(bad_sh), np.asarray(bad_ref))
    np.testing.assert_allclose(np.asarray(ser_sh["energy"]),
                               np.asarray(ser_ref["energy"]), rtol=1e-10)


def test_cli_shard_grid(tmp_path):
    from nlsolvers_tpu.pipeline.__main__ import main
    rc = main(["nlse", "--phenomenon", "multi_soliton", "--nx", str(N),
               "--T", "0.01", "--nt", "8", "--snapshots", "2",
               "--num-runs", "1", "--krylov-m", "6", "--shard-grid", "2,4",
               "--output-dir", str(tmp_path)])
    assert rc == 0
    assert len(list((tmp_path / "hdf5").glob("*.h5"))) == 1


def test_cli_shard_grid_plus_batch(tmp_path):
    """Combined (batch, gy, gx) mesh: 2 trajectories in parallel, each grid
    split over 2x2 devices."""
    from nlsolvers_tpu.pipeline.__main__ import main
    rc = main(["nlse", "--phenomenon", "multi_soliton", "--nx", str(N),
               "--T", "0.01", "--nt", "8", "--snapshots", "2",
               "--num-runs", "2", "--krylov-m", "6", "--shard-grid", "2,2",
               "--shard-batch", "2", "--output-dir", str(tmp_path)])
    assert rc == 0
    assert len(list((tmp_path / "hdf5").glob("*.h5"))) == 2


def test_ensemble_embedding(tmp_path):
    from nlsolvers_tpu.pipeline.samplers import common
    from nlsolvers_tpu.pipeline.samplers.nlse2d import NLSEPhenomenonSampler

    samp = NLSEPhenomenonSampler(24, 24, 5.0, seed=0)
    samples = samp.generate_ensemble(
        "fundamental_soliton", n_samples=6,
        parameter_ranges={"amplitude": (0.5, 2.0), "width": (0.5, 2.0),
                          "phase": (0.0, 3.0)})
    emb = common.embed_ensemble(samples, perplexity=3, n_iter=260)
    assert emb.shape == (6, 2) and np.isfinite(emb).all()
    common.plot_embedding(emb, tmp_path / "emb.png")
    assert (tmp_path / "emb.png").stat().st_size > 0


def test_step_timer_and_annotate():
    import jax.numpy as jnp
    from nlsolvers_tpu.utils import profiling

    t = profiling.StepTimer()
    x = jnp.ones((8, 8))
    for _ in range(3):
        with profiling.annotate("step"):
            x = x * 1.0001
        t.lap(x)
    s = t.summary()
    assert s["count"] == 3 and s["steps_per_s"] > 0


# -- in-loop stability guard (evolve_guarded; gen-2 sg_solver_dev.hpp:7-90) --

def test_guarded_engine_matches_unguarded_when_stable():
    """guard=True on a stable run: identical snapshots, bad_at == S, and
    the recorded on-device mass matches a host-side computation."""
    B = 2
    m, c = _rng_fields(B)
    u0 = _gauss_ic(B)
    packed = np.stack([u0.real, u0.imag], axis=1)
    plain_fn = make_nlse_trajectory_fn(
        "cubic", (N, N), LX, DT, integrator="ss2", krylov_m=6,
        dtype=jnp.complex128)
    guard_fn = make_nlse_trajectory_fn(
        "cubic", (N, N), LX, DT, integrator="ss2", krylov_m=6,
        dtype=jnp.complex128, guard=True, record_energy=True)
    ref = np.asarray(plain_fn(packed, m, c, SNAPS, FREQ))
    out, bad_at, series = guard_fn(packed, m, c, SNAPS, FREQ)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-12, atol=1e-14)
    np.testing.assert_array_equal(np.asarray(bad_at), SNAPS)

    mass = np.asarray(series["mass"])          # (B, S)
    dx = 2 * LX / (N - 1)
    u = ref[:, :, 0] + 1j * ref[:, :, 1]
    host_mass = np.sum(np.abs(u) ** 2, axis=(2, 3)) * dx * dx
    np.testing.assert_allclose(mass, host_mass, rtol=1e-10)


def test_guarded_engine_early_exit_on_divergence():
    """A deliberately diverging run (SV at an absurd dt) must be flagged at
    its first bad snapshot and the loop must stop: snapshots past the batch-
    wide exit point stay zero-filled — the proof that the while_loop bailed
    instead of burning all nt steps."""
    B = 2
    m, c = _rng_fields(B, seed=5)
    u0 = 5.0 * _gauss_ic(B, complex_=False)
    v0 = np.zeros_like(u0)
    snaps = 8
    fn = make_realwave_trajectory_fn(
        "klein_gordon", (N, N), LX, 50.0, integrator="sv", krylov_m=6,
        dtype=jnp.float64, guard=True, record_energy=True)
    u_t, v_t, bad_at, series = fn(u0, v0, m, c, snaps, 2)
    u_t, bad_at = np.asarray(u_t), np.asarray(bad_at)
    assert (bad_at < snaps).all(), bad_at
    worst = int(bad_at.max())
    assert worst < snaps - 1, "divergence must hit before the last snapshot"
    # everything past the batch-wide exit is untouched buffer (zeros)
    np.testing.assert_array_equal(u_t[:, worst + 1:], 0.0)
    # the recorded energy goes non-finite exactly where the guard tripped
    energy = np.asarray(series["energy"])
    for b in range(B):
        assert not np.isfinite(energy[b, bad_at[b]])


def test_datagen_guard_skips_diverging_runs(tmp_path):
    """End-to-end: a sweep whose every run diverges archives nothing and
    says why (the in-loop guard message)."""
    cfg = DatagenConfig(
        family="realwave", phenomenon="kink_field", system="klein_gordon",
        nx=N, Lx=LX, T=500.0, nt=10, snapshots=5, num_runs=2, krylov_m=6,
        integrator="sv", seed=3, output_dir=str(tmp_path))
    assert cfg.guard          # the production default
    written = Datagen(cfg).run()
    assert written == []
    assert list((tmp_path / "hdf5").glob("*.h5")) == []


def test_datagen_record_energy_archived(tmp_path):
    """record_energy=True stores the on-device series under energy/ in the
    archive, aligned with the snapshot axis."""
    cfg = DatagenConfig(
        family="nlse", phenomenon="multi_soliton", system="cubic",
        nx=N, Lx=LX, T=0.01, nt=10, snapshots=3, num_runs=1, krylov_m=6,
        integrator="ss2", seed=3, output_dir=str(tmp_path),
        record_energy=True)
    written = Datagen(cfg).run()
    assert len(written) == 1
    import h5py
    with h5py.File(written[0], "r") as f:
        mass = f["energy/mass"][()]
    assert mass.shape == (3,)
    assert np.isfinite(mass).all()
    # the on-device series must equal the same functional computed from the
    # archived snapshots on the host (drift itself is physics: the Neumann
    # edge-copy is not exactly mass-conserving on a coarse grid)
    with h5py.File(written[0], "r") as f:
        u = f["u"][()]
        Lx_, nx_ = f["grid"].attrs["Lx"], f["grid"].attrs["nx"]
    dx = 2.0 * Lx_ / (nx_ - 1)
    host_mass = np.sum(np.abs(u) ** 2, axis=(1, 2)) * dx * dx
    np.testing.assert_allclose(mass, host_mass, rtol=1e-5)


# -- async archiving + native npy format ------------------------------------

def test_archive_async_matches_sync(tmp_path):
    """Background-thread archiving produces byte-equivalent datasets to the
    synchronous path, in the same order."""
    import h5py
    outs = {}
    for mode in (True, False):
        d = tmp_path / ("async" if mode else "sync")
        cfg = DatagenConfig(
            family="nlse", phenomenon="multi_soliton", system="cubic",
            nx=N, Lx=LX, T=0.01, nt=10, snapshots=3, num_runs=3,
            batch_size=2, krylov_m=6, integrator="ss2", seed=11,
            output_dir=str(d), archive_async=mode)
        outs[mode] = Datagen(cfg).run()
    assert len(outs[True]) == len(outs[False]) == 3
    for pa, ps in zip(outs[True], outs[False]):
        with h5py.File(pa, "r") as fa, h5py.File(ps, "r") as fs:
            np.testing.assert_array_equal(fa["u"][()], fs["u"][()])
            assert (fa["metadata"].attrs["run_index"]
                    == fs["metadata"].attrs["run_index"])


def test_archive_npy_format(tmp_path):
    """--format npy: the device drivers' own trajectory format
    (util.hpp:37-92), streamed through the native async writer. Every array
    must round-trip through np.load and match the HDF5 archive content."""
    import h5py
    cfg_np = DatagenConfig(
        family="realwave", phenomenon="kink_field", system="sine_gordon",
        nx=N, Lx=LX, T=0.01, nt=10, snapshots=3, num_runs=2, krylov_m=6,
        integrator="sv", seed=5, output_dir=str(tmp_path / "np"),
        archive_format="npy", record_energy=True)
    written = Datagen(cfg_np).run()
    assert len(written) == 2
    base = written[0].with_suffix("")     # strip .json
    meta = __import__("json").loads(written[0].read_text())
    assert meta["problem_type"] == "sine_gordon"
    u = np.load(f"{base}_u.npy")
    assert u.shape == (3, N, N) and np.isfinite(u).all()
    for suffix in ("v", "u0", "v0", "m", "c", "energy"):
        assert (base.parent / f"{base.name}_{suffix}.npy").exists(), suffix

    cfg_h5 = DatagenConfig(
        family="realwave", phenomenon="kink_field", system="sine_gordon",
        nx=N, Lx=LX, T=0.01, nt=10, snapshots=3, num_runs=2, krylov_m=6,
        integrator="sv", seed=5, output_dir=str(tmp_path / "h5"))
    h5_written = Datagen(cfg_h5).run()
    with h5py.File(h5_written[0], "r") as f:
        np.testing.assert_array_equal(u, f["u"][()])


def test_datagen_resume_npy_format(tmp_path):
    """Resume over the npy archive format: completeness is judged by the
    JSON sidecar plus a loadable trajectory header (the native writer
    flushes asynchronously, so the sidecar alone is not proof)."""
    mk = lambda: DatagenConfig(
        family="realwave", phenomenon="kink_field", system="sine_gordon",
        nx=N, Lx=LX, T=0.01, nt=10, snapshots=3, num_runs=2, batch_size=1,
        krylov_m=6, integrator="sv", seed=9, output_dir=str(tmp_path),
        archive_format="npy", resume=True)
    written = Datagen(mk()).run()
    assert len(written) == 2

    # corrupt run 1's trajectory: its batch must re-evolve even though the
    # sidecar survived
    base1 = written[1].with_suffix("")
    (base1.parent / f"{base1.name}_u.npy").write_bytes(b"not an npy")
    again = Datagen(mk()).run()
    assert [p.name for p in again] == [written[1].name]
    u = np.load(f"{base1}_u.npy")
    assert u.shape == (3, N, N) and np.isfinite(u).all()
    # everything present -> nothing re-evolves
    assert Datagen(mk()).run() == []


def test_cli_radiating_bc(tmp_path):
    """--bc radiating routes the engine through the radiating envelope BC
    (boundaries.hpp:59-121) end to end."""
    from nlsolvers_tpu.pipeline.__main__ import main
    rc = main(["nlse", "--phenomenon", "multi_soliton", "--nx", str(N),
               "--T", "0.01", "--nt", "10", "--snapshots", "2",
               "--num-runs", "1", "--krylov-m", "6", "--bc", "radiating",
               "--output-dir", str(tmp_path)])
    assert rc == 0
    files = list((tmp_path / "hdf5").glob("*.h5"))
    assert len(files) == 1
    import h5py
    with h5py.File(files[0], "r") as f:
        assert np.isfinite(f["u"][()]).all()
