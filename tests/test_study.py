"""Deliverable-artifact tests: integrator-study figure set + ensemble
dashboards (the reference's compare_utils_* / ensemble_processing outputs).

These verify one call produces the full artifact set with valid content —
the tiny-shape analogue of running compare_integrators_nlse_2d.py and
process_h5/ensemble_processing.py end to end.
"""

import csv
import json

import numpy as np

from nlsolvers_tpu.analysis import dashboards, study
from nlsolvers_tpu.pipeline import io_hdf5

N = 24
LX = 5.0


def test_run_study_produces_full_artifact_set(tmp_path):
    artifacts = study.run_study(
        tmp_path, "nlse", "cubic", integrators=("ss2", "sewi"),
        nx_values=[16, N], dt_values=[0.02, 0.01], T=0.04, Lx=LX,
        phenomenon="colliding_packets",
        ic_params={"kx1": 1.0, "kx2": -1.0},
        m_type="constant", num_snapshots=4, krylov_m=6, seed=0,
        animate=False)

    expected = {"summary_csv", "initial_fields", "convergence_mass",
                "convergence_hamiltonian", "work_precision",
                "energy_components", "solution_snapshots",
                "solution_differences", "config"}
    assert expected <= set(artifacts)
    for name, path in artifacts.items():
        assert (tmp_path / path.split("/")[-1]).stat().st_size > 0, name

    with open(artifacts["summary_csv"]) as f:
        rows = list(csv.DictReader(f))
    # full (integrator x nx x dt) matrix
    assert len(rows) == 2 * 2 * 2
    assert {r["integrator"] for r in rows} == {"ss2", "sewi"}
    stable = [r for r in rows if r["simulation_stable"] == "True"]
    assert len(stable) == len(rows)
    for r in stable:
        assert float(r["walltime"]) > 0

    with open(artifacts["config"]) as f:
        cfg = json.load(f)
    assert cfg["nx_values"] == [16, N] and cfg["family"] == "nlse"


def test_study_cli_realwave(tmp_path):
    rc = study.main([
        "--family", "realwave", "--kind", "sine_gordon",
        "--integrators", "gautschi", "sv", "--output-dir", str(tmp_path),
        "--nx", str(N), "--dt", "0.02", "--T", "0.04",
        "--phenomenon", "kink_solution", "--m-type", "constant",
        "--num-snapshots", "3", "--krylov-m", "6", "--no-animation"])
    assert rc == 0
    csvs = list(tmp_path.glob("summary_results_*.csv"))
    assert len(csvs) == 1
    with open(csvs[0]) as f:
        rows = list(csv.DictReader(f))
    assert {r["integrator"] for r in rows} == {"gautschi", "sv"}


def _write_fake_archives(tmp_path, n_files=4):
    rng = np.random.default_rng(0)
    x = np.linspace(-LX, LX, N)
    base = np.exp(-(x[:, None] ** 2 + x[None, :] ** 2) / 4)
    for i in range(n_files):
        # gently breathing profile: finite, conservative-ish energies
        u = np.stack([(1 + 0.02 * np.sin(0.3 * s + i)) * base
                      + 0.01j * rng.standard_normal((N, N))
                      for s in range(5)])
        io_hdf5.save_run(
            tmp_path / f"run_{i}.h5", problem_type="cubic",
            run_id=f"r{i}", run_index=i, phenomenon="test",
            phenomenon_params={}, shape=(N, N), extents=(LX, LX),
            T=1.0, nt=40, num_snapshots=5, u0=u[0], u=u,
            m=np.ones((N, N)), c=1.0 + 0.1 * rng.standard_normal((N, N)))


def test_ensemble_dashboard_artifacts(tmp_path):
    _write_fake_archives(tmp_path)
    out = tmp_path / "dash"
    artifacts = dashboards.ensemble_dashboard(tmp_path, out)

    assert "2D_cubic" in artifacts
    group = artifacts["2D_cubic"]
    for key in ("energy_plots", "case_snapshots", "field_info"):
        assert key in group, key
        assert (out / group[key].split("/")[-1]).stat().st_size > 0

    with open(artifacts["collective_stats"]) as f:
        stats = json.load(f)
    assert stats["2D_cubic"]["count"] == 4
    assert stats["2D_cubic"]["nan_count"] == 0


def test_dashboard_case_selection_skips_nan_runs(tmp_path):
    _write_fake_archives(tmp_path, n_files=3)
    u = np.full((5, N, N), np.nan, complex)
    u[0] = 1.0
    io_hdf5.save_run(tmp_path / "diverged.h5", problem_type="cubic",
                     run_id="bad", run_index=9, phenomenon="test",
                     phenomenon_params={}, shape=(N, N), extents=(LX, LX),
                     T=1.0, nt=40, num_snapshots=5, u0=u[0], u=u)
    out = tmp_path / "dash"
    artifacts = dashboards.ensemble_dashboard(tmp_path, out)
    with open(artifacts["collective_stats"]) as f:
        stats = json.load(f)
    assert stats["2D_cubic"]["count"] == 4
    assert stats["2D_cubic"]["nan_count"] == 1
    # the snapshot selector must not pick the diverged run
    assert (out / "case_snapshots_2D_cubic.png").exists()
