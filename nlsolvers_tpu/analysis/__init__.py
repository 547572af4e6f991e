"""Analysis / post-processing: the L4 layer (SURVEY.md sections 2.7, 3.5).

energy        closed-form energy/mass functionals per equation family
conservation  per-trajectory drift metrics (the accuracy gate)
ensemble      HDF5 dataset sweeps + collective stats + NaN hunting
compare       integrator A/B (nx x dt) studies, convergence/work-precision
study         study runner CLI + the deliverable figure set (convergence /
              work-precision plots, snapshots, difference animation, CSV)
dashboards    per-directory ensemble dashboards over HDF5 datasets + CLI
spectral      modal entropy, mutual information, dispersion diagnostics
structure     SSIM vs reference frame, modal-energy grids, observed
              dispersion, local conservation, persistent homology
animate       2D/3D trajectory animation and snapshot montages
"""

from nlsolvers_tpu.analysis import (compare, conservation, energy, ensemble,
                                    spectral, structure)

__all__ = ["compare", "conservation", "energy", "ensemble", "spectral",
           "structure", "study", "dashboards"]


def __getattr__(name):
    # study/dashboards import matplotlib-facing code and the pipeline
    # samplers; load them lazily so `import nlsolvers_tpu.analysis` stays
    # cheap in solver-only processes.
    if name in ("study", "dashboards"):
        import importlib
        return importlib.import_module(f"nlsolvers_tpu.analysis.{name}")
    raise AttributeError(name)
