"""Global numerical configuration.

The reference suite runs everything in float64/complex128 (Eigen + CUDA double).
TPU f64 is emulated and slow, so the production path here is f32/c64 state with
drift-validated tolerances; tests and oracles run f64 on CPU by enabling
`jax.config.update("jax_enable_x64", True)` (see tests/conftest.py).

All public APIs take explicit dtypes; these are just the defaults.
"""

import jax.numpy as jnp

# Default real/complex dtypes for solver state. f32/c64 run at TPU native speed.
default_real_dtype = jnp.float32
default_complex_dtype = jnp.complex64

# Default Krylov subspace dimension. Reference: m=10 host default
# (host/include/eigen_krylov_real.hpp:60), m=20 for NLSE 2D device
# (device/drivers/nlse_cubic_driver_2d.cpp:105), m=15 cubic-quintic.
default_krylov_m = 10


# Fused Pallas kernel dispatch for the Lanczos hot loop (ops/pallas/):
#   "auto"      use fused kernels on TPU backends, pure XLA elsewhere
#   "on"        always (compiled) — TPU only
#   "interpret" always, via the Pallas interpreter (CPU tests/debugging)
#   "off"       never
pallas_mode = "auto"

# Pipelined single-pass fused Lanczos iteration (ops/pallas/lanczos2d.
# _pipe_call): merges iteration j's reconstruction with iteration j+1's
# stencil + projections in ONE kernel, carrying the cross-iteration
# corrections (<W_i, W_{j-1}> gram terms) as scalars. Streams j+2 columns
# per iteration instead of the two-pass path's 2j+3 (73 vs 117 column
# streams per m=10 matfunc). Same math as the two-pass kernels to rounding;
# tests pin both against the pure-XLA path (parametrized over this flag).
# Applies to the unsharded 2D descriptors (iso + anisotropic).
pallas_pipeline = True

# Y-slab block geometry for 3D fused Lanczos (unsharded AND sharded-3D)
# (ops/pallas/lanczos3d_pipe.py): blocks are (P, nz, ty, nx) — full
# z-extent over a y-slab — so the z-stencil is internal (2 fewer streams,
# no z-offset block fetches) and the grid is ny/ty fat programs instead
# of nz*ny/tile row-tiles. Default ON: measured on v5e (min of 5
# interleaved reps, 128^3 m=10 matfunc) 5.20 ms vs the row-tiled
# two-pass kernels' 5.87 ms — the row-tiled path runs program-grain
# bound. Round 4: iso grids whose full-z slabs exceed VMEM (256^3-class)
# take the BRICK pass1 per iteration under this same flag (z- AND
# y-tiled blocks with gathered z-halo planes, lanczos3d_pipe.
# _pass1zy_call). Off -> the original row-tiled kernels
# (lanczos2d pass1/pass2).
pallas_ytile_3d = True

# Pipelined SINGLE-PASS fused Lanczos for unsharded 3D grids (the y-slab
# analogue of pallas_pipeline, lanczos3d_pipe.lanczos_pipe3d): streams j+2
# columns per iteration instead of the two-pass 2j+4. Measured on v5e it
# is NOT faster than the y-slab two-pass (6.25 vs 5.20 ms on the same
# interleaved 128^3 m=10 run) despite ~45% less HBM traffic: the 3D
# kernels are bound by per-program compute/scheduling, not bandwidth, and
# the fatter fused kernel pipelines worse — same finding as the 2D
# _FUSED_ITER/resident variants. Kept opt-in, parity-tested, for future
# Mosaic codegen.
pallas_pipeline_3d = False

# Single-kernel VMEM-resident SS2 step (ops/pallas/resident2d.py).
# Default OFF: measured on v5e, Mosaic reaches only ~220 GB/s on resident
# full-array VMEM access (vs ~600+ GB/s achieved by the pipelined streaming
# kernels), so the resident kernel is SLOWER (574 vs 914 steps/s at 1024^2)
# despite ~40x less HBM traffic. Kept as an opt-in ("auto") for future
# Mosaic codegen and for parts where HBM is genuinely the wall.
resident_mode = "off"


def pallas_dispatch():
    """Resolve pallas_mode to (use: bool, interpret: bool) for this backend."""
    import jax

    mode = pallas_mode
    if mode == "off":
        return False, False
    if mode == "interpret":
        return True, True
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if mode == "on":
        return True, not on_tpu
    return on_tpu, False   # auto


def real_dtype_of(dtype):
    """Real dtype matching a possibly-complex dtype.

    Pure-numpy on purpose: creating even a scalar complex device array fails
    on the axon TPU backend (complex host<->device transfer is UNIMPLEMENTED,
    see utils/complexio.py).
    """
    import numpy as np
    return np.empty((), dtype).real.dtype
