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


def real_dtype_of(dtype):
    """Real dtype matching a possibly-complex dtype.

    Pure-numpy on purpose: creating even a scalar complex device array fails
    on the axon TPU backend (complex host<->device transfer is UNIMPLEMENTED,
    see utils/complexio.py).
    """
    import numpy as np
    return np.empty((), dtype).real.dtype
