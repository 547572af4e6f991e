from nlsolvers_tpu.ops import operators, boundaries, krylov
from nlsolvers_tpu.ops.operators import (
    laplacian_2d,
    laplacian_3d,
    anisotropic_laplacian_2d,
    anisotropic_laplacian_3d,
    separated_laplacian_2d,
    biharmonic_x,
)
from nlsolvers_tpu.ops.boundaries import (
    neumann_no_velocity_2d,
    neumann_2d,
    neumann_no_velocity_3d,
    radiating_nlse_2d,
)
from nlsolvers_tpu.ops.krylov import (lanczos, matfunc_apply,
                                      matfunc_apply_multi, expm_apply,
                                      MATFUNCS)
