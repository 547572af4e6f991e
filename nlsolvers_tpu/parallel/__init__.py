from nlsolvers_tpu.parallel import batch, mesh, spatial
from nlsolvers_tpu.parallel.mesh import make_mesh, factor_devices
from nlsolvers_tpu.parallel.batch import batched_evolve, shard_batch
from nlsolvers_tpu.parallel.spatial import (make_sharded_nlse_step,
                                            make_sharded_realwave_step,
                                            sharded_laplacian_2d,
                                            sharded_neumann_2d)
