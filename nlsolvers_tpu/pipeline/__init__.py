from nlsolvers_tpu.pipeline import downsample, fields, grids, spaces
from nlsolvers_tpu.pipeline.grids import Grid2D, Grid3D
