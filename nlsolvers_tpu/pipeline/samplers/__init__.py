from nlsolvers_tpu.pipeline.samplers import common
from nlsolvers_tpu.pipeline.samplers.nlse2d import NLSEPhenomenonSampler
from nlsolvers_tpu.pipeline.samplers.nlse3d import NLSE3DSampler
from nlsolvers_tpu.pipeline.samplers.realwave2d import RealWaveSampler
from nlsolvers_tpu.pipeline.samplers.realwave3d import RealWaveSampler3d
