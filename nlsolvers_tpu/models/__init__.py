from nlsolvers_tpu.models import (boussinesq, evolve, nlse, nonlinearities,
                                  problems, realwave)
from nlsolvers_tpu.models.evolve import evolve as evolve_fn, simulate
from nlsolvers_tpu.models.problems import (Problem, boussinesq_problem,
                                           nlse_problem, realwave_problem,
                                           run, stochastic_phi4_problem)
