from rust_robotics_tpu.nlls.kernels import RobustKernel  # noqa: F401
from rust_robotics_tpu.nlls.problem import (  # noqa: F401
    FactorBlock,
    Problem,
    VariableGroup,
)
from rust_robotics_tpu.nlls.solver import SolverConfig, solve  # noqa: F401
