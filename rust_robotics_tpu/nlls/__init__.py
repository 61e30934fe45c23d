from rust_robotics_tpu.nlls.kernels import RobustKernel  # noqa: F401
from rust_robotics_tpu.nlls.problem import (  # noqa: F401
    FactorBlock,
    Problem,
    VariableGroup,
)
from rust_robotics_tpu.nlls.solver import (  # noqa: F401
    SolverConfig,
    solve,
    solve_device,
)

__all__ = [
    "RobustKernel", "FactorBlock", "Problem", "VariableGroup",
    "SolverConfig", "solve", "solve_device",
]


def __getattr__(name):
    # lazy: implicit/tridiag pull in heavier deps only when used
    if name in ("implicit_vjp", "solve_implicit"):
        from rust_robotics_tpu.nlls import implicit

        return getattr(implicit, name)
    if name in ("solve_chain_lm", "block_tridiag_solve",
                "classify_chain_edges"):
        from rust_robotics_tpu.nlls import tridiag

        return getattr(tridiag, name)
    raise AttributeError(name)
