from .base import (
    evaluate,
    integrator_dim,
    stack_hessians,
    stack_jacobians,
    stack_residuals,
    windows,
)
from .bilinear import BilinearIntegrator
from .derivative import DerivativeIntegrator
from .time_dependent import (
    GeneralIntegrator,
    TimeDependentBilinearIntegrator,
    rk4_step,
    td_integration_error,
    tune_n_steps,
)

__all__ = [
    "BilinearIntegrator",
    "DerivativeIntegrator",
    "GeneralIntegrator",
    "TimeDependentBilinearIntegrator",
    "rk4_step",
    "td_integration_error",
    "tune_n_steps",
    "evaluate",
    "integrator_dim",
    "stack_hessians",
    "stack_jacobians",
    "stack_residuals",
    "windows",
]
