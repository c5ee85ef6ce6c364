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

__all__ = [
    "BilinearIntegrator",
    "DerivativeIntegrator",
    "evaluate",
    "integrator_dim",
    "stack_hessians",
    "stack_jacobians",
    "stack_residuals",
    "windows",
]
