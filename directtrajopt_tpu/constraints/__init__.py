from .base import LinearCanon, LinearConstraintBase, NonlinearConstraintBase
from .linear import (
    AllEqualConstraint,
    BoundsConstraint,
    DurationConstraint,
    EqualityConstraint,
    GlobalBoundsConstraint,
    GlobalEqualityConstraint,
    GlobalLinearConstraint,
    L1SlackConstraint,
    SymmetricControlConstraint,
    SymmetryConstraint,
    TimeConsistencyConstraint,
    TimeStepsAllEqualConstraint,
    TotalConstraint,
)
from .nonlinear import (
    NonlinearGlobalConstraint,
    NonlinearGlobalKnotPointConstraint,
    NonlinearKnotPointConstraint,
)

__all__ = [
    "AllEqualConstraint",
    "BoundsConstraint",
    "DurationConstraint",
    "EqualityConstraint",
    "GlobalBoundsConstraint",
    "GlobalEqualityConstraint",
    "GlobalLinearConstraint",
    "L1SlackConstraint",
    "LinearCanon",
    "LinearConstraintBase",
    "NonlinearConstraintBase",
    "NonlinearGlobalConstraint",
    "NonlinearGlobalKnotPointConstraint",
    "NonlinearKnotPointConstraint",
    "SymmetricControlConstraint",
    "SymmetryConstraint",
    "TimeConsistencyConstraint",
    "TimeStepsAllEqualConstraint",
    "TotalConstraint",
]
