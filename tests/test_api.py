"""API-surface static checks — the analog of the reference's Aqua/JET tier
(`test/aqua.jl`, `test/jet.jl`): exports exist, modules import cleanly, no
duplicate or dangling `__all__` entries."""

import importlib
import pkgutil

import directtrajopt_tpu as dtx

MODULES = [
    "directtrajopt_tpu",
    "directtrajopt_tpu.trajectory",
    "directtrajopt_tpu.module",
    "directtrajopt_tpu.problem",
    "directtrajopt_tpu.rollout",
    "directtrajopt_tpu.benchmarks",
    "directtrajopt_tpu.integrators",
    "directtrajopt_tpu.objectives",
    "directtrajopt_tpu.constraints",
    "directtrajopt_tpu.solvers",
    "directtrajopt_tpu.solvers.ipm",
    "directtrajopt_tpu.solvers.ops_dense",
    "directtrajopt_tpu.solvers.ops_riccati",
    "directtrajopt_tpu.solvers.canonical",
    "directtrajopt_tpu.solvers.callbacks",
    "directtrajopt_tpu.parallel",
    "directtrajopt_tpu.ops.expm",
    "directtrajopt_tpu.ops.riccati_kernel",
    "directtrajopt_tpu.utils.mpc",
    "directtrajopt_tpu.utils.testing",
]


def test_all_modules_import():
    for name in MODULES:
        importlib.import_module(name)


def test_all_exports_exist():
    """Every name in a module's __all__ resolves (the reference's Aqua
    `undefined_exports` check — theirs is knowingly broken, ours isn't)."""
    for name in MODULES:
        mod = importlib.import_module(name)
        for sym in getattr(mod, "__all__", []):
            assert hasattr(mod, sym), f"{name}.__all__ lists missing {sym}"


def test_no_duplicate_exports():
    for name in MODULES:
        mod = importlib.import_module(name)
        all_ = list(getattr(mod, "__all__", []))
        assert len(all_) == len(set(all_)), f"duplicate __all__ entries in {name}"


def test_public_symbols_importable_from_top_level():
    expected = [
        "Trajectory", "Layout", "DirectTrajOptProblem",
        "BilinearIntegrator", "DerivativeIntegrator", "GeneralIntegrator",
        "TimeDependentBilinearIntegrator",
        "QuadraticRegularizer", "LinearRegularizer", "MinimumTimeObjective",
        "KnotPointObjective", "TerminalObjective", "GlobalObjective",
        "GlobalKnotPointObjective", "NullObjective", "CompositeObjective",
        "EqualityConstraint", "BoundsConstraint", "SymmetryConstraint",
        "TimeConsistencyConstraint", "L1SlackConstraint", "TotalConstraint",
        "DurationConstraint", "AllEqualConstraint", "GlobalLinearConstraint",
        "NonlinearKnotPointConstraint", "NonlinearGlobalConstraint",
        "NonlinearGlobalKnotPointConstraint",
        "solve", "solve_batch", "solve_jit", "IPMOptions", "IPMCallbacks",
        "make_nlp", "rollout", "bilinear_rollout", "rollout_fidelity",
        "mpc_step", "shift_trajectory",
        "fix_trajectory_variable", "fix_global_variable",
        "remove_slack_variables", "get_default_options", "set_default_options",
    ]
    for sym in expected:
        assert hasattr(dtx, sym), f"missing top-level export {sym}"


def test_profiling_hooks():
    """Structure-build timing + profiler trace context (SURVEY §5 tracing)."""
    from directtrajopt_tpu.benchmarks import make_bilinear_problem
    from directtrajopt_tpu.utils.profiling import time_structure_build

    info = time_structure_build(make_bilinear_problem(N=9, feasible_start=True))
    assert info["riccati_eligible"] is True
    assert info["make_nlp_s"] > 0 and info["analyze_s"] > 0
    assert "n_border_rows" in info
