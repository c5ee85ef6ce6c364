"""Every component class through the PRODUCTION path: jitted + vmapped solve.

The GlobalLinearConstraint trace-time bug (numpy row classification on
tracer leaves) survived a green suite because that class was only exercised
through eager ``dtx.solve`` — eager lowering sees concrete arrays, jit sees
tracers. This file closes the gap structurally: one tiny problem per
component class (constraint / objective / integrator), each pushed through
``solve_batch`` (B=2), which is vmap+jit — exactly what production scenario
sweeps run. Pass criterion is trace+run soundness (finite iterates), not
convergence; the component-specific semantics are covered elsewhere.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import directtrajopt_tpu as dtx


def _traj(N=6, seed=0, with_globals=False, free_time=True):
    rng = np.random.default_rng(seed)
    data = {
        "x": 0.3 * rng.normal(size=(N, 1)),
        "u": 0.2 * rng.normal(size=(N, 1)),
    }
    if free_time:
        data["dt"] = np.full((N, 1), 0.1)
    return dtx.Trajectory.create(
        data,
        timestep="dt" if free_time else 0.1,
        controls="u",
        initial={"x": [0.0]},
        final={"x": [0.5]},
        bounds={"u": 1.0, **({"dt": (0.01, 0.5)} if free_time else {})},
        global_data={"theta": rng.normal(size=2)} if with_globals else None,
    )


def _case(name):
    """Returns (traj, objective, constraints) for one component case."""
    traj = _traj(with_globals=name.startswith("global") or "global" in name)
    obj = dtx.QuadraticRegularizer.create("u", traj, 1.0)
    cons = []
    if name == "equality_interior":
        cons = [dtx.EqualityConstraint.create("x", [2, 3], 0.3)]
    elif name == "fix_trajectory_variable":
        traj, con = dtx.fix_trajectory_variable(traj, "u", [1], 0.05)
        cons = [con]
    elif name == "fix_global_variable":
        traj, con = dtx.fix_global_variable(traj, "theta", [0.1, -0.2])
        cons = [con]
    elif name == "all_equal":
        cons = [dtx.AllEqualConstraint(name="u")]
    elif name == "timesteps_all_equal":
        cons = [dtx.TimeStepsAllEqualConstraint()]
    elif name == "total":
        cons = [dtx.TotalConstraint.create("u", 0.5)]
    elif name == "total_range":
        # multi-knot linear inequality rows → Riccati border inequalities
        cons = [dtx.TotalConstraint.create("u", lb=-1.0, ub=1.0)]
    elif name == "symmetric_control":
        cons = [dtx.SymmetricControlConstraint("u", [0])]
    elif name == "bounds_subcomponents":
        cons = [dtx.BoundsConstraint.create("x", [1, 2], 0.8, dim=1)]
    elif name == "global_bounds":
        cons = [dtx.GlobalBoundsConstraint.create("theta", 1.5, traj)]
    elif name == "global_equality":
        cons = [dtx.GlobalEqualityConstraint.create("theta", [0.1, -0.1])]
    elif name == "global_linear":
        cons = [
            dtx.GlobalLinearConstraint.create(
                "theta", np.array([[1.0, 1.0], [1.0, -1.0]]), lb=[0.0, -np.inf],
                ub=[0.0, 0.3],
            )
        ]
    elif name == "knot_point_objective":
        obj = obj + dtx.KnotPointObjective.create(
            lambda x: jnp.sum(x**4), "x", traj, times=[2, 4]
        )
    elif name == "terminal_objective":
        obj = obj + dtx.TerminalObjective(
            lambda x: jnp.sum((x - 0.5) ** 2), "x", traj, Q=10.0
        )
    elif name == "linear_regularizer":
        obj = obj + dtx.LinearRegularizer.create("u", traj, 0.3)
    elif name == "minimum_time":
        obj = obj + dtx.MinimumTimeObjective.create(traj, 0.5)
    elif name == "global_objective":
        obj = obj + dtx.GlobalObjective.create(
            lambda th: jnp.sum(th**2), "theta", traj
        )
    elif name == "global_terminal_objective":
        obj = obj + dtx.GlobalTerminalObjective(
            lambda v: (v[0] - 0.1 * v[-1]) ** 2, "x", "theta", traj, Q=5.0
        )
    else:
        raise ValueError(name)
    return traj, obj, cons


_CASES = [
    "equality_interior",
    "fix_trajectory_variable",
    "fix_global_variable",
    "all_equal",
    "timesteps_all_equal",
    "total",
    "total_range",
    "symmetric_control",
    "bounds_subcomponents",
    "global_bounds",
    "global_equality",
    "global_linear",
    "knot_point_objective",
    "terminal_objective",
    "linear_regularizer",
    "minimum_time",
    "global_objective",
    "global_terminal_objective",
]


def _stack(prob):
    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), prob, prob)


@pytest.mark.parametrize("case", _CASES)
def test_component_through_jitted_batch(case):
    traj, obj, cons = _case(case)
    integ = dtx.DerivativeIntegrator.create("x", "u", traj)
    prob = dtx.DirectTrajOptProblem.create(traj, obj, integ, constraints=cons)
    batch = _stack(prob)
    res = dtx.solve_batch(batch, max_iter=15, tol=1e-6, acceptable_tol=1e-3)
    Z = np.asarray(res.ipm.Z)
    assert Z.shape[0] == 2
    assert np.all(np.isfinite(Z)), case


def test_time_dependent_integrator_through_jitted_batch():
    """TimeDependentBilinearIntegrator (orders 0 and 1) through vmap+jit."""
    N = 6
    rng = np.random.default_rng(1)
    G0 = np.array([[0.0, 1.0], [-1.0, 0.0]])
    G1 = np.array([[0.0, 1.0], [1.0, 0.0]])
    traj = dtx.Trajectory.create(
        {
            "x": 0.3 * rng.normal(size=(N, 2)),
            "u": 0.2 * rng.normal(size=(N, 1)),
            "t": np.arange(N, dtype=float)[:, None] * 0.1,
        },
        timestep=0.1,
        controls="u",
        initial={"x": [1.0, 0.0]},
        bounds={"u": 1.0},
    )
    for order in (0, 1):
        G = lambda u, t: jnp.asarray(G0) + u[0] * (1.0 + 0.1 * t) * jnp.asarray(G1)
        # n_steps=4: this test checks TRACEABILITY (vmap+jit), not
        # integration accuracy — the shorter RK4 chain halves the traced
        # graph and its compile time
        td = dtx.TimeDependentBilinearIntegrator.create(
            G, "x", "u", "t", traj, spline_order=order, n_steps=4
        )
        prob = dtx.DirectTrajOptProblem.create(
            traj, dtx.QuadraticRegularizer.create("u", traj, 1.0), td
        )
        batch = _stack(prob)
        res = dtx.solve_batch(batch, max_iter=10, tol=1e-6, acceptable_tol=1e-3)
        assert np.all(np.isfinite(np.asarray(res.ipm.Z))), order
