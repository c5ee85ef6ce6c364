"""Chain promotion: FATROP-style in-core elimination of banded equality rows.

The analog of FATROP's constraint-to-go for this backend: linear equality
rows shaped like dynamics (β·z_{k+1}[c] + α·z_k = b, a complete chain over
all steps) are promoted into the Riccati core instead of costing one O(N)
border sweep each, so the border width m_c stays independent of N for
TimeConsistency (`/root/reference/src/constraints/linear/
time_consistency_constraint.jl:17-43`) and (Δt) all-equal constraints
(`all_equal_constraint.jl:15-30`). VERDICT r1 item 6.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import directtrajopt_tpu as dtx
from directtrajopt_tpu.solvers.canonical import make_nlp
from directtrajopt_tpu.solvers.ops_riccati import analyze


def _free_time_problem(N, with_t=True, all_equal=False, seed=0):
    rng = np.random.default_rng(seed)
    G = (np.array([[0.0, 1.0], [-1.0, 0.0]]), [np.array([[0.0, 1.0], [1.0, 0.0]])])
    integ = dtx.BilinearIntegrator.create(G, "x", "u", None)
    u = 0.3 * rng.standard_normal((N, 1))
    xs = dtx.bilinear_rollout(integ, jnp.array([1.0, 0.0]), jnp.asarray(u), 0.1)
    data = {"x": np.asarray(xs), "u": u, "dt": np.full((N, 1), 0.1)}
    initial = {"x": [1.0, 0.0]}
    if with_t:
        data["t"] = (np.cumsum(np.full(N, 0.1)) - 0.1).reshape(N, 1)
        initial["t"] = [0.0]
    traj = dtx.Trajectory.create(
        data,
        timestep="dt",
        controls=("u", "dt"),
        initial=initial,
        final={"x": np.asarray(xs[-1])},
        bounds={"dt": (0.01, 0.5), "u": 1.0},
    )
    obj = dtx.QuadraticRegularizer.create("u", traj, 1.0)
    if with_t:
        obj = obj + dtx.MinimumTimeObjective.create(traj, 1.0)
    cons = [dtx.TimeStepsAllEqualConstraint()] if all_equal else []
    return dtx.DirectTrajOptProblem.create(traj, obj, [integ], constraints=cons)


def test_time_consistency_rows_leave_the_border():
    for N in (11, 31):
        S = analyze(make_nlp(_free_time_problem(N)))
        assert S.promo_jr.shape[1] == 1  # t promoted to a state
        assert 4 in S.s_idx  # the t coordinate
        assert len(S.lin_border_rows) == 0  # all N-1 rows in the core
        # border width independent of N: only the two final-x pins remain
        assert len(S.bp_steps) == 2


def test_timesteps_all_equal_promotes():
    S = analyze(make_nlp(_free_time_problem(15, with_t=False, all_equal=True)))
    assert S.promo_jr.shape[1] == 1  # dt promoted
    assert len(S.lin_border_rows) == 0


def test_promoted_solve_matches_dense():
    prob = _free_time_problem(21)
    r1 = dtx.solve(prob, backend="riccati", max_iter=300, tol=1e-9)
    r2 = dtx.solve(prob, backend="dense", max_iter=300, tol=1e-9)
    assert bool(r1.converged) and bool(r2.converged)
    Z1 = np.asarray(r1.problem.trajectory.to_zvec())
    Z2 = np.asarray(r2.problem.trajectory.to_zvec())
    assert np.max(np.abs(Z1 - Z2)) < 1e-5
    # time consistency holds at the solution
    tr = r1.problem.trajectory
    t, dt = np.asarray(tr.data["t"])[:, 0], np.asarray(tr.data["dt"])[:, 0]
    assert np.max(np.abs(t[1:] - t[:-1] - dt[:-1])) < 1e-7


def test_promoted_multipliers_match_dense():
    """λ for promoted rows (recovered through the core sweep with the 1/β
    rescale) must equal the dense backend's multipliers for the same rows."""
    prob = _free_time_problem(13)
    r1 = dtx.solve(prob, backend="riccati", max_iter=300, tol=1e-10)
    r2 = dtx.solve(prob, backend="dense", max_iter=300, tol=1e-10)
    lam1 = np.asarray(r1.ipm.state.lam)
    lam2 = np.asarray(r2.ipm.state.lam)
    assert lam1.shape == lam2.shape
    assert np.max(np.abs(lam1 - lam2)) < 1e-4, np.max(np.abs(lam1 - lam2))


def test_pinned_promoted_target_goes_to_border():
    """A pinned final t (fixed total duration) turns the last chain row into
    a border-pinned row — exercising the 1/β rescale on the bp path."""
    rng = np.random.default_rng(0)
    N = 13
    G = (np.array([[0.0, 1.0], [-1.0, 0.0]]), [np.array([[0.0, 1.0], [1.0, 0.0]])])
    integ = dtx.BilinearIntegrator.create(G, "x", "u", None)
    u = 0.3 * rng.standard_normal((N, 1))
    xs = dtx.bilinear_rollout(integ, jnp.array([1.0, 0.0]), jnp.asarray(u), 0.1)
    t = (np.cumsum(np.full(N, 0.1)) - 0.1).reshape(N, 1)
    traj = dtx.Trajectory.create(
        {"x": np.asarray(xs), "u": u, "dt": np.full((N, 1), 0.1), "t": t},
        timestep="dt",
        controls=("u", "dt"),
        initial={"x": [1.0, 0.0], "t": [0.0]},
        final={"x": np.asarray(xs[-1]), "t": [float(t[-1, 0])]},
        bounds={"dt": (0.01, 0.5), "u": 1.0},
    )
    prob = dtx.DirectTrajOptProblem.create(
        traj, dtx.QuadraticRegularizer.create("u", traj, 1.0), [integ]
    )
    S = analyze(make_nlp(prob))
    assert S.promo_jr.shape[1] == 1
    assert len(S.bp_steps) == 3  # 2 final-x pins + the pinned final-t chain row
    r1 = dtx.solve(prob, backend="riccati", max_iter=300, tol=1e-10)
    r2 = dtx.solve(prob, backend="dense", max_iter=300, tol=1e-10)
    assert bool(r1.converged) and bool(r2.converged)
    Z1 = np.asarray(r1.problem.trajectory.to_zvec())
    Z2 = np.asarray(r2.problem.trajectory.to_zvec())
    assert np.max(np.abs(Z1 - Z2)) < 1e-6
    lam1 = np.asarray(r1.ipm.state.lam)
    lam2 = np.asarray(r2.ipm.state.lam)
    assert np.max(np.abs(lam1 - lam2)) < 1e-6


def test_all_equal_solve_agrees():
    prob = _free_time_problem(15, with_t=False, all_equal=True)
    r1 = dtx.solve(prob, backend="riccati", max_iter=300, tol=1e-9)
    r2 = dtx.solve(prob, backend="dense", max_iter=300, tol=1e-9)
    assert bool(r1.converged) and bool(r2.converged)
    dt = np.asarray(r1.problem.trajectory.data["dt"])[:, 0]
    assert np.max(np.abs(dt - dt[0])) < 1e-7  # all equal holds
    Z1 = np.asarray(r1.problem.trajectory.to_zvec())
    Z2 = np.asarray(r2.problem.trajectory.to_zvec())
    assert np.max(np.abs(Z1 - Z2)) < 1e-5
