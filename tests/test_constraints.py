"""Constraint tests: linear lowering to canonical form + nonlinear AD-vs-FD,
mirroring the reference's constraint testitems."""

import jax.numpy as jnp
import numpy as np
import pytest

from directtrajopt_tpu.constraints import (
    AllEqualConstraint,
    DurationConstraint,
    EqualityConstraint,
    GlobalLinearConstraint,
    L1SlackConstraint,
    LinearCanon,
    NonlinearGlobalConstraint,
    NonlinearGlobalKnotPointConstraint,
    NonlinearKnotPointConstraint,
    SymmetryConstraint,
    TimeConsistencyConstraint,
    TotalConstraint,
)
from directtrajopt_tpu.problem import DirectTrajOptProblem, get_trajectory_constraints
from directtrajopt_tpu.solvers.canonical import make_nlp
from directtrajopt_tpu.objectives import NullObjective
from directtrajopt_tpu.integrators import DerivativeIntegrator
from directtrajopt_tpu.trajectory import Trajectory
from directtrajopt_tpu.utils.testing import check_constraint


def make_traj(N=6, with_globals=False, seed=0):
    rng = np.random.default_rng(seed)
    data = {
        "x": rng.normal(size=(N, 2)),
        "u": rng.normal(size=(N, 1)),
        "t": np.cumsum(np.full((N, 1), 0.1), axis=0) - 0.1,
        "dt": np.full((N, 1), 0.1),
    }
    return Trajectory.create(
        data,
        timestep="dt",
        controls="u",
        initial={"x": [0.0, 0.0]},
        final={"x": [1.0, 0.0]},
        bounds={"u": 1.0, "dt": (0.01, 0.5)},
        global_data={"theta": rng.normal(size=3)} if with_globals else None,
    )


def lower_one(con, traj):
    canon = LinearCanon(z_dim=traj.layout.z_dim)
    con.lower(traj.layout, canon)
    return canon


def dense_rows(canon, z_dim, kind="eq"):
    entries = canon.eq_rows if kind == "eq" else canon.ineq_rows
    n_rows = sum(e[4] for e in entries)
    A = np.zeros((n_rows, z_dim))
    b = np.zeros(n_rows)
    off = 0
    for rows, cols, vals, rhs, n in entries:
        np.add.at(A, (rows + off, cols), np.asarray(vals))
        b[off : off + n] = np.asarray(rhs)
        off += n
    return A, b


def test_equality_pin():
    traj = make_traj()
    con = EqualityConstraint.create("x", [0, 5], [0.5, -0.5])
    canon = lower_one(con, traj)
    lay = traj.layout
    idx = np.concatenate(canon.fix_idx)
    vals = np.concatenate([np.asarray(v) for v in canon.fix_val])
    expect_idx = np.concatenate(
        [np.arange(lay.z_slice(0, "x").start, lay.z_slice(0, "x").stop),
         np.arange(lay.z_slice(5, "x").start, lay.z_slice(5, "x").stop)]
    )
    np.testing.assert_array_equal(np.sort(idx), np.sort(expect_idx))
    np.testing.assert_allclose(vals, [0.5, -0.5, 0.5, -0.5])


def test_equality_per_time_matrix():
    traj = make_traj()
    vals = np.array([[0.1, 0.2], [0.3, 0.4]])
    con = EqualityConstraint.create("x", [1, 2], vals)
    canon = lower_one(con, traj)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(v) for v in canon.fix_val]), vals.reshape(-1)
    )


def test_all_equal_constraint():
    traj = make_traj()
    con = AllEqualConstraint(name="u", component_index=0)
    canon = lower_one(con, traj)
    A, b = dense_rows(canon, traj.layout.z_dim)
    assert A.shape[0] == traj.N - 1
    Z = np.asarray(traj.to_zvec())
    # residual = u_{k+1} - u_k (adjacent chain form — equivalent to the
    # reference's anchor form, and promotable into the Riccati core)
    u = np.asarray(traj.data["u"][:, 0])
    np.testing.assert_allclose(A @ Z - b, u[1:] - u[:-1], atol=1e-12)


def test_duration_constraint():
    traj = make_traj()
    con = DurationConstraint(0.45)
    canon = lower_one(con, traj)
    A, b = dense_rows(canon, traj.layout.z_dim)
    assert A.shape[0] == 1
    Z = np.asarray(traj.to_zvec())
    np.testing.assert_allclose(
        (A @ Z)[0], np.sum(np.asarray(traj.data["dt"][:-1, 0])), atol=1e-12
    )
    np.testing.assert_allclose(b, [0.45])


def test_total_constraint_nontimestep():
    traj = make_traj()
    con = TotalConstraint.create("u", 2.0)
    canon = lower_one(con, traj)
    A, b = dense_rows(canon, traj.layout.z_dim)
    Z = np.asarray(traj.to_zvec())
    np.testing.assert_allclose(
        (A @ Z)[0], np.sum(np.asarray(traj.data["u"][:, 0])), atol=1e-12
    )


def test_total_constraint_range():
    """lb=/ub= form lowers to inequality rows Σv ≤ ub and −Σv ≤ −lb."""
    traj = make_traj()
    con = TotalConstraint.create("u", lb=-1.5, ub=2.0)
    canon = lower_one(con, traj)
    A, b = dense_rows(canon, traj.layout.z_dim, kind="ineq")
    assert A.shape[0] == 2
    Z = np.asarray(traj.to_zvec())
    total = np.sum(np.asarray(traj.data["u"][:, 0]))
    np.testing.assert_allclose((A @ Z)[0], total, atol=1e-12)
    np.testing.assert_allclose((A @ Z)[1], -total, atol=1e-12)
    np.testing.assert_allclose(b, [2.0, 1.5])
    # one-sided forms
    con_ub = DurationConstraint(ub=0.6)
    canon_ub = lower_one(con_ub, traj)
    A_ub, b_ub = dense_rows(canon_ub, traj.layout.z_dim, kind="ineq")
    assert A_ub.shape[0] == 1 and b_ub[0] == 0.6
    import pytest

    with pytest.raises(ValueError):
        TotalConstraint.create("u")
    with pytest.raises(ValueError):
        TotalConstraint.create("u", 1.0, ub=2.0)


def test_symmetry_constraint():
    traj = make_traj()
    con = SymmetryConstraint.create("x", [0, 1], even=True)
    canon = lower_one(con, traj)
    A, b = dense_rows(canon, traj.layout.z_dim)
    assert A.shape[0] == (traj.N // 2) * 2
    # build a symmetric trajectory -> rows satisfied
    x = np.asarray(traj.data["x"]).copy()
    for t in range(traj.N // 2):
        x[traj.N - 1 - t] = x[t]
    sym = traj.update(x=x)
    np.testing.assert_allclose(A @ np.asarray(sym.to_zvec()) - b, 0.0, atol=1e-12)
    # odd symmetry
    con_odd = SymmetryConstraint.create("x", [0], even=False)
    canon = lower_one(con_odd, traj)
    A, b = dense_rows(canon, traj.layout.z_dim)
    x = np.asarray(traj.data["x"]).copy()
    for t in range(traj.N // 2):
        x[traj.N - 1 - t, 0] = -x[t, 0]
    np.testing.assert_allclose(
        A @ np.asarray(traj.update(x=x).to_zvec()) - b, 0.0, atol=1e-12
    )


def test_time_consistency():
    traj = make_traj()
    con = TimeConsistencyConstraint()
    canon = lower_one(con, traj)
    A, b = dense_rows(canon, traj.layout.z_dim)
    # our fixture has consistent t/dt -> rows ~ 0
    np.testing.assert_allclose(A @ np.asarray(traj.to_zvec()) - b, 0.0, atol=1e-10)


def test_l1_slack_constraint():
    traj = make_traj().add_component("s", np.full((6, 1), 2.0), bounds=(0.0, np.inf))
    con = L1SlackConstraint.create("u", "s", traj)
    canon = lower_one(con, traj)
    A, b = dense_rows(canon, traj.layout.z_dim, "ineq")
    assert A.shape[0] == 2 * traj.N
    vals = A @ np.asarray(traj.to_zvec()) - b
    u = np.asarray(traj.data["u"][:, 0])
    np.testing.assert_allclose(vals[0::2], u - 2.0, atol=1e-12)
    np.testing.assert_allclose(vals[1::2], -u - 2.0, atol=1e-12)


def test_global_linear_constraint():
    traj = make_traj(with_globals=True)
    A = np.array([[1.0, -1.0, 0.0], [0.0, 1.0, 1.0]])
    con = GlobalLinearConstraint.create(
        "theta", A, lb=[0.0, -1.0], ub=[0.0, 2.0]
    )
    canon = lower_one(con, traj)
    Aeq, beq = dense_rows(canon, traj.layout.z_dim)
    Ain, bin_ = dense_rows(canon, traj.layout.z_dim, "ineq")
    assert Aeq.shape[0] == 1 and Ain.shape[0] == 2
    th = np.asarray(traj.global_data["theta"])
    Z = np.asarray(traj.to_zvec())
    np.testing.assert_allclose((Aeq @ Z)[0], th[0] - th[1], atol=1e-12)
    np.testing.assert_allclose(Ain @ Z - bin_, [th[1] + th[2] - 2.0, -(th[1] + th[2]) + (-1.0)], atol=1e-12)


def test_global_linear_infeasible_row_raises():
    with pytest.raises(ValueError):
        GlobalLinearConstraint.create("theta", np.zeros((1, 3)), lb=[1.0], ub=[1.0])


def test_nonlinear_knot_point_constraint():
    traj = make_traj()
    con = NonlinearKnotPointConstraint.create(
        lambda x: jnp.array([jnp.sum(x**2) - 1.0]), "x", traj
    )
    assert con.g_dim == 1 and con.constraint_dim(traj.layout) == traj.N
    vals = np.asarray(con.evaluate_flat(traj))
    expect = np.sum(np.asarray(traj.data["x"]) ** 2, axis=1) - 1.0
    np.testing.assert_allclose(vals, expect, atol=1e-10)
    check_constraint(con, traj)


def test_nonlinear_knot_point_separate_args():
    traj = make_traj()
    con = NonlinearKnotPointConstraint.create(
        lambda x, u: jnp.array([x[0] - u[0] ** 2]), ["x", "u"], traj,
        equality=False, times=[1, 3],
    )
    assert con.convention == "separate"
    vals = np.asarray(con.evaluate_flat(traj))
    for i, t in enumerate([1, 3]):
        np.testing.assert_allclose(
            vals[i],
            np.asarray(traj.data["x"][t, 0]) - np.asarray(traj.data["u"][t, 0]) ** 2,
            atol=1e-10,
        )
    check_constraint(con, traj)


def test_nonlinear_knot_point_params():
    traj = make_traj()
    targets = [np.array([0.1, 0.2]), np.array([0.3, 0.4])]
    con = NonlinearKnotPointConstraint.create(
        lambda x, p: x - p, "x", traj, targets, times=[0, 2]
    )
    vals = np.asarray(con.evaluate_flat(traj))
    np.testing.assert_allclose(
        vals[:2], np.asarray(traj.data["x"][0]) - targets[0], atol=1e-10
    )
    check_constraint(con, traj)


def test_nonlinear_global_constraint():
    traj = make_traj(with_globals=True)
    con = NonlinearGlobalConstraint.create(
        lambda th: jnp.array([jnp.sum(th**2) - 1.0]), "theta", traj
    )
    vals = np.asarray(con.evaluate_flat(traj))
    np.testing.assert_allclose(
        vals, [np.sum(np.asarray(traj.global_data["theta"]) ** 2) - 1.0], atol=1e-10
    )
    check_constraint(con, traj)


def test_nonlinear_global_knot_point_constraint():
    traj = make_traj(with_globals=True)
    con = NonlinearGlobalKnotPointConstraint.create(
        lambda v: jnp.array([jnp.sum(v)]), "x", "theta", traj, times=[2, 4]
    )
    vals = np.asarray(con.evaluate_flat(traj))
    th = np.asarray(traj.global_data["theta"])
    for i, t in enumerate([2, 4]):
        np.testing.assert_allclose(
            vals[i], np.sum(np.asarray(traj.data["x"][t])) + np.sum(th), atol=1e-10
        )
    check_constraint(con, traj)


def test_trajectory_constraint_extraction():
    traj = make_traj()
    cons = get_trajectory_constraints(traj)
    labels = [c.label for c in cons]
    assert "initial value of x" in labels
    assert "final value of x" in labels
    assert "bounds on u" in labels
    assert any("time consistency" in l for l in labels)
    assert any("initial time" in l for l in labels)
    # x pinned both ends -> u bounds apply everywhere, x absent from bounds
    bc = [c for c in cons if getattr(c, "name", None) == "u"][0]
    assert bc.times == tuple(range(traj.N))


def test_problem_canonicalization():
    traj = make_traj()
    prob = DirectTrajOptProblem.create(
        traj, NullObjective(), [DerivativeIntegrator.create("x", "u", traj)]
    )
    nlp = make_nlp(prob)
    # dynamics rows: 2*(N-1); lin eq rows: time consistency (N-1)
    assert nlp.n_dyn == 2 * (traj.N - 1)
    assert nlp.n_lin_eq == traj.N - 1
    # pins: x at 0 and N-1 (4 coords) + t_0 (1 coord)
    assert len(nlp.fix_idx) == 5
    Z = traj.to_zvec()
    assert nlp.c_eq(Z).shape == (nlp.n_eq,)
    # bounds: u bounded everywhere, dt bounded
    lb = np.asarray(nlp.lb)
    lay = traj.layout
    assert lb[lay.z_slice(2, "u").start] == -1.0
    assert lb[lay.z_slice(2, "dt").start] == 0.01
    # apply_pins writes pin values
    Z2 = nlp.apply_pins(Z + 100.0)
    np.testing.assert_allclose(
        np.asarray(Z2)[lay.z_slice(0, "x")], [0.0, 0.0], atol=1e-12
    )


def test_free_dt_default_bound_warning():
    N = 5
    traj = Trajectory.create(
        {"x": np.zeros((N, 1)), "dt": np.full((N, 1), 0.1)}, timestep="dt"
    )
    with pytest.warns(UserWarning, match="no bounds"):
        prob = DirectTrajOptProblem.create(
            traj, NullObjective(), [DerivativeIntegrator.create("x", "x", traj)]
        )
    nlp = make_nlp(prob)
    lay = prob.trajectory.layout
    assert np.asarray(nlp.lb)[lay.z_slice(2, "dt").start] == 0.0
