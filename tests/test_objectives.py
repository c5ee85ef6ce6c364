"""Objective tests: value semantics, AD-vs-FD derivatives, composition —
mirroring the reference's objective testitems
(`src/objectives/regularizers.jl:317-339`, `_objectives.jl:261-336`)."""

import jax
import jax.numpy as jnp
import numpy as np

from directtrajopt_tpu.objectives import (
    CompositeObjective,
    GlobalKnotPointObjective,
    GlobalObjective,
    KnotPointObjective,
    LinearRegularizer,
    MinimumTimeObjective,
    NullObjective,
    QuadraticRegularizer,
    TerminalObjective,
    knot_hvp,
    objective_value,
)
from directtrajopt_tpu.trajectory import Trajectory
from directtrajopt_tpu.utils.testing import check_objective


def make_traj(N=6, free_time=True, with_globals=False, seed=0):
    rng = np.random.default_rng(seed)
    data = {"x": rng.normal(size=(N, 2)), "u": rng.normal(size=(N, 1))}
    if free_time:
        data["dt"] = 0.1 + 0.02 * rng.random((N, 1))
    return Trajectory.create(
        data,
        timestep="dt" if free_time else 0.1,
        controls="u",
        global_data={"theta": rng.normal(size=3)} if with_globals else None,
    )


def test_quadratic_regularizer_value():
    traj = make_traj()
    reg = QuadraticRegularizer.create("u", traj, 2.0)
    J = float(objective_value(reg, traj))
    expect = 0.0
    for k in range(traj.N):
        dt = float(traj.data["dt"][k, 0])
        u = np.asarray(traj.data["u"][k])
        r = dt * u
        expect += 0.5 * r @ (2.0 * r)
    np.testing.assert_allclose(J, expect, rtol=1e-12)


def test_quadratic_regularizer_derivatives():
    traj = make_traj()
    reg = QuadraticRegularizer.create("u", traj, 1.5)
    check_objective(reg, traj)


def test_quadratic_regularizer_baseline_and_times():
    traj = make_traj()
    baseline = np.ones((traj.N, 1)) * 0.3
    reg = QuadraticRegularizer.create("u", traj, 1.0, baseline=baseline, times=[1, 3])
    J = float(objective_value(reg, traj))
    expect = 0.0
    for k in [1, 3]:
        dt = float(traj.data["dt"][k, 0])
        r = dt * (np.asarray(traj.data["u"][k]) - 0.3)
        expect += 0.5 * float(r @ r)
    np.testing.assert_allclose(J, expect, rtol=1e-12)
    check_objective(reg, traj)


def test_linear_regularizer():
    traj = make_traj()
    reg = LinearRegularizer.create("u", traj, 0.5)
    J = float(objective_value(reg, traj))
    expect = sum(
        0.5 * float(traj.data["dt"][k, 0]) * float(traj.data["u"][k, 0])
        for k in range(traj.N)
    )
    np.testing.assert_allclose(J, expect, rtol=1e-12)
    check_objective(reg, traj)


def test_minimum_time():
    traj = make_traj()
    obj = MinimumTimeObjective.create(traj, 2.0)
    J = float(objective_value(obj, traj))
    np.testing.assert_allclose(
        J, 2.0 * float(np.sum(np.asarray(traj.data["dt"])[:-1, 0])), rtol=1e-12
    )
    check_objective(obj, traj)


def test_knot_point_objective():
    traj = make_traj()
    obj = KnotPointObjective.create(
        lambda xu: jnp.sum(xu**2), ["x", "u"], traj
    )
    J = float(objective_value(obj, traj))
    expect = float(np.sum(np.asarray(traj.data["x"]) ** 2)) + float(
        np.sum(np.asarray(traj.data["u"]) ** 2)
    )
    np.testing.assert_allclose(J, expect, rtol=1e-10)
    check_objective(obj, traj)


def test_knot_point_objective_params_and_weights():
    traj = make_traj()
    targets = [np.full(2, 0.1 * k) for k in range(3)]
    obj = KnotPointObjective.create(
        lambda x, p: jnp.sum((x - p) ** 2),
        "x",
        traj,
        targets,
        times=[0, 2, 4],
        Qs=[1.0, 2.0, 3.0],
    )
    J = float(objective_value(obj, traj))
    expect = 0.0
    for q, t, p in zip([1.0, 2.0, 3.0], [0, 2, 4], targets):
        expect += q * float(np.sum((np.asarray(traj.data["x"][t]) - p) ** 2))
    np.testing.assert_allclose(J, expect, rtol=1e-10)
    check_objective(obj, traj)


def test_terminal_objective():
    traj = make_traj()
    goal = np.array([1.0, 0.0])
    obj = TerminalObjective(
        lambda x: jnp.sum((x - jnp.asarray(goal)) ** 2), "x", traj, Q=10.0
    )
    J = float(objective_value(obj, traj))
    expect = 10.0 * float(np.sum((np.asarray(traj.data["x"][-1]) - goal) ** 2))
    np.testing.assert_allclose(J, expect, rtol=1e-10)


def test_composition():
    traj = make_traj()
    r1 = QuadraticRegularizer.create("u", traj, 1.0)
    r2 = QuadraticRegularizer.create("x", traj, 1.0)
    mt = MinimumTimeObjective.create(traj, 1.0)
    combined = 2.0 * r1 + r2 + 0.5 * mt
    assert isinstance(combined, CompositeObjective)
    assert len(combined.objectives) == 3  # flattened
    J = float(objective_value(combined, traj))
    expect = (
        2.0 * float(objective_value(r1, traj))
        + float(objective_value(r2, traj))
        + 0.5 * float(objective_value(mt, traj))
    )
    np.testing.assert_allclose(J, expect, rtol=1e-12)
    check_objective(combined, traj)
    # nested composition flattens
    nested = 3.0 * combined + r1
    assert len(nested.objectives) == 4
    np.testing.assert_allclose(
        float(objective_value(nested, traj)),
        3.0 * J + float(objective_value(r1, traj)),
        rtol=1e-12,
    )


def test_null_objective():
    traj = make_traj()
    assert float(objective_value(NullObjective(), traj)) == 0.0


def test_global_objective():
    traj = make_traj(with_globals=True)
    obj = GlobalObjective.create(lambda th: jnp.sum(th**2), "theta", traj, Q=2.0)
    J = float(objective_value(obj, traj))
    np.testing.assert_allclose(
        J, 2.0 * float(np.sum(np.asarray(traj.global_data["theta"]) ** 2)), rtol=1e-12
    )
    check_objective(obj, traj)


def test_global_knot_point_objective():
    traj = make_traj(with_globals=True)
    obj = GlobalKnotPointObjective.create(
        lambda v: jnp.sum(v**2), "x", "theta", traj, times=[2, 5]
    )
    J = float(objective_value(obj, traj))
    th = np.asarray(traj.global_data["theta"])
    expect = sum(
        float(np.sum(np.asarray(traj.data["x"][t]) ** 2)) + float(np.sum(th**2))
        for t in [2, 5]
    )
    np.testing.assert_allclose(J, expect, rtol=1e-10)
    check_objective(obj, traj)


def test_knot_hvp():
    traj = make_traj()
    layout = traj.layout
    obj = KnotPointObjective.create(lambda x: jnp.sum(x**4), "x", traj)
    z = traj.knot_matrix()[2]
    g = jnp.zeros((0,))
    v = jnp.arange(1.0, layout.dim + 1)
    hv = knot_hvp(obj, layout, z, g, 2, v)
    H = jax.hessian(lambda zz: obj.cost_at_knot(layout, zz, g, 2))(z)
    np.testing.assert_allclose(np.asarray(hv), np.asarray(H @ v), atol=1e-10)
