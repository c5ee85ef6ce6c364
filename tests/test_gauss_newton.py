"""Gauss-Newton Hessian mode (IPMOptions.hessian_approximation).

GN changes only the step *model* — the KKT convergence test uses exact
gradients — so a converged GN solve must land on the same KKT point as an
exact-Hessian solve. These tests assert that point-to-point on both operator
backends, including the arrowhead/global path (whose λ-weighted cross blocks
GN drops). The measured iteration-count effects are documented in
`options.py`; the reference's analogous knob is Ipopt's
``hessian_approximation`` (`/root/reference/src/solvers/ipopt_solver/options.jl:74`).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import directtrajopt_tpu as dtx
from directtrajopt_tpu.solvers import IPMOptions, solve_jit

G_DRIFT = np.array([[0.0, -1.0], [1.0, 0.0]])
G_DRIVE = np.array([[0.0, 1.0], [1.0, 0.0]])


def _bounded_problem():
    # the non-degenerate bounded fixture from test_riccati (known to converge
    # to tol=1e-8 on both backends)
    rng = np.random.default_rng(4)
    N = 16
    integ = dtx.BilinearIntegrator.create((G_DRIFT, [G_DRIVE]), "x", "u", None)
    u = 0.3 * np.sin(np.linspace(0, 5, N))[:, None]
    xs = dtx.bilinear_rollout(integ, jnp.array([1.0, 0.0]), jnp.asarray(u), 0.12)
    traj = dtx.Trajectory.create(
        {"x": np.asarray(xs) + 0.03 * rng.normal(size=(N, 2)), "u": u},
        timestep=0.12,
        controls="u",
        initial={"x": [1.0, 0.0]},
        final={"x": np.asarray(xs[-1])},
        bounds={"u": 0.5},
    )
    return dtx.DirectTrajOptProblem.create(
        traj, dtx.QuadraticRegularizer.create("u", traj, 1.0), integ
    )


def _globals_problem():
    # the arrowhead fixture from test_riccati: global θ coupled through a
    # knot equality, a global objective, and a global linear row
    rng = np.random.default_rng(7)
    N = 12
    integ = dtx.BilinearIntegrator.create((G_DRIFT, [G_DRIVE]), "x", "u", None)
    u = 0.3 * np.sin(np.linspace(0, 4, N))[:, None]
    xs = dtx.bilinear_rollout(integ, jnp.array([1.0, 0.0]), jnp.asarray(u), 0.12)
    traj = dtx.Trajectory.create(
        {"x": np.asarray(xs) + 0.02 * rng.normal(size=(N, 2)), "u": u},
        timestep=0.12,
        controls="u",
        initial={"x": [1.0, 0.0]},
        final={"x": np.asarray(xs[-1])},
        bounds={"u": 0.8, "theta": 3.0},
        global_data={"theta": [0.4, -0.2]},
    )
    obj = (
        dtx.QuadraticRegularizer.create("u", traj, 1.0)
        + dtx.GlobalObjective.create(
            lambda th: jnp.sum((th - 0.3) ** 2), "theta", traj
        )
        + dtx.GlobalKnotPointObjective.create(
            lambda v: 0.02 * (v[1] - v[-1]) ** 2, "x", "theta", traj
        )
    )
    cons = [
        dtx.NonlinearGlobalKnotPointConstraint.create(
            lambda v: jnp.array([v[0] - 0.5 * v[-2] - 0.1]),
            "u",
            "theta",
            traj,
            times=[3],
        ),
        dtx.GlobalLinearConstraint.create(
            "theta", np.array([[1.0, 1.0]]), lb=[0.2], ub=[0.2]
        ),
    ]
    return dtx.DirectTrajOptProblem.create(
        traj,
        obj,
        [dtx.BilinearIntegrator.create((G_DRIFT, [G_DRIVE]), "x", "u", traj)],
        constraints=cons,
    )


def _assert_gn_matches(prob, backend, atol=1e-5):
    kw = dict(tol=1e-8, max_iter=300)
    res_ex = solve_jit(prob, IPMOptions(**kw), backend=backend)
    res_gn = solve_jit(
        prob,
        IPMOptions(hessian_approximation="gauss_newton", **kw),
        backend=backend,
    )
    assert bool(res_ex.converged), f"exact failed: kkt={float(res_ex.kkt_error)}"
    assert bool(res_gn.converged), f"GN failed: kkt={float(res_gn.kkt_error)}"
    np.testing.assert_allclose(
        np.asarray(res_gn.ipm.Z), np.asarray(res_ex.ipm.Z), atol=atol
    )


@pytest.mark.parametrize("backend", ["riccati", "dense"])
def test_gn_matches_exact_bounded(backend):
    _assert_gn_matches(_bounded_problem(), backend)


@pytest.mark.parametrize("backend", ["riccati", "dense"])
def test_gn_matches_exact_globals(backend):
    _assert_gn_matches(_globals_problem(), backend)
