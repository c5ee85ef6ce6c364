"""Structured derivative assembly vs whole-vector AD (the correctness anchor
for the KKT paths)."""

import jax
import jax.numpy as jnp
import numpy as np

from directtrajopt_tpu.constraints import (
    L1SlackConstraint,
    NonlinearGlobalConstraint,
    NonlinearGlobalKnotPointConstraint,
    NonlinearKnotPointConstraint,
    SymmetryConstraint,
)
from directtrajopt_tpu.integrators import BilinearIntegrator, DerivativeIntegrator
from directtrajopt_tpu.objectives import (
    GlobalObjective,
    MinimumTimeObjective,
    QuadraticRegularizer,
    TerminalObjective,
)
from directtrajopt_tpu.problem import DirectTrajOptProblem
from directtrajopt_tpu.solvers import assembly
from directtrajopt_tpu.solvers.canonical import make_nlp
from directtrajopt_tpu.trajectory import Trajectory

G_DRIFT = np.array([[-0.1, 1.0], [-1.0, -0.1]])
G_DRIVE = np.array([[0.0, 1.0], [1.0, 0.0]])


def make_problem(with_globals=False, N=7, seed=0):
    rng = np.random.default_rng(seed)
    data = {
        "x": rng.normal(size=(N, 2)),
        "u": 0.3 * rng.normal(size=(N, 1)),
        "du": 0.3 * rng.normal(size=(N, 1)),
        "s": 0.5 + 0.1 * rng.random((N, 1)),
        "dt": np.full((N, 1), 0.12),
    }
    traj = Trajectory.create(
        data,
        timestep="dt",
        controls=("u", "du"),
        initial={"x": [1.0, 0.0], "u": [0.0]},
        final={"x": [0.0, 1.0], "u": [0.0]},
        bounds={"u": 0.8, "dt": (0.05, 0.3), "s": (0.0, np.inf)},
        global_data={"theta": rng.normal(size=2)} if with_globals else None,
    )
    integrators = [
        BilinearIntegrator.create((G_DRIFT, [G_DRIVE]), "x", "u", traj),
        DerivativeIntegrator.create("u", "du", traj),
    ]
    obj = (
        QuadraticRegularizer.create("u", traj, 1.0)
        + 1e-2 * QuadraticRegularizer.create("du", traj, 1.0)
        + 0.1 * MinimumTimeObjective.create(traj, 1.0)
        + TerminalObjective(lambda x: jnp.sum((x - 1.0) ** 2), "x", traj, Q=5.0)
    )
    cons = [
        SymmetryConstraint.create("u", [0], even=True),
        L1SlackConstraint.create("du", "s", traj),
        NonlinearKnotPointConstraint.create(
            lambda x: jnp.array([jnp.sum(x**2) - 4.0]), "x", traj, equality=False
        ),
        NonlinearKnotPointConstraint.create(
            lambda u: jnp.array([u[0] ** 3]), "u", traj, times=[2, 4]
        ),
    ]
    if with_globals:
        obj = obj + GlobalObjective.create(lambda th: jnp.sum(th**4), "theta", traj)
        cons.append(
            NonlinearGlobalConstraint.create(
                lambda th: jnp.array([jnp.sum(th**2) - 1.0]), "theta", traj
            )
        )
        cons.append(
            NonlinearGlobalKnotPointConstraint.create(
                lambda v: jnp.array([v[0] * v[-1]]), "x", "theta", traj,
                times=[1, 3], equality=False,
            )
        )
    return DirectTrajOptProblem.create(traj, obj, integrators, constraints=cons)


def _check(with_globals):
    prob = make_problem(with_globals)
    nlp = make_nlp(prob)
    Z = prob.trajectory.to_zvec()

    J_eq = np.asarray(assembly.jac_eq(nlp, Z))
    J_eq_ad = np.asarray(jax.jacfwd(nlp.c_eq)(Z))
    np.testing.assert_allclose(J_eq, J_eq_ad, atol=1e-10)

    J_in = np.asarray(assembly.jac_in(nlp, Z))
    J_in_ad = np.asarray(jax.jacfwd(nlp.c_in)(Z))
    np.testing.assert_allclose(J_in, J_in_ad, atol=1e-10)

    rng = np.random.default_rng(1)
    lam = jnp.asarray(rng.normal(size=nlp.n_eq))
    nu = jnp.asarray(rng.normal(size=nlp.n_in))
    sigma = 0.7

    H = np.asarray(assembly.hess_lagrangian(nlp, Z, lam, nu, sigma))

    def lagr(z):
        return (
            sigma * nlp.objective(z)
            + jnp.dot(lam, nlp.c_eq(z))
            + jnp.dot(nu, nlp.c_in(z))
        )

    H_ad = np.asarray(jax.hessian(lagr)(Z))
    np.testing.assert_allclose(H, H_ad, atol=1e-8)

    g = np.asarray(assembly.gradient(nlp, Z))
    g_ad = np.asarray(jax.grad(nlp.objective)(Z))
    np.testing.assert_allclose(g, g_ad, atol=1e-12)


def test_assembly_no_globals():
    _check(with_globals=False)


def test_assembly_with_globals():
    _check(with_globals=True)
