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

    rng = np.random.default_rng(1)
    lam = jnp.asarray(rng.normal(size=nlp.n_eq))
    nu = jnp.asarray(rng.normal(size=nlp.n_in))
    sigma = 0.7

    def lagr(z):
        return (
            sigma * nlp.objective(z)
            + jnp.dot(lam, nlp.c_eq(z))
            + jnp.dot(nu, nlp.c_in(z))
        )

    # one jit around the whole pipeline: eager per-op dispatch through the
    # O(z_dim²) AD graphs dominates suite wall time otherwise
    def run():
        return dict(
            J_eq=assembly.jac_eq(nlp, Z),
            J_eq_ad=jax.jacfwd(nlp.c_eq)(Z),
            J_in=assembly.jac_in(nlp, Z),
            J_in_ad=jax.jacfwd(nlp.c_in)(Z),
            H=assembly.hess_lagrangian(nlp, Z, lam, nu, sigma),
            H_ad=jax.hessian(lagr)(Z),
            g=assembly.gradient(nlp, Z),
            g_ad=jax.grad(nlp.objective)(Z),
        )

    o = {k: np.asarray(v) for k, v in jax.jit(run)().items()}
    np.testing.assert_allclose(o["J_eq"], o["J_eq_ad"], atol=1e-10)
    np.testing.assert_allclose(o["J_in"], o["J_in_ad"], atol=1e-10)
    np.testing.assert_allclose(o["H"], o["H_ad"], atol=1e-8)
    np.testing.assert_allclose(o["g"], o["g_ad"], atol=1e-12)


def test_assembly_no_globals():
    _check(with_globals=False)


def test_assembly_with_globals():
    _check(with_globals=True)
