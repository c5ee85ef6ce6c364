"""Integrator tests: residual semantics + AD-vs-finite-difference validation,
mirroring the reference's per-integrator testitems
(`src/integrators/bilinear_integrator.jl:167-175`,
`src/integrators/derivative_integrator.jl:118-123`)."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg

from directtrajopt_tpu.integrators import (
    BilinearIntegrator,
    DerivativeIntegrator,
    evaluate,
    stack_residuals,
)
from directtrajopt_tpu.ops.expm import expm_pade
from directtrajopt_tpu.trajectory import Trajectory
from directtrajopt_tpu.utils.testing import check_integrator


def bilinear_traj(N=8, free_time=True, seed=0):
    rng = np.random.default_rng(seed)
    data = {
        "x": rng.normal(size=(N, 2)),
        "u": rng.normal(size=(N, 1)),
    }
    if free_time:
        data["dt"] = np.full((N, 1), 0.1) + 0.01 * rng.random((N, 1))
    return Trajectory.create(
        data,
        timestep="dt" if free_time else 0.1,
        controls="u",
        initial={"x": [0.0, 0.0]},
        final={"x": [1.0, 0.0]},
    )


G_DRIFT = np.array([[-0.1, 1.0], [-1.0, -0.1]])
G_DRIVE = np.array([[0.0, 1.0], [1.0, 0.0]])


def test_expm_matches_scipy():
    rng = np.random.default_rng(1)
    A = rng.normal(size=(4, 4))
    np.testing.assert_allclose(
        np.asarray(expm_pade(jnp.asarray(A))), scipy.linalg.expm(A), atol=1e-12
    )
    # batched
    As = rng.normal(size=(5, 3, 3))
    out = jax.vmap(expm_pade)(jnp.asarray(As))
    for i in range(5):
        np.testing.assert_allclose(
            np.asarray(out[i]), scipy.linalg.expm(As[i]), atol=1e-12
        )


def test_bilinear_residual_semantics():
    traj = bilinear_traj()
    integ = BilinearIntegrator.create((G_DRIFT, [G_DRIVE]), "x", "u", traj)
    res = stack_residuals(integ, traj.layout, traj.knot_matrix())
    # manual per-step check
    for k in range(traj.N - 1):
        u = np.asarray(traj.data["u"][k])
        dt = float(traj.data["dt"][k, 0])
        G = G_DRIFT + u[0] * G_DRIVE
        expect = np.asarray(traj.data["x"][k + 1]) - scipy.linalg.expm(
            dt * G
        ) @ np.asarray(traj.data["x"][k])
        np.testing.assert_allclose(np.asarray(res[k]), expect, atol=1e-10)


def test_bilinear_callable_form():
    traj = bilinear_traj()
    integ = BilinearIntegrator.create(
        lambda u: jnp.asarray(G_DRIFT) + u[0] * jnp.asarray(G_DRIVE), "x", "u", traj
    )
    integ2 = BilinearIntegrator.create((G_DRIFT, [G_DRIVE]), "x", "u", traj)
    r1 = evaluate(integ, traj)
    r2 = evaluate(integ2, traj)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-12)


def test_bilinear_derivatives_vs_finite_diff():
    traj = bilinear_traj()
    integ = BilinearIntegrator.create((G_DRIFT, [G_DRIVE]), "x", "u", traj)
    check_integrator(integ, traj, atol=1e-4, hessian_atol=1e-3)


def test_bilinear_fixed_timestep_derivatives():
    traj = bilinear_traj(free_time=False)
    integ = BilinearIntegrator.create((G_DRIFT, [G_DRIVE]), "x", "u", traj)
    check_integrator(integ, traj, atol=1e-4, hessian_atol=1e-3)


def test_derivative_integrator():
    N = 8
    rng = np.random.default_rng(3)
    traj = Trajectory.create(
        {
            "a": rng.normal(size=(N, 2)),
            "da": rng.normal(size=(N, 2)),
            "dt": np.full((N, 1), 0.1),
        },
        timestep="dt",
    )
    D = DerivativeIntegrator.create("a", "da", traj)
    res = stack_residuals(D, traj.layout, traj.knot_matrix())
    for k in range(N - 1):
        expect = (
            np.asarray(traj.data["a"][k + 1])
            - np.asarray(traj.data["a"][k])
            - 0.1 * np.asarray(traj.data["da"][k])
        )
        np.testing.assert_allclose(np.asarray(res[k]), expect, atol=1e-12)
    check_integrator(D, traj, atol=1e-5)


def test_vmapped_over_problem_batch():
    """Different G matrices per scenario — the integrator pytree vmaps."""
    traj = bilinear_traj()
    layout = traj.layout

    def make(scale):
        return BilinearIntegrator.create(
            (G_DRIFT * scale, [G_DRIVE]), "x", "u", traj
        )

    batch = jax.tree.map(lambda *xs: jnp.stack(xs), make(1.0), make(2.0))
    zmat = traj.knot_matrix()

    res = jax.vmap(lambda integ: stack_residuals(integ, layout, zmat))(batch)
    assert res.shape == (2, traj.N - 1, 2)
    r0 = stack_residuals(make(1.0), layout, zmat)
    r1 = stack_residuals(make(2.0), layout, zmat)
    np.testing.assert_allclose(np.asarray(res[0]), np.asarray(r0), atol=1e-12)
    np.testing.assert_allclose(np.asarray(res[1]), np.asarray(r1), atol=1e-12)
