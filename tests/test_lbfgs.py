"""hessian_approximation="lbfgs" — compact limited-memory BFGS mode
(MadNLP CompactLBFGS analog, `/root/reference/ext/MadNLPSolverExt/utils.jl:11-110`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import directtrajopt_tpu as dtx
from directtrajopt_tpu.benchmarks import make_cartpole_problem


def test_lbfgs_converges_cartpole():
    """No second-order AD at all, same optimum as the exact mode."""
    prob = make_cartpole_problem(N=40, seed=1)
    ex = dtx.solve(prob, tol=1e-5, max_iter=300, backend="dense")
    lb = dtx.solve(
        prob,
        tol=1e-5,
        max_iter=300,
        hessian_approximation="lbfgs",
        limited_memory_max_history=20,
    )
    assert bool(ex.converged) and bool(lb.converged)
    # quasi-Newton takes more iterations (58 vs 9 measured) but the same
    # optimum: at tol=1e-5 the KKT certificates allow ~1e-2 primal wiggle
    # along the flat directions, so compare the objective values
    np.testing.assert_allclose(
        float(lb.objective), float(ex.objective), rtol=1e-3, atol=1e-6
    )


def test_lbfgs_memory_matters():
    """More curvature pairs -> faster convergence on cartpole (m=6 stalls
    within the budget, m=20 converges; documents how to pick m)."""
    prob = make_cartpole_problem(N=40, seed=1)
    r20 = dtx.solve(
        prob, tol=1e-5, max_iter=300, hessian_approximation="lbfgs",
        limited_memory_max_history=20,
    )
    assert bool(r20.converged) and int(r20.iterations) < 150


def test_lbfgs_batched_and_jitted():
    """The pair buffers ride the IPM state pytree: vmap + jit must work."""
    p0 = make_cartpole_problem(N=30, seed=0)
    probs = [
        p0.replace(trajectory=make_cartpole_problem(N=30, seed=s).trajectory)
        for s in range(3)
    ]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *probs)
    res = dtx.solve_batch(
        batch, tol=1e-4, max_iter=300, hessian_approximation="lbfgs",
        limited_memory_max_history=20,
    )
    assert np.asarray(res.converged).all()


def test_lbfgs_rejects_riccati_backend():
    prob = make_cartpole_problem(N=30, seed=0)
    with pytest.raises(ValueError, match="dense backend"):
        dtx.solve(prob, hessian_approximation="lbfgs", backend="riccati")
