"""Generate golden reference solutions with an INDEPENDENT f64 solver.

The reference validates Ipopt-vs-MadNLP trajectory agreement to RMS < 1e-4 on
seeded Δt-pinned bilinear problems (`/root/reference/test/solver_test_utils.jl:105-132`)
and targets matching Ipopt's control sequence on the N=51 bilinear benchmark
(BASELINE.md). No Ipopt/Julia toolchain exists in this image, so the golden
data is produced by scipy's ``trust-constr`` — an interior-point/SQP method
wholly independent of this package's IPM (different codebase, different
linear algebra, different globalization) — run in f64 at gtol=1e-10 with
exact AD derivatives (objective gradient/Hessian, constraint Jacobian and
v-weighted constraint Hessian supplied by JAX; the *solver* is scipy's).

Each solution is checked before being written:
  * feasibility ‖c_eq‖∞ ≤ 1e-8,
  * first-order stationarity of the Lagrangian ≤ 1e-6 (scipy's own duals).

Outputs ``tests/golden/*.npz``: Z_star plus problem metadata. Consumed by
``tests/test_golden.py``, which asserts this package's f64 solve from the
same start matches the golden control sequences to RMS < 1e-4.

Run:  python tools/make_golden.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def setup_jax():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    return jax


def solve_trust_constr(problem, maxiter=4000, gtol=1e-10, xtol=1e-14, verbose=0):
    """Solve a DirectTrajOptProblem with scipy trust-constr (independent)."""
    import jax
    import jax.numpy as jnp
    from scipy.optimize import Bounds, NonlinearConstraint, minimize

    from directtrajopt_tpu.solvers.canonical import make_nlp

    nlp = make_nlp(problem)
    Z0 = np.array(problem.trajectory.to_zvec(), dtype=np.float64)

    f = jax.jit(nlp.objective)
    g = jax.jit(jax.grad(nlp.objective))
    H = jax.jit(jax.hessian(nlp.objective))
    c = jax.jit(nlp.c_eq)
    Jc = jax.jit(jax.jacrev(nlp.c_eq))

    def c_hess(x, v):
        return np.asarray(_c_hess(jnp.asarray(x), jnp.asarray(v)))

    _c_hess = jax.jit(
        lambda x, v: jax.hessian(lambda z: jnp.dot(v, nlp.c_eq(z)))(x)
    )

    lb = np.asarray(nlp.lb, dtype=np.float64).copy()
    ub = np.asarray(nlp.ub, dtype=np.float64).copy()
    if len(nlp.fix_idx):
        fv = np.asarray(nlp.fix_val, dtype=np.float64)
        lb[nlp.fix_idx] = fv
        ub[nlp.fix_idx] = fv
        Z0[nlp.fix_idx] = fv

    n_eq = nlp.n_eq
    cons = []
    if n_eq:
        cons.append(
            NonlinearConstraint(
                lambda x: np.asarray(c(x)),
                np.zeros(n_eq),
                np.zeros(n_eq),
                jac=lambda x: np.asarray(Jc(x)),
                hess=c_hess,
            )
        )
    if nlp.n_in:
        raise NotImplementedError("golden fixtures are eq+box problems only")

    res = minimize(
        lambda x: float(f(x)),
        Z0,
        method="trust-constr",
        jac=lambda x: np.asarray(g(x)),
        hess=lambda x: np.asarray(H(x)),
        constraints=cons,
        bounds=Bounds(lb, ub),
        options=dict(maxiter=maxiter, gtol=gtol, xtol=xtol, verbose=verbose),
    )
    Z_star = np.asarray(res.x)

    # post-checks: feasibility and stationarity with scipy's own multipliers
    feas = float(np.max(np.abs(np.asarray(c(Z_star))))) if n_eq else 0.0
    grad_L = np.asarray(g(Z_star))
    if n_eq and res.v:
        grad_L = grad_L + np.asarray(Jc(Z_star)).T @ np.asarray(res.v[0])
    # project out active-bound / pinned coordinates
    act = (np.abs(Z_star - lb) < 1e-9) | (np.abs(ub - Z_star) < 1e-9)
    stat = float(np.max(np.abs(np.where(act, 0.0, grad_L))))
    return Z_star, dict(
        feas=feas, stat=stat, obj=float(f(Z_star)), niter=int(res.niter),
        status=int(res.status),
    )


def make_cartpole_goldens(outdir):
    """Cartpole cart-move fixtures (second family: general RK4 dynamics)."""
    from directtrajopt_tpu.benchmarks import make_cartpole_problem

    for seed in range(3):
        prob = make_cartpole_problem(N=40, seed=seed)
        Z, info = solve_trust_constr(prob)
        assert info["feas"] <= 1e-8, (seed, info)
        assert info["stat"] <= 1e-6, (seed, info)
        Z0 = np.asarray(prob.trajectory.to_zvec(), dtype=np.float64)
        np.savez(
            os.path.join(outdir, f"cartpole_n40_seed{seed}.npz"),
            Z_star=Z, Z0=Z0, N=40, seed=seed, free_time=False,
            family="cartpole", **info,
        )
        print(f"cartpole seed {seed}: obj={info['obj']:.9f} "
              f"feas={info['feas']:.2e} stat={info['stat']:.2e} "
              f"iters={info['niter']}")


def main():
    setup_jax()
    from directtrajopt_tpu.benchmarks import make_bilinear_problem

    outdir = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
    os.makedirs(outdir, exist_ok=True)

    if "--cartpole-only" in sys.argv:
        make_cartpole_goldens(outdir)
        return

    # --- 10 seeded Δt-pinned N=10 problems (solver_test_utils.jl analog) --- #
    for seed in range(10):
        prob = make_bilinear_problem(N=10, seed=seed, free_time=False)
        Z, info = solve_trust_constr(prob)
        assert info["feas"] <= 1e-8, (seed, info)
        assert info["stat"] <= 1e-6, (seed, info)
        Z0 = np.asarray(prob.trajectory.to_zvec(), dtype=np.float64)
        np.savez(
            os.path.join(outdir, f"bilinear_n10_seed{seed}.npz"),
            Z_star=Z, Z0=Z0, N=10, seed=seed, free_time=False, **info,
        )
        print(f"seed {seed}: obj={info['obj']:.9f} feas={info['feas']:.2e} "
              f"stat={info['stat']:.2e} iters={info['niter']}")

    # --- 5 seeded problems with a terminal goal objective: the optimum has
    # nonzero controls, so trajectory-RMS agreement is a nontrivial check --- #
    for seed in range(5):
        prob = make_bilinear_problem(
            N=10, seed=seed, free_time=False, goal_objective=50.0
        )
        Z, info = solve_trust_constr(prob)
        assert info["feas"] <= 1e-8, (seed, info)
        assert info["stat"] <= 1e-6, (seed, info)
        Z0 = np.asarray(prob.trajectory.to_zvec(), dtype=np.float64)
        np.savez(
            os.path.join(outdir, f"bilinear_goal_n10_seed{seed}.npz"),
            Z_star=Z, Z0=Z0, N=10, seed=seed, free_time=False,
            goal_objective=50.0, **info,
        )
        print(f"goal seed {seed}: obj={info['obj']:.9f} feas={info['feas']:.2e} "
              f"stat={info['stat']:.2e} iters={info['niter']}")

    # --- the N=51 free-time benchmark problem ------------------------------ #
    prob = make_bilinear_problem(N=51, seed=42, free_time=True,
                                 feasible_start=True)
    Z, info = solve_trust_constr(prob, maxiter=8000)
    assert info["feas"] <= 1e-8, info
    assert info["stat"] <= 1e-6, info
    Z0 = np.asarray(prob.trajectory.to_zvec(), dtype=np.float64)
    np.savez(
        os.path.join(outdir, "bilinear_n51_seed42.npz"),
        Z_star=Z, Z0=Z0, N=51, seed=42, free_time=True, **info,
    )
    print(f"n51: obj={info['obj']:.9f} feas={info['feas']:.2e} "
          f"stat={info['stat']:.2e} iters={info['niter']}")

    make_cartpole_goldens(outdir)


if __name__ == "__main__":
    main()
