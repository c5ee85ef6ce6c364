"""Mixed-precision residual refinement (options.refine_residuals).

The f32 throughput path evaluates residuals/RHS in f64 and casts the *small*
results back — textbook iterative refinement with an f32 factorization
(analog of the accuracy ladder the reference gets for free from f64 Ipopt,
`/root/reference/src/solvers/ipopt_solver/options.jl:34-39`). These tests
check (a) the incremental-multiplier KKT transform is exact, (b) an f32
refined solve genuinely converges at strict tolerance, verified by an
*external* f64 KKT evaluation at the returned primal-dual point, and (c) the
mode is a no-op for f64 solves.
"""

import jax
import numpy as np
import pytest


def _external_kkt(nlp64, res):
    """f64 KKT residuals at the solve's best iterate + matched duals."""
    import jax
    import jax.numpy as jnp

    st = res.ipm.state
    Z = st.best_kkt_Z.astype(jnp.float64)
    w = st.best_kkt_warm
    lam, nu = w.lam.astype(jnp.float64), w.nu.astype(jnp.float64)
    zL, zU = w.zL.astype(jnp.float64), w.zU.astype(jnp.float64)
    gf = jax.grad(nlp64.objective)(Z)
    _, vjp_e = jax.vjp(nlp64.c_eq, Z)
    _, vjp_i = jax.vjp(nlp64.c_in, Z)
    free = nlp64.free_mask.astype(jnp.float64)
    r = free * (gf + vjp_e(lam)[0] + vjp_i(nu)[0] - zL + zU)
    ce = nlp64.c_eq(Z)
    ci = nlp64.c_in(Z) + w.s.astype(jnp.float64)
    du = float(jnp.max(jnp.abs(r), initial=0.0))
    pr = float(
        jnp.maximum(
            jnp.max(jnp.abs(ce), initial=0.0), jnp.max(jnp.abs(ci), initial=0.0)
        )
    )
    return du, pr


def test_incremental_multiplier_identity():
    """Shifting the KKT RHS by Jᵀλ must leave dZ unchanged and turn the
    multiplier output into the increment Δλ = λ⁺ − λ (both backends)."""
    import jax.numpy as jnp

    from directtrajopt_tpu.benchmarks import make_bilinear_problem
    from directtrajopt_tpu.solvers.canonical import make_nlp
    from directtrajopt_tpu.solvers.ops_dense import DenseOps
    from directtrajopt_tpu.solvers.ops_riccati import RiccatiOps
    from directtrajopt_tpu.solvers.options import IPMOptions

    prob = make_bilinear_problem(N=7, seed=3, free_time=True, feasible_start=True)
    nlp = make_nlp(prob)
    rng = np.random.default_rng(1)
    Z = nlp.apply_pins(jnp.asarray(rng.normal(size=nlp.z_dim) * 0.1))
    lam = jnp.asarray(rng.normal(size=nlp.n_eq) * 0.5)
    nu = (
        jnp.full((nlp.n_in,), 0.5)
        if nlp.n_in
        else jnp.zeros((0,), dtype=jnp.float64)
    )
    opt = IPMOptions().astype(jnp.float64)
    Sig = jnp.full((nlp.z_dim,), 0.3) * nlp.free_mask
    D = jnp.full((nlp.n_in,), 0.7) if nlp.n_in else jnp.zeros((0,))
    g = jnp.asarray(rng.normal(size=nlp.z_dim)) * nlp.free_mask
    rc = jnp.asarray(rng.normal(size=nlp.n_eq))

    for ops in (DenseOps(nlp), RiccatiOps(nlp)):
        ctx = ops.prepare(Z, lam, nu)
        shift = nlp.free_mask * ctx.JeT(lam)

        # jit the step: eager execution dispatches the whole factor sweep
        # op-by-op (~45 s for the two backends); one small compile + a
        # cache-hit second call runs in ~10 s
        @jax.jit
        def step(g_):
            dZ, lp, ok, _, _ = ctx.kkt_step(Sig, D, g_, -rc, jnp.zeros(()), opt)
            return dZ, lp, ok

        dZ1, lp1, ok1 = step(g)
        dZ2, lp2, ok2 = step(g + shift)
        assert bool(ok1) and bool(ok2)
        assert float(jnp.max(jnp.abs(dZ1 - dZ2))) < 1e-6
        assert float(jnp.max(jnp.abs((lam + lp2) - lp1))) < 1e-5


@pytest.mark.parametrize("refine", [False, True])
def test_f32_strict_convergence_external_kkt(refine):
    """An f32 solve (with or without refinement) of the small bilinear
    fixture must reach strict tol=1e-6, certified by external f64 KKT
    residuals — the 'f32 floor' is an iteration artifact, not a precision
    wall, once residual cancellation is handled."""
    import jax.numpy as jnp

    from directtrajopt_tpu.benchmarks import make_bilinear_problem
    from directtrajopt_tpu.solvers.canonical import make_nlp
    from directtrajopt_tpu.solvers.solve import cast_problem, solve_jit

    prob = cast_problem(
        make_bilinear_problem(N=11, seed=5, free_time=True, feasible_start=True),
        jnp.float32,
    )
    nlp64 = make_nlp(cast_problem(prob, jnp.float64))
    res = solve_jit(
        prob,
        refine_residuals=refine,
        tol=1e-6,
        acceptable_tol=1e-6,
        acceptable_iter=100,
        max_iter=400,
        mu_init=3e-2,
    )
    assert res.ipm.Z.dtype == jnp.float32
    assert bool(res.converged), f"kkt={float(res.kkt_error):.2e}"
    du, pr = _external_kkt(nlp64, res)
    # external certificate: the measured-converged point is genuinely
    # converged (μ floor is tol/10, so complementarity sits at ~1e-7)
    assert du < 5e-6 and pr < 5e-6, (du, pr)


def test_refine_noop_on_f64():
    """refine_residuals must not change an f64 solve's traced behavior."""
    import jax.numpy as jnp

    from directtrajopt_tpu.benchmarks import make_bilinear_problem
    from directtrajopt_tpu.solvers.solve import cast_problem, solve_jit

    prob = cast_problem(
        make_bilinear_problem(N=7, seed=2, free_time=True, feasible_start=True),
        jnp.float64,
    )
    kw = dict(tol=1e-8, acceptable_tol=1e-8, max_iter=60, mu_init=1e-1)
    a = solve_jit(prob, refine_residuals=False, **kw)
    b = solve_jit(prob, refine_residuals=True, **kw)
    assert float(a.kkt_error) == float(b.kkt_error)
    np.testing.assert_array_equal(np.asarray(a.ipm.Z), np.asarray(b.ipm.Z))


def test_dense_backend_f32_strict_convergence():
    """The dense backend must stay usable in f32: with δc=1e-8 the
    augmented-Lagrangian term JᵀJ/δc (~1e8) swamps the Hessian entirely in
    f32 and the path floored at KKT ~2.6e-3. The dtype-scaled δc floor plus
    true-KKT-targeted refinement restore strict-tolerance convergence (this
    is the fallback path every Riccati-ineligible f32 problem takes)."""
    import jax.numpy as jnp

    from directtrajopt_tpu.benchmarks import make_bilinear_problem
    from directtrajopt_tpu.solvers.solve import cast_problem, solve_jit

    prob = cast_problem(
        make_bilinear_problem(N=21, seed=3, free_time=True, feasible_start=True),
        jnp.float32,
    )
    res = solve_jit(
        prob,
        backend="dense",
        tol=1e-6,
        acceptable_tol=1e-6,
        acceptable_iter=100,
        max_iter=300,
        mu_init=3e-2,
    )
    assert bool(res.converged), f"kkt={float(res.kkt_error):.2e}"


@pytest.mark.parametrize("strategy", ["adaptive", "mehrotra"])
def test_mu_strategies_f32_under_x64(strategy):
    """Regression: jnp.where(bool, 1.0, 0.0) with two weak Python floats is
    f64 under x64, which silently promoted Mehrotra's μ (and the whole KKT
    RHS) on the f32 path — the Riccati scan then failed with a carry-dtype
    mismatch. Both alternative μ strategies must trace and run in f32."""
    import jax.numpy as jnp

    from directtrajopt_tpu.benchmarks import make_bilinear_problem
    from directtrajopt_tpu.solvers.solve import cast_problem, solve_jit

    prob = cast_problem(
        make_bilinear_problem(N=7, seed=0, free_time=True, feasible_start=True),
        jnp.float32,
    )
    res = solve_jit(prob, mu_strategy=strategy, tol=1e-6, max_iter=15)
    assert res.ipm.Z.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(res.ipm.Z)))


@pytest.mark.parametrize("backend", ["riccati", "dense"])
def test_full_zoo_f32_under_x64(backend):
    """Dtype-robustness sweep: the full constraint/objective zoo (L1 slack,
    nonlinear eq/ineq, symmetry, duration, globals/arrowhead, free time)
    must trace and run in f32 with x64 enabled — weak Python-float literals
    anywhere in the lowering or solver promote the loop carry to f64 and
    crash the trace (the Mehrotra μ bug's class)."""
    import jax.numpy as jnp

    from tests.test_riccati import make_problem
    from directtrajopt_tpu.solvers.solve import cast_problem, solve_jit

    prob = cast_problem(make_problem(with_globals=True), jnp.float32)
    res = solve_jit(prob, backend=backend, tol=1e-5, acceptable_tol=1e-3,
                    max_iter=30)
    assert res.ipm.Z.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(res.ipm.Z)))


def test_error_free_transforms_exact():
    """two-sum / two-prod identities hold exactly on device under jit: the
    (value, error) pairs reproduce the f64-exact result from f32 inputs."""
    import jax
    import jax.numpy as jnp

    from directtrajopt_tpu.solvers.ipm import _csum, _two_prod_f32, _two_sum

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=1024) * 10, jnp.float32)
    b = jnp.asarray(rng.normal(size=1024) * 1e-4, jnp.float32)

    s, e = jax.jit(_two_sum)(a, b)
    exact = a.astype(jnp.float64) + b.astype(jnp.float64)
    np.testing.assert_array_equal(
        np.asarray(s.astype(jnp.float64) + e.astype(jnp.float64)),
        np.asarray(exact),
    )

    p, pe = jax.jit(_two_prod_f32)(a, b)
    exact_p = a.astype(jnp.float64) * b.astype(jnp.float64)
    np.testing.assert_array_equal(
        np.asarray(p.astype(jnp.float64) + pe.astype(jnp.float64)),
        np.asarray(exact_p),
    )

    # cancellation case the solver hits: Σ of O(1) terms summing to ~1e-7
    terms = [a, -a * (1 - 1e-7), b, -b]
    plain = sum(terms[1:], terms[0])
    compd = jax.jit(lambda ts: _csum(ts))(terms)
    truth = sum(
        (t.astype(jnp.float64) for t in terms[1:]), terms[0].astype(jnp.float64)
    )
    err_plain = np.abs(np.asarray(plain, np.float64) - np.asarray(truth))
    err_comp = np.abs(np.asarray(compd, np.float64) - np.asarray(truth))
    assert err_comp.max() <= err_plain.max()
    assert err_comp.mean() <= err_plain.mean()


def test_compensated_f32_strict_convergence():
    """compensated_residuals=True (pure f32, NO x64 emulation on the
    measurement path) converges the f32 fixture at strict tolerance with a
    genuine external-f64 certificate, like refine_residuals but at a few
    extra f32 ops instead of emulated-f64 residual passes."""
    import jax.numpy as jnp

    from directtrajopt_tpu.benchmarks import make_bilinear_problem
    from directtrajopt_tpu.solvers.canonical import make_nlp
    from directtrajopt_tpu.solvers.solve import cast_problem, solve_jit

    prob = cast_problem(
        make_bilinear_problem(N=11, seed=5, free_time=True, feasible_start=True),
        jnp.float32,
    )
    nlp64 = make_nlp(cast_problem(prob, jnp.float64))
    res = solve_jit(
        prob,
        compensated_residuals=True,
        tol=1e-6,
        acceptable_tol=1e-6,
        acceptable_iter=100,
        max_iter=400,
        mu_init=3e-2,
    )
    assert res.ipm.Z.dtype == jnp.float32
    assert bool(res.converged), f"kkt={float(res.kkt_error):.2e}"
    du, pr = _external_kkt(nlp64, res)
    assert du < 5e-6 and pr < 5e-6, (du, pr)
