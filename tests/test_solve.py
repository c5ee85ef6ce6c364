"""End-to-end solve tests — the analog of the reference's tier-2 testitems:
build a full problem, solve it, and assert the semantic property at the
solution (bounds satisfied, symmetry held, duration met, dynamics feasible).
Problems are made feasible by construction via dynamics rollouts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import directtrajopt_tpu as dtx

G_DRIFT = np.array([[0.0, 1.0], [-1.0, 0.0]])
G_DRIVE = np.array([[0.0, 1.0], [1.0, 0.0]])


def feasible_bilinear_traj(N=20, dt=0.15, seed=0, u_scale=0.3):
    """Build a trajectory whose final condition comes from a rollout, so the
    problem is feasible by construction."""
    rng = np.random.default_rng(seed)
    u = u_scale * np.sin(np.linspace(0, 2 * np.pi, N))[:, None]
    integ = dtx.BilinearIntegrator.create((G_DRIFT, [G_DRIVE]), "x", "u", None)
    x0 = np.array([1.0, 0.0])
    xs = np.asarray(dtx.bilinear_rollout(integ, jnp.asarray(x0), jnp.asarray(u), dt))
    goal = xs[-1]
    traj = dtx.Trajectory.create(
        {
            "x": xs + 0.05 * rng.normal(size=(N, 2)),
            "u": u + 0.05 * rng.normal(size=(N, 1)),
        },
        timestep=dt,
        controls="u",
        initial={"x": x0},
        final={"x": goal},
    )
    return traj, integ, goal


def test_double_integrator_min_energy():
    """Min-energy reach: analytic optimum is constant velocity."""
    N = 10
    traj = dtx.Trajectory.create(
        {"x": np.zeros((N, 1)), "v": np.zeros((N, 1))},
        timestep=0.1,
        controls="v",
        initial={"x": [0.0]},
        final={"x": [1.0]},
    )
    prob = dtx.DirectTrajOptProblem.create(
        traj,
        dtx.QuadraticRegularizer.create("v", traj, 1.0),
        dtx.DerivativeIntegrator.create("x", "v", traj),
    )
    res = dtx.solve(prob, max_iter=50)
    assert bool(res.converged)
    v = np.asarray(res.problem.trajectory.data["v"][:-1, 0])
    np.testing.assert_allclose(v, v.mean(), atol=1e-6)
    x = np.asarray(res.problem.trajectory.data["x"][:, 0])
    np.testing.assert_allclose(x[0], 0.0, atol=1e-8)
    np.testing.assert_allclose(x[-1], 1.0, atol=1e-8)


def test_bilinear_transfer():
    traj, integ, goal = feasible_bilinear_traj()
    prob = dtx.DirectTrajOptProblem.create(
        traj, dtx.QuadraticRegularizer.create("u", traj, 1.0), integ
    )
    res = dtx.solve(prob, max_iter=200)
    assert bool(res.converged)
    tr = res.problem.trajectory
    # dynamics feasible at solution
    from directtrajopt_tpu.integrators import evaluate

    dyn = np.asarray(evaluate(integ, tr))
    assert np.max(np.abs(dyn)) < 1e-6
    np.testing.assert_allclose(np.asarray(tr.data["x"][-1]), goal, atol=1e-6)


def test_bilinear_transfer_with_bounds():
    traj, integ, goal = feasible_bilinear_traj()
    traj = traj.replace(bounds={"u": (jnp.asarray([-0.4]), jnp.asarray([0.4]))})
    prob = dtx.DirectTrajOptProblem.create(
        traj, dtx.QuadraticRegularizer.create("u", traj, 1.0), integ
    )
    res = dtx.solve(prob, max_iter=200)
    assert bool(res.converged)
    u = np.asarray(res.problem.trajectory.data["u"][:, 0])
    # bounds hold on interior knots (the auto-extraction applies them there)
    assert np.all(u[1:-1] >= -0.4 - 1e-6) and np.all(u[1:-1] <= 0.4 + 1e-6)


def test_free_time_minimum_time():
    traj, integ, goal = feasible_bilinear_traj(N=16)
    N = traj.N
    data = {k: v for k, v in traj.data.items()}
    data["dt"] = np.full((N, 1), 0.15)
    traj_ft = dtx.Trajectory.create(
        data,
        timestep="dt",
        controls="u",
        initial={"x": traj.initial["x"]},
        final={"x": traj.final["x"]},
        bounds={"dt": (0.03, 0.3), "u": 1.0},
    )
    obj = dtx.QuadraticRegularizer.create(
        "u", traj_ft, 1e-1
    ) + 2.0 * dtx.MinimumTimeObjective.create(traj_ft, 1.0)
    prob = dtx.DirectTrajOptProblem.create(traj_ft, obj, integ)
    res = dtx.solve(prob, max_iter=300, tol=1e-7)
    assert bool(res.converged)
    tr = res.problem.trajectory
    dts = np.asarray(tr.data["dt"][:, 0])
    assert np.all(dts >= 0.03 - 1e-6) and np.all(dts <= 0.3 + 1e-6)
    # minimum time should compress the duration below the initial one
    assert float(tr.get_duration()) < 0.15 * (N - 1)


def test_duration_constraint():
    traj, integ, goal = feasible_bilinear_traj(N=16)
    N = traj.N
    data = dict(traj.data)
    data["dt"] = np.full((N, 1), 0.15)
    traj_ft = dtx.Trajectory.create(
        data,
        timestep="dt",
        controls="u",
        initial={"x": traj.initial["x"]},
        final={"x": traj.final["x"]},
        bounds={"dt": (0.05, 0.4)},
    )
    target = 0.15 * (N - 1)  # keep the feasible duration
    prob = dtx.DirectTrajOptProblem.create(
        traj_ft,
        dtx.QuadraticRegularizer.create("u", traj_ft, 1.0),
        integ,
        constraints=[dtx.DurationConstraint(target)],
    )
    res = dtx.solve(prob, max_iter=300, tol=1e-7)
    assert bool(res.converged)
    np.testing.assert_allclose(
        float(res.problem.trajectory.get_duration()), target, atol=1e-6
    )


def test_timesteps_all_equal():
    traj, integ, goal = feasible_bilinear_traj(N=12)
    N = traj.N
    data = dict(traj.data)
    rng = np.random.default_rng(5)
    data["dt"] = 0.15 + 0.02 * rng.random((N, 1))
    traj_ft = dtx.Trajectory.create(
        data,
        timestep="dt",
        controls="u",
        initial={"x": traj.initial["x"]},
        final={"x": traj.final["x"]},
        bounds={"dt": (0.05, 0.4)},
    )
    prob = dtx.DirectTrajOptProblem.create(
        traj_ft,
        dtx.QuadraticRegularizer.create("u", traj_ft, 1.0),
        integ,
        constraints=[dtx.TimeStepsAllEqualConstraint()],
    )
    res = dtx.solve(prob, max_iter=300, tol=1e-7)
    assert bool(res.converged)
    dts = np.asarray(res.problem.trajectory.data["dt"][:, 0])
    np.testing.assert_allclose(dts, dts[-1], atol=1e-6)


def test_symmetry_constraint_e2e():
    N = 14
    traj = dtx.Trajectory.create(
        {"x": np.zeros((N, 1)), "v": 0.1 * np.ones((N, 1))},
        timestep=0.1,
        controls="v",
        initial={"x": [0.0]},
        final={"x": [0.5]},
    )
    prob = dtx.DirectTrajOptProblem.create(
        traj,
        dtx.QuadraticRegularizer.create("v", traj, 1.0),
        dtx.DerivativeIntegrator.create("x", "v", traj),
        constraints=[dtx.SymmetryConstraint.create("v", [0], even=True)],
    )
    res = dtx.solve(prob, max_iter=100)
    assert bool(res.converged)
    v = np.asarray(res.problem.trajectory.data["v"][:, 0])
    for t in range(N // 2):
        np.testing.assert_allclose(v[t], v[N - 1 - t], atol=1e-7)


def test_l1_slack_sparsity():
    """L1 penalty via slacks + LinearRegularizer drives du to exact zeros."""
    traj, integ, goal = feasible_bilinear_traj(N=16)
    N = traj.N
    data = dict(traj.data)
    data["du"] = np.zeros((N, 1))
    data["s"] = 0.2 * np.ones((N, 1))
    traj2 = dtx.Trajectory.create(
        data,
        timestep=0.15,
        controls=("u", "du"),
        initial={"x": traj.initial["x"]},
        final={"x": traj.final["x"]},
        bounds={"s": (0.0, np.inf)},
    )
    integs = [integ, dtx.DerivativeIntegrator.create("u", "du", traj2)]
    obj = dtx.QuadraticRegularizer.create(
        "u", traj2, 1e-2
    ) + 1.0 * dtx.LinearRegularizer.create("s", traj2, 1.0)
    prob = dtx.DirectTrajOptProblem.create(
        traj2,
        obj,
        integs,
        constraints=[dtx.L1SlackConstraint.create("du", "s", traj2)],
    )
    res = dtx.solve(prob, max_iter=300, tol=1e-7)
    assert bool(res.converged)
    tr = res.problem.trajectory
    du = np.asarray(tr.data["du"][:, 0])
    s = np.asarray(tr.data["s"][:, 0])
    assert np.all(np.abs(du) <= s + 1e-6)
    # L1 drives most increments to ~zero (piecewise-constant u)
    assert np.sum(np.abs(du) < 1e-5) > N // 2


def test_nonlinear_inequality_e2e():
    traj, integ, goal = feasible_bilinear_traj()
    cap = float(np.max(np.sum(np.asarray(traj.data["x"]) ** 2, axis=1))) + 0.2
    con = dtx.NonlinearKnotPointConstraint.create(
        lambda x: jnp.array([jnp.sum(x**2) - cap]), "x", traj, equality=False
    )
    prob = dtx.DirectTrajOptProblem.create(
        traj, dtx.QuadraticRegularizer.create("u", traj, 1.0), integ,
        constraints=[con],
    )
    res = dtx.solve(prob, max_iter=200, tol=1e-7)
    assert bool(res.converged)
    x = np.asarray(res.problem.trajectory.data["x"])
    assert np.all(np.sum(x**2, axis=1) <= cap + 1e-6)


def test_batch_solve_different_goals():
    """vmapped solve over a batch of problems with different goals."""
    trajs = []
    integ = None
    for seed in range(3):
        tr, integ, _ = feasible_bilinear_traj(N=14, seed=seed, u_scale=0.2 + 0.1 * seed)
        trajs.append(tr)
    probs = [
        dtx.DirectTrajOptProblem.create(
            tr, dtx.QuadraticRegularizer.create("u", tr, 1.0), integ
        )
        for tr in trajs
    ]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *probs)
    res = dtx.solve_batch(batch, max_iter=200)
    assert res.converged.shape == (3,)
    assert bool(jnp.all(res.converged))
    # each instance hits its own goal
    xN = np.asarray(res.problem.trajectory.data["x"][:, -1, :])
    for i, tr in enumerate(trajs):
        np.testing.assert_allclose(xN[i], np.asarray(tr.final["x"]), atol=1e-6)


def test_warm_start_resolve():
    """Re-solving from a solution converges immediately (the trajectory is
    the checkpoint — reference MPC pattern)."""
    traj, integ, goal = feasible_bilinear_traj()
    prob = dtx.DirectTrajOptProblem.create(
        traj, dtx.QuadraticRegularizer.create("u", traj, 1.0), integ
    )
    res1 = dtx.solve(prob, max_iter=200)
    assert bool(res1.converged)
    res2 = dtx.solve(res1.problem, max_iter=200)
    assert bool(res2.converged)
    assert int(res2.iterations) <= max(3, int(res1.iterations) // 2)


def test_batch_heterogeneous_dynamics():
    """Scenario batch where each instance carries different dynamics matrices
    (G is a pytree leaf) — the core promise of problems-as-pytrees."""
    probs = []
    for i, scale in enumerate([0.8, 1.0, 1.25]):
        rng = np.random.default_rng(i)
        integ = dtx.BilinearIntegrator.create(
            (scale * G_DRIFT, [G_DRIVE]), "x", "u", None
        )
        u = 0.25 * np.sin(np.linspace(0, 5, 14))[:, None]
        xs = dtx.bilinear_rollout(integ, jnp.array([1.0, 0.0]), jnp.asarray(u), 0.15)
        traj = dtx.Trajectory.create(
            {"x": np.asarray(xs) + 0.02 * rng.normal(size=(14, 2)), "u": u},
            timestep=0.15,
            controls="u",
            initial={"x": [1.0, 0.0]},
            final={"x": np.asarray(xs[-1])},
        )
        probs.append(
            dtx.DirectTrajOptProblem.create(
                traj, dtx.QuadraticRegularizer.create("u", traj, 1.0), integ
            )
        )
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *probs)
    # the dynamics matrices really are batched leaves
    assert batch.integrators[0].G_drift.shape == (3, 2, 2)
    res = dtx.solve_batch(batch, max_iter=200)
    assert bool(jnp.all(res.converged))
    # each instance satisfies ITS OWN dynamics at the solution
    for i in range(3):
        prob_i = jax.tree.map(lambda x: x[i], batch)
        tr_i = jax.tree.map(lambda x: x[i], res.problem.trajectory)
        from directtrajopt_tpu.integrators import evaluate

        dyn = np.asarray(evaluate(prob_i.integrators[0], tr_i))
        assert np.max(np.abs(dyn)) < 1e-6


@pytest.mark.xdist_group("heavy")
def test_solve_batch_scheduled():
    """Two-phase straggler scheduling returns the same per-lane solutions as
    a plain lockstep solve, with phase-2 lanes reporting combined iteration
    counts. A tiny phase-1 cap forces the straggler path."""
    trajs = []
    integ = None
    for seed in range(5):
        tr, integ, _ = feasible_bilinear_traj(N=14, seed=seed, u_scale=0.2 + 0.05 * seed)
        trajs.append(tr)
    probs = [
        dtx.DirectTrajOptProblem.create(
            tr, dtx.QuadraticRegularizer.create("u", tr, 1.0), integ
        )
        for tr in trajs
    ]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *probs)
    plain = dtx.solve_batch(batch, max_iter=200)
    assert bool(jnp.all(plain.converged))
    # phase1_iter=3 converges nobody — every lane goes through compaction
    sched = dtx.solve_batch_scheduled(
        batch, phase1_iter=3, phase2_iter=200, mu_init_phase2=None, chunk=2
    )
    assert sched.converged.shape == (5,)
    assert bool(jnp.all(sched.converged))
    assert bool(jnp.all(sched.iterations > 3))
    u_plain = np.asarray(plain.problem.trajectory.data["u"])
    u_sched = np.asarray(sched.problem.trajectory.data["u"])
    np.testing.assert_allclose(u_sched, u_plain, atol=1e-5)


@pytest.mark.xdist_group("heavy")
def test_solve_batch_scheduled_no_stragglers():
    """When phase 1 converges everything, the scheduler is a plain batch
    solve (no continuation batches are launched)."""
    tr, integ, _ = feasible_bilinear_traj(N=14, seed=0)
    prob = dtx.DirectTrajOptProblem.create(
        tr, dtx.QuadraticRegularizer.create("u", tr, 1.0), integ
    )
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *[prob, prob])
    res = dtx.solve_batch_scheduled(batch, phase1_iter=200)
    assert bool(jnp.all(res.converged))
    assert bool(jnp.all(res.iterations <= 200))


@pytest.mark.xdist_group("heavy")
def test_solve_batch_compact():
    """The all-on-device multi-phase compacting scheduler converges every
    lane to the same solution as a plain lockstep solve (benign family),
    with per-lane combined iteration counts and odd batch/chunk padding."""
    trajs = []
    integ = None
    for seed in range(5):
        tr, integ, _ = feasible_bilinear_traj(
            N=14, seed=seed, u_scale=0.2 + 0.05 * seed
        )
        trajs.append(tr)
    probs = [
        dtx.DirectTrajOptProblem.create(
            tr, dtx.QuadraticRegularizer.create("u", tr, 1.0), integ
        )
        for tr in trajs
    ]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *probs)
    plain = dtx.solve_batch(batch, max_iter=200)
    assert bool(jnp.all(plain.converged))
    # phase-1 cap of 3 converges nobody; B=5 with chunk=2 forces padding
    res = dtx.solve_batch_compact(
        batch, phases=((3, None), (200, None)), chunk=2
    )
    assert res.converged.shape == (5,)
    assert bool(jnp.all(res.converged))
    assert bool(jnp.all(res.iterations > 3))
    u_plain = np.asarray(plain.problem.trajectory.data["u"])
    u_comp = np.asarray(res.problem.trajectory.data["u"])
    np.testing.assert_allclose(u_comp, u_plain, atol=1e-5)
    # merged result fields are per-lane consistent
    assert np.all(np.asarray(res.kkt_error) < 1e-6)
    assert np.all(np.asarray(res.status) <= 1)


@pytest.mark.xdist_group("heavy")
def test_solve_batch_compact_single_phase_equals_plain():
    """With one full-budget phase and chunk >= B, compact IS a plain batch
    solve — lane-for-lane identical results."""
    tr, integ, _ = feasible_bilinear_traj(N=14, seed=0)
    prob = dtx.DirectTrajOptProblem.create(
        tr, dtx.QuadraticRegularizer.create("u", tr, 1.0), integ
    )
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *[prob] * 3)
    plain = dtx.solve_batch(batch, max_iter=150)
    res = dtx.solve_batch_compact(batch, phases=((150, None),), chunk=8)
    np.testing.assert_array_equal(
        np.asarray(res.iterations), np.asarray(plain.iterations)
    )
    np.testing.assert_allclose(
        np.asarray(jax.vmap(lambda t: t.to_zvec())(res.problem.trajectory)),
        np.asarray(jax.vmap(lambda t: t.to_zvec())(plain.problem.trajectory)),
        atol=0,
    )


@pytest.mark.xdist_group("heavy")
def test_stagewise_hessian_regularization():
    """hessian_regularization="stagewise" (exact mode, Riccati backend):
    per-stage λ_min shifts must (a) reach the same solution as the global
    δ_w ladder and (b) cut iterations on the degenerate free-time bilinear
    family (measured 110 → ~55 median at B=32; see options.py)."""
    from directtrajopt_tpu.benchmarks import make_batched_bilinear_problems

    batch = make_batched_bilinear_problems(4, N=21, feasible_start=True)
    batch32 = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        batch,
    )
    kw = dict(tol=1e-6, max_iter=300, hessian_approximation="exact")
    base = dtx.solve_batch(batch32, hessian_regularization="inertia", **kw)
    sw = dtx.solve_batch(batch32, hessian_regularization="stagewise", **kw)
    assert np.asarray(base.converged).all() and np.asarray(sw.converged).all()
    it_b = np.asarray(base.iterations).sum()
    it_s = np.asarray(sw.iterations).sum()
    assert it_s < it_b, (it_s, it_b)
    # same optimum (controls agree to solver tolerance)
    u_b = np.asarray(
        jax.vmap(lambda t: t.data["u"])(base.problem.trajectory)
    )
    u_s = np.asarray(jax.vmap(lambda t: t.data["u"])(sw.problem.trajectory))
    np.testing.assert_allclose(u_b, u_s, atol=5e-4)


def test_project_hessian_regularization():
    """hessian_regularization="project" (per-stage spectral clip): must
    reach the same optimum as the δ_w ladder with a LARGE iteration cut on
    the degenerate free-time bilinear family (measured med 94 → 22 at B=32,
    f32 tol=1e-6 — vs 85 for the λ_min shift), and must NOT blow up the
    benign-indefinite regime that the shift damages (cartpole 9 → 41 under
    "stagewise", but only 9 → 11 under "project")."""
    from directtrajopt_tpu.benchmarks import (
        make_batched_bilinear_problems,
        make_cartpole_problem,
    )

    batch = make_batched_bilinear_problems(4, N=21, feasible_start=True)
    batch32 = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        batch,
    )
    kw = dict(tol=1e-6, max_iter=300, hessian_approximation="exact")
    base = dtx.solve_batch(batch32, hessian_regularization="inertia", **kw)
    pr = dtx.solve_batch(batch32, hessian_regularization="project", **kw)
    assert np.asarray(base.converged).all() and np.asarray(pr.converged).all()
    it_b = np.asarray(base.iterations)
    it_p = np.asarray(pr.iterations)
    # stronger than the stagewise bar: projection at least halves the total
    assert it_p.sum() < 0.6 * it_b.sum(), (it_p, it_b)
    u_b = np.asarray(jax.vmap(lambda t: t.data["u"])(base.problem.trajectory))
    u_p = np.asarray(jax.vmap(lambda t: t.data["u"])(pr.problem.trajectory))
    np.testing.assert_allclose(u_b, u_p, atol=5e-4)

    # benign regime: within 2x of the undamped Newton iteration count
    cp = make_cartpole_problem(N=40, seed=1)
    r_in = dtx.solve(cp, hessian_regularization="inertia", max_iter=200)
    r_pr = dtx.solve(cp, hessian_regularization="project", max_iter=200)
    assert r_in.converged and r_pr.converged
    assert int(r_pr.iterations) <= 2 * int(r_in.iterations), (
        int(r_pr.iterations),
        int(r_in.iterations),
    )


def test_hessian_regularization_auto_and_floor():
    """"auto" (the r5 default) resolves to the certified inertia ladder —
    including under jit — and the experimental "floor"/"flip" spectral
    modes run end-to-end on the Riccati backend. The measured tradeoff
    data behind the conservative auto resolution lives in
    solve.py::_solve_impl."""
    from directtrajopt_tpu.benchmarks import make_bilinear_problem

    prob = make_bilinear_problem(N=10, seed=0, free_time=False,
                                 goal_objective=50.0)
    r_auto = dtx.solve(prob, tol=1e-9, max_iter=300)
    r_inertia = dtx.solve(prob, tol=1e-9, max_iter=300,
                          hessian_regularization="inertia")
    assert bool(r_auto.converged) and bool(r_inertia.converged)
    assert int(r_auto.iterations) == int(r_inertia.iterations)

    prob_ft = make_bilinear_problem(N=10, seed=1, free_time=True,
                                    feasible_start=True)
    for mode in ("floor", "flip"):
        r = dtx.solve(prob_ft, tol=1e-6, max_iter=300,
                      hessian_regularization=mode, backend="riccati")
        assert bool(r.converged), (mode, float(r.kkt_error))
