"""Golden-trajectory validation against independently computed solutions.

The reference's quality bar is cross-solver trajectory agreement: Ipopt vs
MadNLP RMS < 1e-4 over seeded Δt-pinned problems
(`/root/reference/test/solver_test_utils.jl:105-132`) and matching the N=51
bilinear benchmark's control sequence (BASELINE.md). The golden data in
``tests/golden/*.npz`` was produced by ``tools/make_golden.py`` with scipy's
``trust-constr`` in f64 at gtol=1e-10 — a solver wholly independent of this
package's IPM — and each stored solution carries its own feasibility /
stationarity certificate. Here we assert our f64 solve from the same start
matches the golden control sequences to RMS < 1e-4.
"""

import glob
import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
_FILES = sorted(glob.glob(os.path.join(GOLDEN_DIR, "*.npz")))


def _rebuild(meta):
    from directtrajopt_tpu.benchmarks import (
        make_bilinear_problem,
        make_cartpole_problem,
    )

    family = str(meta.get("family", "bilinear"))
    if family == "cartpole":
        return make_cartpole_problem(N=int(meta["N"]), seed=int(meta["seed"]))
    kw = {}
    if "goal_objective" in meta:
        kw["goal_objective"] = float(meta["goal_objective"])
    return make_bilinear_problem(
        N=int(meta["N"]),
        seed=int(meta["seed"]),
        free_time=bool(meta["free_time"]),
        feasible_start=bool(int(meta["N"]) == 51),
        **kw,
    )


def _component_rms(layout, Za, Zb, name):
    sl = layout.comp_slice(name)
    N, d = layout.N, layout.dim
    a = Za[: N * d].reshape(N, d)[:, sl]
    b = Zb[: N * d].reshape(N, d)[:, sl]
    return float(np.sqrt(np.mean((a - b) ** 2)))


@pytest.mark.parametrize("path", _FILES, ids=[os.path.basename(p) for p in _FILES])
def test_matches_golden(path):
    import jax

    from directtrajopt_tpu.solvers import IPMOptions, solve

    data = np.load(path)
    meta = {k: data[k] for k in data.files}
    prob = _rebuild(meta)
    layout = prob.trajectory.layout

    # same start as the golden run
    Z0 = np.asarray(prob.trajectory.to_zvec())
    assert np.allclose(Z0, meta["Z0"], atol=1e-12), "fixture drifted from golden"

    # golden certificate sanity
    assert float(meta["feas"]) <= 1e-8
    assert float(meta["stat"]) <= 1e-6

    res = solve(
        prob,
        IPMOptions(tol=1e-9, max_iter=300),
        backend="auto",
    )
    assert bool(res.converged)
    Z = np.asarray(res.problem.trajectory.to_zvec(), dtype=np.float64)
    Zg = np.asarray(meta["Z_star"], dtype=np.float64)

    # control-sequence agreement (the reference's RMS < 1e-4 bar), plus state
    # agreement where the optimum is unique. For the free-time fixture only u
    # is determined: at the u ≡ 0 optimum the Δt-weighted objective is zero
    # for ANY timestep, so dt (and with it the rolled-out x) is non-unique.
    comps = ("u",) if bool(meta["free_time"]) else ("u", "x")
    for comp in comps:
        rms = _component_rms(layout, Z, Zg, comp)
        assert rms < 1e-4, (comp, rms)

    # objective agreement
    from directtrajopt_tpu.solvers.canonical import make_nlp

    nlp = make_nlp(prob)
    f_ours = float(nlp.objective(jax.numpy.asarray(Z)))
    assert abs(f_ours - float(meta["obj"])) < 1e-6 * max(1.0, abs(float(meta["obj"])))


def test_batched_polish_converges():
    """solve_batch_polished: every lane of an f32 batch reaches Ipopt-grade
    tolerance after the warm-started f64 polish."""
    import jax
    import jax.numpy as jnp

    from directtrajopt_tpu.benchmarks import make_batched_bilinear_problems
    from directtrajopt_tpu.solvers.solve import cast_problem, solve_batch_polished

    batch = cast_problem(
        make_batched_bilinear_problems(3, N=11, feasible_start=True), jnp.float32
    )
    res = solve_batch_polished(
        batch, tol=1e-6, acceptable_tol=1e-6, acceptable_iter=50, max_iter=80,
        mu_init=3e-2, polish_max_iter=150,
    )
    assert res.problem.trajectory.to_zvec().dtype == jnp.float64
    conv = np.asarray(res.converged)
    kkt = np.asarray(res.kkt_error)
    assert conv.all(), (conv, kkt)
    assert (kkt <= 1e-7).all(), kkt


def test_polished_f32_matches_golden():
    """The mixed-precision path (f32 throughput solve + warm-started f64
    polish, `solve_polished`) reaches the golden N=51 solution from an f32
    first phase — the on-chip recipe for the reference's Ipopt-grade
    tolerances (tol=1e-8, `src/solvers/ipopt_solver/options.jl:34-39`)."""
    import jax.numpy as jnp

    from directtrajopt_tpu.solvers.solve import cast_problem, solve_polished

    data = np.load(os.path.join(GOLDEN_DIR, "bilinear_n51_seed42.npz"))
    meta = {k: data[k] for k in data.files}
    prob = cast_problem(_rebuild(meta), jnp.float32)
    layout = prob.trajectory.layout

    res = solve_polished(
        prob, tol=1e-6, acceptable_tol=1e-6, acceptable_iter=100,
        max_iter=150, mu_init=3e-2,
    )
    assert bool(res.converged)
    assert float(res.kkt_error) <= 1e-7
    Z = np.asarray(res.problem.trajectory.to_zvec(), dtype=np.float64)
    assert Z.dtype == np.float64
    rms = _component_rms(layout, Z, np.asarray(meta["Z_star"]), "u")
    assert rms < 1e-4, rms
