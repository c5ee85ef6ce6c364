"""Phase-schedule tuner for ``solve_batch_compact``.

Measures the per-lane iterations-to-convergence distribution of a problem
family (one lockstep ``solve_batch`` at the target tolerances), then solves
a small dynamic program for the compaction boundaries that minimize total
chunk-iterations:

    cost(T_0=0 < T_1 < ... < T_K) = Σ_j ceil(U_j / C) · (T_j − T_{j−1})

where ``U_j`` is the number of lanes still unconverged entering phase j
(each lane's effective need is its measured count plus ``restart_penalty``
recentering iterations per extra phase it survives — later phases restart
the barrier primal-only). This is the model behind bench.py's hand-tuned
(16, 16, 64) schedule; the tool automates it for new families.

Usage::

    python tools/phase_tuner.py [B] [max_phases]   # bench family by default

Prints the measured distribution, the DP-optimal schedule, and its predicted
cost vs the single-phase lockstep baseline.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def optimal_phases(
    counts: np.ndarray,
    chunk: int = 128,
    max_phases: int = 4,
    restart_penalty: float = 4.0,
    grid_step: int = 2,
) -> tuple[list[int], float]:
    """DP over candidate phase boundaries.

    ``counts``: measured per-lane iterations to convergence (unconverged
    lanes should carry the measurement budget). Returns (per-phase iteration
    budgets, predicted total chunk-iterations).
    """
    counts = np.sort(np.asarray(counts))
    B = len(counts)
    cmax = int(counts.max())
    grid = list(range(grid_step, cmax + grid_step, grid_step))

    def unconverged(T, j):
        # lanes whose effective need (measured + per-phase recentering for
        # each earlier boundary survived) exceeds the budget so far
        eff = counts + restart_penalty * j
        return int(np.sum(eff > T))

    best: dict[tuple[int, int], tuple[float, list[int]]] = {}

    def solve(T, j):
        # min cost to finish all lanes given cumulative budget T after j
        # phases (monotone: U==0 → done)
        if unconverged(T, j) == 0:
            return 0.0, []
        if j + 1 >= max_phases:
            # final phase must cover the worst lane
            eff_max = int(counts.max() + restart_penalty * j)
            delta = max(eff_max - T, 1)
            U = unconverged(T, j)
            return np.ceil(U / chunk) * delta, [delta]
        key = (T, j)
        if key in best:
            return best[key]
        U = unconverged(T, j)
        # always admit the "finish everything now" single final phase
        eff_max = int(counts.max() + restart_penalty * j)
        out = (np.ceil(U / chunk) * max(eff_max - T, 1), [max(eff_max - T, 1)])
        for Tn in grid:
            if Tn <= T or Tn >= eff_max:
                continue
            c_here = np.ceil(U / chunk) * (Tn - T)
            c_rest, tail = solve(Tn, j + 1)
            tot = c_here + c_rest
            if tot < out[0]:
                out = (tot, [Tn - T] + tail)
        best[key] = out
        return out

    cost, deltas = solve(0, 0)
    return deltas, float(cost)


def main():
    import jax

    if os.environ.get("DTX_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")
    from directtrajopt_tpu.utils.hostcache import host_cache_dir

    jax.config.update(
        "jax_compilation_cache_dir",
        host_cache_dir(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from directtrajopt_tpu.benchmarks import make_batched_bilinear_problems
    from directtrajopt_tpu.solvers.solve import solve_batch

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    max_phases = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)
    print(f"device: {dev} B={B}", file=sys.stderr)

    batch = make_batched_bilinear_problems(
        B, N=51, feasible_start=True, taylor_order=6 if on_tpu else 12
    )
    kw = dict(
        mu_init=3e-2,
        tol=1e-5 if on_tpu else 1e-8,
        acceptable_tol=5e-4 if on_tpu else 1e-6,
        acceptable_iter=1,
        hessian_approximation="gauss_newton",
        max_iter=200,
        max_ls=7,
        n_rest_trials=2,
    )
    if on_tpu:
        kw.update(kappa_epsilon=100.0, kappa_mu=0.1)
    res = solve_batch(batch, **kw)
    it = np.asarray(res.iterations)
    conv = np.asarray(res.converged)
    print(
        f"distribution: med {np.median(it):.0f} p90 {np.percentile(it, 90):.0f} "
        f"p95 {np.percentile(it, 95):.0f} max {it.max()} "
        f"({conv.sum()}/{B} converged)"
    )
    chunk = 128
    deltas, cost = optimal_phases(it, chunk=chunk, max_phases=max_phases)
    base = np.ceil(B / chunk) * it.max()
    print(f"single-phase lockstep cost: {base:.0f} chunk-iterations")
    print(
        f"DP-optimal {len(deltas)}-phase schedule: {deltas} "
        f"→ predicted {cost:.0f} chunk-iterations ({base / cost:.2f}× better)"
    )
    print(
        "suggested solve_batch_compact phases:",
        tuple(
            (int(d), None if i == 0 else 1e-3) for i, d in enumerate(deltas)
        ),
    )


if __name__ == "__main__":
    main()
