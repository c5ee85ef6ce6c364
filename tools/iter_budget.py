"""Split the marginal IPM iteration cost into stages by option ablation.

The per-stage jit timings in bench_stages.py are floor-limited by tunnel
dispatch latency (~30 ms); the only trustworthy on-TPU number is the marginal
cost of one extra iteration inside the compiled while_loop. This tool finite-
differences max_iter under option ablations to attribute that marginal cost:

    baseline        max_ls=10, n_rest_trials=3 (production options)
    ls4             max_ls=4  → grid trial cost (6 fewer residual evals)
    ls4_rest0       max_ls=4, n_rest_trials=0 → restoration RHS cost
    scan            DTX_PALLAS=never → Pallas kernel vs XLA scan

Usage: python tools/iter_budget.py [B]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from directtrajopt_tpu.utils.hostcache import host_cache_dir

    jax.config.update(
        "jax_compilation_cache_dir",
        host_cache_dir(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from directtrajopt_tpu.benchmarks import make_batched_bilinear_problems
    from directtrajopt_tpu.solvers.solve import solve_batch

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    B = int(sys.argv[1]) if len(sys.argv) > 1 else (256 if on_tpu else 8)
    N = 51
    print(f"device: {dev} B={B}", file=sys.stderr)
    batch = make_batched_bilinear_problems(B, N=N, feasible_start=True)

    base = dict(tol=1e-5, acceptable_tol=5e-4, acceptable_iter=1, mu_init=3e-2)
    I0, I1 = 12, 28

    def marginal(tag, **kw):
        times = {}
        for mi in (I0, I1):
            fn = lambda: solve_batch(batch, max_iter=mi, **base, **kw)
            fn().kkt_error.block_until_ready()  # compile
            best = np.inf
            for _ in range(4):
                t0 = time.perf_counter()
                fn().kkt_error.block_until_ready()
                best = min(best, time.perf_counter() - t0)
            times[mi] = best
        ms = (times[I1] - times[I0]) / (I1 - I0) * 1e3
        print(f"{tag:>12s}: {ms:7.3f} ms/iter  (wall {times[I0]*1e3:.0f} / {times[I1]*1e3:.0f} ms)")
        return ms

    marginal("baseline")
    marginal("ls4", max_ls=4)
    marginal("ls4_rest0", max_ls=4, n_rest_trials=0)
    os.environ["DTX_PALLAS"] = "never"
    # new RiccatiOps instances read the env var; clear the cached solver so
    # the ablation actually retraces
    import directtrajopt_tpu.solvers.solve as _solve_mod

    _solve_mod._batched_solver.cache_clear()
    marginal("scan")
    del os.environ["DTX_PALLAS"]


if __name__ == "__main__":
    main()
