"""Measure the non-monotone line-search memory's effect on iteration count.

Runs the bench family (N=51 bilinear, feasible starts) at several ls_memory
windows and reports converged count + iteration percentiles at equal options.

Usage: python tools/ls_memory_sweep.py [B] [max_iter]
"""

import os
import sys

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
    B = int(sys.argv[1]) if len(sys.argv) > 1 else (128 if on_tpu else 8)
    MI = int(sys.argv[2]) if len(sys.argv) > 2 else 150
    batch = make_batched_bilinear_problems(B, N=51, feasible_start=True)
    base = dict(
        tol=1e-5 if on_tpu else 1e-8,
        acceptable_tol=5e-4 if on_tpu else 1e-6,
        acceptable_iter=1,
        mu_init=3e-2,
        max_iter=MI,
    )
    for M in (1, 3, 5, 8):
        res = solve_batch(batch, ls_memory=M, **base)
        it = np.asarray(res.iterations)
        conv = np.asarray(res.converged)
        itc = it[conv] if conv.any() else it
        print(
            f"M={M}: conv {int(conv.sum())}/{B}  iters med {np.median(itc):.0f} "
            f"p90 {np.percentile(itc, 90):.0f} p95 {np.percentile(itc, 95):.0f} "
            f"max {itc.max() if len(itc) else -1}"
        )


if __name__ == "__main__":
    main()
