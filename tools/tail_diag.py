"""Diagnose the iteration-count tail under the bench profile.

Runs the bench's GN + aggressive-band schedule on the N=51 bilinear seed
batch, reports the per-lane iteration distribution, then re-solves the worst
lanes one at a time with print_level=5 to show what the grind looks like
(line-search collapse vs mu grind vs valley oscillation). The p90+ tail is
what a lockstep batch pays for.

Usage: python tools/tail_diag.py [B] [n_worst]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    if os.environ.get("DTX_FORCE_CPU") or True:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from directtrajopt_tpu.utils.hostcache import host_cache_dir

    jax.config.update(
        "jax_compilation_cache_dir",
        host_cache_dir(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp

    from directtrajopt_tpu.benchmarks import make_batched_bilinear_problems
    from directtrajopt_tpu.solvers.solve import cast_problem, solve, solve_batch

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n_worst = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    kwargs = dict(
        tol=1e-5,
        acceptable_tol=5e-4,
        acceptable_iter=1,
        kappa_epsilon=100.0,
        kappa_mu=0.1,
        hessian_approximation="gauss_newton",
        mu_init=3e-2,
        max_iter=150,
    )
    batch = cast_problem(
        make_batched_bilinear_problems(B, N=51, feasible_start=True), jnp.float32
    )
    res = solve_batch(batch, **kwargs)
    it = np.asarray(res.iterations)
    conv = np.asarray(res.converged)
    print(
        f"conv {conv.sum()}/{B} iters med {np.median(it):.0f} "
        f"p90 {np.percentile(it, 90):.0f} max {it.max()}"
    )
    order = np.argsort(-it)
    print("worst lanes:", [(int(i), int(it[i]), bool(conv[i])) for i in order[:8]])

    for i in order[:n_worst]:
        one = jax.tree.map(lambda x: np.asarray(x)[int(i)], batch)
        print(f"\n=== lane {int(i)} (lockstep iters {int(it[i])}) trace ===")
        r1 = solve(one, print_level=5, **kwargs)
        print(
            f"lane {int(i)}: iters {int(r1.iterations)} conv {bool(r1.converged)} "
            f"kkt {float(r1.kkt_error):.2e} status {int(r1.status)}"
        )


if __name__ == "__main__":
    main()
