"""Iteration-count experiments on the N=51 bilinear seed batch (CPU or TPU).

Measures the iterations-to-convergence distribution at strict tolerance for
candidate solver tweaks (θ-growth cap, residual refinement, ...). The p90+
tail is what a lockstep batch pays for, so tail reduction = throughput
(VERDICT r1 item 3 / STATUS next-#1).

Usage: python tools/iters_experiment.py [B] [max_iter]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    if os.environ.get("DTX_FORCE_CPU"):
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
    from directtrajopt_tpu.solvers.solve import cast_problem, solve_batch

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    max_iter = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    dev = jax.devices()[0]
    print(f"device: {dev} B={B} max_iter={max_iter}", file=sys.stderr, flush=True)

    batch = cast_problem(
        make_batched_bilinear_problems(B, N=51, feasible_start=True), jnp.float32
    )
    base = dict(
        tol=1e-6, acceptable_tol=1e-6, acceptable_iter=100, mu_init=3e-2,
        max_iter=max_iter,
    )

    def run(tag, **kw):
        t0 = time.time()
        res = solve_batch(batch, **{**base, **kw})
        res.kkt_error.block_until_ready()
        dt = time.time() - t0
        it = np.asarray(res.iterations)
        conv = np.asarray(res.converged)
        itc = it[conv] if conv.any() else np.array([max_iter])
        print(
            f"{tag:>24s}: conv {conv.sum():3d}/{B}  iters med {np.median(itc):5.0f} "
            f"p90 {np.percentile(itc, 90):5.0f} max {itc.max():4d}  wall {dt:6.1f}s",
            flush=True,
        )

    import json

    names = sys.argv[3] if len(sys.argv) > 3 else None
    configs = {
        "base": {},  # current defaults (δ_w ≥ μ proximal floor since r2)
        "classic": dict(delta_w_mu_scale=0.0),  # inertia-only regularization
        "refine": dict(refine_residuals=True),
        "cap30": dict(theta_growth_cap=30.0),
        "cap10": dict(theta_growth_cap=10.0),
        "cap3": dict(theta_growth_cap=3.0),
        "cap10+refine": dict(theta_growth_cap=10.0, refine_residuals=True),
        "dwmin1e-6": dict(delta_w_min=1e-6),
        "dwmin1e-5": dict(delta_w_min=1e-5),
        "dwmin1e-4": dict(delta_w_min=1e-4),
        "dwmu0.1": dict(delta_w_mu_scale=0.1),
        "dwmu1": dict(delta_w_mu_scale=1.0),
        "dwmu10": dict(delta_w_mu_scale=10.0),
        "dwmin1e-5+cap30": dict(delta_w_min=1e-5, theta_growth_cap=30.0),
        "sw": dict(hessian_regularization="stagewise"),
        "proj": dict(hessian_regularization="project"),
        "flip": dict(hessian_regularization="flip"),
        "gn": dict(hessian_approximation="gauss_newton"),
        "gn+dwmu0": dict(hessian_approximation="gauss_newton", delta_w_mu_scale=0.0),
    }
    for tag, kw in configs.items():
        if names and tag not in names.split(","):
            continue
        run(tag, **kw)


if __name__ == "__main__":
    main()
