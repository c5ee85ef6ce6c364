"""Knot-count / state-dimension scaling sweep.

The analog of the reference's memory-scaling benchmark
(`/root/reference/benchmark/benchmarks.jl:148-258`: N∈{25,51,101} ×
dim∈{4,8,16}, max_iter=50) — but batched: each cell solves a whole scenario
batch per cell and reports per-solve wall time, versus the reference's
published per-cell Ipopt seconds (`docs/src/benchmarks.md:114-124`).

Usage: python bench_sweep.py [batch]    (markdown table on stdout)
"""

import sys
import time

import numpy as np


REFERENCE_IPOPT_S = {  # docs/src/benchmarks.md:116-124 (median of 3 seeds)
    (25, 4): 0.81, (25, 8): 0.92, (25, 16): 8.89,
    (51, 4): 1.61, (51, 8): 8.16, (51, 16): 58.63,
    (101, 4): 3.54, (101, 8): 0.66, (101, 16): 114.43,
}


def main():
    import jax

    from directtrajopt_tpu.benchmarks import make_scaled_problem
    from directtrajopt_tpu.solvers.solve import solve_batch, solve_batch_compact

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)
    B = int(sys.argv[1]) if len(sys.argv) > 1 else (256 if on_tpu else 4)
    print(f"device: {dev}, batch per cell: {B}", file=sys.stderr)

    kwargs = dict(
        tol=1e-5 if on_tpu else 1e-8,
        acceptable_tol=5e-4 if on_tpu else 1e-6,
        acceptable_iter=5,
        # Gauss-Newton: on the bilinear family it cuts both the prepare-stage
        # AD cost and the iteration count (see bench.py / STATUS.md)
        hessian_approximation="gauss_newton",
    )
    if on_tpu:
        # aggressive barrier schedule for the acceptable-band target, and the
        # on-device compacting scheduler (128-lane chunks — see bench.py);
        # phase budgets sum to the reference's 50-iteration sweep cap
        kwargs.update(kappa_epsilon=100.0, kappa_mu=0.1)

    def run_cell(batch):
        if on_tpu:
            return solve_batch_compact(
                batch, phases=((20, None), (30, 1e-3)), chunk=128, **kwargs
            )
        return solve_batch(batch, max_iter=50, **kwargs)

    rows = []
    for N in (25, 51, 101):
        for dim in (4, 8, 16):
            probs = [make_scaled_problem(N=N, state_dim=dim, seed=42 + i) for i in range(B)]
            batch = jax.tree.map(lambda *xs: np.stack(xs), *probs)
            batch = jax.tree.map(jax.numpy.asarray, batch)
            t0 = time.time()
            res = run_cell(batch)
            np.asarray(res.kkt_error)  # real fetch: block_until_ready no-ops via axon
            compile_s = time.time() - t0
            t0 = time.time()
            res = run_cell(batch)
            np.asarray(res.kkt_error)  # real fetch: block_until_ready no-ops via axon
            wall = time.time() - t0
            conv = int(np.asarray(res.converged).sum())
            per_solve = wall / B
            ref = REFERENCE_IPOPT_S[(N, dim)]
            rows.append(
                (N, dim, per_solve, conv, B, ref, ref / per_solve, compile_s)
            )
            print(
                f"N={N} dim={dim}: {per_solve*1000:.1f} ms/solve "
                f"({conv}/{B} conv, ref Ipopt {ref}s, {ref/per_solve:.0f}x)",
                file=sys.stderr,
            )

    print("| N | dim | ms/solve (batched) | conv | ref Ipopt s | speedup |")
    print("|--:|--:|--:|--:|--:|--:|")
    for N, dim, per, conv, B_, ref, spd, _ in rows:
        print(
            f"| {N} | {dim} | {per*1000:.1f} | {conv}/{B_} | {ref} | {spd:.0f}x |"
        )


if __name__ == "__main__":
    main()
