"""Benchmark driver: batched 50-knot bilinear collocation solves/s per chip.

Runs the reference's standard bilinear quantum-gate benchmark problem
(`/root/reference/benchmark/problem_utils.jl:10-42`, N=51, 4D state, 2
bounded drives, u→du→ddu chain, free timestep) as a vmapped scenario batch
on one chip and reports throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares against the reference's published single-solve Ipopt
wall time of 0.616 s (= 1.62 solves/s; `docs/src/benchmarks.md:62-66`).

Extra diagnostics go to stderr.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    import directtrajopt_tpu as dtx
    from directtrajopt_tpu.benchmarks import make_batched_bilinear_problems
    from directtrajopt_tpu.solvers.solve import solve_batch

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)
    print(f"device: {dev}, platform: {dev.platform}", file=sys.stderr)

    N = 51
    BATCH = 256 if on_tpu else 8
    MAX_ITER = 120  # straggler cap: lockstep batch pays max-iters for all lanes

    batch = make_batched_bilinear_problems(BATCH, N=N, feasible_start=True)

    kwargs = dict(
        max_iter=MAX_ITER,
        tol=1e-5 if on_tpu else 1e-8,
        acceptable_tol=5e-4 if on_tpu else 1e-6,
        acceptable_iter=5,
    )

    # compile + warm up
    t0 = time.time()
    res = solve_batch(batch, **kwargs)
    res.kkt_error.block_until_ready()
    print(f"compile+first run: {time.time() - t0:.1f}s", file=sys.stderr)

    # timed runs
    times = []
    for _ in range(3):
        t0 = time.time()
        res = solve_batch(batch, **kwargs)
        res.kkt_error.block_until_ready()
        times.append(time.time() - t0)
    wall = float(np.median(times))

    conv = np.asarray(res.converged)
    iters = np.asarray(res.iterations)
    kkt = np.asarray(res.kkt_error)
    n_conv = int(conv.sum())
    solves_per_s = n_conv / wall
    print(
        f"batch={BATCH} wall={wall:.3f}s converged={n_conv}/{BATCH} "
        f"iters: med={np.median(iters):.0f} max={iters.max()} "
        f"kkt: med={np.median(kkt):.2e} max={kkt.max():.2e}",
        file=sys.stderr,
    )

    baseline_solves_per_s = 1.0 / 0.616  # reference Ipopt single-solve
    print(
        json.dumps(
            {
                "metric": "bilinear_n51_solves_per_s",
                "value": round(solves_per_s, 3),
                "unit": "solves/s/chip",
                "vs_baseline": round(solves_per_s / baseline_solves_per_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
