"""Benchmark driver: batched 50-knot bilinear collocation solves/s per chip.

Runs the reference's standard bilinear quantum-gate benchmark problem
(`/root/reference/benchmark/problem_utils.jl:10-42`, N=51, 4D state, 2
bounded drives, u→du→ddu chain, free timestep) as a vmapped scenario batch
on one chip and reports throughput.

Scheduling: a lockstep batch pays max-iterations for every lane, so the
solve runs in two phases — a capped first pass over the full batch, then a
compacted continuation batch of the unconverged stragglers, warm-started
from their current iterates (the trajectory is the checkpoint).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares against the reference's published single-solve Ipopt
wall time of 0.616 s (= 1.62 solves/s; `docs/src/benchmarks.md:62-66`).
Extra diagnostics go to stderr.
"""

import json
import sys
import time

import numpy as np


def _tpu_tunnel_alive(timeout_s: float = 180.0) -> bool:
    """Probe the (axon-tunneled) TPU backend in a subprocess with a timeout.

    ``jax.devices()`` blocks indefinitely when the tunnel is down; probing
    in-process would hang the whole benchmark run. A dead tunnel downgrades
    the run to CPU so the driver still gets its one JSON line."""
    import subprocess
    import sys as _sys

    try:
        r = subprocess.run(
            [_sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    import os

    if not _tpu_tunnel_alive():
        print("TPU tunnel unresponsive — falling back to CPU", file=sys.stderr)
        os.environ["JAX_PLATFORMS"] = "cpu"  # read by the subprocess-free path

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # sitecustomize imports jax before env vars are read; set it directly
        jax.config.update("jax_platforms", "cpu")

    # persistent compile cache: the batched-IPM XLA program is identical
    # across runs; a warm cache removes minutes of (tunnel) compile time
    from directtrajopt_tpu.utils.hostcache import host_cache_dir

    jax.config.update(
        "jax_compilation_cache_dir",
        host_cache_dir(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import directtrajopt_tpu as dtx  # noqa: F401
    from directtrajopt_tpu.benchmarks import make_batched_bilinear_problems
    from directtrajopt_tpu.solvers.solve import solve_batch_compact

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)
    print(f"device: {dev}, platform: {dev.platform}", file=sys.stderr)

    N = 51
    # B=8192/chunk=256 is the measured throughput plateau (r4): after the
    # kernel/layout/scatter work the per-lane compute no longer dominates —
    # per-WHILE-iteration fixed op overhead does, and wider chunks + more
    # chunks amortize it (B=512:6.9k, 2048:14.9k, 4096:18.2k, 8192:21.0k,
    # 16384:20.7k solves/s at full convergence). The r2-era "128 lanes
    # saturate the chip" guidance predates those fixes.
    BATCH = 8192 if on_tpu else 8
    # solve_batch_compact: every phase is a lax.scan over compacted chunks
    # inside ONE jitted program (no host round trips between phases; the old
    # host-driven two-phase scheduler measured 1223/s vs 1460/s compact).
    # Phase schedule tuned on-chip: (16, 16, 64) iterations with primal-only
    # μ restarts at 1e-3. Measured and rejected: carrying phase-1 duals into
    # later phases converges FEWER lanes on this nonconvex family.
    CONT = min(256, BATCH)
    # Gauss-Newton Hessian (options.py: hessian_approximation): on this
    # bilinear family GN both removes the dominant prepare-stage AD pass and
    # cuts iterations — CPU f64 strict-tol profile over 8 seeds [48..137]
    # (exact) → [17..21] (GN); keep the δ_w≥0.3μ floor ON under GN.
    PHASES = (
        ((16, None), (16, 1e-3), (64, 1e-3)) if on_tpu else ((26, None), (64, 1e-2))
    )
    MU1 = 3e-2 if on_tpu else 1e-1
    # Taylor order for the expv action: ‖Δt·G‖ ≤ 0.6 over the dt bounds, so
    # order 6 truncates at ≤6e-6 ≪ the acceptable band; measured on-chip the
    # order-6 and order-12 solutions are identical (max RMS(u) diff 1.1e-8
    # over 512 lanes) while the solve runs ~1.5× faster (the expv chain
    # dominates prepare AND every line-search trial). Golden/accuracy tests
    # keep the order-12 default.
    TAYLOR = 6 if on_tpu else 12
    # Aggressive barrier schedule for the acceptable-band target: κ_ε=100
    # lets μ drop as soon as the inner error is within 100·μ, κ_μ=0.1 plunges
    # it; measured on the CPU-f32 proxy (B=64): iterations med 19→16,
    # p90 69→27, max 119→41 at identical convergence (64/64) and identical
    # acceptable-band KKT quality. NOT a default: at strict tol=1e-8 the same
    # schedule outruns the central path and grinds (golden f64 check).
    sched = (
        dict(kappa_epsilon=100.0, kappa_mu=0.1)
        if on_tpu
        else {}
    )
    sched["hessian_approximation"] = "gauss_newton"
    if on_tpu:
        # trimmed trial grid (7 backtracking slots, +3% in r3) and NO
        # SOC/restoration directions (max_soc=0, n_rest_trials=0): on this
        # family under the aggressive acceptable-band schedule the extra
        # directions almost never win a trial, but their multi-RHS resolve
        # costs a full factor-sweep pass per iteration — dropping it
        # measured 3050 → 3350-3560 solves/s at identical 512/512
        # convergence (r4; tail iterations rise ~40%, the compact scheduler
        # absorbs them). Keep SOC on for strict-tolerance or
        # harder-constrained runs.
        sched.update(max_ls=7, n_rest_trials=0, max_soc=0)
        # constant δ_w floor at the family's gauge-valley curvature scale
        # (~1e-4..1e-3): the μ-scaled floor decays below it as μ plunges, so
        # per-lane inertia retries fire every ~3rd iteration — and in a
        # lockstep batch SOME lane always retries, costing a full extra
        # factor sweep nearly every batched iteration (profiled 2.05
        # sweeps/accepted at B=512). A 1e-3 floor kills the retries AND
        # improves the proximal damping: CPU-f32 proxy (B=64) med/p90/max
        # 17/25/33 → 11/12/16 at 64/64 conv, identical acceptable-band KKT.
        sched.update(delta_w_min=1e-3, delta_w_decay=1.0)

    batch = make_batched_bilinear_problems(
        BATCH, N=N, feasible_start=True, taylor_order=TAYLOR
    )
    # pin the problem batch on-device ONCE: without this every timed repeat
    # re-ships the full 512-problem pytree through the (axon) tunnel, which
    # both dominated wall time and was the run-to-run variance source —
    # measured 3474 median / 3152-4657 per-run swing with host inputs vs
    # 6818 median / 6745-6939 pinned (device compute is ~45 ms/run; the
    # transfer was ~100 ms ± 40). The solver benchmark measures solves, not
    # tunnel bandwidth — a production pipeline keeps its scenario batch
    # device-resident exactly like this.
    batch = jax.tree.map(
        lambda x: jax.device_put(x) if hasattr(x, "shape") else x, batch
    )
    jax.block_until_ready(
        [x for x in jax.tree.leaves(batch) if hasattr(x, "shape")]
    )

    # acceptable_iter=1: stop a lane at its FIRST dip into the acceptable
    # band — the solver returns its best-KKT iterate, so the dip is a kept
    # certificate, and lingering costs the whole lockstep batch (measured on
    # this family: median 36 vs 64+ iterations, 53/64 vs 19/64 converged).
    kwargs = dict(
        tol=1e-5 if on_tpu else 1e-8,
        acceptable_tol=5e-4 if on_tpu else 1e-6,
        acceptable_iter=1,
        **sched,
    )
    sched_kw = dict(
        kwargs,
        mu_init=MU1,
        phases=PHASES,
        chunk=CONT,
    )

    def run():
        t0 = time.time()
        res = solve_batch_compact(batch, **sched_kw)
        conv = np.asarray(res.converged)
        res.kkt_error.block_until_ready()
        return time.time() - t0, int(conv.sum()), res

    # warm up / compile both phases
    t0 = time.time()
    run()
    compile_s = time.time() - t0
    print(f"compile+first run: {compile_s:.1f}s", file=sys.stderr)

    # timed runs: the tunnel's run-to-run variance is large (same-code
    # history spans 2773–4005 solves/s), so report median of >=5 repeats
    # plus the IQR as an explicit "spread" field — per-step perf claims
    # must clear this band to be real
    times, convs = [], []
    for _ in range(5):
        w, c, res = run()
        times.append(w)
        convs.append(c)
    wall = float(np.median(times))
    n_conv = int(np.median(convs))

    solves_per_s = n_conv / wall
    rates = np.sort(n_conv / np.asarray(times))
    q1, q3 = np.percentile(rates, [25, 75])
    spread = float(q3 - q1)
    n_p2 = int((np.asarray(res.iterations) > PHASES[0][0]).sum())
    print(
        f"batch={BATCH} wall={wall:.3f}s converged={n_conv}/{BATCH} "
        f"(stragglers {n_p2})",
        file=sys.stderr,
    )

    baseline_solves_per_s = 1.0 / 0.616  # reference Ipopt single-solve
    record = {
        "metric": "bilinear_n51_solves_per_s",
        "value": round(solves_per_s, 3),
        "unit": "solves/s/chip",
        "vs_baseline": round(solves_per_s / baseline_solves_per_s, 2),
        "spread": round(spread, 1),
        "compile_s": round(compile_s, 1),
    }
    print(json.dumps(record))

    # regression tracking (analog of the reference's BenchmarkUtils alerting,
    # `benchmark/BenchmarkUtils.jl:271-291`): append to a local history and
    # warn when this run is >25% below the median of the trailing window
    # (the tunnel's run-to-run variance is ~±10%)
    hist_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_history.jsonl"
    )
    prior = []
    if os.path.exists(hist_path):
        with open(hist_path) as fh:
            prior = [
                json.loads(line)["value"]
                for line in fh
                if line.strip()
                and json.loads(line).get("platform") == dev.platform
            ][-8:]
    with open(hist_path, "a") as fh:
        fh.write(
            json.dumps(
                dict(
                    record,
                    platform=dev.platform,
                    converged=n_conv,
                    batch=BATCH,
                    repeats=len(times),
                )
            )
            + "\n"
        )
    if len(prior) >= 3:
        med = float(np.median(prior))
        if solves_per_s < 0.75 * med:
            print(
                f"REGRESSION WARNING: {solves_per_s:.1f} solves/s is "
                f"{100 * (1 - solves_per_s / med):.0f}% below the trailing "
                f"median {med:.1f} (n={len(prior)})",
                file=sys.stderr,
            )


if __name__ == "__main__":
    main()
