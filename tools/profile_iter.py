"""Capture an XLA profiler trace of the batched IPM solve on the TPU.

The per-stage marginals (bench_stages.py) only attribute ~half of the 8.7 ms
iteration marginal; this grabs a real op-level timeline to find the rest.
Writes a TensorBoard trace dir; we post-process the trace.json.gz here to a
self-reliant op-category summary (no TensorBoard needed).
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from directtrajopt_tpu.benchmarks import make_batched_bilinear_problems
    from directtrajopt_tpu.solvers.solve import solve_batch

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    bench_mode = "bench" in sys.argv[2:]
    batch = make_batched_bilinear_problems(
        B, N=51, feasible_start=True, taylor_order=6 if bench_mode else 12
    )
    kw = dict(
        max_iter=20,
        tol=1e-5,
        acceptable_tol=5e-4,
        hessian_approximation="gauss_newton",
    )
    if bench_mode:
        # mirror bench.py's TPU schedule so the profile reflects the
        # headline path (SOC/restoration off, trimmed grid, aggressive μ)
        kw.update(
            acceptable_iter=1, kappa_epsilon=100.0, kappa_mu=0.1,
            mu_init=3e-2, max_ls=7, n_rest_trials=0, max_soc=0,
            delta_w_min=1e-3, delta_w_decay=1.0,
        )
    # warm up / compile outside the trace
    res = solve_batch(batch, **kw)
    jax.block_until_ready(res.ipm.Z)

    out = "/tmp/dtx_trace"
    with jax.profiler.trace(out):
        res = solve_batch(batch, **kw)
        jax.block_until_ready(res.ipm.Z)
    print(f"trace written to {out}", file=sys.stderr)

    files = sorted(glob.glob(out + "/**/*.trace.json.gz", recursive=True))
    if not files:
        print("NO TRACE FILES (profiler unsupported through the tunnel?)")
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    # aggregate complete events by name prefix (fusion/op kind)
    by_cat = defaultdict(float)
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        name = ev.get("name", "?")
        pid_name = ev.get("pid")
        # keep device-lane events only (heuristic: XLA op names)
        cat = name.split(".")[0].split("(")[0][:40]
        by_cat[cat] += ev["dur"] / 1e3  # ms
        total += ev["dur"] / 1e3
    top = sorted(by_cat.items(), key=lambda kv: -kv[1])[:30]
    print(json.dumps({"total_ms_sum": round(total, 2), "top": [
        {"op": k, "ms": round(v, 3)} for k, v in top
    ]}, indent=1))


if __name__ == "__main__":
    main()
