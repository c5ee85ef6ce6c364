"""Knot-count / state-dimension scaling sweep.

The analog of the reference's memory-scaling benchmark
(`/root/reference/benchmark/benchmarks.jl:148-258`: N∈{25,51,101} ×
dim∈{4,8,16}, max_iter=50) — but batched: each cell solves a whole scenario
batch per cell and reports per-solve wall time, versus the reference's
published per-cell Ipopt seconds (`docs/src/benchmarks.md:114-124`).

Usage: python bench_sweep.py [batch]    (markdown table on stdout)
"""

import sys


REFERENCE_IPOPT_S = {  # docs/src/benchmarks.md:116-124 (median of 3 seeds)
    (25, 4): 0.81, (25, 8): 0.92, (25, 16): 8.89,
    (51, 4): 1.61, (51, 8): 8.16, (51, 16): 58.63,
    (101, 4): 3.54, (101, 8): 0.66, (101, 16): 114.43,
}


CELL_TIMEOUT_S = 2400


def _run_cell_subprocess(N, dim, B_cell):
    """One cell in its own OS process.

    A TPU-worker crash (observed: dim=16 cells at large B hard-kill the
    worker with a runtime 'kernel fault' report even with every Pallas
    kernel disabled — an XLA:TPU fault, not ours) poisons the whole client
    process: every later device_put fails UNAVAILABLE. Per-cell processes
    contain the blast radius, and the persistent compile cache keeps the
    re-spawn cost at one cache lookup."""
    import json as _json
    import os as _os
    import subprocess
    import sys as _sys

    repo = _os.path.dirname(_os.path.abspath(__file__))

    code = f"""
import json, time, sys
import numpy as np, jax
sys.path.insert(0, {repo!r})
from directtrajopt_tpu.utils.hostcache import host_cache_dir
import os
jax.config.update("jax_compilation_cache_dir", host_cache_dir(
    os.path.join({repo!r}, ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
from directtrajopt_tpu.benchmarks import make_scaled_problem
from directtrajopt_tpu.solvers.solve import solve_batch, solve_batch_compact
dev = jax.devices()[0]
on_tpu = dev.platform == "tpu"
if not on_tpu:
    jax.config.update("jax_enable_x64", True)
kwargs = dict(tol=1e-5 if on_tpu else 1e-8, acceptable_tol=5e-4,
              acceptable_iter=5, hessian_approximation="gauss_newton")
if on_tpu:
    kwargs.update(kappa_epsilon=100.0, kappa_mu=0.1)
N, dim, B = {N}, {dim}, {B_cell}
probs = [make_scaled_problem(N=N, state_dim=dim, seed=42 + i) for i in range(B)]
batch = jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *probs)
# UNCAPPED schedule (VERDICT r4 #10): the old 50-iteration cap measured
# capped iteration throughput on the hard dim>=8 random-G cells (17/128
# converged at N=51/dim=16), not solving. The compact straggler phases now
# run to a 378-iteration total budget so the per-solve wall is a genuine
# time-to-solution whenever conv>=90%.
def run_cell(b):
    if on_tpu:
        return solve_batch_compact(
            b, phases=((20, None), (30, 1e-3), (72, 1e-3), (256, 1e-3)),
            chunk=128, **kwargs)
    return solve_batch(b, max_iter=378, **kwargs)
t0 = time.time()
res = run_cell(batch)
np.asarray(res.kkt_error)
compile_s = time.time() - t0
t0 = time.time()
res = run_cell(batch)
it = np.asarray(res.iterations)
wall = time.time() - t0
print(json.dumps(dict(wall=wall, compile_s=compile_s,
                      conv=int(np.asarray(res.converged).sum()),
                      it_med=float(np.median(it)),
                      it_p90=float(np.percentile(it, 90)))))
"""
    try:
        r = subprocess.run(
            [_sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=CELL_TIMEOUT_S,
        )
    except subprocess.TimeoutExpired:
        return None, "timeout"
    if r.returncode != 0:
        tail = r.stderr.strip().splitlines()[-1:] or ["?"]
        return None, tail[0][:120]
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    return _json.loads(line), None


def _wait_for_tpu_worker(max_wait_s: float = 1500.0) -> None:
    """Block until the (tunneled) TPU worker answers a tiny computation.

    A dim=16 cell crash kills the shared worker; it recovers after a
    restart window. Probing in a subprocess (a dead tunnel can hang
    jax.devices() indefinitely) with backoff keeps one crash from failing
    every subsequent cell."""
    import subprocess
    import time as _time

    code = (
        "import jax, numpy as np; "
        "x = jax.numpy.ones((8,)); "
        "assert float(jax.numpy.sum(x)) == 8.0"
    )
    deadline = _time.time() + max_wait_s
    delay = 10.0
    while True:
        try:
            r = subprocess.run(
                [sys.executable, "-c", code], capture_output=True, timeout=120
            )
            if r.returncode == 0:
                return
        except Exception:
            pass
        if _time.time() > deadline:
            print("TPU worker still unavailable after backoff", file=sys.stderr)
            return
        print(f"TPU worker unavailable — retrying in {delay:.0f}s", file=sys.stderr)
        _time.sleep(delay)
        delay = min(delay * 2, 120.0)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256

    rows = []
    # the reference grid, plus long-horizon rows (201/501 knots) showcasing
    # the O(N) Riccati + chain-promotion path — the reference publishes no
    # cells there (its sweep stops at N=101). dim=16 cells LAST: they can
    # hard-kill the shared TPU worker (kernel fault), and a dead worker
    # fails every subsequent cell until it recovers — sequencing the
    # crashers after the healthy grid keeps one crash from poisoning it.
    cells = [(N, dim) for N in (25, 51, 101) for dim in (4, 8)]
    cells += [(201, 4), (201, 8), (501, 4)]
    cells += [(N, 16) for N in (25, 51, 101)]
    for N, dim in cells:
        _wait_for_tpu_worker()
        attempts = 0
        B_cell = B if N <= 101 else max(32, B // (2 if N <= 201 else 4))
        if dim >= 8:
            # dim>=8 at large B hard-crashes the TPU worker (see
            # _run_cell_subprocess; the r5 uncapped straggler schedule made
            # dim=8/B=256 crash too); scale with N and dim to bound HBM
            B_cell = min(B_cell, 128 if dim == 8 else (64 if N <= 51 else 32))
        out, err = _run_cell_subprocess(N, dim, B_cell)
        # the tunnel worker intermittently dies mid-cell (kernel fault —
        # observed even on configurations that succeeded in earlier runs):
        # wait for recovery and retry the cell once before recording FAILED
        while out is None and attempts < 1:
            attempts += 1
            print(f"N={N} dim={dim}: retrying after worker recovery ({err})",
                  file=sys.stderr)
            _wait_for_tpu_worker()
            out, err = _run_cell_subprocess(N, dim, B_cell)
        ref = REFERENCE_IPOPT_S.get((N, dim))
        if out is None:
            print(f"N={N} dim={dim}: FAILED ({err})", file=sys.stderr)
            rows.append((N, dim, None, 0, B_cell, ref, None, None))
            continue
        per_solve = out["wall"] / B_cell
        conv = out["conv"]
        # a cell only counts as SOLVED (and its per-solve wall as a true
        # time-to-solution) when >=90% of lanes reach the acceptable level
        solved90 = conv >= 0.9 * B_cell
        spd = (ref / per_solve) if (ref and solved90) else None
        rows.append(
            (N, dim, per_solve, conv, B_cell, ref, spd, out["compile_s"],
             out["it_med"], out["it_p90"], solved90)
        )
        ref_s = f"ref Ipopt {ref}s" if ref else "no ref cell"
        print(
            f"N={N} dim={dim}: {per_solve*1000:.1f} ms/solve "
            f"({conv}/{B_cell} conv, it med/p90 {out['it_med']:.0f}/"
            f"{out['it_p90']:.0f}, {ref_s}, "
            f"{f'{spd:.0f}x' if spd else 'n/a'})",
            file=sys.stderr,
        )

    print("| N | dim | ms/solve (uncapped) | conv | it med/p90 | "
          "ref Ipopt s | speedup |")
    print("|--:|--:|--:|--:|--:|--:|--:|")
    for N, dim, per, conv, B_, ref, spd, _, im, ip, s90 in rows:
        per_s = f"{per*1000:.1f}" if per is not None else "crash"
        if per is not None and not s90:
            per_s += " (<90% conv)"
        it_s = f"{im:.0f}/{ip:.0f}" if per is not None else "—"
        print(
            f"| {N} | {dim} | {per_s} | {conv}/{B_} | {it_s} | "
            f"{ref if ref else '—'} | {f'{spd:.0f}x' if spd else '—'} |"
        )


if __name__ == "__main__":
    main()
