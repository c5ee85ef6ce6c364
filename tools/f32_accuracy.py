"""Measure on-chip solve accuracy against the f64 golden solution.

The reference's #1 baseline target is matching Ipopt's N=51 control sequence
to 1e-4 trajectory RMS (BASELINE.md); Ipopt runs f64 at tol=1e-8
(`/root/reference/src/solvers/ipopt_solver/options.jl:34-39`), TPUs run f32.
This harness quantifies the on-chip accuracy ladder on the golden N=51
free-time bilinear problem (only ``u`` is determined at its optimum — dt/x
are gauge freedom, see tests/test_golden.py):

* ``f32``       — the throughput path (Pallas/XLA per DTX_PALLAS)
* ``f32_comp``  — f32 with compensated residual arithmetic
                  (options.compensated_residuals: error-free transforms on
                  the cancellation-limited measurements, no f64 emulation)
* ``f32_refine``— f32 factorization + f64 residual refinement
                  (options.refine_residuals) WITH the Pallas kernels on —
                  composable since the r4 Mosaic x64 fix (the kernels must
                  trace i64/f64-free under jax_enable_x64)
* ``f64``       — full f64 solve from the same start (XLA-emulated on TPU;
                  the on-chip Ipopt-grade reference)
* ``polished``  — f32 solve + warm-started f64 polish (solve_polished)

Env: DTX_FORCE_CPU=1 runs on CPU; DTX_PALLAS=never disables the Pallas
kernel (f32 Riccati via XLA scans) — set per process, it is baked in at
trace time. Prints one JSON line per configuration.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    if os.environ.get("DTX_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from directtrajopt_tpu.benchmarks import make_bilinear_problem
    from directtrajopt_tpu.solvers.solve import cast_problem, solve_jit, solve_polished

    dev = jax.devices()[0]
    print(f"device: {dev}  DTX_PALLAS={os.environ.get('DTX_PALLAS', 'auto')}",
          file=sys.stderr)

    gold = np.load(
        os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                     "bilinear_n51_seed42.npz")
    )
    import jax.numpy as jnp

    prob = cast_problem(
        make_bilinear_problem(N=51, seed=42, free_time=True, feasible_start=True),
        jnp.float32,
    )
    layout = prob.trajectory.layout
    Zg = gold["Z_star"]

    def rms_u(Z):
        sl = layout.comp_slice("u")
        N, d = layout.N, layout.dim
        a = np.asarray(Z, dtype=np.float64)[: N * d].reshape(N, d)[:, sl]
        b = Zg[: N * d].reshape(N, d)[:, sl]
        return float(np.sqrt(np.mean((a - b) ** 2)))

    common = dict(tol=1e-6, acceptable_tol=1e-6, acceptable_iter=100,
                  max_iter=150, mu_init=3e-2)
    prob64 = cast_problem(prob, jnp.float64)

    def run(mode):
        if mode == "f32":
            return solve_jit(prob, **common)
        if mode == "f32_comp":
            return solve_jit(prob, compensated_residuals=True, **common)
        if mode == "f32_refine":
            return solve_jit(prob, refine_residuals=True, **common)
        if mode == "f64":
            return solve_jit(prob64, tol=1e-8, acceptable_tol=1e-8,
                             max_iter=300, mu_init=3e-2)
        return solve_polished(prob, **common)

    for mode in ("f32", "f32_comp", "f32_refine", "f64", "polished"):
        t0 = time.time()
        res = run(mode)
        kkt = float(res.kkt_error)  # real fetch (block_until_ready no-ops via axon)
        compile_s = time.time() - t0
        t0 = time.time()
        res = run(mode)
        kkt = float(res.kkt_error)
        out = {
            "mode": mode,
            "kkt_error": kkt,
            "iters": int(res.iterations),
            "converged": bool(res.converged),
            "rms_u": rms_u(res.ipm.Z),
            "solve_s": round(time.time() - t0, 3),
            "compile_s": round(compile_s, 1),
        }
        print(json.dumps(out))


if __name__ == "__main__":
    main()
