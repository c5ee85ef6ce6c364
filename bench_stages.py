"""Per-stage IPM micro-benchmarks — the analog of the reference's evaluator
micro-benchmarks (`/root/reference/benchmark/benchmarks.jl:23-38`), but for
the stages of the on-device batched IPM iteration:

    prepare       derivative/context build (residuals, Jacobians, Hessians)
    residual      one c_eq + c_in + objective evaluation (a single LS trial)
    kkt_step      factor (with inertia retry) + border Schur + main solve
    soc_resolve   one extra solve reusing the factorization
    ls_grid       the parallel backtracking trial grid (max_ls residual evals)
    iter_marginal marginal wall cost of one full IPM iteration (finite diff
                  of max_iter)

All timings are batched (B scenarios on one chip, the production unit of
work) and reported as per-batch milliseconds.

Writes a stable-schema ``bench_report.json`` (analog of the reference's
`benchmark/BenchmarkUtils.jl:271-291` artifact) and prints one JSON line to
stdout; human-readable table goes to stderr.
"""

import json
import sys
import time

import numpy as np


def _timeit(fn, *args, repeats=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3  # ms


def main():
    import jax
    import jax.numpy as jnp

    from directtrajopt_tpu.benchmarks import make_batched_bilinear_problems
    from directtrajopt_tpu.solvers.canonical import make_nlp
    from directtrajopt_tpu.solvers.options import IPMOptions
    from directtrajopt_tpu.solvers.solve import solve_batch

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)
    print(f"device: {dev}, platform: {dev.platform}", file=sys.stderr)

    N = 51
    B = 256 if on_tpu else 8
    batch = make_batched_bilinear_problems(B, N=N, feasible_start=True)
    opt = IPMOptions(tol=1e-5 if on_tpu else 1e-8, acceptable_tol=5e-4)

    # a realistic mid-solve point: run 15 iterations and keep the IPM state
    res15 = solve_batch(batch, max_iter=15, tol=opt.tol, acceptable_tol=opt.acceptable_tol)
    st = res15.ipm.state
    jax.block_until_ready(st.Z)

    # ---- stage functions (per instance; vmapped over the problem pytree) --- #
    def _with_ctx(fn):
        def run(problem, Z, lam, nu, s, zL, zU, mu):
            nlp = make_nlp(problem)
            from directtrajopt_tpu.solvers.ops_riccati import RiccatiOps

            ops = RiccatiOps(nlp)
            ctx = ops.prepare(Z, lam, nu)
            return fn(nlp, ctx, Z, lam, nu, s, zL, zU, mu)

        return jax.jit(jax.vmap(run, in_axes=(0, 0, 0, 0, 0, 0, 0, 0)))

    def _sigmas(nlp, ctx, Z, s, zL, zU, nu, mu, dtype):
        lb, ub = nlp.lb.astype(dtype), nlp.ub.astype(dtype)
        has_L, has_U = jnp.isfinite(lb), jnp.isfinite(ub)
        free = nlp.free_mask.astype(dtype)
        mask_L = has_L & (free > 0)
        mask_U = has_U & (free > 0)
        dL = jnp.where(has_L, Z - lb, 1.0)
        dU = jnp.where(has_U, ub - Z, 1.0)
        SigL = jnp.where(mask_L, zL / dL, 0.0)
        SigU = jnp.where(mask_U, zU / dU, 0.0)
        Sig = (SigL + SigU) * free
        D = nu / s if nlp.n_in else jnp.zeros((0,), dtype=dtype)
        g_hat = (
            ctx.grad_f
            - jnp.where(mask_L, mu / dL, 0.0)
            + jnp.where(mask_U, mu / dU, 0.0)
        )
        if nlp.n_in:
            g_hat = g_hat + ctx.JiT(mu / s + D * (ctx.c_i + s))
        return Sig, D, free * g_hat

    def stage_prepare(nlp, ctx, Z, lam, nu, s, zL, zU, mu):
        return ctx.grad_f, ctx.c_e, ctx.QW

    def stage_kkt(nlp, ctx, Z, lam, nu, s, zL, zU, mu):
        dtype = Z.dtype
        Sig, D, g_hat = _sigmas(nlp, ctx, Z, s, zL, zU, nu, mu, dtype)
        dZ, lam_p, ok, delta, _ = ctx.kkt_step(
            Sig, D, g_hat, -ctx.c_e, jnp.zeros((), dtype), opt.astype(dtype)
        )
        return dZ, lam_p, delta

    def stage_kkt_plus_soc(nlp, ctx, Z, lam, nu, s, zL, zU, mu):
        dtype = Z.dtype
        Sig, D, g_hat = _sigmas(nlp, ctx, Z, s, zL, zU, nu, mu, dtype)
        dZ, lam_p, ok, delta, resolve = ctx.kkt_step(
            Sig, D, g_hat, -ctx.c_e, jnp.zeros((), dtype), opt.astype(dtype)
        )
        dZ2, lam2 = resolve(-g_hat, -ctx.c_e * 0.5)
        return dZ, dZ2

    def stage_residual(nlp, ctx, Z, lam, nu, s, zL, zU, mu):
        return nlp.c_eq(Z), nlp.c_in(Z), nlp.objective(Z)

    def stage_ls_grid(nlp, ctx, Z, lam, nu, s, zL, zU, mu):
        dtype = Z.dtype
        dZ = jnp.sin(Z)  # synthetic direction; cost is evaluation-dominated
        alphas = 0.5 ** jnp.arange(1, 11, dtype=dtype)

        def trial(a):
            Zt = nlp.apply_pins(Z + a * dZ)
            return nlp.objective(Zt), jnp.sum(jnp.abs(nlp.c_eq(Zt))), jnp.sum(
                jnp.abs(nlp.c_in(Zt))
            )

        return jax.vmap(trial)(alphas)

    stages = {
        "prepare": _with_ctx(stage_prepare),
        "residual": _with_ctx(stage_residual),
        "kkt_step": _with_ctx(stage_kkt),
        "kkt_step+soc": _with_ctx(stage_kkt_plus_soc),
        "ls_grid10": _with_ctx(stage_ls_grid),
    }

    args = (batch, st.Z, st.lam, st.nu, st.s, st.zL, st.zU, st.mu)
    report = {}
    for name, fn in stages.items():
        ms = _timeit(fn, *args)
        report[name] = round(ms, 3)
        print(f"{name:16s} {ms:8.2f} ms / batch of {B}", file=sys.stderr)

    # marginal per-iteration cost of the full IPM body
    def run_k(k):
        r = solve_batch(batch, max_iter=k, tol=1e-20, acceptable_tol=1e-20)
        return r.kkt_error

    t10 = _timeit(run_k, 10, repeats=3)
    t30 = _timeit(run_k, 30, repeats=3)
    per_iter = (t30 - t10) / 20.0
    report["iter_marginal"] = round(per_iter, 3)
    print(f"{'iter_marginal':16s} {per_iter:8.2f} ms / batch of {B}", file=sys.stderr)

    payload = {
        "schema": "dtx-bench-stages-v1",
        "device": str(dev),
        "platform": dev.platform,
        "batch": B,
        "N": N,
        "stages_ms": report,
    }
    with open("bench_report.json", "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({"metric": "iter_marginal_ms_b%d" % B,
                      "value": report["iter_marginal"], "unit": "ms",
                      "vs_baseline": None}))


if __name__ == "__main__":
    main()
