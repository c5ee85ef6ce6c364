"""On-device split of the IPM iteration cost: prepare / kkt / resolve / residual.

bench_stages.py times each stage as its own dispatch, which the axon tunnel
floors at ~30 ms; here each stage runs K times inside ONE compiled fori_loop
with a data dependency between trips (so XLA cannot hoist or dedupe), and the
per-trip cost is the finite difference between K=K1 and K=K2 programs.

Usage: python tools/iter_split.py [B]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from directtrajopt_tpu.utils.hostcache import host_cache_dir

    jax.config.update(
        "jax_compilation_cache_dir",
        host_cache_dir(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from directtrajopt_tpu.benchmarks import make_batched_bilinear_problems
    from directtrajopt_tpu.solvers.canonical import make_nlp
    from directtrajopt_tpu.solvers.options import IPMOptions
    from directtrajopt_tpu.solvers.ops_riccati import RiccatiOps
    from directtrajopt_tpu.solvers.solve import solve_batch

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    B = int(sys.argv[1]) if len(sys.argv) > 1 else (256 if on_tpu else 8)
    N = 51
    print(f"device: {dev} B={B}", file=sys.stderr)
    batch = make_batched_bilinear_problems(B, N=N, feasible_start=True)

    res = solve_batch(batch, max_iter=15, tol=1e-5, acceptable_tol=5e-4)
    st = res.ipm.state
    jax.block_until_ready(st.Z)
    opt = IPMOptions(tol=1e-5, acceptable_tol=5e-4).astype(jnp.float32)

    K1, K2 = 4, 12

    def marginal(tag, make_loop):
        times = {}
        for K in (K1, K2):
            fn = jax.jit(make_loop(K))
            args = (st.Z, st.lam, st.nu, st.s, st.zL, st.zU, st.mu)
            jax.block_until_ready(fn(batch, *args))
            best = np.inf
            for _ in range(4):
                t0 = time.perf_counter()
                jax.block_until_ready(fn(batch, *args))
                best = min(best, time.perf_counter() - t0)
            times[K] = best
        ms = (times[K2] - times[K1]) / (K2 - K1) * 1e3
        print(f"{tag:>12s}: {ms:7.3f} ms/call")
        return ms

    def per_lane(fn):
        return jax.vmap(fn, in_axes=(0, 0, 0, 0, 0, 0, 0, 0))

    # ---- residual: c_eq + c_in + objective (one line-search trial) -------- #
    def mk_residual(K):
        def one(problem, Z, lam, nu, s, zL, zU, mu):
            nlp = make_nlp(problem)

            def body(i, z):
                v = jnp.sum(nlp.c_eq(z)) + nlp.objective(z)
                return z * (1.0 + 1e-30 * v)

            return jax.lax.fori_loop(0, K, body, Z)

        return per_lane(one)

    # ---- prepare: full derivative/context build --------------------------- #
    def mk_prepare(K):
        def one(problem, Z, lam, nu, s, zL, zU, mu):
            nlp = make_nlp(problem)
            ops = RiccatiOps(nlp)

            def body(i, z):
                ctx = ops.prepare(z, lam, nu)
                v = jnp.sum(ctx.QW) + jnp.sum(ctx.Jr) + jnp.sum(ctx.grad_f)
                return z * (1.0 + 1e-30 * v)

            return jax.lax.fori_loop(0, K, body, Z)

        return per_lane(one)

    # ---- kkt_step: factor + border Schur + main solve (ctx fixed) --------- #
    def mk_kkt(K):
        def one(problem, Z, lam, nu, s, zL, zU, mu):
            nlp = make_nlp(problem)
            ops = RiccatiOps(nlp)
            ctx = ops.prepare(Z, lam, nu)
            dtype = Z.dtype
            lb, ub = nlp.lb.astype(dtype), nlp.ub.astype(dtype)
            free = nlp.free_mask.astype(dtype)
            has_L, has_U = jnp.isfinite(lb), jnp.isfinite(ub)
            dL = jnp.where(has_L, Z - lb, 1.0)
            dU = jnp.where(has_U, ub - Z, 1.0)
            Sig = (
                jnp.where(has_L, zL / dL, 0.0) + jnp.where(has_U, zU / dU, 0.0)
            ) * free
            D = nu / s if nlp.n_in else jnp.zeros((0,), dtype)
            g0 = free * ctx.grad_f

            def body(i, carry):
                z, dlast = carry
                g = g0 * (1.0 + 1e-30 * jnp.sum(z))
                dZ, lam_p, ok, delta, _ = ctx.kkt_step(Sig, D, g, -ctx.c_e, dlast, opt)
                return z * (1.0 + 1e-30 * jnp.sum(dZ)), delta

            z, _ = jax.lax.fori_loop(0, K, body, (Z, jnp.zeros((), dtype)))
            return z

        return per_lane(one)

    # ---- kkt + resolve.many (the full per-iteration linear algebra) ------- #
    def mk_kkt_resolve(K):
        def one(problem, Z, lam, nu, s, zL, zU, mu):
            nlp = make_nlp(problem)
            ops = RiccatiOps(nlp)
            ctx = ops.prepare(Z, lam, nu)
            dtype = Z.dtype
            lb, ub = nlp.lb.astype(dtype), nlp.ub.astype(dtype)
            free = nlp.free_mask.astype(dtype)
            has_L, has_U = jnp.isfinite(lb), jnp.isfinite(ub)
            dL = jnp.where(has_L, Z - lb, 1.0)
            dU = jnp.where(has_U, ub - Z, 1.0)
            Sig = (
                jnp.where(has_L, zL / dL, 0.0) + jnp.where(has_U, zU / dU, 0.0)
            ) * free
            D = nu / s if nlp.n_in else jnp.zeros((0,), dtype)
            g0 = free * ctx.grad_f

            def body(i, carry):
                z, dlast = carry
                g = g0 * (1.0 + 1e-30 * jnp.sum(z))
                dZ, lam_p, ok, delta, resolve = ctx.kkt_step(
                    Sig, D, g, -ctx.c_e, dlast, opt
                )
                rz2 = jnp.stack([-g, -g0])
                rc2 = jnp.stack([-ctx.c_e, -ctx.c_e])
                dZ2, _ = resolve.many(rz2, rc2)
                return z * (1.0 + 1e-30 * (jnp.sum(dZ) + jnp.sum(dZ2))), delta

            z, _ = jax.lax.fori_loop(0, K, body, (Z, jnp.zeros((), dtype)))
            return z

        return per_lane(one)

    r_res = marginal("residual", mk_residual)
    r_prep = marginal("prepare", mk_prepare)
    r_kkt = marginal("kkt_step", mk_kkt)
    r_full = marginal("kkt+resolve", mk_kkt_resolve)
    print(
        f"   resolve.many(R=2) ≈ {r_full - r_kkt:.3f} ms; "
        f"prepare {r_prep:.3f}; 12 trials ≈ {12 * r_res:.3f}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
