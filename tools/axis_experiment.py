"""Measure batch-axis placement: leading (current) vs trailing vmap axis.

The op-level profile (tools/profile_iter.py) shows the iteration cost is
dominated by prepare-stage fusions shaped [B,50,11,4] whose minor dims are
the TINY matrix dims — TPU tiles (…,4) pad the lane dimension 4→128, a 32×
waste. vmapping with in_axes=-1 puts B minor so tiles fill with lanes.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from directtrajopt_tpu.benchmarks import make_batched_bilinear_problems
    from directtrajopt_tpu.solvers.options import IPMOptions
    from directtrajopt_tpu.solvers.solve import _solve_impl

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    iters = 20
    batch = make_batched_bilinear_problems(B, N=51, feasible_start=True)
    opt = IPMOptions(
        max_iter=iters, tol=1e-5, acceptable_tol=5e-4,
        hessian_approximation="gauss_newton",
    )

    def solve_one(p, o):
        r = _solve_impl(p, o, "riccati", None, None)
        return r.ipm.Z, r.converged, r.iterations

    lead = jax.jit(jax.vmap(solve_one, in_axes=(0, None)))
    trail = jax.jit(jax.vmap(solve_one, in_axes=(-1, None), out_axes=-1))

    batch_t = jax.tree.map(
        lambda x: jnp.moveaxis(x, 0, -1)
        if hasattr(x, "ndim") and x.ndim > 0
        else x,
        batch,
    )

    def bench(fn, arg, tag):
        out = fn(arg, opt)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]  # real fetch: block_until_ready no-ops via axon
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(arg, opt)
            np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]  # real fetch: block_until_ready no-ops via axon
            best = min(best, time.perf_counter() - t0)
        per_iter_us = best / iters / B * 1e6
        print(f"{tag}: wall {best*1e3:8.1f} ms  {per_iter_us:6.2f} us/lane/iter")
        return out

    o1 = bench(lead, batch, "leading ")
    o2 = bench(trail, batch_t, "trailing")
    z1 = np.asarray(o1[0])
    z2 = np.moveaxis(np.asarray(o2[0]), -1, 0)
    print("max |dZ| between layouts:", float(np.max(np.abs(z1 - z2))))


if __name__ == "__main__":
    main()
