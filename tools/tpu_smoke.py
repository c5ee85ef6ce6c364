"""On-hardware smoke checklist for the TPU production paths.

The pytest suite pins itself to CPU (interpret-mode Pallas), so Mosaic
*compile*-level regressions are invisible to it. This script runs the short
list of things only a real chip can check:

1. plain ``solve_batch`` at B > 128 — exercises the lane-GRIDDED Pallas
   calls (grid > 1 ⇒ Mosaic double-buffers blocks; a scoped-vmem overflow
   here is exactly the regression this guards: compile used to fail with
   "Ran out of memory in memory space vmem" once Bp exceeded one 128-lane
   block, because 2x the block set passes XLA's 16 MiB default scoped
   limit — fixed by per-kernel ``vmem_limit_bytes``).
2. ``solve_batch_compact`` (the bench path) converges the batch.
3. on-chip solution agrees with the CPU/XLA-path solution lane-for-lane.

Run: ``python tools/tpu_smoke.py [B]`` (default 160 — the smallest width
that grids the lane axis). Exits non-zero on any failure.
"""

import sys

import numpy as np


def main():
    import jax

    from directtrajopt_tpu.benchmarks import make_batched_bilinear_problems
    from directtrajopt_tpu.solvers.solve import solve_batch, solve_batch_compact

    dev = jax.devices()[0]
    if dev.platform != "tpu":
        print(f"SKIP: first device is {dev.platform!r}, not tpu")
        return 0
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 160
    assert B > 128, "B must exceed one 128-lane block to grid the Pallas calls"
    kw = dict(max_iter=60, tol=1e-5, hessian_approximation="gauss_newton")
    batch = make_batched_bilinear_problems(B, N=51, feasible_start=True)

    # 1. gridded-lane compile + run
    res = solve_batch(batch, **kw)
    jax.block_until_ready(res.ipm.Z)
    conv = int(np.sum(np.asarray(res.ipm.status) <= 1))
    print(f"solve_batch        B={B}: converged {conv}/{B}")
    assert conv >= int(0.9 * B), "gridded solve_batch failed to converge"

    # 2. compact scheduler
    res_c = solve_batch_compact(batch, **kw)
    jax.block_until_ready(res_c.ipm.Z)
    conv_c = int(np.sum(np.asarray(res_c.ipm.status) <= 1))
    print(f"solve_batch_compact B={B}: converged {conv_c}/{B}")
    assert conv_c >= int(0.9 * B), "compact scheduler failed to converge"

    # 3. TPU vs CPU agreement on a handful of lanes
    cpu = jax.devices("cpu")[0]
    take = 4
    small = jax.tree_util.tree_map(lambda x: np.asarray(x[:take]), batch)
    with jax.default_device(cpu):
        res_cpu = solve_batch(small, **kw)
        jax.block_until_ready(res_cpu.ipm.Z)
    z_tpu = np.asarray(res.ipm.Z)[:take]
    z_cpu = np.asarray(res_cpu.ipm.Z)
    rms = float(np.sqrt(np.mean((z_tpu - z_cpu) ** 2)))
    print(f"TPU-vs-CPU RMS(Z) over {take} lanes: {rms:.2e}")
    assert rms < 1e-3, "on-chip solution diverged from the CPU path"
    print("OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
