"""In-process ablation of the per-iteration cost suspects (one TPU session).

Variants toggled by env vars read at trace time; the cached batched solver is
cleared between variants so each retraces.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from directtrajopt_tpu.utils.hostcache import host_cache_dir

    jax.config.update(
        "jax_compilation_cache_dir",
        host_cache_dir(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from directtrajopt_tpu.benchmarks import make_batched_bilinear_problems
    from directtrajopt_tpu.solvers.solve import solve_batch
    import directtrajopt_tpu.solvers.solve as solve_mod

    dev = jax.devices()[0]
    B = 256 if dev.platform == "tpu" else 8
    print(f"device: {dev} B={B}", file=sys.stderr, flush=True)
    batch = make_batched_bilinear_problems(B, N=51, feasible_start=True)
    base = dict(tol=1e-5, acceptable_tol=5e-4, acceptable_iter=1, mu_init=3e-2)
    I0, I1 = 12, 28

    def marginal(tag, env):
        for k, v in env.items():
            os.environ[k] = v
        solve_mod._batched_solver.cache_clear()
        times = {}
        conv36 = int(
            np.asarray(
                solve_batch(batch, max_iter=36, **base).converged
            ).sum()
        )
        for mi in (I0, I1):
            fn = lambda: solve_batch(batch, max_iter=mi, **base)
            np.asarray(fn().kkt_error)  # real fetch: block_until_ready no-ops via axon
            best = np.inf
            for _ in range(4):
                t0 = time.perf_counter()
                np.asarray(fn().kkt_error)  # real fetch: block_until_ready no-ops via axon
                best = min(best, time.perf_counter() - t0)
            times[mi] = best
        for k in env:
            del os.environ[k]
        ms = (times[I1] - times[I0]) / (I1 - I0) * 1e3
        print(f"{tag:>16s}: {ms:7.3f} ms/iter  conv@36 {conv36}/{B}", flush=True)

    marginal("default(generic)", {})
    marginal("zk-readcols", {"DTX_ZK_READCOLS": "1"})
    marginal("zk-custom", {"DTX_ZK_CUSTOM_HESS": "1"})
    marginal("zk-both", {"DTX_ZK_READCOLS": "1", "DTX_ZK_CUSTOM_HESS": "1"})


if __name__ == "__main__":
    main()
