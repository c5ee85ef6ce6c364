"""Pre-populate the persistent XLA compile cache for the standard shapes.

True cold start pays the tunnel-server XLA compile of the headline
pipeline's two ~45k-primitive programs (measured: 19.9 s GN seek + 40.1 s
exact-Hessian polish + ~5 s tracing — VERDICT r4 #4). This tool pays that
cost ONCE, ahead of time, into the repo's ``.jax_cache``; every subsequent
``python bench.py`` (and any user solve at the standard shapes) is then a
~15 s cache deserialization instead.

The programs are compiled AOT against abstract inputs (``jit.lower(...)
.compile()``) — no device solve runs, only compilation — and land in the
same persistent cache the runtime consults (cache keys depend only on the
HLO + compiler fingerprint, not on whether compilation was AOT).

Run:  python tools/warm_cache.py            (headline shapes, B=8192)
      python tools/warm_cache.py 2048       (another batch size)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import importlib.util

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(repo, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    import jax

    from directtrajopt_tpu.utils.hostcache import host_cache_dir

    jax.config.update(
        "jax_compilation_cache_dir",
        host_cache_dir(
            os.environ.get("DTX_CACHE_DIR", os.path.join(repo, ".jax_cache"))
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp

    from directtrajopt_tpu.benchmarks import make_batched_bilinear_problems
    from directtrajopt_tpu.solvers.solve import (
        _compact_runner,
        _merge_options,
        cast_problem,
    )

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    print(f"device: {dev}", file=sys.stderr)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else None
    cfg = bench.headline_config(on_tpu, batch=B)
    batch = cast_problem(
        make_batched_bilinear_problems(
            cfg["batch"], N=cfg["N"], feasible_start=True,
            taylor_order=cfg["taylor_order"],
        ),
        jnp.float32 if on_tpu else jnp.float64,
    )

    def abs_of(t):
        return jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
            if hasattr(x, "shape")
            else x,
            t,
        )

    p1 = dict(cfg["phase1_kw"])
    phases1, chunk1 = p1.pop("phases"), p1.pop("chunk")
    opts1 = _merge_options(None, p1)
    r1_fn = _compact_runner("auto", tuple(phases1), chunk1, False)

    t0 = time.time()
    res_shape = jax.eval_shape(r1_fn, batch, opts1, None)
    print(f"trace (eval_shape): {time.time() - t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    r1_fn.lower(abs_of(batch), opts1, None).compile()
    print(f"seek stage compiled: {time.time() - t0:.1f}s", file=sys.stderr)

    p2 = dict(cfg["polish_kw"])
    phases2, chunk2 = p2.pop("phases"), p2.pop("chunk")
    p2.pop("carry_duals", None)
    opts2 = _merge_options(None, p2)
    r2_fn = _compact_runner("auto", tuple(phases2), chunk2, True)
    t0 = time.time()
    r2_fn.lower(
        abs_of(res_shape.problem),
        opts2,
        abs_of(res_shape.ipm.state.best_kkt_warm),
    ).compile()
    print(f"polish stage compiled: {time.time() - t0:.1f}s", file=sys.stderr)
    print("cache warmed — bench.py / standard-shape solves now start warm")


if __name__ == "__main__":
    main()
