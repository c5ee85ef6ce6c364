"""Device-memory profile of the batched solver — the TPU-native analog of
the reference's allocation profiler (`/root/reference/benchmark/
alloc_profile.jl:3-89`).

The reference counts Julia heap allocations per solver stage; under XLA the
equivalent question is "how much HBM does the compiled program reserve?" —
answered exactly by the compiler via ``compiled.memory_analysis()`` (per
program: argument/output/temp/generated-code bytes; temp = all intermediate
buffers after fusion, the number that limits batch size).

Prints one JSON line per (batch, N) grid cell plus live device stats.

    python tools/memory_profile.py           # default grid
    DTX_GRID="64:51,256:51,256:101" python tools/memory_profile.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    from directtrajopt_tpu.benchmarks import make_batched_bilinear_problems
    from directtrajopt_tpu.solvers.solve import _batched_solver, get_default_options

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)
    print(f"device: {dev}", file=sys.stderr)

    grid = os.environ.get("DTX_GRID", "64:51,256:51" if on_tpu else "8:21")
    cells = [tuple(int(v) for v in c.split(":")) for c in grid.split(",")]

    solver = _batched_solver("auto")
    opts = get_default_options().replace(max_iter=50)

    for B, N in cells:
        batch = make_batched_bilinear_problems(B, N=N, feasible_start=True)
        compiled = solver.lower(batch, opts, None).compile()
        ma = compiled.memory_analysis()
        out = {"batch": B, "N": N}
        for k in (
            "argument_size_in_bytes",
            "output_size_in_bytes",
            "temp_size_in_bytes",
            "generated_code_size_in_bytes",
        ):
            v = getattr(ma, k, None)
            if v is not None:
                out[k.replace("_in_bytes", "_mb")] = round(v / 2**20, 2)
        print(json.dumps(out))

    stats = dev.memory_stats() if hasattr(dev, "memory_stats") else None
    if stats:
        live = {
            k: round(v / 2**20, 1)
            for k, v in stats.items()
            if "bytes" in k and isinstance(v, (int, float))
        }
        print(json.dumps({"live_device_mb": live}))


if __name__ == "__main__":
    main()
