"""Shared-trace cache for kernel entry points.

The Pallas kernel bodies (``ops/expv_kernel.py``, ``ops/riccati_kernel.py``)
are Python-unrolled 2-D multiply-add chains: tracing one costs ~0.5-1.3 s of
pure Python. The shared-phase IPM program hits each entry from 4-10 call
sites (residual eval, window AD, KKT factor, SOC/restoration resolves, one
per traced phase body), so the cold trace paid that cost repeatedly —
profiled at ~11 s of the 19 s bench trace (cProfile over
``_compact_runner.trace(...).lower()``).

``jit_cached(fn, *static)`` returns ``jax.jit(partial(fn, *static))`` from a
process-level cache: every same-(statics, shapes, dtypes) call site then
shares ONE traced jaxpr (pjit's own C++ cache does the per-shape keying),
and the outer trace embeds a cheap closed call instead of re-running the
kernel-body Python. XLA inlines the nested pjit, so the compiled program is
unchanged — only trace time drops.
"""

import functools

import jax

__all__ = ["jit_cached"]


@functools.lru_cache(maxsize=None)
def jit_cached(fn, *static_args, **static_kwargs):
    """A cached ``jax.jit(functools.partial(fn, *static_args, **kw))``.

    ``fn`` must be a module-level function and the statics hashable — the
    (fn, statics) pair is the cache key; array-shape keying is pjit's job.
    """
    return jax.jit(functools.partial(fn, *static_args, **static_kwargs))
