"""Multi-device scenario-batch sharding.

The reference's entire parallelism story is shared-memory threads inside one
process (`/root/reference/src/solvers/evaluator.jl:332-359`). The TPU-native
scaling axis is the scenario batch: a stacked problem pytree shards over a
``jax.sharding.Mesh`` with the batch axis laid out over devices, and the
whole vmapped IPM runs SPMD — XLA inserts the (minimal) collectives; each
scenario's solve is independent so communication rides only on data layout.
Works identically on one host (ICI) and multi-host slices (ICI + DCN),
including the CPU-emulated meshes used in tests and the driver's
``dryrun_multichip``.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..problem import DirectTrajOptProblem
from ..solvers.options import IPMOptions
from ..solvers.solve import SolveResult, _merge_options, _solve_impl

__all__ = ["make_mesh", "shard_batch", "solve_batch_sharded"]


def make_mesh(devices=None, axis_name: str = "batch") -> Mesh:
    """1-D device mesh over the scenario-batch axis."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = "batch") -> Any:
    """Place a stacked problem pytree with its leading axis sharded over the
    mesh. Batch size must be divisible by the mesh size."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def solve_batch_sharded(
    batch: DirectTrajOptProblem,
    options: IPMOptions | None = None,
    *,
    mesh: Mesh | None = None,
    axis_name: str = "batch",
    backend: str = "auto",
    **kwargs: Any,
) -> SolveResult:
    """Solve a sharded scenario batch SPMD over the mesh.

    The batch is placed with its leading axis over the mesh devices and the
    vmapped solve is jitted with matching output shardings — each device runs
    its shard's IPM iterations locally; no cross-device collectives are on
    the hot path.
    """
    from ..solvers.solve import _batched_solver

    options = _merge_options(options, kwargs)
    mesh = mesh or make_mesh(axis_name=axis_name)
    batch = shard_batch(batch, mesh, axis_name)
    return _batched_solver(backend)(batch, options)
