"""Quadratic and linear (L1-slack) regularizers.

Semantics match `/root/reference/src/objectives/regularizers.jl`:

* ``QuadraticRegularizer``: ``J = Σ_{k∈times} ½ (Δt_k (v_k − b_k))ᵀ diag(R) (Δt_k (v_k − b_k))``
  (`regularizers.jl:79-90`) — note the Δt weighting, which creates v×Δt and
  Δt×Δt curvature when the timestep is free.
* ``LinearRegularizer``: ``J = Σ_{k∈times} Δt_k · Rᵀ v_k`` (`regularizers.jl:240-249`),
  the L1 penalty applied to slack variables.

Unlike the reference there is no hand-coded gradient/Hessian: both are plain
scalar knot costs; AD produces the same analytic derivatives.
Times-subsetting is expressed as a per-knot weight mask so shapes stay static.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..module import module, static_field
from ..trajectory import Layout, Trajectory
from .base import ObjectiveBase

__all__ = ["QuadraticRegularizer", "LinearRegularizer"]


def times_mask(N: int, times: Sequence[int] | None) -> np.ndarray:
    """(N,) 0/1 mask selecting the given knot indices (default: all)."""
    if times is None:
        return np.ones(N)
    mask = np.zeros(N)
    mask[np.asarray(times, dtype=int)] = 1.0
    return mask


@module
class QuadraticRegularizer(ObjectiveBase):
    """``Σ_k ½ ‖Δt_k (v_k − baseline_k)‖²_R`` on component ``name``."""

    R: jax.Array  # (dim,) diagonal weights
    baseline: jax.Array  # (N, dim)
    mask: jax.Array  # (N,) 0/1 times mask
    name: str = static_field()

    @staticmethod
    def create(
        name: str,
        traj: Trajectory,
        R,
        *,
        baseline=None,
        times: Sequence[int] | None = None,
    ) -> "QuadraticRegularizer":
        dim = traj.dims[name]
        N = traj.N
        R_vec = np.broadcast_to(np.asarray(R, dtype=float), (dim,))
        if baseline is None:
            baseline = np.zeros((N, dim))
        else:
            baseline = np.asarray(baseline, dtype=float)
            if baseline.shape != (N, dim):
                raise ValueError(
                    f"baseline shape {baseline.shape} != {(N, dim)}"
                )
        return QuadraticRegularizer(
            R=R_vec, baseline=baseline, mask=np.asarray(times_mask(N, times)), name=name
        )

    def cost_at_knot(self, layout: Layout, z, g, k):
        v = layout.knot_extract(z, self.name)
        # jnp.asarray: data leaves may arrive as numpy arrays (a user building
        # components directly, or a tree.map that materialized leaves), and
        # numpy cannot be indexed by the traced knot index k
        dv = v - jnp.asarray(self.baseline)[k]
        dt = layout.knot_timestep(z, dtype=z.dtype)
        r = dt * dv
        return jnp.asarray(self.mask)[k] * 0.5 * jnp.dot(r, self.R * r)

    def __repr__(self):
        return f"QuadraticRegularizer on {self.name}"


@module
class LinearRegularizer(ObjectiveBase):
    """``Σ_k Δt_k · Rᵀ v_k`` on component ``name`` (exact L1 via slacks)."""

    R: jax.Array  # (dim,)
    mask: jax.Array  # (N,)
    name: str = static_field()

    @staticmethod
    def create(
        name: str,
        traj: Trajectory,
        R,
        *,
        times: Sequence[int] | None = None,
    ) -> "LinearRegularizer":
        dim = traj.dims[name]
        R_vec = np.broadcast_to(np.asarray(R, dtype=float), (dim,))
        return LinearRegularizer(
            R=R_vec, mask=np.asarray(times_mask(traj.N, times)), name=name
        )

    def cost_at_knot(self, layout: Layout, z, g, k):
        v = layout.knot_extract(z, self.name)
        dt = layout.knot_timestep(z, dtype=z.dtype)
        return jnp.asarray(self.mask)[k] * dt * jnp.dot(self.R, v)

    def __repr__(self):
        return f"LinearRegularizer on {self.name}"
