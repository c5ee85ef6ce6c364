"""Minimum-time objective: ``J = D Σ_{k<N} Δt_k``.

Matches `/root/reference/src/objectives/minimum_time_objective.jl:44-50`
(sum over the first N−1 timesteps; requires a free timestep variable).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..module import module
from ..trajectory import Layout, Trajectory
from .base import ObjectiveBase

__all__ = ["MinimumTimeObjective"]


@module
class MinimumTimeObjective(ObjectiveBase):
    D: jnp.ndarray  # scalar weight

    @staticmethod
    def create(traj: Trajectory, D: float = 1.0) -> "MinimumTimeObjective":
        if not isinstance(traj.timestep, str):
            raise ValueError("MinimumTimeObjective requires a free timestep variable")
        return MinimumTimeObjective(D=np.float64(D))

    def cost_at_knot(self, layout: Layout, z, g, k):
        dt = layout.knot_timestep(z, dtype=z.dtype)
        # exclude the final knot's Δt (k ranges over 0..N-1; sum runs to N-2)
        return jnp.where(k < layout.N - 1, self.D * dt, jnp.zeros((), dtype=z.dtype))

    def __repr__(self):
        return "MinimumTimeObjective"
