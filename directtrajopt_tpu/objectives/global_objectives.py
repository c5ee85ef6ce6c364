"""Objectives on global (time-invariant) variables.

* ``GlobalObjective``: ``J = Q · ℓ(g_vars)`` on named global components
  (`/root/reference/src/objectives/global_objectives.jl:35-125`).
* ``GlobalKnotPointObjective``: ``J = Σ_{k∈times} Q_k ℓ([vars_k; g_vars], p_k)``
  coupling knot variables with the global block
  (`src/objectives/global_objectives.jl:151-341`). Its Hessian contributes the
  knot-block, global-block, and knot×global cross terms of the KKT arrowhead —
  all obtained by AD of the single scalar ``cost_at_knot``.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..module import module, static_field
from ..trajectory import Layout, Trajectory
from .base import ObjectiveBase
from .regularizers import times_mask

__all__ = ["GlobalObjective", "GlobalKnotPointObjective", "GlobalTerminalObjective"]


def _extract_globals(layout: Layout, g, names: tuple[str, ...]):
    return jnp.concatenate([g[..., layout.global_slice(n)] for n in names], axis=-1)


@module
class GlobalObjective(ObjectiveBase):
    """``Q · ℓ(globals)`` on named global components."""

    Q: jax.Array
    ell: Callable = static_field()
    global_names: tuple[str, ...] = static_field()

    @staticmethod
    def create(
        ell: Callable,
        names: str | Sequence[str],
        traj: Trajectory,
        *,
        Q: float = 1.0,
    ) -> "GlobalObjective":
        if isinstance(names, str):
            names = (names,)
        for n in names:
            if n not in traj.global_names:
                raise ValueError(f"{n!r} is not a global component")
        return GlobalObjective(Q=np.float64(Q), ell=ell, global_names=tuple(names))

    def cost_global(self, layout: Layout, g):
        return self.Q * self.ell(_extract_globals(layout, g, self.global_names))

    def __repr__(self):
        return f"GlobalObjective on {list(self.global_names)}"


@module
class GlobalKnotPointObjective(ObjectiveBase):
    """``Σ_k Q_k ℓ([vars_k; globals], p_k)`` — knot × global coupling."""

    Qs: jax.Array  # (N,)
    params: jax.Array | None  # (N, ...) or None
    ell: Callable = static_field()
    var_names: tuple[str, ...] = static_field()
    global_names: tuple[str, ...] = static_field()
    takes_params: bool = static_field(default=False)

    @staticmethod
    def create(
        ell: Callable,
        names: str | Sequence[str],
        global_names: str | Sequence[str],
        traj: Trajectory,
        params: Sequence | None = None,
        *,
        times: Sequence[int] | None = None,
        Qs: Sequence[float] | None = None,
    ) -> "GlobalKnotPointObjective":
        if isinstance(names, str):
            names = (names,)
        if isinstance(global_names, str):
            global_names = (global_names,)
        N = traj.N
        t_idx = np.arange(N) if times is None else np.asarray(times, dtype=int)
        mask = times_mask(N, t_idx)
        q_full = np.zeros(N)
        q_full[t_idx] = np.ones(len(t_idx)) if Qs is None else np.asarray(Qs, dtype=float)

        params_full = None
        takes_params = params is not None
        if takes_params:
            p_arr = np.stack([np.asarray(p, dtype=float) for p in params])
            full_shape = (N,) + p_arr.shape[1:]
            params_full = np.zeros(full_shape)
            params_full[np.asarray(t_idx)] = p_arr

        return GlobalKnotPointObjective(
            Qs=np.asarray(q_full * mask),
            params=params_full,
            ell=ell,
            var_names=tuple(names),
            global_names=tuple(global_names),
            takes_params=takes_params,
        )

    @property
    def uses_global(self) -> bool:
        return True

    def cost_at_knot(self, layout: Layout, z, g, k):
        knot_vals = jnp.concatenate(
            [layout.knot_extract(z, n) for n in self.var_names], axis=-1
        )
        gvals = _extract_globals(layout, g, self.global_names)
        vals = jnp.concatenate([knot_vals, gvals], axis=-1)
        # jnp.asarray: numpy data leaves cannot be indexed by the traced k
        if self.takes_params:
            cost = self.ell(vals, jnp.asarray(self.params)[k])
        else:
            cost = self.ell(vals)
        return jnp.asarray(self.Qs)[k] * cost

    def __repr__(self):
        return (
            f"GlobalKnotPointObjective on {list(self.var_names)} + "
            f"{list(self.global_names)}"
        )


def GlobalTerminalObjective(
    ell: Callable,
    names: str | Sequence[str],
    global_names: str | Sequence[str],
    traj: Trajectory,
    *,
    Q: float = 1.0,
    params: Sequence | None = None,
) -> GlobalKnotPointObjective:
    """Knot+global objective at the final knot
    (3-arg TerminalObjective overload, `src/objectives/global_objectives.jl:374-390`)."""
    return GlobalKnotPointObjective.create(
        ell, names, global_names, traj, params, times=[traj.N - 1], Qs=[Q]
    )
