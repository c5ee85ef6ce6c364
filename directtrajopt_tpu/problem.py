"""Problem container: trajectory + objective + integrators + constraints.

Mirrors `/root/reference/src/problems.jl`:

* the constructor auto-extracts trajectory constraints (initial/final pins,
  bounds over the appropriate interior knot ranges, time-consistency when both
  ``t`` and a free Δt exist) — `problems.jl:155-203`;
* a free timestep with no bounds gets a default Δt ≥ 0 lower bound (with a
  warning) — `problems.jl:63-116`.

The whole problem is a pytree: a vmapped batch of problems shares structure
but may differ in any numeric leaf (initial states, goals, dynamics
parameters, weights).
"""

from __future__ import annotations

import warnings
from typing import Sequence


from .constraints import (
    BoundsConstraint,
    EqualityConstraint,
    TimeConsistencyConstraint,
)
from .module import module
from .objectives.base import ObjectiveBase
from .trajectory import Trajectory

__all__ = ["DirectTrajOptProblem", "get_trajectory_constraints"]


def get_trajectory_constraints(traj: Trajectory) -> list:
    """Extract pins/bounds constraints from trajectory metadata
    (`src/problems.jl:155-203`).

    Bounds apply to the knot range not covered by initial/final pins:
    both → 1..N-2, initial only → 1..N-1, final only → 0..N-2, neither → all.
    """
    cons = []
    N = traj.N

    for name, val in traj.initial.items():
        cons.append(
            EqualityConstraint.create(
                name, [0], val, label=f"initial value of {name}"
            )
        )
    for name, val in traj.final.items():
        cons.append(
            EqualityConstraint.create(
                name, [N - 1], val, label=f"final value of {name}"
            )
        )
    for name, (lb, ub) in traj.bounds.items():
        if name in traj.global_names:
            from .constraints import GlobalBoundsConstraint

            cons.append(
                GlobalBoundsConstraint(
                    lb=lb, ub=ub, name=name, label=f"bounds on global {name}"
                )
            )
            continue
        if name in traj.initial and name in traj.final:
            ts = range(1, N - 1)
        elif name in traj.initial:
            ts = range(1, N)
        elif name in traj.final:
            ts = range(0, N - 1)
        else:
            ts = range(0, N)
        cons.append(
            BoundsConstraint(
                lb=lb,
                ub=ub,
                name=name,
                times=tuple(ts),
                subcomponents=None,
                label=f"bounds on {name}",
            )
        )

    # time consistency + t_0 = 0 when both :t and a free Δt are present
    if isinstance(traj.timestep, str) and "t" in traj.names:
        cons.append(TimeConsistencyConstraint(timestep_name=traj.timestep))
        if "t" not in traj.initial:
            cons.append(
                EqualityConstraint.create("t", [0], [0.0], label="initial time t_0 = 0")
            )
    return cons


@module
class DirectTrajOptProblem:
    """A direct trajectory optimization problem (`src/problems.jl:50-131`)."""

    trajectory: Trajectory
    objective: ObjectiveBase
    integrators: tuple
    constraints: tuple

    @staticmethod
    def create(
        traj: Trajectory,
        objective: ObjectiveBase,
        integrators,
        *,
        constraints: Sequence = (),
    ) -> "DirectTrajOptProblem":
        if not isinstance(integrators, (list, tuple)):
            integrators = (integrators,)

        # default Δt >= 0 bound for unbounded free timesteps (problems.jl:63-116)
        ts = traj.timestep
        if isinstance(ts, str) and ts not in traj.bounds:
            warnings.warn(
                f"Trajectory has timestep variable {ts!r} but no bounds on it. "
                "Adding default lower bound of 0 to prevent negative timesteps.",
                stacklevel=2,
            )
            new_bounds = dict(traj.bounds)
            dim = traj.dims[ts]
            import numpy as np

            new_bounds[ts] = (np.zeros(dim), np.full((dim,), np.inf))
            traj = traj.replace(bounds=new_bounds)

        all_constraints = tuple(constraints) + tuple(get_trajectory_constraints(traj))
        return DirectTrajOptProblem(
            trajectory=traj,
            objective=objective,
            integrators=tuple(integrators),
            constraints=all_constraints,
        )

    @property
    def N(self) -> int:
        return self.trajectory.N

    def __repr__(self) -> str:
        lines = ["DirectTrajOptProblem"]
        traj = self.trajectory
        lines.append("  Trajectory")
        lines.append(f"    Timesteps: {traj.N}")
        lines.append(f"    Knot dim:  {traj.dim}")
        vars_ = ", ".join(f"{n} ({traj.dims[n]})" for n in traj.names)
        lines.append(f"    Variables: {vars_}")
        ctrl = ", ".join(traj.controls) or "(none)"
        lines.append(f"    Controls:  {ctrl}")
        if traj.global_names:
            gvars = ", ".join(f"{n} ({traj.dims[n]})" for n in traj.global_names)
            lines.append(f"    Globals:   {gvars}")
        lines.append(f"  Objective: {self.objective!r}")
        lines.append(f"  Dynamics ({len(self.integrators)} integrators)")
        for integ in self.integrators:
            lines.append(f"    {integ!r}")
        lines.append(f"  Constraints ({len(self.constraints)} total)")
        for i, con in enumerate(self.constraints):
            if i >= 10:
                lines.append(f"    ... and {len(self.constraints) - 10} more")
                break
            label = getattr(con, "label", None) or repr(con)
            lines.append(f"    {label}")
        return "\n".join(lines)
