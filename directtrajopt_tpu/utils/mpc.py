"""MPC receding-horizon utilities.

The reference's MPC story is implicit: re-calling ``solve!`` warm-starts from
the trajectory written back by the previous solve
(`/root/reference/src/solvers/ipopt_solver/solver.jl:160-175`). Here that
contract is explicit and batched: :func:`shift_trajectory` advances the
horizon (shifting knot data, holding the tail) and pins the new measured
initial state; re-solving the returned problem is one warm-started MPC step.
All operations are pytree transforms, so an entire scenario batch steps at
once under ``vmap``/``jit``.
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp

from ..problem import DirectTrajOptProblem
from ..trajectory import Trajectory

__all__ = ["shift_trajectory", "mpc_step"]


def shift_trajectory(
    traj: Trajectory,
    shift: int = 1,
    new_initial: Mapping[str, jax.Array] | None = None,
) -> Trajectory:
    """Advance the horizon: knot k takes the data of knot k+shift (the last
    knot is held for the tail), and ``initial`` is updated to the measured
    values. The result is the warm start for the next MPC solve."""
    data = {}
    for name, arr in traj.data.items():
        shifted = jnp.concatenate(
            [arr[..., shift:, :], jnp.repeat(arr[..., -1:, :], shift, axis=-2)],
            axis=-2,
        )
        data[name] = shifted
    initial = dict(traj.initial)
    if new_initial:
        for k, v in new_initial.items():
            initial[k] = jnp.asarray(v, dtype=float).reshape(-1)
            data[k] = data[k].at[..., 0, :].set(initial[k])
    return traj.replace(data=data, initial=initial)


def mpc_step(
    problem: DirectTrajOptProblem,
    new_initial: Mapping[str, jax.Array],
    shift: int = 1,
) -> DirectTrajOptProblem:
    """One receding-horizon update: shift the (solved) trajectory and pin the
    measured state; solve the returned problem to complete the MPC step."""
    new_traj = shift_trajectory(problem.trajectory, shift, new_initial)
    return problem.replace(trajectory=new_traj)
