"""Forward dynamics rollouts.

Simulating the discrete dynamics forward under given controls — used to build
feasible-by-construction problems (set the goal to a rolled-out state), for
fidelity monitoring during solves (the reference's ``rollout_fidelity``
callbacks, `/root/reference/src/solvers/ipopt_solver/callbacks.jl:122-361`),
and for MPC warm starts. Implemented as ``lax.scan`` over knots; batches over
scenarios with ``vmap``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .trajectory import Trajectory

__all__ = ["rollout", "bilinear_rollout", "rollout_fidelity"]


def bilinear_rollout(integrator, x0: jax.Array, u: jax.Array, dts: jax.Array) -> jax.Array:
    """Roll out ``x_{k+1} = exp(Δt_k G(u_k)) x_k``.

    Args:
      integrator: a BilinearIntegrator (provides ``system_matrix``/``squarings``).
      x0: initial state ``(x_dim,)``.
      u: controls ``(N, u_dim)`` (the last row is unused).
      dts: timesteps ``(N,)`` or scalar.

    Returns states ``(N, x_dim)``.
    """
    from .ops.expm import expm_pade

    N = u.shape[0]
    dts = jnp.broadcast_to(jnp.asarray(dts, dtype=x0.dtype), (N,))

    def step(x, uk_dt):
        uk, dtk = uk_dt
        G = integrator.system_matrix(uk)
        x_next = expm_pade(dtk * G, squarings=integrator.squarings) @ x
        return x_next, x_next

    _, xs = jax.lax.scan(step, x0, (u[:-1], dts[:-1]))
    return jnp.concatenate([x0[None, :], xs], axis=0)


def rollout(problem_or_integrator, traj: Trajectory, x_name: str | None = None) -> jax.Array:
    """Roll out an integrator's dynamics along a trajectory's controls.

    Works for any integrator exposing ``residual`` by solving each step's
    implicit relation explicitly when it has the form
    ``x_{k+1} = F(z_k)`` — which holds for all shipped integrators.
    """
    integ = problem_or_integrator
    layout = traj.layout
    zmat = traj.knot_matrix()
    x_name = x_name or integ.x_name
    cs = layout.comp_slice(x_name)

    def step(x, zk):
        zk = zk.at[cs].set(x)
        # residual(w) = x_{k+1} - F(z_k): solve for x_{k+1} by evaluating at 0
        w = jnp.concatenate([zk, jnp.zeros_like(zk)])
        r = integ.residual(layout, w, 0)
        x_next = -r  # x_{k+1}=0 ⇒ residual = -F(z_k)
        return x_next, x_next

    x0 = zmat[0, cs]
    _, xs = jax.lax.scan(step, x0, zmat[:-1])
    return jnp.concatenate([x0[None, :], xs], axis=0)


def rollout_fidelity(
    integrator, traj: Trajectory, goal: jax.Array, x_name: str | None = None
) -> jax.Array:
    """Normalized overlap |⟨goal, x_N⟩|²/(‖goal‖²‖x_N‖²) of the rolled-out
    final state — the quantum-control fidelity monitored by the reference's
    rollout callbacks."""
    xs = rollout(integrator, traj, x_name)
    xN = xs[-1]
    goal = jnp.asarray(goal, dtype=xN.dtype)
    num = jnp.abs(jnp.dot(goal, xN)) ** 2
    den = jnp.maximum(jnp.dot(goal, goal) * jnp.dot(xN, xN), 1e-30)
    return num / den
