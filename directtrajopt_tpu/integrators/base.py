"""Integrator interface: dynamics as batched two-knot window residuals.

The reference represents dynamics as per-step residuals
``δ_k = f(x_{k+1}, x_k, u_k, Δt_k)`` with hand-assembled sparse Jacobian and
Hessian structure (`/root/reference/src/integrators/_integrators.jl:34-77`).
Here an integrator is a pytree exposing one pure function

    residual(layout, w, k) -> (x_dim,)

on the stacked window ``w = [z_k; z_{k+1}]`` (shape ``(2*dim,)``), evaluated
for all k at once by ``vmap`` and differentiated by ``jacfwd`` / ``hessian``
over the window — the per-window derivative *is* the sparse block, so the
reference's sparsity-structure machinery disappears: the KKT system is
assembled block-wise from these ``(x_dim, 2dim)`` / ``(2dim, 2dim)`` blocks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..trajectory import Layout, Trajectory

__all__ = [
    "windows",
    "stack_residuals",
    "stack_jacobians",
    "stack_hessians",
    "integrator_dim",
]


def windows(zmat: jax.Array) -> jax.Array:
    """Stack adjacent knots: ``(N, dim) -> (N-1, 2*dim)`` with rows [z_k; z_{k+1}]."""
    return jnp.concatenate([zmat[..., :-1, :], zmat[..., 1:, :]], axis=-1)


def integrator_dim(integrator, layout: Layout) -> int:
    """Total residual dimension ``x_dim * (N-1)``."""
    return integrator.residual_dim(layout) * (layout.N - 1)


def stack_residuals(integrator, layout: Layout, zmat: jax.Array) -> jax.Array:
    """Evaluate all window residuals: ``(N-1, x_dim)``."""
    W = windows(zmat)
    ks = jnp.arange(layout.N - 1)
    return jax.vmap(lambda w, k: integrator.residual(layout, w, k))(W, ks)


def stack_jacobians(integrator, layout: Layout, zmat: jax.Array) -> jax.Array:
    """Per-window residual Jacobians: ``(N-1, x_dim, 2*dim)``."""
    W = windows(zmat)
    ks = jnp.arange(layout.N - 1)
    jac = jax.jacfwd(lambda w, k: integrator.residual(layout, w, k))
    return jax.vmap(jac)(W, ks)


def stack_hessians(
    integrator, layout: Layout, zmat: jax.Array, mu: jax.Array
) -> jax.Array:
    """Per-window Hessians of ``μ_k ⋅ residual_k``: ``(N-1, 2*dim, 2*dim)``.

    ``mu`` has shape ``(N-1, x_dim)`` (dynamics multipliers per step).
    """
    W = windows(zmat)
    ks = jnp.arange(layout.N - 1)

    def lagr(w, k, m):
        return jnp.dot(m, integrator.residual(layout, w, k))

    hess = jax.hessian(lagr)
    return jax.vmap(lambda w, k, m: hess(w, k, m))(W, ks, mu)


def stack_jacobians_zk(integrator, layout: Layout, zmat: jax.Array) -> jax.Array:
    """Per-window residual Jacobians w.r.t. ``z_k`` only: ``(N-1, r, dim)``.

    For explicit integrators (residual ``x_{k+1} − F(z_k)``) this is the whole
    nontrivial Jacobian — the ``z_{k+1}`` part is the identity selection of
    the target components. Used by the Riccati KKT backend.
    """
    dim = layout.dim
    ks = jnp.arange(layout.N - 1)

    def res_zk(zk, zk1, k):
        return integrator.residual(layout, jnp.concatenate([zk, zk1]), k)

    jac = jax.jacfwd(res_zk, argnums=0)
    return jax.vmap(jac)(zmat[..., :-1, :], zmat[..., 1:, :], ks)


def stack_hessians_zk(
    integrator, layout: Layout, zmat: jax.Array, mu: jax.Array
) -> jax.Array:
    """Per-window Hessians of ``μ_k ⋅ residual_k`` w.r.t. ``z_k`` only:
    ``(N-1, dim, dim)`` — exact for explicit integrators (the residual is
    linear in ``z_{k+1}``, so all other Hessian quadrants vanish)."""
    dim = layout.dim
    ks = jnp.arange(layout.N - 1)

    def lagr(zk, zk1, k, m):
        return jnp.dot(m, integrator.residual(layout, jnp.concatenate([zk, zk1]), k))

    hess = jax.hessian(lagr, argnums=0)
    return jax.vmap(hess)(zmat[..., :-1, :], zmat[..., 1:, :], ks, mu)


def evaluate(integrator, traj: Trajectory) -> jax.Array:
    """Flat residual vector (x_dim*(N-1),) — analog of the reference's
    ``evaluate!`` (`src/integrators/bilinear_integrator.jl:98-107`)."""
    layout = traj.layout
    return stack_residuals(integrator, layout, traj.knot_matrix()).reshape(-1)
