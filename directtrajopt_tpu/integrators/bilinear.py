"""Bilinear integrator: exact discretization of control-linear dynamics.

Dynamics residual (cf. /root/reference/src/integrators/bilinear_integrator.jl:48,81):

    x_{k+1} − exp(Δt_k · G(u_k)) · x_k = 0

The system matrix can be given either as arrays ``G(u) = G_drift + Σᵢ uᵢ G_drives[i]``
(stored as pytree leaves, so a vmapped batch of problems may carry *different*
dynamics parameters per scenario) or as an arbitrary Python callable
``G(u) -> (x_dim, x_dim)`` (static, closed over constants).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from ..module import module, static_field
from ..ops.expm import expm_pade, expv_taylor
from ..trajectory import Layout, Trajectory

__all__ = ["BilinearIntegrator"]


@module
class BilinearIntegrator:
    """``x_{k+1} = exp(Δt G(u_k)) x_k`` dynamics constraint.

    ``explicit=True``: the residual has the form ``x_{k+1} − F(z_k)`` (linear
    identity coupling to the next knot), which the Riccati KKT backend
    exploits for exact stage-wise elimination.
    """

    explicit = True

    G_drift: jax.Array | None
    G_drives: jax.Array | None  # (u_dim, x_dim, x_dim)
    x_name: str = static_field()
    u_name: str = static_field()
    G_fn: Callable | None = static_field(default=None)
    squarings: int = static_field(default=4)
    # "pade" (general) or "taylor" (matvec action; fastest when ‖Δt·G‖ ≲ 1)
    method: str = static_field(default="pade")
    taylor_order: int = static_field(default=12)

    @staticmethod
    def create(
        G,
        x_name: str,
        u_name: str,
        traj: Trajectory | Layout | None = None,
        *,
        squarings: int = 4,
        method: str = "pade",
        taylor_order: int = 12,
    ) -> "BilinearIntegrator":
        """Build from a callable ``G(u)`` or a ``(G_drift, G_drives)`` pair."""
        if callable(G):
            return BilinearIntegrator(
                G_drift=None,
                G_drives=None,
                x_name=x_name,
                u_name=u_name,
                G_fn=G,
                squarings=squarings,
                method=method,
                taylor_order=taylor_order,
            )
        G_drift, G_drives = G
        drives = jnp.stack([jnp.asarray(Gi, dtype=float) for Gi in G_drives])
        return BilinearIntegrator(
            G_drift=jnp.asarray(G_drift, dtype=float),
            G_drives=drives,
            x_name=x_name,
            u_name=u_name,
            G_fn=None,
            squarings=squarings,
            method=method,
            taylor_order=taylor_order,
        )

    def system_matrix(self, u: jax.Array) -> jax.Array:
        if self.G_fn is not None:
            return jnp.asarray(self.G_fn(u))
        return self.G_drift + jnp.tensordot(u, self.G_drives, axes=1)

    def residual_dim(self, layout: Layout) -> int:
        return layout.dim_of(self.x_name)

    def residual(self, layout: Layout, w: jax.Array, k: jax.Array) -> jax.Array:
        dim = layout.dim
        zk, zk1 = w[:dim], w[dim:]
        x = layout.knot_extract(zk, self.x_name)
        x_next = layout.knot_extract(zk1, self.x_name)
        u = layout.knot_extract(zk, self.u_name)
        dt = layout.knot_timestep(zk, dtype=w.dtype)
        G = self.system_matrix(u)
        if self.method == "taylor":
            return x_next - expv_taylor(dt * G, x, order=self.taylor_order)
        return x_next - expm_pade(dt * G, squarings=self.squarings) @ x

    def __repr__(self) -> str:
        return (
            f"BilinearIntegrator: {self.x_name} = "
            f"exp(Δt G({self.u_name})) {self.x_name}"
        )
