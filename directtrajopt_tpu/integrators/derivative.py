"""Derivative integrator: first-order smoothness chain constraint.

Residual (cf. /root/reference/src/integrators/derivative_integrator.jl:45):

    x_{k+1} − x_k − Δt_k · ẋ_k = 0

Used to chain control derivatives (u → du → ddu) so that acceleration-level
regularization produces smooth controls.
"""

from __future__ import annotations

import jax

from ..module import module, static_field
from ..trajectory import Layout

__all__ = ["DerivativeIntegrator"]


@module
class DerivativeIntegrator:
    """``x_{k+1} = x_k + Δt ẋ_k`` constraint linking a variable to its derivative.

    ``explicit=True``: residual is ``x_{k+1} − F(z_k)`` (see Riccati backend).
    """

    explicit = True

    x_name: str = static_field()
    xdot_name: str = static_field()

    @staticmethod
    def create(x_name: str, xdot_name: str, traj=None) -> "DerivativeIntegrator":
        return DerivativeIntegrator(x_name=x_name, xdot_name=xdot_name)

    def residual_dim(self, layout: Layout) -> int:
        return layout.dim_of(self.x_name)

    def residual(self, layout: Layout, w: jax.Array, k: jax.Array) -> jax.Array:
        dim = layout.dim
        zk, zk1 = w[:dim], w[dim:]
        x = layout.knot_extract(zk, self.x_name)
        x_next = layout.knot_extract(zk1, self.x_name)
        xdot = layout.knot_extract(zk, self.xdot_name)
        dt = layout.knot_timestep(zk, dtype=w.dtype)
        return x_next - x - dt * xdot

    def __repr__(self) -> str:
        return f"DerivativeIntegrator: {self.x_name} += Δt * {self.xdot_name}"
