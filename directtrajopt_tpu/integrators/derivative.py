"""Derivative integrator: first-order smoothness chain constraint.

Residual (cf. /root/reference/src/integrators/derivative_integrator.jl:45):

    x_{k+1} − x_k − Δt_k · ẋ_k = 0

Used to chain control derivatives (u → du → ddu) so that acceleration-level
regularization produces smooth controls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

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

    def read_cols(self, layout: Layout):
        """z_k columns the residual reads (x, ẋ, Δt) — restricts window AD."""
        cs_x = layout.comp_slice(self.x_name)
        cs_d = layout.comp_slice(self.xdot_name)
        cols = list(range(cs_x.start, cs_x.stop)) + list(range(cs_d.start, cs_d.stop))
        if layout.has_free_time:
            cols.append(layout.offsets[layout.timestep])
        return cols

    def hessian_zk(self, layout: Layout, zk, zk1, k, m):
        """Analytic Hessian of ``mᵀ(x_{k+1} − x_k − Δt·ẋ_k)`` w.r.t. ``z_k``:
        the only curvature is the Δt×ẋ cross term (−mᵢ at (Δt, ẋᵢ)); zero for
        fixed timesteps. Replaces the generic AD pass entirely."""
        import numpy as np

        d = layout.dim
        if not layout.has_free_time:
            return jnp.zeros((d, d), dtype=zk.dtype)
        cs_d = layout.comp_slice(self.xdot_name)
        dt_col = layout.offsets[layout.timestep]
        e_dt = np.zeros((d,))
        e_dt[dt_col] = 1.0
        Ed = np.zeros((cs_d.stop - cs_d.start, d))
        Ed[np.arange(cs_d.stop - cs_d.start), np.arange(cs_d.start, cs_d.stop)] = 1.0
        e_dt = jnp.asarray(e_dt, dtype=zk.dtype)
        v = -m @ jnp.asarray(Ed, dtype=zk.dtype)  # (d,) with −m at ẋ cols
        return jnp.outer(e_dt, v) + jnp.outer(v, e_dt)

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
