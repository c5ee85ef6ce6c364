"""Declarable per-knot Hessian-vector-product capability carriers.

API parity with the reference's ``KnotHVP`` module
(`/root/reference/src/objectives/knot_hvp.jl:45-152`): objectives may
*advertise* a matrix-free per-knot Hessian apply for downstream consumers —
``ConstantLowRankHVP(A, core)`` declares ``H = Aᵀ·core·A``, ``CustomKnotHVP``
wraps a user apply. In the reference these are inert data (no apply math in
DTO); here they also evaluate, and the generic fallback is the exact
forward-over-reverse HVP that JAX provides for free
(:func:`directtrajopt_tpu.objectives.knot_point.knot_hvp`).
"""

from __future__ import annotations

from typing import Callable

import jax

from ..module import module, static_field

__all__ = ["ConstantLowRankHVP", "CustomKnotHVP"]


@module
class ConstantLowRankHVP:
    """``H = Aᵀ G A`` with a constant factor A and small core G
    (`knot_hvp.jl` ConstantLowRankHVP)."""

    A: jax.Array  # (r, dim)
    core: jax.Array  # (r, r)

    def apply(self, v: jax.Array) -> jax.Array:
        return self.A.T @ (self.core @ (self.A @ v))

    def materialize(self) -> jax.Array:
        return self.A.T @ self.core @ self.A


@module
class CustomKnotHVP:
    """User-supplied matrix-free apply (`knot_hvp.jl` CustomKnotHVP).

    ``on_device`` mirrors the reference's CuArray-safety advertisement — here
    it means the apply is jit-traceable (pure JAX ops).
    """

    apply_fn: Callable = static_field()
    on_device: bool = static_field(default=True)

    def apply(self, v: jax.Array) -> jax.Array:
        return self.apply_fn(v)


def knot_hvp_of(objective):
    """Trait accessor (`knot_hvp.jl` ``knot_hvp`` generic): the carrier an
    objective declares, or None."""
    return getattr(objective, "hvp_carrier", None)
