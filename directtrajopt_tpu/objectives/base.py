"""Objective interface and composition.

The reference's objective layer (`/root/reference/src/objectives/_objectives.jl`)
requires each objective to provide `objective_value`, a dense `gradient!`,
a `hessian_structure` and `get_full_hessian`. Here an objective is a pytree
exposing just two pure scalar functions:

    cost_at_knot(layout, z, g, k) -> scalar    # per-knot contribution
    cost_global(layout, g) -> scalar           # global-block-only contribution

Total cost is ``Σ_k cost_at_knot + cost_global``. Gradients come from
``jax.grad``; the solver gets block-structured Hessians by vmapping
``jax.hessian`` of ``cost_at_knot`` over knots — since every reference
objective is knot-separable (+ optional global coupling), the objective
Hessian is exactly block-diagonal-per-knot plus a global arrowhead, which is
what the Riccati KKT factorization consumes. No hand-maintained sparsity.

Composition mirrors `src/objectives/_objectives.jl:106-197`: ``+`` and
scalar ``*`` build a flattened :class:`CompositeObjective`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..module import module, static_field
from ..trajectory import Layout, Trajectory

__all__ = [
    "ObjectiveBase",
    "CompositeObjective",
    "NullObjective",
    "objective_value",
    "objective_gradient",
]


class ObjectiveBase:
    """Mixin giving objectives ``+`` / ``*`` composition and evaluation."""

    # -- interface (override in subclasses) ----------------------------- #

    def cost_at_knot(self, layout: Layout, z: jax.Array, g: jax.Array, k) -> jax.Array:
        """Scalar cost contribution at knot ``k`` (z: (dim,), g: (global_dim,))."""
        return jnp.zeros((), dtype=z.dtype)

    def cost_global(self, layout: Layout, g: jax.Array) -> jax.Array:
        """Scalar cost depending on the global block only."""
        return jnp.zeros((), dtype=g.dtype if g.size else jnp.float32)

    @property
    def uses_global(self) -> bool:
        """Whether cost_at_knot actually couples to the global block."""
        return False

    # -- composition ---------------------------------------------------- #

    def __add__(self, other):
        return _compose((self, other), (1.0, 1.0))

    def __radd__(self, other):
        if other == 0:  # support sum()
            return self
        return _compose((other, self), (1.0, 1.0))

    def __mul__(self, w):
        return _compose((self,), (float(w),))

    __rmul__ = __mul__

    # -- evaluation ------------------------------------------------------ #

    def value(self, traj: Trajectory) -> jax.Array:
        return objective_value(self, traj)


def _flatten_terms(objs, weights):
    """Flatten nested CompositeObjectives into (objs, weights) leaves."""
    out_objs, out_w = [], []
    for obj, w in zip(objs, weights):
        if isinstance(obj, CompositeObjective):
            for sub, sw in zip(obj.objectives, obj.weights):
                out_objs.append(sub)
                out_w.append(w * sw)
        else:
            out_objs.append(obj)
            out_w.append(w)
    return tuple(out_objs), tuple(out_w)


def _compose(objs, weights):
    objs, weights = _flatten_terms(objs, weights)
    return CompositeObjective(objectives=objs, weights=weights)


@module
class CompositeObjective(ObjectiveBase):
    """Weighted sum ``Σ wᵢ Jᵢ`` with flattened nesting."""

    objectives: tuple
    weights: tuple[float, ...] = static_field()

    def cost_at_knot(self, layout, z, g, k):
        total = jnp.zeros((), dtype=z.dtype)
        for w, obj in zip(self.weights, self.objectives):
            total = total + w * obj.cost_at_knot(layout, z, g, k)
        return total

    def cost_global(self, layout, g):
        total = jnp.zeros((), dtype=g.dtype if g.size else jnp.float32)
        for w, obj in zip(self.weights, self.objectives):
            total = total + w * obj.cost_global(layout, g)
        return total

    @property
    def uses_global(self) -> bool:
        return any(obj.uses_global for obj in self.objectives)

    def __repr__(self):
        terms = ", ".join(
            f"{w:g} * {obj!r}" for w, obj in zip(self.weights, self.objectives)
        )
        return f"CompositeObjective({terms})"


@module
class NullObjective(ObjectiveBase):
    """Zero objective (`src/objectives/_objectives.jl:209-230`)."""

    def __repr__(self):
        return "NullObjective"


def objective_value(obj: ObjectiveBase, traj: Trajectory) -> jax.Array:
    """Total objective value on a trajectory."""
    layout = traj.layout
    zmat = traj.knot_matrix()
    g = _global_vec(traj)
    ks = jnp.arange(layout.N)
    knot_total = jnp.sum(
        jax.vmap(lambda z, k: obj.cost_at_knot(layout, z, g, k))(zmat, ks)
    )
    return knot_total + obj.cost_global(layout, g)


def objective_gradient(obj: ObjectiveBase, traj: Trajectory) -> jax.Array:
    """Dense gradient w.r.t. the flat decision vector (tests / dense path)."""

    def f(zvec):
        return objective_value(obj, traj.from_zvec(zvec))

    return jax.grad(f)(traj.to_zvec())


def _global_vec(traj: Trajectory) -> jnp.ndarray:
    if traj.global_names:
        return jnp.concatenate(
            [traj.global_data[name] for name in traj.global_names], axis=-1
        )
    return jnp.zeros((0,), dtype=traj.knot_matrix().dtype)
