"""Nonlinear constraints: knot-point, global, and global-knot-point.

Reference semantics (`/root/reference/src/constraints/nonlinear/`):

* ``NonlinearKnotPointConstraint`` — user ``g`` over named variables at each
  ``t ∈ times``, with an ``equality`` flag (g=0 vs g≤0) and optional per-time
  params (`knot_point_constraint.jl:27-36`). The calling convention
  (separate args per variable vs one concatenated vector) is auto-detected by
  a trial call, as the reference does (`knot_point_constraint.jl:146-169`);
  ``g_dim`` is probed by evaluating at the first knot (`:90-94`).
* ``NonlinearGlobalConstraint`` — ``g(globals)`` once per problem
  (`global_constraint.jl:24-66`).
* ``NonlinearGlobalKnotPointConstraint`` — ``g([vars_t; globals], p_t)`` per
  knot (`global_knot_point_constraint.jl:30-99`).

Derivatives come from vmapped ``jax.jacfwd`` / ``jax.hessian`` over the
variable window — no sparsity bookkeeping.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..module import module, static_field
from ..trajectory import Layout, Trajectory
from .base import NonlinearConstraintBase

__all__ = [
    "NonlinearKnotPointConstraint",
    "NonlinearGlobalConstraint",
    "NonlinearGlobalKnotPointConstraint",
]


def _global_vec(traj: Trajectory) -> jnp.ndarray:
    if traj.global_names:
        return jnp.concatenate(
            [traj.global_data[name] for name in traj.global_names], axis=-1
        )
    return jnp.zeros((0,))


def _detect_convention(g, var_dims, sample_param, takes_params):
    """Trial-call ``g`` to find its calling convention (reference
    `knot_point_constraint.jl:146-169`). Returns 'separate' or 'concat'."""
    p = [sample_param] if takes_params else []
    if len(var_dims) == 1:
        return "concat"  # single variable: both conventions coincide
    zeros = [np.zeros(d) for d in var_dims]
    try:
        out = g(*(zeros + p))
        np.asarray(out)
        return "separate"
    except (TypeError, ValueError):
        pass
    out = g(*([np.zeros(sum(var_dims))] + p))
    np.asarray(out)
    return "concat"


@module
class NonlinearKnotPointConstraint(NonlinearConstraintBase):
    """``g(vars_t[, p_t]) {=,≤} 0`` at each selected knot."""

    params: jax.Array | None  # (T, ...) per-time parameters
    g: Callable = static_field()
    var_names: tuple[str, ...] = static_field()
    times: tuple[int, ...] = static_field()
    g_dim: int = static_field()
    equality: bool = static_field(default=True)
    convention: str = static_field(default="concat")
    takes_params: bool = static_field(default=False)

    @staticmethod
    def create(
        g: Callable,
        names: str | Sequence[str],
        traj: Trajectory,
        params: Sequence | None = None,
        *,
        equality: bool = True,
        times: Sequence[int] | None = None,
    ) -> "NonlinearKnotPointConstraint":
        if isinstance(names, str):
            names = (names,)
        names = tuple(names)
        times = (
            tuple(range(traj.N)) if times is None else tuple(int(t) for t in times)
        )
        takes_params = params is not None
        if takes_params and len(params) != len(times):
            raise ValueError("params must have the same length as times")
        var_dims = [traj.dims[n] for n in names]
        sample_param = params[0] if takes_params else None
        convention = _detect_convention(g, var_dims, sample_param, takes_params)

        # probe g_dim at knot 0 values (reference :90-94)
        vals0 = [np.asarray(traj.data[n][times[0]]) for n in names]
        p0 = [params[0]] if takes_params else []
        if convention == "separate":
            out0 = g(*(vals0 + p0))
        else:
            out0 = g(*([np.concatenate(vals0)] + p0))
        g_dim = int(np.asarray(out0).reshape(-1).shape[0])

        params_arr = (
            np.stack([np.asarray(p, dtype=float) for p in params])
            if takes_params
            else None
        )
        return NonlinearKnotPointConstraint(
            params=params_arr,
            g=g,
            var_names=names,
            times=times,
            g_dim=g_dim,
            equality=equality,
            convention=convention,
            takes_params=takes_params,
        )

    # -- structured interface ------------------------------------------- #

    def knot_residual(self, layout: Layout, z: jax.Array, g: jax.Array, i) -> jax.Array:
        """Residual at the i-th *selected* time (z is that knot's vector)."""
        vars_ = [layout.knot_extract(z, n) for n in self.var_names]
        # jnp.asarray: numpy data leaves cannot be indexed by a traced i
        p = [jnp.asarray(self.params)[i]] if self.takes_params else []
        if self.convention == "separate":
            out = self.g(*(vars_ + p))
        else:
            out = self.g(*([jnp.concatenate(vars_)] + p))
        return jnp.asarray(out).reshape(-1)

    def constraint_dim(self, layout: Layout) -> int:
        return self.g_dim * len(self.times)

    def evaluate_flat(self, traj: Trajectory) -> jax.Array:
        layout = traj.layout
        zmat = traj.knot_matrix()
        gvec = _global_vec(traj)
        z_sel = zmat[jnp.asarray(self.times)]
        out = jax.vmap(
            lambda z, i: self.knot_residual(layout, z, gvec, i)
        )(z_sel, jnp.arange(len(self.times)))
        return out.reshape(-1)

    def __repr__(self):
        kind = "=" if self.equality else "≤"
        return f"NonlinearKnotPointConstraint g{kind}0 on {list(self.var_names)}"


@module
class NonlinearGlobalConstraint(NonlinearConstraintBase):
    """``g(globals) {=,≤} 0`` once per problem."""

    g: Callable = static_field()
    global_names: tuple[str, ...] = static_field()
    g_dim: int = static_field()
    equality: bool = static_field(default=True)

    @staticmethod
    def create(
        g: Callable,
        names: str | Sequence[str],
        traj: Trajectory,
        *,
        equality: bool = True,
    ) -> "NonlinearGlobalConstraint":
        if isinstance(names, str):
            names = (names,)
        names = tuple(names)
        vals0 = np.concatenate([np.asarray(traj.global_data[n]) for n in names])
        g_dim = int(np.asarray(g(vals0)).reshape(-1).shape[0])
        return NonlinearGlobalConstraint(
            g=g, global_names=names, g_dim=g_dim, equality=equality
        )

    def global_residual(self, layout: Layout, gvec: jax.Array) -> jax.Array:
        vals = jnp.concatenate(
            [gvec[..., layout.global_slice(n)] for n in self.global_names], axis=-1
        )
        return jnp.asarray(self.g(vals)).reshape(-1)

    def constraint_dim(self, layout: Layout) -> int:
        return self.g_dim

    def evaluate_flat(self, traj: Trajectory) -> jax.Array:
        return self.global_residual(traj.layout, _global_vec(traj))

    def __repr__(self):
        kind = "=" if self.equality else "≤"
        return f"NonlinearGlobalConstraint g{kind}0 on {list(self.global_names)}"


@module
class NonlinearGlobalKnotPointConstraint(NonlinearConstraintBase):
    """``g([vars_t; globals][, p_t]) {=,≤} 0`` per selected knot."""

    params: jax.Array | None
    g: Callable = static_field()
    var_names: tuple[str, ...] = static_field()
    global_names: tuple[str, ...] = static_field()
    times: tuple[int, ...] = static_field()
    g_dim: int = static_field()
    equality: bool = static_field(default=True)
    takes_params: bool = static_field(default=False)

    @staticmethod
    def create(
        g: Callable,
        names: str | Sequence[str],
        global_names: str | Sequence[str],
        traj: Trajectory,
        params: Sequence | None = None,
        *,
        equality: bool = True,
        times: Sequence[int] | None = None,
    ) -> "NonlinearGlobalKnotPointConstraint":
        if isinstance(names, str):
            names = (names,)
        if isinstance(global_names, str):
            global_names = (global_names,)
        names, global_names = tuple(names), tuple(global_names)
        times = (
            tuple(range(traj.N)) if times is None else tuple(int(t) for t in times)
        )
        takes_params = params is not None
        vals0 = np.concatenate(
            [np.asarray(traj.data[n][times[0]]) for n in names]
            + [np.asarray(traj.global_data[n]) for n in global_names]
        )
        p0 = [params[0]] if takes_params else []
        g_dim = int(np.asarray(g(*([vals0] + p0))).reshape(-1).shape[0])
        params_arr = (
            np.stack([np.asarray(p, dtype=float) for p in params])
            if takes_params
            else None
        )
        return NonlinearGlobalKnotPointConstraint(
            params=params_arr,
            g=g,
            var_names=names,
            global_names=global_names,
            times=times,
            g_dim=g_dim,
            equality=equality,
            takes_params=takes_params,
        )

    @property
    def uses_global(self) -> bool:
        return True

    def knot_residual(self, layout: Layout, z: jax.Array, gvec: jax.Array, i) -> jax.Array:
        vals = jnp.concatenate(
            [layout.knot_extract(z, n) for n in self.var_names]
            + [gvec[..., layout.global_slice(n)] for n in self.global_names],
            axis=-1,
        )
        # jnp.asarray: numpy data leaves cannot be indexed by a traced i
        p = [jnp.asarray(self.params)[i]] if self.takes_params else []
        return jnp.asarray(self.g(*([vals] + p))).reshape(-1)

    def constraint_dim(self, layout: Layout) -> int:
        return self.g_dim * len(self.times)

    def evaluate_flat(self, traj: Trajectory) -> jax.Array:
        layout = traj.layout
        zmat = traj.knot_matrix()
        gvec = _global_vec(traj)
        z_sel = zmat[jnp.asarray(self.times)]
        out = jax.vmap(
            lambda z, i: self.knot_residual(layout, z, gvec, i)
        )(z_sel, jnp.arange(len(self.times)))
        return out.reshape(-1)

    def __repr__(self):
        kind = "=" if self.equality else "≤"
        return (
            f"NonlinearGlobalKnotPointConstraint g{kind}0 on "
            f"{list(self.var_names)} + {list(self.global_names)}"
        )
