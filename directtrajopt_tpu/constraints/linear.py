"""The linear constraint zoo.

Each type mirrors a reference constraint (citations per class) but lowers to
the canonical pins / box-bounds / affine-COO-rows form of
:class:`~directtrajopt_tpu.constraints.base.LinearCanon` instead of MOI sets.
All time indices are 0-based.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..module import module, static_field
from ..trajectory import Layout, _normalize_bound
from .base import LinearCanon, LinearConstraintBase

__all__ = [
    "EqualityConstraint",
    "GlobalEqualityConstraint",
    "fix_trajectory_variable",
    "fix_global_variable",
    "BoundsConstraint",
    "GlobalBoundsConstraint",
    "AllEqualConstraint",
    "TimeStepsAllEqualConstraint",
    "TotalConstraint",
    "DurationConstraint",
    "SymmetryConstraint",
    "SymmetricControlConstraint",
    "TimeConsistencyConstraint",
    "L1SlackConstraint",
    "GlobalLinearConstraint",
]


def _z_indices(layout: Layout, name: str, times: Sequence[int], sub: slice | None = None):
    """Flat-Z indices of component ``name`` at the given knots (stacked)."""
    cs = layout.comp_slice(name)
    comp_idx = np.arange(cs.start, cs.stop)
    if sub is not None:
        comp_idx = comp_idx[sub]
    return np.concatenate([t * layout.dim + comp_idx for t in times]), len(comp_idx)


def _resolve_timestep_name(layout: Layout, name: str | None) -> str:
    if name is not None:
        return name
    if not layout.has_free_time:
        raise ValueError("trajectory has no free timestep variable")
    return layout.timestep


def _host_array(value):
    """Constructor-time leaves stay on host (numpy) — device arrays/tracers
    pass through. See trajectory._as_component_array (r4 compile-time fix)."""
    import jax as _jax

    if isinstance(value, _jax.Array):
        return value
    return np.asarray(value, dtype=np.float64)


@module
class EqualityConstraint(LinearConstraintBase):
    """Pin a variable to values at given knots
    (`src/constraints/linear/equality_constraint.jl:21-107`).

    ``values`` may be a scalar, a ``(dim,)`` vector (same at every time), or a
    ``(T, dim)`` matrix (per-time values).
    """

    values: jax.Array
    name: str = static_field()
    times: tuple[int, ...] = static_field()
    label: str = static_field(default="equality constraint")

    @staticmethod
    def create(name, times, values, *, label=None):
        times = tuple(int(t) for t in np.atleast_1d(times))
        values = _host_array(values)
        return EqualityConstraint(
            values=values,
            name=name,
            times=times,
            label=label or f"equality constraint on {name}",
        )

    def lower(self, layout: Layout, canon: LinearCanon) -> None:
        idx, d = _z_indices(layout, self.name, self.times)
        vals = jnp.atleast_1d(self.values)
        if vals.ndim == 1:
            vals = jnp.broadcast_to(vals, (d,)) if vals.shape[0] in (1, d) else vals
            tiled = jnp.tile(vals, len(self.times))
        else:
            if vals.shape != (len(self.times), d):
                raise ValueError(
                    f"values shape {vals.shape} != ({len(self.times)}, {d})"
                )
            tiled = vals.reshape(-1)
        canon.pin(idx, tiled)


@module
class GlobalEqualityConstraint(LinearConstraintBase):
    """Pin a global block to values
    (`src/constraints/linear/equality_constraint.jl` global variant)."""

    values: jax.Array
    name: str = static_field()
    label: str = static_field(default="global equality constraint")

    @staticmethod
    def create(name, values, *, label=None):
        return GlobalEqualityConstraint(
            values=_host_array(values).reshape(-1),
            name=name,
            label=label or f"equality constraint on global {name}",
        )

    def lower(self, layout: Layout, canon: LinearCanon) -> None:
        gs = layout.global_z_slice(self.name)
        idx = np.arange(gs.start, gs.stop)
        vals = jnp.broadcast_to(self.values, (len(idx),))
        canon.pin(idx, vals)


def fix_trajectory_variable(traj, name: str, times, values):
    """Pin a trajectory variable, removing any conflicting bounds first —
    the analog of the reference's ``fix_trajectory_variable!``
    (`src/constraints/linear/equality_constraint.jl:125-178`, which exists
    because MOI errors on conflicting variable sets; here bounds on pinned
    coordinates are ignored by construction, so this simply drops the bound
    metadata and returns (trajectory, constraint))."""
    new_bounds = {k: v for k, v in traj.bounds.items() if k != name}
    traj2 = traj.replace(bounds=new_bounds)
    return traj2, EqualityConstraint.create(
        name, times, values, label=f"fixed variable {name}"
    )


def fix_global_variable(traj, name: str, values):
    """Pin a global variable (analog of ``fix_global_variable!``)."""
    new_bounds = {k: v for k, v in traj.bounds.items() if k != name}
    traj2 = traj.replace(bounds=new_bounds)
    return traj2, GlobalEqualityConstraint.create(
        name, values, label=f"fixed global variable {name}"
    )


@module
class BoundsConstraint(LinearConstraintBase):
    """Box bounds on a variable over knots, with optional subcomponents
    (`src/constraints/linear/bounds_constraint.jl:22-91`)."""

    lb: jax.Array
    ub: jax.Array
    name: str = static_field()
    times: tuple[int, ...] = static_field()
    subcomponents: tuple[int, int] | None = static_field(default=None)
    label: str = static_field(default="bounds constraint")

    @staticmethod
    def create(name, times, bound, *, subcomponents=None, label=None, dim=None):
        times = tuple(int(t) for t in np.atleast_1d(times))
        if subcomponents is not None:
            subcomponents = (int(subcomponents.start), int(subcomponents.stop)) if isinstance(
                subcomponents, slice
            ) else (int(subcomponents[0]), int(subcomponents[-1]) + 1)
        # normalize later when dim known if not provided
        if dim is None:
            # store raw; normalized at lower() time via _normalize_bound needs dim
            raise ValueError("BoundsConstraint.create requires dim (or use from_spec)")
        n = subcomponents[1] - subcomponents[0] if subcomponents else dim
        lb, ub = _normalize_bound(bound, n)
        return BoundsConstraint(
            lb=lb,
            ub=ub,
            name=name,
            times=times,
            subcomponents=subcomponents,
            label=label or f"bounds on {name}",
        )

    @staticmethod
    def from_spec(name, times, bound, traj, *, subcomponents=None, label=None):
        return BoundsConstraint.create(
            name, times, bound, subcomponents=subcomponents, label=label,
            dim=traj.dims[name],
        )

    def lower(self, layout: Layout, canon: LinearCanon) -> None:
        sub = slice(*self.subcomponents) if self.subcomponents else None
        idx, d = _z_indices(layout, self.name, self.times, sub)
        canon.bound(
            idx,
            jnp.tile(self.lb, len(self.times)),
            jnp.tile(self.ub, len(self.times)),
        )


@module
class GlobalBoundsConstraint(LinearConstraintBase):
    """Box bounds on a global block."""

    lb: jax.Array
    ub: jax.Array
    name: str = static_field()
    label: str = static_field(default="global bounds constraint")

    @staticmethod
    def create(name, bound, traj, *, label=None):
        dim = traj.dims[name]
        lb, ub = _normalize_bound(bound, dim)
        return GlobalBoundsConstraint(
            lb=lb, ub=ub, name=name, label=label or f"bounds on global {name}"
        )

    def lower(self, layout: Layout, canon: LinearCanon) -> None:
        gs = layout.global_z_slice(self.name)
        canon.bound(np.arange(gs.start, gs.stop), self.lb, self.ub)


@module
class AllEqualConstraint(LinearConstraintBase):
    """All knots of one component equal: rows ``v_k − v_{N-1} = 0``
    (`src/constraints/linear/all_equal_constraint.jl:15-30`,
    lowering `src/solvers/constrain.jl:158-184`).

    ``name=None`` means the trajectory's timestep variable.
    """

    name: str | None = static_field(default=None)
    component_index: int = static_field(default=0)
    label: str = static_field(default="all equal constraint")

    def lower(self, layout: Layout, canon: LinearCanon) -> None:
        name = _resolve_timestep_name(layout, self.name)
        comp = layout.comp_slice(name).start + self.component_index
        N, dim = layout.N, layout.dim
        # adjacent-pair form v_{k+1} − v_k = 0 (equivalent to the reference's
        # anchor-to-last form, `src/solvers/constrain.jl:158-184`, but
        # chain-shaped: the Riccati backend promotes it into the core instead
        # of paying N−1 border sweeps)
        n_rows = N - 1
        rows = np.repeat(np.arange(n_rows), 2)
        cols = np.stack(
            [(np.arange(N - 1) + 1) * dim + comp, np.arange(N - 1) * dim + comp],
            axis=1,
        ).reshape(-1)
        vals = np.tile(np.asarray([1.0, -1.0]), n_rows)
        canon.add_eq_rows(rows, cols, vals, jnp.zeros(n_rows), n_rows)


def TimeStepsAllEqualConstraint(*, label="timesteps all equal constraint"):
    """All timesteps equal (fixed-Δt trajectories with a Δt variable)."""
    return AllEqualConstraint(name=None, component_index=0, label=label)


@module
class TotalConstraint(LinearConstraintBase):
    """``Σ_k v_k[comp] = value`` — one affine row
    (`src/constraints/linear/total_constraint.jl:20-40`,
    `src/solvers/constrain.jl:227-253`). For the timestep variable only the
    first N−1 knots are summed. ``name=None`` means the timestep variable.

    Extension over the reference: pass ``lb=`` / ``ub=`` instead of a value
    to constrain the total to a RANGE — this lowers to multi-knot linear
    inequality rows (handled on the Riccati path as border inequalities).
    """

    value: jax.Array
    name: str | None = static_field(default=None)
    component_index: int = static_field(default=0)
    label: str = static_field(default="total constraint")
    # static row-shape classification: value row vs. lb/ub inequality rows.
    # value holds (v,), (ub,), (lb,), or (ub, lb) depending on the flags.
    is_eq: bool = static_field(default=True)
    has_lb: bool = static_field(default=False)
    has_ub: bool = static_field(default=False)

    @staticmethod
    def create(name, value=None, *, lb=None, ub=None, component_index=0, label=None):
        if (value is None) == (lb is None and ub is None):
            raise ValueError("pass either value= (equality) or lb=/ub= (range)")
        if value is not None:
            vals = jnp.asarray([float(value)])
            is_eq, has_lb, has_ub = True, False, False
        else:
            parts = []
            if ub is not None:
                parts.append(float(ub))
            if lb is not None:
                parts.append(float(lb))
            vals = jnp.asarray(parts)
            is_eq, has_lb, has_ub = False, lb is not None, ub is not None
        return TotalConstraint(
            value=vals,
            name=name,
            component_index=component_index,
            label=label or f"total constraint on {name}",
            is_eq=is_eq,
            has_lb=has_lb,
            has_ub=has_ub,
        )

    def lower(self, layout: Layout, canon: LinearCanon) -> None:
        name = _resolve_timestep_name(layout, self.name)
        comp = layout.comp_slice(name).start + self.component_index
        n_t = layout.N - 1 if name == layout.timestep else layout.N
        cols = np.arange(n_t) * layout.dim + comp
        rows = np.zeros(n_t)
        val = jnp.atleast_1d(self.value)
        if self.is_eq:
            canon.add_eq_rows(rows, cols, jnp.ones(n_t), val[:1], 1)
            return
        # inequality rows: Σv ≤ ub and −Σv ≤ −lb for the finite sides;
        # value layout is (ub,), (lb,), or (ub, lb) per create()
        pos = 0
        if self.has_ub:
            canon.add_ineq_rows(rows, cols, jnp.ones(n_t), val[pos : pos + 1], 1)
            pos += 1
        if self.has_lb:
            canon.add_ineq_rows(
                rows, cols, -jnp.ones(n_t), -val[pos : pos + 1], 1
            )


def DurationConstraint(value=None, *, lb=None, ub=None, label=None):
    """Total duration Σ_{k<N-1} Δt_k = value, or lb ≤ Σ Δt ≤ ub when bounds
    are given instead (`src/constraints/linear/total_constraint.jl:28-40`;
    the range form is an extension — see :class:`TotalConstraint`)."""
    return TotalConstraint.create(
        None,
        value,
        lb=lb,
        ub=ub,
        component_index=0,
        label=label
        or (
            f"duration constraint of {value}"
            if value is not None
            else f"duration range [{lb}, {ub}]"
        ),
    )


@module
class SymmetryConstraint(LinearConstraintBase):
    """Time symmetry: even ``v_t = v_{N-1-t}`` or odd ``v_t = −v_{N-1-t}`` on
    chosen components, optional even Δt symmetry
    (`src/constraints/linear/symmetry_constraint.jl:18-46`,
    `src/solvers/constrain.jl:255-328`)."""

    name: str = static_field()
    component_indices: tuple[int, ...] = static_field()
    even: bool = static_field(default=True)
    include_timestep: bool = static_field(default=False)
    label: str = static_field(default="symmetry constraint")

    @staticmethod
    def create(name, component_indices, *, even=True, include_timestep=False, label=None):
        return SymmetryConstraint(
            name=name,
            component_indices=tuple(int(i) for i in component_indices),
            even=even,
            include_timestep=include_timestep,
            label=label or f"symmetry constraint on {name}",
        )

    def lower(self, layout: Layout, canon: LinearCanon) -> None:
        N, dim = layout.N, layout.dim
        base = layout.comp_slice(self.name).start
        pairs = []  # (i1, i2, sign)
        sign = -1.0 if self.even else 1.0  # even: v_t - v_mirror = 0; odd: v_t + v_mirror = 0
        for t in range(N // 2):
            for c in self.component_indices:
                i1 = t * dim + base + c
                i2 = (N - 1 - t) * dim + base + c
                pairs.append((i1, i2, sign))
        if self.include_timestep and layout.has_free_time:
            dt_comp = layout.comp_slice(layout.timestep).start
            for t in range(N // 2):
                pairs.append((t * dim + dt_comp, (N - 1 - t) * dim + dt_comp, -1.0))
        n_rows = len(pairs)
        rows = np.repeat(np.arange(n_rows), 2)
        cols = np.array([[p[0], p[1]] for p in pairs]).reshape(-1)
        vals = jnp.asarray(
            np.array([[1.0, p[2]] for p in pairs]).reshape(-1)
        )
        canon.add_eq_rows(rows, cols, vals, jnp.zeros(n_rows), n_rows)


def SymmetricControlConstraint(name, idx, *, even=True, include_timestep=True, label=None):
    """Symmetry on control components (`symmetry_constraint.jl:26-46`)."""
    return SymmetryConstraint.create(
        name, idx, even=even, include_timestep=include_timestep, label=label
    )


@module
class TimeConsistencyConstraint(LinearConstraintBase):
    """``t_{k+1} = t_k + Δt_k`` rows
    (`src/constraints/linear/time_consistency_constraint.jl:17-43`,
    `src/solvers/constrain.jl:377-410`)."""

    time_name: str = static_field(default="t")
    timestep_name: str | None = static_field(default=None)
    label: str = static_field(default="time consistency constraint")

    def lower(self, layout: Layout, canon: LinearCanon) -> None:
        N, dim = layout.N, layout.dim
        t_comp = layout.comp_slice(self.time_name).start
        dt_name = self.timestep_name or _resolve_timestep_name(layout, None)
        dt_comp = layout.comp_slice(dt_name).start
        n_rows = N - 1
        ks = np.arange(n_rows)
        rows = np.repeat(ks, 3)
        cols = np.stack(
            [
                (ks + 1) * dim + t_comp,
                ks * dim + t_comp,
                ks * dim + dt_comp,
            ],
            axis=1,
        ).reshape(-1)
        vals = np.tile(np.asarray([1.0, -1.0, -1.0]), n_rows)
        canon.add_eq_rows(rows, cols, vals, jnp.zeros(n_rows), n_rows)


@module
class L1SlackConstraint(LinearConstraintBase):
    """``|v| ≤ s`` via two inequality rows per component per knot
    (`src/constraints/linear/l1_slack_constraint.jl:28-57`,
    `src/solvers/constrain.jl:186-225`)."""

    var_name: str = static_field()
    slack_name: str = static_field()
    times: tuple[int, ...] | None = static_field(default=None)
    label: str = static_field(default="L1 slack constraint")

    @staticmethod
    def create(var_name, slack_name, traj, *, times=None, label=None):
        if traj.dims[var_name] != traj.dims[slack_name]:
            raise ValueError(
                f"dimension mismatch: {var_name} ({traj.dims[var_name]}) vs "
                f"{slack_name} ({traj.dims[slack_name]})"
            )
        return L1SlackConstraint(
            var_name=var_name,
            slack_name=slack_name,
            times=None if times is None else tuple(int(t) for t in times),
            label=label or f"L1 slack constraint: |{var_name}| <= {slack_name}",
        )

    def lower(self, layout: Layout, canon: LinearCanon) -> None:
        times = self.times if self.times is not None else tuple(range(layout.N))
        v_idx, d = _z_indices(layout, self.var_name, times)
        s_idx, _ = _z_indices(layout, self.slack_name, times)
        n = len(v_idx)
        # rows [v - s <= 0 ; -v - s <= 0] interleaved
        rows = np.repeat(np.arange(2 * n), 2)
        cols = np.stack(
            [
                np.stack([v_idx, s_idx], axis=1),
                np.stack([v_idx, s_idx], axis=1),
            ],
            axis=1,
        ).reshape(-1)
        vals = jnp.tile(jnp.asarray([1.0, -1.0, -1.0, -1.0]), n)
        canon.add_ineq_rows(rows, cols, vals, jnp.zeros(2 * n), 2 * n)


@module
class GlobalLinearConstraint(LinearConstraintBase):
    """``lb ≤ A·g ≤ ub`` on a global block
    (`src/constraints/linear/global_linear_constraint.jl:27-71`,
    `src/solvers/constrain.jl:330-375`). Rows with lb==ub become equalities;
    ±inf sides are skipped; all-zero rows that cannot be satisfied raise.
    """

    A: jax.Array  # (n_rows, g_dim) — static sparsity not exploited here
    lb: jax.Array
    ub: jax.Array
    name: str = static_field()
    label: str = static_field(default="global linear constraint")
    # static row classification (from numpy lb/ub at construction): lower()
    # runs at trace time, where lb/ub are tracers — classifying rows from
    # their *values* there would crash every jitted solve of a problem with
    # this constraint (solve_jit / solve_batch), so the classification is
    # captured statically here
    eq_mask: tuple[bool, ...] = static_field(default=())
    finite_lb: tuple[bool, ...] = static_field(default=())
    finite_ub: tuple[bool, ...] = static_field(default=())

    @staticmethod
    def create(name, A, lb, ub=None, *, label=None):
        A = _host_array(A)
        lb = np.asarray(lb, dtype=float).reshape(-1)
        ub = lb.copy() if ub is None else np.asarray(ub, dtype=float).reshape(-1)
        if not (A.shape[0] == len(lb) == len(ub)):
            raise ValueError("row count mismatch between A, lb, ub")
        if not np.all(lb <= ub):
            raise ValueError("lb must be elementwise <= ub")
        eq_mask = tuple(bool(l == u) for l, u in zip(lb, ub))
        # surface infeasible all-zero rows as errors (constrain.jl:356-363)
        A_np = np.asarray(A)
        for r in range(A_np.shape[0]):
            if not np.any(A_np[r]):
                if (eq_mask[r] and lb[r] != 0.0) or lb[r] > 0.0 or ub[r] < 0.0:
                    raise ValueError(f"infeasible all-zero row {r} in {name} constraint")
        return GlobalLinearConstraint(
            A=A,
            lb=_host_array(lb),
            ub=_host_array(ub),
            name=name,
            label=label or f"global linear constraint on {name}",
            eq_mask=eq_mask,
            finite_lb=tuple(bool(np.isfinite(v)) for v in lb),
            finite_ub=tuple(bool(np.isfinite(v)) for v in ub),
        )

    def lower(self, layout: Layout, canon: LinearCanon) -> None:
        gs = layout.global_z_slice(self.name)
        g_cols = np.arange(gs.start, gs.stop)
        n_rows, g_dim = self.A.shape
        # row classification is STATIC (see field comment) — lb/ub may be
        # tracers here, so no value-dependent Python logic on them
        finite_lb = self.finite_lb or (True,) * n_rows
        finite_ub = self.finite_ub or (True,) * n_rows

        eq_r = [r for r in range(n_rows) if self.eq_mask[r]]
        if eq_r:
            rows = np.repeat(np.arange(len(eq_r)), g_dim)
            cols = np.tile(g_cols, len(eq_r))
            vals = self.A[jnp.asarray(eq_r)].reshape(-1)
            canon.add_eq_rows(rows, cols, vals, self.lb[jnp.asarray(eq_r)], len(eq_r))

        # inequality rows: a·g ≤ ub and -a·g ≤ -lb for finite sides
        up_r = [r for r in range(n_rows) if not self.eq_mask[r] and finite_ub[r]]
        lo_r = [r for r in range(n_rows) if not self.eq_mask[r] and finite_lb[r]]
        n_in = len(up_r) + len(lo_r)
        if n_in:
            rows = np.repeat(np.arange(n_in), g_dim)
            cols = np.tile(g_cols, n_in)
            vals_list = []
            rhs_list = []
            if up_r:
                vals_list.append(self.A[jnp.asarray(up_r)].reshape(-1))
                rhs_list.append(self.ub[jnp.asarray(up_r)])
            if lo_r:
                vals_list.append(-self.A[jnp.asarray(lo_r)].reshape(-1))
                rhs_list.append(-self.lb[jnp.asarray(lo_r)])
            canon.add_ineq_rows(
                rows,
                cols,
                jnp.concatenate(vals_list),
                jnp.concatenate(rhs_list),
                n_in,
            )
