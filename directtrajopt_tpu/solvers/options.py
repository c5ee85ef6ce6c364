"""Solver options.

The TPU-native analog of ``IpoptOptions``
(`/root/reference/src/solvers/ipopt_solver/options.jl:33-91`): a pytree of
numeric knobs (leaves, so a compiled solve can take different tolerances
without retracing) plus static structural switches. Field names follow Ipopt
where the concept carries over (tol, constr_viol_tol, max_iter, mu_init...).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..module import module, static_field

__all__ = ["IPMOptions"]


@module
class IPMOptions:
    # -- termination (Ipopt defaults: options.jl:34-39) -------------------- #
    tol: float = 1e-8
    constr_viol_tol: float = 1e-6
    dual_inf_tol: float = 1.0
    compl_inf_tol: float = 1e-4
    acceptable_tol: float = 1e-6
    acceptable_iter: int = static_field(default=15)
    # -- barrier ----------------------------------------------------------- #
    # "monotone" = Fiacco–McCormick with κ_ε inner loop (Ipopt default and
    # ours: measured best on the nonconvex bilinear benchmarks);
    # "adaptive" = LOQO centrality rule; "mehrotra" = affine-scaling probe
    # (one extra resolve per iteration). Both adaptive modes are experimental
    # — on the nonconvex benchmark suite they run MORE iterations than
    # monotone (filter globalization fights the oscillating barrier).
    mu_strategy: str = static_field(default="monotone")
    mu_init: float = 1e-1
    mu_min: float = 1e-12
    kappa_mu: float = 0.2  # linear μ decrease factor
    theta_mu: float = 1.5  # superlinear μ decrease exponent
    kappa_epsilon: float = 10.0  # inner-loop tolerance κ_ε·μ
    # Optional two-regime schedule: while μ > mu_switch_factor·tol the
    # *_far constants apply and the update is floored at the switch level.
    # OFF by default (factor 0 ⇒ single classic regime). Measured on the
    # N=51 bilinear family: a uniformly aggressive κ_ε=100/κ_μ=0.1 halves
    # the acceptable-band iteration tail (p90 69→27, max 119→41 — what
    # bench.py passes explicitly), but as a *default* the two-regime hybrid
    # loses both ways: the strict-tol endgame pays ~12× iterations to
    # recover centering after the loose phase (golden f64: 223 vs 19), and
    # the switch floor alone costs band tail (p90 27→38). Keep the base
    # schedule for general use; pass aggressive constants per solve when
    # targeting an acceptable band.
    kappa_epsilon_far: float = 0.0  # 0 = inherit kappa_epsilon
    kappa_mu_far: float = 0.0  # 0 = inherit kappa_mu
    mu_switch_factor: float = 0.0  # 0 = classic single-regime (default)
    tau_min: float = 0.99  # fraction-to-boundary
    kappa_sigma: float = 1e10  # dual safeguard clamp
    # "least_squares": initialize equality multipliers from one extra KKT
    # solve at the start point (min ‖∇f + Jᵀλ‖ in the (W+Σ)⁻¹ metric),
    # discarded when ‖λ‖∞ > lam_init_max — Ipopt's
    # constr_mult_init_max/least-square-duals behavior. "zero": λ₀ = 0.
    # Measured on the N=51 bilinear benchmark family (B=64, f64, tol 1e-8):
    # least_squares HALVES the convergence rate (18/64 vs 36/64 at
    # max_iter=200) — even small λ₀ feeds the indefinite bilinear dynamics
    # Hessian into early iterations and triggers heavy δ_w regularization.
    # Like the adaptive-μ experiments, it stays available but off.
    dual_init: str = static_field(default="zero")
    lam_init_max: float = 1e3
    bound_push: float = 1e-2  # κ₁: push initial point inside bounds
    bound_frac: float = 1e-2  # κ₂
    slack_min: float = 1e-8
    # -- line search ------------------------------------------------------- #
    eta_ls: float = 1e-4  # Armijo constant
    rho_init: float = 1.0  # initial ℓ1 penalty
    theta_rho: float = 0.5
    max_ls: int = static_field(default=10)
    # Non-monotone (Grippo-style) acceptance memory: the φ reference in the
    # Armijo/sufficient-decrease tests is the max over the last `ls_memory`
    # iterates at the current barrier value (history resets on μ updates,
    # like the filter). 1 = classic monotone Wächter–Biegler. Cycling is
    # bounded because f-type classification stays STRICT (relative to the
    # current φ), so every relaxed acceptance augments the filter.
    ls_memory: int = static_field(default=1)
    # -- restoration (feasibility fallback folded into the trial grid) ------ #
    # When the filter line search rejects every candidate, the deepest
    # `n_rest_trials` grid slots are re-purposed as trials of a pure
    # feasibility direction (min ½dzᵀ(W+Σ)dz s.t. J dz = −c, reusing the
    # iteration's KKT factorization) accepted on θ-decrease alone — the
    # TPU-shaped analog of Ipopt's restoration phase (which the reference
    # inherits via MOI, `src/solvers/ipopt_solver/callbacks.jl:194-200`).
    rest_theta_factor: float = 0.05  # θ sufficient-decrease slope at full step
    rest_stall_kappa: float = 0.95  # θ ratio counting a restoration step as stalled
    inf_du_tol: float = 1e-4  # feasibility-gradient scale in the infeasibility test
    infeasibility_iter: int = static_field(default=5)
    n_rest_trials: int = static_field(default=3)
    # -- inertia regularization ------------------------------------------- #
    delta_w_init: float = 1e-8
    delta_w_max: float = 1e10
    delta_w_factor: float = 8.0  # κ_w⁺ (Ipopt); first-ever bump uses ×100
    delta_c: float = 1e-8
    # Riccati backend: augmented-Lagrangian curvature shift for knot-local
    # border rows (terminal/interior pins, nonlinear equalities). Moves the
    # curvature those constraints fix into the core so the stage-wise inertia
    # certificate matches the full KKT inertia; solution-invariant.
    border_penalty: float = 100.0
    # -- iteration limits (static: control loop structure) ----------------- #
    max_iter: int = static_field(default=1000)
    # -- diagnostics: per-iteration jax.debug.print (static) --------------- #
    print_level: int = static_field(default=0)

    def astype(self, dtype):
        """Cast all numeric leaves to the solve dtype."""
        import jax

        return jax.tree.map(lambda x: jnp.asarray(x, dtype=dtype), self)
