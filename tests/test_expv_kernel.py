"""Closed-form bilinear window Jacobians (ops/expv_kernel.py) vs generic
window AD — the correctness anchor for the prepare-stage fast path."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import directtrajopt_tpu as dtx
from directtrajopt_tpu.integrators.base import stack_jacobians_zk
from directtrajopt_tpu.ops.expv_kernel import (
    _window_jac_pallas,
    _window_jac_xla,
    make_window_jac,
)


def _mk_traj(N=9, free_time=True, seed=0, n_dr=2, xd=4):
    rng = np.random.default_rng(seed)
    data = {
        "x": 0.4 * rng.normal(size=(N, xd)),
        "u": 0.3 * rng.normal(size=(N, n_dr)),
    }
    if free_time:
        data["dt"] = 0.1 + 0.05 * rng.random((N, 1))
    return dtx.Trajectory.create(
        data,
        timestep="dt" if free_time else 0.12,
        controls="u",
        bounds={"dt": (0.01, 0.5)} if free_time else None,
    )


def _mk_integ(seed=0, n_dr=2, xd=4, order=6):
    rng = np.random.default_rng(100 + seed)
    Gd = rng.normal(size=(xd, xd))
    Gd = Gd - Gd.T
    Gv = [g - g.T for g in rng.normal(size=(n_dr, xd, xd))]
    return dtx.BilinearIntegrator.create(
        (Gd, Gv), "x", "u", None, method="taylor", taylor_order=order
    )


@pytest.mark.parametrize("free_time", [True, False])
@pytest.mark.parametrize("order", [3, 6, 12])
def test_closed_form_matches_jacfwd(free_time, order):
    """The tangent recurrences must equal jacfwd of the SAME Taylor chain
    to fp round-off (identical recurrence, identical division order)."""
    traj = _mk_traj(free_time=free_time)
    integ = _mk_integ(order=order)
    layout = traj.layout
    zmat = traj.to_zvec().reshape(layout.N, layout.dim)

    J_fast = stack_jacobians_zk(integ, layout, zmat)
    os.environ["DTX_ZK_KERNEL"] = "0"
    try:
        J_ref = stack_jacobians_zk(integ, layout, zmat)
    finally:
        os.environ.pop("DTX_ZK_KERNEL")
    np.testing.assert_allclose(
        np.asarray(J_fast), np.asarray(J_ref), atol=1e-13, rtol=1e-12
    )


def test_closed_form_matches_jacfwd_f32_batched():
    """vmapped over scenarios (the production shape), f32."""
    B = 5
    trajs = [_mk_traj(seed=s) for s in range(B)]
    integ = _mk_integ()
    layout = trajs[0].layout
    zb = jnp.stack(
        [t.to_zvec().reshape(layout.N, layout.dim) for t in trajs]
    ).astype(jnp.float32)
    integ32 = jax.tree.map(
        lambda x: x.astype(jnp.float32) if hasattr(x, "dtype") else x, integ
    )

    fast = jax.jit(jax.vmap(lambda z: stack_jacobians_zk(integ32, layout, z)))(zb)
    os.environ["DTX_ZK_KERNEL"] = "0"
    try:
        ref = jax.jit(jax.vmap(lambda z: stack_jacobians_zk(integ32, layout, z)))(zb)
    finally:
        os.environ.pop("DTX_ZK_KERNEL")
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=2e-6)


@pytest.mark.parametrize("free_time", [True, False])
def test_pallas_interpret_matches_xla(free_time):
    """The Pallas kernel (interpreter mode on CPU) == the XLA recurrence."""
    rng = np.random.default_rng(3)
    B, K, xd, n_dr, order = 5, 7, 4, 2, 6
    Gd = rng.normal(size=(B, xd, xd)).astype(np.float32)
    Gv = rng.normal(size=(B, n_dr, xd, xd)).astype(np.float32)
    u = (0.3 * rng.normal(size=(B, K, n_dr))).astype(np.float32)
    dt = (0.1 + 0.05 * rng.random((B, K))).astype(np.float32)
    x = rng.normal(size=(B, K, xd)).astype(np.float32)

    out_k = _window_jac_pallas(
        order, free_time, *map(jnp.asarray, (Gd, Gv, u, dt, x)), interpret=True
    )
    out_x = jax.vmap(
        lambda *a: _window_jac_xla(order, free_time, *a)
    )(*map(jnp.asarray, (Gd, Gv, u, dt, x)))
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x), atol=2e-6)


def test_pallas_interpret_odd_batch_padding():
    """Batch not a multiple of the lane width exercises the pad path."""
    rng = np.random.default_rng(4)
    B, K, xd, n_dr, order = 3, 4, 3, 1, 4
    args = (
        rng.normal(size=(B, xd, xd)).astype(np.float32),
        rng.normal(size=(B, n_dr, xd, xd)).astype(np.float32),
        (0.2 * rng.normal(size=(B, K, n_dr))).astype(np.float32),
        (0.1 + 0.02 * rng.random((B, K))).astype(np.float32),
        rng.normal(size=(B, K, xd)).astype(np.float32),
    )
    out_k = _window_jac_pallas(order, True, *map(jnp.asarray, args), interpret=True)
    out_x = jax.vmap(lambda *a: _window_jac_xla(order, True, *a))(
        *map(jnp.asarray, args)
    )
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x), atol=2e-6)


def test_custom_vmap_unbatched_and_batched():
    rng = np.random.default_rng(5)
    K, xd, n_dr, order = 6, 4, 2, 6
    fn = make_window_jac(order, True)
    Gd = jnp.asarray(rng.normal(size=(xd, xd)))
    Gv = jnp.asarray(rng.normal(size=(n_dr, xd, xd)))
    u = jnp.asarray(0.3 * rng.normal(size=(K, n_dr)))
    dt = jnp.asarray(0.1 + 0.02 * rng.random(K))
    x = jnp.asarray(rng.normal(size=(K, xd)))
    out1 = fn(Gd, Gv, u, dt, x)
    assert out1.shape == (K, xd, xd + n_dr + 1)
    # batched (shared G broadcast: in_batched False on Gd/Gv)
    ub = jnp.stack([u, 2 * u, 0.5 * u])
    xb = jnp.stack([x, -x, x + 0.1])
    dtb = jnp.stack([dt, dt, dt * 1.1])
    outb = jax.vmap(lambda uu, tt, xx: fn(Gd, Gv, uu, tt, xx))(ub, dtb, xb)
    np.testing.assert_allclose(
        np.asarray(outb[0]), np.asarray(out1), atol=1e-12
    )


def test_residual_action_levels():
    """The two-level custom_vmap residual op: unbatched, trial-vmapped,
    problem-vmapped, and nested (problem × trial) all agree with the naive
    per-window evaluation."""
    from directtrajopt_tpu.ops.expv_kernel import (
        _res_xla,
        make_residual_action,
    )

    rng = np.random.default_rng(7)
    B, T, K, xd, n_dr, order = 3, 4, 6, 4, 2, 6
    fn = make_residual_action(order)
    Gd = jnp.asarray(rng.normal(size=(B, xd, xd)))
    Gv = jnp.asarray(rng.normal(size=(B, n_dr, xd, xd)))
    u = jnp.asarray(0.3 * rng.normal(size=(B, T, K, n_dr)))
    dt = jnp.asarray(0.1 + 0.02 * rng.random((B, T, K)))
    x = jnp.asarray(rng.normal(size=(B, T, K, xd)))
    xn = jnp.asarray(rng.normal(size=(B, T, K, xd)))

    ref = np.stack([
        np.stack([
            np.asarray(_res_xla(order, Gd[b], Gv[b], u[b, t], dt[b, t],
                                x[b, t], xn[b, t]))
            for t in range(T)
        ])
        for b in range(B)
    ])
    # unbatched
    out0 = fn(Gd[0], Gv[0], u[0, 0], dt[0, 0], x[0, 0], xn[0, 0])
    np.testing.assert_allclose(np.asarray(out0), ref[0, 0], atol=1e-12)
    # one level (trials of one problem — G unbatched)
    out1 = jax.vmap(lambda uu, tt, xx, nn: fn(Gd[0], Gv[0], uu, tt, xx, nn))(
        u[0], dt[0], x[0], xn[0]
    )
    np.testing.assert_allclose(np.asarray(out1), ref[0], atol=1e-12)
    # nested (problems × trials) under jit — the production shape
    out2 = jax.jit(
        jax.vmap(
            lambda gd, gv, uu, tt, xx, nn: jax.vmap(
                lambda u_, t_, x_, n_: fn(gd, gv, u_, t_, x_, n_)
            )(uu, tt, xx, nn)
        )
    )(Gd, Gv, u, dt, x, xn)
    np.testing.assert_allclose(np.asarray(out2), ref, atol=1e-12)


def test_residual_pallas_interpret_matches_xla():
    from directtrajopt_tpu.ops.expv_kernel import _res_pallas, _res_xla

    rng = np.random.default_rng(8)
    B, K, xd, n_dr, order = 7, 5, 4, 2, 6
    args = tuple(
        jnp.asarray(a.astype(np.float32))
        for a in (
            rng.normal(size=(B, xd, xd)),
            rng.normal(size=(B, n_dr, xd, xd)),
            0.3 * rng.normal(size=(B, K, n_dr)),
            0.1 + 0.05 * rng.random((B, K)),
            rng.normal(size=(B, K, xd)),
            rng.normal(size=(B, K, xd)),
        )
    )
    out_k = _res_pallas(order, *args, interpret=True)
    out_x = jax.vmap(lambda *a: _res_xla(order, *a))(*args)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x), atol=2e-6)


def test_residuals_stacked_matches_generic():
    """stack_residuals with the capability == the per-window residual()."""
    from directtrajopt_tpu.integrators.base import stack_residuals

    traj = _mk_traj(free_time=True)
    integ = _mk_integ(order=6)
    layout = traj.layout
    zmat = traj.to_zvec().reshape(layout.N, layout.dim)
    fast = stack_residuals(integ, layout, zmat)
    os.environ["DTX_RES_KERNEL"] = "0"
    try:
        ref = stack_residuals(integ, layout, zmat)
    finally:
        os.environ.pop("DTX_RES_KERNEL")
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=1e-13)


def test_e2e_solve_matches_generic_path():
    """Full IPM solve with the closed-form prepare == generic-AD prepare."""
    from directtrajopt_tpu.benchmarks import make_bilinear_problem

    prob = make_bilinear_problem(N=21, feasible_start=True)
    res_fast = dtx.solve(prob, max_iter=60)
    # env toggles act at TRACE time — drop compiled programs in between
    jax.clear_caches()
    os.environ["DTX_ZK_KERNEL"] = "0"
    os.environ["DTX_RES_KERNEL"] = "0"
    try:
        res_ref = dtx.solve(prob, max_iter=60)
    finally:
        os.environ.pop("DTX_ZK_KERNEL")
        os.environ.pop("DTX_RES_KERNEL")
        jax.clear_caches()
    assert bool(res_fast.converged) and bool(res_ref.converged)
    np.testing.assert_allclose(
        np.asarray(res_fast.ipm.Z), np.asarray(res_ref.ipm.Z), atol=1e-7
    )


def test_kernel_jaxpr_x64_clean():
    """The Pallas kernels must trace to i64/f64-free programs under
    jax_enable_x64 (the suite-wide config here).

    Regression: Python-int literals in BlockSpec index maps and fori_loop
    induction variables trace as i64 under x64; Mosaic then either rejects
    the mixed-width index arithmetic ('failed to legalize func.return' /
    'arith.subi requires the same type') or infinitely recurses lowering the
    i64->i32 convert. That killed every kernel-path TPU solve in a process
    with x64 enabled — exactly the refine_residuals configuration."""
    import re

    from directtrajopt_tpu.ops.expv_kernel import _res_pallas
    from directtrajopt_tpu.ops.riccati_kernel import _factor_solve_pallas

    assert jax.config.jax_enable_x64  # the premise of the regression
    rng = np.random.default_rng(0)
    f = jnp.float32
    a = lambda *sh: jnp.asarray(rng.standard_normal(sh), f)

    K, xd, n_dr, B = 10, 4, 2, 128
    jx = jax.make_jaxpr(
        lambda *ar: _res_pallas(6, *ar, interpret=False)
    )(a(B, K, xd, xd)[:, 0], a(B, n_dr, xd, xd), a(B, K, n_dr),
      jnp.full((B, K), 0.1, f), a(B, K, xd), a(B, K, xd))
    txt = str(jx)
    assert "i64" not in txt and "f64" not in txt, re.findall(
        r"[^\n]*(?:i64|f64)[^\n]*", txt
    )[:5]

    N, ns, nv, R = 11, 4, 7, 3
    jx = jax.make_jaxpr(
        lambda *ar: _factor_solve_pallas((1, 1, 1, 1), *ar, interpret=False)
    )(a(B, N, ns, ns), a(B, N, ns, nv), a(B, N, nv, nv), a(B, N, ns, ns),
      a(B, N, ns, nv), a(B, R, N, ns), a(B, R, N, nv), a(B, R, N, ns))
    txt = str(jx)
    assert "i64" not in txt and "f64" not in txt, re.findall(
        r"[^\n]*(?:i64|f64)[^\n]*", txt
    )[:5]
