"""Validation of the fused Pallas Riccati KKT kernel against the XLA scans.

The Pallas kernels (`ops/riccati_kernel.py`) are the TPU production path for
the IPM's KKT solve (the analog of Ipopt's LBLᵀ hot loop,
`/root/reference/src/solvers/evaluator.jl:389-404`). Here they run in
interpreter mode (works on CPU) and must match the XLA scan implementation —
the same one the cross-backend agreement tests tie to the dense solver — to
f32 roundoff, entry for entry, including the multipliers and the
positive-definiteness certificate.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from directtrajopt_tpu.ops import riccati_kernel as rk


def _random_stage_data(seed, B=4, N=7, ns=5, nv=3, R=3, convex=True):
    rng = np.random.default_rng(seed)

    def sym(x):
        return 0.5 * (x + np.swapaxes(x, -1, -2))

    shift = 2.0 if convex else 0.3
    Qss = sym(rng.standard_normal((B, N, ns, ns))) * 0.1 + np.eye(ns) * shift
    Qsv = rng.standard_normal((B, N, ns, nv)) * 0.1
    Qvv = sym(rng.standard_normal((B, N, nv, nv))) * 0.1 + np.eye(nv) * shift
    A = rng.standard_normal((B, N, ns, ns)) * 0.3
    A[:, -1] = 0.0
    Bm = rng.standard_normal((B, N, ns, nv)) * 0.3
    Bm[:, -1] = 0.0
    qs = rng.standard_normal((B, R, N, ns))
    qv = rng.standard_normal((B, R, N, nv))
    b = rng.standard_normal((B, R, N, ns))
    b[:, :, -1] = 0.0
    return [jnp.asarray(x, jnp.float32) for x in (Qss, Qsv, Qvv, A, Bm, qs, qv, b)]


@pytest.mark.parametrize("ns,nv,R", [(5, 3, 3), (8, 3, 1), (4, 2, 6)])
def test_factor_solve_matches_xla(ns, nv, R):
    s0m = np.ones(ns)
    s0m[min(2, ns - 1)] = 0.0
    args = _random_stage_data(0, ns=ns, nv=nv, R=R)
    ref = jax.vmap(lambda *a: rk._factor_solve_xla(s0m, *a))(*args)
    out = rk._factor_solve_pallas(s0m, *args, interpret=True)
    names = ["P", "Lv", "Kg", "Mvs", "L0", "ok", "dzs", "dzv", "lam"]
    for name, x, p in zip(names, ref, out):
        x, p = np.asarray(x), np.asarray(p)
        if name == "ok":
            assert (x == p).all()
            continue
        scale = max(np.max(np.abs(x)), 1.0)
        assert np.max(np.abs(x - p)) / scale < 5e-6, name


def test_resolve_matches_xla():
    ns, nv, R = 5, 3, 1
    s0m = np.ones(ns)
    args = _random_stage_data(1, ns=ns, nv=nv, R=R)
    fac = jax.vmap(lambda *a: rk._factor_solve_xla(s0m, *a))(*args)
    factors = [jnp.asarray(np.asarray(t)) for t in fac[:5]]
    ref = jax.vmap(lambda *a: rk._resolve_xla(s0m, *a))(
        *fac[:5], *args[3:5], *args[5:]
    )
    out = rk._resolve_pallas(s0m, *factors, *args[3:5], *args[5:], interpret=True)
    for name, x, p in zip(["dzs", "dzv", "lam"], ref, out):
        x, p = np.asarray(x), np.asarray(p)
        scale = max(np.max(np.abs(x)), 1.0)
        assert np.max(np.abs(x - p)) / scale < 5e-6, name


def test_nonconvex_certificate_agrees():
    """Indefinite stages: the ok flag must match the scan's per-lane verdict."""
    s0m = np.ones(5)
    args = _random_stage_data(2, B=8, convex=False)
    ref = jax.vmap(lambda *a: rk._factor_solve_xla(s0m, *a))(*args)
    out = rk._factor_solve_pallas(s0m, *args, interpret=True)
    ok_ref, ok_pal = np.asarray(ref[5]), np.asarray(out[5])
    assert (ok_ref == ok_pal).all()
    assert not ok_ref.all()  # fixture really is indefinite somewhere


def test_batch_padding():
    """Batch not a multiple of the lane tile: padded lanes must not pollute."""
    s0m = np.ones(5)
    args = _random_stage_data(3, B=5)
    ref = jax.vmap(lambda *a: rk._factor_solve_xla(s0m, *a))(*args)
    out = rk._factor_solve_pallas(s0m, *args, interpret=True)
    for x, p in zip(ref, out):
        x, p = np.asarray(x), np.asarray(p)
        assert x.shape == p.shape
        if x.dtype == bool:
            assert (x == p).all()
        else:
            assert np.max(np.abs(x - p)) / max(np.max(np.abs(x)), 1.0) < 5e-6


def test_e2e_solve_with_interpret_kernel():
    """Full batched IPM solve with the Pallas kernel (interpreter) in the
    loop: must agree with the pure-XLA solve to f32-solve tolerance."""
    from directtrajopt_tpu.benchmarks import make_batched_bilinear_problems
    from directtrajopt_tpu.solvers.canonical import make_nlp
    from directtrajopt_tpu.solvers.ipm import ipm_solve
    from directtrajopt_tpu.solvers.ops_riccati import RiccatiOps
    from directtrajopt_tpu.solvers.options import IPMOptions

    batch = make_batched_bilinear_problems(3, N=7, feasible_start=True)
    opts = IPMOptions(max_iter=8, tol=1e-10)

    def run(mode):
        def one(problem):
            nlp = make_nlp(problem)
            ops = RiccatiOps(nlp, pallas_mode=mode)
            return ipm_solve(nlp, problem.trajectory.to_zvec(), opts, ops=ops).Z

        return np.asarray(jax.vmap(one)(batch))

    Z_xla = run("never")
    Z_pal = run("interpret")
    assert np.max(np.abs(Z_xla - Z_pal)) < 1e-7
