"""Pallas TPU kernel for the backward Riccati factor sweep.

The Riccati factorization works on tiny blocks (n_s, n_v ≈ 3–16) — far below
MXU tile sizes — so the TPU-native formulation is *batch-on-lanes*: every
block entry is a length-B vector laid on the VPU lanes, the whole backward
sweep runs inside one kernel in VMEM (a ``fori_loop`` over knots with the
value function as carry), and all small-matrix products and the n_v×n_v
Cholesky are unrolled into vectorized multiply–adds over the batch. One
kernel instance factors a 128-scenario tile; the grid covers the batch.

Layout: stage arrays enter as ``(N, r, c, B)`` (batch last); the operator
backend transposes from its ``(B, N, r, c)`` vmap layout at the boundary.

The kernel returns exactly what the XLA scan in ``ops_riccati.factor``
produces — P, L_vv, K_gain, M_vs stacks and the positive-definiteness
certificate — and is validated entry-for-entry against it in interpret mode.

STATUS: compiles and runs on real TPU, but is not wired into the solver yet:
for the factor alone XLA's batched-MXU scan is faster, and the Mosaic f32
build shows a ~1%/stage precision gap (suspected approximate reciprocal
lowering) to resolve. The intended payoff is fusing factor + multi-RHS
solves + border Schur into one kernel, eliminating the per-op dispatch that
dominates the current iteration cost.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["riccati_factor_pallas", "riccati_factor_reference"]

_TINY = 1e-30


def _factor_kernel(ns, nv, N, qss_ref, qsv_ref, qvv_ref, a_ref, b_ref,
                   p_ref, l_ref, kg_ref, mvs_ref, ok_ref):
    Bt = qss_ref.shape[-1]
    dtype = qss_ref.dtype

    def stage(i, carry):
        P, ok = carry  # (ns, ns, Bt), (1, Bt)
        k = N - 1 - i
        def rd(ref):
            return jnp.squeeze(ref[pl.ds(k, 1)], axis=0)
        Qss = rd(qss_ref)  # (ns, ns, Bt)
        Qsv = rd(qsv_ref)  # (ns, nv, Bt)
        Qvv = rd(qvv_ref)  # (nv, nv, Bt)
        A = rd(a_ref)  # (ns, ns, Bt)
        B = rd(b_ref)  # (ns, nv, Bt)

        # rank-preserving static slices (Mosaic can't lower rank-reducing
        # integer indexing of >2D values — it becomes an N-D gather)
        def row(M, j):  # (r, c, Bt) -> (1, c, Bt)
            return jax.lax.slice_in_dim(M, j, j + 1, axis=0)

        def col(M, j):  # (r, c, Bt) -> (r, 1, Bt)
            return jax.lax.slice_in_dim(M, j, j + 1, axis=1)

        # PB[i,m] = Σ_j P[i,j] B[j,m];  PA[i,j] = Σ_t P[i,t] A[t,j]
        PB = jnp.zeros((ns, nv, Bt), dtype)
        PA = jnp.zeros((ns, ns, Bt), dtype)
        for j in range(ns):
            PB = PB + col(P, j) * row(B, j)
            PA = PA + col(P, j) * row(A, j)

        # Hvv = Qvv + Bᵀ PB ; Mvs = Qsvᵀ + Bᵀ PA
        Hvv = Qvv
        Mvs = jnp.transpose(Qsv, (1, 0, 2))
        for j in range(ns):
            bj_t = jnp.transpose(row(B, j), (1, 0, 2))  # (nv, 1, Bt)
            Hvv = Hvv + bj_t * row(PB, j)
            Mvs = Mvs + bj_t * row(PA, j)

        # Cholesky of Hvv (nv×nv), unrolled, vectorized over the batch lanes.
        # L rows built as (nv, Bt) vectors; ok tracks positive pivots.
        def ent(M, r, c):  # (a, b, Bt) -> (1, Bt)
            return jnp.reshape(
                jax.lax.slice(M, (r, c, 0), (r + 1, c + 1, Bt)), (1, Bt)
            )

        # entries stored as (1, Bt) vectors: L_e[r][t]
        L_e = [[jnp.zeros((1, Bt), dtype) for _ in range(nv)] for _ in range(nv)]
        inv_diag = [None] * nv
        for r in range(nv):
            d = ent(Hvv, r, r)
            for t in range(r):
                d = d - L_e[r][t] * L_e[r][t]
            ok = ok * jnp.where(d > 0, 1.0, 0.0)
            d = jnp.maximum(d, _TINY)
            sqrt_d = jnp.sqrt(d)
            inv_diag[r] = 1.0 / sqrt_d
            L_e[r][r] = sqrt_d
            for q in range(r + 1, nv):
                v = ent(Hvv, q, r)
                for t in range(r):
                    v = v - L_e[q][t] * L_e[r][t]
                L_e[q][r] = v * inv_diag[r]
        L = jnp.stack([jnp.concatenate(Lr, axis=0) for Lr in L_e])  # (nv, nv, Bt)

        # Kg = −Hvv⁻¹ Mvs via two unrolled triangular solves; rows are
        # (1, ns, Bt), scalar multipliers are (1, 1, Bt)
        def sc(e):  # (1, Bt) -> (1, 1, Bt)
            return e[:, None, :]

        Y_rows = [None] * nv
        for r in range(nv):
            acc = row(Mvs, r)
            for t in range(r):
                acc = acc - sc(L_e[r][t]) * Y_rows[t]
            Y_rows[r] = acc * sc(inv_diag[r])
        X_rows = [None] * nv
        for r in range(nv - 1, -1, -1):
            acc = Y_rows[r]
            for t in range(r + 1, nv):
                acc = acc - sc(L_e[t][r]) * X_rows[t]
            X_rows[r] = acc * sc(inv_diag[r])
        Kg = (
            -jnp.concatenate(X_rows, axis=0)
            if nv
            else jnp.zeros((nv, ns, Bt), dtype)
        )

        # P_new = Qss + Aᵀ PA + Mvsᵀ Kg, symmetrized
        P_new = Qss
        for j in range(ns):
            P_new = P_new + jnp.transpose(row(A, j), (1, 0, 2)) * row(PA, j)
        for m in range(nv):
            P_new = P_new + jnp.transpose(row(Mvs, m), (1, 0, 2)) * row(Kg, m)
        P_new = 0.5 * (P_new + jnp.transpose(P_new, (1, 0, 2)))

        p_ref[pl.ds(k, 1)] = P_new[None]
        l_ref[pl.ds(k, 1)] = L[None]
        kg_ref[pl.ds(k, 1)] = Kg[None]
        mvs_ref[pl.ds(k, 1)] = Mvs[None]
        return (P_new, ok)

    P0 = jnp.zeros((ns, ns, Bt), dtype)
    ok0 = jnp.ones((1, Bt), dtype)
    _, ok = jax.lax.fori_loop(0, N, stage, (P0, ok0))
    ok_ref[...] = ok


def riccati_factor_pallas(Qss, Qsv, Qvv, A, B, *, block_b: int = 128,
                          interpret: bool = False):
    """Run the factor sweep for a batch.

    Inputs are ``(Bn, N, r, c)`` (vmap layout); returns
    (P, Lvv, Kg, Mvs, ok) in the same layout with ok ``(Bn,)`` boolean.
    The batch is padded to a multiple of ``block_b``.
    """
    Bn, N, ns, _ = Qss.shape
    nv = Qvv.shape[-1]
    dtype = Qss.dtype

    pad = (-Bn) % block_b
    def prep(x):
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
            )
        return jnp.transpose(x, (1, 2, 3, 0))  # (N, r, c, B)

    # padded lanes must stay PD: give them identity Qvv
    if pad:
        eyepad = jnp.broadcast_to(
            jnp.eye(nv, dtype=dtype)[None, None], (pad, N, nv, nv)
        )
        Qvv = jnp.concatenate([Qvv, eyepad], axis=0)
        Qss_p = jnp.concatenate(
            [Qss, jnp.zeros((pad, N, ns, ns), dtype)], axis=0
        )
        Qsv_p = jnp.concatenate([Qsv, jnp.zeros((pad, N, ns, nv), dtype)], axis=0)
        A_p = jnp.concatenate([A, jnp.zeros((pad, N, ns, ns), dtype)], axis=0)
        B_p = jnp.concatenate([B, jnp.zeros((pad, N, ns, nv), dtype)], axis=0)
        qss_t = jnp.transpose(Qss_p, (1, 2, 3, 0))
        qsv_t = jnp.transpose(Qsv_p, (1, 2, 3, 0))
        qvv_t = jnp.transpose(Qvv, (1, 2, 3, 0))
        a_t = jnp.transpose(A_p, (1, 2, 3, 0))
        b_t = jnp.transpose(B_p, (1, 2, 3, 0))
    else:
        qss_t, qsv_t, qvv_t, a_t, b_t = (
            prep(Qss), prep(Qsv), prep(Qvv), prep(A), prep(B)
        )
    Bp = Bn + pad

    grid = (Bp // block_b,)

    def idx(n, r, c):
        return pl.BlockSpec(
            (n, r, c, block_b), lambda i: (0, 0, 0, i), memory_space=pltpu.VMEM
        )

    kernel = functools.partial(_factor_kernel, ns, nv, N)
    P_t, L_t, Kg_t, Mvs_t, ok_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            idx(N, ns, ns),
            idx(N, ns, nv),
            idx(N, nv, nv),
            idx(N, ns, ns),
            idx(N, ns, nv),
        ],
        out_specs=[
            idx(N, ns, ns),
            idx(N, nv, nv),
            idx(N, nv, ns),
            idx(N, nv, ns),
            pl.BlockSpec((1, block_b), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, ns, ns, Bp), dtype),
            jax.ShapeDtypeStruct((N, nv, nv, Bp), dtype),
            jax.ShapeDtypeStruct((N, nv, ns, Bp), dtype),
            jax.ShapeDtypeStruct((N, nv, ns, Bp), dtype),
            jax.ShapeDtypeStruct((1, Bp), dtype),
        ],
        interpret=interpret,
    )(qss_t, qsv_t, qvv_t, a_t, b_t)

    def post(x):
        x = jnp.transpose(x, (3, 0, 1, 2))
        return x[:Bn]

    ok = ok_t[0, :Bn] > 0.5
    return post(P_t), post(L_t), post(Kg_t), post(Mvs_t), ok


def riccati_factor_reference(Qss, Qsv, Qvv, A, B):
    """Pure-XLA reference of the same sweep (vmapped scan) for validation."""

    def one(qss, qsv, qvv, a, b):
        ns, nv = qss.shape[-1], qvv.shape[-1]
        dtype = qss.dtype
        eye_v = jnp.eye(nv, dtype=dtype)

        def stage(carry, inp):
            P, ok = carry
            qss_k, qsv_k, qvv_k, Ab, Bb = inp
            PB = P @ Bb
            PA = P @ Ab
            Hvv = qvv_k + Bb.T @ PB
            Lv = jnp.linalg.cholesky(Hvv)
            okv = jnp.all(jnp.isfinite(Lv))
            Lv = jnp.where(jnp.isfinite(Lv), Lv, eye_v)
            Mvs = qsv_k.T + Bb.T @ PA
            Kg = -jax.scipy.linalg.cho_solve((Lv, True), Mvs)
            P_new = qss_k + Ab.T @ PA + Mvs.T @ Kg
            P_new = 0.5 * (P_new + P_new.T)
            return (P_new, ok & okv), (P_new, Lv, Kg, Mvs)

        (_, ok), ys = jax.lax.scan(
            stage,
            (jnp.zeros((ns, ns), dtype), jnp.asarray(True)),
            (qss, qsv, qvv, a, b),
            reverse=True,
        )
        return ys + (ok,)

    P, Lv, Kg, Mvs, ok = jax.vmap(one)(Qss, Qsv, Qvv, A, B)
    return P, Lv, Kg, Mvs, ok
