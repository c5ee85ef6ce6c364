"""Pallas Riccati-factor kernel vs the XLA scan reference (interpret mode on
CPU; the same kernel compiles for real TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from directtrajopt_tpu.ops.pallas_riccati import (
    riccati_factor_pallas,
    riccati_factor_reference,
)


def make_stages(Bn=5, N=9, ns=4, nv=2, seed=0):
    rng = np.random.default_rng(seed)

    def spd(n, scale=1.0):
        M = rng.normal(size=(Bn, N, n, n))
        return scale * (np.einsum("bnij,bnkj->bnik", M, M) + 3.0 * np.eye(n))

    Qss = jnp.asarray(spd(ns))
    Qvv = jnp.asarray(spd(nv))
    Qsv = jnp.asarray(0.3 * rng.normal(size=(Bn, N, ns, nv)))
    A = jnp.asarray(0.5 * rng.normal(size=(Bn, N, ns, ns)))
    B = jnp.asarray(0.5 * rng.normal(size=(Bn, N, ns, nv)))
    # stage N-1 has no dynamics (padding convention)
    A = A.at[:, -1].set(0.0)
    B = B.at[:, -1].set(0.0)
    return Qss, Qsv, Qvv, A, B


def test_pallas_factor_matches_reference():
    args = make_stages()
    P_r, L_r, Kg_r, Mvs_r, ok_r = riccati_factor_reference(*args)
    P_p, L_p, Kg_p, Mvs_p, ok_p = riccati_factor_pallas(
        *args, block_b=128, interpret=True
    )
    assert bool(jnp.all(ok_r)) and bool(jnp.all(ok_p))
    np.testing.assert_allclose(np.asarray(P_p), np.asarray(P_r), atol=1e-9)
    np.testing.assert_allclose(np.asarray(L_p), np.asarray(L_r), atol=1e-9)
    np.testing.assert_allclose(np.asarray(Kg_p), np.asarray(Kg_r), atol=1e-9)
    np.testing.assert_allclose(np.asarray(Mvs_p), np.asarray(Mvs_r), atol=1e-9)


def test_pallas_factor_detects_indefiniteness():
    Qss, Qsv, Qvv, A, B = make_stages(Bn=3)
    # make one instance's Hvv strongly indefinite at one stage
    Qvv = Qvv.at[1, 4].set(jnp.asarray([[-50.0, 0.0], [0.0, 1.0]]))
    _, _, _, _, ok_r = riccati_factor_reference(Qss, Qsv, Qvv, A, B)
    _, _, _, _, ok_p = riccati_factor_pallas(
        Qss, Qsv, Qvv, A, B, block_b=128, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(ok_p), np.asarray(ok_r))
    assert not bool(ok_p[1]) and bool(ok_p[0]) and bool(ok_p[2])
