"""CI quality gate for the headline benchmark configuration (VERDICT r4 #2).

The throughput headline (bench.py) solves to the solver's own
acceptable-band certificate (acceptable_tol=5e-4, GN Hessian, taylor
order 6, trimmed trial grid). These tests tie that configuration to an
EXTERNAL accuracy certificate: the exact bench kwargs (imported from
``bench.headline_config`` — not copied, so they cannot drift) must produce
control sequences within RMS < 1e-4 of the independent scipy trust-constr
golden optimum (``tests/golden/bilinear_n51_seed42.npz``), the reference's
cross-solver agreement bar
(`/root/reference/test/solver_test_utils.jl:105-132`, BASELINE #1).

Every lane of the batched benchmark poses the same optimization problem
from a different start (per-lane data is the initial guess; bounds, pins
and objective are shared), so one certified optimum covers all lanes.
"""

import importlib.util
import os
from pathlib import Path

import numpy as np
import pytest

_spec = importlib.util.spec_from_file_location(
    "bench", Path(__file__).parent.parent / "bench.py"
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


@pytest.mark.slow
def test_headline_config_matches_golden():
    import jax.numpy as jnp

    from directtrajopt_tpu.benchmarks import make_batched_bilinear_problems
    from directtrajopt_tpu.solvers.solve import cast_problem

    B = 8
    # on_tpu=True: the HEADLINE pipeline (GN seek @1e-6 + exact-Hessian
    # compensated-f32 polish @1e-7, taylor 6, compact scheduling with
    # carry_duals), run here as the CPU f32 proxy on a modest batch
    cfg = bench.headline_config(True, batch=B)
    batch = cast_problem(
        make_batched_bilinear_problems(
            B, N=cfg["N"], feasible_start=True, taylor_order=cfg["taylor_order"]
        ),
        jnp.float32,
    )
    res, res_seek = bench.run_headline(batch, cfg)
    conv = np.asarray(res.converged)
    assert conv.all(), (conv, np.asarray(res.kkt_error))
    # the certificate the headline counts: kkt at or below the polish tol
    assert float(np.asarray(res.kkt_error).max()) <= 1e-6

    rms = bench.rms_u_vs_golden(res)
    assert rms < 1e-4, f"headline-config solution quality: max RMS(u) {rms:.2e}"


def test_golden_certificate_present():
    """The fixture the gate relies on exists and carries its certificate."""
    path = os.path.join(
        os.path.dirname(__file__), "golden", "bilinear_n51_seed42.npz"
    )
    data = np.load(path)
    assert float(data["feas"]) <= 1e-8
    assert float(data["stat"]) <= 1e-6
