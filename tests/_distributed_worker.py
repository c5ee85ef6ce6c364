"""Worker process for tests/test_distributed.py.

Run as: python tests/_distributed_worker.py <coordinator> <num_procs> <rank>

Each process owns 2 virtual CPU devices (XLA_FLAGS set by the parent), joins
the jax.distributed coordination service through
``directtrajopt_tpu.parallel.init_distributed``, solves a scenario batch
sharded over the GLOBAL mesh, and checks the gathered result lane-for-lane
against a purely local (single-process) reference solve of the same batch.
This is the strongest multi-host correctness evidence obtainable without
multi-host hardware (SURVEY §4; VERDICT r2 missing #1).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

coordinator, num_procs, rank = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

import directtrajopt_tpu as dtx  # noqa: E402
from directtrajopt_tpu.parallel import (  # noqa: E402
    init_distributed,
    make_mesh,
    solve_batch_sharded,
)

pid, pcount = init_distributed(
    coordinator_address=coordinator, num_processes=num_procs, process_id=rank
)
assert pid == rank and pcount == num_procs, (pid, pcount)

n_local = len(jax.local_devices())
n_global = len(jax.devices())
assert n_global == num_procs * n_local, (n_global, num_procs, n_local)

import jax.numpy as jnp  # noqa: E402

G_DRIFT = np.array([[0.0, 1.0], [-1.0, 0.0]])
G_DRIVE = np.array([[0.0, 1.0], [1.0, 0.0]])


def make_problem(seed):
    rng = np.random.default_rng(seed)
    traj = dtx.Trajectory.create(
        {"x": rng.normal(size=(10, 2)), "u": 0.1 * rng.normal(size=(10, 1))},
        timestep=0.1,
        controls="u",
        initial={"x": [1.0, 0.0]},
    )
    integ = dtx.BilinearIntegrator.create((G_DRIFT, [G_DRIVE]), "x", "u", traj)
    obj = dtx.QuadraticRegularizer.create("u", traj, 1.0)
    return dtx.DirectTrajOptProblem.create(traj, obj, integ)


B = 2 * n_global  # 2 lanes per global device
batch = jax.tree.map(
    lambda *xs: jnp.stack(xs), *[make_problem(s) for s in range(B)]
)

# global-mesh SPMD solve: every process passes the same global batch value;
# shard_batch/device_put slices out each process's addressable shards
mesh = make_mesh()
res = solve_batch_sharded(batch, mesh=mesh, tol=1e-8, max_iter=100)

from jax.experimental import multihost_utils  # noqa: E402

Z_g = multihost_utils.process_allgather(res.ipm.Z, tiled=True)
conv_g = multihost_utils.process_allgather(res.converged, tiled=True)
iters_g = multihost_utils.process_allgather(res.iterations, tiled=True)

# purely local reference: same batch, no mesh, default device
ref = dtx.solve_batch(batch, tol=1e-8, max_iter=100)

assert conv_g.shape == (B,), conv_g.shape
assert bool(np.all(conv_g)), f"rank {rank}: not all sharded lanes converged"
assert bool(np.all(np.asarray(ref.converged)))
np.testing.assert_allclose(Z_g, np.asarray(ref.ipm.Z), rtol=0, atol=1e-9)
np.testing.assert_array_equal(iters_g, np.asarray(ref.iterations))

print(f"MULTIPROC OK rank={rank} procs={pcount} devices={n_global} B={B}")
