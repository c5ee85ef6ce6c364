"""Data-layer tests: Trajectory pytree, Layout indexing, flat-vector interop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from directtrajopt_tpu.trajectory import Layout, Trajectory, traj_index, traj_slice


def make_traj(N=10, free_time=True):
    rng = np.random.default_rng(0)
    data = {
        "x": rng.normal(size=(N, 2)),
        "u": rng.normal(size=(N, 1)),
    }
    if free_time:
        data["dt"] = np.full((N, 1), 0.1)
    return Trajectory.create(
        data,
        timestep="dt" if free_time else 0.1,
        controls="u",
        initial={"x": [0.0, 0.0]},
        final={"x": [1.0, 0.0]},
        bounds={"u": 1.5, "dt": (0.01, 0.5)} if free_time else {"u": 1.5},
    )


def test_layout_indexing():
    traj = make_traj()
    lay = traj.layout
    assert lay.dim == 4 and lay.N == 10 and lay.z_dim == 40
    assert lay.comp_slice("x") == slice(0, 2)
    assert lay.comp_slice("u") == slice(2, 3)
    assert lay.comp_slice("dt") == slice(3, 4)
    assert lay.z_slice(3, "u") == slice(3 * 4 + 2, 3 * 4 + 3)
    assert traj_slice(3, 4) == slice(12, 16)
    assert traj_index(3, 2, 4) == 14
    assert lay.has_free_time


def test_zvec_roundtrip():
    traj = make_traj()
    z = traj.to_zvec()
    assert z.shape == (40,)
    traj2 = traj.from_zvec(z)
    for name in traj.names:
        np.testing.assert_allclose(traj2.data[name], traj.data[name])
    # layout: z[k*dim + comp]
    lay = traj.layout
    np.testing.assert_allclose(z[lay.z_slice(5, "x")], traj.data["x"][5])
    np.testing.assert_allclose(z[lay.z_slice(7, "dt")], traj.data["dt"][7])


def test_global_components():
    traj = Trajectory.create(
        {"x": np.ones((5, 2))},
        timestep=0.1,
        global_data={"theta": [0.3, 0.4, 0.5]},
    )
    lay = traj.layout
    assert lay.global_dim == 3 and lay.z_dim == 13
    z = traj.to_zvec()
    np.testing.assert_allclose(z[10:], [0.3, 0.4, 0.5])
    traj2 = traj.from_zvec(z * 2)
    np.testing.assert_allclose(traj2.global_data["theta"], [0.6, 0.8, 1.0])


def test_times_and_duration():
    traj = make_traj()
    t = traj.get_times()
    np.testing.assert_allclose(t, 0.1 * np.arange(10))
    np.testing.assert_allclose(traj.get_duration(), 0.9)
    fixed = make_traj(free_time=False)
    np.testing.assert_allclose(fixed.get_times(), 0.1 * np.arange(10))


def test_bounds_normalization():
    traj = make_traj()
    lb, ub = traj.bounds["u"]
    np.testing.assert_allclose(lb, [-1.5])
    np.testing.assert_allclose(ub, [1.5])
    lb, ub = traj.bounds["dt"]
    np.testing.assert_allclose(lb, [0.01])
    np.testing.assert_allclose(ub, [0.5])


def test_pytree_vmap():
    """A batch of trajectories with different goals is a stacked pytree."""
    traj = make_traj()
    batch = jax.tree.map(lambda x: jnp.stack([x, x * 2.0]), traj)
    assert batch.data["x"].shape == (2, 10, 2)

    def total(tr):
        return jnp.sum(tr.data["x"]) + jnp.sum(tr.final["x"])

    vals = jax.vmap(total)(batch)
    assert vals.shape == (2,)
    np.testing.assert_allclose(vals[1], 2 * vals[0])


def test_add_remove_component():
    traj = make_traj()
    t2 = traj.add_component("s", np.zeros((10, 2)), bounds=(0.0, np.inf))
    assert t2.names[-1] == "s" and t2.dim == 6
    lb, ub = t2.bounds["s"]
    np.testing.assert_allclose(lb, [0.0, 0.0])
    t3 = t2.remove_components(["s"])
    assert t3.names == traj.names and t3.dim == 4


def test_update():
    traj = make_traj()
    t2 = traj.update(u=np.zeros((10, 1)))
    np.testing.assert_allclose(t2.data["u"], 0.0)
    with pytest.raises(ValueError):
        traj.update(nope=np.zeros((10, 1)))


def test_jit_static_layout():
    traj = make_traj()

    calls = []

    @jax.jit
    def f(tr):
        calls.append(1)
        return tr.to_zvec().sum()

    f(traj)
    f(traj.update(u=np.ones((10, 1))))  # same structure -> no retrace
    assert len(calls) == 1
