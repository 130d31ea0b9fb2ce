"""Mesh-sharded batched solves on a virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_tpu.config import AlmConfig, PanocConfig
from mpc_tpu.models.params import VehicleParams
from mpc_tpu.ops.road import compute_errors_ocp, straight_centerline
from mpc_tpu.parallel.mesh import (MODEL_AXIS, SCENARIO_AXIS,
                                   centerline_sharding, make_mesh,
                                   scenario_sharding)
from mpc_tpu.parallel.road_sp import compute_errors_ocp_sp
from mpc_tpu.parallel.sharding import (make_sharded_closed_loop,
                                       make_sharded_vehicle_solver)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

ALM = AlmConfig(eps=1e-4)
PANOC = PanocConfig(lbfgs_memory=12, max_iter=400)


def test_mesh_construction():
    mesh = make_mesh()
    assert mesh.shape[SCENARIO_AXIS] == 8 and mesh.shape[MODEL_AXIS] == 1
    mesh2 = make_mesh(n_model=2)
    assert mesh2.shape[SCENARIO_AXIS] == 4 and mesh2.shape[MODEL_AXIS] == 2
    with pytest.raises(ValueError):
        make_mesh(n_scenario=3, n_model=2)


def test_sp_errors_match_single_device():
    # sharded nearest-point/errors == single-device version
    mesh = make_mesh(n_scenario=1, n_model=8)
    cl = straight_centerline(96)  # divisible by 8
    positions = jnp.array([[0.52, 0.3], [3.0, -0.2], [-1.0, 0.1], [9.4, 0.0]])
    headings = jnp.array([0.0, 0.3, -0.2, 1.0])

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def f(pos, heading, cl_local):
        return compute_errors_ocp_sp(pos, heading, cl_local,
                                     axis_name=MODEL_AXIS, size=96)

    sharded = jax.jit(shard_map(
        lambda ps, hs, cl_local: jax.vmap(
            lambda p, h: f(p, h, cl_local))(ps, hs),
        mesh=mesh, in_specs=(P(), P(), P(MODEL_AXIS, None)),
        out_specs=P(), check_vma=False))

    got = sharded(positions, headings, cl)
    for i in range(4):
        want = compute_errors_ocp(positions[i], headings[i], cl)
        np.testing.assert_allclose(float(got.cte[i]), float(want.cte),
                                   atol=1e-5)
        np.testing.assert_allclose(float(got.heading_error[i]),
                                   float(want.heading_error), atol=1e-5)
        np.testing.assert_allclose(float(got.pos_error[i]),
                                   float(want.pos_error), atol=1e-5)


def test_sharded_batch_solver_dp():
    # pure scenario-DP over 8 devices: results match per-scenario solve
    mesh = make_mesh()  # 8 x 1
    params = VehicleParams()
    cl = straight_centerline(100)
    B = 16
    rng = np.random.default_rng(0)
    y0s = np.zeros((B, 6), np.float32)
    y0s[:, 1] = rng.uniform(-0.1, 0.1, B)
    y0s[:, 3] = rng.uniform(0.3, 0.9, B)
    U0s = jnp.tile(jnp.tile(jnp.array([1.0, 0.0], jnp.float32), 12), (B, 1))
    lam0s = jnp.zeros((B, 72), jnp.float32)

    solve_batch = make_sharded_vehicle_solver(mesh, alm_cfg=ALM,
                                              panoc_cfg=PANOC)
    us, lams, conv, iters = solve_batch(jnp.asarray(y0s), cl, params, U0s,
                                        lam0s)
    assert us.shape == (B, 24)
    assert np.asarray(conv).all()
    # inputs respect the box
    u = np.asarray(us).reshape(B, 12, 2)
    assert np.all(np.abs(u[..., 0]) <= 1.0 + 1e-5)
    assert np.all(np.abs(u[..., 1]) <= 0.32 + 1e-5)


def test_sharded_2d_mesh_solver():
    # scenario x model (4 x 2) mesh: SP road errors inside the DP solve
    mesh = make_mesh(n_scenario=4, n_model=2)
    params = VehicleParams()
    cl = straight_centerline(100)
    B = 8
    y0s = np.zeros((B, 6), np.float32)
    y0s[:, 3] = 0.5
    U0s = jnp.tile(jnp.tile(jnp.array([1.0, 0.0], jnp.float32), 12), (B, 1))
    lam0s = jnp.zeros((B, 72), jnp.float32)

    solve_batch = make_sharded_vehicle_solver(mesh, alm_cfg=ALM,
                                              panoc_cfg=PANOC)
    us2, _, conv2, _ = solve_batch(jnp.asarray(y0s), cl, params, U0s, lam0s)

    mesh_dp = make_mesh(n_scenario=8, n_model=1)
    solve_dp = make_sharded_vehicle_solver(mesh_dp, alm_cfg=ALM,
                                           panoc_cfg=PANOC)
    us1, _, conv1, _ = solve_dp(jnp.asarray(y0s), cl, params, U0s, lam0s)

    assert np.asarray(conv2).all() and np.asarray(conv1).all()
    # same solves on both meshes (within f32 solver tolerance)
    np.testing.assert_allclose(np.asarray(us2), np.asarray(us1), atol=5e-3)


@pytest.mark.slow
def test_sharded_closed_loop():
    mesh = make_mesh()
    params = VehicleParams()
    cl = straight_centerline(100)
    B = 8
    y0s = np.zeros((B, 6), np.float32)
    y0s[:, 3] = np.linspace(0.3, 0.9, B)

    run = make_sharded_closed_loop(mesh, n_sim=10, alm_cfg=ALM,
                                   panoc_cfg=PANOC)
    ys, traj, conv = run(jnp.asarray(y0s), cl, params)
    assert ys.shape == (B, 6)
    assert traj.shape == (10, B, 6)
    # all scenarios accelerate toward v_ref
    v_end = np.asarray(ys)[:, 3]
    assert np.all(v_end > np.asarray(y0s)[:, 3] - 1e-3)
