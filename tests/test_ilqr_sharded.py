"""Batched / horizon-sharded AL-iLQR (parallel/ilqr_sharded.py) parity.

Chain of oracles: the per-lane AL-iLQR is gated against dense-KKT and
closed-loop oracles (tests/test_ilqr.py); the batched solver must match a
``vmap`` of it exactly (same float ops); the mesh-sharded backward must
match the batched single-device solve on the config-2 vehicle OCP
(Pacejka + bounded quadratic state constraints, reference main.py:43-52)
over (1x8) and (2x4) virtual (scenario, horizon) meshes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_tpu.config import AlmConfig
from mpc_tpu.control.mpc import build_vehicle_ilqr_controller
from mpc_tpu.models.params import VehicleParams
from mpc_tpu.ops.bezier import bezier_centerline, lane_change_control_points
from mpc_tpu.parallel.ilqr_sharded import BatchedMpcController
from mpc_tpu.parallel.mesh import make_horizon_mesh
from mpc_tpu.solver.ilqr import IlqrConfig

PARAMS = VehicleParams()
ALM = AlmConfig(delta=1e-3, max_iter=4, sigma_0=1e3, penalty_factor=5.0)


def _setup(n_horiz=8, B=4):
    pts = lane_change_control_points(5.0).control_points * 0.01
    cl = bezier_centerline(pts, size=50)
    rng = np.random.default_rng(0)
    d0 = cl[1] - cl[0]
    hd = float(jnp.arctan2(d0[1], d0[0]))
    y0 = np.stack([
        np.array([float(cl[0, 0]), float(cl[0, 1]) + rng.uniform(-0.02, 0.02),
                  hd, rng.uniform(0.3, 0.7), 0, 0], np.float32)
        for _ in range(B)])
    u0 = np.tile(np.asarray([1.0, 0.0], np.float32), (B, n_horiz))
    lam0 = np.zeros((B, 6 * n_horiz), np.float32)
    return cl, jnp.asarray(y0), jnp.asarray(u0), jnp.asarray(lam0)


def _solve_per_lane_vmapped(cl, y0s, u0s, lam0s, n_horiz, ilqr_cfg):
    ctrl = build_vehicle_ilqr_controller(
        n_horiz=n_horiz, bound_state_constraints=True, alm_cfg=ALM,
        ilqr_cfg=ilqr_cfg)
    f = jax.vmap(lambda y0, u0, lam0: ctrl.solve(
        {"y0": y0, "p": PARAMS, "centerline": cl}, u0, lam0))
    return jax.jit(f)(y0s, u0s, lam0s)


def _solve_batched(cl, y0s, u0s, lam0s, n_horiz, ilqr_cfg, mesh=None):
    ctrl = build_vehicle_ilqr_controller(
        n_horiz=n_horiz, bound_state_constraints=True, alm_cfg=ALM,
        ilqr_cfg=ilqr_cfg,
        mesh=mesh if mesh is not None
        else make_horizon_mesh(n_scenario=1, n_horizon=1,
                               devices=jax.devices()[:1]))
    assert isinstance(ctrl, BatchedMpcController)
    param = {"y0": y0s, "p": PARAMS, "centerline": cl}
    return jax.jit(lambda u0, lam0: ctrl.solve(param, u0, lam0))(u0s, lam0s)


def test_batched_matches_vmapped_per_lane():
    """mesh of one device -> the sharded scan degenerates to the local scan;
    lane semantics (exits, reg schedule, masking) must match the vmapped
    per-lane solver."""
    n_horiz, B = 8, 4
    cfg = IlqrConfig(max_iter=15, parallel_backward=True)
    cl, y0s, u0s, lam0s = _setup(n_horiz, B)
    ref = _solve_per_lane_vmapped(cl, y0s, u0s, lam0s, n_horiz, cfg)
    got = _solve_batched(cl, y0s, u0s, lam0s, n_horiz, cfg)
    assert np.array_equal(np.asarray(got.converged), np.asarray(ref.converged))
    np.testing.assert_allclose(np.asarray(got.u), np.asarray(ref.u),
                               atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(got.psi), np.asarray(ref.psi),
                               atol=1e-4, rtol=1e-4)
    assert np.asarray(got.converged).all()


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4)])
def test_horizon_sharded_matches_single_device(mesh_shape):
    n_horiz, B = 8, 4
    cfg = IlqrConfig(max_iter=15, parallel_backward=True)
    ns, nh = mesh_shape
    mesh = make_horizon_mesh(n_scenario=ns, n_horizon=nh,
                             devices=jax.devices()[: ns * nh])
    cl, y0s, u0s, lam0s = _setup(n_horiz, B)
    ref = _solve_batched(cl, y0s, u0s, lam0s, n_horiz, cfg)
    got = _solve_batched(cl, y0s, u0s, lam0s, n_horiz, cfg, mesh=mesh)
    assert np.asarray(got.converged).all()
    np.testing.assert_allclose(np.asarray(got.u), np.asarray(ref.u),
                               atol=5e-3, rtol=5e-3)
    np.testing.assert_allclose(np.asarray(got.psi), np.asarray(ref.psi),
                               atol=5e-4, rtol=5e-4)


def test_batched_controller_closed_loop():
    """Two warm-started MPC steps through the BatchedMpcController on a
    (2, 4) mesh: carries thread, lanes converge, plants advance finite."""
    from mpc_tpu.models.bicycle import pacejka_dynamics
    from mpc_tpu.models.integrators import discretize

    n_horiz, B = 8, 4
    mesh = make_horizon_mesh(n_scenario=2, n_horizon=4,
                             devices=jax.devices()[:8])
    ctrl = build_vehicle_ilqr_controller(
        n_horiz=n_horiz, bound_state_constraints=True, alm_cfg=ALM,
        ilqr_cfg=IlqrConfig(max_iter=15), mesh=mesh)
    cl, y0s, _, _ = _setup(n_horiz, B)
    f_d = discretize(pacejka_dynamics)

    @jax.jit
    def step(ys, carry):
        out = ctrl.step(carry, {"y0": ys, "p": PARAMS, "centerline": cl})
        return jax.vmap(lambda y, u: f_d(y, u, PARAMS))(ys, out.u0), out

    carry = ctrl.init_carry(B)
    ys = y0s
    for _ in range(2):
        ys, out = step(ys, carry)
        carry = out.carry
    assert np.isfinite(np.asarray(ys)).all()
    assert np.asarray(out.result.converged).all()
    assert (np.asarray(carry.tot_it) > 0).all()


@pytest.mark.slow
def test_horizon_sharded_config2_full_horizon():
    """The real config-2 shape (N=40) solved horizon-sharded vs
    single-device."""
    n_horiz, B = 40, 2
    cfg = IlqrConfig(max_iter=25, parallel_backward=True)
    mesh = make_horizon_mesh(n_scenario=1, n_horizon=8,
                             devices=jax.devices()[:8])
    cl, y0s, u0s, lam0s = _setup(n_horiz, B)
    ref = _solve_batched(cl, y0s, u0s, lam0s, n_horiz, cfg)
    got = _solve_batched(cl, y0s, u0s, lam0s, n_horiz, cfg, mesh=mesh)
    np.testing.assert_allclose(np.asarray(got.u), np.asarray(ref.u),
                               atol=5e-3, rtol=5e-3)
    assert np.array_equal(np.asarray(got.converged),
                          np.asarray(ref.converged))
