"""End-to-end vehicle MPC: closed-loop tracking on straight and curved roads.

The reference's implicit numerical oracle: the plant model equals the
prediction model (main.py:145), so a correct solver tracks the reference
velocity and centerline nearly perfectly. We assert that numerically.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_tpu.config import AlmConfig, PanocConfig
from mpc_tpu.control.mpc import (build_vehicle_controller, build_vehicle_ocp,
                                 input_to_matrix)
from mpc_tpu.models.bicycle import pacejka_dynamics
from mpc_tpu.models.integrators import discretize
from mpc_tpu.models.params import VehicleParams
from mpc_tpu.ops.road import circle_centerline, straight_centerline
from mpc_tpu.sim.closedloop import run_closed_loop_jit

PANOC = PanocConfig(lbfgs_memory=12, max_iter=250)
ALM = AlmConfig(eps=1e-4)  # float32 noise floor; reference default 1e-6 is fp64


@pytest.fixture(scope="module")
def setup():
    params = VehicleParams()
    f_d = discretize(pacejka_dynamics)
    ctrl = build_vehicle_controller(n_horiz=12, alm_cfg=ALM, panoc_cfg=PANOC)
    return params, f_d, ctrl


def test_input_to_matrix_layout():
    # stage-major flat layout, F-order semantics (car_dynamics.py:149-157)
    u = jnp.arange(8.0)
    m = np.asarray(input_to_matrix(u, 2))
    np.testing.assert_allclose(m, [[0, 2, 4, 6], [1, 3, 5, 7]])


def test_single_solve_respects_input_box(setup):
    params, f_d, ctrl = setup
    cl = straight_centerline(100)
    y0 = jnp.array([0.0, 0.0, 0.0, 0.5, 0.0, 0.0])
    carry = ctrl.init_carry()
    out = jax.jit(ctrl.step)(carry, {"y0": y0, "p": params, "centerline": cl})
    U = np.asarray(out.carry.U).reshape(-1, 2)
    assert np.all(U[:, 0] <= 1.0 + 1e-6) and np.all(U[:, 0] >= -1.0 - 1e-6)
    assert np.all(np.abs(U[:, 1]) <= 0.32 + 1e-6)
    assert bool(out.result.converged)


def test_closed_loop_straight_tracking(setup):
    params, f_d, ctrl = setup
    cl = straight_centerline(100)
    y0 = jnp.array([0.0, 0.0, 0.0, 0.5, 0.0, 0.0])
    run = run_closed_loop_jit(ctrl, f_d, n_sim=30)
    out = run(y0, {"p": params, "centerline": cl}, params)
    ys = np.asarray(out.ys)
    # velocity converges to v_ref = 1.0 (main.py:65,112)
    assert abs(ys[-1, 3] - 1.0) < 0.02
    # stays on the centerline
    assert np.abs(ys[:, 1]).max() < 1e-3
    assert int(out.carry.failures) == 0


def test_closed_loop_offset_start_recovers():
    # With the reference's default weights, the unnormalized errors (scaled by
    # the 0.1 m segment length) make lateral correction cost more than it
    # saves — the optimum barely steers (verified against an independent f64
    # optimizer in test_ocp_parity.py). With tracking-dominant weights the
    # controller must pull a 15 cm offset back to the line.
    params = VehicleParams()
    f_d = discretize(pacejka_dynamics)
    from mpc_tpu.control.mpc import MpcController
    from mpc_tpu.solver.alm import make_alm_solver
    problem = build_vehicle_ocp(n_horiz=12, weights=(0.5, 100.0, 100.0, 0.5,
                                                     0.1, 0.01))
    ctrl = MpcController(problem=problem,
                         solve=make_alm_solver(problem, ALM, PANOC),
                         n_horiz=12, input_dim=2, warm_start_input=(1.0, 0.0))
    cl = straight_centerline(100)
    y0 = jnp.array([0.0, 0.15, 0.0, 0.5, 0.0, 0.0])  # 15 cm lateral offset
    run = run_closed_loop_jit(ctrl, f_d, n_sim=40)
    out = run(y0, {"p": params, "centerline": cl}, params)
    ys = np.asarray(out.ys)
    assert abs(ys[-1, 1]) < 0.02          # pulled back to the line
    assert abs(ys[-1, 3] - 1.0) < 0.1     # and near speed


@pytest.mark.slow
def test_closed_loop_circle_tracking(setup):
    params, f_d, _ = setup
    ctrl = build_vehicle_controller(n_horiz=12, alm_cfg=ALM, panoc_cfg=PANOC)
    cl = circle_centerline(100)
    # start on the circle at angle 0, heading +y (CCW direction)
    y0 = jnp.array([5.0, 5.0, float(jnp.pi / 2), 0.5, 0.0, 0.0])
    run = run_closed_loop_jit(ctrl, f_d, n_sim=60)
    out = run(y0, {"p": params, "centerline": cl}, params)
    ys = np.asarray(out.ys)
    radius = np.sqrt(ys[:, 0] ** 2 + (ys[:, 1] - 5.0) ** 2)
    assert np.abs(radius - 5.0).max() < 0.08  # stays on the circle
    assert ys[-1, 3] > 0.8                     # near the reference speed


def test_warm_start_reduces_iterations(setup):
    # The reference's warm-start rationale (controller.py:20-21,57): carrying
    # (U, lam) across steps must cost fewer solver iterations than re-solving
    # cold from the canonical guess every step. Compare the same closed loop
    # warm vs forced-cold.
    params, f_d, ctrl = setup
    cl = straight_centerline(100)
    y0 = jnp.array([0.0, 0.1, 0.25, 0.2, 0.0, 0.0])
    n_sim = 12
    run = run_closed_loop_jit(ctrl, f_d, n_sim=n_sim)
    out = run(y0, {"p": params, "centerline": cl}, params)
    warm_iters = np.asarray(out.inner_iters)

    @jax.jit
    def run_cold(y0):
        def step(y, _):
            o = ctrl.step(ctrl.init_carry(),
                          {"y0": y, "p": params, "centerline": cl})
            return f_d(y, o.u0, params), o.result.inner_iterations
        _, iters = jax.lax.scan(step, y0, None, length=n_sim)
        return iters

    cold_iters = np.asarray(run_cold(y0))
    assert warm_iters.sum() < cold_iters.sum(), (warm_iters, cold_iters)
    assert warm_iters[-1] < 100


def test_batched_closed_loop(setup):
    params, f_d, ctrl = setup
    cl = straight_centerline(100)
    y0s = jnp.array([[0.0, 0.0, 0.0, 0.5, 0.0, 0.0],
                     [0.0, 0.1, 0.0, 0.7, 0.0, 0.0],
                     [0.0, -0.1, 0.05, 0.3, 0.0, 0.0]])
    run = run_closed_loop_jit(ctrl, f_d, n_sim=15)
    vrun = jax.jit(jax.vmap(lambda y: run(y, {"p": params, "centerline": cl},
                                          params)))
    out = vrun(y0s)
    ys = np.asarray(out.ys)
    assert ys.shape == (3, 15, 6)
    # every scenario moves forward and stays near the line
    assert np.all(ys[:, -1, 0] > 0.3)
    assert np.all(np.abs(ys[:, -1, 1]) < 0.12)
