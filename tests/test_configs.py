"""BASELINE.json benchmark configs #1 and #2 as correctness tests.

Config #1: simplified kinematic bicycle, straight road, horizon N=20.
Config #2: dynamic (Pacejka) bicycle on a curved Bezier road, N=40, with
input boxes AND active quadratic state constraints (bounded D — exercises
the full ALM multiplier path on the vehicle problem).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mpc_tpu.config import AlmConfig, PanocConfig
from mpc_tpu.control.mpc import (STATE_CONSTRAINT_OFFSETS,
                                 build_vehicle_controller)
from mpc_tpu.models.bicycle import pacejka_dynamics, simplified_dynamics
from mpc_tpu.models.integrators import discretize
from mpc_tpu.models.params import VehicleParams
from mpc_tpu.ops.bezier import bezier_centerline, lane_change_control_points
from mpc_tpu.ops.road import straight_centerline
from mpc_tpu.sim.closedloop import run_closed_loop_jit

PARAMS = VehicleParams()


def test_config1_kinematic_bicycle_n20():
    ctrl = build_vehicle_controller(
        n_horiz=20, model="simplified", alm_cfg=AlmConfig(eps=1e-4),
        panoc_cfg=PanocConfig(lbfgs_memory=20, max_iter=200))
    assert ctrl.problem.n == 40 and ctrl.problem.m == 0
    f_d = discretize(simplified_dynamics)
    run = run_closed_loop_jit(ctrl, f_d, n_sim=20)
    out = run(jnp.array([0.0, 0.05, 0.0, 0.3]),
              {"p": PARAMS, "centerline": straight_centerline(100)}, PARAMS)
    ys = np.asarray(out.ys)
    assert abs(ys[-1, 3] - 1.0) < 0.02     # reaches v_ref
    assert np.abs(ys[:, 1]).max() < 0.06   # stays near the line
    assert int(out.carry.failures) == 0


@pytest.mark.slow
def test_config2_dynamic_bicycle_bezier_n40_state_constraints():
    pts = lane_change_control_points(5.0).control_points * 0.01
    cl = bezier_centerline(pts, size=100)
    # sigma_0 = 1e3, not the reference's 1e5 (controller.py:42): the penalty
    # scale must fit f32 — at sigma ~ 1e5 the AL evaluation noise exceeds
    # the QUB margin and gamma collapses below the representable criterion
    # floor (see solver/panoc.py, AlmConfig notes).
    ctrl = build_vehicle_controller(
        n_horiz=40, bound_state_constraints=True,
        alm_cfg=AlmConfig(eps=1e-3, delta=1e-3, max_iter=8, eps_0=1e-2,
                          sigma_0=1e3),
        panoc_cfg=PanocConfig(lbfgs_memory=40, max_iter=150))
    assert ctrl.problem.m == 6 * 40
    assert ctrl.problem.D.is_bounded
    f_d = discretize(pacejka_dynamics)
    run = run_closed_loop_jit(ctrl, f_d, n_sim=12)
    d0 = cl[1] - cl[0]
    y0 = jnp.array([float(cl[0, 0]), float(cl[0, 1]),
                    float(jnp.arctan2(d0[1], d0[0])), 0.4, 0.0, 0.0])
    out = run(y0, {"p": PARAMS, "centerline": cl}, PARAMS)
    ys = np.asarray(out.ys)
    # quadratic state constraints y_i^2 <= b_i satisfied along the loop
    offs = np.asarray(STATE_CONSTRAINT_OFFSETS)
    assert (ys ** 2 - offs).max() < 1e-3
    assert int(out.carry.failures) == 0
    assert ys[-1, 3] > 0.4  # making progress along the road
