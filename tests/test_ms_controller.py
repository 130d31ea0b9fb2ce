"""Multiple-shooting MPC controller: closed-loop parity with the
single-shooting controller (the horizon-parallel path of SURVEY.md §5's
long-context row, wired into a real controller — the reference only
single-shoots, main.py:34-40)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mpc_tpu.config import AlmConfig, PanocConfig
from mpc_tpu.control.mpc import (build_vehicle_controller,
                                 build_vehicle_ms_controller)
from mpc_tpu.models.bicycle import pacejka_dynamics
from mpc_tpu.models.integrators import discretize
from mpc_tpu.models.params import VehicleParams
from mpc_tpu.ops.road import straight_centerline
from mpc_tpu.sim.closedloop import run_closed_loop_jit

PARAMS = VehicleParams()


def test_ms_controller_carry_shapes():
    ctrl, lo = build_vehicle_ms_controller(n_horiz=12, n_segments=4)
    carry = ctrl.init_carry()
    assert carry.U.shape == (ctrl.problem.n,)
    assert ctrl.problem.n == 2 * 12 + 6 * 3
    assert carry.lam.shape == (ctrl.problem.m,)


@pytest.mark.slow
def test_ms_controller_closed_loop_matches_single_shooting():
    ctrl_ms, lo = build_vehicle_ms_controller(
        n_horiz=12, n_segments=4,
        alm_cfg=AlmConfig(eps=1e-4, delta=1e-4, max_iter=10, eps_0=1e-2,
                          penalty_factor=5.0),
        panoc_cfg=PanocConfig(lbfgs_memory=16, max_iter=250))
    ctrl_ss = build_vehicle_controller(
        n_horiz=12, alm_cfg=AlmConfig(eps=1e-4),
        panoc_cfg=PanocConfig(lbfgs_memory=12, max_iter=250))
    f_d = discretize(pacejka_dynamics)
    cl = straight_centerline(100)
    y0 = jnp.array([0.0, 0.05, 0.0, 0.5, 0.0, 0.0])
    n_sim = 20

    out_ms = run_closed_loop_jit(ctrl_ms, f_d, n_sim=n_sim)(
        y0, {"p": PARAMS, "centerline": cl}, PARAMS)
    out_ss = run_closed_loop_jit(ctrl_ss, f_d, n_sim=n_sim)(
        y0, {"p": PARAMS, "centerline": cl}, PARAMS)

    ys_ms, ys_ss = np.asarray(out_ms.ys), np.asarray(out_ss.ys)
    # same closed-loop behavior: reaches v_ref, tracks the line, and the
    # trajectories agree (different decompositions of the same OCP)
    assert abs(ys_ms[-1, 3] - 1.0) < 0.03
    np.testing.assert_allclose(ys_ms, ys_ss, atol=2e-2)
    # the defect equalities hold at every accepted plan
    assert float(np.asarray(out_ms.converged).mean()) > 0.9
