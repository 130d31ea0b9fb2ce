"""Closed-loop obstacle avoidance — the behavior BASELINE config #5 names
("road/obstacle scenarios") and the reference only ever visualizes
(dpf_test.py:81-102, never wired into a controller there).

These tests commit what examples/debug_obstacle.py only prints: with the
risk field in the stage cost the vehicle swerves around an obstacle near the
centerline by a margin and continues down the road at speed; without it, the
same closed loop drives straight through the obstacle position.

Scenario note: the obstacle sits 5 cm off the centerline. Exactly ON the
line the field's lateral gradient vanishes by symmetry and braking is the
only descent direction the OCP can see — a measure-zero configuration no
randomized scenario hits.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_tpu.config import AlmConfig, PanocConfig
from mpc_tpu.control.mpc import build_vehicle_controller
from mpc_tpu.models.bicycle import pacejka_dynamics
from mpc_tpu.models.integrators import discretize
from mpc_tpu.models.params import VehicleParams
from mpc_tpu.ops.road import straight_centerline
from mpc_tpu.sim.closedloop import run_closed_loop_jit

PARAMS = VehicleParams()
ALM = AlmConfig(eps=1e-4)
PANOC = PanocConfig(lbfgs_memory=12, max_iter=200)

OBS_X, OBS_Y = 1.0, 0.05
OBSTACLE = jnp.asarray([[OBS_X, OBS_Y, 0.0, 0.0]], jnp.float32)
Y0 = jnp.array([0.0, 0.0, 0.0, 0.5, 0.0, 0.0])
FIELD = {"a_f": 1.0, "sigma_x": 0.2}


def _run(obstacle_weight, n_sim=60):
    ctrl = build_vehicle_controller(
        n_horiz=12, alm_cfg=ALM, panoc_cfg=PANOC,
        obstacle_weight=obstacle_weight,
        obstacle_field_kwargs=FIELD if obstacle_weight > 0 else None)
    f_d = discretize(pacejka_dynamics)
    run = run_closed_loop_jit(ctrl, f_d, n_sim=n_sim)
    static = {"p": PARAMS, "centerline": straight_centerline(100)}
    if obstacle_weight > 0:
        static["obstacles"] = OBSTACLE
    out = run(Y0, static, PARAMS)
    ys = np.asarray(out.ys)
    d = np.sqrt((ys[:, 0] - OBS_X) ** 2 + (ys[:, 1] - OBS_Y) ** 2)
    return float(d.min()), ys, int(out.carry.failures)


@pytest.mark.slow
def test_vehicle_swerves_around_obstacle_and_keeps_progress():
    min_dist, ys, failures = _run(2.0)
    # clears the obstacle by more than the field's lateral scale
    # (sigma_y = 0.1, ops/potential_field.py:obstacle_stage_cost)
    assert min_dist > 0.15, min_dist
    # continues down the road past the obstacle at the reference speed
    assert ys[-1, 0] > 2.0
    assert ys[-1, 3] > 0.8
    # the swerve stays bounded (it does not run off the road; with the
    # reference's mild lateral weights the return to the line is slow —
    # see test_closed_loop_offset_start_recovers)
    assert np.abs(ys[:, 1]).max() < 0.4
    assert failures == 0


@pytest.mark.slow
def test_without_field_vehicle_drives_through_obstacle():
    # the control: with obstacle_weight=0 the tracking cost sends the car
    # straight along the line, within 6 cm of the obstacle — proving the
    # margin above is earned by the field term, not by the road geometry
    min_dist, ys, _ = _run(0.0)
    assert min_dist < 0.06, min_dist
    assert ys[-1, 0] > 2.0


@pytest.mark.slow
def test_suite_with_obstacles_end_to_end():
    # run_scenario_suite with uses_obstacles=True: per-lane obstacle sets
    # flow through the vmapped closed loop (sim/scenarios.py:108-115)
    from mpc_tpu.sim.scenarios import (random_scenarios, run_scenario_suite,
                                       suite_summary)

    ctrl = build_vehicle_controller(
        n_horiz=8, alm_cfg=AlmConfig(eps=1e-3),
        panoc_cfg=PanocConfig(lbfgs_memory=8, max_iter=60),
        obstacle_weight=1.0, obstacle_field_kwargs=FIELD)
    assert ctrl.problem.uses_obstacles
    f_d = discretize(pacejka_dynamics)
    sc = random_scenarios(jax.random.PRNGKey(5), batch=8, size=100)
    out = run_scenario_suite(ctrl, f_d, sc, PARAMS, 10)
    summary = suite_summary(out, sc)
    assert summary["nan_scenarios"] == 0
    assert summary["converged_fraction"] > 0.5
    assert summary["mean_final_speed"] > 0.1
