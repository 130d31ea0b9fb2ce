"""Two-car game-theoretic MPC closed loop (config #4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_tpu.config import AlmConfig, PanocConfig
from mpc_tpu.control.mpc import build_vehicle_controller
from mpc_tpu.models.bicycle import pacejka_dynamics
from mpc_tpu.models.integrators import discretize
from mpc_tpu.models.params import VehicleParams
from mpc_tpu.sim.two_car import (LANE_OFFSET, TwoCarOut, _best_response_pair,
                                 make_two_car_game)

PARAMS = VehicleParams()


def make_runner(n_sim):
    ctrl = build_vehicle_controller(
        n_horiz=8, alm_cfg=AlmConfig(eps=1e-3),
        panoc_cfg=PanocConfig(lbfgs_memory=8, max_iter=80),
        weights=(0.5, 100.0, 100.0, 0.5, 0.1, 0.01))
    f_d = discretize(pacejka_dynamics)
    return make_two_car_game(ctrl, f_d, PARAMS, n_sim=n_sim)


def test_best_response_slow_leader_triggers_lane_change():
    # A fast car close behind a much slower car in the same lane prefers the
    # free lane; the slow leader stays.
    y_fast = jnp.array([0.0, 0.0, 0.0, 1.0, 0.0, 0.0])
    y_slow = jnp.array([0.12, 0.0, 0.0, 0.1, 0.0, 0.0])
    la, lb = _best_response_pair(y_fast, y_slow,
                                 jnp.asarray(1, jnp.int32),
                                 jnp.asarray(1, jnp.int32))
    assert int(la) == 2    # overtaking via lane 2
    assert int(lb) == 1


def test_best_response_occupied_target_lane_no_change():
    # equal speeds, other car slightly ahead in lane 2: changing into the
    # occupied lane scores a banded safety payoff < staying free in lane 1
    y_a = jnp.array([0.0, 0.0, 0.0, 0.5, 0.0, 0.0])
    y_b = jnp.array([0.1, LANE_OFFSET, 0.0, 0.5, 0.0, 0.0])
    la, lb = _best_response_pair(y_a, y_b, jnp.asarray(1, jnp.int32),
                                 jnp.asarray(2, jnp.int32))
    assert int(la) == 1     # A stays in its free lane
    assert int(lb) == 2     # B keeps its lane


@pytest.mark.slow
def test_two_car_closed_loop_overtake():
    runner = make_runner(n_sim=25)
    run = jax.jit(lambda a, b: runner(a, b, 1, 1))
    # fast car A behind slow car B, both lane 1
    y0_a = jnp.array([0.0, 0.0, 0.0, 1.0, 0.0, 0.0])
    y0_b = jnp.array([0.15, 0.0, 0.0, 0.15, 0.0, 0.0])
    out = run(y0_a, y0_b)
    lanes_a = np.asarray(out.lanes_a)
    ys_a = np.asarray(out.ys_a)
    assert (lanes_a == 2).any()                 # A decides to change lane
    assert ys_a[-1, 1] > 0.05                   # and physically moves toward lane 2
    assert np.isfinite(ys_a).all()


def test_batched_scenario_pairs():
    run = jax.jit(jax.vmap(make_runner(n_sim=6)))
    B = 4
    rng = np.random.default_rng(0)
    y0a = np.zeros((B, 6), np.float32)
    y0a[:, 3] = rng.uniform(0.5, 1.0, B)
    y0b = np.zeros((B, 6), np.float32)
    y0b[:, 0] = rng.uniform(0.1, 0.4, B)
    y0b[:, 3] = rng.uniform(0.1, 0.3, B)
    out = run(jnp.asarray(y0a), jnp.asarray(y0b))
    assert out.ys_a.shape == (B, 6, 6)
    assert out.lanes_a.shape == (B, 6)
    assert np.isfinite(np.asarray(out.ys_a)).all()
