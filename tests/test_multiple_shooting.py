"""Multiple-shooting OCP: defect feasibility + solution parity with single
shooting on the vehicle problem."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_tpu.config import AlmConfig, PanocConfig
from mpc_tpu.control.mpc import build_vehicle_ocp
from mpc_tpu.models.bicycle import pacejka_dynamics
from mpc_tpu.models.integrators import discretize
from mpc_tpu.models.params import VehicleParams
from mpc_tpu.ops.costs import vehicle_stage_cost
from mpc_tpu.ops.road import straight_centerline
from mpc_tpu.solver.alm import make_alm_solver
from mpc_tpu.solver.multiple_shooting import (build_ms_ocp_problem,
                                              ms_warm_start, pack_decision,
                                              unpack_decision)
from mpc_tpu.solver.problem import Box

PARAMS = VehicleParams()
N = 12
M = 4


def make_ms_problem():
    f_d = discretize(pacejka_dynamics)

    def stage_cost(x, u, param):
        return vehicle_stage_cost(x, u, param["centerline"], 1.0)

    C_in = Box(jnp.tile(jnp.array([-1.0, -0.32], jnp.float32), N),
               jnp.tile(jnp.array([1.0, 0.32], jnp.float32), N))
    return build_ms_ocp_problem(f_d, stage_cost, N, M, 6, 2, C_in), f_d


def test_layout_and_pack_roundtrip():
    (prob, lo), _ = make_ms_problem()
    assert lo.seg_len == 3
    assert prob.n == 2 * N + 6 * (M - 1)
    assert prob.m == 6 * (M - 1)
    us = jnp.arange(2.0 * N).reshape(N, 2)
    xs = jnp.ones((M - 1, 6))
    z = pack_decision(us, xs)
    us2, xs2 = unpack_decision(z, lo)
    np.testing.assert_array_equal(np.asarray(us), np.asarray(us2))
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(xs2))


def test_warm_start_has_zero_defects():
    (prob, lo), f_d = make_ms_problem()
    y0 = jnp.array([0.0, 0.0, 0.0, 0.5, 0.0, 0.0])
    us = jnp.tile(jnp.array([1.0, 0.0]), N)
    z = ms_warm_start(f_d, lo, y0, us, PARAMS)
    param = {"y0": y0, "p": PARAMS, "centerline": straight_centerline(100)}
    g = prob.constraints(z, param)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-6)


def test_ms_cost_matches_single_shooting_at_feasible_points():
    (prob, lo), f_d = make_ms_problem()
    ss = build_vehicle_ocp(n_horiz=N)
    y0 = jnp.array([0.0, 0.05, 0.0, 0.6, 0.0, 0.0])
    param = {"y0": y0, "p": PARAMS, "centerline": straight_centerline(100)}
    rng = np.random.default_rng(0)
    for _ in range(3):
        us = jnp.asarray(rng.uniform([-1, -0.3], [1, 0.3],
                                     (N, 2)).astype(np.float32))
        z = ms_warm_start(f_d, lo, y0, us, PARAMS)
        c_ms = float(prob.cost(z, param))
        c_ss = float(ss.cost(us.reshape(-1), param))
        np.testing.assert_allclose(c_ms, c_ss, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_ms_solve_matches_single_shooting_solution():
    # Equality (defect) constraints want a gentle penalty schedule in f32:
    # a large Sigma_0 makes the augmented Lagrangian so stiff the inner
    # solver diverges (measured: Sigma_0=1e5 -> psi ~ 1e10).
    (prob, lo), f_d = make_ms_problem()
    solve_ms = jax.jit(make_alm_solver(
        prob, AlmConfig(eps=1e-4, delta=1e-5, max_iter=15, eps_0=1e-3,
                        sigma_0=10.0, penalty_factor=5.0),
        PanocConfig(lbfgs_memory=2 * N, max_iter=300)))

    ss = build_vehicle_ocp(n_horiz=N)
    solve_ss = jax.jit(make_alm_solver(
        ss, AlmConfig(eps=1e-5), PanocConfig(lbfgs_memory=N, max_iter=300)))

    y0 = jnp.array([0.0, 0.05, 0.0, 0.5, 0.0, 0.0])
    param = {"y0": y0, "p": PARAMS, "centerline": straight_centerline(100)}
    us0 = jnp.tile(jnp.array([1.0, 0.0], jnp.float32), N)

    z0 = ms_warm_start(f_d, lo, y0, us0, PARAMS)
    res_ms = solve_ms(param, z0, jnp.zeros(prob.m, jnp.float32))
    res_ss = solve_ss(param, us0, jnp.zeros(0, jnp.float32))

    # defects closed to tolerance and near-optimal in the single-shooting
    # objective (evaluate the MS input sequence through the true dynamics)
    assert float(res_ms.constraint_violation) < 1e-4
    us_ms, _ = unpack_decision(res_ms.u, lo)
    c_from_ms = float(ss.cost(us_ms.reshape(-1), param))
    c_ss = float(res_ss.psi)
    assert c_from_ms <= c_ss + 5e-3, (c_from_ms, c_ss)
