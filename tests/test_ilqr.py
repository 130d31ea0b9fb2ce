"""AL-iLQR solver (solver/ilqr.py) vs the PANOC+ALM path on the vehicle OCP.

Both solvers minimize the same OCP (build_ocp_problem's cost/constraints),
so their solutions must agree on cost and closed-loop behavior — the
parity gate for the second solver family. The reference only ever solves
through alpaqa's flat-NLP view (controller.py:27-48); structure-exploiting
iLQR has no reference counterpart, so the oracle is our own PANOC path
(itself gated against f64 SLSQP in test_ocp_parity.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_tpu.config import AlmConfig, PanocConfig
from mpc_tpu.control.mpc import (build_vehicle_controller,
                                 build_vehicle_ilqr_controller)
from mpc_tpu.models.bicycle import pacejka_dynamics, simplified_dynamics
from mpc_tpu.models.integrators import discretize
from mpc_tpu.models.params import VehicleParams
from mpc_tpu.ops.road import straight_centerline
from mpc_tpu.sim.closedloop import run_closed_loop_jit

PARAMS = VehicleParams()


def test_ilqr_matches_panoc_unconstrained():
    # simplified model, N=8: both solvers minimize the identical cost; the
    # achieved objective values must agree tightly.
    cl = straight_centerline(100)
    y0 = jnp.array([0.0, 0.05, 0.1, 0.4], jnp.float32)
    param = {"y0": y0, "p": PARAMS, "centerline": cl}

    ctrl_i = build_vehicle_ilqr_controller(n_horiz=8, model="simplified")
    ctrl_p = build_vehicle_controller(
        n_horiz=8, model="simplified", alm_cfg=AlmConfig(eps=1e-5),
        panoc_cfg=PanocConfig(lbfgs_memory=8, max_iter=400))

    out_i = jax.jit(ctrl_i.step)(ctrl_i.init_carry(), param)
    out_p = jax.jit(ctrl_p.step)(ctrl_p.init_carry(), param)
    assert bool(out_i.result.converged)
    c_i = float(ctrl_p.problem.cost(out_i.carry.U, param))
    c_p = float(ctrl_p.problem.cost(out_p.carry.U, param))
    assert c_i <= c_p * 1.01 + 1e-6, (c_i, c_p)
    # input box respected (clamped rollout)
    U = np.asarray(out_i.carry.U).reshape(-1, 2)
    assert np.all(np.abs(U[:, 0]) <= 1.0 + 1e-6)
    assert np.all(np.abs(U[:, 1]) <= 0.32 + 1e-6)


def test_al_ilqr_constrained_satisfies_constraints():
    # Pacejka N=10 with the bounded quadratic state constraints
    # (main.py:43-52 with D active): AL-iLQR must converge with violation
    # below delta and not cost more than PANOC's ALM solution.
    cl = straight_centerline(100)
    y0 = jnp.array([0.0, 0.0, 0.0, 0.5, 0.0, 0.0], jnp.float32)
    param = {"y0": y0, "p": PARAMS, "centerline": cl}
    alm = AlmConfig(eps=1e-4, delta=1e-4)

    ctrl_i = build_vehicle_ilqr_controller(
        n_horiz=10, bound_state_constraints=True, alm_cfg=alm)
    ctrl_p = build_vehicle_controller(
        n_horiz=10, bound_state_constraints=True, alm_cfg=alm,
        panoc_cfg=PanocConfig(lbfgs_memory=10, max_iter=300))

    out_i = jax.jit(ctrl_i.step)(ctrl_i.init_carry(), param)
    out_p = jax.jit(ctrl_p.step)(ctrl_p.init_carry(), param)
    assert bool(out_i.result.converged)
    assert float(out_i.result.constraint_violation) <= 1e-4 + 1e-6
    g = np.asarray(ctrl_i.problem.constraints(out_i.carry.U, param))
    assert g.max() <= 2e-4
    c_i = float(ctrl_p.problem.cost(out_i.carry.U, param))
    c_p = float(ctrl_p.problem.cost(out_p.carry.U, param))
    assert c_i <= c_p * 1.05 + 1e-6, (c_i, c_p)


def test_ilqr_closed_loop_tracks():
    f_d = discretize(simplified_dynamics)
    ctrl = build_vehicle_ilqr_controller(n_horiz=8, model="simplified")
    cl = straight_centerline(100)
    y0 = jnp.array([0.0, 0.0, 0.0, 0.5], jnp.float32)
    run = run_closed_loop_jit(ctrl, f_d, n_sim=25)
    out = run(y0, {"p": PARAMS, "centerline": cl}, PARAMS)
    ys = np.asarray(out.ys)
    assert abs(ys[-1, 3] - 1.0) < 0.03     # v -> v_ref
    assert np.abs(ys[:, 1]).max() < 1e-2   # stays on the line
    assert int(out.carry.failures) == 0


def test_ilqr_vmaps_over_batch():
    ctrl = build_vehicle_ilqr_controller(n_horiz=6, model="simplified")
    cl = straight_centerline(100)
    y0s = jnp.array([[0.0, 0.0, 0.0, 0.5],
                     [0.0, 0.05, 0.1, 0.3],
                     [0.0, -0.05, -0.1, 0.8]], jnp.float32)

    step = jax.jit(jax.vmap(
        lambda y: ctrl.step(ctrl.init_carry(),
                            {"y0": y, "p": PARAMS, "centerline": cl})))
    out = step(y0s)
    assert out.carry.U.shape == (3, 12)
    assert bool(out.result.converged.all())


def test_stage_residuals_identity():
    # Gauss-Newton contract: vehicle_stage_cost == sum(residuals**2)
    from mpc_tpu.ops.costs import (vehicle_stage_cost,
                                   vehicle_stage_residuals)
    cl = straight_centerline(100)
    rng = np.random.default_rng(3)
    for _ in range(5):
        x = jnp.asarray(rng.normal(0, 0.5, 6).astype(np.float32))
        u = jnp.asarray(rng.normal(0, 0.3, 2).astype(np.float32))
        c = float(vehicle_stage_cost(x, u, cl, 1.0))
        r = np.asarray(vehicle_stage_residuals(x, u, cl, 1.0))
        np.testing.assert_allclose(c, float((r ** 2).sum()), rtol=1e-5)


def test_gauss_newton_matches_full_hessian():
    # GN and full-Hessian backward passes must reach the same optimum
    # (same cost to solver tolerance), constrained case included.
    from mpc_tpu.solver.ilqr import IlqrConfig
    cl = straight_centerline(100)
    y0 = jnp.array([0.0, 0.03, 0.05, 0.4, 0.0, 0.0], jnp.float32)
    param = {"y0": y0, "p": PARAMS, "centerline": cl}
    costs = []
    for gn in (True, False):
        ctrl = build_vehicle_ilqr_controller(
            n_horiz=8, bound_state_constraints=True,
            ilqr_cfg=IlqrConfig(gauss_newton=gn))
        out = jax.jit(ctrl.step)(ctrl.init_carry(), param)
        assert bool(out.result.converged), f"gauss_newton={gn}"
        costs.append(float(ctrl.problem.cost(out.carry.U, param)))
    assert abs(costs[0] - costs[1]) <= 0.02 * abs(costs[1]) + 1e-6, costs


def test_ilqr_convergence_gated_on_regularization():
    # ADVICE r3: a lane at large reg sees gnorm ~ 1/reg and vanishing
    # steps, so without the reg gate it could claim convergence at a
    # non-stationary point. With an absurd tol_grad the gnorm exit would
    # fire immediately; the gate forces reg to first decay below
    # reg_conv_max (reg_init=100 needs >= 7 halvings to reach 1).
    from mpc_tpu.solver.ilqr import IlqrConfig
    cfg = IlqrConfig(reg_init=100.0, reg_conv_max=1.0, tol_grad=1e10,
                     trace=True)
    ctrl = build_vehicle_ilqr_controller(n_horiz=6, model="simplified",
                                         ilqr_cfg=cfg)
    cl = straight_centerline(100)
    y0 = jnp.array([0.0, 0.05, 0.1, 0.4], jnp.float32)
    out = jax.jit(ctrl.step)(ctrl.init_carry(),
                             {"y0": y0, "p": PARAMS, "centerline": cl})
    res = out.result
    assert bool(res.converged)
    k = int(res.inner_iterations)
    assert k >= 7, k
    reg = np.asarray(res.inner_trace.reg)
    assert reg[k - 1] <= cfg.reg_conv_max + 1e-6, reg[:k]


def test_ilqr_rejects_per_stage_bounds():
    # ADVICE r3: the iLQR family folds stage 0's box into every stage;
    # per-stage bounds must be a build-time error, not silent mis-clamping.
    from mpc_tpu.solver.ilqr import make_ilqr_solver
    from mpc_tpu.solver.problem import Box
    n, m = 4, 2
    lo = -jnp.arange(1.0, n * m + 1).reshape(-1)   # varies per stage
    box = Box(lower=lo, upper=-lo)
    with pytest.raises(ValueError, match="stage-uniform"):
        make_ilqr_solver(lambda x, u, p: x, lambda x, u, p: 0.0,
                         n_horiz=n, state_dim=4, input_dim=m, u_box=box)


def test_ilqr_sequential_backward_agrees():
    # parallel_backward=True (associative-scan Riccati) and False
    # (sequential Riccati) must produce the same solution.
    from mpc_tpu.solver.ilqr import IlqrConfig
    cl = straight_centerline(100)
    y0 = jnp.array([0.0, 0.05, 0.0, 0.4], jnp.float32)
    param = {"y0": y0, "p": PARAMS, "centerline": cl}
    us = []
    for par in (True, False):
        ctrl = build_vehicle_ilqr_controller(
            n_horiz=8, model="simplified",
            ilqr_cfg=IlqrConfig(parallel_backward=par))
        out = jax.jit(ctrl.step)(ctrl.init_carry(), param)
        us.append(np.asarray(out.carry.U))
    np.testing.assert_allclose(us[0], us[1], atol=2e-3)
