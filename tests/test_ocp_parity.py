"""Parity gate: our f32 TPU solver vs an independent f64 CPU optimizer.

alpaqa is not installable in this environment, so the closed-loop parity
check (BASELINE.md: trajectory error <= 1e-3 at equal horizon) is grounded by
an *independent* float64 transcription of the exact same OCP (RK4 rollout +
unnormalized road errors + stage cost, all reimplemented in plain numpy in
this file) solved with scipy L-BFGS-B. The reference's plant equals its
prediction model (main.py:145), so equal-OCP equal-solution implies equal
closed loop.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import minimize

from mpc_tpu.config import AlmConfig, PanocConfig
from mpc_tpu.control.mpc import build_vehicle_ocp
from mpc_tpu.models.params import VehicleParams
from mpc_tpu.ops.road import straight_centerline
from mpc_tpu.solver.alm import make_alm_solver

N_HORIZ = 12
TS = 0.05
V_REF = 1.0
WEIGHTS = (0.5, 1.0, 1.0, 0.5, 0.1, 0.01)


# ---- independent float64 transcription of the OCP ------------------------

def np_pacejka(x, u, p: VehicleParams):
    d, dl = u
    phi, vx, vy, w = x[2], x[3], x[4], x[5]
    af = -np.arctan2(w * p.axis_front + vy, vx) + dl
    ar = np.arctan2(w * p.axis_rear - vy, vx)
    frx = (p.cm1 - p.cm2 * vx) * d - p.cr0 * np.sign(vx) - p.cr2 * vx * vx
    ffy = p.df * np.sin(p.cf * np.arctan(p.bf * af))
    fry = p.dr * np.sin(p.cr * np.arctan(p.br * ar))
    return np.array([
        vx * np.cos(phi) - vy * np.sin(phi),
        vx * np.sin(phi) + vy * np.cos(phi),
        w,
        (frx - ffy * np.sin(dl) + p.mass * vy * w) / p.mass,
        (fry + ffy * np.cos(dl) - p.mass * vx * w) / p.mass,
        (ffy * p.axis_front * np.cos(dl) - fry * p.axis_rear) / p.inertia,
    ])


def np_f_d(x, u, p):
    h = TS / 4
    for _ in range(4):
        k1 = np_pacejka(x, u, p)
        k2 = np_pacejka(x + 0.5 * h * k1, u, p)
        k3 = np_pacejka(x + 0.5 * h * k2, u, p)
        k4 = np_pacejka(x + h * k3, u, p)
        x = x + (h / 6) * (k1 + 2 * k2 + 2 * k3 + k4)
    return x


def np_errors(pos, heading, cl):
    d2 = np.sum((cl[:-1] - pos) ** 2, axis=1)
    idx = int(np.argmin(d2))
    near, prev, nxt = cl[idx], cl[max(idx - 1, 0)], cl[idx + 1]
    v = pos - prev
    w = near - prev
    cte = v[0] * w[1] - v[1] * w[0]
    desired = np.arctan2(nxt[1] - near[1], nxt[0] - near[0])
    hdg = np.mod(desired - heading + np.pi, 2 * np.pi) - np.pi
    vn = pos - near
    wn = nxt - near
    pe = vn[0] * wn[1] - vn[1] * wn[0]
    return cte, hdg, pe


def np_cost(u_flat, y0, cl, p):
    us = u_flat.reshape(N_HORIZ, 2)
    x = y0.copy()
    total = 0.0
    c = WEIGHTS
    for k in range(N_HORIZ):
        x = np_f_d(x, us[k], p)
        cte, hdg, pe = np_errors(x[:2], x[2], cl)
        speed = np.sqrt(x[3] ** 2 + x[4] ** 2)
        total += (c[0] * (speed - V_REF) ** 2 + c[1] * cte ** 2
                  + c[2] * pe ** 2 + c[3] * hdg ** 2
                  + c[4] * us[k, 1] ** 2 + c[5] * us[k, 0] ** 2)
    return total


@pytest.mark.slow
@pytest.mark.parametrize("y0", [
    np.array([0.0, 0.0, 0.0, 0.5, 0.0, 0.0]),
    np.array([0.0, 0.15, 0.0, 0.5, 0.0, 0.0]),
    np.array([0.3, -0.05, 0.1, 0.8, 0.0, 0.0]),
])
def test_ocp_solution_matches_f64_reference(y0):
    p = VehicleParams()
    cl64 = np.stack([np.arange(100) / 10 - 0.1, np.zeros(100)], axis=1)

    # independent f64 solve (scipy L-BFGS-B, numerical gradients)
    bounds = [(-1.0, 1.0), (-0.32, 0.32)] * N_HORIZ
    u_init = np.tile([1.0, 0.0], N_HORIZ)
    ref = minimize(np_cost, u_init, args=(y0, cl64, p), method="L-BFGS-B",
                   bounds=bounds, options={"maxiter": 500, "ftol": 1e-14,
                                           "gtol": 1e-9})

    # our solver
    prob = build_vehicle_ocp(n_horiz=N_HORIZ, v_ref=V_REF, ts=TS,
                             weights=WEIGHTS)
    solve = make_alm_solver(prob, AlmConfig(eps=1e-5),
                            PanocConfig(lbfgs_memory=12, max_iter=400))
    param = {"y0": jnp.asarray(y0, jnp.float32), "p": p,
             "centerline": straight_centerline(100)}
    res = solve(param, jnp.asarray(u_init, jnp.float32),
                jnp.zeros(prob.m, jnp.float32))

    ours = np.asarray(res.u, np.float64)
    # cost parity in the f64 ground-truth objective
    cost_ref = np_cost(ref.x, y0, cl64, p)
    cost_ours = np_cost(ours, y0, cl64, p)
    assert cost_ours <= cost_ref + 1e-5, (cost_ours, cost_ref)
    # first-input parity (what actually drives the plant)
    np.testing.assert_allclose(ours[:2], ref.x[:2], atol=5e-3)


# ---- constrained parity gates (the full ALM multiplier path) --------------
#
# The unconstrained gate above grounds the easy OCP; these two ground the
# bounded-D paths the reference exercises: the vehicle OCP with active
# quadratic state constraints (main.py:43-52 with the D bound enabled) and
# the hanging-chain OCP with its cubic floor (alpaqa_example.py:190-212).
# Oracle: f64 scipy SLSQP on an independent transcription.

NC = 6   # short horizon keeps the scipy oracle tractable


def np_cost_nc(u_flat, y0, cl, p, v_ref):
    us = u_flat.reshape(NC, 2)
    x = y0.copy()
    total = 0.0
    c = WEIGHTS
    for k in range(NC):
        x = np_f_d(x, us[k], p)
        cte, hdg, pe = np_errors(x[:2], x[2], cl)
        speed = np.sqrt(x[3] ** 2 + x[4] ** 2)
        total += (c[0] * (speed - v_ref) ** 2 + c[1] * cte ** 2
                  + c[2] * pe ** 2 + c[3] * hdg ** 2
                  + c[4] * us[k, 1] ** 2 + c[5] * us[k, 0] ** 2)
    return total


def np_state_constraints(u_flat, y0, p):
    """Stacked g(u) = x_i^2 - off_i per stage (main.py:43-52), f64."""
    offs = np.array([20.0, 1.0, 1.0, 2.0, 1.0, 0.1])
    us = u_flat.reshape(NC, 2)
    x = y0.copy()
    gs = []
    for k in range(NC):
        x = np_f_d(x, us[k], p)
        gs.append(x ** 2 - offs)
    return np.concatenate(gs)


@pytest.mark.slow
def test_constrained_vehicle_ocp_matches_f64_slsqp():
    # v_ref = 2.0 makes vx want to exceed sqrt(2): the vx^2 <= 2 constraint
    # BINDS, so this exercises real multipliers, not a feasible interior.
    from mpc_tpu.control.mpc import build_vehicle_controller

    p = VehicleParams()
    v_ref = 2.0
    # start just under the speed bound sqrt(2): v_ref=2 pushes the optimum
    # into the vx^2 <= 2 constraint within the short horizon
    y0 = np.array([0.0, 0.0, 0.0, 1.41, 0.0, 0.0])
    cl64 = np.stack([np.arange(100) / 10 - 0.1, np.zeros(100)], axis=1)
    u_init = np.tile([1.0, 0.0], NC)

    ref = minimize(
        np_cost_nc, u_init, args=(y0, cl64, p, v_ref), method="SLSQP",
        bounds=[(-1.0, 1.0), (-0.32, 0.32)] * NC,
        constraints=[{"type": "ineq",
                      "fun": lambda u: -np_state_constraints(u, y0, p)}],
        options={"maxiter": 300, "ftol": 1e-12})
    assert ref.success
    g_ref = np_state_constraints(ref.x, y0, p)
    assert g_ref.max() > -1e-3  # the oracle's constraint actually binds

    ctrl = build_vehicle_controller(
        n_horiz=NC, v_ref=v_ref, bound_state_constraints=True,
        alm_cfg=AlmConfig(eps=1e-4, delta=1e-4, max_iter=12, eps_0=1e-2),
        panoc_cfg=PanocConfig(lbfgs_memory=NC, max_iter=300))
    param = {"y0": jnp.asarray(y0, jnp.float32), "p": p,
             "centerline": straight_centerline(100)}
    res = ctrl.solve(param, jnp.asarray(u_init, jnp.float32),
                     jnp.zeros(ctrl.problem.m, jnp.float32))
    assert bool(res.converged)

    ours = np.asarray(res.u, np.float64)
    # feasible (to ALM delta) and as good as the oracle in the f64 objective
    assert np_state_constraints(ours, y0, p).max() <= 2e-3
    cost_ref = np_cost_nc(ref.x, y0, cl64, p, v_ref)
    cost_ours = np_cost_nc(ours, y0, cl64, p, v_ref)
    assert cost_ours <= cost_ref + 1e-3, (cost_ours, cost_ref)
    np.testing.assert_allclose(ours[:2], ref.x[:2], atol=2e-2)


@pytest.mark.slow
def test_chain_ocp_matches_f64_slsqp():
    from mpc_tpu.control.chain_mpc import (build_chain_ocp,
                                           floor_coefficients, g_constr)
    from mpc_tpu.models.chain import ChainSpec, chain_dynamics
    from mpc_tpu.models.integrators import discretize
    from mpc_tpu.models.params import ChainParams

    spec = ChainSpec(n_balls=6, dim=2)
    cp = ChainParams()
    nh = 4

    # f64 chain dynamics (independent transcription, alpaqa_example.py:44-64)
    def np_chain(y, u):
        n, d = spec.n_balls, spec.dim
        grav = np.array([0.0, -9.81])
        y1 = y[: n * d].reshape(n, d)
        y2 = y[n * d: 2 * n * d].reshape(n, d)
        y3 = y[2 * n * d:]
        f2 = []
        for i in range(n):
            xi = y1[i]
            xip1 = y1[i + 1] if i < n - 1 else y3
            xim1 = y1[i - 1] if i > 0 else np.zeros(d)
            fu = cp.D * (1 - cp.L / np.linalg.norm(xip1 - xi)) * (xip1 - xi)
            fd = cp.D * (1 - cp.L / np.linalg.norm(xi - xim1)) * (xi - xim1)
            f2.append((fu - fd) / cp.m + grav)
        return np.concatenate([y2.ravel(), np.concatenate(f2), u])

    def np_fd(y, u, ts=0.05, sub=4):
        h = ts / sub
        for _ in range(sub):
            k1 = np_chain(y, u)
            k2 = np_chain(y + 0.5 * h * k1, u)
            k3 = np_chain(y + 0.5 * h * k2, u)
            k4 = np_chain(y + h * k3, u)
            y = y + (h / 6) * (k1 + 2 * k2 + 2 * k3 + k4)
        return y

    coeff, lb = floor_coefficients()
    coeff64 = np.asarray(coeff, np.float64)
    x_end = np.array([1.0, 0.0])

    def np_chain_cost(u_flat, y0):
        us = u_flat.reshape(nh, 2)
        y = y0.copy()
        tot = 0.0
        n, d = spec.n_balls, spec.dim
        for k in range(nh):
            y = np_fd(y, us[k])
            tot += (25.0 * np.sum((y[2 * n * d:] - x_end) ** 2)
                    + np.sum(y[n * d: 2 * n * d] ** 2)
                    + 0.01 * np.sum(us[k] ** 2))
        return tot

    def np_chain_g(u_flat, y0):
        """Stacked floor constraints y_ball - g_c(x_ball) - lb >= 0."""
        us = u_flat.reshape(nh, 2)
        y = y0.copy()
        n, d = spec.n_balls, spec.dim
        gs = []
        for k in range(nh):
            y = np_fd(y, us[k])
            y1 = y[: n * d].reshape(n, d)
            gx = (coeff64[0] * y1[:, 0] ** 3 + coeff64[1] * y1[:, 0] ** 2
                  + coeff64[2] * y1[:, 0])
            gs.append(y1[:, 1] - gx - lb)
            gs.append(np.atleast_1d(
                y[-1] - (coeff64[0] * y[2 * n * d] ** 3
                         + coeff64[1] * y[2 * n * d] ** 2
                         + coeff64[2] * y[2 * n * d]) - lb))
        return np.concatenate(gs)

    # disturbed start (the reference's 3 disturbance steps,
    # alpaqa_example.py:158-161) so the floor constraint matters
    y = np.asarray(spec.initial_state(), np.float64)
    for _ in range(3):
        y = np_fd(y, np.array([-0.5, 0.5]))

    u_init = np.zeros(nh * 2)
    ref = minimize(
        np_chain_cost, u_init, args=(y,), method="SLSQP",
        bounds=[(-1.0, 1.0)] * (nh * 2),
        constraints=[{"type": "ineq", "fun": lambda u: np_chain_g(u, y)}],
        options={"maxiter": 300, "ftol": 1e-12})
    assert ref.success

    prob = build_chain_ocp(spec, n_horiz=nh)
    solve = make_alm_solver(
        prob, AlmConfig(eps=1e-4, delta=1e-4, sigma_0=1e5, max_iter=12,
                        eps_0=1e-2),
        PanocConfig(lbfgs_memory=nh * 2, max_iter=300))
    param = {"y0": jnp.asarray(y, jnp.float32), "p": cp,
             "constr": jnp.asarray(coeff)}
    res = solve(param, jnp.zeros(nh * 2, jnp.float32),
                jnp.zeros(prob.m, jnp.float32))
    assert bool(res.converged)

    ours = np.asarray(res.u, np.float64)
    assert np_chain_g(ours, y).min() >= -2e-3          # feasible to delta
    cost_ref = np_chain_cost(ref.x, y)
    cost_ours = np_chain_cost(ours, y)
    assert cost_ours <= cost_ref + max(1e-3, 1e-3 * abs(cost_ref)), \
        (cost_ours, cost_ref)
