"""Hanging-chain model + MPC (the second workload; bounded-D ALM path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_tpu.config import AlmConfig, PanocConfig
from mpc_tpu.control.chain_mpc import (build_chain_controller, build_chain_ocp,
                                       floor_coefficients, g_constr)
from mpc_tpu.models.chain import ChainSpec, chain_dynamics, chain_state_to_pos
from mpc_tpu.models.integrators import discretize, rollout
from mpc_tpu.models.params import ChainParams
from mpc_tpu.sim.closedloop import run_closed_loop_jit

SPEC = ChainSpec(n_balls=6, dim=2)
PARAMS = ChainParams()


def numpy_chain_dynamics(y, u, p):
    """Independent transcription of the spring ODE
    (alpaqa_example.py:44-64)."""
    n, d = SPEC.n_balls, SPEC.dim
    g = np.array([0.0, -9.81])
    y1 = y[: n * d].reshape(n, d)
    y2 = y[n * d: 2 * n * d].reshape(n, d)
    y3 = y[2 * n * d:]
    f2 = []
    for i in range(n):
        xi = y1[i]
        xip1 = y1[i + 1] if i < n - 1 else y3
        xim1 = y1[i - 1] if i > 0 else np.zeros(d)
        F_up = p.D * (1 - p.L / np.linalg.norm(xip1 - xi)) * (xip1 - xi)
        F_dn = p.D * (1 - p.L / np.linalg.norm(xi - xim1)) * (xi - xim1)
        f2.append((F_up - F_dn) / p.m + g)
    return np.concatenate([y2.ravel(), np.concatenate(f2), u])


def test_chain_dynamics_matches_reference_formulas():
    f = chain_dynamics(SPEC)
    y0 = np.asarray(SPEC.initial_state())
    u = np.array([0.1, -0.2], np.float32)
    got = np.asarray(f(jnp.asarray(y0), jnp.asarray(u), PARAMS))
    want = numpy_chain_dynamics(y0.astype(np.float64), u, PARAMS)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_initial_state_layout():
    y0 = np.asarray(SPEC.initial_state())
    assert y0.shape == (26,)
    # ball x positions spread 1/7 .. 6/7 (alpaqa_example.py:117-119)
    np.testing.assert_allclose(y0[0:12:2], np.arange(1, 7) / 7, rtol=1e-6)
    assert y0[-2] == 1.0 and y0[-1] == 0.0  # free end at e1


def test_state_to_pos():
    x, y, z = chain_state_to_pos(SPEC, SPEC.initial_state())
    assert x.shape == (8,)  # anchor + 6 balls + free end
    assert float(x[0]) == 0.0 and float(x[-1]) == 1.0


def test_floor_coefficients_roundtrip():
    coeff, lb = floor_coefficients()
    # g_c(x) + lb must equal c(x-a)^3 + d(x-a) + b
    a, b, c, d = 0.6, -1.4, 5.0, 2.2
    for x in (-0.2, 0.0, 0.6, 1.1):
        direct = c * (x - a) ** 3 + d * (x - a) + b
        np.testing.assert_allclose(float(g_constr(coeff, x)) + lb, direct,
                                   rtol=1e-5, atol=1e-5)


def test_uncontrolled_chain_falls():
    # without control the chain sags under gravity (alpaqa_example.py:163-167)
    f_d = discretize(chain_dynamics(SPEC))
    y0 = SPEC.initial_state()
    us = jnp.zeros((40, 2))
    ys = np.asarray(rollout(f_d, y0, us, PARAMS))
    # the chain oscillates; somewhere along the trajectory it sags deeply
    assert ys[:, 1:12:2].min() < -0.5


@pytest.mark.slow
def test_chain_mpc_closed_loop_respects_floor():
    ctrl = build_chain_controller(
        SPEC, n_horiz=12,
        panoc_cfg=PanocConfig(lbfgs_memory=12, max_iter=150))
    f_d = discretize(chain_dynamics(SPEC))

    # disturb for 3 steps as the reference does (alpaqa_example.py:158-161)
    y = SPEC.initial_state()
    u_dist = jnp.array([-0.5, 0.5])
    for _ in range(3):
        y = f_d(y, u_dist, PARAMS)

    coeff, lb = floor_coefficients()
    run = run_closed_loop_jit(ctrl, f_d, n_sim=60)
    out = run(y, {"p": PARAMS, "constr": coeff}, PARAMS)
    ys = np.asarray(out.ys)

    # inputs respect the box
    us = np.asarray(out.us)
    assert np.all(np.abs(us) <= 1.0 + 1e-5)

    # floor violations controlled within ALM tolerance after settling
    n, d = SPEC.n_balls, SPEC.dim
    y1 = ys[10:, : n * d].reshape(-1, n, d)
    gx = np.asarray(jax.vmap(lambda x: g_constr(coeff, x))(
        jnp.asarray(y1[..., 0].ravel()))).reshape(y1.shape[0], n)
    viol = (gx + lb) - y1[..., 1]
    assert viol.max() < 0.05

    # the swinging chain is brought near the reference free-end position e1
    # (the uncontrolled chain stays ~1.8 below the anchor line, see
    # test_uncontrolled_chain_falls); transients decay over the loop
    dist = np.linalg.norm(ys[:, -2:] - np.array([1.0, 0.0]), axis=1)
    assert dist[-1] < 0.35
    # warm-started steady-state solves converge (early transient may cap out,
    # mirroring the reference's failure counter, alpaqa_example.py:284)
    assert np.asarray(out.converged)[-10:].all()
