"""RK4 discretizer: matches the CasADi 'rk' scheme (4 substeps per interval)."""

import jax.numpy as jnp
import numpy as np

from mpc_tpu.models.bicycle import pacejka_dynamics
from mpc_tpu.models.integrators import (DEFAULT_SUBSTEPS, DEFAULT_TS,
                                        discretize, euler_step, rk4_step,
                                        rollout)
from mpc_tpu.models.params import VehicleParams


def test_rk4_exact_on_linear_ode():
    # x' = A x with A = [[0, 1], [-1, 0]] (harmonic oscillator): RK4 with 4
    # substeps over Ts=0.05 should match expm rotation to ~1e-9 relative.
    def f(x, u, p):
        return jnp.stack([x[1], -x[0]])

    f_d = discretize(f, ts=0.05, substeps=4)
    x0 = jnp.array([1.0, 0.0])
    x1 = np.asarray(f_d(x0, jnp.zeros(1), None))
    want = np.array([np.cos(0.05), -np.sin(0.05)])
    np.testing.assert_allclose(x1, want, rtol=1e-7, atol=1e-9)


def test_rk4_fourth_order_convergence():
    # error(h) / error(h/2) ~ 16 for a smooth nonlinear ODE x' = x^2
    def f(x, u, p):
        return x * x

    x0 = jnp.array([0.5], dtype=jnp.float64) if jnp.float64 == jnp.float32 \
        else jnp.array([0.5])
    T = 0.4
    exact = 0.5 / (1 - 0.5 * T)

    errs = []
    for n in (4, 8):
        f_d = discretize(f, ts=T, substeps=n)
        errs.append(abs(float(f_d(x0, None, None)[0]) - exact))
    # float32 floor limits the observed ratio; require clearly > 8
    assert errs[0] / max(errs[1], 1e-12) > 8 or errs[1] < 1e-6


def test_discretize_composition():
    # one interval with 4 substeps == 4 sequential rk4 steps of h = Ts/4
    p = VehicleParams()
    f_d = discretize(pacejka_dynamics, ts=DEFAULT_TS, substeps=DEFAULT_SUBSTEPS)
    x = jnp.array([0, 0, 0.05, 0.6, 0.01, 0.02])
    u = jnp.array([0.4, 0.1])
    manual = x
    for _ in range(4):
        manual = rk4_step(pacejka_dynamics, manual, u, p, DEFAULT_TS / 4)
    np.testing.assert_allclose(np.asarray(f_d(x, u, p)), np.asarray(manual),
                               rtol=1e-6)


def test_rollout_matches_sequential():
    p = VehicleParams()
    f_d = discretize(pacejka_dynamics)
    x0 = jnp.array([0, 0, 0, 0.5, 0, 0])
    us = jnp.array([[1.0, 0.0], [0.8, 0.1], [0.6, -0.1], [1.0, 0.05]])
    xs = np.asarray(rollout(f_d, x0, us, p))
    x = x0
    for k in range(4):
        x = f_d(x, us[k], p)
        np.testing.assert_allclose(xs[k], np.asarray(x), rtol=1e-6)


def test_euler_step():
    def f(x, u, p):
        return -x

    x1 = euler_step(f, jnp.array([1.0]), None, None, 0.1)
    np.testing.assert_allclose(np.asarray(x1), [0.9], rtol=1e-6)
