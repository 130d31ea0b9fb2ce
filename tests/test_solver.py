"""ALM + PANOC solver on problems with known solutions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_tpu.config import AlmConfig, PanocConfig
from mpc_tpu.solver.alm import make_alm_solver
from mpc_tpu.solver.panoc import lbfgs_direction, lbfgs_init, lbfgs_push
from mpc_tpu.solver.problem import Box, Problem


def make_box_qp(n):
    """min 0.5||u - t||^2 s.t. u in [-1,1]^n; solution = clip(t)."""
    def cost(u, t):
        return 0.5 * jnp.sum((u - t) ** 2)
    return Problem(cost=cost, constraints=None,
                   C=Box(-jnp.ones(n), jnp.ones(n)),
                   D=Box.unbounded(0), n=n, m=0)


def test_box_qp_exact():
    prob = make_box_qp(6)
    solve = jax.jit(make_alm_solver(prob, AlmConfig(eps=1e-5),
                                    PanocConfig(lbfgs_memory=5, max_iter=100)))
    t = jnp.array([0.3, -2.0, 5.0, 0.9, -0.1, 1.5])
    res = solve(t, jnp.zeros(6), jnp.zeros(0))
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.u),
                               np.clip(np.asarray(t), -1, 1), atol=1e-4)


def test_rosenbrock_box():
    # min (1-a)^2 + 100(b-a^2)^2 over [-2,2]^2: solution (1, 1)
    def cost(u, _):
        return (1 - u[0]) ** 2 + 100.0 * (u[1] - u[0] ** 2) ** 2

    prob = Problem(cost=cost, constraints=None,
                   C=Box(-2 * jnp.ones(2), 2 * jnp.ones(2)),
                   D=Box.unbounded(0), n=2, m=0)
    solve = jax.jit(make_alm_solver(prob, AlmConfig(eps=1e-5),
                                    PanocConfig(lbfgs_memory=10, max_iter=500)))
    res = solve(None, jnp.array([-1.5, 1.5]), jnp.zeros(0))
    np.testing.assert_allclose(np.asarray(res.u), [1.0, 1.0], atol=2e-3)


def test_inequality_constrained_qp():
    # min (u0-2)^2 + (u1-2)^2 s.t. u0+u1 <= 1 -> u* = (0.5, 0.5), lam* = 3
    def cost(u, _):
        return (u[0] - 2.0) ** 2 + (u[1] - 2.0) ** 2

    def g(u, _):
        return jnp.array([u[0] + u[1]])

    prob = Problem(cost=cost, constraints=g, C=Box.unbounded(2),
                   D=Box(jnp.array([-jnp.inf]), jnp.array([1.0])), n=2, m=1)
    solve = jax.jit(make_alm_solver(prob, AlmConfig(eps=1e-5, delta=1e-5),
                                    PanocConfig(lbfgs_memory=5, max_iter=200)))
    res = solve(None, jnp.zeros(2), jnp.zeros(1))
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.u), [0.5, 0.5], atol=1e-3)
    np.testing.assert_allclose(np.asarray(res.lam), [3.0], atol=5e-2)


def test_equality_constraint_via_degenerate_box():
    # min u0^2 + u1^2 s.t. u0 + u1 = 1 -> u* = (0.5, 0.5), lam* = -1
    def cost(u, _):
        return u[0] ** 2 + u[1] ** 2

    def g(u, _):
        return jnp.array([u[0] + u[1]])

    prob = Problem(cost=cost, constraints=g, C=Box.unbounded(2),
                   D=Box(jnp.array([1.0]), jnp.array([1.0])), n=2, m=1)
    solve = jax.jit(make_alm_solver(prob, AlmConfig(eps=1e-5, delta=1e-5),
                                    PanocConfig(lbfgs_memory=5, max_iter=200)))
    res = solve(None, jnp.zeros(2), jnp.zeros(1))
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.u), [0.5, 0.5], atol=1e-3)
    assert float(res.constraint_violation) < 1e-4


def test_vmapped_batch_of_qps():
    prob = make_box_qp(4)
    solve = make_alm_solver(prob, AlmConfig(eps=1e-5),
                            PanocConfig(lbfgs_memory=4, max_iter=100))
    batch = jax.jit(jax.vmap(lambda t: solve(t, jnp.zeros(4), jnp.zeros(0))))
    ts = jnp.array([[0.5, 2.0, -3.0, 0.1],
                    [-0.5, -2.0, 3.0, -0.1],
                    [0.0, 0.0, 0.0, 0.0],
                    [10.0, -10.0, 0.2, 0.9]])
    res = batch(ts)
    assert np.all(np.asarray(res.converged))
    np.testing.assert_allclose(np.asarray(res.u),
                               np.clip(np.asarray(ts), -1, 1), atol=1e-4)


def test_divergent_lane_does_not_stall_batch():
    # One scenario with a NaN-producing cost: remaining lanes must converge.
    def cost(u, t):
        return 0.5 * jnp.sum((u - t) ** 2) + jnp.where(
            jnp.isnan(t[0]), jnp.nan, 0.0)

    prob = Problem(cost=cost, constraints=None,
                   C=Box(-jnp.ones(2), jnp.ones(2)),
                   D=Box.unbounded(0), n=2, m=0)
    solve = make_alm_solver(prob, AlmConfig(eps=1e-5),
                            PanocConfig(lbfgs_memory=3, max_iter=50))
    batch = jax.jit(jax.vmap(lambda t: solve(t, jnp.zeros(2), jnp.zeros(0))))
    ts = jnp.array([[0.5, 0.5], [jnp.nan, 0.0], [-0.3, 0.8]])
    res = batch(ts)
    ok = np.asarray(res.converged)
    assert ok[0] and ok[2]
    np.testing.assert_allclose(np.asarray(res.u[0]), [0.5, 0.5], atol=1e-4)


def test_lbfgs_two_loop_matches_dense_on_quadratic():
    # On f(x) = 0.5 x'Ax, after collecting (s, y=As) pairs the two-loop
    # recursion must satisfy the secant equations: H y_i = s_i.
    rng = np.random.default_rng(1)
    n, M = 5, 5
    Q = rng.normal(size=(n, n))
    A = Q @ Q.T + n * np.eye(n)
    st = lbfgs_init(M, n)
    pairs = []
    for _ in range(M):
        s = rng.normal(size=n).astype(np.float32)
        y = (A @ s).astype(np.float32)
        st = lbfgs_push(st, jnp.asarray(s), jnp.asarray(y))
        pairs.append((s, y))
    # newest secant pair must be reproduced exactly by the recursion
    s, y = pairs[-1]
    d = np.asarray(lbfgs_direction(st, jnp.asarray(y)))
    np.testing.assert_allclose(d, -s, rtol=2e-3, atol=2e-3)


def test_lbfgs_rejects_bad_curvature():
    st = lbfgs_init(3, 2)
    st2 = lbfgs_push(st, jnp.array([1.0, 0.0]), jnp.array([-1.0, 0.0]))
    assert not bool(st2.valid.any())  # s.y < 0 pair skipped
