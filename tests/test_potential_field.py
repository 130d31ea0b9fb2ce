"""Driving potential field vs scalar oracle (dpf_test.py formulas)."""

import jax
import jax.numpy as jnp
import numpy as np

from mpc_tpu.ops.potential_field import (boundary_potential, field_grid,
                                         lane_potential, obstacle_field,
                                         obstacle_stage_cost, safe_distances,
                                         total_field)


def oracle_dnf(x, y, phi, v, obs, Af=1000.0, b=1, sx=2.0, sy=0.5):
    # scalar transcription of dpf_test.py:81-102
    U = 0.0
    for (ox, oy, ophi, ov) in obs:
        th = phi - ophi
        c, s = np.cos(th), np.sin(th)
        oxr, oyr = c * ox - s * oy, s * ox + c * oy
        xr, yr = c * x - s * y, s * x + c * y
        alpha = (v - ov) / 5.0
        e = ((xr - oxr) ** 2 / (2 * sx ** 2) +
             (yr - oyr) ** 2 / (2 * sy ** 2)) ** b
        U += Af * np.exp(-e) * np.exp(-alpha * (xr - oxr))
    return U


def test_obstacle_field_matches_oracle():
    obs = [(10.0, 1.5, 0.0, 1.0), (4.0, 2.5, 0.3, 3.0)]
    ox, oy, ophi, ov = map(jnp.asarray, zip(*obs))
    for (x, y, phi, v) in [(0.0, 0.0, 0.0, 2.0), (9.0, 1.0, 0.1, 2.0),
                           (10.0, 1.5, 0.0, 0.5)]:
        got = float(obstacle_field(x, y, phi, v, ox, oy, ophi, ov))
        want = oracle_dnf(x, y, phi, v, obs)
        np.testing.assert_allclose(got, want, rtol=2e-4)


def test_obstacle_field_peaks_at_obstacle():
    ox = jnp.asarray([10.0]); oy = jnp.asarray([1.5])
    op = jnp.asarray([0.0]); ov = jnp.asarray([1.0])
    at_obs = float(obstacle_field(10.0, 1.5, 0.0, 1.0, ox, oy, op, ov))
    off = float(obstacle_field(13.0, 1.5, 0.0, 1.0, ox, oy, op, ov))
    assert at_obs > off


def test_lane_and_boundary_potentials():
    assert float(lane_potential(1.75)) == 0.0
    np.testing.assert_allclose(float(lane_potential(2.75)), 0.5, rtol=1e-6)
    assert float(boundary_potential(3.0)) == 0.0           # inside road
    np.testing.assert_allclose(float(boundary_potential(0.5)), 100 * 0.25,
                               rtol=1e-6)                   # below right bound
    np.testing.assert_allclose(float(boundary_potential(7.0)), 100 * 1.0,
                               rtol=1e-6)                   # above left bound


def test_field_grid_shape_and_consistency():
    xs = jnp.linspace(-5.0, 20.0, 26)
    ys = jnp.linspace(-1.0, 8.0, 10)
    ox = jnp.asarray([10.0]); oy = jnp.asarray([1.5])
    op = jnp.asarray([0.0]); ov = jnp.asarray([1.0])
    Z = field_grid(xs, ys, 0.0, 2.0, ox, oy, op, ov)
    assert Z.shape == (10, 26)
    one = float(total_field(float(xs[3]), float(ys[2]), 0.0, 2.0,
                            ox, oy, op, ov))
    np.testing.assert_allclose(float(Z[2, 3]), one, rtol=1e-5)


def test_safe_distances():
    x_s, y_s = safe_distances(jnp.array([0, 0, 5.0, 1.0]),
                              jnp.array([10, 0, 2.0, 0.0]))
    np.testing.assert_allclose(float(x_s), 5 / 2 + 9 / 6, rtol=1e-5)
    np.testing.assert_allclose(float(y_s), 3 / 2 + 1 / 2, rtol=1e-5)


def test_obstacle_cost_is_differentiable():
    ox = jnp.asarray([1.0]); oy = jnp.asarray([0.1])
    op = jnp.asarray([0.0]); ov = jnp.asarray([0.5])
    x = jnp.array([0.0, 0.0, 0.0, 1.0, 0.0, 0.0])
    obs = jnp.stack([ox, oy, op, ov], axis=1)
    g = jax.grad(lambda s: obstacle_stage_cost(s, obs))(x)
    assert np.all(np.isfinite(np.asarray(g)))
    assert abs(float(g[0])) > 0  # moving toward the obstacle changes risk
