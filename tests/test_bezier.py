"""Quintic Bezier lane-change paths vs direct Bernstein evaluation."""

import math

import jax.numpy as jnp
import numpy as np

from mpc_tpu.ops.bezier import (bezier_centerline, bezier_curve,
                                lane_change_control_points, lane_change_family)


def direct_bezier(t, P):
    # independent scalar transcription of the reference evaluator
    # (bezier_curves.py:19-25)
    x = y = 0.0
    for i in range(6):
        c = math.factorial(5) / (math.factorial(i) * math.factorial(5 - i))
        x += c * (1 - t) ** (5 - i) * t ** i * P[0, i]
        y += c * (1 - t) ** (5 - i) * t ** i * P[1, i]
    return x, y


def direct_control_points(i):
    # reference geometry (bezier_curves.py:28-48) with its module constants
    h, W, theta = 3.75, 1.8, 3.2 / 180 * np.pi
    l, Lf, v0, v1, D1 = 3, 1, 20, 10, 50
    Li = Lf + l
    Di = Li * np.cos(np.arctan2(W, 2 * Lf) - theta)
    tc1 = D1 / (v0 - v1)
    Px2 = Px3 = v0 * tc1 - Di
    Px5 = 2 * Px2
    Px1 = Px2 / i
    Px4 = Px5 - (Px5 - Px3) / i
    Px = np.array([0, Px1, Px2, Px3, Px4, Px5])
    Py = np.array([0, 0, 0, h, h, h])
    return np.array([Px, Py]), Px2 / (v0 - v1)


def test_control_points_match_reference_geometry():
    for i in (1, 3, 5, 10):
        got = lane_change_control_points(float(i))
        want_P, want_tca = direct_control_points(i)
        np.testing.assert_allclose(np.asarray(got.control_points), want_P,
                                   rtol=1e-5)
        np.testing.assert_allclose(float(got.tca), want_tca, rtol=1e-5)


def test_curve_matches_direct_evaluation():
    P, _ = direct_control_points(5)
    ts = np.linspace(0, 1, 17)
    curve = np.asarray(bezier_curve(jnp.asarray(ts, jnp.float32),
                                    jnp.asarray(P, jnp.float32)))
    for k, t in enumerate(ts):
        x, y = direct_bezier(t, P)
        # float32 on coordinates ~80 with t^5 terms: ~1e-3 relative floor
        np.testing.assert_allclose(curve[k], [x, y], rtol=2e-3, atol=2e-3)


def test_curve_endpoints_interpolate():
    P, _ = direct_control_points(2)
    curve = np.asarray(bezier_curve(jnp.array([0.0, 1.0]),
                                    jnp.asarray(P, jnp.float32)))
    np.testing.assert_allclose(curve[0], P[:, 0], atol=1e-5)
    np.testing.assert_allclose(curve[1], P[:, 5], atol=1e-4)


def test_family_shapes():
    curves, tca = lane_change_family(n=10, num_samples=50)
    assert curves.shape == (10, 50, 2)
    assert tca.shape == (10,)
    # lane change ends at lane offset h for every member
    np.testing.assert_allclose(np.asarray(curves[:, -1, 1]), 3.75, atol=1e-4)


def test_bezier_centerline_usable_as_road():
    P, _ = direct_control_points(5)
    cl = bezier_centerline(jnp.asarray(P, jnp.float32), size=100)
    assert cl.shape == (100, 2)
    assert float(cl[0, 1]) < 1e-5 and abs(float(cl[-1, 1]) - 3.75) < 1e-3
