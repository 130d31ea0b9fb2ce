"""Road geometry: centerlines, nearest point, error semantics."""

import jax.numpy as jnp
import numpy as np

from mpc_tpu.ops.road import (Road, circle_centerline, compute_errors_diagnostic,
                              compute_errors_ocp, compute_errors_ocp_batched,
                              find_nearest_point, find_nearest_point_ocp,
                              straight_centerline, wrap_to_pi)


def test_wrap_to_pi():
    # matches np.mod(angle + pi, 2 pi) - pi (road.py:22-34)
    for a in (-7.0, -np.pi, 0.0, 1.0, np.pi, 9.0):
        got = float(wrap_to_pi(jnp.asarray(a)))
        want = np.mod(a + np.pi, 2 * np.pi) - np.pi
        assert np.isclose(got, want, atol=1e-6), a


def test_straight_centerline_values():
    cl = np.asarray(straight_centerline(100))
    assert cl.shape == (100, 2)
    # points [i/10 - 0.1, 0] (main.py:13)
    np.testing.assert_allclose(cl[:, 0], np.arange(100) / 10 - 0.1, rtol=1e-6)
    np.testing.assert_allclose(cl[:, 1], 0.0, atol=1e-7)


def test_circle_centerline_values():
    cl = np.asarray(circle_centerline(100))
    theta = np.linspace(0, 2 * np.pi, 100)
    np.testing.assert_allclose(cl[:, 0], 5 * np.cos(theta), atol=1e-5)
    np.testing.assert_allclose(cl[:, 1], 5 * np.sin(theta) + 5, atol=1e-5)


def test_nearest_point_ocp_excludes_last():
    # OCP scan never selects the final centerline point
    # (car_dynamics.py:185 loops range(1, size-1))
    cl = straight_centerline(10)
    pos = jnp.array([100.0, 0.0])  # far beyond the end
    np_ = find_nearest_point_ocp(pos, cl)
    assert int(np_.index) == 8  # size-2, not size-1
    np.testing.assert_allclose(np.asarray(np_.next), np.asarray(cl[9]), rtol=1e-6)


def test_nearest_point_ocp_first_point():
    cl = straight_centerline(10)
    pos = jnp.array([-5.0, 0.0])
    np_ = find_nearest_point_ocp(pos, cl)
    assert int(np_.index) == 0
    # previous clamps to index 0 (car_dynamics.py:182-183)
    np.testing.assert_allclose(np.asarray(np_.previous), np.asarray(cl[0]), rtol=1e-6)


def test_diagnostic_nearest_full_range():
    cl = straight_centerline(10)
    idx, pt = find_nearest_point(jnp.array([100.0, 0.0]), cl)
    assert int(idx) == 9  # diagnostic argmin covers all points (road.py:36-50)


def test_ocp_errors_unnormalized_vs_diagnostic_normalized():
    # A straight road along x with 0.1 spacing: a lateral offset of y gives
    # unnormalized cte = y * segment_len (OCP) vs normalized cte = y (diag).
    cl = straight_centerline(100)
    pos = jnp.array([0.52, 0.3])
    heading = jnp.asarray(0.0)

    e_ocp = compute_errors_ocp(pos, heading, cl)
    e_diag = compute_errors_diagnostic(pos, heading, cl)

    # nearest = (0.5, 0); prev = (0.4, 0); next = (0.6, 0); seg len 0.1
    np.testing.assert_allclose(float(e_ocp.cte), -0.3 * 0.1, atol=1e-5)
    np.testing.assert_allclose(float(e_diag.cte), -0.3, atol=1e-4)
    np.testing.assert_allclose(float(e_ocp.pos_error), -0.3 * 0.1, atol=1e-5)
    np.testing.assert_allclose(float(e_diag.pos_error), -0.3, atol=1e-4)
    # heading of the road is 0; vehicle heading 0 -> no error
    np.testing.assert_allclose(float(e_ocp.heading_error), 0.0, atol=1e-6)


def test_heading_error_wraps():
    cl = straight_centerline(100)
    e = compute_errors_ocp(jnp.array([0.5, 0.0]), jnp.asarray(3 * np.pi), cl)
    # desired 0, heading 3pi == pi -> error wraps to -pi..pi boundary
    assert abs(abs(float(e.heading_error)) - np.pi) < 1e-5


def test_errors_on_circle_match_numpy_golden():
    # independent numpy transcription of the OCP error math
    # (car_dynamics.py:194-228: argmin over 0..size-2, unnormalized crosses)
    cl = np.asarray(circle_centerline(100), np.float64)

    def golden(pos, heading):
        d2 = np.sum((cl[:-1] - pos) ** 2, axis=1)
        idx = int(np.argmin(d2))
        near, prev, nxt = cl[idx], cl[max(idx - 1, 0)], cl[idx + 1]
        v, w = pos - prev, near - prev
        cte = v[0] * w[1] - v[1] * w[0]
        desired = np.arctan2(nxt[1] - near[1], nxt[0] - near[0])
        hdg = np.mod(desired - heading + np.pi, 2 * np.pi) - np.pi
        vn, wn = pos - near, nxt - near
        pe = vn[0] * wn[1] - vn[1] * wn[0]
        return cte, hdg, pe

    clj = circle_centerline(100)
    for pos, heading in [((0.1, 9.9), np.pi), ((4.8, 5.3), np.pi / 2),
                         ((-4.7, 4.6), -np.pi / 2), ((1.0, 0.4), 0.1)]:
        e = compute_errors_ocp(jnp.asarray(pos, jnp.float32),
                               jnp.asarray(heading, jnp.float32), clj)
        cte, hdg, pe = golden(np.asarray(pos), heading)
        np.testing.assert_allclose(float(e.cte), cte, atol=1e-4)
        np.testing.assert_allclose(float(e.heading_error), hdg, atol=1e-4)
        np.testing.assert_allclose(float(e.pos_error), pe, atol=1e-4)


def test_batched_errors():
    cl = straight_centerline(100)
    pos = jnp.array([[0.5, 0.1], [1.0, -0.2], [2.0, 0.0]])
    hdg = jnp.zeros(3)
    errs = compute_errors_ocp_batched(pos, hdg, cl)
    assert errs.cte.shape == (3,)
    single = compute_errors_ocp(pos[1], hdg[1], cl)
    np.testing.assert_allclose(float(errs.cte[1]), float(single.cte), rtol=1e-6)


def test_windowed_errors_match_full():
    from mpc_tpu.ops.road import compute_errors_ocp_windowed
    for cl in (straight_centerline(100), circle_centerline(100)):
        for pos, hdg in [((0.52, 0.3), 0.0), ((3.0, -0.2), 0.4),
                         ((4.8, 5.3), 1.2), ((-4.7, 4.6), -1.0)]:
            pos = jnp.asarray(pos, jnp.float32)
            hdg = jnp.asarray(hdg, jnp.float32)
            full = compute_errors_ocp(pos, hdg, cl)
            idx = find_nearest_point(pos, cl)[0]
            win = compute_errors_ocp_windowed(pos, hdg, cl, idx, 32)
            np.testing.assert_allclose(float(win.cte), float(full.cte),
                                       atol=1e-6)
            np.testing.assert_allclose(float(win.heading_error),
                                       float(full.heading_error), atol=1e-6)
            np.testing.assert_allclose(float(win.pos_error),
                                       float(full.pos_error), atol=1e-6)


def test_road_class_default_circle():
    r = Road()
    assert r.centerline.shape == (100, 2)
    idx, pt = r.find_nearest_point(np.array([5.0, 5.0]))
    assert int(idx) in (0, 99)  # circle closes on itself at angle 0
    errs = r.compute_errors(np.array([4.9, 5.0]), 0.0)
    assert np.isfinite(float(errs.cte))
