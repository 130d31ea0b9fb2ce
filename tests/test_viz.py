"""Visualization smoke tests (Agg backend, file outputs)."""

import os

import numpy as np
import pytest

from mpc_tpu.models.params import VehicleParams
from mpc_tpu.viz.plots import (car_corners, plot_closed_loop, plot_results,
                               plot_trajectory, rotate_point)

mpl = pytest.importorskip("matplotlib")


def _traj(n=20):
    t = np.linspace(0, 1, n)
    x = t
    y = 0.1 * np.sin(2 * np.pi * t)
    phi = np.gradient(y, x)
    vx = np.ones(n)
    vy = np.zeros(n)
    om = np.zeros(n)
    u = np.stack([np.ones(n), 0.1 * np.ones(n)])
    return t, x, y, phi, vx, vy, om, u


def test_rotate_point_identity():
    assert rotate_point(1.0, 2.0, 0.0, 0.0, 0.0) == [1.0, 2.0]
    p = rotate_point(1.0, 0.0, 0.0, 0.0, np.pi / 2)
    np.testing.assert_allclose(p, [0.0, 1.0], atol=1e-12)


def test_car_corners_closed_box():
    c = car_corners(VehicleParams(), 0.0, 0.0, 0.3)
    assert c.shape == (5, 2)
    np.testing.assert_allclose(c[0], c[4])


def test_plot_results_saves(tmp_path):
    t, x, y, phi, vx, vy, om, u = _traj()
    p = os.path.join(tmp_path, "results.png")
    assert plot_results(t, x, y, phi, vx, vy, om, u, "test", p) == p
    assert os.path.getsize(p) > 0


def test_plot_trajectory_saves(tmp_path):
    t, x, y, phi, vx, vy, om, u = _traj()
    p = os.path.join(tmp_path, "traj.png")
    assert plot_trajectory(x, y, phi, u, "test", p) == p
    assert os.path.getsize(p) > 0


def test_plot_closed_loop_saves(tmp_path):
    cl = np.stack([np.arange(10) / 10, np.zeros(10)], axis=1)
    ys = np.stack([np.arange(10) / 10, 0.01 * np.ones(10)], axis=1)
    p = os.path.join(tmp_path, "cl.png")
    assert plot_closed_loop(cl, ys, save_path=p) == p
    assert os.path.getsize(p) > 0
