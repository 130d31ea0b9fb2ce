"""Simple baseline controllers (the reference's scipy path, re-built)."""

import jax.numpy as jnp
import numpy as np

from mpc_tpu.control.simple import (simple_mpc, simple_mpc_initial,
                                    straight_line_controller)
from mpc_tpu.models.bicycle import pacejka_dynamics, simplified_dynamics
from mpc_tpu.models.params import VehicleParams
from mpc_tpu.ops.road import straight_centerline

PARAMS = VehicleParams()


def pacejka(x, u, t):
    return pacejka_dynamics(x, u, PARAMS, clip=True)


def simplified(x, u, t):
    return simplified_dynamics(x, u, PARAMS, clip=True)


def test_simple_mpc_accelerates_toward_target():
    cl = straight_centerline(100)
    x0 = jnp.array([0.0, 0.0, 0.0, 0.3, 0.0, 0.0])
    res = simple_mpc(pacejka, x0, cl, n_horiz=4, dt=0.1, target_velocity=1.0)
    assert float(res.u0[0]) > 0.1       # drive forward to speed up
    assert np.isfinite(float(res.cost))


def test_simple_mpc_steers_toward_line():
    cl = straight_centerline(100)
    x0 = jnp.array([0.0, 0.3, 0.0, 0.5, 0.0, 0.0])  # offset left
    res = simple_mpc(pacejka, x0, cl, n_horiz=4, dt=0.1)
    assert float(res.u0[1]) < 0.0       # steer right (negative) to the line


def test_simple_mpc_initial_reaches_target():
    # simplified model state [x, y, phi, v]; drive to standstill at a point
    x0 = jnp.array([0.0, 0.0, 0.0, 0.0])
    target = jnp.array([0.2, 0.0, 0.0, 0.0])
    res = simple_mpc_initial(simplified, x0, target, n_horiz=3, dt=0.1,
                             iters=300)
    # rollout with found inputs moves toward target x
    x = np.asarray(x0, np.float64)
    for u in np.asarray(res.u_seq):
        x = x + np.asarray(simplified(jnp.asarray(x, jnp.float32),
                                      jnp.asarray(u), None)) * 0.1
    assert abs(x[0] - 0.2) < abs(0.0 - 0.2)


def test_straight_line_controller():
    cl = straight_centerline(100)
    out = straight_line_controller(jnp.array([0.5, 0.1, 0.0, 0.5, 0.0, 0.0]),
                                   cl)
    np.testing.assert_allclose(np.asarray(out.u), [1.0, 0.0])
    assert int(out.nearest_index) == 6   # x=0.5 -> point [0.5, 0]
    assert abs(float(out.errors.cte)) > 0
