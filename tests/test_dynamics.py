"""Bicycle dynamics golden tests.

Golden values are computed with an independent plain-numpy transcription of
the reference ODE formulas (dynamics.py:101-117, dynamics.py:164-172) inside
the tests — the JAX implementations must agree to float32 tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mpc_tpu.models.bicycle import (clip_inputs, pacejka_dynamics,
                                    pacejka_dynamics_batched,
                                    simplified_dynamics)
from mpc_tpu.models.params import VehicleParams


def numpy_pacejka(x, u, p: VehicleParams):
    d, dl = u
    phi, vx, vy, w = x[2], x[3], x[4], x[5]
    lf, lr, m, iz = p.axis_front, p.axis_rear, p.mass, p.inertia
    af = -np.arctan2(w * lf + vy, vx) + dl
    ar = np.arctan2(w * lr - vy, vx)
    frx = (p.cm1 - p.cm2 * vx) * d - p.cr0 * np.sign(vx) - p.cr2 * vx * vx
    ffy = p.df * np.sin(p.cf * np.arctan(p.bf * af))
    fry = p.dr * np.sin(p.cr * np.arctan(p.br * ar))
    return np.array([
        vx * np.cos(phi) - vy * np.sin(phi),
        vx * np.sin(phi) + vy * np.cos(phi),
        w,
        (frx - ffy * np.sin(dl) + m * vy * w) / m,
        (fry + ffy * np.cos(dl) - m * vx * w) / m,
        (ffy * lf * np.cos(dl) - fry * lr) / iz,
    ])


def numpy_simplified(x, u, p: VehicleParams):
    d, dl = u
    phi, v = x[2], x[3]
    lf, lr = p.axis_front, p.axis_rear
    beta = np.arctan2(lf * np.tan(dl), lf + lr)
    return np.array([
        v * np.cos(phi + beta),
        v * np.sin(phi + beta),
        v * np.sin(beta) / lr,
        p.acceleration * d - p.friction * v,
    ])


def test_pacejka_matches_reference_formulas(rng):
    p = VehicleParams()
    for _ in range(20):
        x = rng.uniform(-1, 1, size=6).astype(np.float32)
        x[3] = rng.uniform(0.1, 2.0)  # forward speed
        u = rng.uniform([-1, -0.32], [1, 0.32]).astype(np.float32)
        got = np.asarray(pacejka_dynamics(jnp.asarray(x), jnp.asarray(u), p))
        want = numpy_pacejka(x, u, p)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_pacejka_negative_speed_sign():
    # cr0 * sign(vx) flips with reversing (dynamics.py:89, car_dynamics.py:103)
    p = VehicleParams()
    x = np.array([0, 0, 0, -0.5, 0, 0], np.float32)
    u = np.array([0.0, 0.0], np.float32)
    got = np.asarray(pacejka_dynamics(jnp.asarray(x), jnp.asarray(u), p))
    want = numpy_pacejka(x, u, p)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    assert got[3] > 0  # rolling resistance decelerates backward motion


def test_simplified_matches_reference_formulas(rng):
    p = VehicleParams()
    for _ in range(20):
        x = rng.uniform(-1, 1, size=4).astype(np.float32)
        u = rng.uniform([-1, -0.32], [1, 0.32]).astype(np.float32)
        got = np.asarray(simplified_dynamics(jnp.asarray(x), jnp.asarray(u), p))
        want = numpy_simplified(x, u, p)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_clip_inputs():
    p = VehicleParams()
    u = jnp.array([2.0, -1.0])
    np.testing.assert_allclose(np.asarray(clip_inputs(u, p)), [1.0, -0.32],
                               rtol=1e-6)
    # clip=True matches the numpy plant model's internal clipping
    x = jnp.array([0, 0, 0, 0.5, 0, 0], jnp.float32)
    a = pacejka_dynamics(x, u, p, clip=True)
    b = pacejka_dynamics(x, clip_inputs(u, p), p)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_batched_dynamics_matches_loop(rng):
    p = VehicleParams()
    xs = rng.uniform(-1, 1, size=(8, 6)).astype(np.float32)
    xs[:, 3] = np.abs(xs[:, 3]) + 0.1
    us = rng.uniform(-0.3, 0.3, size=(8, 2)).astype(np.float32)
    batched = np.asarray(pacejka_dynamics_batched(jnp.asarray(xs), jnp.asarray(us), p))
    for i in range(8):
        single = np.asarray(pacejka_dynamics(jnp.asarray(xs[i]), jnp.asarray(us[i]), p))
        np.testing.assert_allclose(batched[i], single, rtol=1e-6)


def test_dynamics_is_differentiable():
    p = VehicleParams()
    x = jnp.array([0, 0, 0.1, 0.5, 0.01, 0.05])
    u = jnp.array([0.5, 0.1])
    J = jax.jacfwd(pacejka_dynamics, argnums=0)(x, u, p)
    assert J.shape == (6, 6)
    assert np.all(np.isfinite(np.asarray(J)))
