"""Bicycle vehicle models as pure JAX functions.

One traced implementation replaces the reference's duplicated numeric/symbolic
worlds (reference: dynamics.py:45-173 numpy vs car_dynamics.py:9-147 CasADi —
identical ODEs written twice). Here a single ``f(x, u, p) -> dx/dt`` serves
simulation, MPC rollout, and autodiff, and is vmap-able over a leading
scenario batch axis.

State/input conventions (reference: dynamics.py:71-72):
- Pacejka dynamic single-track model: state ``[x, y, phi, vx, vy, omega]``,
  input ``[d, delta]`` (drive command, steering angle).
- Simplified kinematic bicycle: state ``[x, y, phi, v]``, input ``[d, delta]``.

Parity notes:
- The reference's *numeric* model clips inputs inside the ODE
  (dynamics.py:57-65,99) while the *symbolic* model used by the OCP does not
  (car_dynamics.py:93-129 — limits enter only through the solver's input box).
  We expose ``clip_inputs`` separately; ``pacejka_dynamics`` itself does not
  clip, matching the OCP-side semantics. Pass ``clip=True`` for parity with
  the numpy plant model.
- ``cr0 * sign(vx)`` rolling resistance matches car_dynamics.py:103.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mpc_tpu.models.params import VehicleParams

PACEJKA_STATE_DIM = 6
SIMPLIFIED_STATE_DIM = 4
INPUT_DIM = 2


def clip_inputs(u: jnp.ndarray, p: VehicleParams) -> jnp.ndarray:
    """Clip ``[d, delta]`` to the box limits (reference: dynamics.py:57-65)."""
    lo = jnp.stack([-jnp.asarray(p.max_drive), -jnp.asarray(p.max_steer)])
    hi = jnp.stack([jnp.asarray(p.max_drive), jnp.asarray(p.max_steer)])
    return jnp.clip(u, lo, hi)


def pacejka_dynamics(x: jnp.ndarray, u: jnp.ndarray, p: VehicleParams,
                     clip: bool = False) -> jnp.ndarray:
    """Dynamic single-track model with Pacejka lateral tire forces.

    Continuous-time ODE matching reference dynamics.py:101-117 /
    car_dynamics.py:113-129:

      af  = -atan2(w*lf + vy, vx) + delta
      ar  =  atan2(w*lr - vy, vx)
      frx = (cm1 - cm2*vx)*d - cr0*sign(vx) - cr2*vx^2
      ffy = df*sin(cf*atan(bf*af));  fry = dr*sin(cr*atan(br*ar))
    """
    if clip:
        u = clip_inputs(u, p)
    d, delta = u[0], u[1]
    phi, vx, vy, omega = x[2], x[3], x[4], x[5]

    lf, lr = p.axis_front, p.axis_rear
    m, iz = p.mass, p.inertia

    af = -jnp.arctan2(omega * lf + vy, vx) + delta
    ar = jnp.arctan2(omega * lr - vy, vx)

    frx = (p.cm1 - p.cm2 * vx) * d - p.cr0 * jnp.sign(vx) - p.cr2 * vx * vx
    ffy = p.df * jnp.sin(p.cf * jnp.arctan(p.bf * af))
    fry = p.dr * jnp.sin(p.cr * jnp.arctan(p.br * ar))

    cos_phi, sin_phi = jnp.cos(phi), jnp.sin(phi)
    cos_d, sin_d = jnp.cos(delta), jnp.sin(delta)

    return jnp.stack([
        vx * cos_phi - vy * sin_phi,
        vx * sin_phi + vy * cos_phi,
        omega,
        (frx - ffy * sin_d + m * vy * omega) / m,
        (fry + ffy * cos_d - m * vx * omega) / m,
        (ffy * lf * cos_d - fry * lr) / iz,
    ])


def simplified_dynamics(x: jnp.ndarray, u: jnp.ndarray, p: VehicleParams,
                        clip: bool = False) -> jnp.ndarray:
    """Simplified kinematic bicycle (reference: dynamics.py:144-173).

    State ``[x, y, phi, v]``; slip ``beta = atan2(lf*tan(delta), lf+lr)``;
    ``v' = a*d - mu*v``.
    """
    if clip:
        u = clip_inputs(u, p)
    d, delta = u[0], u[1]
    phi, v = x[2], x[3]

    lf, lr = p.axis_front, p.axis_rear
    a, mu = p.acceleration, p.friction

    beta = jnp.arctan2(lf * jnp.tan(delta), lf + lr)
    return jnp.stack([
        v * jnp.cos(phi + beta),
        v * jnp.sin(phi + beta),
        v * jnp.sin(beta) / lr,
        a * d - mu * v,
    ])


# Batched variants: leading scenario axis on x and u, shared params.
pacejka_dynamics_batched = jax.vmap(pacejka_dynamics, in_axes=(0, 0, None))
simplified_dynamics_batched = jax.vmap(simplified_dynamics, in_axes=(0, 0, None))
