"""Two-car game-theoretic MPC — decision layer driving the control layer.

BASELINE.json config #4: "Two-car game-theoretic MPC: iterated best-response
Nash solve, batched over scenario pairs". The reference contains only the
one-shot payoff comparison for a single ego (game_theory.py:352-395) and
never couples it to a controller; here each step of the closed loop:

1. evaluates both cars' lane payoffs against the other's *current* lane and
   iterates best response to a (pure-strategy) fixed point — vectorized over
   a batch of scenario pairs;
2. maps each car's chosen lane to a target centerline (its lane's line);
3. runs the warm-started batched MPC solve for every car toward its target;
4. advances both plants one step.

Everything is one compiled program: `lax.scan` over time, `vmap` over
scenario pairs, the decision fixed-point as a short `lax.scan` of
best-response rounds.

Geometry: a straight two-lane road along +x; lane centers y=0 (lane 1) and
y=LANE_OFFSET (lane 2). The decision layer's road-scale gaps (meters) map
onto the RC-car world through DECISION_SCALE.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mpc_tpu.control.mpc import MpcController
from mpc_tpu.decision.game_theory import Cars, Ego, lane_payoffs
from mpc_tpu.ops.road import straight_centerline

LANE_OFFSET = 0.35        # lane-2 lateral offset in the RC world (meters)
DECISION_SCALE = 50.0     # decision-layer meters per RC-world meter


class TwoCarState(NamedTuple):
    y_a: jnp.ndarray       # (6,) car A plant state
    y_b: jnp.ndarray       # (6,) car B plant state
    lane_a: jnp.ndarray    # int32 current lane of A
    lane_b: jnp.ndarray
    carry_a: object        # MpcCarry of A
    carry_b: object


class TwoCarOut(NamedTuple):
    ys_a: jnp.ndarray      # (n_sim, 6)
    ys_b: jnp.ndarray
    lanes_a: jnp.ndarray   # (n_sim,)
    lanes_b: jnp.ndarray
    state: TwoCarState


def _lane_centerline(size: int = 100):
    base = straight_centerline(size)
    lane2 = base.at[:, 1].add(LANE_OFFSET)
    return jnp.stack([base, lane2])    # (2, size, 2)


def _best_response_pair(y_a, y_b, lane_a, lane_b, n_rounds: int = 3):
    """Iterated best response between the two cars (decision-layer units)."""
    def to_dec(y):
        # decision layer works in road-scale longitudinal coordinates
        return y[0] * DECISION_SCALE, jnp.maximum(
            jnp.sqrt(y[3] ** 2 + y[4] ** 2) * DECISION_SCALE, 1e-3)

    xa, va = to_dec(y_a)
    xb, vb = to_dec(y_b)

    def one_round(lanes, _):
        la, lb = lanes

        def respond(x, v, lane, ox, ov, olane):
            ego = Ego(x=x, v=v, lane=lane)
            others = Cars(x=ox[None], v=ov[None], lane=olane[None],
                          mask=jnp.ones((1,), bool))
            p = lane_payoffs(ego, others)
            return jnp.where(p[1] > p[0], 2, 1).astype(jnp.int32)

        la2 = respond(xa, va, la, xb, vb, lb)
        lb2 = respond(xb, vb, lb, xa, va, la)
        return (la2, lb2), None

    (la, lb), _ = jax.lax.scan(one_round, (lane_a, lane_b), None,
                               length=n_rounds)
    return la, lb


def make_two_car_game(controller: MpcController, f_d, params,
                      n_sim: int, size: int = 100, n_rounds: int = 3):
    """Build a jitted two-car closed loop ``run(y0_a, y0_b) -> TwoCarOut``.

    vmap the returned function over leading axes of (y0_a, y0_b) for batched
    scenario pairs.
    """
    lanes_cl = _lane_centerline(size)

    def run(y0_a, y0_b, lane_a0=1, lane_b0=2):
        carry = controller.init_carry(y0_a.dtype)
        st0 = TwoCarState(
            y_a=y0_a, y_b=y0_b,
            lane_a=jnp.asarray(lane_a0, jnp.int32),
            lane_b=jnp.asarray(lane_b0, jnp.int32),
            carry_a=carry, carry_b=carry)

        def step(st: TwoCarState, _):
            la, lb = _best_response_pair(st.y_a, st.y_b, st.lane_a, st.lane_b,
                                         n_rounds)
            cl_a = lanes_cl[la - 1]
            cl_b = lanes_cl[lb - 1]

            out_a = controller.step(st.carry_a,
                                    {"y0": st.y_a, "p": params,
                                     "centerline": cl_a})
            out_b = controller.step(st.carry_b,
                                    {"y0": st.y_b, "p": params,
                                     "centerline": cl_b})
            ya = f_d(st.y_a, out_a.u0, params)
            yb = f_d(st.y_b, out_b.u0, params)
            st2 = TwoCarState(ya, yb, la, lb, out_a.carry, out_b.carry)
            return st2, (ya, yb, la, lb)

        st, (ys_a, ys_b, lanes_a, lanes_b) = jax.lax.scan(
            step, st0, None, length=n_sim)
        return TwoCarOut(ys_a, ys_b, lanes_a, lanes_b, st)

    return run
