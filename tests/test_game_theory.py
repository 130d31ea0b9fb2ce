"""Game-theoretic lane-change payoffs vs a scalar python oracle.

The oracle below is an independent scalar transcription of the reference's
payoff logic (game_theory.py:115-244) used only as a test fixture; the
framework code under test is fully vectorized/masked.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mpc_tpu.decision.game_theory import (Cars, Ego, decision_rollout,
                                          iterated_best_response,
                                          lane_payoffs, lane_payoffs_batched,
                                          safety_payoff, scenario_1,
                                          scenario_2, scenario_3,
                                          velocity_payoff)

# scalar oracle constants (reference Car defaults, game_theory.py:23-56)
L, W, l, th = 4.2, 1.8, 3.0, 3.2 / 180 * np.pi
tlc, td, ti, tau, amax, q1, q2 = 5.17, 1.2, 0.15, 0.9, 7.0, 0.65, 0.35


class OCar:
    def __init__(self, x, v, lane):
        self.x, self.v, self.lane = x, v, lane


def o_safety_distance(ego, car, target):
    if ego.lane == car.lane:
        if ego.x > car.x:
            return abs(ego.x - car.x)
        if target == ego.lane:
            return (q1 * ego.v + td +
                    q2 * ((ego.v - car.v) * tau + ti / 2 +
                          (ego.v - car.v) ** 2 / (2 * amax)) + l)
        if ego.v > car.v:
            return ego.v - car.v * tlc / 2 + L + W / 2 * np.sin(th)
        return q1 * ego.v * td + l
    if ego.x < car.x:
        if ego.v > car.v:
            return (ego.v - car.v * tlc / 2 + L - W / 2 * np.sin(th) +
                    q1 * ego.v * td +
                    q2 * ((ego.v - car.v) * tau + ti / 2 +
                          (ego.v - car.v) ** 2 / (2 * amax)))
        return q1 * ego.v * td + l
    if ego.v < car.v:
        return ((car.v - ego.v) * 3 / 4 * tlc + L + q1 * car.v * td +
                q2 * ((car.v - ego.v) * tau + ti / 2 +
                      (car.v - ego.v) ** 2 / (2 * amax)))
    return q1 * car.v * td + l


def o_safety_payoff(ego, cars, target):
    payoff, t = 1.0, 1.0
    for car in cars:
        if ego.lane != car.lane and ego.lane == target:
            continue
        Sk = o_safety_distance(ego, car, target)
        Dk = abs(ego.x - car.x)
        if Dk >= abs(Sk):
            t = 1.0
        if Dk <= l:
            t = -1.0
        if l < Dk < abs(Sk):
            t = np.log(Dk / Sk + 1) / np.log(2)
        payoff = min(payoff, t)
    return payoff


def o_front(ego, cars, target):
    best = None
    for car in cars:
        if car.lane == target and car.x > ego.x:
            if best is None or car.x < best.x:
                best = car
    return best


def o_velocity_payoff(ego, cars, target):
    f = o_front(ego, cars, target)
    if f is None:
        return 1.0
    if f.v == 0:
        return -1.0
    if f.v >= 2 * ego.v:
        return 1.0
    return (f.v - ego.v) / ego.v


def o_total(ego, cars, target, a=0.6, b=0.4):
    total = a * o_safety_payoff(ego, cars, target) + \
        b * o_velocity_payoff(ego, cars, target)
    behind = None
    for car in cars:
        if car.lane == 2 and car.x < ego.x:
            if behind is None or car.x > behind.x:
                behind = car
    if behind is not None:
        others = [c for c in cars if c is not behind]
        if target == 2:
            others = others + [OCar(ego.x, ego.v, 2)]
        total += a * o_safety_payoff(behind, others, 2) + \
            b * o_velocity_payoff(behind, others, 2)
    return total


FIXTURES = {
    1: ([50.0, 10.0, -20.0, -30.0], scenario_1),
    2: ([50.0, 10.0, -8.0, -25.0], scenario_2),
    3: ([50.0, 10.0, -8.0, -18.0], scenario_3),
}


@pytest.mark.parametrize("fix", [1, 2, 3])
def test_payoffs_match_oracle_over_rollout(fix):
    xs, builder = FIXTURES[fix]
    ego, cars = builder()

    payoffs, change = decision_rollout(ego, cars, n_steps=50, dt=0.1)
    payoffs = np.asarray(payoffs)

    # oracle rollout
    oe = OCar(0.0, 10.0, 1)
    ocars = [OCar(x, v, ln) for x, v, ln in
             zip(xs, [0.0, 15.0, 15.0, 15.0], [1, 2, 2, 2])]
    for k in range(50):
        p1 = o_total(oe, ocars, 1)
        p2 = o_total(oe, ocars, 2)
        np.testing.assert_allclose(payoffs[k, 0], p1, atol=2e-4,
                                   err_msg=f"step {k} lane1")
        np.testing.assert_allclose(payoffs[k, 1], p2, atol=2e-4,
                                   err_msg=f"step {k} lane2")
        assert bool(change[k]) == (p2 > p1)
        oe.x += oe.v * 0.1
        for c in ocars:
            c.x += c.v * 0.1


def test_scenarios_eventually_decide_change():
    # in every fixture the ego approaches a stopped car in lane 1; the
    # decision layer must eventually prefer lane 2
    for builder in (scenario_1, scenario_2, scenario_3):
        ego, cars = builder()
        _, change = decision_rollout(ego, cars, n_steps=50, dt=0.1)
        assert bool(np.asarray(change).any()), builder.__name__


def test_batched_payoffs_match_single():
    e1, c1 = scenario_1()
    e2, c2 = scenario_2()
    egos = Ego(x=jnp.stack([e1.x, e2.x]), v=jnp.stack([e1.v, e2.v]),
               lane=jnp.stack([e1.lane, e2.lane]))
    cars = Cars(x=jnp.stack([c1.x, c2.x]), v=jnp.stack([c1.v, c2.v]),
                lane=jnp.stack([c1.lane, c2.lane]),
                mask=jnp.stack([c1.mask, c2.mask]))
    batched = np.asarray(lane_payoffs_batched(egos, cars))
    np.testing.assert_allclose(batched[0], np.asarray(lane_payoffs(e1, c1)),
                               rtol=1e-6)
    np.testing.assert_allclose(batched[1], np.asarray(lane_payoffs(e2, c2)),
                               rtol=1e-6)


def test_mask_excludes_inactive_cars():
    ego, cars = scenario_1()
    # deactivate everything: free road -> payoff 1 (safety) + 1 (velocity)
    empty = cars._replace(mask=jnp.zeros_like(cars.mask))
    p = np.asarray(lane_payoffs(ego, empty))
    np.testing.assert_allclose(p, [1.0, 1.0], atol=1e-6)


def test_iterated_best_response_fixed_point():
    # two agents approaching slower traffic reach a stable lane assignment
    e1, c1 = scenario_1()
    e2, c2 = scenario_3()
    egos = Ego(x=jnp.stack([e1.x, e2.x]), v=jnp.stack([e1.v, e2.v]),
               lane=jnp.stack([e1.lane, e2.lane]))
    cars = Cars(x=jnp.stack([c1.x, c2.x]), v=jnp.stack([c1.v, c2.v]),
                lane=jnp.stack([c1.lane, c2.lane]),
                mask=jnp.stack([c1.mask, c2.mask]))
    lanes, hist = iterated_best_response(egos, cars, n_rounds=4)
    hist = np.asarray(hist)
    assert lanes.shape == (2,)
    # converged: last two rounds identical
    np.testing.assert_array_equal(hist[-1], hist[-2])
