"""Event-triggered MPC: trigger semantics, compute saving, tracking quality.

The reference's event_triggered.py is a non-functional sketch (calling
get_states with 4 of 5 args, event_triggered.py:35) — behavior here is the
standard ETC-MPC designed in SURVEY.md 2.15.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_tpu.config import AlmConfig, PanocConfig
from mpc_tpu.control.event_triggered import EventTriggeredController
from mpc_tpu.control.mpc import build_vehicle_controller
from mpc_tpu.models.bicycle import pacejka_dynamics
from mpc_tpu.models.integrators import discretize
from mpc_tpu.models.params import VehicleParams
from mpc_tpu.ops.road import straight_centerline

PANOC = PanocConfig(lbfgs_memory=12, max_iter=200)
ALM = AlmConfig(eps=1e-4)


def make_etc(threshold):
    base = build_vehicle_controller(n_horiz=12, alm_cfg=ALM, panoc_cfg=PANOC)
    f_d = discretize(pacejka_dynamics)
    return EventTriggeredController(base=base, f_d=f_d, threshold=threshold,
                                    eps=1e-4), f_d


def run_loop(etc, f_d, y0, n_sim, disturbance=0.0, seed=0):
    params = VehicleParams()
    cl = straight_centerline(100)
    key = jax.random.PRNGKey(seed)

    @jax.jit
    def run(y0, key):
        carry = etc.init_carry()

        def step(sc, k):
            y, carry = sc
            out = etc.step(carry, {"y0": y, "p": params, "centerline": cl})
            y_next = f_d(y, out.u0, params)
            noise = disturbance * jax.random.normal(
                jax.random.fold_in(key, k), (6,))
            y_next = y_next + noise
            return (y_next, out.carry), (y_next, out.triggered)

        (_, carry), (ys, trig) = jax.lax.scan(
            step, (y0, carry), jnp.arange(n_sim))
        return ys, trig, carry

    return run(y0, key)


def test_zero_threshold_always_resolves():
    etc, f_d = make_etc(threshold=0.0)
    y0 = jnp.array([0.0, 0.0, 0.0, 0.5, 0.0, 0.0])
    ys, trig, carry = run_loop(etc, f_d, y0, 10)
    assert np.asarray(trig).all()
    assert int(carry.tot_solves) == 10


def test_perfect_model_rarely_triggers():
    # plant == model (main.py:145) -> prediction error ~ float noise only;
    # the sequence is replayed until it expires (every n_horiz steps).
    etc, f_d = make_etc(threshold=1e-2)
    y0 = jnp.array([0.0, 0.0, 0.0, 0.5, 0.0, 0.0])
    n_sim = 24
    ys, trig, carry = run_loop(etc, f_d, y0, n_sim)
    n_solves = int(carry.tot_solves)
    assert n_solves <= 1 + n_sim // 12 + 1   # expiry-driven only
    # and the open-loop replay still tracks (same model)
    assert np.abs(np.asarray(ys)[:, 1]).max() < 1e-2


def test_disturbance_forces_triggers():
    etc, f_d = make_etc(threshold=5e-3)
    y0 = jnp.array([0.0, 0.0, 0.0, 0.5, 0.0, 0.0])
    ys, trig, carry = run_loop(etc, f_d, y0, 20, disturbance=5e-3)
    n_solves = int(carry.tot_solves)
    assert n_solves > 3            # disturbances exceed the threshold
    assert np.isfinite(np.asarray(ys)).all()


def test_etc_matches_standard_mpc_with_zero_threshold():
    etc, f_d = make_etc(threshold=0.0)
    params = VehicleParams()
    cl = straight_centerline(100)
    y0 = jnp.array([0.0, 0.05, 0.0, 0.5, 0.0, 0.0])

    ys_etc, _, _ = run_loop(etc, f_d, y0, 8)

    from mpc_tpu.sim.closedloop import run_closed_loop_jit
    base = build_vehicle_controller(n_horiz=12, alm_cfg=ALM, panoc_cfg=PANOC)
    run = run_closed_loop_jit(base, f_d, n_sim=8)
    out = run(y0, {"p": params, "centerline": cl}, params)

    np.testing.assert_allclose(np.asarray(ys_etc), np.asarray(out.ys),
                               atol=2e-3)


def test_etc_ilqr_untriggered_lanes_cost_zero_iterations():
    # VERDICT r3 task 6: the AL-iLQR family must honor the tol=+inf lane
    # skip sentinel so either solver family drops into ETC with the compute
    # saving intact. Perfect model + threshold -> untriggered steps must
    # record ZERO solver iterations and leave the stored plan unchanged.
    from mpc_tpu.control.mpc import build_vehicle_ilqr_controller
    from mpc_tpu.solver.ilqr import IlqrConfig

    base = build_vehicle_ilqr_controller(
        n_horiz=8, bound_state_constraints=True,
        alm_cfg=AlmConfig(delta=1e-3, max_iter=8, sigma_0=1e3,
                          penalty_factor=5.0),
        ilqr_cfg=IlqrConfig(max_iter=25))
    f_d = discretize(pacejka_dynamics)
    etc = EventTriggeredController(base=base, f_d=f_d, threshold=1e-2,
                                   eps=1e-4)
    params = VehicleParams()
    cl = straight_centerline(100)
    y0 = jnp.array([0.0, 0.0, 0.0, 0.5, 0.0, 0.0])

    @jax.jit
    def run(y0):
        carry = etc.init_carry()

        def step(sc, _):
            y, carry = sc
            out = etc.step(carry, {"y0": y, "p": params, "centerline": cl})
            y_next = f_d(y, out.u0, params)
            return (y_next, out.carry), (out.triggered, out.carry.tot_it)

        (_, carry), (trig, tot_it) = jax.lax.scan(
            step, (y0, carry), None, length=12)
        return trig, tot_it, carry

    trig, tot_it, carry = run(y0)
    trig = np.asarray(trig)
    it_delta = np.diff(np.concatenate([[0], np.asarray(tot_it)]))
    # untriggered steps spent zero solver iterations (the skip sentinel)
    assert np.all(it_delta[~trig] == 0), it_delta
    # triggered steps did real work
    assert np.all(it_delta[trig] > 0), it_delta
    # perfect model: only the expiry-driven re-solves (every n_horiz=8)
    assert int(carry.tot_solves) <= 3
    assert np.isfinite(np.asarray(tot_it)).all()


def test_batched_etc_mixed_triggers():
    # a batch where lanes trigger at different times stays correct
    etc, f_d = make_etc(threshold=1e-2)
    params = VehicleParams()
    cl = straight_centerline(100)
    B = 8
    rng = np.random.default_rng(3)
    y0s = np.zeros((B, 6), np.float32)
    y0s[:, 1] = rng.uniform(-0.1, 0.1, B)
    y0s[:, 3] = rng.uniform(0.3, 0.9, B)

    @jax.jit
    def run(y0s):
        carries = jax.vmap(lambda _: etc.init_carry())(jnp.arange(B))

        def step(sc, _):
            ys, carries = sc

            def one(y, c):
                out = etc.step(c, {"y0": y, "p": params, "centerline": cl})
                return f_d(y, out.u0, params), out.carry, out.triggered
            ys2, carries2, trig = jax.vmap(one)(ys, carries)
            return (ys2, carries2), trig

        (ys, carries), trigs = jax.lax.scan(step, (jnp.asarray(y0s), carries),
                                            None, length=15)
        return ys, carries, trigs

    ys, carries, trigs = run(y0s)
    solves = np.asarray(carries.tot_solves)
    assert np.all(solves >= 1) and np.all(solves <= 15)
    assert np.isfinite(np.asarray(ys)).all()
    # expiry alone would force a second solve by step 13
    assert np.all(solves >= 2)
