"""Randomized scenario generation + suite rollout + checkpoint/resume."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_tpu.config import AlmConfig, PanocConfig
from mpc_tpu.control.mpc import build_vehicle_controller
from mpc_tpu.models.bicycle import pacejka_dynamics
from mpc_tpu.models.integrators import discretize
from mpc_tpu.models.params import VehicleParams
from mpc_tpu.sim.scenarios import (ScenarioBatch, random_scenarios,
                                   run_scenario_suite, suite_summary)
from mpc_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from mpc_tpu.utils.timing import StepMetrics, percentile_summary, timed


def test_random_scenarios_shapes_and_sanity():
    key = jax.random.PRNGKey(0)
    sc = random_scenarios(key, batch=16, size=64)
    assert sc.y0.shape == (16, 6)
    assert sc.centerline.shape == (16, 64, 2)
    assert sc.obstacles.shape == (16, 2, 4)
    y0 = np.asarray(sc.y0)
    assert np.all(y0[:, 3] > 0)  # forward speeds
    assert np.isfinite(np.asarray(sc.centerline)).all()
    # roads are monotone along arclength: successive points distinct
    steps = np.linalg.norm(np.diff(np.asarray(sc.centerline), axis=1), axis=2)
    assert steps.min() > 1e-5


def test_scenarios_reproducible():
    a = random_scenarios(jax.random.PRNGKey(7), batch=4, size=32)
    b = random_scenarios(jax.random.PRNGKey(7), batch=4, size=32)
    np.testing.assert_array_equal(np.asarray(a.centerline),
                                  np.asarray(b.centerline))
    c = random_scenarios(jax.random.PRNGKey(8), batch=4, size=32)
    assert not np.array_equal(np.asarray(a.centerline),
                              np.asarray(c.centerline))


@pytest.mark.slow
def test_suite_rollout_end_to_end():
    ctrl = build_vehicle_controller(
        n_horiz=8, alm_cfg=AlmConfig(eps=1e-3),
        panoc_cfg=PanocConfig(lbfgs_memory=8, max_iter=60))
    params = VehicleParams()
    f_d = discretize(pacejka_dynamics)
    sc = random_scenarios(jax.random.PRNGKey(1), batch=8, size=100)
    out, secs = timed(run_scenario_suite, ctrl, f_d, sc, params, 10)
    summary = suite_summary(out, sc)
    assert summary["scenarios"] == 8 and summary["steps"] == 10
    assert summary["nan_scenarios"] == 0
    assert summary["converged_fraction"] > 0.5
    assert summary["mean_final_speed"] > 0.1


def test_resumable_suite_matches_straight_run(tmp_path):
    import jax.numpy as jnp2
    from mpc_tpu.io.native_scenarios import generate_scenarios
    from mpc_tpu.sim.scenarios import run_scenario_suite_resumable

    sc = generate_scenarios(seed=0, batch=4, size=100)
    sc = sc._replace(y0=jnp2.asarray(sc.y0),
                     centerline=jnp2.asarray(sc.centerline))
    ctrl = build_vehicle_controller(
        n_horiz=8, alm_cfg=AlmConfig(eps=1e-3),
        panoc_cfg=PanocConfig(lbfgs_memory=8, max_iter=60))
    f_d = discretize(pacejka_dynamics)
    p = os.path.join(tmp_path, "ck.npz")

    state_a, conv = run_scenario_suite_resumable(
        ctrl, f_d, sc, VehicleParams(), 8, segment=4)
    # interrupted at step 4, then resumed to 8 from the checkpoint
    run_scenario_suite_resumable(ctrl, f_d, sc, VehicleParams(), 4,
                                 segment=4, checkpoint_path=p)
    state_b, _ = run_scenario_suite_resumable(
        ctrl, f_d, sc, VehicleParams(), 8, segment=4, checkpoint_path=p)
    np.testing.assert_allclose(np.asarray(state_a["ys"]),
                               np.asarray(state_b["ys"]), atol=1e-6)
    assert conv.shape == (4, 8)


@pytest.mark.slow
def test_two_tier_suite_recovers_stragglers():
    from mpc_tpu.sim.scenarios import run_scenario_suite_two_tier

    # cheap tier deliberately starved (max_iter=8) so some lanes fail and
    # the straggler pass must rescue them
    cheap = build_vehicle_controller(
        n_horiz=8, alm_cfg=AlmConfig(eps=1e-3),
        panoc_cfg=PanocConfig(lbfgs_memory=8, max_iter=8))
    full = build_vehicle_controller(
        n_horiz=8, alm_cfg=AlmConfig(eps=1e-3),
        panoc_cfg=PanocConfig(lbfgs_memory=8, max_iter=120))
    f_d = discretize(pacejka_dynamics)
    sc = random_scenarios(jax.random.PRNGKey(3), batch=8, size=100)

    state, conv = run_scenario_suite_two_tier(
        full, cheap, f_d, sc, VehicleParams(), 5, straggler_pad=4)
    assert conv.shape == (8, 5)
    # after the rescue pass, convergence must be (near-)total, and the
    # cheap-only pass alone must NOT have been sufficient (else the test
    # exercises nothing)
    assert conv.mean() > 0.95
    assert np.isfinite(np.asarray(state["ys"])).all()


def test_checkpoint_roundtrip(tmp_path):
    tree = {"ys": jnp.arange(12.0).reshape(3, 4),
            "carry": (jnp.zeros(5), jnp.asarray(3))}
    p = os.path.join(tmp_path, "ckpt.npz")
    save_checkpoint(p, tree, step=17)
    loaded, step = load_checkpoint(p, tree)
    assert step == 17
    np.testing.assert_array_equal(np.asarray(loaded["ys"]),
                                  np.asarray(tree["ys"]))
    np.testing.assert_array_equal(np.asarray(loaded["carry"][0]), np.zeros(5))


def test_checkpoint_incompatible_structure_rejected(tmp_path):
    # a checkpoint written before a pytree gained a field must fail loudly,
    # not mis-assign leaves positionally
    old = {"ys": jnp.zeros((3, 4)), "carry": (jnp.zeros(5),)}
    new = {"ys": jnp.zeros((3, 4)), "carry": (jnp.zeros(5), jnp.zeros(5))}
    p = os.path.join(tmp_path, "ckpt.npz")
    save_checkpoint(p, old, step=3)
    with pytest.raises(ValueError, match="incompatible checkpoint"):
        load_checkpoint(p, new)
    # same structure, wrong shape -> also rejected with the leaf named
    bad_shape = {"ys": jnp.zeros((3, 5)), "carry": (jnp.zeros(5),)}
    with pytest.raises(ValueError, match="shape/dtype"):
        load_checkpoint(p, bad_shape)


def test_step_metrics_summary():
    m = StepMetrics()
    m.record(0.1, np.array([5, 6]), np.array([True, True]))
    m.record(0.2, np.array([7, 8]), np.array([True, False]))
    s = m.summary()
    assert s["solves"] == 4 and s["failures"] == 1
    assert s["tot_inner_iterations"] == 26
    assert abs(s["solves_per_s"] - 4 / 0.3) < 1e-6
    assert "p50" in s["step_latency"]


def test_percentile_summary():
    s = percentile_summary([1.0, 2.0, 3.0, 4.0])
    assert s["min"] == 1.0 and s["max"] == 4.0 and s["mean"] == 2.5
