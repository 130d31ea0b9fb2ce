"""Native C++ scenario generator: build, determinism, thread-invariance."""

import numpy as np
import pytest

from mpc_tpu.io.native_scenarios import (ScenarioPrefetcher, generate_scenarios,
                                         native_available)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="no C++ toolchain")


def test_shapes_and_sanity():
    sc = generate_scenarios(seed=0, batch=32, size=64, n_obstacles=3)
    assert sc.centerline.shape == (32, 64, 2)
    assert sc.y0.shape == (32, 6)
    assert sc.obstacles.shape == (32, 3, 4)
    assert np.isfinite(sc.centerline).all()
    assert np.all(sc.y0[:, 3] > 0)
    # successive road points distinct
    steps = np.linalg.norm(np.diff(sc.centerline, axis=1), axis=2)
    assert steps.min() > 1e-6


def test_deterministic_and_seed_sensitive():
    a = generate_scenarios(seed=7, batch=8, size=32)
    b = generate_scenarios(seed=7, batch=8, size=32)
    np.testing.assert_array_equal(a.centerline, b.centerline)
    np.testing.assert_array_equal(a.y0, b.y0)
    c = generate_scenarios(seed=8, batch=8, size=32)
    assert not np.array_equal(a.centerline, c.centerline)


def test_thread_count_invariance():
    a = generate_scenarios(seed=3, batch=16, size=32, n_threads=1)
    b = generate_scenarios(seed=3, batch=16, size=32, n_threads=4)
    np.testing.assert_array_equal(a.centerline, b.centerline)
    np.testing.assert_array_equal(a.y0, b.y0)
    np.testing.assert_array_equal(a.obstacles, b.obstacles)


def test_initial_state_on_road():
    sc = generate_scenarios(seed=1, batch=16, size=64)
    # position within 10 cm of the road start
    d = np.linalg.norm(sc.y0[:, :2] - sc.centerline[:, 0, :], axis=1)
    assert d.max() < 0.1


def test_prefetcher_round_trip():
    pf = ScenarioPrefetcher(seed=0, batch=4, size=32)
    a = pf.next()
    b = pf.next()
    assert a.centerline.shape == (4, 32, 2)
    assert not np.array_equal(np.asarray(a.centerline),
                              np.asarray(b.centerline))


def test_feeds_batched_mpc():
    # generated scenarios drive the real closed loop without NaNs
    import jax.numpy as jnp
    from mpc_tpu.config import AlmConfig, PanocConfig
    from mpc_tpu.control.mpc import build_vehicle_controller
    from mpc_tpu.models.bicycle import pacejka_dynamics
    from mpc_tpu.models.integrators import discretize
    from mpc_tpu.models.params import VehicleParams
    from mpc_tpu.sim.scenarios import run_scenario_suite, suite_summary

    sc = generate_scenarios(seed=5, batch=4, size=100)
    ctrl = build_vehicle_controller(
        n_horiz=8, alm_cfg=AlmConfig(eps=1e-3),
        panoc_cfg=PanocConfig(lbfgs_memory=8, max_iter=60))
    f_d = discretize(pacejka_dynamics)
    out = run_scenario_suite(ctrl, f_d, sc._replace(
        y0=jnp.asarray(sc.y0), centerline=jnp.asarray(sc.centerline)),
        VehicleParams(), 6)
    s = suite_summary(out, sc)
    assert s["nan_scenarios"] == 0
