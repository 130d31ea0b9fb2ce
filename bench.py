"""Benchmark: batched warm-started MPC solves/s per chip.

North-star metric (BASELINE.md): full MPC solves/s — target >= 1e4 on a
v5e-16 pod slice, i.e. >= 625 solves/s/chip. One "solve" = a complete
warm-started ALM+PANOC trajectory optimization for the Pacejka vehicle OCP
(N_horiz=12, 24 decision vars, 100-point centerline — the reference's
configuration, main.py:65-70) to eps=1e-4 stationarity, inside a closed loop
with per-scenario plant propagation (plant == prediction model, main.py:145).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from mpc_tpu.config import AlmConfig, PanocConfig
from mpc_tpu.control.mpc import build_vehicle_controller
from mpc_tpu.models.bicycle import pacejka_dynamics
from mpc_tpu.models.integrators import discretize
from mpc_tpu.models.params import VehicleParams
from mpc_tpu.ops.road import straight_centerline

BASELINE_SOLVES_PER_S_PER_CHIP = 625.0  # 1e4 / 16 chips (BASELINE.json)


def main():
    batch = 1024
    n_horiz = 12
    n_steps = 20          # timed closed-loop steps
    n_warmup = 5

    ctrl = build_vehicle_controller(
        n_horiz=n_horiz,
        alm_cfg=AlmConfig(eps=1e-4),
        panoc_cfg=PanocConfig(lbfgs_memory=n_horiz, max_iter=300),
    )
    params = VehicleParams()
    f_d = discretize(pacejka_dynamics)
    cl = straight_centerline(100)

    rng = np.random.default_rng(0)
    y0s = np.zeros((batch, 6), np.float32)
    y0s[:, 0] = rng.uniform(-0.1, 0.5, batch)
    y0s[:, 1] = rng.uniform(-0.1, 0.1, batch)
    y0s[:, 2] = rng.uniform(-0.2, 0.2, batch)
    y0s[:, 3] = rng.uniform(0.3, 1.0, batch)
    y0s = jnp.asarray(y0s)

    @jax.jit
    def mpc_step(ys, carries):
        def one(y, carry):
            out = ctrl.step(carry, {"y0": y, "p": params, "centerline": cl})
            y_next = f_d(y, out.u0, params)
            return y_next, out.carry, out.result.converged
        return jax.vmap(one)(ys, carries)

    carries = jax.vmap(lambda _: ctrl.init_carry())(jnp.arange(batch))

    ys = y0s
    for _ in range(n_warmup):  # compile + reach warm-started steady state
        ys, carries, conv = mpc_step(ys, carries)
    jax.block_until_ready(ys)

    times = []
    conv_frac = []
    for _ in range(n_steps):
        t0 = time.perf_counter()
        ys, carries, conv = mpc_step(ys, carries)
        jax.block_until_ready(ys)
        times.append(time.perf_counter() - t0)
        conv_frac.append(float(jnp.mean(conv.astype(jnp.float32))))

    times = np.asarray(times)
    p50 = float(np.percentile(times, 50))
    solves_per_s = batch / p50

    # --- single-solve latency (batch=1), the real-time metric -------------
    # The reference's control interval is Ts = 0.05 s (car_dynamics.py:93):
    # one warm-started solve must fit that budget. Measured as a separate
    # batch-1 closed loop (NOT headline/batch divided by batch — dispatch
    # and worst-lane effects don't amortize at batch 1).
    @jax.jit
    def mpc_step1(y, carry):
        out = ctrl.step(carry, {"y0": y, "p": params, "centerline": cl})
        return f_d(y, out.u0, params), out.carry, out.result.converged

    y1 = y0s[0]
    c1 = ctrl.init_carry()
    for _ in range(n_warmup):
        y1, c1, _ = mpc_step1(y1, c1)
    jax.block_until_ready(y1)
    lat = []
    for _ in range(50):
        t0 = time.perf_counter()
        y1, c1, _ = mpc_step1(y1, c1)
        jax.block_until_ready(y1)
        lat.append(time.perf_counter() - t0)
    lat = np.asarray(lat)
    lat_p50 = float(np.percentile(lat, 50))
    lat_p99 = float(np.percentile(lat, 99))

    result = {
        "metric": "mpc_solves_per_s_per_chip",
        "value": round(solves_per_s, 1),
        "unit": "solves/s/chip",
        "vs_baseline": round(solves_per_s / BASELINE_SOLVES_PER_S_PER_CHIP, 3),
    }
    # context lines on stderr-like side channel (driver parses the last line)
    print(json.dumps({
        "detail": {
            "batch": batch, "n_horiz": n_horiz,
            "p50_step_latency_s": round(p50, 5),
            "p99_step_latency_s": round(float(np.percentile(times, 99)), 5),
            "mean_converged_fraction": round(float(np.mean(conv_frac)), 4),
            "single_solve_p50_s": round(lat_p50, 5),
            "single_solve_p99_s": round(lat_p99, 5),
            "realtime_budget_s": 0.05,   # Ts, car_dynamics.py:93
            "realtime_ok": bool(lat_p50 <= 0.05),
            "device": str(jax.devices()[0]),
        }
    }))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
