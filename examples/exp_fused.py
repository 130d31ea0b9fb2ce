"""TPU experiment: fused cost evaluation backends on the headline config.

Compares solves/s for the N=12 Pacejka vehicle MPC (bench.py configuration)
with: plain per-lane vmap path, fused XLA batched path, fused Pallas
megakernel path.

Run:  python examples/exp_fused.py [plain|xla|pallas ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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

PARAMS = VehicleParams()


def bench(backend, batch=1024, n_horiz=12, block_e=512, n_steps=15):
    fused = None if backend == "plain" else backend
    ctrl = build_vehicle_controller(
        n_horiz=n_horiz, alm_cfg=AlmConfig(eps=1e-4),
        panoc_cfg=PanocConfig(lbfgs_memory=n_horiz, max_iter=300),
        fused=fused, fused_block_e=block_e)
    f_d = discretize(pacejka_dynamics)
    cl = straight_centerline(100)

    rng = np.random.default_rng(0)
    y0s = np.zeros((batch, 6), np.float32)
    y0s[:, 0] = rng.uniform(-0.1, 0.5, batch)
    y0s[:, 1] = rng.uniform(-0.1, 0.1, batch)
    y0s[:, 2] = rng.uniform(-0.2, 0.2, batch)
    y0s[:, 3] = rng.uniform(0.3, 1.0, batch)
    ys = jnp.asarray(y0s)

    @jax.jit
    def mpc_step(ys, carries):
        def one(y, carry):
            out = ctrl.step(carry, {"y0": y, "p": PARAMS, "centerline": cl})
            return f_d(y, out.u0, PARAMS), out.carry, out.result.converged
        return jax.vmap(one)(ys, carries)

    carries = jax.vmap(lambda _: ctrl.init_carry())(jnp.arange(batch))
    t_c0 = time.perf_counter()
    for _ in range(5):
        ys, carries, conv = mpc_step(ys, carries)
    jax.block_until_ready(ys)
    compile_s = time.perf_counter() - t_c0

    ts, convs = [], []
    for _ in range(n_steps):
        t0 = time.perf_counter()
        ys, carries, conv = mpc_step(ys, carries)
        jax.block_until_ready(ys)
        ts.append(time.perf_counter() - t0)
        convs.append(float(jnp.mean(conv.astype(jnp.float32))))
    p50 = float(np.median(ts))
    row = {
        "exp": f"fused_{backend}" + ("" if batch == 1024 else f"_b{batch}"),
        "batch": batch,
        "solves_per_s": round(batch / p50, 1),
        "p50_step_s": round(p50, 4),
        "warmup_s": round(compile_s, 1),
        "converged_fraction": round(float(np.mean(convs)), 4),
        "per_step_s": [round(t, 4) for t in ts],
    }
    print(json.dumps(row), flush=True)
    return row


if __name__ == "__main__":
    argv = sys.argv[1:]
    record = "--record" in argv
    batch = 1024
    n_steps = 15
    for a in argv:
        if a.startswith("--batch="):
            batch = int(a.split("=", 1)[1])
        if a.startswith("--steps="):
            n_steps = int(a.split("=", 1)[1])
    backends = [a for a in argv if not a.startswith("--")] \
        or ["plain", "xla", "pallas"]
    rows = []
    for b in backends:
        try:
            rows.append(bench(b, batch=batch, n_steps=n_steps))
        except Exception as exc:  # keep going; report the failure
            # same batch-suffixed key as the success path, so a failed
            # non-default-batch run cannot overwrite the recorded batch-1024
            # headline entry in section 8
            row = {"exp": f"fused_{b}" + ("" if batch == 1024
                                          else f"_b{batch}"),
                   "error": f"{type(exc).__name__}: {exc}"[:500]}
            print(json.dumps(row), flush=True)
            rows.append(row)
    if record and rows:
        from mpc_tpu.utils import perfdb
        # merge into any existing section so backends can run (and record)
        # one per process — the remote compile helper has hung on a single
        # in-process plain+xla+pallas sweep
        rec = perfdb.load().get("8", {})
        rec.update({"config": "8: fused-psi backends (plain vmap / fused XLA "
                              "/ fused Pallas), N=12 headline shape",
                    "source": "examples/exp_fused.py --record"})
        for row in rows:
            if "error" in row:
                rec[row["exp"]] = f"FAILED: {row['error'][:160]}"
            else:
                rec[row["exp"]] = (f"{row['solves_per_s']} solves/s, conv "
                                   f"{row['converged_fraction']}, p50 "
                                   f"{row['p50_step_s']} s")
        perfdb.record("8", rec)
