"""Per-iterate observability: PanocTrace / AlmTrace buffers and the
progress callback — the batch-friendly replacement for alpaqa's streaming
progress callback (reference: controller.py:23-24,38).

Semantics under regression here:
- trace buffers are fixed-size (max_iter,), rows past the used prefix stay
  NaN (jit/vmap/scan-safe shapes);
- the inner progress_callback fires once per PANOC iterate via
  jax.debug.callback.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mpc_tpu.config import AlmConfig, PanocConfig
from mpc_tpu.solver.alm import make_alm_solver
from mpc_tpu.solver.panoc import make_panoc_solver
from mpc_tpu.solver.problem import Box, Problem


def _quad_problem(m=0, bounded=False):
    """min ||u - t||^2 over the box [-1, 1]^4, optional constraint u0 <= 0."""
    t = jnp.asarray([0.4, -0.2, 0.9, 0.1], jnp.float32)

    def cost(u, param):
        return jnp.sum((u - t) ** 2)

    constraints = None
    C = Box(-jnp.ones(4), jnp.ones(4))
    D = Box.unbounded(m)
    if m:
        def constraints(u, param):
            return u[:m]
        if bounded:
            D = Box(jnp.full((m,), -jnp.inf), jnp.zeros((m,)))
    return Problem(cost=cost, constraints=constraints, C=C, D=D, n=4, m=m)


def test_panoc_trace_prefix_finite_nan_beyond():
    prob = _quad_problem()
    cfg = PanocConfig(lbfgs_memory=4, max_iter=50, trace=True)

    def psi_vg(u, args):
        return jax.value_and_grad(prob.cost)(u, args)

    solve = make_panoc_solver(psi_vg, prob.C, cfg)
    res = jax.jit(lambda u: solve(u, jnp.asarray(1e-5, jnp.float32), None))(
        jnp.zeros(4, jnp.float32))
    assert bool(res.converged)
    k = int(res.iterations)
    assert 0 < k < cfg.max_iter
    tr = jax.tree_util.tree_map(np.asarray, res.trace)
    # rows written: 0..k (the converging iterate writes its row, then exits)
    for buf in (tr.psi, tr.criterion, tr.gamma):
        assert np.isfinite(buf[:k]).all()
        assert np.isnan(buf[k + 1:]).all()
    # psi history is non-increasing up to f32 noise on this convex problem
    psis = tr.psi[: k + 1]
    assert psis[-1] <= psis[0] + 1e-6


def test_alm_trace_prefix_finite_nan_beyond():
    prob = _quad_problem(m=2, bounded=True)
    alm_cfg = AlmConfig(eps=1e-4, delta=1e-4, max_iter=12, sigma_0=1e2,
                        trace=True)
    solve = jax.jit(make_alm_solver(
        prob, alm_cfg, PanocConfig(lbfgs_memory=4, max_iter=80)))
    res = solve(None, jnp.zeros(4, jnp.float32), jnp.zeros(2, jnp.float32))
    assert bool(res.converged)
    k = int(res.outer_iterations)
    assert 0 < k < alm_cfg.max_iter
    tr = jax.tree_util.tree_map(np.asarray, res.trace)
    for buf in (tr.psi, tr.violation, tr.eps_k, tr.sigma_max, tr.inner_iters):
        assert np.isfinite(buf[:k]).all()
        assert np.isnan(buf[k:]).all()
    # the active constraint u0 <= 0 ends satisfied
    assert float(res.constraint_violation) <= alm_cfg.delta


def test_trace_vmaps_over_a_batch():
    prob = _quad_problem()
    cfg = PanocConfig(lbfgs_memory=4, max_iter=50, trace=True)

    def psi_vg(u, args):
        return jax.value_and_grad(prob.cost)(u, args)

    solve = make_panoc_solver(psi_vg, prob.C, cfg)
    u0s = jnp.stack([jnp.zeros(4), jnp.ones(4) * 0.5,
                     -jnp.ones(4) * 0.9]).astype(jnp.float32)
    res = jax.jit(jax.vmap(
        lambda u: solve(u, jnp.asarray(1e-5, jnp.float32), None)))(u0s)
    assert res.trace.psi.shape == (3, cfg.max_iter)
    assert bool(jnp.all(res.converged))
    # each lane has its own finite prefix
    psis = np.asarray(res.trace.psi)
    iters = np.asarray(res.iterations)
    for lane in range(3):
        assert np.isfinite(psis[lane, : iters[lane]]).all()


def _vehicle_param(model="simplified"):
    from mpc_tpu.models.params import VehicleParams
    from mpc_tpu.ops.road import straight_centerline
    y0 = (jnp.asarray([0.0, 0.05, 0.1, 0.4], jnp.float32)
          if model == "simplified"
          else jnp.asarray([0.0, 0.03, 0.05, 0.4, 0.0, 0.0], jnp.float32))
    return {"y0": y0, "p": VehicleParams(),
            "centerline": straight_centerline(100)}


def test_ilqr_trace_prefix_finite_nan_beyond():
    # The iLQR family's counterpart of PanocTrace (VERDICT r3 task 8):
    # unconstrained path — AlmResult.inner_trace is the solve's IlqrTrace.
    from mpc_tpu.control.mpc import build_vehicle_ilqr_controller
    from mpc_tpu.solver.ilqr import IlqrConfig

    ctrl = build_vehicle_ilqr_controller(
        n_horiz=6, model="simplified", ilqr_cfg=IlqrConfig(trace=True))
    out = jax.jit(ctrl.step)(ctrl.init_carry(), _vehicle_param())
    res = out.result
    assert bool(res.converged)
    k = int(res.inner_iterations)
    assert 0 < k < IlqrConfig().max_iter
    tr = jax.tree_util.tree_map(np.asarray, res.inner_trace)
    for buf in (tr.cost, tr.grad_norm, tr.reg):
        assert np.isfinite(buf[:k]).all()
        assert np.isnan(buf[k:]).all()
    # alpha is NaN on rejected iterations by design, but at least one step
    # was accepted and nothing is written past the prefix
    assert np.isfinite(tr.alpha[:k]).any()
    assert np.isnan(tr.alpha[k:]).all()
    # accepted-cost history is non-increasing
    cost = tr.cost[:k]
    assert np.all(np.diff(cost) <= 1e-6)


def test_al_ilqr_trace_constrained_last_inner():
    # general-constraint path: inner_trace carries the LAST inner solve's
    # buffers (same convention as ALM+PANOC's inner_trace).
    from mpc_tpu.control.mpc import build_vehicle_ilqr_controller
    from mpc_tpu.solver.ilqr import IlqrConfig

    ctrl = build_vehicle_ilqr_controller(
        n_horiz=8, bound_state_constraints=True,
        ilqr_cfg=IlqrConfig(trace=True))
    out = jax.jit(ctrl.step)(ctrl.init_carry(), _vehicle_param("pacejka"))
    res = out.result
    assert bool(res.converged)
    tr = jax.tree_util.tree_map(np.asarray, res.inner_trace)
    assert tr.cost.shape == (IlqrConfig().max_iter,)
    # the last inner solve ran at least one iteration and its rows are
    # finite; the tail stays NaN
    assert np.isfinite(tr.cost[0])
    last = int(np.max(np.where(np.isfinite(tr.cost))[0]))
    assert np.isnan(tr.cost[last + 1:]).all()
    assert np.isfinite(tr.reg[: last + 1]).all()


def test_progress_callback_fires_per_iterate():
    prob = _quad_problem()
    cfg = PanocConfig(lbfgs_memory=4, max_iter=50)
    rows = []

    def cb(it, psi, crit, gamma):
        rows.append((int(it), float(psi), float(crit), float(gamma)))

    def psi_vg(u, args):
        return jax.value_and_grad(prob.cost)(u, args)

    solve = make_panoc_solver(psi_vg, prob.C, cfg, progress_callback=cb)
    res = solve(jnp.zeros(4, jnp.float32), jnp.asarray(1e-5, jnp.float32),
                None)
    jax.effects_barrier()
    assert bool(res.converged)
    assert len(rows) == int(res.iterations) + 1
    assert rows[0][0] == 0
    assert all(np.isfinite(r[1]) for r in rows)
