"""Parity of the fused multi-candidate cost evaluator (ops/fused_psi.py)
against the reference per-lane path (vmap(value_and_grad(problem.cost))).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_tpu.config import AlmConfig, PanocConfig
from mpc_tpu.control.mpc import build_vehicle_controller, build_vehicle_ocp
from mpc_tpu.models.params import VehicleParams
from mpc_tpu.ops.fused_psi import make_vehicle_cost_multi
from mpc_tpu.ops.road import circle_centerline, straight_centerline

PARAMS = VehicleParams()


def _rand_setup(rng, B, K, n_horiz, state_dim):
    cands = jnp.asarray(rng.uniform(-0.3, 1.0, (B, K, n_horiz * 2)),
                        jnp.float32)
    y0 = np.zeros((B, state_dim), np.float32)
    y0[:, 0] = rng.uniform(-0.1, 0.5, B)
    y0[:, 1] = rng.uniform(-0.1, 0.1, B)
    y0[:, 2] = rng.uniform(-0.3, 0.3, B)
    y0[:, 3] = rng.uniform(0.2, 1.0, B)
    return cands, jnp.asarray(y0)


@pytest.mark.parametrize("model,state_dim", [("pacejka", 6),
                                             ("simplified", 4)])
def test_fused_xla_matches_per_lane(model, state_dim):
    n_horiz, B, K = 8, 5, 3
    problem = build_vehicle_ocp(n_horiz=n_horiz, model=model)
    cl = straight_centerline(50)
    rng = np.random.default_rng(0)
    cands, y0 = _rand_setup(rng, B, K, n_horiz, state_dim)

    multi = make_vehicle_cost_multi(n_horiz, model=model, backend="xla")

    def ref(u, y):
        return jax.value_and_grad(problem.cost)(
            u, {"y0": y, "p": PARAMS, "centerline": cl})

    ref_psi, ref_grad = jax.vmap(jax.vmap(ref, in_axes=(0, None)),
                                 in_axes=(0, 0))(cands, y0)

    psi, grad = jax.jit(jax.vmap(multi, in_axes=(0, 0, None, None)))(
        cands, y0, cl, PARAMS)
    np.testing.assert_allclose(psi, ref_psi, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(grad, ref_grad, rtol=2e-4, atol=2e-5)


def test_fused_unbatched_path():
    n_horiz, K = 6, 4
    problem = build_vehicle_ocp(n_horiz=n_horiz)
    cl = circle_centerline(40)
    rng = np.random.default_rng(1)
    cands, y0 = _rand_setup(rng, 1, K, n_horiz, 6)
    y0 = y0[0].at[:2].set(jnp.asarray([5.0, 5.0]))

    multi = make_vehicle_cost_multi(n_horiz, backend="xla")
    psi, grad = jax.jit(multi)(cands[0], y0, cl, PARAMS)

    def ref(u):
        return jax.value_and_grad(problem.cost)(
            u, {"y0": y0, "p": PARAMS, "centerline": cl})

    ref_psi, ref_grad = jax.vmap(ref)(cands[0])
    np.testing.assert_allclose(psi, ref_psi, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(grad, ref_grad, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_fused_pallas_interpret_matches_xla():
    # Pallas backend in interpreter mode (CPU); real-TPU compile/parity is
    # exercised by examples/exp_fused.py. Kept tiny AND marked slow: Pallas
    # kernels run fully unrolled (scan gradients are wrong inside kernels —
    # see fused_psi._batched_total_cost) and XLA:CPU compile time explodes
    # superlinearly on unrolled graphs; interpret mode multiplies that.
    from jax.experimental.pallas import tpu as pltpu

    n_horiz, B, K = 3, 2, 2
    cl = straight_centerline(20)
    rng = np.random.default_rng(2)
    cands, y0 = _rand_setup(rng, B, K, n_horiz, 6)

    xla = make_vehicle_cost_multi(n_horiz, substeps=2, backend="xla")
    pal = make_vehicle_cost_multi(n_horiz, substeps=2, backend="pallas",
                                  block_e=4)

    psi_x, grad_x = jax.vmap(xla, in_axes=(0, 0, None, None))(
        cands, y0, cl, PARAMS)
    with pltpu.force_tpu_interpret_mode():
        psi_p, grad_p = jax.vmap(pal, in_axes=(0, 0, None, None))(
            cands, y0, cl, PARAMS)
    # kernel traces _poly_atan (no atan TPU lowering): ~1e-6 rad per call,
    # amplified through the rollout reverse sweep -> grad rel up to ~1e-3
    np.testing.assert_allclose(psi_p, psi_x, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(grad_p, grad_x, rtol=1e-3, atol=1e-4)


def test_fused_pallas_interpret_gradient_parity_minimal():
    # Non-slow guard for the AD-fragile Pallas gradient path (kernels run
    # fully unrolled; scan gradients are wrong inside kernels): the smallest
    # possible configuration, interpret mode, asserting psi AND grad parity.
    # Uses NON-default physical params to pin the runtime-param operand —
    # the kernel must honour the passed ``p``, not build-time constants.
    from jax.experimental.pallas import tpu as pltpu

    n_horiz = 2
    cl = straight_centerline(12)
    rng = np.random.default_rng(4)
    cands, y0 = _rand_setup(rng, 1, 1, n_horiz, 6)
    p_run = dataclasses.replace(PARAMS, mass=0.25, cm1=0.4)

    xla = make_vehicle_cost_multi(n_horiz, substeps=1, backend="xla")
    pal = make_vehicle_cost_multi(n_horiz, substeps=1, backend="pallas",
                                  block_e=1)
    psi_x, grad_x = xla(cands[0], y0[0], cl, p_run)
    with pltpu.force_tpu_interpret_mode():
        psi_p, grad_p = pal(cands[0], y0[0], cl, p_run)
    # poly-atan tolerance: see test_fused_pallas_interpret_matches_xla
    np.testing.assert_allclose(psi_p, psi_x, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(grad_p, grad_x, rtol=1e-3, atol=1e-4)


def test_fused_al_matches_per_lane():
    # Augmented-Lagrangian variant vs the per-lane AL built from
    # problem.cost/constraints (solver/alm.py psi_vg).
    from mpc_tpu.ops.fused_psi import make_vehicle_al_multi
    from mpc_tpu.solver.problem import project

    n_horiz, B, K = 6, 4, 3
    problem = build_vehicle_ocp(n_horiz=n_horiz, bound_state_constraints=True)
    cl = straight_centerline(50)
    rng = np.random.default_rng(3)
    cands, y0 = _rand_setup(rng, B, K, n_horiz, 6)
    m = problem.m
    lam = jnp.asarray(rng.uniform(0, 2.0, (B, m)), jnp.float32)
    sigma = jnp.asarray(rng.uniform(10.0, 1e3, (B, m)), jnp.float32)

    def ref_al(u, y, la, si):
        def psi(u_):
            param = {"y0": y, "p": PARAMS, "centerline": cl}
            f = problem.cost(u_, param)
            g = problem.constraints(u_, param)
            zeta = g + la / si
            zhat = project(zeta, problem.D)
            return f + 0.5 * jnp.sum(si * (zeta - zhat) ** 2)
        return jax.value_and_grad(psi)(u)

    ref_psi, ref_grad = jax.vmap(jax.vmap(ref_al, in_axes=(0, None, None, None)),
                                 in_axes=(0, 0, 0, 0))(cands, y0, lam, sigma)

    multi = make_vehicle_al_multi(n_horiz, (20.0, 1.0, 1.0, 2.0, 1.0, 0.1),
                                  problem.D.lower, problem.D.upper)
    psi, grad = jax.jit(jax.vmap(multi, in_axes=(0, 0, None, None, 0, 0)))(
        cands, y0, cl, PARAMS, lam, sigma)
    np.testing.assert_allclose(psi, ref_psi, rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(grad, ref_grad, rtol=2e-4, atol=3e-4)


def test_constrained_controller_with_fused_al_matches_plain():
    # One warm-started constrained MPC step: fused AL path == plain path.
    alm = AlmConfig(eps=1e-3, delta=1e-3, max_iter=6, eps_0=1e-2)
    panoc = PanocConfig(lbfgs_memory=8, max_iter=100)
    kw = dict(n_horiz=8, bound_state_constraints=True, alm_cfg=alm,
              panoc_cfg=panoc)
    plain = build_vehicle_controller(**kw)
    fused = build_vehicle_controller(fused="xla", **kw)
    cl = straight_centerline(100)
    y0s = jnp.asarray([[0.0, 0.05, 0.0, 0.5, 0.0, 0.0],
                       [0.2, -0.05, 0.1, 0.8, 0.0, 0.0]], jnp.float32)

    def run(ctrl):
        def one(y):
            out = ctrl.step(ctrl.init_carry(),
                            {"y0": y, "p": PARAMS, "centerline": cl})
            return out.u0, out.result.psi, out.result.constraint_violation
        return jax.jit(jax.vmap(one))(y0s)

    u_p, psi_p, v_p = run(plain)
    u_f, psi_f, v_f = run(fused)
    # The fused path computes the same math with different f32 reassociation,
    # so iterative solves land on slightly different points: assert equal
    # solution QUALITY (cost within 2%, feasibility) + close first inputs.
    np.testing.assert_allclose(psi_f, psi_p, rtol=2e-2, atol=1e-4)
    assert float(jnp.max(v_f)) <= 2e-3
    np.testing.assert_allclose(u_f, u_p, rtol=0, atol=3e-2)


def test_controller_with_fused_cost_matches_plain():
    # Full warm-started MPC step through the fused path == plain path.
    from mpc_tpu.models.bicycle import pacejka_dynamics
    from mpc_tpu.models.integrators import discretize

    alm = AlmConfig(eps=1e-4)
    panoc = PanocConfig(lbfgs_memory=12, max_iter=150)
    plain = build_vehicle_controller(n_horiz=12, alm_cfg=alm, panoc_cfg=panoc)
    fused = build_vehicle_controller(n_horiz=12, alm_cfg=alm, panoc_cfg=panoc,
                                     fused="xla")
    cl = straight_centerline(100)
    y0s = jnp.asarray([[0.0, 0.05, 0.0, 0.5, 0.0, 0.0],
                       [0.2, -0.05, 0.1, 0.8, 0.0, 0.0]], jnp.float32)

    def run(ctrl):
        def one(y):
            out = ctrl.step(ctrl.init_carry(),
                            {"y0": y, "p": PARAMS, "centerline": cl})
            return out.u0, out.result.psi, out.result.converged
        return jax.jit(jax.vmap(one))(y0s)

    u_p, psi_p, conv_p = run(plain)
    u_f, psi_f, conv_f = run(fused)
    assert bool(jnp.all(conv_p)) and bool(jnp.all(conv_f))
    np.testing.assert_allclose(psi_f, psi_p, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(u_f, u_p, rtol=0, atol=5e-3)


def test_poly_atan_accuracy():
    # the Pallas-kernel arctan (no atan/atan2 TPU lowering exists —
    # measured r4/r5): minimax polynomial + reciprocal range reduction
    from mpc_tpu.ops.fused_psi import _poly_atan
    x = np.concatenate([
        np.linspace(-50.0, 50.0, 20001, dtype=np.float32),
        np.linspace(-1.5, 1.5, 20001, dtype=np.float32),
        np.array([0.0, 1.0, -1.0, 1e-8, -1e-8, 1e6, -1e6], np.float32)])
    got = np.asarray(_poly_atan(jnp.asarray(x)))
    ref = np.arctan(x.astype(np.float64))
    assert np.max(np.abs(got - ref)) < 2e-6
    # gradient sanity at representative points (AD through the polynomial)
    g = jax.vmap(jax.grad(_poly_atan))(jnp.asarray(
        np.array([-3.0, -0.5, 0.3, 0.9999, 1.0001, 7.0], np.float32)))
    ref_g = 1.0 / (1.0 + np.array([-3.0, -0.5, 0.3, 0.9999, 1.0001, 7.0]) ** 2)
    np.testing.assert_allclose(np.asarray(g), ref_g, rtol=1e-3, atol=1e-4)
