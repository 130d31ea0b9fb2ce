"""Augmented-Lagrangian (ALM) outer loop — pure JAX, batched, TPU-native.

Replaces alpaqa's C++ ``ALMSolver`` (reference: controller.py:39-48):
general constraints ``g(u) in D`` are handled by a shifted-penalty augmented
Lagrangian; the smooth subproblem is minimized over the box C by the PANOC
inner solver. Semantics preserved from the reference configuration:
``eps=1e-6`` (final stationarity), ``delta=1e-4`` (constraint satisfaction),
``Sigma_0=1e5`` (initial penalty) — controller.py:41-43.

Augmented Lagrangian for g(u) in D with multipliers lam and penalties Sigma:

    zeta  = g(u) + lam / Sigma
    zhat  = Pi_D(zeta)
    psi   = f(u) + 1/2 sum_i Sigma_i (zeta_i - zhat_i)^2
    lam+  = Sigma * (zeta - zhat)            (multiplier update)
    e     = g(u) - zhat                      (constraint violation)

When D is unbounded (the vehicle OCP: main.py:57 leaves D at +-inf) the AL
term vanishes identically; the builder detects this *statically* and emits a
single full-tolerance PANOC solve — no outer loop is traced at all.

TPU-first: the outer loop is a ``lax.while_loop`` with per-lane convergence
masks, so the whole (outer x inner) solver vmaps over scenario batches and
shards over a mesh; one divergent scenario cannot stall the rest.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from mpc_tpu.config import AlmConfig, PanocConfig
from mpc_tpu.solver.panoc import make_panoc_solver, _tree_where
from mpc_tpu.solver.problem import Problem, project


class AlmResult(NamedTuple):
    u: jnp.ndarray
    lam: jnp.ndarray
    psi: jnp.ndarray
    converged: jnp.ndarray
    outer_iterations: jnp.ndarray
    inner_iterations: jnp.ndarray     # total PANOC iterations across outer loop
    constraint_violation: jnp.ndarray  # final ||e||_inf
    inner_convergence_failures: jnp.ndarray
    sigma: jnp.ndarray                 # final penalties (m,) — warm-start carry
    gamma: jnp.ndarray                 # final PANOC step size — warm-start carry


class _OuterState(NamedTuple):
    u: jnp.ndarray
    lam: jnp.ndarray
    sigma: jnp.ndarray
    gamma: jnp.ndarray
    eps_k: jnp.ndarray
    e_prev: jnp.ndarray
    psi: jnp.ndarray
    outer: jnp.ndarray
    inner_total: jnp.ndarray
    failures: jnp.ndarray
    converged: jnp.ndarray
    violation: jnp.ndarray


def make_alm_solver(problem: Problem, alm_cfg: AlmConfig = AlmConfig(),
                    panoc_cfg: PanocConfig = PanocConfig()) -> Callable:
    """Build ``solve(param, u0, lam0) -> AlmResult`` — jit/vmap-able.

    ``param`` is the per-scenario parameter pytree consumed by
    ``problem.cost`` / ``problem.constraints`` (the structured analogue of
    alpaqa's flat ``problem.param`` vector, controller.py:54).
    """
    has_general = problem.constraints is not None and problem.m > 0 \
        and problem.D.is_bounded

    if not has_general:
        # Statically constraint-free (vehicle OCP path): single PANOC solve.
        def psi_vg(u, args):
            param = args
            return jax.value_and_grad(problem.cost)(u, param)

        psi_vg_multi = None
        if problem.cost_multi is not None:
            def psi_vg_multi(cands, args):
                return problem.cost_multi(cands, args)

        panoc = make_panoc_solver(psi_vg, problem.C, panoc_cfg,
                                  psi_vg_multi=psi_vg_multi)

        def solve(param, u0, lam0, tol=None, sigma0=None, gamma0=None):
            # ``tol`` overrides the configured tolerance per call; +inf makes
            # the lane converge at iteration 0 (used by event-triggered MPC
            # to skip untriggered lanes inside a batch at zero cost).
            if tol is None:
                tol = alm_cfg.eps
            res = panoc(u0, jnp.asarray(tol, u0.dtype), param,
                        gamma_init=gamma0)
            sigma = sigma0 if sigma0 is not None else \
                jnp.full((problem.m,), alm_cfg.sigma_0, u0.dtype)
            return AlmResult(
                u=res.u, lam=lam0, psi=res.psi, converged=res.converged,
                outer_iterations=jnp.ones((), jnp.int32),
                inner_iterations=res.iterations,
                constraint_violation=jnp.zeros((), u0.dtype),
                inner_convergence_failures=(~res.converged).astype(jnp.int32),
                sigma=sigma,
                gamma=res.gamma,
            )

        return solve

    # ---- general-constraint path -----------------------------------------
    def psi_vg(u, args):
        param, lam, sigma = args

        def psi(u_):
            f = problem.cost(u_, param)
            g = problem.constraints(u_, param)
            zeta = g + lam / sigma
            zhat = project(zeta, problem.D)
            return f + 0.5 * jnp.sum(sigma * (zeta - zhat) ** 2)

        return jax.value_and_grad(psi)(u)

    psi_vg_multi = None
    if problem.al_multi is not None:
        def psi_vg_multi(cands, args):
            param, lam, sigma = args
            return problem.al_multi(cands, param, lam, sigma)

    panoc = make_panoc_solver(psi_vg, problem.C, panoc_cfg,
                              psi_vg_multi=psi_vg_multi)

    def solve(param, u0, lam0, tol=None, sigma0=None, gamma0=None):
        dtype = u0.dtype
        if tol is None:
            tol = alm_cfg.eps
        skip = jnp.asarray(tol, dtype) > jnp.asarray(1e30, dtype)
        # Warm-started penalties (MPC steady state: the previous step's Sigma
        # already encodes which constraints bind) skip the eps homotopy and
        # start the inner solver at the final tolerance — a warm solve then
        # typically needs a single outer iteration. Cold solves keep the
        # eps_0 -> eps schedule (alpaqa's ALM behavior).
        warm = sigma0 is not None
        st0 = _OuterState(
            u=u0,
            lam=lam0.astype(dtype),
            sigma=(sigma0.astype(dtype) if warm
                   else jnp.full((problem.m,), alm_cfg.sigma_0, dtype)),
            gamma=(gamma0.astype(dtype) if gamma0 is not None
                   else jnp.zeros((), dtype)),
            eps_k=jnp.asarray(alm_cfg.eps if warm else alm_cfg.eps_0, dtype),
            e_prev=jnp.full((problem.m,), jnp.inf, dtype),
            psi=jnp.zeros((), dtype),
            outer=jnp.zeros((), jnp.int32),
            inner_total=jnp.zeros((), jnp.int32),
            failures=jnp.zeros((), jnp.int32),
            converged=skip,  # skipped lanes exit before the first outer iter
            violation=jnp.full((), jnp.inf, dtype),
        )

        def cond(st: _OuterState):
            return (~st.converged) & (st.outer < alm_cfg.max_iter)

        def body(st: _OuterState) -> _OuterState:
            res = panoc(st.u, st.eps_k, (param, st.lam, st.sigma),
                        gamma_init=st.gamma)

            g = problem.constraints(res.u, param)
            zeta = g + st.lam / st.sigma
            zhat = project(zeta, problem.D)
            e = g - zhat
            viol = jnp.max(jnp.abs(e))

            lam_new = jnp.clip(st.sigma * (zeta - zhat),
                               -alm_cfg.lam_max, alm_cfg.lam_max)

            # Per-constraint penalty increase on insufficient progress.
            need_more = jnp.abs(e) > alm_cfg.theta * jnp.abs(st.e_prev)
            sigma_new = jnp.where(
                need_more,
                jnp.minimum(st.sigma * alm_cfg.penalty_factor, alm_cfg.sigma_max),
                st.sigma)

            at_final_eps = st.eps_k <= alm_cfg.eps * (1.0 + 1e-6)
            done = res.converged & at_final_eps & (viol <= alm_cfg.delta)

            eps_next = jnp.maximum(jnp.asarray(alm_cfg.eps, dtype),
                                   st.eps_k * alm_cfg.rho_eps)

            st_new = _OuterState(
                u=res.u, lam=lam_new, sigma=sigma_new, gamma=res.gamma,
                eps_k=eps_next,
                e_prev=jnp.abs(e), psi=res.psi,
                outer=st.outer + 1,
                inner_total=st.inner_total + res.iterations,
                failures=st.failures + (~res.converged).astype(jnp.int32),
                converged=done,
                violation=viol,
            )
            return _tree_where(st.converged, st, st_new)

        st = jax.lax.while_loop(cond, body, st0)
        return AlmResult(
            u=st.u, lam=st.lam, psi=st.psi, converged=st.converged,
            outer_iterations=st.outer,
            inner_iterations=st.inner_total,
            constraint_violation=st.violation,
            inner_convergence_failures=st.failures,
            sigma=st.sigma,
            gamma=st.gamma,
        )

    return solve
