"""Fused multi-candidate OCP objective evaluation (value + gradient).

The PANOC hot loop evaluates the objective and its gradient at a fan of
line-search candidates every iteration (solver/panoc.py ``cand_vg``) — for
the vehicle OCP that is: an N-step RK4 rollout of the bicycle ODE, a
nearest-centerline-point search per stage, the tracking stage cost, and the
reverse-mode sweep back to the input sequence (reference semantics:
car_dynamics.py:113-145, car_dynamics.py:174-228, car_dynamics.py:230-258,
main.py:25-59). Per-lane code vmapped over (scenario x candidate) leaves XLA
with deep chains of tiny ops and *batched gathers* for the point selection.

This module evaluates the same math natively batched over the flattened
evaluation axis E = scenarios x candidates:

- state carried as per-component ``(E,)`` vectors (structure-of-arrays) so
  every VPU op is a dense full-width vector op;
- nearest-point selection as a one-hot contraction ``sel @ cltab`` — one
  (E, S-1) x (S-1, 6) matmul on the MXU selecting nearest/previous/next
  points at once, instead of three batched gathers;
- gradients via ``jax.grad`` of the batched rollout (sum over lanes — lanes
  are independent so the per-lane gradients fall out exactly);
- optionally the whole forward+backward fused into ONE Pallas kernel
  (``backend='pallas'``), keeping every intermediate in VMEM across the
  rollout instead of round-tripping fusion boundaries through HBM.

Exposed through ``jax.custom_batching.custom_vmap`` so per-lane solver code
is unchanged: unbatched calls run the plain per-lane path; under ``vmap``
the fused batched path takes over.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.custom_batching import custom_vmap
from jax.experimental import pallas as pl

from mpc_tpu.models.params import PARAM_FIELDS, VehicleParams
from mpc_tpu.ops.costs import DEFAULT_VEHICLE_WEIGHTS, vehicle_stage_cost
from mpc_tpu.ops.road import wrap_to_pi


# ---------------------------------------------------------------------------
# Batched (structure-of-arrays) dynamics: tuples of (E,) component vectors
# ---------------------------------------------------------------------------

def _poly_atan(x):
    """Polynomial arctan: odd minimax polynomial on |z| <= 1 with
    reciprocal range reduction (atan(t) = pi/2 - atan(1/t) for t > 1).

    Pallas TPU lowering implements neither ``atan2`` (measured r4) nor
    ``atan`` (measured r5, post-_atan2 rerun: "Unimplemented primitive
    ... KernelType.TC: atan") — only elementary arithmetic/select lower,
    so inside kernels the inverse tangent must be polynomial. Max abs
    error ~1e-6 rad vs jnp.arctan (gated by tests/test_fused_psi.py),
    well under the f32 rounding of the downstream cost."""
    t = jnp.abs(x)
    inv = t > 1.0
    z = jnp.where(inv, 1.0 / jnp.maximum(t, 1e-30), t)
    z2 = z * z
    r = jnp.asarray(-0.0117212, x.dtype)
    for c in (0.05265332, -0.11643287, 0.19354346, -0.33262347, 0.99997726):
        r = r * z2 + c
    r = z * r
    r = jnp.where(inv, jnp.pi / 2 - r, r)
    return jnp.sign(x) * r


#: arctan implementation hook: jnp.arctan everywhere except inside Pallas
#: kernel traces, where it is swapped for the polynomial (see _eval_pallas).
_ATAN = [jnp.arctan]


def _atan(x):
    return _ATAN[0](x)


def _atan2(y, x):
    """atan2 from atan + quadrant selection.

    Pallas TPU lowering has no atan2 primitive (KernelType.TC
    NotImplementedError, measured r4); atan + where lowers fine outside
    kernels, and inside kernels ``_atan`` resolves to the polynomial. Used
    for both the XLA and Pallas fused backends so they trace the same
    structure. Matches jnp.arctan2 up to f32 rounding everywhere the OCP
    evaluates it. Gradients differ on the whole x == 0 line: the
    where-select zeroes d/dx there while arctan2 gives -1/y. Harmless for
    this OCP (slip-angle atan2 args have vx > 0), but not a general
    drop-in for AD through x == 0."""
    safe_x = jnp.where(x == 0.0, 1.0, x)
    t = _atan(y / safe_x)
    t = jnp.where(x < 0.0, t + jnp.where(y >= 0.0, jnp.pi, -jnp.pi), t)
    return jnp.where(x == 0.0, jnp.sign(y) * (jnp.pi / 2), t)


def _pacejka_deriv(x, d, delta, p):
    """Pacejka single-track ODE on (E,) component vectors
    (math: models/bicycle.py:pacejka_dynamics; reference dynamics.py:101-117)."""
    px, py, phi, vx, vy, omega = x
    lf, lr = p.axis_front, p.axis_rear
    m, iz = p.mass, p.inertia

    af = -_atan2(omega * lf + vy, vx) + delta
    ar = _atan2(omega * lr - vy, vx)

    frx = (p.cm1 - p.cm2 * vx) * d - p.cr0 * jnp.sign(vx) - p.cr2 * vx * vx
    ffy = p.df * jnp.sin(p.cf * _atan(p.bf * af))
    fry = p.dr * jnp.sin(p.cr * _atan(p.br * ar))

    cos_phi, sin_phi = jnp.cos(phi), jnp.sin(phi)
    cos_d, sin_d = jnp.cos(delta), jnp.sin(delta)
    return (
        vx * cos_phi - vy * sin_phi,
        vx * sin_phi + vy * cos_phi,
        omega,
        (frx - ffy * sin_d + m * vy * omega) / m,
        (fry + ffy * cos_d - m * vx * omega) / m,
        (ffy * lf * cos_d - fry * lr) / iz,
    )


def _simplified_deriv(x, d, delta, p):
    """Kinematic bicycle ODE on (E,) components (models/bicycle.py:83-104)."""
    px, py, phi, v = x
    lf, lr = p.axis_front, p.axis_rear
    beta = _atan2(lf * jnp.tan(delta), lf + lr)
    return (
        v * jnp.cos(phi + beta),
        v * jnp.sin(phi + beta),
        v * jnp.sin(beta) / lr,
        p.acceleration * d - p.friction * v,
    )


_DERIVS = {"pacejka": (_pacejka_deriv, 6), "simplified": (_simplified_deriv, 4)}


def _rk4_substeps(deriv, x, d, delta, p, h, substeps):
    """``substeps`` classical RK4 steps (models/integrators.py:26-49)."""
    for _ in range(substeps):
        k1 = deriv(x, d, delta, p)
        x2 = tuple(xi + 0.5 * h * ki for xi, ki in zip(x, k1))
        k2 = deriv(x2, d, delta, p)
        x3 = tuple(xi + 0.5 * h * ki for xi, ki in zip(x, k2))
        k3 = deriv(x3, d, delta, p)
        x4 = tuple(xi + h * ki for xi, ki in zip(x, k3))
        k4 = deriv(x4, d, delta, p)
        x = tuple(xi + (h / 6.0) * (a + 2 * b + 2 * c + e)
                  for xi, a, b, c, e in zip(x, k1, k2, k3, k4))
    return x


def make_cltab(centerline: jnp.ndarray) -> jnp.ndarray:
    """Precompute the (S-1, 6) selection table
    [nearest_x, nearest_y, prev_x, prev_y, next_x, next_y] per candidate
    index (OCP semantics: candidates 0..S-2, prev clamped at 0 —
    car_dynamics.py:174-192 / ops/road.py:find_nearest_point_ocp)."""
    head = centerline[:-1]                                  # (S-1, 2)
    prev = jnp.concatenate([centerline[:1], centerline[:-2]], axis=0)
    nxt = centerline[1:]                                    # (S-1, 2)
    return jnp.concatenate([head, prev, nxt], axis=1)       # (S-1, 6)


def _stage_cost_batched(x, d, delta, cltab, v_ref, weights):
    """Vehicle tracking stage cost on (E,) components
    (ops/costs.py:vehicle_stage_cost; reference car_dynamics.py:252-257)."""
    px, py, phi = x[0], x[1], x[2]
    clx, cly = cltab[:, 0], cltab[:, 1]                      # (S-1,)

    dx = px[:, None] - clx[None, :]                          # (E, S-1)
    dy = py[:, None] - cly[None, :]
    d2 = dx * dx + dy * dy
    idx = jnp.argmin(d2, axis=1)                             # (E,)
    iota = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    sel = (iota == idx[:, None]).astype(px.dtype)
    sel = jax.lax.stop_gradient(sel)
    # one matmul selects nearest/prev/next points for every lane (MXU)
    pts = jnp.dot(sel, cltab, preferred_element_type=px.dtype)  # (E, 6)
    nx, ny, pvx, pvy, nxx, nxy = (pts[:, i] for i in range(6))

    cte = (px - pvx) * (ny - pvy) - (py - pvy) * (nx - pvx)
    desired = _atan2(nxy - ny, nxx - nx)
    heading_error = wrap_to_pi(desired - phi)
    pos_error = (px - nx) * (nxy - ny) - (py - ny) * (nxx - nx)

    if len(x) >= 5:
        speed = jnp.sqrt(x[3] ** 2 + x[4] ** 2)
    else:
        speed = jnp.abs(x[3])
    c = weights
    return (c[0] * (speed - v_ref) ** 2
            + c[1] * cte ** 2
            + c[2] * pos_error ** 2
            + c[3] * heading_error ** 2
            + c[4] * delta ** 2
            + c[5] * d ** 2)


def _batched_total_cost(u_flat, y0b, cltab, p, *, n_horiz, deriv, state_dim,
                        h, substeps, v_ref, weights, unroll=1, al=None):
    """Total OCP cost for E independent evaluations.

    ``u_flat`` (E, n_horiz*2), ``y0b`` (E, state_dim). Returns
    ``(sum_psi, psi (E,))`` — lanes are independent, so grad of the sum w.r.t.
    ``u_flat`` is the per-lane gradient stack.

    ``al = (lam, sigma, offsets, d_lo, d_up)`` adds the augmented-Lagrangian
    penalty for the per-stage quadratic state constraints ``x_i^2 - off_i``
    in ``[d_lo, d_up]`` (solver/alm.py semantics: zeta = g + lam/sigma,
    psi += 0.5 sigma (zeta - Pi_D(zeta))^2; constraints from main.py:43-52).
    ``lam``/``sigma`` are (E, state_dim*n_horiz) stage-major like the
    stacked constraint vector in build_ocp_problem.
    """
    E = u_flat.shape[0]
    x0 = tuple(y0b[:, i] for i in range(state_dim))
    if al is not None:
        lam, sigma, offs, d_lo, d_up = al

    # The stage loop: a plain Python loop when fully unrolled, else a scan
    # with configurable unroll. XLA:CPU compile time grows superlinearly on
    # the fully unrolled graph (tests → unroll=1), while on TPU full unroll
    # fuses best (measured +44% solves/s). Inside a Pallas kernel the loop
    # MUST be the Python form for TWO reasons: (a) reverse-mode AD through
    # lax.scan inside a kernel produces wrong gradients (psi right, grad
    # wrong — scan transpose and kernel tracing interact badly); (b) the
    # scan form stacks inputs into (N, E, 2)/(N, E, sd) arrays via a 3D
    # reshape, which Mosaic's layout inference rejects ("infer-vector-
    # layout: unsupported shape cast", probed r5) — the unrolled form below
    # uses only 2D column slices, which lower fine.
    if unroll >= n_horiz:
        x = x0
        tot = jnp.zeros((E,), u_flat.dtype)
        for k in range(n_horiz):
            d, delta = u_flat[:, 2 * k], u_flat[:, 2 * k + 1]
            x = _rk4_substeps(deriv, x, d, delta, p, h, substeps)
            tot = tot + _stage_cost_batched(x, d, delta, cltab, v_ref,
                                            weights)
            if al is not None:
                for i in range(state_dim):
                    j = k * state_dim + i
                    g = x[i] * x[i] - offs[i]
                    zeta = g + lam[:, j] / sigma[:, j]
                    zhat = jnp.clip(zeta, d_lo[j], d_up[j])
                    tot = tot + 0.5 * sigma[:, j] * (zeta - zhat) ** 2
        return jnp.sum(tot), tot

    us = jnp.moveaxis(u_flat.reshape(E, n_horiz, 2), 1, 0)  # (N, E, 2)
    xs_al = None
    if al is not None:
        # stage-major (m,) = (N, state_dim) — reshape for the stage loop
        xs_al = (lam.reshape(E, n_horiz, state_dim).swapaxes(0, 1),
                 sigma.reshape(E, n_horiz, state_dim).swapaxes(0, 1),
                 d_lo.reshape(n_horiz, state_dim),
                 d_up.reshape(n_horiz, state_dim))

    def stage(carry, inp):
        x, tot = carry
        if al is None:
            u_k = inp
            d, delta = u_k[:, 0], u_k[:, 1]
        else:
            u_k, lam_k, sig_k, dlo_k, dup_k = inp
            d, delta = u_k[:, 0], u_k[:, 1]
        x = _rk4_substeps(deriv, x, d, delta, p, h, substeps)
        tot = tot + _stage_cost_batched(x, d, delta, cltab, v_ref, weights)
        if al is not None:
            for i in range(state_dim):
                g = x[i] * x[i] - offs[i]
                zeta = g + lam_k[:, i] / sig_k[:, i]
                zhat = jnp.clip(zeta, dlo_k[i], dup_k[i])
                tot = tot + 0.5 * sig_k[:, i] * (zeta - zhat) ** 2
        return (x, tot), None

    init = (x0, jnp.zeros((E,), u_flat.dtype))
    xs = us if al is None else (us,) + xs_al
    (x, tot), _ = jax.lax.scan(stage, init, xs, unroll=unroll)
    return jnp.sum(tot), tot


def _eval_xla(u_flat, y0b, cltab, p, cfg, al_ls=None):
    def total(u):
        al = None
        if al_ls is not None:
            lam, sigma, offs, d_lo, d_up = al_ls
            al = (lam, sigma, offs, d_lo, d_up)
        return _batched_total_cost(u, y0b, cltab, p, al=al, **cfg)

    grad, psi = jax.grad(total, has_aux=True)(u_flat)
    return psi, grad


# ---------------------------------------------------------------------------
# Pallas megakernel backend
# ---------------------------------------------------------------------------

def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


#: fields threaded into the kernel param vector — the canonical 22 plus the
#: kinematic-model extras (friction/acceleration, reference dynamics.py:34-35)
_KERNEL_PARAM_FIELDS = PARAM_FIELDS + ("friction", "acceleration")


def _params_to_kernel_vec(p: VehicleParams) -> jnp.ndarray:
    """(1, 24) runtime parameter operand for the Pallas kernel."""
    return jnp.stack([jnp.asarray(getattr(p, f), jnp.float32)
                      for f in _KERNEL_PARAM_FIELDS])[None]


def _params_from_kernel_vec(pv) -> VehicleParams:
    return VehicleParams(**{f: pv[i]
                            for i, f in enumerate(_KERNEL_PARAM_FIELDS)})


def _eval_pallas(u_flat, y0b, cltab, p, cfg, block_e: int, al_ls=None):
    """One Pallas kernel per E-block: full rollout + cost + reverse sweep in
    VMEM. Same math as :func:`_eval_xla` (the kernel body traces the identical
    jnp program, including ``jax.grad``). The runtime physical parameters are
    threaded into the kernel as a (1, 24) operand — the kernel honours the
    ``p`` argument exactly like the XLA backend."""
    cfg = dict(cfg, unroll=cfg["n_horiz"])   # kernels must not contain scan
    E, n = u_flat.shape
    sd = y0b.shape[1]
    E_pad = _round_up(max(E, 1), block_e)
    operands = [u_flat, y0b]
    if al_ls is not None:
        lam, sigma, offs, d_lo, d_up = al_ls
        operands += [lam, sigma]
    if E_pad != E:
        # pad with copies of the last lane — cheap, keeps padded lanes NaN-free
        operands = [jnp.pad(a, ((0, E_pad - E), (0, 0)), mode="edge")
                    for a in operands]
    operands.append(cltab)
    pvec = _params_to_kernel_vec(p)
    operands.append(pvec)
    m = operands[2].shape[1] if al_ls is not None else 0

    def kernel(*refs):
        # Read every operand into values first — the differentiated closure
        # must be a pure function of arrays, not of Refs.
        if al_ls is not None:
            (u_ref, y0_ref, lam_ref, sig_ref, cl_ref, p_ref,
             psi_ref, grad_ref) = refs
            al = (lam_ref[:], sig_ref[:], offs, d_lo, d_up)
        else:
            u_ref, y0_ref, cl_ref, p_ref, psi_ref, grad_ref = refs
            al = None
        y0v, clv = y0_ref[:], cl_ref[:]
        p_run = _params_from_kernel_vec(p_ref[0, :])

        def total(u):
            return _batched_total_cost(u, y0v, clv, p_run, al=al, **cfg)

        grad, psi = jax.grad(total, has_aux=True)(u_ref[:])
        psi_ref[:] = psi[:, None]
        grad_ref[:] = grad

    grid = (E_pad // block_e,)
    in_specs = [
        pl.BlockSpec((block_e, n), lambda i: (i, 0)),
        pl.BlockSpec((block_e, sd), lambda i: (i, 0)),
    ]
    if al_ls is not None:
        in_specs += [pl.BlockSpec((block_e, m), lambda i: (i, 0)),
                     pl.BlockSpec((block_e, m), lambda i: (i, 0))]
    in_specs.append(pl.BlockSpec(cltab.shape, lambda i: (0, 0)))
    in_specs.append(pl.BlockSpec(pvec.shape, lambda i: (0, 0)))

    # Pallas TPU has no atan/atan2 lowering (recorded r4/r5): swap the
    # arctan hook for the polynomial while the kernel body is traced.
    from jax.experimental.pallas import tpu as pltpu
    _ATAN[0] = _poly_atan
    try:
        psi, grad = pl.pallas_call(
            kernel,
            grid=grid,
            # the fully-unrolled forward+reverse sweep keeps all rollout
            # intermediates on the VMEM stack: the 16 MB default scoped
            # limit OOMs even at N=4 (measured r5); v5e has 128 MB VMEM
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((block_e, 1), lambda i: (i, 0)),
                pl.BlockSpec((block_e, n), lambda i: (i, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((E_pad, 1), u_flat.dtype),
                jax.ShapeDtypeStruct((E_pad, n), u_flat.dtype),
            ],
        )(*operands)
    finally:
        _ATAN[0] = jnp.arctan
    return psi[:E, 0], grad[:E]


# ---------------------------------------------------------------------------
# custom_vmap wrapper — drop-in for vmap(value_and_grad(cost), (0, None))
# ---------------------------------------------------------------------------

def make_vehicle_cost_multi(n_horiz: int, ts: float = 0.05, substeps: int = 4,
                            v_ref: float = 1.0,
                            weights=DEFAULT_VEHICLE_WEIGHTS,
                            model: str = "pacejka",
                            backend: str = "xla",
                            block_e: int = 256,
                            unroll: Optional[int] = None,
                            params: Optional[VehicleParams] = None) -> Callable:
    """Build ``cost_multi(cands, param) -> (psi (K,), grad (K, n))``.

    ``param`` is the OCP parameter pytree ``{"y0", "p", "centerline"}``
    (solver/problem.py:build_ocp_problem). Per-lane calls evaluate a plain
    batched rollout; under ``vmap`` over scenarios the fused batched backend
    evaluates all (scenario x candidate) points in one pass.

    Both backends honour the runtime ``p`` argument; the Pallas kernel
    receives the physical constants as a (1, 24) operand
    (``_params_to_kernel_vec``). ``params`` is kept for API compatibility
    and ignored.
    """
    if backend not in ("xla", "pallas"):
        raise ValueError(f"unknown fused backend {backend!r}: "
                         "expected 'xla' or 'pallas'")
    deriv, state_dim = _DERIVS[model]
    if unroll is None:
        unroll = n_horiz if jax.default_backend() != "cpu" else 1
    cfg = dict(n_horiz=n_horiz, deriv=deriv, state_dim=state_dim,
               h=ts / substeps, substeps=substeps, v_ref=v_ref,
               weights=tuple(weights), unroll=unroll)

    def _fused(cands_flat, y0b, centerline, p):
        cltab = make_cltab(centerline)
        if backend == "pallas":
            return _eval_pallas(cands_flat, y0b, cltab, p, cfg, block_e)
        return _eval_xla(cands_flat, y0b, cltab, p, cfg)

    @custom_vmap
    def cost_multi(cands, y0, centerline, p):
        # unbatched path: one lane, K candidates
        K = cands.shape[0]
        psi, grad = _fused(cands, jnp.tile(y0[None], (K, 1)), centerline, p)
        return psi, grad

    @cost_multi.def_vmap
    def _rule(axis_size, in_batched, cands, y0, centerline, p):
        cands_b, y0_b, cl_b, p_b = in_batched
        if cl_b or any(jax.tree_util.tree_leaves(p_b)):
            raise NotImplementedError(
                "fused cost_multi: centerline/params must be shared across "
                "the vmapped axis")
        B = axis_size
        if not cands_b:
            cands = jnp.broadcast_to(cands[None], (B,) + cands.shape)
        K, n = cands.shape[1], cands.shape[2]
        if y0_b:
            y0b = jnp.repeat(y0, K, axis=0)                 # (B*K, sd)
        else:
            y0b = jnp.tile(y0[None], (B * K, 1))
        psi, grad = _fused(cands.reshape(B * K, n), y0b, centerline, p)
        return (psi.reshape(B, K), grad.reshape(B, K, n)), (True, True)

    return cost_multi


def make_vehicle_al_multi(n_horiz: int, offsets, d_lo, d_up,
                          ts: float = 0.05, substeps: int = 4,
                          v_ref: float = 1.0,
                          weights=DEFAULT_VEHICLE_WEIGHTS,
                          model: str = "pacejka",
                          backend: str = "xla",
                          block_e: int = 256,
                          unroll: Optional[int] = None,
                          params: Optional[VehicleParams] = None) -> Callable:
    """Fused augmented-Lagrangian evaluator for the state-constrained vehicle
    OCP (BASELINE.json config #2):

        al_multi(cands (K, n), y0, centerline, p, lam (m,), sigma (m,))
            -> (psi (K,), grad (K, n))

    psi = tracking cost + 0.5 sigma (zeta - Pi_D(zeta))^2 with the per-stage
    quadratic state constraints x_i^2 - offsets_i in [d_lo, d_up]
    (solver/alm.py AL semantics; constraints from reference main.py:43-52).
    """
    if backend not in ("xla", "pallas"):
        raise ValueError(f"unknown fused backend {backend!r}: "
                         "expected 'xla' or 'pallas'")
    deriv, state_dim = _DERIVS[model]
    if unroll is None:
        unroll = n_horiz if jax.default_backend() != "cpu" else 1
    cfg = dict(n_horiz=n_horiz, deriv=deriv, state_dim=state_dim,
               h=ts / substeps, substeps=substeps, v_ref=v_ref,
               weights=tuple(weights), unroll=unroll)
    # numpy constants: embeddable as literals inside a Pallas kernel
    offsets = np.asarray(offsets, np.float32)
    d_lo = np.asarray(d_lo, np.float32)
    d_up = np.asarray(d_up, np.float32)

    def _fused(cands_flat, y0b, centerline, p, lam2, sigma2):
        cltab = make_cltab(centerline)
        al_ls = (lam2, sigma2, offsets, d_lo, d_up)
        if backend == "pallas":
            return _eval_pallas(cands_flat, y0b, cltab, p, cfg,
                                block_e, al_ls=al_ls)
        return _eval_xla(cands_flat, y0b, cltab, p, cfg, al_ls=al_ls)

    @custom_vmap
    def al_multi(cands, y0, centerline, p, lam, sigma):
        K = cands.shape[0]
        psi, grad = _fused(cands, jnp.tile(y0[None], (K, 1)), centerline, p,
                           jnp.tile(lam[None], (K, 1)),
                           jnp.tile(sigma[None], (K, 1)))
        return psi, grad

    @al_multi.def_vmap
    def _rule(axis_size, in_batched, cands, y0, centerline, p, lam, sigma):
        cands_b, y0_b, cl_b, p_b, lam_b, sig_b = in_batched
        if cl_b or any(jax.tree_util.tree_leaves(p_b)):
            raise NotImplementedError(
                "fused al_multi: centerline/params must be shared across "
                "the vmapped axis")
        B = axis_size

        def bcast(a, is_b):
            return a if is_b else jnp.broadcast_to(a[None], (B,) + a.shape)

        cands = bcast(cands, cands_b)
        K, n = cands.shape[1], cands.shape[2]

        def per_lane_to_eval(a, is_b):     # (B, d) -> (B*K, d)
            return jnp.repeat(bcast(a, is_b), K, axis=0)

        psi, grad = _fused(
            cands.reshape(B * K, n),
            per_lane_to_eval(y0, y0_b), centerline, p,
            per_lane_to_eval(lam, lam_b), per_lane_to_eval(sigma, sig_b))
        return (psi.reshape(B, K), grad.reshape(B, K, n)), (True, True)

    return al_multi
