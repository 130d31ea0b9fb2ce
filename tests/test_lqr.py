"""Parallel-scan Riccati (solver/lqr.py) vs a dense f64 KKT oracle.

The oracle solves the full equality-constrained QP (states + inputs as
variables, dynamics as equality constraints) with numpy float64 — an
independent transcription of the LQT optimality system, not a copy of the
module under test. The sequential Riccati must match the oracle; the
parallel-scan Riccati must match the sequential one.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpc_tpu.solver.lqr import lqt_solve_parallel, lqt_solve_sequential


def _random_lqt(seed, N=12, n=4, m=2, cross=False):
    rng = np.random.default_rng(seed)

    def psd(k, scale=1.0):
        M = rng.normal(size=(k, k))
        return scale * (M @ M.T / k + np.eye(k))

    A = np.stack([np.eye(n) + 0.1 * rng.normal(size=(n, n))
                  for _ in range(N)])
    B = 0.5 * rng.normal(size=(N, n, m))
    c = 0.1 * rng.normal(size=(N, n))
    Q = np.stack([psd(n, 0.5) for _ in range(N)])
    q = 0.1 * rng.normal(size=(N, n))
    R = np.stack([psd(m, 1.0) for _ in range(N)])
    r = 0.1 * rng.normal(size=(N, m))
    P = 0.1 * rng.normal(size=(N, m, n)) if cross else None
    QN = psd(n, 1.0)
    qN = 0.1 * rng.normal(size=(n,))
    x0 = rng.normal(size=(n,))
    return x0, A, B, c, Q, q, R, r, QN, qN, P


def _kkt_oracle(x0, A, B, c, Q, q, R, r, QN, qN, P=None):
    """Dense f64 solve of the KKT system. Variables z = [x_1..x_N, u_0..u_{N-1}]."""
    N, n = A.shape[0], A.shape[1]
    m = B.shape[2]
    if P is None:
        P = np.zeros((N, m, n))
    nz = N * n + N * m

    def xi(k):           # slice of x_k (k >= 1)
        return slice((k - 1) * n, k * n)

    def ui(k):
        return slice(N * n + k * m, N * n + (k + 1) * m)

    H = np.zeros((nz, nz))
    h = np.zeros(nz)
    # stage costs k = 0..N-1 (x_0 fixed: its quadratic terms are constant,
    # its cross term contributes linearly to u_0)
    for k in range(N):
        H[ui(k), ui(k)] += R[k]
        h[ui(k)] += r[k]
        if k == 0:
            h[ui(0)] += P[0] @ x0
        else:
            H[xi(k), xi(k)] += Q[k]
            h[xi(k)] += q[k]
            H[ui(k), xi(k)] += P[k]
            H[xi(k), ui(k)] += P[k].T
    H[xi(N), xi(N)] += QN
    h[xi(N)] += qN

    # dynamics: x_{k+1} - A_k x_k - B_k u_k = c_k  (x_0 known)
    E = np.zeros((N * n, nz))
    d = np.zeros(N * n)
    for k in range(N):
        rows = slice(k * n, (k + 1) * n)
        E[rows, xi(k + 1)] = np.eye(n)
        E[rows, ui(k)] = -B[k]
        d[rows] = c[k]
        if k == 0:
            d[rows] += A[0] @ x0
        else:
            E[rows, xi(k)] = -A[k]

    KKT = np.block([[H, E.T], [E, np.zeros((N * n, N * n))]])
    rhs = np.concatenate([-h, d])
    sol = np.linalg.solve(KKT, rhs)
    xs = np.concatenate([x0[None], sol[: N * n].reshape(N, n)])
    us = sol[N * n: nz].reshape(N, m)
    return xs, us


@pytest.mark.parametrize("cross", [False, True])
def test_sequential_matches_kkt_oracle(cross):
    prob = _random_lqt(0, cross=cross)
    xs_o, us_o = _kkt_oracle(*prob)
    sol = lqt_solve_sequential(*[None if p is None else jnp.asarray(
        np.asarray(p, np.float32)) for p in prob])
    np.testing.assert_allclose(np.asarray(sol.us), us_o, atol=2e-4)
    np.testing.assert_allclose(np.asarray(sol.xs), xs_o, atol=2e-4)


@pytest.mark.parametrize("cross", [False, True])
@pytest.mark.parametrize("N", [1, 2, 13, 40])
def test_parallel_matches_sequential(cross, N):
    prob = _random_lqt(1, N=N, cross=cross)
    args = [None if p is None else jnp.asarray(np.asarray(p, np.float32))
            for p in prob]
    seq = lqt_solve_sequential(*args)
    par = jax.jit(lqt_solve_parallel)(*args)
    np.testing.assert_allclose(np.asarray(par.us), np.asarray(seq.us),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(par.xs), np.asarray(seq.xs),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(par.Ss), np.asarray(seq.Ss),
                               atol=5e-3)


def test_parallel_matches_oracle_long_horizon():
    prob = _random_lqt(2, N=40)
    xs_o, us_o = _kkt_oracle(*prob)
    par = lqt_solve_parallel(*[None if p is None else jnp.asarray(
        np.asarray(p, np.float32)) for p in prob])
    np.testing.assert_allclose(np.asarray(par.us), us_o, atol=1e-3)


def test_vmaps_over_batch():
    probs = [_random_lqt(s, N=8) for s in range(4)]
    batched = [jnp.stack([jnp.asarray(np.asarray(p[i], np.float32))
                          for p in probs]) for i in range(10)]

    def solve_one(*args):
        return lqt_solve_parallel(*args).us

    us_b = jax.jit(jax.vmap(solve_one))(*batched)
    for i, p in enumerate(probs):
        ref = lqt_solve_sequential(*[jnp.asarray(np.asarray(a, np.float32))
                                     for a in p[:-1]], None)
        np.testing.assert_allclose(np.asarray(us_b[i]), np.asarray(ref.us),
                                   atol=5e-4)
