"""Horizon-sharded parallel-scan Riccati (parallel/lqr_sharded.py) vs the
single-device path (solver/lqr.py) on the virtual 8-device CPU mesh.

The single-device path is itself gated against a dense f64 KKT oracle
(tests/test_lqr.py), so agreement here certifies the blocked scan +
cross-chunk carry exchange — the ICI-collective half of SURVEY.md §2.19's
horizon axis.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_tpu.parallel.lqr_sharded import make_lqt_horizon_sharded
from mpc_tpu.parallel.mesh import make_horizon_mesh
from mpc_tpu.solver.lqr import lqt_solve_parallel


def _random_lqt(rng, Bb=4, N=21, n=4, m=2, with_cross=True):
    def psd(shape_head, d, scale):
        M = rng.normal(0, scale, (*shape_head, d, d)).astype(np.float32)
        return M @ np.swapaxes(M, -1, -2) + 0.3 * np.eye(d, dtype=np.float32)

    A = (np.eye(n, dtype=np.float32)
         + 0.15 * rng.normal(0, 1, (Bb, N, n, n)).astype(np.float32)
         / math.sqrt(n))
    B = rng.normal(0, 0.5, (Bb, N, n, m)).astype(np.float32)
    c = rng.normal(0, 0.1, (Bb, N, n)).astype(np.float32)
    Q = psd((Bb, N), n, 0.4)
    q = rng.normal(0, 0.3, (Bb, N, n)).astype(np.float32)
    R = psd((Bb, N), m, 0.4) + np.eye(m, dtype=np.float32)
    r = rng.normal(0, 0.3, (Bb, N, m)).astype(np.float32)
    QN = psd((), n, 0.4)
    qN = rng.normal(0, 0.3, n).astype(np.float32)
    P = (0.1 * rng.normal(0, 1, (Bb, N, m, n)).astype(np.float32)
         if with_cross else None)
    x0 = rng.normal(0, 0.5, (Bb, n)).astype(np.float32)
    return x0, A, B, c, Q, q, R, r, QN, qN, P


def _reference(x0, A, B, c, Q, q, R, r, QN, qN, P):
    f = jax.vmap(lambda x0_, A_, B_, c_, Q_, q_, R_, r_, P_:
                 lqt_solve_parallel(x0_, A_, B_, c_, Q_, q_, R_, r_,
                                    QN, qN, P=P_))
    Pz = P if P is not None else jnp.zeros(
        (A.shape[0], A.shape[1], R.shape[-1], A.shape[-1]), A.dtype)
    return jax.jit(f)(x0, A, B, c, Q, q, R, r, Pz)


@pytest.mark.parametrize("mesh_shape,N", [
    ((1, 8), 21),   # pure horizon sharding, padding exercised (22 -> 24)
    ((2, 4), 16),   # (scenario, horizon) combined, batch sharded 2-way
    ((1, 8), 7),    # more shards than a chunk per device after padding
])
def test_sharded_matches_single_device(mesh_shape, N):
    ns, nh = mesh_shape
    mesh = make_horizon_mesh(n_scenario=ns, n_horizon=nh,
                             devices=jax.devices()[: ns * nh])
    rng = np.random.default_rng(0)
    x0, A, B, c, Q, q, R, r, QN, qN, P = _random_lqt(rng, Bb=4, N=N)

    solve = jax.jit(make_lqt_horizon_sharded(mesh))
    got = solve(*map(jnp.asarray, (x0, A, B, c, Q, q, R, r, QN, qN, P)))
    ref = _reference(*map(jnp.asarray, (x0, A, B, c, Q, q, R, r, QN, qN, P)))

    np.testing.assert_allclose(np.asarray(got.us), np.asarray(ref.us),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(got.xs), np.asarray(ref.xs),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(got.Ko), np.asarray(ref.Ko),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(got.ko), np.asarray(ref.ko),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(got.Ss), np.asarray(ref.Ss),
                               atol=5e-3, rtol=5e-3)


def test_sharded_no_cross_term():
    mesh = make_horizon_mesh(n_scenario=2, n_horizon=4,
                             devices=jax.devices()[:8])
    rng = np.random.default_rng(1)
    x0, A, B, c, Q, q, R, r, QN, qN, _ = _random_lqt(rng, Bb=2, N=12,
                                                     with_cross=False)
    solve = jax.jit(make_lqt_horizon_sharded(mesh))
    got = solve(*map(jnp.asarray, (x0, A, B, c, Q, q, R, r, QN, qN)))
    ref = _reference(x0, A, B, c, Q, q, R, r, QN, qN, None)
    np.testing.assert_allclose(np.asarray(got.us), np.asarray(ref.us),
                               atol=2e-3, rtol=2e-3)
