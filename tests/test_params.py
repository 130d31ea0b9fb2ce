"""VehicleParams pytree: values, vector layout, batching."""

import jax
import jax.numpy as jnp
import numpy as np

from mpc_tpu.models.params import PARAM_FIELDS, ChainParams, VehicleParams

# The reference's physical constants (dynamics.py:4-42, main.py:83-111).
REFERENCE_VALUES = {
    "length": 9.7e-2, "axis_front": 4.7e-2, "axis_rear": 5e-2,
    "front": 0.09, "rear": 0.07, "width": 8e-2, "height": 5.5e-2,
    "mass": 0.1735, "inertia": 18.3e-5,
    "max_steer": 0.32, "max_drive": 1.0,
    "bf": 0.268, "cf": 2.165, "df": 3.47,
    "br": 0.242, "cr": 2.38, "dr": 2.84,
    "cm1": 0.266, "cm2": 0.1, "cr0": 0.1025, "cr1": 0.1629, "cr2": 0.0011,
}


def test_default_values_match_reference():
    p = VehicleParams()
    for name, val in REFERENCE_VALUES.items():
        assert np.isclose(getattr(p, name), val), name
    assert p.friction == 1.0 and p.acceleration == 2.0


def test_vector_roundtrip_and_order():
    p = VehicleParams()
    v = p.to_vector()
    assert v.shape == (22,)
    # canonical flat order from main.py:88-111
    expected = np.array([REFERENCE_VALUES[f] for f in PARAM_FIELDS], np.float32)
    np.testing.assert_allclose(np.asarray(v), expected, rtol=1e-6)
    p2 = VehicleParams.from_vector(v)
    np.testing.assert_allclose(np.asarray(p2.to_vector()), expected, rtol=1e-6)


def test_params_is_pytree_and_batches():
    p = VehicleParams()
    leaves = jax.tree_util.tree_leaves(p)
    assert len(leaves) == 24  # 22 + friction + acceleration
    # batched params: one leaf promoted to a batch axis still flattens
    pb = VehicleParams(mass=jnp.ones(16) * 0.1735)
    stacked = jax.tree_util.tree_map(lambda x: x, pb)
    assert stacked.mass.shape == (16,)


def test_chain_params():
    cp = ChainParams()
    v = cp.to_vector()
    np.testing.assert_allclose(np.asarray(v), [0.03, 1.6, 0.033 / 6], rtol=1e-6)
    cp2 = ChainParams.from_vector(v)
    assert np.isclose(cp2.D, 1.6)
