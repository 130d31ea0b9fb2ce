"""mpc_tpu — a TPU-native model-predictive-control framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``panagiotou23/model-predictive-control`` (CasADi + alpaqa, CPU): batched
vehicle/chain MPC with an ALM + PANOC(+L-BFGS) trajectory optimizer, scaled
over TPU device meshes via pjit/shard_map.

Layering (see SURVEY.md):
  models/    — parameter pytrees, bicycle & hanging-chain ODEs, RK4 discretizer
  ops/       — road geometry, Bezier paths, stage costs, potential fields
  solver/    — Problem container, PANOC inner solver, ALM outer loop
  control/   — MPC controllers (warm-started, event-triggered, simple)
  parallel/  — mesh construction, sharded batched solves
  decision/  — game-theoretic lane-change layer
  sim/       — closed-loop drivers and scenario suites
  viz/       — plotting / animation utilities
  utils/     — timing, metrics, checkpointing
"""

__version__ = "0.1.0"

from mpc_tpu.config import AlmConfig, MpcConfig, PanocConfig  # noqa: F401
from mpc_tpu.models.params import ChainParams, VehicleParams  # noqa: F401
