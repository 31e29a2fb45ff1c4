"""hope_tpu — a TPU-native hybrid parking-planner framework.

Brand-new JAX/XLA/Pallas implementation of the capabilities of the HOPE hybrid
RL + Reeds-Shepp parking planner (reference analyzed in SURVEY.md): a vmapped
kinematic-bicycle simulator with batched collision geometry, analytic Reeds-Shepp
expansion, action-mask exploration guard, transformer observation-fusion policy
trained with SAC/PPO, and a batched iLQR receding-horizon solver — all running
thousands of scenarios in lockstep per device.
"""

__version__ = "0.1.0"
