"""hope_tpu — a TPU-native hybrid parking-planner framework.

Brand-new JAX/XLA/Pallas implementation of the capabilities of the HOPE hybrid
RL + Reeds-Shepp parking planner (reference analyzed in SURVEY.md): a vmapped
kinematic-bicycle simulator with batched collision geometry, analytic Reeds-Shepp
expansion, action-mask exploration guard, transformer observation-fusion policy
trained with SAC/PPO, and a batched iLQR receding-horizon solver — all running
thousands of scenarios in lockstep per device.
"""

__version__ = "0.1.0"

# Honor a caller-set JAX_PLATFORMS before anything can initialize a backend:
# the image's sitecustomize registers the axon TPU plugin and pins the
# platform, silently overriding `JAX_PLATFORMS=cpu` from the command line, and
# some transitive imports (optax/flax) initialize backends at import time —
# after which the platform can no longer be switched.  Must run before any
# hope_tpu submodule import.
import os as _os

_p = _os.environ.get("JAX_PLATFORMS")
if _p and _p != "axon":
    import jax as _jax

    _jax.config.update("jax_platforms", _p)
del _os, _p
