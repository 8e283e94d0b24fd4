"""gym_electric_motor_tpu — a TPU-native electric drive simulation framework.

A from-scratch JAX/XLA re-design with the capabilities of
``upb-lea/gym-electric-motor`` (reference mounted at ``/root/reference``):
54 drive environments (9 motor families x {CC, TC, SC} x {Finite, Cont}),
reference generators, rewards, constraints — all expressed as pure jitted
functions that vmap over tens of thousands of env instances and shard over
TPU meshes.
"""

__version__ = "0.1.0"

from . import (
    callbacks,
    constraints,
    controllers,
    core,
    observers,
    ops,
    physical_systems,
    references,
    rewards,
    visualization,
    wrappers,
)
from .core import ElectricMotorEnvironment, VectorEnv
from .envs import ENV_IDS, make, make_functional

# Gymnasium interop (optional dependency): register every env id with the
# global gymnasium registry at import time, exactly like the reference
# (__init__.py:47-283).  gymnasium.make("Finite-CC-PMSM-v0") then returns a
# genuine gymnasium.Env stepping jitted on device.
try:
    from .envs import gymnasium_interop as _gym_interop

    _gym_interop.register_all()
    GymnasiumGemEnv = _gym_interop.GymnasiumGemEnv
except ImportError:  # gymnasium not installed — functional API only
    GymnasiumGemEnv = None

__all__ = [
    "ElectricMotorEnvironment",
    "VectorEnv",
    "make",
    "make_functional",
    "ENV_IDS",
    "core",
    "ops",
    "physical_systems",
    "references",
    "rewards",
    "constraints",
    "wrappers",
]
