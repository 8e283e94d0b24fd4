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
