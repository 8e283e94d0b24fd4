"""Classic controller stack — the secondary, example-grade controller
implementation shipped by the reference in
``examples/classic_controllers/`` (classic_controllers.py + 17 controller
modules), rebuilt TPU-first: host-side automated design + symmetric-optimum
tuning, pure jittable control laws, scan-based rollouts.

Usage mirrors the reference::

    from gym_electric_motor_tpu.classic import Controller
    ctrl = Controller.make(env)                 # auto design + tune
    out = ctrl.control_environment(env, 10000)  # on-device closed loop
"""

from .base import PI, PID, OnOff, ThreePoint
from .controller import (ClassicController, Controller,
                         automated_controller_design, automated_gain)
from .induction import flux_observer_init, flux_observer_step

__all__ = [
    "Controller", "ClassicController", "PI", "PID", "OnOff", "ThreePoint",
    "automated_controller_design", "automated_gain",
    "flux_observer_init", "flux_observer_step",
]
