"""Auto-tuned classical controllers for every environment.

TPU-native counterpart of the reference's ``gem_controllers`` package
(``/root/reference/src/gem_controllers/``): the mutable stage objects become a
host-side *tuner* that computes all gains/limits and emits a pure
``control(ctrl_state, state, reference) -> (ctrl_state', action)`` function,
so the whole closed loop (controller + environment) runs jitted, vmapped over
env batches and scanned over time on device.
"""

from . import readers
from .srm import SRMCommutationController  # noqa: F401
from .controller import GemController
from .reference_plotter import ReferencePlotter

__all__ = ["GemController", "SRMCommutationController", "ReferencePlotter", "readers"]
