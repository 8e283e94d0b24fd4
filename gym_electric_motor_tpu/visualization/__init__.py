"""Visualization: motor dashboard, plots and console printer.

Counterpart of ``/root/reference/src/gym_electric_motor/visualization/``.
The dashboard is a host-side matplotlib consumer fed either

* live, per step, through the callback bus of the single-env
  :class:`~gym_electric_motor_tpu.envs.gym_adapter.GymnasiumEnv` (the
  reference's own update path, ``motor_dashboard.py:110-160``), or
* in bulk from a recorded device rollout via :meth:`MotorDashboard.plot_rollout`
  — the TPU-native path where trajectories are produced by jitted scans and
  only downsampled buffers cross to the host.
"""

from .console_printer import ConsolePrinter
from .motor_dashboard import (MotorDashboard, MotorDashboardLegacy, RenderMode)
from .motor_dashboard_plots import (
    ActionPlot,
    CumulativeConstraintViolationPlot,
    EpisodeLengthPlot,
    EpisodePlot,
    ExternallyReferencedStatePlot,
    ExternalPlot,
    MeanEpisodeRewardPlot,
    MotorDashboardPlot,
    RewardPlot,
    StatePlot,
    StepPlot,
    TimePlot,
)

__all__ = [
    "MotorDashboard", "MotorDashboardLegacy", "RenderMode", "ConsolePrinter",
    "MotorDashboardPlot", "TimePlot", "EpisodePlot", "StepPlot",
    "StatePlot", "ActionPlot", "RewardPlot",
    "ExternalPlot", "ExternallyReferencedStatePlot",
    "EpisodeLengthPlot", "MeanEpisodeRewardPlot", "CumulativeConstraintViolationPlot",
]
