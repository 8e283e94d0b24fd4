"""Console printer (console_printer.py:6-90)."""

from __future__ import annotations

import numpy as np

from ..callbacks import ElectricMotorVisualization


class ConsolePrinter(ElectricMotorVisualization):
    """Prints episode statistics (and optionally per-step values) to stdout."""

    def __init__(self, verbose=1, update_freq=1):
        """
        Args:
            verbose(0/1/2): 0: silent, 1: print episode statistics,
                2: additionally print every ``update_freq``-th step.
            update_freq(int): Step printing period for verbose=2.
        """
        super().__init__()
        self._verbose = verbose
        self._update_freq = update_freq
        self._episode = -1
        self._cum_reward = 0.0
        self._steps = 0
        self._violations = 0

    def on_reset_begin(self):
        if self._episode >= 0 and self._verbose >= 1:
            print(
                f"Episode {self._episode} | steps: {self._steps} | "
                f"cumulated reward: {self._cum_reward:.4f} | "
                f"violations: {self._violations}"
            )
        self._episode += 1
        self._cum_reward = 0.0
        self._steps = 0

    def on_step_end(self, k, state, reference, reward, terminated):
        self._steps += 1
        self._cum_reward += float(reward)
        if terminated:
            self._violations += 1
        if self._verbose >= 2 and self._steps % self._update_freq == 0:
            print(
                f"  step {k} | reward {float(reward):.4f} | "
                f"state {np.round(np.asarray(state), 3)}"
            )

    def on_close(self):
        self.on_reset_begin()

    def render(self):
        pass
