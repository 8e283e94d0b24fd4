"""Observers: pull named quantities out of a running environment.

Counterpart of ``/root/reference/src/gym_electric_motor/observers/observer.py``.
"""

from __future__ import annotations

import numpy as np


class Observer:
    """observer.py:6-31."""

    def __init__(self, env):
        self.env = env

    def observe(self):
        raise NotImplementedError


class StateObserver(Observer):
    """Reads a single named state (including fused ``<state>_ref`` names) from
    the env's last observation (observer.py:34-55)."""

    def __init__(self, state_name, env):
        super().__init__(env)
        self._state_name = state_name

    def observe(self):
        obs = getattr(self.env, "last_observation", None)
        if obs is None:
            raise RuntimeError("Environment has no observation yet; call reset()/step() first.")
        state, reference = obs
        names = list(self.env.state_names)
        if self._state_name in names:
            return float(np.asarray(state)[names.index(self._state_name)])
        if self._state_name.endswith("_ref"):
            base = self._state_name[:-4]
            ref_names = list(self.env.reference_names)
            if base in ref_names:
                return float(np.asarray(reference)[ref_names.index(base)])
        raise KeyError(
            f"{self._state_name!r} not in states {names} or references "
            f"{list(self.env.reference_names)}"
        )
