"""Constraints and the constraint monitor.

Counterpart of ``/root/reference/src/gym_electric_motor/constraints.py`` and
the ``ConstraintMonitor`` (``core.py:756-844``).  All checks are fused
elementwise reductions over the normalized state vector; the merge function
('max' | 'product' | callable) combines per-constraint violation degrees in
[0, 1]; a merged degree >= 1 terminates the episode.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class LimitConstraint:
    """1.0 if any observed |state_i| > 1 (constraints.py:32-68)."""

    observed_state_names: object = "all_states"
    _mask: np.ndarray = None

    def bind(self, state_names, limits, state_space_high):
        names = self.observed_state_names
        if names == "all_states" or "all_states" in names:
            names = list(state_names)
        mask = np.zeros(len(state_names), dtype=bool)
        for n in names or []:
            mask[list(state_names).index(n)] = True
        return dataclasses.replace(self, _mask=mask)

    def __call__(self, state):
        mask = jnp.asarray(self._mask)
        violated = jnp.any(mask & (jnp.abs(state) > 1.0))
        return violated.astype(state.dtype)


@dataclasses.dataclass
class SquaredConstraint:
    """1.0 if sum_i (s_i / s_max)^2 > 1 over the observed states
    (constraints.py:71-98) — the dq current-circle constraint."""

    states: tuple = ()
    _indices: np.ndarray = None
    _limits: np.ndarray = None
    _normalized: bool = True

    def bind(self, state_names, limits, state_space_high):
        idx = np.array([list(state_names).index(s) for s in self.states], dtype=np.int32)
        lims = np.asarray(limits)[idx]
        normalized = not np.all(np.asarray(state_space_high)[idx] == lims)
        return dataclasses.replace(self, _indices=idx, _limits=lims, _normalized=normalized)

    def __call__(self, state):
        s = state[jnp.asarray(self._indices)]
        if not self._normalized:
            s = s / jnp.asarray(self._limits, dtype=state.dtype)
        return (jnp.sum(s * s) > 1.0).astype(state.dtype)


@dataclasses.dataclass
class ConstraintMonitor:
    """Merges per-constraint violation degrees (core.py:756-844)."""

    constraints: tuple = ()
    merge_violations: object = "max"  # 'max' | 'product' | callable

    def bind(self, state_names, limits, state_space_high):
        bound = []
        for c in self.constraints:
            if isinstance(c, str):
                c = LimitConstraint((c,))
            if hasattr(c, "bind"):
                c = c.bind(state_names, limits, state_space_high)
            bound.append(c)
        return dataclasses.replace(self, constraints=tuple(bound))

    def check_constraints(self, state):
        if not self.constraints:
            return jnp.zeros((), dtype=state.dtype)
        degrees = jnp.stack([c(state) for c in self.constraints])
        if self.merge_violations == "max":
            return jnp.max(degrees)
        if self.merge_violations == "product":
            return 1.0 - jnp.prod(1.0 - degrees)
        return self.merge_violations(degrees)
