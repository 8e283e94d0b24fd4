"""Base controllers of the classic (example-grade) stack.

TPU-first re-design of the reference's secondary controller implementation
(``examples/classic_controllers/controllers/{continuous_controller.py,
pi_controller.py, pid_controller.py, on_off_controller.py,
three_point_controller.py}``).  Each base controller is a frozen host-side
dataclass of gains whose ``control``/``integrate`` methods are pure jittable
functions over a small state pytree — the mutable-attribute objects of the
reference become explicit (params, state) pairs so the whole control loop can
live inside one ``lax.scan``.

Reference semantics kept exactly:

* PI (pi_controller.py:19-23): ``u = Kp e + Ki (integ + e tau)`` with the
  integrator advanced *only* when the superordinate stage's limit check
  passes (anti-windup by conditional integration).
* PID (pid_controller.py:24-33): adds ``Kd (e - e_old)/tau``; ``e_old``
  updates on every ``control`` call, not only when integrating.
* OnOff (on_off_controller.py:26-33): both comparisons use ``+hysteresis``
  (upstream quirk — there is no true hysteresis band; ``e == h`` keeps the
  previous output on a set of measure zero).
* ThreePoint (three_point_controller.py:38-53): stateful three-level
  hysteresis; the positive branch is checked first.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PI:
    """PI base controller (pi_controller.py:4-23)."""

    p_gain: float
    i_gain: float
    tau: float
    kind: str = dataclasses.field(default="cont", init=False)

    def init(self):
        return {"integrated": jnp.zeros(())}

    def control(self, cs, state, reference):
        e = reference - state
        u = self.p_gain * e + self.i_gain * (cs["integrated"] + e * self.tau)
        return u, cs

    def integrate(self, cs, state, reference, do):
        """Advance the integrator iff ``do`` (continuous_controller.py:28-29)."""
        step = jnp.where(do, (reference - state) * self.tau, 0.0)
        return {**cs, "integrated": cs["integrated"] + step}


@dataclasses.dataclass(frozen=True)
class PID:
    """PID base controller (pid_controller.py:5-33)."""

    p_gain: float
    i_gain: float
    d_gain: float
    tau: float
    kind: str = dataclasses.field(default="cont", init=False)

    def init(self):
        return {"integrated": jnp.zeros(()), "e_old": jnp.zeros(())}

    def control(self, cs, state, reference):
        e = reference - state
        u = (self.p_gain * e
             + self.i_gain * (cs["integrated"] + e * self.tau)
             + self.d_gain * (e - cs["e_old"]) / self.tau)
        return u, {**cs, "e_old": e}

    def integrate(self, cs, state, reference, do):
        step = jnp.where(do, (reference - state) * self.tau, 0.0)
        return {**cs, "integrated": cs["integrated"] + step}


@dataclasses.dataclass(frozen=True)
class OnOff:
    """Two-level hysteresis controller (on_off_controller.py:4-36).

    ``switch_off_level`` is 2 for the 1QC/2QC finite converters whose action
    table puts "off" at index 2, else 0 (on_off_controller.py:20).
    """

    hysteresis: float
    switch_on_level: float
    switch_off_level: float
    kind: str = dataclasses.field(default="finite", init=False)

    def init(self):
        return {"action": jnp.asarray(float(self.switch_on_level))}

    def control(self, cs, state, reference):
        e = reference - state
        # Upstream quirk: both branches compare against +hysteresis, so the
        # previous action only survives on the measure-zero event e == h.
        act = jnp.where(e > self.hysteresis, float(self.switch_on_level),
                        jnp.where(e < self.hysteresis,
                                  float(self.switch_off_level), cs["action"]))
        return act, {**cs, "action": act}

    def integrate(self, cs, state, reference, do):
        return cs


@dataclasses.dataclass(frozen=True)
class ThreePoint:
    """Three-level hysteresis controller (three_point_controller.py:4-57)."""

    switch_to_positive_level: float
    switch_to_negative_level: float
    switch_to_neutral_from_positive: float
    switch_to_neutral_from_negative: float
    positive: float
    negative: float
    neutral: float = 0.0
    kind: str = dataclasses.field(default="finite", init=False)

    def init(self):
        return {"recent": jnp.zeros((), jnp.int32)}

    def control(self, cs, state, reference):
        e = reference - state
        recent = cs["recent"]
        go_pos = (e > self.switch_to_positive_level) | (
            (e > self.switch_to_neutral_from_positive) & (recent == 1))
        go_neg = (~go_pos) & ((e < -self.switch_to_negative_level) | (
            (e < -self.switch_to_neutral_from_negative) & (recent == 2)))
        act = jnp.where(go_pos, float(self.positive),
                        jnp.where(go_neg, float(self.negative),
                                  float(self.neutral)))
        new_recent = jnp.where(go_pos, 1, jnp.where(go_neg, 2, 0)).astype(jnp.int32)
        return act, {**cs, "recent": new_recent}

    def integrate(self, cs, state, reference, do):
        return cs
