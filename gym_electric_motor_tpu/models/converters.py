"""Power-electronic converter models as branch-free device functions.

The reference implements converters as stateful objects whose ``set_action``
returns data-dependent switching times and whose ``convert``/``i_sup`` methods
branch on Python conditions
(``/root/reference/src/gym_electric_motor/physical_systems/converters.py``).

TPU re-design: every converter is a *static spec* (host) plus pure device
functions over

* ``conv_state`` — an int32 vector of persistent half-bridge switching states
  (the reference's ``_switching_state``; it survives across env steps),
* an action (int scalar for finite, float vector for continuous),
* the motor phase currents.

The data-dependent switching-time loop becomes a **fixed two-sub-interval
schedule**: interval 0 covers the transistor interlocking (dead) time, interval
1 the rest of the control period.  With ``interlocking_time == 0`` (the
default in all 54 reference environments) interval 0 has zero duration and is
statically removed at trace time.

Semantics parity map (reference file converters.py):
  Finite1QC  :218-245   Finite2QC :248-310   Finite4QC :313-368
  Cont1QC    :371-401   Cont2QC   :404-435   Cont4QC   :438-495
  FiniteB6   :743-839   ContB6    :842-911   Multi     :498-740
  NoConverter:114-127
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Half-bridge (2QC) primitives — every finite converter is composed of these.
# Switching states: 0 = both transistors off, 1 = upper on, 2 = lower on.
# ---------------------------------------------------------------------------


def _hb_u(state, i_out):
    """Half-bridge output voltage fraction (converters.py:277-287).

    State 0 freewheels: the body diode conducts (u=1) iff the current is
    negative.
    """
    free = jnp.where(i_out < 0, 1.0, 0.0)
    return jnp.where(state == 1, 1.0, jnp.where(state == 2, 0.0, free))


def _hb_i_sup(state, i_out):
    """Half-bridge supply current (converters.py:289-298)."""
    free = jnp.where(i_out < 0, i_out, 0.0)
    return jnp.where(state == 1, i_out, jnp.where(state == 2, 0.0, free))


def _hb_interlock_pattern(prev_state, action):
    """Interval-0 switching state under interlocking (converters.py:300-310).

    If the commanded state differs from the previous one (and neither is the
    all-off state) both transistors are opened during the dead time.
    """
    no_interlock = (action == 0) | (prev_state == 0) | (action == prev_state)
    return jnp.where(no_interlock, action, 0)


# ---------------------------------------------------------------------------
# Converter spec
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ConverterSpec:
    """Host-side converter description + device closures.

    Device function contracts (all pure, scalar/small-vector -> vmap over
    envs):

    ``bridge_actions(action) -> int32 (n_state,)``
        Commanded half-bridge states for this step (finite only).
    ``u_frac(bridge_states, action, i_out) -> (n_out,)``
        Terminal voltage as a fraction of the supply voltage.
    ``i_sup(bridge_states, action, i_out) -> scalar``
        Supply current. For half-bridge converters this uses the *stored*
        bridge states (which the reference updates lazily inside ``convert``),
        for 1QC/continuous converters the current action.
    """

    kind: str
    action_type: str  # 'finite' | 'cont' | 'none'
    action_space: tuple  # ('discrete', n) | ('box', low, high) | ('multidiscrete', ns)
    n_state: int  # number of persistent half-bridge states
    n_out: int  # output voltage dimensionality
    n_in: int  # current dimensionality fed to the converter
    voltages: tuple  # (low, high) arrays, shape (n_out,)
    currents: tuple  # (low, high) arrays, shape (n_in,)
    interlocking_time: float
    tau: float
    bridge_actions: Optional[Callable] = None
    u_frac: Callable = None
    i_sup: Callable = None
    u_reset: np.ndarray = None  # converter.reset() output voltage fractions
    subsignal_voltage_dims: tuple = None  # for multi converters
    sub_kinds: tuple = None  # sub-converter kinds (multi converters only)
    default_action: object = 0

    @property
    def n_intervals(self) -> int:
        return 2 if (self.action_type == "finite" and self.interlocking_time > 0.0) else 1

    def interval_durations(self) -> tuple:
        if self.n_intervals == 1:
            return (self.tau,)
        return (self.interlocking_time, self.tau - self.interlocking_time)

    def init_state(self):
        return jnp.zeros((self.n_state,), dtype=jnp.int32)

    def interval_states(self, conv_state, action):
        """Per-interval half-bridge states; index 0 applies first.

        Returns a tuple of (n_state,) int arrays of length ``n_intervals``.

        Interlocking semantics follow the reference exactly
        (converters.py:271-276, 300-310): a half-bridge whose commanded state
        differs from its previous state (neither being all-off) is opened for
        the *entire* control cycle — ``convert`` keeps ``pattern[0]`` for both
        sub-intervals because ``t - tau/1000 > start + t_int`` never holds at
        the sub-interval start times, and the stored switching state then ends
        at 0 so the following cycle takes the no-interlock path and applies
        its command immediately.
        """
        if self.action_type != "finite" or self.n_state == 0:
            return (conv_state,) * self.n_intervals
        cmd = self.bridge_actions(action)
        if self.n_intervals == 1:
            return (cmd,)
        inter = _hb_interlock_pattern(conv_state, cmd)
        return (inter, inter)

    def interlock_flag(self, conv_state, action):
        """Traced bool: does any half-bridge interlock this cycle?

        When False the reference emits a *single* sub-interval (its merged
        switching-time list is just ``[t + tau]``), i.e. ``i_sup``/``convert``
        run once and their values hold for the whole control period.  The
        simulate loop uses this flag to freeze the interval-1 signals at the
        interval-0 values in that case.  Returns None when the schedule is
        statically single-interval.
        """
        if self.n_intervals == 1 or self.action_type != "finite" or self.n_state == 0:
            return None
        cmd = self.bridge_actions(action)
        inter = _hb_interlock_pattern(conv_state, cmd)
        return jnp.any(inter != cmd)


# ---------------------------------------------------------------------------
# Elementary finite converters
# ---------------------------------------------------------------------------


def finite_one_quadrant_converter(tau=1e-5, interlocking_time=0.0) -> ConverterSpec:
    def u_frac(bridge_states, action, i_out):
        return jnp.stack([jnp.where(i_out[0] >= 0, action.astype(i_out.dtype), 1.0)])

    def i_sup(bridge_states, action, i_out):
        return jnp.where(action == 1, i_out[0], 0.0)

    return ConverterSpec(
        kind="Finite-1QC",
        action_type="finite",
        action_space=("discrete", 2),
        n_state=0,
        n_out=1,
        n_in=1,
        voltages=(np.zeros(1), np.ones(1)),
        currents=(np.zeros(1), np.ones(1)),
        interlocking_time=interlocking_time,
        tau=tau,
        bridge_actions=None,
        u_frac=u_frac,
        i_sup=i_sup,
        u_reset=np.zeros(1),
    )


def finite_two_quadrant_converter(tau=1e-5, interlocking_time=0.0) -> ConverterSpec:
    def bridge_actions(action):
        return jnp.stack([action]).astype(jnp.int32)

    def u_frac(bridge_states, action, i_out):
        return jnp.stack([_hb_u(bridge_states[0], i_out[0])])

    def i_sup(bridge_states, action, i_out):
        return _hb_i_sup(bridge_states[0], i_out[0])

    return ConverterSpec(
        kind="Finite-2QC",
        action_type="finite",
        action_space=("discrete", 3),
        n_state=1,
        n_out=1,
        n_in=1,
        voltages=(np.zeros(1), np.ones(1)),
        currents=(-np.ones(1), np.ones(1)),
        interlocking_time=interlocking_time,
        tau=tau,
        bridge_actions=bridge_actions,
        u_frac=u_frac,
        i_sup=i_sup,
        u_reset=np.zeros(1),
    )


_4QC_SUB0 = np.array([1, 1, 2, 2], dtype=np.int32)
_4QC_SUB1 = np.array([1, 2, 1, 2], dtype=np.int32)


def finite_four_quadrant_converter(tau=1e-5, interlocking_time=0.0) -> ConverterSpec:
    def bridge_actions(action):
        # arithmetic form of the _4QC_SUB tables (sub0 = 1 + (a >= 2),
        # sub1 = 1 + (a & 1)): a per-step 16k-wide table gather is a slow
        # DynamicGather on TPU, the bit arithmetic stays on the VPU
        a = jnp.asarray(action, jnp.int32)
        return jnp.stack([1 + (a >= 2).astype(jnp.int32),
                          1 + (a & 1)])

    def u_frac(bridge_states, action, i_out):
        # converters.py:350-352 — sub1 sees the negated current
        return jnp.stack([_hb_u(bridge_states[0], i_out[0]) - _hb_u(bridge_states[1], -i_out[0])])

    def i_sup(bridge_states, action, i_out):
        return _hb_i_sup(bridge_states[0], i_out[0]) + _hb_i_sup(bridge_states[1], -i_out[0])

    return ConverterSpec(
        kind="Finite-4QC",
        action_type="finite",
        action_space=("discrete", 4),
        n_state=2,
        n_out=1,
        n_in=1,
        voltages=(-np.ones(1), np.ones(1)),
        currents=(-np.ones(1), np.ones(1)),
        interlocking_time=interlocking_time,
        tau=tau,
        bridge_actions=bridge_actions,
        u_frac=u_frac,
        i_sup=i_sup,
        u_reset=np.zeros(1),
    )


# B6 bridge: Discrete(8) -> 3 half bridges (converters.py:788-797).
_B6_SUBACTIONS = np.array(
    [
        [2, 2, 2],
        [2, 2, 1],
        [2, 1, 2],
        [2, 1, 1],
        [1, 2, 2],
        [1, 2, 1],
        [1, 1, 2],
        [1, 1, 1],
    ],
    dtype=np.int32,
)


def finite_b6_bridge_converter(tau=1e-5, interlocking_time=0.0) -> ConverterSpec:
    def bridge_actions(action):
        # arithmetic form of _B6_SUBACTIONS (phase k upper iff bit (2-k)
        # is set; 1 = high, 2 = low): avoids a per-step table gather
        a = jnp.asarray(action, jnp.int32)
        return jnp.stack([2 - ((a >> 2) & 1), 2 - ((a >> 1) & 1),
                          2 - (a & 1)])

    def u_frac(bridge_states, action, i_out):
        # converters.py:816-823 — each phase offset by -0.5
        return _hb_u(bridge_states, i_out) - 0.5

    def i_sup(bridge_states, action, i_out):
        return jnp.sum(_hb_i_sup(bridge_states, i_out))

    return ConverterSpec(
        kind="Finite-B6C",
        action_type="finite",
        action_space=("discrete", 8),
        n_state=3,
        n_out=3,
        n_in=3,
        voltages=(-np.ones(3), np.ones(3)),
        currents=(-np.ones(3), np.ones(3)),
        interlocking_time=interlocking_time,
        tau=tau,
        bridge_actions=bridge_actions,
        u_frac=u_frac,
        i_sup=i_sup,
        u_reset=np.full(3, -0.5),
    )


# ---------------------------------------------------------------------------
# Continuous (dynamically averaged) converters
# ---------------------------------------------------------------------------


def cont_one_quadrant_converter(tau=1e-4, interlocking_time=0.0) -> ConverterSpec:
    def u_frac(bridge_states, action, i_out):
        a = jnp.clip(action[0], 0.0, 1.0)
        return jnp.stack([jnp.where(i_out[0] >= 0, a, 1.0)])

    def i_sup(bridge_states, action, i_out):
        return jnp.clip(action[0], 0.0, 1.0) * i_out[0]

    return ConverterSpec(
        kind="Cont-1QC",
        action_type="cont",
        action_space=("box", np.zeros(1), np.ones(1)),
        n_state=0,
        n_out=1,
        n_in=1,
        voltages=(np.zeros(1), np.ones(1)),
        currents=(np.zeros(1), np.ones(1)),
        interlocking_time=interlocking_time,
        tau=tau,
        u_frac=u_frac,
        i_sup=i_sup,
        u_reset=np.zeros(1),
        default_action=np.zeros(1),
    )


def _cont_2qc_u(a, i, t_int, tau):
    """Duty cycle minus the interlock discount, clipped (converters.py:148-184)."""
    return jnp.clip(a - jnp.sign(i) * t_int / tau, 0.0, 1.0)


def _cont_2qc_i_sup(a, i, t_int, tau):
    """converters.py:429-435."""
    interlock_cur = jnp.where(i < 0, 1.0, 0.0)
    return (a + t_int / tau * (interlock_cur - a)) * i


def cont_two_quadrant_converter(tau=1e-4, interlocking_time=0.0) -> ConverterSpec:
    ti = interlocking_time

    def u_frac(bridge_states, action, i_out):
        a = jnp.clip(action[0], 0.0, 1.0)
        return jnp.stack([_cont_2qc_u(a, i_out[0], ti, tau)])

    def i_sup(bridge_states, action, i_out):
        a = jnp.clip(action[0], 0.0, 1.0)
        return _cont_2qc_i_sup(a, i_out[0], ti, tau)

    return ConverterSpec(
        kind="Cont-2QC",
        action_type="cont",
        action_space=("box", np.zeros(1), np.ones(1)),
        n_state=0,
        n_out=1,
        n_in=1,
        voltages=(np.zeros(1), np.ones(1)),
        currents=(-np.ones(1), np.ones(1)),
        interlocking_time=interlocking_time,
        tau=tau,
        u_frac=u_frac,
        i_sup=i_sup,
        u_reset=np.zeros(1),
        default_action=np.zeros(1),
    )


def cont_four_quadrant_converter(tau=1e-4, interlocking_time=0.0) -> ConverterSpec:
    ti = interlocking_time

    def u_frac(bridge_states, action, i_out):
        a = jnp.clip(action[0], -1.0, 1.0)
        d1 = 0.5 * (a + 1.0)
        d2 = -0.5 * (a - 1.0)
        i = i_out[0]
        # converters.py:481-483 — both sub-2QCs see the same current
        return jnp.stack([_cont_2qc_u(d1, i, ti, tau) - _cont_2qc_u(d2, i, ti, tau)])

    def i_sup(bridge_states, action, i_out):
        a = jnp.clip(action[0], -1.0, 1.0)
        d1 = 0.5 * (a + 1.0)
        d2 = -0.5 * (a - 1.0)
        i = i_out[0]
        return _cont_2qc_i_sup(d1, i, ti, tau) + _cont_2qc_i_sup(d2, -i, ti, tau)

    return ConverterSpec(
        kind="Cont-4QC",
        action_type="cont",
        action_space=("box", -np.ones(1), np.ones(1)),
        n_state=0,
        n_out=1,
        n_in=1,
        voltages=(-np.ones(1), np.ones(1)),
        currents=(-np.ones(1), np.ones(1)),
        interlocking_time=interlocking_time,
        tau=tau,
        u_frac=u_frac,
        i_sup=i_sup,
        u_reset=np.zeros(1),
        default_action=np.zeros(1),
    )


def cont_b6_bridge_converter(tau=1e-4, interlocking_time=0.0) -> ConverterSpec:
    ti = interlocking_time

    def u_frac(bridge_states, action, i_out):
        d = 0.5 * (jnp.clip(action, -1.0, 1.0) + 1.0)
        return _cont_2qc_u(d, i_out, ti, tau) - 0.5

    def i_sup(bridge_states, action, i_out):
        d = 0.5 * (jnp.clip(action, -1.0, 1.0) + 1.0)
        return jnp.sum(_cont_2qc_i_sup(d, i_out, ti, tau))

    return ConverterSpec(
        kind="Cont-B6C",
        action_type="cont",
        action_space=("box", -np.ones(3), np.ones(3)),
        n_state=0,
        n_out=3,
        n_in=3,
        voltages=(-np.ones(3), np.ones(3)),
        currents=(-np.ones(3), np.ones(3)),
        interlocking_time=interlocking_time,
        tau=tau,
        u_frac=u_frac,
        i_sup=i_sup,
        u_reset=np.full(3, -0.5),
        default_action=np.zeros(3),
    )


def no_converter(tau=1e-4, n_phases=3) -> ConverterSpec:
    """Direct supply feed-through (converters.py:114-127)."""

    def u_frac(bridge_states, action, i_out):
        return jnp.ones((n_phases,), dtype=i_out.dtype)

    def i_sup(bridge_states, action, i_out):
        return i_out[0]

    return ConverterSpec(
        kind="NoConverter",
        action_type="none",
        action_space=("box", np.zeros(0), np.zeros(0)),
        n_state=0,
        n_out=n_phases,
        n_in=n_phases,
        voltages=(np.zeros(n_phases), np.ones(n_phases)),
        currents=(np.zeros(n_phases), np.ones(n_phases)),
        interlocking_time=0.0,
        tau=tau,
        u_frac=u_frac,
        i_sup=i_sup,
        u_reset=np.ones(n_phases),
        default_action=np.zeros(0),
    )


# ---------------------------------------------------------------------------
# Multi converters (finite & continuous)
# ---------------------------------------------------------------------------


def _multi(subs, finite: bool, tau, interlocking_time) -> ConverterSpec:
    n_state = sum(s.n_state for s in subs)
    n_out = sum(s.n_out for s in subs)
    n_in = sum(s.n_in for s in subs)
    state_offsets = np.cumsum([0] + [s.n_state for s in subs])
    in_offsets = np.cumsum([0] + [s.n_in for s in subs])

    if finite:
        def bridge_actions(action):
            parts = [
                s.bridge_actions(action[k]) for k, s in enumerate(subs) if s.n_state > 0
            ]
            return jnp.concatenate(parts) if parts else jnp.zeros((0,), jnp.int32)

        action_space = ("multidiscrete", tuple(s.action_space[1] for s in subs))
        default_action = np.zeros(len(subs), dtype=np.int64)
    else:
        bridge_actions = None
        action_space = (
            "box",
            np.concatenate([s.action_space[1] for s in subs]),
            np.concatenate([s.action_space[2] for s in subs]),
        )
        default_action = np.concatenate([np.atleast_1d(s.default_action) for s in subs])

    act_offsets = np.cumsum([0] + [(1 if finite else s.action_space[1].shape[0]) for s in subs])

    def _sub_action(action, k):
        if finite:
            return action[k]
        return action[act_offsets[k]: act_offsets[k + 1]]

    def u_frac(bridge_states, action, i_out):
        parts = []
        for k, s in enumerate(subs):
            bs = bridge_states[state_offsets[k]: state_offsets[k + 1]]
            io = i_out[in_offsets[k]: in_offsets[k + 1]]
            parts.append(s.u_frac(bs, _sub_action(action, k), io))
        return jnp.concatenate(parts)

    def i_sup(bridge_states, action, i_out):
        total = 0.0
        for k, s in enumerate(subs):
            bs = bridge_states[state_offsets[k]: state_offsets[k + 1]]
            io = i_out[in_offsets[k]: in_offsets[k + 1]]
            total = total + s.i_sup(bs, _sub_action(action, k), io)
        return total

    return ConverterSpec(
        kind="Finite-Multi" if finite else "Cont-Multi",
        action_type="finite" if finite else "cont",
        action_space=action_space,
        n_state=n_state,
        n_out=n_out,
        n_in=n_in,
        voltages=(
            np.concatenate([s.voltages[0] for s in subs]),
            np.concatenate([s.voltages[1] for s in subs]),
        ),
        currents=(
            np.concatenate([s.currents[0] for s in subs]),
            np.concatenate([s.currents[1] for s in subs]),
        ),
        interlocking_time=interlocking_time,
        tau=tau,
        bridge_actions=bridge_actions,
        u_frac=u_frac,
        i_sup=i_sup,
        u_reset=np.concatenate([s.u_reset for s in subs]),
        subsignal_voltage_dims=tuple(s.n_out for s in subs),
        sub_kinds=tuple(s.kind for s in subs),
        default_action=default_action,
    )


def finite_multi_converter(subconverters, tau=1e-5, interlocking_time=0.0) -> ConverterSpec:
    return _multi(list(subconverters), True, tau, interlocking_time)


def cont_multi_converter(subconverters, tau=1e-4, interlocking_time=0.0) -> ConverterSpec:
    return _multi(list(subconverters), False, tau, interlocking_time)




def finite_asymmetric_bridge_converter(tau=1e-5, n_phases=3,
                                       interlocking_time=0.0) -> ConverterSpec:
    """Per-phase asymmetric half-bridge for the SRM (EXTENSION — the
    reference stubs the SRM entirely).  Action per phase:
    0 = freewheel (both switches off through one switch + one diode,
    u = 0), 1 = magnetize (+u_sup), 2 = demagnetize (both switches off,
    both diodes conduct, -u_sup back to the link).  Demagnetizing
    RETURNS current to the DC link (i_sup contribution -i); the motor
    clamps phase currents at zero (ideal diodes stop conducting)."""
    assert interlocking_time == 0.0, (
        "the asymmetric bridge has no shoot-through path — interlocking "
        "dead time does not apply")

    def u_frac(bridge_states, action, i_out):
        mag = (action == 1).astype(i_out.dtype)
        dem = (action == 2).astype(i_out.dtype)
        return mag - dem

    def i_sup(bridge_states, action, i_out):
        mag = (action == 1).astype(i_out.dtype)
        dem = (action == 2).astype(i_out.dtype)
        return jnp.sum((mag - dem) * i_out)

    return ConverterSpec(
        kind="Finite-ASYM",
        action_type="finite",
        action_space=("multidiscrete", [3] * n_phases),
        n_state=0,
        n_out=n_phases,
        n_in=n_phases,
        voltages=(-np.ones(n_phases), np.ones(n_phases)),
        currents=(np.zeros(n_phases), np.ones(n_phases)),
        interlocking_time=0.0,
        tau=tau,
        u_frac=u_frac,
        i_sup=i_sup,
        u_reset=np.zeros(n_phases),
        default_action=np.zeros(n_phases, dtype=int),
    )


def cont_asymmetric_bridge_converter(tau=1e-4, n_phases=3,
                                     interlocking_time=0.0) -> ConverterSpec:
    """Dynamically-averaged asymmetric bridge: duty d in [-1, 1] per phase
    gives u = d * u_sup; i_sup = sum(d_k i_k) (magnetizing duty draws,
    demagnetizing returns)."""
    assert interlocking_time == 0.0, (
        "the asymmetric bridge has no shoot-through path — interlocking "
        "dead time does not apply")

    def u_frac(bridge_states, action, i_out):
        return jnp.clip(action, -1.0, 1.0)

    def i_sup(bridge_states, action, i_out):
        return jnp.sum(jnp.clip(action, -1.0, 1.0) * i_out)

    return ConverterSpec(
        kind="Cont-ASYM",
        action_type="cont",
        action_space=("box", -np.ones(n_phases), np.ones(n_phases)),
        n_state=0,
        n_out=n_phases,
        n_in=n_phases,
        voltages=(-np.ones(n_phases), np.ones(n_phases)),
        currents=(np.zeros(n_phases), np.ones(n_phases)),
        interlocking_time=0.0,
        tau=tau,
        u_frac=u_frac,
        i_sup=i_sup,
        u_reset=np.zeros(n_phases),
        default_action=np.zeros(n_phases),
    )


CONVERTER_FACTORIES = {
    "Finite-1QC": finite_one_quadrant_converter,
    "Finite-2QC": finite_two_quadrant_converter,
    "Finite-4QC": finite_four_quadrant_converter,
    "Finite-B6C": finite_b6_bridge_converter,
    "Cont-1QC": cont_one_quadrant_converter,
    "Cont-2QC": cont_two_quadrant_converter,
    "Cont-4QC": cont_four_quadrant_converter,
    "Cont-B6C": cont_b6_bridge_converter,
    "Finite-Multi": finite_multi_converter,
    "Cont-Multi": cont_multi_converter,
    "NoConverter": no_converter,
    "Finite-ASYM": finite_asymmetric_bridge_converter,
    "Cont-ASYM": cont_asymmetric_bridge_converter,
}
