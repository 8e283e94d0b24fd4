"""Physical-system wrappers (state/action processors).

Functional counterparts of
``/root/reference/src/gym_electric_motor/physical_system_wrappers/``: each
wrapper composes around a physical-system builder, rewriting the state-vector
metadata on the host and the pure ``reset``/``simulate`` functions on device.
Wrapper-local dynamic state (dead-time action buffers, the flux-observer
integrator, noise keys) is carried in a :class:`WrappedState` pytree alongside
the inner physics state, so every wrapper stays vmap/scan/shard-compatible.

Parity map (reference file:line):
  CosSinProcessor          cos_sin_processor.py:7-100
  CurrentSumProcessor      current_sum_processor.py:7-66
  DeadTimeProcessor        dead_time_processor.py:9-88
  FluxObserver             flux_observer.py:9-110
  DqToAbcActionProcessor   dq_to_abc_action_processor.py:8-170
  StateNoiseProcessor      state_noise_processor.py:4-98
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .ops.transforms import abc_to_alphabeta, dq_to_abc
from .utils.pytree import struct


@struct
class WrappedState:
    """Pytree carrying the inner physics state plus wrapper-local state."""

    inner: object
    extra: object

    # The env core reads step/time counters off the physics state; forward
    # them through arbitrarily nested wrappers.
    @property
    def k(self):
        return self.inner.k

    @property
    def t(self):
        return self.inner.t


class PhysicalSystemWrapper:
    """Base delegating wrapper (physical_system_wrapper.py:6-129)."""

    def __init__(self, physical_system=None):
        self.inner = None
        if physical_system is not None:
            self.set_physical_system(physical_system)

    # -- host-side wiring --

    def set_physical_system(self, physical_system):
        self.inner = physical_system
        self.state_names = list(physical_system.state_names)
        self.state_positions = {n: i for i, n in enumerate(self.state_names)}
        self.limits = np.asarray(physical_system.limits)
        self.nominal_state = np.asarray(physical_system.nominal_state)
        self.state_space_low = np.asarray(physical_system.state_space_low)
        self.state_space_high = np.asarray(physical_system.state_space_high)
        return self

    # -- delegated metadata --

    @property
    def tau(self):
        return self.inner.tau

    @property
    def action_space(self):
        return self.inner.action_space

    @property
    def load(self):
        return self.inner.load

    @property
    def motor(self):
        return self.inner.motor

    @property
    def converter(self):
        return self.inner.converter

    @property
    def supply(self):
        return self.inner.supply

    @property
    def unwrapped(self):
        return self.inner.unwrapped if isinstance(self.inner, PhysicalSystemWrapper) else self.inner

    # -- device functions (default: passthrough) --

    @property
    def reset_n_u(self):
        """Uniform slots the composed reset consumes; None disables the
        env's single-pass reset fast path (core.py) — wrappers that draw
        their own randomness (StateNoiseProcessor) override with None."""
        return getattr(self.inner, "reset_n_u", None)

    def reset(self, key):
        return self._wrap_reset(*self.inner.reset(key))

    def reset_from_u(self, u):
        return self._wrap_reset(*self.inner.reset_from_u(u))

    def _wrap_reset(self, state, system_state):
        """Hook: build the wrapper state / transform the observation from
        the inner reset result (key-free for every wrapper except
        StateNoiseProcessor, which overrides reset itself)."""
        return state, system_state

    def simulate(self, state, action, noise=None):
        return self.inner.simulate(state, action, noise)


class CosSinProcessor(PhysicalSystemWrapper):
    """Appends cos(angle*pi), sin(angle*pi) of a normalized angle state;
    optionally removes the angle (cos_sin_processor.py:7-100)."""

    def __init__(self, angle="epsilon", physical_system=None, remove_angle=False):
        self._angle = angle
        self._remove_angle = remove_angle
        super().__init__(physical_system)

    def set_physical_system(self, physical_system):
        super().set_physical_system(physical_system)
        self._angle_index = physical_system.state_positions[self._angle]
        rm = [self._angle_index] if self._remove_angle else []
        self._keep = np.array(
            [i for i in range(len(self.state_names)) if i not in rm], dtype=np.int32
        )
        self.limits = np.concatenate([self.limits[self._keep], [1.0, 1.0]])
        self.nominal_state = np.concatenate([self.nominal_state[self._keep], [1.0, 1.0]])
        self.state_space_low = np.concatenate([self.state_space_low[self._keep], [-1.0, -1.0]])
        self.state_space_high = np.concatenate([self.state_space_high[self._keep], [1.0, 1.0]])
        self.state_names = [self.state_names[i] for i in self._keep] + [
            f"cos({self._angle})", f"sin({self._angle})",
        ]
        self.state_positions = {n: i for i, n in enumerate(self.state_names)}
        return self

    def _transform(self, system_state):
        angle = system_state[self._angle_index] * jnp.pi
        out = system_state[jnp.asarray(self._keep)]
        return jnp.concatenate([out, jnp.stack([jnp.cos(angle), jnp.sin(angle)])])

    def _wrap_reset(self, state, system_state):
        return state, self._transform(system_state)

    def simulate(self, state, action, noise=None):
        state, system_state = self.inner.simulate(state, action, noise)
        return state, self._transform(system_state)


class CurrentSumProcessor(PhysicalSystemWrapper):
    """Appends i_sum = sum of the (normalized) named currents
    (current_sum_processor.py:7-66)."""

    def __init__(self, currents, limit="max", physical_system=None):
        self._currents = tuple(currents)
        assert limit in ("max", "sum")
        self._limit = max if limit == "max" else np.sum
        super().__init__(physical_system)

    def set_physical_system(self, physical_system):
        super().set_physical_system(physical_system)
        self._idx = np.array(
            [physical_system.state_positions[c] for c in self._currents], dtype=np.int32
        )
        lim = self._limit(self.limits[self._idx])
        nom = self._limit(self.nominal_state[self._idx])
        self.limits = np.concatenate([self.limits, [lim]])
        self.nominal_state = np.concatenate([self.nominal_state, [nom]])
        self.state_space_low = np.concatenate([self.state_space_low, [-1.0]])
        self.state_space_high = np.concatenate([self.state_space_high, [1.0]])
        self.state_names = self.state_names + ["i_sum"]
        self.state_positions = {n: i for i, n in enumerate(self.state_names)}
        return self

    def _transform(self, system_state):
        s = jnp.sum(system_state[jnp.asarray(self._idx)])
        return jnp.concatenate([system_state, jnp.stack([s])])

    def _wrap_reset(self, state, system_state):
        return state, self._transform(system_state)

    def simulate(self, state, action, noise=None):
        state, system_state = self.inner.simulate(state, action, noise)
        return state, self._transform(system_state)


class DeadTimeProcessor(PhysicalSystemWrapper):
    """Delays actions by ``steps`` control periods (dead_time_processor.py:9-88).

    The reference's deque becomes a fixed (steps, ...) buffer in the wrapper
    state: ``simulate`` applies ``buffer[-1]`` and shifts the new action in at
    position 0.
    """

    def __init__(self, steps=1, physical_system=None):
        assert steps > 0
        self.dead_time = int(steps)
        super().__init__(physical_system)

    def _zero_action(self):
        kind = self.inner.action_space[0]
        if kind == "discrete":
            return jnp.zeros((), jnp.int32)
        if kind == "multidiscrete":
            return jnp.zeros((len(self.inner.action_space[1]),), jnp.int32)
        return jnp.zeros(np.asarray(self.inner.action_space[1]).shape, jnp.float32)

    def _wrap_reset(self, state, system_state):
        zero = self._zero_action()
        buf = jnp.stack([zero] * self.dead_time)
        return WrappedState(inner=state, extra=buf), system_state

    def simulate(self, state, action, noise=None):
        buf = state.extra
        active = buf[-1]
        action = jnp.asarray(action, dtype=buf.dtype)
        buf = jnp.concatenate([action[None], buf[:-1]], axis=0)
        inner, system_state = self.inner.simulate(state.inner, active, noise)
        return WrappedState(inner=inner, extra=buf), system_state


class FluxObserver(PhysicalSystemWrapper):
    """Appends psi_abs, psi_angle estimated by a complex flux integrator for
    induction machines (flux_observer.py:9-110)."""

    def __init__(self, current_names=("i_sa", "i_sb", "i_sc"), physical_system=None):
        self._current_names = tuple(current_names)
        super().__init__(physical_system)

    def set_physical_system(self, physical_system):
        super().set_physical_system(physical_system)
        mp = physical_system.motor.parameter
        self._l_m = float(mp["l_m"])
        self._l_r = float(mp["l_m"] + mp["l_sigr"])
        self._r_r = float(mp["r_r"])
        self._p = float(mp["p"])
        psi_limit = self._l_m * float(
            self.limits[physical_system.state_positions["i_sd"]]
        )
        self._i_idx = np.array(
            [physical_system.state_positions[n] for n in self._current_names], dtype=np.int32
        )
        self._omega_idx = physical_system.state_positions["omega"]
        self._inner_limits = np.asarray(self.limits)
        self.limits = np.concatenate([self.limits, [psi_limit, np.pi]])
        self.nominal_state = np.concatenate([self.nominal_state, [psi_limit, np.pi]])
        self.state_space_low = np.concatenate([self.state_space_low, [-psi_limit, -np.pi]])
        self.state_space_high = np.concatenate([self.state_space_high, [psi_limit, np.pi]])
        self.state_names = self.state_names + ["psi_abs", "psi_angle"]
        self.state_positions = {n: i for i, n in enumerate(self.state_names)}
        return self

    def _wrap_reset(self, state, system_state):
        psi = jnp.zeros((2,), dtype=system_state.dtype)
        out = jnp.concatenate([system_state, jnp.zeros((2,), system_state.dtype)])
        return WrappedState(inner=state, extra=psi), out

    def simulate(self, state, action, noise=None):
        inner, system_state = self.inner.simulate(state.inner, action, noise)
        denorm = system_state * jnp.asarray(self._inner_limits, system_state.dtype)
        i_abc = denorm[jnp.asarray(self._i_idx)]
        omega_el = denorm[self._omega_idx] * self._p
        i_ab = abc_to_alphabeta(i_abc)
        psi = state.extra
        c = self._r_r * self._l_m / self._l_r
        a = self._r_r / self._l_r
        # delta = i*c - psi*(a - j*omega)  (flux_observer.py:93-99)
        delta_re = i_ab[0] * c - (psi[0] * a + psi[1] * omega_el)
        delta_im = i_ab[1] * c - (psi[1] * a - psi[0] * omega_el)
        psi = psi + jnp.stack([delta_re, delta_im]) * self.inner.tau
        psi_abs = jnp.sqrt(psi[0] ** 2 + psi[1] ** 2)
        psi_angle = jnp.arctan2(psi[1], psi[0])
        out = jnp.concatenate([denorm, jnp.stack([psi_abs, psi_angle])]) / jnp.asarray(
            self.limits, system_state.dtype
        )
        return WrappedState(inner=inner, extra=psi), out


class StateNoiseProcessor(PhysicalSystemWrapper):
    """Adds random noise onto selected states (state_noise_processor.py:4-98).

    On-device redesign: instead of host-batched numpy draws, one sample per
    step is drawn from a key carried in the wrapper state.  Supported
    distributions: 'normal', 'laplace', 'uniform' (loc/scale kwargs).
    """

    def __init__(self, states, random_dist="normal", random_kwargs=(),
                 physical_system=None):
        self._states = states
        self._random_dist = random_dist
        self._random_kwargs = dict(random_kwargs)
        assert random_dist in ("normal", "laplace", "uniform")
        super().__init__(physical_system)

    def set_physical_system(self, physical_system):
        super().set_physical_system(physical_system)
        names = self.state_names if self._states == "all" else self._states
        self._idx = np.array(
            [physical_system.state_positions[s] for s in names], dtype=np.int32
        )
        return self

    def _draw(self, key, dtype):
        n = len(self._idx)
        loc = self._random_kwargs.get("loc", 0.0)
        scale = self._random_kwargs.get("scale", 1.0)
        if self._random_dist == "normal":
            return loc + scale * jax.random.normal(key, (n,), dtype)
        if self._random_dist == "laplace":
            return loc + scale * jax.random.laplace(key, (n,), dtype)
        low = self._random_kwargs.get("low", 0.0)
        high = self._random_kwargs.get("high", 1.0)
        return jax.random.uniform(key, (n,), dtype, low, high)

    def _apply(self, key, system_state):
        noise = self._draw(key, system_state.dtype)
        return system_state.at[jnp.asarray(self._idx)].add(noise)

    @property
    def reset_n_u(self):
        # draws its own noise + carries a key: opts out of the env's
        # single-pass reset fast path
        return None

    def reset(self, key):
        k_inner, k_noise, k_carry = jax.random.split(key, 3)
        state, system_state = self.inner.reset(k_inner)
        return (
            WrappedState(inner=state, extra=k_carry),
            self._apply(k_noise, system_state),
        )

    def simulate(self, state, action, noise=None):
        k_noise, k_carry = jax.random.split(state.extra)
        inner, system_state = self.inner.simulate(state.inner, action, noise)
        return (
            WrappedState(inner=inner, extra=k_carry),
            self._apply(k_noise, system_state),
        )


class DqToAbcActionProcessor(PhysicalSystemWrapper):
    """Exposes a dq action interface over an abc-actuated three-phase system
    (dq_to_abc_action_processor.py:8-170).

    The advance angle is ``eps + (0.5 + dead_time) * tau * omega * p``
    evaluated on the *previous* step's denormalized state, which the wrapper
    carries in its state."""

    _registry = {}

    @classmethod
    def register(cls, motor_types):
        def wrapper(fn):
            for m in motor_types:
                cls._registry[m] = fn
            return fn
        return wrapper

    @classmethod
    def make(cls, motor_type, *args, **kwargs):
        assert motor_type in cls._registry, f"Unsupported motor type {motor_type}"
        return cls._registry[motor_type](*args, **kwargs)

    def __init__(self, angle_name="epsilon", physical_system=None):
        self._angle_name = angle_name
        super().__init__(physical_system)

    def set_physical_system(self, physical_system):
        super().set_physical_system(physical_system)
        self._omega_idx = physical_system.state_positions["omega"]
        assert self._angle_name in physical_system.state_positions, (
            f"Angle {self._angle_name} not in the states of the physical system. "
            f"Probably a flux observer is required."
        )
        self._angle_idx = physical_system.state_positions[self._angle_name]
        self._pole_pairs = float(physical_system.motor.parameter["p"])
        self._angle_advance = 0.5
        # The reference's ``hasattr(physical_system, 'dead_time')`` finds
        # the delay through ANY intermediate wrapper because its base
        # wrapper delegates __getattr__ down the chain
        # (physical_system_wrapper.py:113-114) — e.g. the SCIM stack
        # DqToAbc(FluxObserver(DeadTime(sys))) still advances by
        # 0.5 + dead_time.  Our wrappers don't delegate attributes, so
        # walk the chain for the first dead_time explicitly (first match
        # only, exactly like attribute delegation would resolve it).
        cur = physical_system
        while cur is not None:
            if hasattr(cur, "dead_time"):
                self._angle_advance += cur.dead_time
                break
            cur = getattr(cur, "inner", None)
        return self

    @property
    def action_space(self):
        return ("box", -np.ones(2), np.ones(2))

    def _advance_angle(self, denorm_state):
        return (
            denorm_state[self._angle_idx]
            + self._angle_advance * self.inner.tau
            * denorm_state[self._omega_idx] * self._pole_pairs
        )

    def _abc_action(self, action, denorm_state):
        return dq_to_abc(action, self._advance_angle(denorm_state))

    def _wrap_reset(self, state, system_state):
        denorm = system_state * jnp.asarray(self.inner.limits, system_state.dtype)
        return WrappedState(inner=state, extra=denorm), system_state

    def simulate(self, state, action, noise=None):
        abc = self._abc_action(jnp.asarray(action), state.extra)
        inner, system_state = self.inner.simulate(state.inner, abc, noise)
        denorm = system_state * jnp.asarray(self.inner.limits, system_state.dtype)
        return WrappedState(inner=inner, extra=denorm), system_state


@DqToAbcActionProcessor.register(["EESM"])
class _EESMDqToAbcActionProcessor(DqToAbcActionProcessor):
    """dq action for the stator + direct excitation voltage
    (dq_to_abc_action_processor.py:152-170)."""

    @property
    def action_space(self):
        return ("box", -np.ones(3), np.ones(3))

    def _abc_action(self, action, denorm_state):
        abc = dq_to_abc(action[:2], self._advance_angle(denorm_state))
        return jnp.concatenate([abc, action[2:]])


@DqToAbcActionProcessor.register(["DFIM"])
class _DFIMDqToAbcActionProcessor(DqToAbcActionProcessor):
    """Stator dq + rotor dq actions (dq_to_abc_action_processor.py:115-149).
    Requires a FluxObserver beneath (for psi_angle)."""

    def __init__(self, physical_system=None):
        super().__init__("epsilon", physical_system)

    def set_physical_system(self, physical_system):
        super().set_physical_system(physical_system)
        self._flux_angle_idx = physical_system.state_positions["psi_angle"]
        return self

    @property
    def action_space(self):
        return ("box", -np.ones(4), np.ones(4))

    def _abc_action(self, action, denorm_state):
        adv = self._advance_angle(denorm_state)
        stator = dq_to_abc(action[:2], adv)
        rotor = dq_to_abc(action[2:], denorm_state[self._flux_angle_idx] - adv)
        return jnp.concatenate([stator, rotor])


DqToAbcActionProcessor.register(["PMSM", "SynRM"])(
    lambda angle_name="epsilon", *a, **kw: DqToAbcActionProcessor(angle_name, *a, **kw)
)
DqToAbcActionProcessor.register(["SCIM"])(
    lambda angle_name="psi_angle", *a, **kw: DqToAbcActionProcessor(angle_name, *a, **kw)
)


def apply_wrappers(physical_system, wrappers):
    """Wrap ``physical_system`` in order (first wrapper innermost), mirroring
    ``ElectricMotorEnvironment.__init__`` (core.py:266-267)."""
    for w in wrappers:
        physical_system = w.set_physical_system(physical_system)
    return physical_system
