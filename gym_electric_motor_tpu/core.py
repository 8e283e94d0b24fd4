"""Environment core.

TPU re-design of ``/root/reference/src/gym_electric_motor/core.py``:
``ElectricMotorEnvironment`` wires a physical system, reference generator,
reward function and constraint monitor into two pure device functions

* ``reset(key) -> (EnvState, obs)``
* ``step(EnvState, action) -> (EnvState, obs, reward, terminated)``

with ``obs = (filtered normalized state vector, next reference observation)``
exactly as the reference's observation tuple (core.py:317, 365-371).

``VectorEnv`` vmaps these over an env batch and scans them over time — the
scale-out path the reference lacks.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .constraints import ConstraintMonitor
from .physical_systems import PhysicsState
from .references import ReferenceSpec, ScalarRefSpec, SwitchedRefSpec
from .rewards import WeightedSumOfErrors
from .utils import rng
from .utils.pytree import struct


# ---------------------------------------------------------------------------
# Minimal space descriptors (gymnasium-compatible but dependency-free)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Discrete:
    n: int

    def sample(self, rng=None):
        rng = rng or np.random
        return int(rng.integers(self.n) if hasattr(rng, "integers") else rng.randint(self.n))

    def contains(self, x):
        return 0 <= int(x) < self.n

    @property
    def shape(self):
        return ()


@dataclasses.dataclass
class MultiDiscrete:
    nvec: tuple

    def sample(self, rng=None):
        rng = rng or np.random
        return np.array([int(rng.integers(n) if hasattr(rng, "integers") else rng.randint(n)) for n in self.nvec])

    def contains(self, x):
        return all(0 <= int(v) < n for v, n in zip(x, self.nvec))

    @property
    def shape(self):
        return (len(self.nvec),)


@dataclasses.dataclass
class Box:
    low: np.ndarray
    high: np.ndarray

    def sample(self, rng=None):
        rng = rng or np.random
        u = rng.uniform(size=np.asarray(self.low).shape)
        low = np.nan_to_num(self.low, neginf=-1.0)
        high = np.nan_to_num(self.high, posinf=1.0)
        return low + u * (high - low)

    def contains(self, x):
        return bool(np.all(x >= self.low - 1e-9) and np.all(x <= self.high + 1e-9))

    @property
    def shape(self):
        return np.asarray(self.low).shape


def make_space(descriptor):
    kind = descriptor[0]
    if kind == "discrete":
        return Discrete(descriptor[1])
    if kind == "multidiscrete":
        return MultiDiscrete(tuple(descriptor[1]))
    if kind == "box":
        return Box(np.asarray(descriptor[1]), np.asarray(descriptor[2]))
    raise ValueError(descriptor)


# ---------------------------------------------------------------------------
# Env state
# ---------------------------------------------------------------------------


@struct
class EnvState:
    phys: PhysicsState
    refs: tuple  # per-sub-generator reference states
    system_state: jnp.ndarray  # normalized full state (cached for reward/constraints)
    key: jnp.ndarray  # per-env PRNG key (folded per episode)
    step_count: jnp.ndarray  # int32 steps in current episode
    episode: jnp.ndarray  # int32 episode counter


class ElectricMotorEnvironment:
    """Functional environment (host-side wiring, pure device functions)."""

    def __init__(
        self,
        physical_system,
        reference_generator,
        reward_function: Optional[WeightedSumOfErrors] = None,
        constraints=(),
        state_filter=None,
        constraint_monitor: Optional[ConstraintMonitor] = None,
    ):
        self.physical_system = physical_system
        ps = physical_system
        if isinstance(reference_generator, (ScalarRefSpec, SwitchedRefSpec)):
            reference_generator = ReferenceSpec([reference_generator])
        self.reference_generator = reference_generator.bind(
            ps.state_names, ps.limits, ps.nominal_state, ps.state_space_low,
            ps.state_space_high, ps.tau,
        )
        self.reward_function = (reward_function or WeightedSumOfErrors()).bind(
            ps.state_names, ps.state_space_low, ps.state_space_high,
            self.reference_generator.referenced_states(),
        )
        if constraint_monitor is None:
            constraint_monitor = ConstraintMonitor(constraints=tuple(constraints))
        self.constraint_monitor = constraint_monitor.bind(
            ps.state_names, ps.limits, ps.state_space_high
        )
        self.state_names = list(ps.state_names)
        if state_filter is None:
            self._state_filter = np.arange(len(self.state_names))
        else:
            self._state_filter = np.array(
                [self.state_names.index(s) for s in state_filter], dtype=np.int32
            )
        self.tau = ps.tau
        self.limits = np.asarray(ps.limits)[self._state_filter]

        # single-PRNG-pass reset plan: when every module can consume
        # pre-minted randomness (reset_from_u / reset_from), env.reset mints
        # all carried keys and uniform blocks from ONE threefry evaluation —
        # the in-kernel autoreset evaluates the reset path every step, so
        # this pass count dominates the general-path step time (utils/rng.py)
        n_phys = getattr(ps, "reset_n_u", None)
        n_ref = getattr(self.reference_generator, "reset_n_u", None)
        if (n_phys is None or n_ref is None
                or not hasattr(ps, "reset_from_u")):
            self._reset_plan = None
        else:
            self._reset_plan = (int(n_phys), int(n_ref),
                                len(self.reference_generator.subs))

        self.action_space = make_space(ps.action_space)
        lo, hi = self.reference_generator.reference_space()
        self.observation_space = (
            Box(np.asarray(ps.state_space_low)[self._state_filter],
                np.asarray(ps.state_space_high)[self._state_filter]),
            Box(lo, hi),
        )
        self.reference_names = self.reference_generator.reference_names

    # ---------------- device functions ----------------

    def _observe(self, system_state, ref_obs):
        filt = self._state_filter
        # contiguous filters (incl. the all-states default) are a static
        # slice; an index-array gather per step is a slow DynamicGather
        # on TPU (the same finding that won 2x on the finite converters)
        if len(filt) and np.array_equal(filt, np.arange(filt[0],
                                                        filt[0] + len(filt))):
            return system_state[int(filt[0]):int(filt[0]) + len(filt)], ref_obs
        return system_state[jnp.asarray(filt)], ref_obs

    def reset(self, key):
        """core.py:300-319."""
        plan = self._reset_plan
        if plan is not None and not rng.is_typed_key(key):
            # ONE PRNG pass for the whole reset: successor key, per-sub
            # reference keys and every module's uniform block come from a
            # single threefry evaluation (the key is consumed only here)
            n_phys, n_ref, n_subs = plan
            total = 2 + 2 * n_subs + n_phys + n_ref
            bits = jax.random.bits(key, (total,), dtype=jnp.uint32)
            k_next = bits[:2]
            sub_keys = [bits[2 + 2 * i: 4 + 2 * i] for i in range(n_subs)]
            u = rng.bits_to_uniform(bits[2 + 2 * n_subs:])
            phys, system_state = self.physical_system.reset_from_u(
                u[:n_phys] if n_phys else None)
            refs, _ref_array, ref_obs = self.reference_generator.reset_from(
                sub_keys, u[n_phys:])
        else:
            k_phys, k_ref, k_next = jax.random.split(key, 3)
            phys, system_state = self.physical_system.reset(k_phys)
            refs, _ref_array, ref_obs = self.reference_generator.reset(k_ref)
        state = EnvState(
            phys=phys,
            refs=refs,
            system_state=system_state,
            key=k_next,
            step_count=jnp.zeros((), jnp.int32),
            episode=jnp.zeros((), jnp.int32),
        )
        return state, self._observe(system_state, ref_obs)

    def step(self, state: EnvState, action):
        """core.py:328-371 — simulate, reference, constraints, reward,
        termination, next reference observation."""
        if self.physical_system.load.needs_noise:
            k_noise, k_key = jax.random.split(state.key)
            noise = jax.random.normal(k_noise, ())
        else:
            # the env key only seeds per-episode resets (folded with the
            # episode counter), so it can stay constant within an episode
            k_key = state.key
            noise = None
        phys, system_state = self.physical_system.simulate(state.phys, action, noise)
        ref_values = self.reference_generator.current_values(state.refs)
        reference = self.reference_generator.to_reference_array(ref_values)
        violation = self.constraint_monitor.check_constraints(system_state)
        reward = self.reward_function.reward(
            system_state, reference, state.phys.k, action, violation
        )
        terminated = violation >= 1.0
        refs, ref_obs = self.reference_generator.advance(state.refs)
        new_state = EnvState(
            phys=phys,
            refs=refs,
            system_state=system_state,
            key=k_key,
            step_count=state.step_count + 1,
            episode=state.episode,
        )
        return new_state, self._observe(system_state, ref_obs), reward, terminated

    def step_autoreset(self, state: EnvState, action):
        """Step with in-kernel episode auto-reset.

        On termination the env re-initializes from a per-episode key — the
        functional analogue of the reference's ``next_generator()``
        per-episode reseeding (random_component.py:85-87) which keeps
        episode k reproducible regardless of episode lengths.
        """
        merged, obs, reward, terminated, _final = self.step_autoreset_full(
            state, action)
        return merged, obs, reward, terminated

    def step_autoreset_full(self, state: EnvState, action):
        """``step_autoreset`` that additionally returns the terminal
        observation (the one the autoreset replaces) — the gymnasium
        SAME_STEP vector convention surfaces it as ``infos["final_obs"]``
        (envs/gymnasium_interop.py).  Unused outputs are dead-code
        eliminated, so this costs nothing when the final obs is dropped."""
        new_state, obs, reward, terminated = self.step(state, action)
        episode = state.episode + terminated.astype(jnp.int32)
        if self.physical_system.load.needs_noise:
            # the OU-load step advances the key every step, so the reset
            # stream is separated from it by folding in the episode counter
            reset_key = jax.random.fold_in(state.key, episode)
        else:
            # noise-free envs consume the env key exactly once per episode
            # (the reset's own bits pass), so it seeds the next reset
            # directly: a per-episode hash chain (each reset mints its
            # successor key) replaces the per-step fold_in PRNG pass.
            # Episode k stays reproducible regardless of episode lengths —
            # the chain depth equals the episode count.
            reset_key = state.key
        reset_state, reset_obs = self.reset(reset_key)
        reset_state = reset_state.replace(episode=episode)

        def pick(a, b):
            return jnp.where(terminated, a, b)

        merged = jax.tree.map(pick, reset_state, new_state.replace(episode=episode))
        # motor parameters are sticky across in-kernel resets so per-env
        # domain randomization survives episode boundaries (plain systems
        # only; wrapped systems nest their state)
        if getattr(state.phys, "mp", None) is not None:
            merged = merged.replace(phys=merged.phys.replace(mp=state.phys.mp))
        final_obs = obs
        obs = tuple(jax.tree.map(pick, reset_obs, obs))
        return merged, obs, reward, terminated, final_obs

    def randomize_motor_parameters(self, state: EnvState, key, spread=0.1, params=None):
        """Per-env multiplicative domain randomization of the motor
        parameters: each selected parameter is scaled by a factor drawn
        uniformly from [1 - spread, 1 + spread].

        Works on single or vmapped (batched) env states — the parameters live
        in the state pytree (``state.phys.mp``), so no retracing or
        recompilation happens; the randomized batch steps through the same
        compiled program.  No reference counterpart (the reference binds
        parameters at construction time).
        """
        mp = state.phys.mp
        if mp is None:
            raise ValueError(
                "Motor parameters are compile-time constants by default; build "
                "the env with dynamic_params=True (make_functional(..., "
                "dynamic_params=True)) to carry them in the state pytree."
            )
        names = list(params) if params is not None else list(mp.keys())
        keys = jax.random.split(key, len(names))
        new_mp = dict(mp)
        for n, k in zip(names, keys):
            factor = jax.random.uniform(
                k, jnp.shape(mp[n]), minval=1.0 - spread, maxval=1.0 + spread
            )
            new_mp[n] = mp[n] * factor
        return state.replace(phys=state.phys.replace(mp=new_mp))


# ---------------------------------------------------------------------------
# Vectorized env (the TPU scale-out path)
# ---------------------------------------------------------------------------


class VectorEnv:
    """``n_envs`` independent envs stepped in lockstep via vmap.

    ``rollout`` scans a policy over T steps inside one jitted program, which
    amortizes dispatch to ~zero and lets XLA fuse the whole step chain.
    """

    def __init__(self, env: ElectricMotorEnvironment, n_envs: int):
        self.env = env
        self.n_envs = n_envs
        self._reset = jax.jit(jax.vmap(env.reset))
        self._step = jax.jit(jax.vmap(env.step_autoreset))

    def reset(self, key):
        keys = jax.random.split(key, self.n_envs)
        return self._reset(keys)

    def step(self, state, actions):
        return self._step(state, actions)

    def rollout(self, state, policy_fn, n_steps: int, sample_key=None):
        """Run ``n_steps`` with ``policy_fn(obs, key) -> actions``; returns the
        final state plus summed rewards/termination counts (on device)."""

        def body(carry, _):
            state, key = carry
            key, k_act = jax.random.split(key)
            obs = (
                state.system_state[:, jnp.asarray(self.env._state_filter)],
                jax.vmap(self.env.reference_generator.current_values)(state.refs),
            )
            actions = policy_fn(obs, k_act)
            state, _obs, reward, terminated = self._step(state, actions)
            return (state, key), (jnp.sum(reward), jnp.sum(terminated))

        key = sample_key if sample_key is not None else jax.random.PRNGKey(0)
        (state, _), (rewards, terms) = jax.lax.scan(body, (state, key), None, length=n_steps)
        return state, rewards, terms
