"""True Gymnasium interoperability.

The reference registers every env id with ``gymnasium.register`` and aliases
``gem.make = gymnasium.make`` (``/root/reference/src/gym_electric_motor/
__init__.py:47-283``, ``core.py:291-292``), with real ``gymnasium.spaces``
objects on the env (``core.py:277-279``).  This module provides the same
drop-in surface for the TPU build: :class:`GymnasiumGemEnv` is a genuine
``gymnasium.Env`` whose stepping runs jitted on device through the host
adapter, and :func:`register_all` publishes all catalog ids to the global
gymnasium registry so ``gymnasium.make("Finite-CC-PMSM-v0")`` (and any
gymnasium-consuming RL library) just works.

gymnasium is an *optional* dependency: importing this module without it
raises ImportError, but the package ``__init__`` guards the call.

Known (inherited) quirk: the reference's reset state can lie *outside* its
own state space — e.g. Finite-CC-PMSM-v0 resets with normalized phase
voltages at -1.4 (B6 reset voltage over a smaller voltage limit), verified
identical upstream — so gymnasium's passive env checker emits an
"obs not within the observation space" warning on both frameworks alike.
"""

from __future__ import annotations

import gymnasium
import numpy as np
from gymnasium import spaces

from . import catalog
from .gym_adapter import GymnasiumEnv as _HostAdapter


def to_gymnasium_space(space):
    """Internal dependency-free space -> ``gymnasium.spaces`` (float64 Boxes
    like the reference, core.py:277-279)."""
    kind = space.__class__.__name__
    if kind == "Discrete":
        return spaces.Discrete(space.n)
    if kind == "MultiDiscrete":
        return spaces.MultiDiscrete(np.asarray(space.nvec))
    if kind == "Box":
        return spaces.Box(
            np.asarray(space.low, dtype=np.float64),
            np.asarray(space.high, dtype=np.float64),
            dtype=np.float64,
        )
    raise TypeError(f"unknown space {space!r}")


class GymnasiumGemEnv(gymnasium.Env):
    """``gymnasium.Env`` over the functional on-device environment.

    Observation = ``(state, reference)`` tuple, action/observation spaces,
    reset/step/render/close semantics exactly as the reference's
    ``ElectricMotorEnvironment`` (core.py:261-380).
    """

    metadata = {"render_modes": ["figure", "figure_once", "figure_academic"]}

    def __init__(self, env_id, callbacks=(), visualization=None,
                 render_mode=None, **kwargs):
        core = catalog.make_functional(env_id, **kwargs)
        self._adapter = _HostAdapter(core, callbacks=callbacks,
                                     visualization=visualization,
                                     render_mode=render_mode)
        self.render_mode = render_mode
        self.action_space = to_gymnasium_space(core.action_space)
        state_box, ref_box = core.observation_space
        self.observation_space = spaces.Tuple(
            (to_gymnasium_space(state_box), to_gymnasium_space(ref_box))
        )
        self.spec = None

    # -- gymnasium API --

    @staticmethod
    def _f64(obs):
        # device arrays are float32; the reference's observations are numpy
        # float64 (core.py:277-279) — match it so space checks pass cleanly
        state, ref = obs
        return (np.asarray(state, dtype=np.float64),
                np.asarray(ref, dtype=np.float64))

    def reset(self, *, seed=None, options=None):
        super().reset(seed=seed)
        obs, info = self._adapter.reset(seed=seed, options=options)
        return self._f64(obs), info

    def step(self, action):
        obs, reward, terminated, truncated, info = self._adapter.step(action)
        return self._f64(obs), reward, terminated, truncated, info

    def render(self):
        return self._adapter.render()

    def close(self):
        return self._adapter.close()

    # -- reference-compatible accessors (delegate to the adapter) --

    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)
        return getattr(self._adapter, name)


def make_env(env_id, **kwargs):
    """Registry entry point."""
    return GymnasiumGemEnv(env_id, **kwargs)


class GymnasiumVectorGemEnv(gymnasium.vector.VectorEnv):
    """``gymnasium.vector.VectorEnv`` over the vmapped on-device batch.

    Unlike ``SyncVectorEnv`` around N host envs, the whole batch steps as ONE
    jitted device program (the reference has no vector path at all), so any
    gymnasium-vector RL stack gets the TPU throughput unchanged:

        venv = gymnasium.make_vec("Finite-CC-PMSM-v0", num_envs=4096)

    Autoreset follows the SAME_STEP convention (the in-kernel autoreset
    returns the fresh episode's observation on the terminating step); the
    replaced terminal observation is surfaced as ``infos["final_obs"]`` with
    the standard ``_final_obs`` mask.
    """

    metadata = {"autoreset_mode": gymnasium.vector.AutoresetMode.SAME_STEP}

    def __init__(self, env_id, num_envs=1, seed=0, **kwargs):
        import jax
        import jax.numpy as jnp

        self._jax, self._jnp = jax, jnp
        core = catalog.make_functional(env_id, **kwargs)
        self._core = core
        self.num_envs = int(num_envs)
        self.spec = None
        self.render_mode = None
        self.single_action_space = to_gymnasium_space(core.action_space)
        state_box, ref_box = core.observation_space
        self.single_observation_space = spaces.Tuple(
            (to_gymnasium_space(state_box), to_gymnasium_space(ref_box))
        )
        batch = gymnasium.vector.utils.batch_space
        self.observation_space = batch(self.single_observation_space, self.num_envs)
        self.action_space = batch(self.single_action_space, self.num_envs)
        self._reset_fn = jax.jit(jax.vmap(core.reset))
        self._step_fn = jax.jit(jax.vmap(core.step_autoreset_full))
        self._state = None
        self._key = jax.random.PRNGKey(seed)

    # -- gymnasium.vector API --

    @staticmethod
    def _np_obs(obs):
        state, ref = obs
        return (np.asarray(state, dtype=np.float64),
                np.asarray(ref, dtype=np.float64))

    def reset(self, *, seed=None, options=None):
        # gymnasium semantics: an explicit seed restarts the stream; an
        # unseeded reset continues it (fresh episodes each call)
        if seed is not None:
            self._key = self._jax.random.PRNGKey(seed)
        self._key, k = self._jax.random.split(self._key)
        keys = self._jax.random.split(k, self.num_envs)
        self._state, obs = self._reset_fn(keys)
        return self._np_obs(obs), {}

    def step(self, actions):
        actions = self._jnp.asarray(np.asarray(actions))
        self._state, obs, reward, terminated, final_obs = self._step_fn(
            self._state, actions)
        term = np.asarray(terminated)
        infos = {}
        if term.any():
            fs, fr = self._np_obs(final_obs)
            final = np.empty(self.num_envs, dtype=object)
            for i in np.flatnonzero(term):
                final[i] = (fs[i], fr[i])
            infos["final_obs"] = final
            infos["_final_obs"] = term.copy()
        return (self._np_obs(obs), np.asarray(reward, dtype=np.float64),
                term, np.zeros(self.num_envs, dtype=bool), infos)

    def close_extras(self, **kwargs):
        pass


def make_vector_env(env_id, num_envs=1, **kwargs):
    """Vector registry entry point (``gymnasium.make_vec``)."""
    return GymnasiumVectorGemEnv(env_id, num_envs=num_envs, **kwargs)


_registered = False


def register_all(force=False):
    """Register every catalog id with the global gymnasium registry,
    mirroring the reference's import-time registration
    (``__init__.py:47-283``).  Idempotent; overrides an already-present id
    (e.g. when the reference package was imported first in the same
    process) only with a gymnasium warning, same as upstream re-imports.

    ``force=True`` re-claims ids that another package registered *after*
    us (the reference registers the same 54 names on import) — call it
    when both frameworks live in one process and this one should win."""
    global _registered
    if _registered and not force:
        return
    for env_id in catalog.ENV_IDS:
        spec = gymnasium.registry.get(env_id)
        if spec is not None:
            if not force:
                continue
            if "gym_electric_motor_tpu" in str(spec.entry_point):
                continue
            gymnasium.registry.pop(env_id, None)
        gymnasium.register(
            id=env_id,
            entry_point="gym_electric_motor_tpu.envs.gymnasium_interop:make_env",
            vector_entry_point=(
                "gym_electric_motor_tpu.envs.gymnasium_interop:make_vector_env"
            ),
            kwargs={"env_id": env_id},
        )
    _registered = True
