"""Single-env host adapter with the reference's Gymnasium interface.

Lets a user of ``gym_electric_motor`` drive one env interactively
(``env.reset(seed=...)``, ``env.step(action)`` returning
``(state, reference), reward, terminated, truncated, info`` exactly like
``/root/reference/src/gym_electric_motor/core.py:300-371``) while the actual
stepping runs jitted on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import ElectricMotorEnvironment


class GymnasiumEnv:
    def __init__(self, env: ElectricMotorEnvironment):
        self.env = env
        self._reset = jax.jit(env.reset)
        self._step = jax.jit(env.step)
        self._state = None
        self._key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        self._episode = 0

    # -- reference-compatible properties --

    @property
    def action_space(self):
        return self.env.action_space

    @property
    def observation_space(self):
        return self.env.observation_space

    @property
    def physical_system(self):
        return self.env.physical_system

    @property
    def reference_generator(self):
        return self.env.reference_generator

    @property
    def reward_function(self):
        return self.env.reward_function

    @property
    def state_names(self):
        return self.env.state_names

    @property
    def limits(self):
        return self.env.limits

    @property
    def reference_names(self):
        return self.env.reference_names

    def reset(self, seed=None, options=None):
        if seed is not None:
            self._key = jax.random.PRNGKey(seed)
            self._episode = 0
        episode_key = jax.random.fold_in(self._key, self._episode)
        self._episode += 1
        self._state, obs = self._reset(episode_key)
        state, ref = obs
        return (np.asarray(state), np.asarray(ref)), {}

    def step(self, action):
        if self.env.action_space.__class__.__name__ == "Discrete":
            action = jnp.asarray(int(action))
        else:
            action = jnp.asarray(action)
        self._state, obs, reward, terminated = self._step(self._state, action)
        state, ref = obs
        return (
            (np.asarray(state), np.asarray(ref)),
            float(reward),
            bool(terminated),
            False,
            {},
        )

    def render(self):
        pass

    def close(self):
        pass
