"""Single-env host adapter with the reference's Gymnasium interface.

Lets a user of ``gym_electric_motor`` drive one env interactively
(``env.reset(seed=...)``, ``env.step(action)`` returning
``(state, reference), reward, terminated, truncated, info`` exactly like
``/root/reference/src/gym_electric_motor/core.py:300-371``) while the actual
stepping runs jitted on device.  Callbacks and visualizations hook the loop
through the same bus as the reference (core.py:287-289, 310, 342, 355-362).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..callbacks import Callback
from ..core import ElectricMotorEnvironment


class GymnasiumEnv:
    def __init__(self, env: ElectricMotorEnvironment, callbacks=(), visualization=None,
                 render_mode=None):
        self.env = env
        self._reset = jax.jit(env.reset)
        self._step = jax.jit(env.step)
        self._state = None
        self._key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        self._episode = 0
        self._k = 0
        self._terminated = False
        self.last_observation = None

        self._visualizations = []
        callbacks = list(callbacks)
        if visualization is not None:
            if render_mode is not None and hasattr(visualization, "render_mode"):
                from ..visualization import RenderMode

                visualization.render_mode = RenderMode(render_mode)
            callbacks.append(visualization)
            self._visualizations.append(visualization)
        self._callbacks = []
        for cb in callbacks:
            assert isinstance(cb, Callback), cb
            cb.set_env(self)
            self._callbacks.append(cb)

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
    def constraint_monitor(self):
        return self.env.constraint_monitor

    @property
    def state_names(self):
        return self.env.state_names

    @property
    def limits(self):
        return self.env.limits

    @property
    def tau(self):
        return self.env.tau

    @property
    def reference_names(self):
        return self.env.reference_names

    @property
    def unwrapped(self):
        return self

    def reset(self, seed=None, options=None):
        for cb in self._callbacks:
            cb.on_reset_begin()
        if seed is not None:
            self._key = jax.random.PRNGKey(seed)
            self._episode = 0
        episode_key = jax.random.fold_in(self._key, self._episode)
        self._episode += 1
        self._k = 0
        self._terminated = False
        self._state, obs = self._reset(episode_key)
        state, ref = obs
        state, ref = np.asarray(state), np.asarray(ref)
        self.last_observation = (state, ref)
        for cb in self._callbacks:
            cb.on_reset_end(state, ref)
        return (state, ref), {}

    def step(self, action):
        # core.py:341 — the reference refuses to step a terminated episode
        assert not self._terminated, (
            "A reset is required before the environment can perform further steps"
        )
        for cb in self._callbacks:
            cb.on_step_begin(self._k, action)
        if self.env.action_space.__class__.__name__ == "Discrete":
            action = jnp.asarray(int(action))
        else:
            action = jnp.asarray(action)
        self._state, obs, reward, terminated = self._step(self._state, action)
        state, ref = np.asarray(obs[0]), np.asarray(obs[1])
        reward = float(reward)
        terminated = bool(terminated)
        self._terminated = terminated
        self.last_observation = (state, ref)
        for cb in self._callbacks:
            cb.on_step_end(self._k, state, ref, reward, terminated)
        self._k += 1
        return (state, ref), reward, terminated, False, {}

    def render(self):
        for v in self._visualizations:
            v.render()

    def close(self):
        for cb in self._callbacks:
            cb.on_close()
