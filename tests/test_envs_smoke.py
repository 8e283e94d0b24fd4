"""All-54-environment smoke test, the counterpart of the reference's
``tests/integration_tests/test_environment_execution.py:27-57``: every env id
resets and steps without NaNs, rewards are finite scalars, observation shapes
match the declared spaces."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gym_electric_motor_tpu as gemx


@pytest.mark.parametrize("env_id", gemx.ENV_IDS)
def test_env_executes(env_id):
    env = gemx.make_functional(env_id)
    key = jax.random.PRNGKey(123)
    state, (obs_state, obs_ref) = env.reset(key)
    n_obs = len(env.state_names)
    assert obs_state.shape == (n_obs,)
    assert not np.any(np.isnan(np.asarray(obs_state))), "NaN in reset state"
    rng = np.random.default_rng(0)
    for _ in range(5):
        action = env.action_space.sample(rng)
        state, (obs_state, obs_ref), reward, terminated = env.step(
            state, jnp.asarray(action)
        )
        assert obs_state.shape == (n_obs,)
        assert np.isfinite(float(reward))
        assert not np.any(np.isnan(np.asarray(obs_state))), "NaN in state"
        assert not np.any(np.isnan(np.asarray(obs_ref))), "NaN in reference"
        assert np.asarray(terminated).dtype == np.bool_ or np.asarray(terminated).shape == ()


@pytest.mark.parametrize("env_id", ["Finite-CC-PMSM-v0", "Cont-SC-SeriesDc-v0"])
def test_env_spaces(env_id):
    env = gemx.make_functional(env_id)
    action, task, motor = env_id.split("-")[:3]
    if action == "Finite":
        assert env.action_space.__class__.__name__ in ("Discrete", "MultiDiscrete")
    else:
        assert env.action_space.__class__.__name__ == "Box"
    lo, hi = env.observation_space[0].low, env.observation_space[0].high
    assert lo.shape == hi.shape == (len(env.state_names),)


def test_vector_env_rollout():
    env = gemx.make_functional("Finite-CC-PermExDc-v0")
    venv = gemx.VectorEnv(env, n_envs=16)
    state, obs = venv.reset(jax.random.PRNGKey(0))
    assert obs[0].shape[0] == 16

    def policy(obs, key):
        return jax.random.randint(key, (16,), 0, 4)

    state, rewards, terms = venv.rollout(state, policy, n_steps=50)
    assert rewards.shape == (50,)
    assert np.all(np.isfinite(np.asarray(rewards)))


def test_gym_adapter():
    env = gemx.make("Cont-CC-PermExDc-v0")
    (state, ref), info = env.reset(seed=7)
    assert state.shape == (len(env.state_names),)
    for _ in range(3):
        (state, ref), reward, terminated, truncated, info = env.step(
            env.action_space.sample(np.random.default_rng(1))
        )
        assert np.isfinite(reward)
        assert truncated is False
