"""RL training on the sharded env (round-2 VERDICT #10).

The reference ships SB3 notebook examples
(``examples/reinforcement_learning_controllers/``); the TPU counterpart is
REINFORCE over a ``P('env')``-sharded batch with psum'd gradients, the whole
training run scanned inside one jitted program
(``parallel/sharded.py::make_reinforce_trainer``).  The test trains a policy
and requires it to beat an untrained (lr=0) control arm run through the
identical loop.
"""

import jax
import jax.numpy as jnp
import numpy as np

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu.parallel import ShardedVectorEnv, make_env_mesh
from gym_electric_motor_tpu.parallel.sharded import (
    init_policy_params,
    make_reinforce_trainer,
)


def _run(lr, iters=500, n_envs=256, tail=100):
    env = gemx.make_functional("Finite-CC-PermExDc-v0")
    mesh = make_env_mesh(8)
    venv = ShardedVectorEnv(env, n_envs, mesh)
    obs_dim = len(np.asarray(env._state_filter)) + env.observation_space[1].shape[0]
    params = init_policy_params(jax.random.PRNGKey(0), obs_dim, env.action_space.n)
    state, _ = venv.reset(jax.random.PRNGKey(1))
    train = make_reinforce_trainer(env, mesh, lr=lr)
    _params, _state, rs = train(params, state, jax.random.PRNGKey(2), iters)
    return float(jnp.mean(rs[-tail:]))


def test_reinforce_beats_untrained_policy():
    trained = _run(lr=3e-3)
    untrained = _run(lr=0.0)
    # dense current-tracking reward: REINFORCE reliably clears the frozen
    # policy by a wide margin within 500 iterations
    assert trained > untrained + 0.05, (trained, untrained)
