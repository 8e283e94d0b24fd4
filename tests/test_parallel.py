"""Multi-chip sharding tests on the 8-virtual-device CPU mesh.

The key property (SURVEY.md §4 item (e)): per-env trajectories are identical
whether the batch runs on 1 device or sharded over 8 — shard placement is
semantically invisible.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu.parallel import (
    ShardedVectorEnv,
    make_env_mesh,
    train_step_reinforce,
)
from gym_electric_motor_tpu.parallel.sharded import init_policy_params


@pytest.fixture(scope="module")
def env():
    return gemx.make_functional("Finite-CC-PermExDc-v0")


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual CPU devices"


def test_sharded_matches_single_device(env):
    n_envs = 16
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, n_envs)

    # single-device path
    reset = jax.jit(jax.vmap(env.reset))
    step = jax.jit(jax.vmap(env.step_autoreset))
    state1, _ = reset(keys)
    svenv = ShardedVectorEnv(env, n_envs, mesh=make_env_mesh(8))
    state8, _ = svenv.reset(key)

    rng = np.random.default_rng(0)
    for k in range(10):
        actions = jnp.asarray(rng.integers(0, 4, size=n_envs))
        state1, _obs1, r1, t1 = step(state1, actions)
        state8, _obs8, r8, t8, rsum, tsum = svenv.step(state8, actions)
        np.testing.assert_allclose(np.asarray(r8), np.asarray(r1), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(t8), np.asarray(t1))
        np.testing.assert_allclose(
            np.asarray(state8.system_state), np.asarray(state1.system_state), rtol=1e-6
        )
        # the psum'd global metric equals the local sum
        np.testing.assert_allclose(float(rsum), float(jnp.sum(r1)), rtol=1e-5)


def test_sharded_rollout_runs(env):
    svenv = ShardedVectorEnv(env, 32, mesh=make_env_mesh(8))
    state, _ = svenv.reset(jax.random.PRNGKey(1))

    def policy(obs, key):
        return jax.random.randint(key, (obs[0].shape[0],), 0, 4)

    state, rewards, terms = svenv.rollout(state, policy, n_steps=20)
    assert rewards.shape == (20,)
    assert np.all(np.isfinite(np.asarray(rewards)))


def test_train_step_runs_and_replicates(env):
    mesh = make_env_mesh(8)
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_envs = 16
    shard = NamedSharding(mesh, P("env"))
    keys = jax.device_put(jax.random.split(jax.random.PRNGKey(0), n_envs), shard)
    state, _ = jax.jit(jax.vmap(env.reset))(keys)
    obs_dim = len(env.state_names) + len(env.reference_names)
    params = init_policy_params(jax.random.PRNGKey(1), obs_dim, 4)
    new_params, state, loss = train_step_reinforce(env, mesh, params, state, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    # params must have changed (gradient applied) and stay finite
    delta = sum(float(jnp.sum(jnp.abs(a - b))) for a, b in
                zip(jax.tree.leaves(new_params), jax.tree.leaves(params)))
    assert delta > 0
    for leaf in jax.tree.leaves(new_params):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_graft_entry():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    mod.dryrun_multichip(8)


def test_ppo_trainer_improves(env):
    """Whole-run-compiled PPO over the 8-device mesh: rollout + GAE +
    minibatched clipped-surrogate Adam updates, gradients pmean'd over ICI.
    The dense tracking reward must improve measurably within 60 iterations."""
    from gym_electric_motor_tpu.parallel.sharded import (
        init_actor_critic_params,
        make_ppo_trainer,
    )

    mesh = make_env_mesh(8)
    sv = ShardedVectorEnv(env, 256, mesh=mesh)
    state, _ = sv.reset(jax.random.PRNGKey(0))
    obs_dim = len(env._state_filter) + len(env.reference_names)
    params = init_actor_critic_params(
        jax.random.PRNGKey(1), obs_dim, env.action_space.n, hidden=32)
    opt_init, train = make_ppo_trainer(env, mesh, lr=1e-3, horizon=32,
                                       n_epochs=2, n_minibatches=4)
    params, opt_state, state, rs = train(
        params, opt_init(params), state, jax.random.PRNGKey(2), 60)
    rs = np.asarray(rs)
    assert np.isfinite(rs).all()
    assert rs[-5:].mean() > rs[:5].mean() + 0.05
