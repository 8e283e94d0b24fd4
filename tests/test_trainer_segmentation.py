"""Automatic scan segmentation in the fused trainers.

One giant ``lax.scan`` of large-batch kernel launches has crashed the
axon TPU worker (round-3 finding); the public ``train()`` entry points of
the fused PPO/DQN/TD3/SAC trainers therefore chunk the compiled scan
host-side into ``segment``-iteration programs automatically.  These tests
pin the contract: chunked and unchunked runs are BIT-IDENTICAL (the seed
advances +1 per iteration inside the scan, and each segment restarts at
``seed + done``), the reward/loss streams concatenate to ``n_iters``
entries, and a non-divisor remainder compiles as a second program.
"""

import jax
import jax.numpy as jnp
import numpy as np

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu.parallel.sharded import (
    _segment_sizes,
    init_actor_critic_params,
    make_fused_dqn_trainer,
    make_fused_ppo_trainer,
    make_fused_sac_trainer,
    make_fused_td3_trainer,
)


def test_segment_sizes():
    assert _segment_sizes(7, 3) == [3, 3, 1]
    assert _segment_sizes(6, 3) == [3, 3]
    assert _segment_sizes(2, 3) == [2]
    assert _segment_sizes(50, 0) == [50]      # segment=0 disables chunking
    assert _segment_sizes(50, None) == [50]


def _tree_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_ppo_segmented_matches_unsegmented():
    env = gemx.make_functional(
        "Finite-CC-PMSM-v0",
        state_filter=("omega", "i_sd", "i_sq", "epsilon"))
    init_opt, train = make_fused_ppo_trainer(env, hidden=16, horizon=16,
                                             n_envs=128, n_minibatches=2,
                                             lr=1e-3, interpret=True)
    params = init_actor_critic_params(jax.random.PRNGKey(1), 7, 8, 16)
    z = jnp.zeros((1, 128), jnp.float32)
    pa, _oa, pla, ra = train(params, init_opt(params), (z, z, z), 3, 5,
                             segment=0)
    pb, _ob, plb, rb = train(params, init_opt(params), (z, z, z), 3, 5,
                             segment=2)  # 2 + 2 + 1
    assert ra.shape == rb.shape == (5,)
    np.testing.assert_array_equal(np.asarray(ra), np.asarray(rb))
    _tree_equal(pa, pb)
    _tree_equal(pla, plb)


def test_dqn_segmented_matches_unsegmented():
    env = gemx.make_functional("Finite-CC-PermExDc-v0")
    init_state, train = make_fused_dqn_trainer(
        env, hidden=16, horizon=16, n_envs=128, replay_slots=2,
        n_updates=2, mb_envs=8, interpret=True)
    ca, ra, la = train(init_state(jax.random.PRNGKey(1)), 3, 5, segment=0)
    cb, rb, lb = train(init_state(jax.random.PRNGKey(1)), 3, 5, segment=2)
    assert ra.shape == rb.shape == (5,)
    np.testing.assert_array_equal(np.asarray(ra), np.asarray(rb))
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    _tree_equal(ca, cb)


def test_td3_segmented_matches_unsegmented():
    env = gemx.make_functional("Cont-CC-PermExDc-v0")
    init_state, train = make_fused_td3_trainer(
        env, hidden=16, horizon=16, n_envs=128, replay_slots=2,
        n_updates=2, mb_envs=8, interpret=True)
    ca, ra, la = train(init_state(jax.random.PRNGKey(1)), 3, 4, segment=0)
    cb, rb, lb = train(init_state(jax.random.PRNGKey(1)), 3, 4, segment=3)
    assert ra.shape == rb.shape == (4,)
    np.testing.assert_array_equal(np.asarray(ra), np.asarray(rb))
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    _tree_equal(ca, cb)


def test_sac_segmented_matches_unsegmented():
    env = gemx.make_functional("Cont-CC-PermExDc-v0")
    init_state, train = make_fused_sac_trainer(
        env, hidden=16, horizon=16, n_envs=128, replay_slots=2,
        n_updates=2, mb_envs=8, interpret=True)
    ca, ra, la = train(init_state(jax.random.PRNGKey(1)), 3, 4, segment=0)
    cb, rb, lb = train(init_state(jax.random.PRNGKey(1)), 3, 4, segment=3)
    assert ra.shape == rb.shape == (4,)
    np.testing.assert_array_equal(np.asarray(ra), np.asarray(rb))
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    _tree_equal(ca, cb)
