"""Fused-collection double-DQN (``parallel.sharded.make_fused_dqn_trainer``).

Collection is the universal policy-record kernel sampling
``softmax(Q / temperature)`` (Boltzmann exploration via output-layer
scaling); the trainer maintains a device-resident env-major replay ring
and runs double-DQN TD updates with a Polyak target network.  The
long-horizon learning proof (reward -0.54 -> -0.06 over 315M steps on
Finite-CC-PermExDc) runs on hardware in tools/tpu_validate.py —
interpret mode only smoke-tests the compiled program structure here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu.parallel.sharded import make_fused_dqn_trainer


def test_fused_dqn_trainer_runs_and_fills_replay():
    """The whole (collect + ring write + TD updates) x n_iters program
    runs in interpret mode: rewards at the random-policy scale, params
    and target params both move (Polyak), the ring holds real data."""
    env = gemx.make_functional("Finite-CC-PermExDc-v0")
    init_state, train = make_fused_dqn_trainer(
        env, hidden=16, horizon=32, n_envs=256, replay_slots=2,
        n_updates=2, mb_envs=8, temp_half_life=8.0, interpret=True)
    carry = init_state(jax.random.PRNGKey(1))
    w0 = np.asarray(carry[0]["w1"]).copy()
    tw0 = np.asarray(carry[1]["w1"]).copy()
    carry, rs, ls = train(carry, 3, 3)
    rs, ls = np.asarray(rs), np.asarray(ls)
    assert rs.shape == ls.shape == (3,)
    assert np.isfinite(rs).all() and np.isfinite(ls).all()
    assert -1.0 < rs.mean() < 0.0          # dense tracking reward scale
    params, tparams, _opt, planes, ring, _seed, it = carry
    assert int(it) == 3
    assert not np.allclose(np.asarray(params["w1"]), w0)
    assert not np.allclose(np.asarray(tparams["w1"]), tw0)  # Polyak moved
    # both ring slots written after 3 iterations (2-slot ring)
    obs_ring = np.asarray(ring[0])
    assert np.abs(obs_ring[:256]).sum() > 0
    assert np.abs(obs_ring[256:]).sum() > 0
    # rewards stored negative-or-zero (tracking error), dones boolean
    assert np.asarray(ring[3]).max() <= 0.0
    assert ring[4].dtype == jnp.bool_
    for pl_ in planes:
        assert np.isfinite(np.asarray(pl_)).all()


def test_fused_dqn_multi_head_factorized():
    """Dual-converter env (EESM: 8 x 4 action product) — per-head
    action-branch Q functions aggregate by mean; the program runs and
    records one int8 action column per head."""
    env = gemx.make_functional("Finite-CC-EESM-v0")
    init_state, train = make_fused_dqn_trainer(
        env, hidden=16, horizon=16, n_envs=128, replay_slots=2,
        n_updates=2, mb_envs=8, interpret=True)
    carry = init_state(jax.random.PRNGKey(2))
    carry, rs, _ls = train(carry, 5, 2)
    assert np.isfinite(np.asarray(rs)).all()
    acts = np.asarray(carry[4][2][:128])   # (envs, T, 2 heads)
    assert acts.shape[-1] == 2
    assert acts[..., 0].max() <= 7 and acts[..., 1].max() <= 3


def test_fused_dqn_trainer_sharded_mesh():
    """mesh=: planes + replay ring shard P('env'), Q/target params
    replicate, per-device minibatches, grad pmean — runs on the 8-device
    CPU mesh."""
    from gym_electric_motor_tpu.parallel import make_env_mesh

    env = gemx.make_functional("Finite-CC-PermExDc-v0")
    mesh = make_env_mesh(8)
    init_state, train = make_fused_dqn_trainer(
        env, hidden=16, horizon=16, n_envs=1024, replay_slots=2,
        n_updates=2, mb_envs=8, mesh=mesh, interpret=True)
    carry = init_state(jax.random.PRNGKey(3))
    carry, rs, ls = train(carry, 3, 2)
    rs = np.asarray(rs)
    assert np.isfinite(rs).all() and -1.0 < rs.mean() < 0.0
    assert np.isfinite(np.asarray(carry[0]["w1"])).all()
    assert "env" in str(carry[3][0].sharding.spec)
    assert "env" in str(carry[4][0].sharding.spec)


def test_fused_dqn_rejects_continuous():
    env = gemx.make_functional("Cont-CC-PermExDc-v0")
    with pytest.raises(NotImplementedError):
        make_fused_dqn_trainer(env, n_envs=256)


def test_fused_dqn_joint_heads():
    """joint_heads=True: ONE Boltzmann softmax over the Cartesian action
    space (the kernel radix-decodes the joint sample into the converter
    sub-actions), and the TD update uses a joint 64-way double-DQN.  The
    ring still stores per-head action columns; param sizing follows
    roll.n_out."""
    env = gemx.make_functional("Finite-CC-DFIM-v0")
    init_state, train = make_fused_dqn_trainer(
        env, hidden=16, horizon=16, n_envs=128, replay_slots=2,
        n_updates=2, mb_envs=8, interpret=True, joint_heads=True)
    carry = init_state(jax.random.PRNGKey(1))
    assert carry[0]["w2"].shape == (16, 64)          # 8 x 8 joint head
    carry, rs, ls = train(carry, 3, 2)
    assert np.isfinite(np.asarray(rs)).all()
    assert np.isfinite(np.asarray(ls)).all()
    a = np.asarray(carry[4][2])
    assert a.shape[-1] == 2 and a.min() >= 0 and a.max() <= 7
