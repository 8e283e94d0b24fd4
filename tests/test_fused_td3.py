"""Fused-collection TD3 (``parallel.sharded.make_fused_td3_trainer``).

Collection is the universal policy-record kernel's squashed-Gaussian
head with a FIXED exploration log-std (the deterministic actor's
pre-squash mean is the in-kernel MLP); the trainer maintains the shared
env-major replay ring and runs twin-critic TD3 updates (target-policy
smoothing, min(Q1', Q2') targets, delayed actor, Polyak targets).  The
learning proof runs on hardware in tools/tpu_validate.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu.parallel.sharded import make_fused_td3_trainer


def test_fused_td3_trainer_runs_and_fills_replay():
    """The whole (collect + ring write + TD3 updates) x n_iters program
    runs in interpret mode: rewards at the random-policy scale for this
    short-horizon config, actor and critics both move, raw pre-squash
    samples land in the ring."""
    env = gemx.make_functional("Cont-CC-PermExDc-v0")
    init_state, train = make_fused_td3_trainer(
        env, hidden=16, horizon=32, n_envs=256, replay_slots=2,
        n_updates=4, mb_envs=8, interpret=True)
    carry = init_state(jax.random.PRNGKey(1))
    aw0 = np.asarray(carry[0]["w1"]).copy()
    cw0 = np.asarray(carry[1]["q1"]["w1"]).copy()
    carry, rs, ls = train(carry, 3, 3)
    rs, ls = np.asarray(rs), np.asarray(ls)
    assert rs.shape == ls.shape == (3,)
    assert np.isfinite(rs).all() and np.isfinite(ls).all()
    (aparams, cparams, atarg, ctarg, _oa, _oc, planes, ring, _s, it) = carry
    assert int(it) == 3
    assert not np.allclose(np.asarray(aparams["w1"]), aw0)
    assert not np.allclose(np.asarray(cparams["q1"]["w1"]), cw0)
    # targets moved by Polyak but stay distinct from the online nets
    assert not np.allclose(np.asarray(atarg["w1"]), aw0)
    assert not np.allclose(np.asarray(atarg["w1"]),
                           np.asarray(aparams["w1"]))
    # ring holds raw (pre-squash) float actions from both slots
    raw = np.asarray(ring[2])
    assert raw.dtype == np.float32
    assert np.abs(raw[:256]).sum() > 0 and np.abs(raw[256:]).sum() > 0
    for pl_ in planes:
        assert np.isfinite(np.asarray(pl_)).all()


def test_fused_td3_trainer_sharded_mesh():
    """mesh=: planes + ring shard P('env'), actor/critic/target params
    replicate, per-device minibatches, grad pmean — runs on the 8-device
    CPU mesh."""
    from gym_electric_motor_tpu.parallel import make_env_mesh

    env = gemx.make_functional("Cont-CC-PermExDc-v0")
    mesh = make_env_mesh(8)
    init_state, train = make_fused_td3_trainer(
        env, hidden=16, horizon=16, n_envs=1024, replay_slots=2,
        n_updates=2, mb_envs=8, mesh=mesh, interpret=True)
    carry = init_state(jax.random.PRNGKey(3))
    carry, rs, ls = train(carry, 3, 2)
    assert np.isfinite(np.asarray(rs)).all()
    assert np.isfinite(np.asarray(carry[0]["w1"])).all()
    assert "env" in str(carry[6][0].sharding.spec)
    assert "env" in str(carry[7][0].sharding.spec)


def test_fused_td3_rejects_finite():
    env = gemx.make_functional("Finite-CC-PermExDc-v0")
    with pytest.raises(NotImplementedError):
        make_fused_td3_trainer(env, n_envs=256)
