"""Fused-collection SAC (``parallel.sharded.make_fused_sac_trainer``).

The stochastic tanh-Gaussian SAC policy itself collects (the learned
state-independent log-std rides the kernel's cont head); twin soft
critics, reparameterized actor updates with the exact tanh
change-of-variables log-prob, and automatic temperature tuning run in
XLA on the shared replay ring.  The learning proof (-2.2 -> -0.03 over
420M steps) runs on hardware in tools/tpu_validate.py.
"""

import jax
import numpy as np
import pytest

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu.parallel.sharded import make_fused_sac_trainer


def test_fused_sac_trainer_runs():
    env = gemx.make_functional("Cont-CC-PermExDc-v0")
    init_state, train = make_fused_sac_trainer(
        env, hidden=16, horizon=32, n_envs=256, replay_slots=2,
        n_updates=4, mb_envs=8, interpret=True)
    carry = init_state(jax.random.PRNGKey(1))
    a0 = float(np.exp(carry[3]))
    ls0 = np.asarray(carry[0]["ls"]).copy()
    carry, rs, ls = train(carry, 3, 3)
    rs, ls = np.asarray(rs), np.asarray(ls)
    assert np.isfinite(rs).all() and np.isfinite(ls).all()
    # temperature and the learned log-std both moved
    assert float(np.exp(carry[3])) != a0
    assert not np.allclose(np.asarray(carry[0]["ls"]), ls0)
    # critic targets distinct from online critics (Polyak)
    assert not np.allclose(np.asarray(carry[2]["q1"]["w1"]),
                           np.asarray(carry[1]["q1"]["w1"]))


def test_fused_sac_sharded_mesh():
    from gym_electric_motor_tpu.parallel import make_env_mesh

    env = gemx.make_functional("Cont-CC-PermExDc-v0")
    mesh = make_env_mesh(8)
    init_state, train = make_fused_sac_trainer(
        env, hidden=16, horizon=16, n_envs=1024, replay_slots=2,
        n_updates=2, mb_envs=8, mesh=mesh, interpret=True)
    carry = init_state(jax.random.PRNGKey(3))
    carry, rs, _ls = train(carry, 3, 2)
    assert np.isfinite(np.asarray(rs)).all()
    assert "env" in str(carry[7][0].sharding.spec)
    assert "env" in str(carry[8][0].sharding.spec)


def test_fused_sac_rejects_finite():
    env = gemx.make_functional("Finite-CC-PermExDc-v0")
    with pytest.raises(NotImplementedError):
        make_fused_sac_trainer(env, n_envs=256)
