"""Universal policy-in-the-loop kernel (ops/pallas_policy.py
make_fused_policy_record_universal) — every motor family.

Three layers of validation, all in interpret mode on CPU:

* ALIGNMENT: the host-side observation reconstruction + the recorded
  actions reproduce the kernel's sampling distribution exactly —
  ``E[logp(a|s)] == -E[entropy]`` (an identity in expectation iff the host
  computes the very observation/logits the kernel sampled from; any
  feature mismatch, head slicing bug or off-by-one state shift breaks it).
* PHYSICS: replaying the recorded actions through the family's
  deterministic buffer-mode recorder reproduces the recorded states
  step-for-step (violation-free envs), so the policy kernel's physics
  path cannot diverge from the validated env semantics.
* TRAINER: the generalized fused-collection PPO trainer
  (parallel/sharded.py) runs end-to-end on non-PMSM families.

Reference capability: SB3 trains on arbitrary GEM envs
(/root/reference/examples/reinforcement_learning_controllers/); here the
in-kernel policy covers ALL 54 catalog ids — factorized-categorical heads
for finite action spaces, squashed-Gaussian duty channels (raw pre-squash
samples recorded, per-channel learned log-stds) for continuous ones.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu.ops.pallas_policy import (
    fused_policy_init_planes, make_fused_policy_record_universal,
    policy_act_ns, policy_obs_dim, policy_obs_host)

FAMILY_ENVS = ("Finite-CC-PermExDc-v0", "Finite-CC-ExtExDc-v0",
               "Finite-CC-PMSM-v0", "Finite-CC-SCIM-v0",
               "Finite-CC-EESM-v0", "Finite-TC-DFIM-v0")


def _collect(eid, T=64, N=128, H=8, seed=3):
    env = gemx.make_functional(eid)
    roll = make_fused_policy_record_universal(env, T, N, hidden=H,
                                              interpret=True)
    F, A = roll.obs_dim, int(sum(roll.act_ns))
    rng = np.random.default_rng(0)
    w1 = rng.normal(0, 0.5, (F * H,)).astype(np.float32)
    b1 = np.zeros(H, np.float32)
    w2 = rng.normal(0, 0.5, (H * A,)).astype(np.float32)
    b2 = np.zeros(A, np.float32)
    planes = fused_policy_init_planes(env, N)
    out = roll(seed, w1, b1, w2, b2, *planes)
    return env, roll, (w1, b1, w2, b2), planes, out


@pytest.mark.parametrize("eid", FAMILY_ENVS)
def test_alignment_invariant(eid):
    T, N, H = 64, 128, 8
    env, roll, (w1, b1, w2, b2), planes, out = _collect(eid, T, N, H)
    F, A = roll.obs_dim, int(sum(roll.act_ns))
    assert F == policy_obs_dim(env) and roll.act_ns == policy_act_ns(env)

    prev = {}
    for i, nm in enumerate(roll.state_names):
        post = out[nm].reshape(T, N)
        prev[nm] = jnp.concatenate([planes[i].reshape(1, N), post[:-1]])
    refs = {nm: out[nm].reshape(T, N) for nm in roll.ref_names}
    obs = policy_obs_host(roll, prev, refs)
    assert obs.shape == (T, N, F)

    h = jnp.tanh(obs @ w1.reshape(F, H) + b1)
    logits = h @ w2.reshape(H, A) + b2
    lp_sum = ent_sum = 0.0
    off = 0
    for hn, an in zip(roll.act_ns, roll.act_names):
        ls = logits[..., off:off + hn]
        off += hn
        logp = jax.nn.log_softmax(ls)
        a = out[an].reshape(T, N)
        assert int(jnp.max(a)) < hn and int(jnp.min(a)) >= 0
        lp_sum = lp_sum + jnp.take_along_axis(logp, a[..., None],
                                              -1)[..., 0]
        ent_sum = ent_sum - jnp.sum(jax.nn.softmax(ls) * logp, -1)
    e_lp, e_h = float(jnp.mean(lp_sum)), float(jnp.mean(ent_sum))
    # identity in expectation; at T*N = 8192 samples the MC error stays
    # well under 0.03 (measured <= 0.012 across families at this seed)
    assert abs(e_lp + e_h) < 0.03, (e_lp, -e_h)


@pytest.mark.parametrize("eid", ("Finite-CC-PermExDc-v0",
                                 "Finite-CC-PMSM-v0",
                                 "Finite-CC-SCIM-v0",
                                 "Finite-CC-EESM-v0",
                                 "Finite-TC-DFIM-v0"))
def test_policy_physics_matches_buffer_replay(eid):
    """Replay the policy kernel's recorded actions through the family
    buffer-mode recorder: states must match step-for-step on
    violation-free env columns (buffer mode has no auto-reset)."""
    from gym_electric_motor_tpu.ops.pallas_record import (
        make_fused_record_rollout)

    T, N = 32, 128
    env, roll, _params, planes, out = _collect(eid, T, N)
    done = np.asarray(out["done"]).reshape(T, N)
    clean = done.sum(axis=0) == 0.0          # env columns with no reset
    assert clean.mean() > 0.5, clean.mean()

    buf = make_fused_record_rollout(env, T, N, action_mode="buffer",
                                    interpret=True)
    n_act = len(roll.act_names)
    if n_act == 1:
        actions = out[roll.act_names[0]]
    else:
        actions = jnp.stack([out[an] for an in roll.act_names], axis=1)
    replay = buf(*planes, actions)
    for nm in roll.state_names:
        a = np.asarray(out[nm]).reshape(T, N)[:, clean]
        b = np.asarray(replay[nm]).reshape(T, N)[:, clean]
        # atol: the policy kernel carries cos/sin(eps) by renormalized
        # incremental rotation while buffer mode computes exact sincos —
        # ~1 ulp/step of drift on O(100)-ampere states (measured 8e-6
        # max over 32 steps); anything semantic would diverge by orders
        # of magnitude within a few steps
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=5e-4,
                                   err_msg=f"{eid}:{nm}")


@pytest.mark.parametrize("eid", ("Finite-CC-PermExDc-v0",
                                 "Finite-CC-EESM-v0"))
def test_universal_ppo_trainer_runs(eid):
    from gym_electric_motor_tpu.parallel.sharded import (
        init_actor_critic_params, make_fused_ppo_trainer)

    env = gemx.make_functional(eid)
    NE, T, H = 128, 32, 8
    F, A = policy_obs_dim(env), int(sum(policy_act_ns(env)))
    init_opt, train = make_fused_ppo_trainer(
        env, hidden=H, horizon=T, n_envs=NE, n_minibatches=2, n_epochs=1,
        interpret=True, kernel="universal")
    params = init_actor_critic_params(jax.random.PRNGKey(0), F, A, H)
    opt = init_opt(params)
    planes = fused_policy_init_planes(env, NE)
    params2, _opt, planes2, rs = train(params, opt, planes, 0, 2)
    assert np.asarray(rs).shape == (2,)
    assert all(np.isfinite(np.asarray(rs)))
    # params actually moved
    assert float(jnp.abs(params2["w1"] - params["w1"]).max()) > 0.0
    assert len(planes2) == len(planes)


def test_auto_dispatch_picks_universal_for_non_pmsm():
    from gym_electric_motor_tpu.parallel.sharded import (
        make_fused_ppo_trainer)

    env = gemx.make_functional("Finite-CC-PermExDc-v0")
    init_opt, train = make_fused_ppo_trainer(
        env, hidden=8, horizon=32, n_envs=128, n_minibatches=2,
        n_epochs=1, interpret=True, kernel="auto")
    assert train is not None


CONT_ENVS = ("Cont-CC-PermExDc-v0", "Cont-CC-PMSM-v0", "Cont-TC-SCIM-v0",
             "Cont-CC-EESM-v0", "Cont-CC-DFIM-v0")


def _collect_cont(eid, T=64, N=128, H=8, seed=3):
    env = gemx.make_functional(eid)
    roll = make_fused_policy_record_universal(env, T, N, hidden=H,
                                              interpret=True)
    assert roll.cont and roll.act_ns is None
    F, A = roll.obs_dim, len(roll.act_names)
    rng = np.random.default_rng(0)
    w1 = rng.normal(0, 0.3, (F * H,)).astype(np.float32)
    b1 = np.zeros(H, np.float32)
    w2 = rng.normal(0, 0.3, (H * A,)).astype(np.float32)
    b2 = np.zeros(A, np.float32)
    ls = np.full(A, -0.5, np.float32)
    planes = fused_policy_init_planes(env, N)
    out = roll(seed, w1, b1, w2, b2, ls, *planes)
    return env, roll, (w1, b1, w2, b2, ls), planes, out


@pytest.mark.parametrize("eid", CONT_ENVS)
def test_cont_alignment_invariant(eid):
    """Squashed-Gaussian policies (round 4: fused PPO on ALL 54 ids, not
    just finite): the Gaussian log-prob of the recorded RAW samples under
    the reconstructed means must average to minus the Gaussian entropy."""
    T, N, H = 64, 128, 8
    env, roll, (w1, b1, w2, b2, ls), planes, out = _collect_cont(eid, T, N, H)
    F, A = roll.obs_dim, len(roll.act_names)
    prev = {}
    for i, nm in enumerate(roll.state_names):
        post = out[nm].reshape(T, N)
        prev[nm] = jnp.concatenate([planes[i].reshape(1, N), post[:-1]])
    refs = {nm: out[nm].reshape(T, N) for nm in roll.ref_names}
    obs = policy_obs_host(roll, prev, refs)
    h = jnp.tanh(obs @ w1.reshape(F, H) + b1)
    mu = h @ w2.reshape(H, A) + b2
    raw = jnp.stack([out[an].reshape(T, N) for an in roll.act_names], -1)
    z = (raw - mu) / np.exp(ls)
    lp = jnp.sum(-0.5 * z * z - ls - 0.5 * np.log(2 * np.pi), -1)
    ent = float(np.sum(ls + 0.5 * (np.log(2 * np.pi) + 1.0)))
    assert abs(float(lp.mean()) + ent) < 0.08, (float(lp.mean()), -ent)


@pytest.mark.parametrize("eid", ("Cont-CC-PermExDc-v0", "Cont-CC-DFIM-v0"))
def test_cont_policy_physics_matches_buffer_replay(eid):
    """Squashing the recorded raw samples reproduces the applied duties:
    buffer replay matches on every step strictly before the column's
    first violation (buffer mode has no auto-reset)."""
    from gym_electric_motor_tpu.ops.pallas_record import (
        make_fused_record_rollout)

    T, N = 32, 128
    env, roll, _params, planes, out = _collect_cont(eid, T, N)
    A = len(roll.act_names)
    raw = np.stack([np.asarray(out[an]).reshape(T, N)
                    for an in roll.act_names], -1)
    lo, hi = roll.act_range
    acts_env = 0.5 * (lo + hi) + 0.5 * (hi - lo) * np.tanh(raw)
    buf = make_fused_record_rollout(env, T, N, action_mode="buffer",
                                    interpret=True)
    if A == 1:
        abuf = jnp.asarray(acts_env[..., 0].reshape(T, 1, 128))
    else:
        abuf = jnp.asarray(acts_env.transpose(0, 2, 1).reshape(T, A, 1, 128))
    rep = buf(*planes, abuf)
    done = np.asarray(out["done"]).reshape(T, N)
    valid = ((np.cumsum(done, axis=0) - done) == 0) & (done == 0)
    assert valid.mean() > 0.05, valid.mean()
    for nm in roll.state_names:
        a = np.asarray(out[nm]).reshape(T, N)
        b = np.asarray(rep[nm]).reshape(T, N)
        d = np.abs(a - b)[valid]
        scale = 1.0 + np.abs(b[valid]).max()
        assert d.max() / scale < 1e-4, (eid, nm, d.max())


def test_cont_ppo_trainer_runs():
    from gym_electric_motor_tpu.parallel.sharded import (
        init_actor_critic_params, make_fused_ppo_trainer)
    from gym_electric_motor_tpu.ops.pallas_policy import policy_n_cont

    env = gemx.make_functional("Cont-CC-PermExDc-v0")
    NE, T, H = 128, 32, 8
    F, nc = policy_obs_dim(env), policy_n_cont(env)
    assert nc == 1
    init_opt, train = make_fused_ppo_trainer(
        env, hidden=H, horizon=T, n_envs=NE, n_minibatches=2, n_epochs=1,
        interpret=True, kernel="universal")
    params = init_actor_critic_params(jax.random.PRNGKey(0), F, nc, H,
                                      n_cont=nc)
    opt = init_opt(params)
    planes = fused_policy_init_planes(env, NE)
    params2, _opt, _planes, rs = train(params, opt, planes, 0, 2)
    assert np.isfinite(np.asarray(rs)).all()
    assert float(jnp.abs(params2["ls"] - params["ls"]).max()) > 0.0


def test_policy_kernel_composes_with_dead_time_and_external_speed():
    """The in-kernel policy rides the same family machinery as the
    recorders, so the round-4 carried-plane wrappers compose for free:
    DeadTimeProcessor delay planes and the ExternalSpeedLoad time plane
    both run under the policy kernel."""
    from gym_electric_motor_tpu.models.loads import external_speed_load
    from gym_electric_motor_tpu.wrappers import DeadTimeProcessor

    rng = np.random.default_rng(0)

    env = gemx.make_functional(
        "Finite-CC-PermExDc-v0",
        physical_system_wrappers=(DeadTimeProcessor(steps=1),))
    roll = make_fused_policy_record_universal(env, 32, 128, hidden=8,
                                              interpret=True)
    F, A = roll.obs_dim, int(sum(roll.act_ns))
    out = roll(3, rng.normal(0, .3, (F * 8,)).astype(np.float32),
               np.zeros(8, np.float32),
               rng.normal(0, .3, (8 * A,)).astype(np.float32),
               np.zeros(A, np.float32),
               *fused_policy_init_planes(env, 128))
    assert all(np.isfinite(np.asarray(v)).all() for v in out.values())

    def prof(t):
        return 40.0 + 20.0 * jnp.sin(2 * jnp.pi * 5.0 * t)

    env = gemx.make_functional(
        "Cont-SC-PermExDc-v0", load=external_speed_load(prof, tau=1e-4))
    roll = make_fused_policy_record_universal(env, 32, 128, hidden=8,
                                              interpret=True)
    F, A = roll.obs_dim, len(roll.act_names)
    out = roll(3, rng.normal(0, .3, (F * 8,)).astype(np.float32),
               np.zeros(8, np.float32),
               rng.normal(0, .3, (8 * A,)).astype(np.float32),
               np.zeros(A, np.float32), np.full(A, -0.5, np.float32),
               *fused_policy_init_planes(env, 128))
    assert all(np.isfinite(np.asarray(v)).all() for v in out.values())
    # omega is pinned to the external profile regardless of the policy
    w = np.asarray(out["omega"])
    assert 20.0 < w.mean() < 60.0
