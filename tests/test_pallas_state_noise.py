"""Fused StateNoiseProcessor: observation noise runs in the reducing and
recording kernels.

Reference semantics (state_noise_processor.py:4-98): noise is added to
the REPORTED state — reward, constraint checks and recorded signals see
it — while the true ODE state evolves clean.  The fused support is
restricted to the exact-semantics combinations (noise on plane states
that the reward/constraints read directly); derived quantities (torque,
flux-frame dq currents) are computed from the TRUE state in the
reference, so configurations that would couple noise into them reject
loudly and run on the XLA path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu import wrappers as wr
from gym_electric_motor_tpu.ops.pallas_rollout import (
    make_fused_dc_rollout,
    make_fused_induction_rollout,
    make_fused_rollout,
    make_fused_sync_rollout,
)

N_STAT, T_STAT = 512, 400


def _xla_mean(env, n_envs, n_steps, seed=0):
    space = env.action_space
    kind = space.__class__.__name__
    step = jax.vmap(env.step_autoreset)

    @jax.jit
    def run(key):
        keys = jax.random.split(key, n_envs)
        state, _ = jax.vmap(env.reset)(keys)

        def body(carry, _):
            state, k = carry
            k, ka = jax.random.split(k)
            if kind == "Discrete":
                actions = jax.random.randint(ka, (n_envs,), 0, space.n)
            else:
                actions = jax.random.uniform(ka, (n_envs,) + space.shape,
                                             minval=-1.0, maxval=1.0)
            state, _obs, reward, term = step(state, actions)
            return (state, k), (jnp.sum(reward), jnp.sum(term))

        (_, _), (rs, ts) = jax.lax.scan(body, (state, jax.random.PRNGKey(
            seed + 1)), None, length=n_steps)
        return jnp.sum(rs), jnp.sum(ts)

    rs, ts = run(jax.random.PRNGKey(seed))
    return float(rs) / (n_envs * n_steps), float(ts) / (n_envs * n_steps)


def test_state_noise_dc_reward_stats_match_xla():
    """Current-sensor noise on Finite-CC-PermExDc: the fused kernel's
    mean reward and termination rate match the XLA wrapper path (both
    stochastic — statistical agreement like the family stats tests), and
    both differ measurably from the noise-free env."""
    noise = wr.StateNoiseProcessor(("i",), random_kwargs={"scale": 0.12})
    env = gemx.make_functional("Finite-CC-PermExDc-v0",
                               physical_system_wrappers=(noise,))
    roll = make_fused_dc_rollout(env, T_STAT, N_STAT, interpret=True)
    z = jnp.zeros((N_STAT // 128, 128), jnp.float32)
    out = roll(3, z)
    k_mean = float(jnp.sum(out[1])) / (N_STAT * T_STAT)
    k_term = float(jnp.sum(out[2])) / (N_STAT * T_STAT)
    x_mean, x_term = _xla_mean(env, N_STAT, T_STAT)
    assert abs(k_mean - x_mean) < 0.08, (k_mean, x_mean)
    assert abs(k_term - x_term) < max(0.5 * max(k_term, x_term), 2e-3)

    env0 = gemx.make_functional("Finite-CC-PermExDc-v0")
    out0 = make_fused_dc_rollout(env0, T_STAT, N_STAT, interpret=True)(3, z)
    mean0 = float(jnp.sum(out0[1])) / (N_STAT * T_STAT)
    # |i + noise - ref| raises the mean tracking error visibly
    assert k_mean < mean0 - 0.01, (k_mean, mean0)


def test_state_noise_recorder_reward_recomputes():
    """The recorder records the NOISY signals, and the recorded reward
    recomputes EXACTLY from them (non-violation steps) — the same
    invariant the noise-free recorder satisfies, proving reward and
    record see the identical observed state."""
    from gym_electric_motor_tpu.ops.pallas_record import (
        make_fused_record_rollout)

    noise = wr.StateNoiseProcessor(("i",), random_kwargs={"scale": 0.05})
    env = gemx.make_functional("Finite-CC-PermExDc-v0",
                               physical_system_wrappers=(noise,))
    rec = make_fused_record_rollout(env, 64, 128, chunk=8, interpret=True)
    z = jnp.zeros((1, 128), jnp.float32)
    out = rec(5, z)
    names = list(env.physical_system.state_names)
    i_lim = float(np.asarray(env.physical_system.limits)[names.index("i")])
    i_n = np.asarray(out["i"]).reshape(64, 128) / i_lim
    ref = np.asarray(out["ref_i"]).reshape(64, 128)
    rew = np.asarray(out["reward"]).reshape(64, 128)
    done = np.asarray(out["done"]).reshape(64, 128) > 0.5
    # WSE weight/span for the single referenced current is 1/2
    want = -0.5 * np.abs(i_n - ref)
    ok = ~done
    # shift: recorded i is POST-reset; reward was computed pre-reset —
    # identical only on non-violation steps
    np.testing.assert_allclose(rew[ok], want[ok], rtol=1e-4, atol=1e-5)


def test_state_noise_rejections():
    mk = gemx.make_functional
    # torque reference + current noise: torque derives from the TRUE
    # state in the reference — not representable as plane noise
    noise = wr.StateNoiseProcessor(("i",), random_kwargs={"scale": 0.05})
    env = mk("Finite-TC-PermExDc-v0", physical_system_wrappers=(noise,))
    with pytest.raises(NotImplementedError, match="derived"):
        make_fused_dc_rollout(env, 8, 128, interpret=True)
    # SCIM stator currents feed the flux-frame dq reads
    noise = wr.StateNoiseProcessor(("i_sa",),
                                   random_kwargs={"scale": 0.05})
    env = mk("Cont-CC-SCIM-v0", physical_system_wrappers=(noise,))
    with pytest.raises(NotImplementedError, match="derived"):
        make_fused_induction_rollout(env, 8, 128, interpret=True)
    # 'all' noises derived states
    noise = wr.StateNoiseProcessor("all", random_kwargs={"scale": 0.05})
    env = mk("Finite-CC-PermExDc-v0", physical_system_wrappers=(noise,))
    with pytest.raises(NotImplementedError, match="all"):
        make_fused_dc_rollout(env, 8, 128, interpret=True)
    # policy kernels reject (exact obs reconstruction needs the draws)
    from gym_electric_motor_tpu.parallel.sharded import (
        make_fused_dqn_trainer)

    noise = wr.StateNoiseProcessor(("i",), random_kwargs={"scale": 0.05})
    env = mk("Finite-CC-PermExDc-v0", physical_system_wrappers=(noise,))
    with pytest.raises(NotImplementedError, match="policy"):
        make_fused_dqn_trainer(env, n_envs=256, interpret=True)


def test_state_noise_sync_and_speed():
    """Sync currents (CC) and DC speed (SC) noise run fused; uniform and
    laplace distributions compile too."""
    noise = wr.StateNoiseProcessor(("i_sd", "i_sq"),
                                   random_kwargs={"scale": 0.03})
    env = gemx.make_functional("Finite-CC-PMSM-v0",
                               physical_system_wrappers=(noise,))
    roll = make_fused_sync_rollout(env, 64, 128, interpret=True)
    z = jnp.zeros((1, 128), jnp.float32)
    out = roll(3, z, z, z)
    assert all(np.isfinite(np.asarray(o)).all() for o in out)

    for dist, kw in (("uniform", {"low": -0.02, "high": 0.02}),
                     ("laplace", {"scale": 0.02})):
        noise = wr.StateNoiseProcessor(("omega",), random_dist=dist,
                                       random_kwargs=kw)
        env = gemx.make_functional("Cont-SC-PermExDc-v0",
                                   physical_system_wrappers=(noise,))
        roll = make_fused_rollout(env, 64, 128, interpret=True)
        out = roll(3, z, z)
        assert all(np.isfinite(np.asarray(o)).all() for o in out), dist
