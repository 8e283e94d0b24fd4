"""Fused Pallas rollout kernel tests — all three kernels (round-2 VERDICT #2).

Two layers of validation, both through the Pallas interpreter on CPU:

* **Deterministic physics** (buffer-action mode): step-for-step match against
  the XLA env path for PMSM, PermExDc and SCIM.
* **Stochastic machinery** (random mode with the interpret-mode xorshift bit
  source — identical consumer code to the on-core TPU PRNG, see
  ``_make_rng``): Wiener sub-episode parameter distributions from the
  kernel's final-state outputs, and reset-rate / mean-reward agreement with
  the XLA env at matched config.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu import references as rg
from gym_electric_motor_tpu.ops.pallas_rollout import (
    make_fused_permex_rollout,
    make_fused_pmsm_rollout,
    make_fused_scim_rollout,
)

# ---------------------------------------------------------------------------
# deterministic physics: buffer-action mode vs the XLA env
# ---------------------------------------------------------------------------


def test_fused_pmsm_physics_matches_xla_env():
    env = gemx.make_functional(
        "Finite-CC-PMSM-v0",
        reference_generator=rg.ReferenceSpec(
            [rg.ConstReference("i_sd", 0.0), rg.ConstReference("i_sq", 0.0)]
        ),
    )
    N, T = 128, 40
    rng = np.random.default_rng(0)
    actions = rng.integers(0, 8, size=(T, 1, 128)).astype(np.int32)

    roll = make_fused_pmsm_rollout(env, T, N, action_mode="buffer", interpret=True)
    zero = jnp.zeros((1, 128), jnp.float32)
    i_sd_k, i_sq_k, eps_k, _r, _t = roll(zero, zero, zero, jnp.asarray(actions))

    keys = jax.random.split(jax.random.PRNGKey(0), N)
    state, _ = jax.jit(jax.vmap(env.reset))(keys)
    step = jax.jit(jax.vmap(env.step))
    for t in range(T):
        state, obs, r, term = step(state, jnp.asarray(actions[t].reshape(N)))
    ode = np.asarray(state.phys.ode_state)  # [omega, i_sd, i_sq, eps]

    np.testing.assert_allclose(np.asarray(i_sd_k).reshape(N), ode[:, 1],
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(i_sq_k).reshape(N), ode[:, 2],
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(eps_k).reshape(N),
                               np.mod(ode[:, 3], 2 * np.pi), rtol=1e-5, atol=1e-5)


def test_fused_permex_physics_matches_xla_env():
    env = gemx.make_functional(
        "Finite-CC-PermExDc-v0",
        reference_generator=rg.ConstReference("i", 0.0),
    )
    N, T = 128, 60
    rng = np.random.default_rng(1)
    actions = rng.integers(0, 4, size=(T, 1, 128)).astype(np.int32)

    roll = make_fused_permex_rollout(env, T, N, action_mode="buffer",
                                     interpret=True)
    zero = jnp.zeros((1, 128), jnp.float32)
    i_k = roll(zero, jnp.asarray(actions))

    keys = jax.random.split(jax.random.PRNGKey(0), N)
    state, _ = jax.jit(jax.vmap(env.reset))(keys)
    step = jax.jit(jax.vmap(env.step))
    for t in range(T):
        state, obs, r, term = step(state, jnp.asarray(actions[t].reshape(N)))
    ode = np.asarray(state.phys.ode_state)  # [omega, i]

    np.testing.assert_allclose(np.asarray(i_k).reshape(N), ode[:, 1],
                               rtol=1e-5, atol=1e-4)


def test_fused_scim_physics_matches_xla_env():
    env = gemx.make_functional(
        "Cont-TC-SCIM-v0",
        reference_generator=rg.ConstReference("torque", 0.0),
    )
    N, T = 128, 60
    rng = np.random.default_rng(2)
    actions = rng.uniform(-1.0, 1.0, size=(T, 3, 1, 128)).astype(np.float32)

    roll = make_fused_scim_rollout(env, T, N, action_mode="buffer",
                                   interpret=True)
    zero = jnp.zeros((1, 128), jnp.float32)
    isa_k, isb_k, psa_k, psb_k = roll(zero, zero, zero, zero,
                                      jnp.asarray(actions))

    keys = jax.random.split(jax.random.PRNGKey(0), N)
    state, _ = jax.jit(jax.vmap(env.reset))(keys)
    step = jax.jit(jax.vmap(env.step))
    for t in range(T):
        state, obs, r, term = step(
            state, jnp.asarray(actions[t].reshape(3, N).T))
    # ode: [omega, i_salpha, i_sbeta, psi_ralpha, psi_rbeta, epsilon]
    ode = np.asarray(state.phys.ode_state)

    np.testing.assert_allclose(np.asarray(isa_k).reshape(N), ode[:, 1],
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(isb_k).reshape(N), ode[:, 2],
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(psa_k).reshape(N), ode[:, 3],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(psb_k).reshape(N), ode[:, 4],
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# stochastic machinery: interpret-mode statistical validation
# ---------------------------------------------------------------------------

N_STAT = 256  # (2, 128) planes
T_STAT = 2500


def _xla_random_rollout(env_id, n_envs, n_steps, seed=0):
    """Reset-rate / mean-reward oracle: the XLA env under random actions."""
    env = gemx.make_functional(env_id)
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

        (_, _), (rsums, tsums) = jax.lax.scan(
            body, (state, jax.random.PRNGKey(seed + 1)), None, length=n_steps)
        return jnp.sum(rsums), jnp.sum(tsums)

    r, t = run(jax.random.PRNGKey(seed))
    total = n_envs * n_steps
    return float(r) / total, float(t) / total


def _check_wiener_state(rv, rk, rl, rs, margin, sig_lo, sig_hi):
    rv, rk, rl, rs = (np.asarray(x).ravel() for x in (rv, rk, rl, rs))
    # episode lengths ~ floor(U[500, 2000)).  The snapshot samples the
    # *active* sub-episode, which is length-biased: E[L^2]/E[L] = 1400 for
    # pure renewals, while frequent violation-resets pull it back toward the
    # unbiased 1250 — accept the whole bracket (+- sampling error).
    assert rl.min() >= 500.0 and rl.max() < 2000.0
    assert 1130.0 < rl.mean() < 1520.0
    # sigma ~ log-uniform [sig_lo, sig_hi]
    assert rs.min() >= sig_lo * 0.999 and rs.max() <= sig_hi * 1.001
    log_mid = (np.log10(sig_lo) + np.log10(sig_hi)) / 2.0
    log_w = np.log10(sig_hi) - np.log10(sig_lo)
    # mean of n iid U[log_lo, log_hi] draws: sd = w/sqrt(12 n); allow 5 sd
    assert abs(np.log10(rs).mean() - log_mid) < 5 * log_w / np.sqrt(12 * len(rs))
    # step counter stays within the current sub-episode
    assert np.all(rk >= 1.0) and np.all(rk <= rl)
    # reference values live inside the margin band and actually moved
    assert np.all(np.abs(rv) <= margin * 1.001)
    assert rv.std() > 0.05 * margin


def test_fused_pmsm_stochastic_stats():
    env = gemx.make_functional("Finite-CC-PMSM-v0")
    roll = make_fused_pmsm_rollout(env, T_STAT, N_STAT, action_mode="random",
                                   interpret=True)
    z = jnp.zeros((2, 128), jnp.float32)
    (i_sd, i_sq, eps, reward, terms, rv, rk, rl, rs) = roll(3, z, z, z)

    ps = env.physical_system
    names = list(ps.state_names)
    margin = float(ps.nominal_state[names.index("i_sd")]
                   / ps.limits[names.index("i_sd")])
    _check_wiener_state(rv, rk, rl, rs, margin, 1e-3, 1e-1)

    kernel_mean_r = float(jnp.sum(reward)) / (N_STAT * T_STAT)
    kernel_term_rate = float(jnp.sum(terms)) / (N_STAT * T_STAT)
    xla_mean_r, xla_term_rate = _xla_random_rollout(
        "Finite-CC-PMSM-v0", N_STAT, T_STAT)
    assert abs(kernel_mean_r - xla_mean_r) < 0.05
    assert abs(kernel_term_rate - xla_term_rate) < max(
        0.5 * max(kernel_term_rate, xla_term_rate), 2e-3)
    # kernel state stays physical
    assert np.all(np.isfinite(np.asarray(i_sd)))
    assert np.all(np.asarray(eps) >= 0.0) and np.all(np.asarray(eps) < 2 * np.pi)


def test_fused_permex_stochastic_stats():
    env = gemx.make_functional("Finite-CC-PermExDc-v0")
    roll = make_fused_permex_rollout(env, T_STAT, N_STAT, interpret=True)
    z = jnp.zeros((2, 128), jnp.float32)
    (i, reward, terms, rv, rk, rl, rs) = roll(3, z)

    ps = env.physical_system
    names = list(ps.state_names)
    margin = float(ps.nominal_state[names.index("i")]
                   / ps.limits[names.index("i")])
    _check_wiener_state(rv, rk, rl, rs, margin, 1e-2, 1e-1)

    kernel_mean_r = float(jnp.sum(reward)) / (N_STAT * T_STAT)
    kernel_term_rate = float(jnp.sum(terms)) / (N_STAT * T_STAT)
    xla_mean_r, xla_term_rate = _xla_random_rollout(
        "Finite-CC-PermExDc-v0", N_STAT, T_STAT)
    assert abs(kernel_mean_r - xla_mean_r) < 0.08
    assert abs(kernel_term_rate - xla_term_rate) < max(
        0.5 * max(kernel_term_rate, xla_term_rate), 2e-3)
    assert np.all(np.isfinite(np.asarray(i)))


def test_fused_scim_stochastic_stats():
    env = gemx.make_functional("Cont-TC-SCIM-v0")
    roll = make_fused_scim_rollout(env, T_STAT, N_STAT, interpret=True)
    z = jnp.zeros((2, 128), jnp.float32)
    (isa, isb, psa, psb, reward, terms, rv, rk, rl, rs) = roll(3, z, z, z, z)

    ps = env.physical_system
    names = list(ps.state_names)
    margin = float(ps.nominal_state[names.index("torque")]
                   / ps.limits[names.index("torque")])
    _check_wiener_state(rv, rk, rl, rs, margin, 1e-3, 1e-1)

    kernel_mean_r = float(jnp.sum(reward)) / (N_STAT * T_STAT)
    kernel_term_rate = float(jnp.sum(terms)) / (N_STAT * T_STAT)
    xla_mean_r, xla_term_rate = _xla_random_rollout(
        "Cont-TC-SCIM-v0", N_STAT, T_STAT)
    assert abs(kernel_mean_r - xla_mean_r) < 0.08
    assert abs(kernel_term_rate - xla_term_rate) < max(
        0.5 * max(kernel_term_rate, xla_term_rate), 2e-3)
    for x in (isa, isb, psa, psb):
        assert np.all(np.isfinite(np.asarray(x)))
