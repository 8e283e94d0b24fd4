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
            elif kind == "MultiDiscrete":
                u = jax.random.uniform(ka, (n_envs, len(space.nvec)))
                actions = (u * jnp.asarray(space.nvec)).astype(jnp.int32)
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


def test_fused_eesm_physics_matches_xla_env():
    env = gemx.make_functional(
        "Finite-CC-EESM-v0",
        reference_generator=rg.ReferenceSpec(
            [rg.ConstReference("i_sd", 0.0), rg.ConstReference("i_sq", 0.0),
             rg.ConstReference("i_e", 0.0)]),
    )
    from gym_electric_motor_tpu.ops.pallas_rollout import make_fused_eesm_rollout

    N, T = 128, 50
    rng = np.random.default_rng(3)
    actions = np.stack([rng.integers(0, 8, size=(T, 1, 128)),
                        rng.integers(0, 4, size=(T, 1, 128))],
                       axis=1).astype(np.int32)
    roll = make_fused_eesm_rollout(env, T, N, action_mode="buffer",
                                   interpret=True)
    z = jnp.zeros((1, 128), jnp.float32)
    isd_k, isq_k, ie_k, eps_k = roll(z, z, z, z, jnp.asarray(actions))

    keys = jax.random.split(jax.random.PRNGKey(0), N)
    state, _ = jax.jit(jax.vmap(env.reset))(keys)
    step = jax.jit(jax.vmap(env.step))
    for t in range(T):
        state, obs, r, term = step(state, jnp.asarray(actions[t].reshape(2, N).T))
    ode = np.asarray(state.phys.ode_state)  # [omega, i_sd, i_sq, i_e, eps]

    np.testing.assert_allclose(np.asarray(isd_k).reshape(N), ode[:, 1],
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(isq_k).reshape(N), ode[:, 2],
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ie_k).reshape(N), ode[:, 3],
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(eps_k).reshape(N),
                               np.mod(ode[:, 4], 2 * np.pi), rtol=1e-5, atol=1e-5)


def test_fused_dfim_physics_matches_xla_env():
    env = gemx.make_functional(
        "Cont-CC-DFIM-v0",
        reference_generator=rg.ReferenceSpec(
            [rg.ConstReference("i_sd", 0.0), rg.ConstReference("i_sq", 0.0)]),
    )
    from gym_electric_motor_tpu.ops.pallas_rollout import make_fused_dfim_rollout

    N, T = 128, 50
    rng = np.random.default_rng(4)
    actions = rng.uniform(-1, 1, size=(T, 6, 1, 128)).astype(np.float32)
    roll = make_fused_dfim_rollout(env, T, N, action_mode="buffer",
                                   interpret=True)
    z = jnp.zeros((1, 128), jnp.float32)
    outs = roll(z, z, z, z, z, jnp.asarray(actions))

    keys = jax.random.split(jax.random.PRNGKey(0), N)
    state, _ = jax.jit(jax.vmap(env.reset))(keys)
    step = jax.jit(jax.vmap(env.step))
    for t in range(T):
        state, obs, r, term = step(state, jnp.asarray(actions[t].reshape(6, N).T))
    ode = np.asarray(state.phys.ode_state)  # [omega, i_sa, i_sb, pa, pb, eps]

    for j in range(4):
        np.testing.assert_allclose(np.asarray(outs[j]).reshape(N), ode[:, 1 + j],
                                   rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(outs[4]).reshape(N),
                               np.mod(ode[:, 5], 2 * np.pi), rtol=1e-5, atol=1e-5)


def test_fused_eesm_stochastic_stats():
    from gym_electric_motor_tpu.ops.pallas_rollout import make_fused_eesm_rollout

    env = gemx.make_functional("Finite-CC-EESM-v0")
    roll = make_fused_eesm_rollout(env, T_STAT, N_STAT, interpret=True)
    z = jnp.zeros((2, 128), jnp.float32)
    (isd, isq, ie, eps, reward, terms, rv, rk, rl, rs) = roll(3, z, z, z, z)

    R = N_STAT // 128
    rv, rl, rs, rk = (np.asarray(x) for x in (rv, rl, rs, rk))
    # symmetric i_sd/i_sq bands, one-sided (0, 1) i_e band
    ps = env.physical_system
    names = list(ps.state_names)
    m = float(ps.nominal_state[names.index("i_sd")]
              / ps.limits[names.index("i_sd")])
    assert np.all(np.abs(rv[: 2 * R]) <= m * 1.001)
    assert rv[2 * R:].min() >= 0.0 and rv[2 * R:].max() <= 1.001
    assert rl.min() >= 500.0 and rl.max() < 2000.0
    assert rs.min() >= 1e-3 * 0.999 and rs.max() <= 1e-1 * 1.001
    assert np.all(rk >= 1.0) and np.all(rk <= rl)

    kernel_mean_r = float(jnp.sum(reward)) / (N_STAT * T_STAT)
    kernel_term_rate = float(jnp.sum(terms)) / (N_STAT * T_STAT)
    xla_mean_r, xla_term_rate = _xla_random_rollout(
        "Finite-CC-EESM-v0", N_STAT, T_STAT)
    assert abs(kernel_mean_r - xla_mean_r) < 0.08
    assert abs(kernel_term_rate - xla_term_rate) < max(
        0.5 * max(kernel_term_rate, xla_term_rate), 2e-3)


def test_fused_dfim_stochastic_stats():
    from gym_electric_motor_tpu.ops.pallas_rollout import make_fused_dfim_rollout

    env = gemx.make_functional("Cont-CC-DFIM-v0")
    roll = make_fused_dfim_rollout(env, T_STAT, N_STAT, interpret=True)
    z = jnp.zeros((2, 128), jnp.float32)
    (isa, isb, pa, pb, eps, reward, terms, rv, rk, rl, rs) = roll(3, z, z, z, z, z)

    ps = env.physical_system
    names = list(ps.state_names)
    m = float(ps.nominal_state[names.index("i_sd")]
              / ps.limits[names.index("i_sd")])
    _check_wiener_state(rv, rk, rl, rs, m, 1e-3, 1e-1)

    kernel_mean_r = float(jnp.sum(reward)) / (N_STAT * T_STAT)
    kernel_term_rate = float(jnp.sum(terms)) / (N_STAT * T_STAT)
    xla_mean_r, xla_term_rate = _xla_random_rollout(
        "Cont-CC-DFIM-v0", N_STAT, T_STAT)
    assert abs(kernel_mean_r - xla_mean_r) < 0.08
    assert abs(kernel_term_rate - xla_term_rate) < max(
        0.5 * max(kernel_term_rate, xla_term_rate), 2e-3)
    for x in (isa, isb, pa, pb):
        assert np.all(np.isfinite(np.asarray(x)))


def test_fused_foc_closed_loop_matches_control_environment():
    """The fused controller-in-the-loop kernel (const-ref mode) must track
    ``GemController.control_environment`` step-for-step: same tuned gains,
    EMF decoupling, clipping/anti-windup, advance-angle transform, output
    stage and physics."""
    from gym_electric_motor_tpu.controllers import GemController
    from gym_electric_motor_tpu.ops.pallas_rollout import make_fused_foc_rollout

    env = gemx.make_functional(
        "Cont-CC-PMSM-v0",
        reference_generator=rg.ReferenceSpec(
            [rg.ConstReference("i_sd", -0.1), rg.ConstReference("i_sq", 0.3)]),
    )
    ctrl = GemController.make(env, "Cont-CC-PMSM-v0")
    T, N = 400, 128
    roll = make_fused_foc_rollout(env, ctrl, T, N, ref_mode="const",
                                  interpret=True)
    z = jnp.zeros((1, 128), jnp.float32)
    rd = jnp.full((1, 128), -0.1, jnp.float32)
    rq = jnp.full((1, 128), 0.3, jnp.float32)
    isd_k, isq_k, eps_k, rew_k, term_k, *_ = roll(0, z, z, z, rd, rq)

    out = ctrl.control_environment(env, T, key=jax.random.PRNGKey(0))
    names = env.state_names
    lim = env.physical_system.limits
    S = np.asarray(out["states"])
    isd_x = S[-1, names.index("i_sd")] * lim[names.index("i_sd")]
    isq_x = S[-1, names.index("i_sq")] * lim[names.index("i_sq")]

    np.testing.assert_allclose(float(isd_k[0, 0]), isd_x, rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(float(isq_k[0, 0]), isq_x, rtol=1e-5, atol=1e-3)
    # steady state at the setpoints
    np.testing.assert_allclose(float(isd_k[0, 0]), -0.1 * 400.0, atol=0.05)
    np.testing.assert_allclose(float(isq_k[0, 0]), 0.3 * 400.0, atol=0.05)
    # cumulative reward agreement (covers the whole trajectory, not just
    # the endpoint)
    np.testing.assert_allclose(float(rew_k.sum()) / (N * T),
                               float(np.asarray(out["rewards"]).mean()),
                               rtol=1e-4, atol=1e-6)
    assert float(term_k.sum()) == 0.0


def test_fused_foc_wiener_mode_stats():
    from gym_electric_motor_tpu.controllers import GemController
    from gym_electric_motor_tpu.ops.pallas_rollout import make_fused_foc_rollout

    env = gemx.make_functional("Cont-CC-PMSM-v0")
    ctrl = GemController.make(env, "Cont-CC-PMSM-v0")
    roll = make_fused_foc_rollout(env, ctrl, 2000, N_STAT, interpret=True)
    z = jnp.zeros((2, 128), jnp.float32)
    (isd, isq, eps, reward, terms, rv, rk, rl, rs) = roll(3, z, z, z)
    ps = env.physical_system
    names = list(ps.state_names)
    m = float(ps.nominal_state[names.index("i_sd")]
              / ps.limits[names.index("i_sd")])
    _check_wiener_state(rv, rk, rl, rs, m, 1e-3, 1e-1)
    # a *controlled* loop tracks its references: mean reward far above the
    # random-action XLA baseline
    mean_r = float(jnp.sum(reward)) / (N_STAT * 2000)
    assert mean_r > -0.05, mean_r
    assert float(jnp.sum(terms)) == 0.0  # controller keeps currents in limits


def test_fused_policy_rollout_matches_xla_greedy():
    """Policy-network-in-the-loop kernel (greedy + const refs) must track
    the XLA env driven by the same MLP argmax policy step-for-step."""
    from gym_electric_motor_tpu.parallel.sharded import (
        init_policy_params, policy_logits)
    from gym_electric_motor_tpu.ops.pallas_rollout import (
        flatten_policy_params, make_fused_policy_rollout)

    SF = ("omega", "i_sd", "i_sq", "epsilon")
    env = gemx.make_functional(
        "Finite-CC-PMSM-v0", state_filter=SF,
        reference_generator=rg.ReferenceSpec(
            [rg.ConstReference("i_sd", -0.1), rg.ConstReference("i_sq", 0.2)]))
    params = init_policy_params(jax.random.PRNGKey(5), 6, 8, hidden=16)
    w1, b1, w2, b2 = flatten_policy_params(params)

    T, N = 200, 128
    roll = make_fused_policy_rollout(env, T, N, hidden=16, sample="greedy",
                                     ref_mode="const", interpret=True)
    z = jnp.zeros((1, 128), jnp.float32)
    rd = jnp.full((1, 128), -0.1, jnp.float32)
    rq = jnp.full((1, 128), 0.2, jnp.float32)
    isd_k, isq_k, eps_k, rew_k, term_k = roll(0, w1, b1, w2, b2, z, z, z, rd, rq)

    keys = jax.random.split(jax.random.PRNGKey(0), N)
    state, obs = jax.jit(jax.vmap(env.reset))(keys)
    step = jax.jit(jax.vmap(env.step_autoreset))
    rew_sum = 0.0
    for t in range(T):
        o = jnp.concatenate([obs[0], obs[1]], axis=-1)
        actions = jnp.argmax(policy_logits(params, o), axis=-1)
        state, obs, r, term = step(state, actions)
        rew_sum += float(r.sum())
    ode = np.asarray(state.phys.ode_state)

    np.testing.assert_allclose(np.asarray(isd_k).reshape(N), ode[:, 1],
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(isq_k).reshape(N), ode[:, 2],
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(float(rew_k.sum()) / (N * T), rew_sum / (N * T),
                               rtol=1e-5, atol=1e-7)


def test_fused_policy_rollout_stochastic_runs():
    from gym_electric_motor_tpu.parallel.sharded import init_policy_params
    from gym_electric_motor_tpu.ops.pallas_rollout import (
        flatten_policy_params, make_fused_policy_rollout)

    SF = ("omega", "i_sd", "i_sq", "epsilon")
    env = gemx.make_functional("Finite-CC-PMSM-v0", state_filter=SF)
    params = init_policy_params(jax.random.PRNGKey(1), 6, 8, hidden=16)
    w1, b1, w2, b2 = flatten_policy_params(params)
    roll = make_fused_policy_rollout(env, 1000, 256, hidden=16, interpret=True)
    z = jnp.zeros((2, 128), jnp.float32)
    isd, isq, eps, reward, terms = roll(3, w1, b1, w2, b2, z, z, z)
    mean_r = float(jnp.sum(reward)) / (256 * 1000)
    # near-uniform sampling over actions behaves like the random baseline
    xla_mean_r, _ = _xla_random_rollout("Finite-CC-PMSM-v0", 256, 1000)
    assert abs(mean_r - xla_mean_r) < 0.1, (mean_r, xla_mean_r)
    assert np.all(np.isfinite(np.asarray(isd)))


def test_sharded_fused_rollout_over_mesh():
    """Fused kernel x shard_map: one kernel per device over P('env'), psum'd
    global metrics — the fast path's multi-chip mode (virtual 8-device CPU
    mesh here, real chips unchanged)."""
    from gym_electric_motor_tpu.parallel import make_env_mesh
    from gym_electric_motor_tpu.ops.pallas_rollout import (
        make_fused_pmsm_rollout, make_sharded_fused_rollout)

    env = gemx.make_functional("Finite-CC-PMSM-v0")
    mesh = make_env_mesh(8)
    T, N = 500, 8 * 256
    roll = make_sharded_fused_rollout(env, T, N, mesh, interpret=True)
    z = jnp.zeros((N // 128, 128), jnp.float32)
    out_all = roll(3, z, z, z)
    isd, rsum, tsum = out_all[0], out_all[-2], out_all[-1]
    assert isd.shape == (N // 128, 128)
    # every device ran: per-device reward sums all nonzero and distinct seeds
    mesh_mean = float(rsum[0]) / (N * T)

    single = make_fused_pmsm_rollout(env, T, 256, action_mode="random",
                                     interpret=True)
    z1 = jnp.zeros((2, 128), jnp.float32)
    out = single(7, z1, z1, z1)
    single_mean = float(out[3].sum()) / (256 * T)
    # same distribution across the mesh as on one device
    assert abs(mesh_mean - single_mean) < 0.05, (mesh_mean, single_mean)
    assert np.all(np.isfinite(np.asarray(isd)))


# ---------------------------------------------------------------------------
# in-kernel REINFORCE training (backward pass inside the fused rollout)
# ---------------------------------------------------------------------------


def _reinforce_setup():
    from gym_electric_motor_tpu.parallel.sharded import init_policy_params
    from gym_electric_motor_tpu.ops.pallas_rollout import flatten_policy_params

    SF = ("omega", "i_sd", "i_sq", "epsilon")
    env = gemx.make_functional(
        "Finite-CC-PMSM-v0", state_filter=SF,
        reference_generator=rg.ReferenceSpec(
            [rg.ConstReference("i_sd", -0.1), rg.ConstReference("i_sq", 0.2)]))
    params = init_policy_params(jax.random.PRNGKey(5), 6, 8, hidden=16)
    return env, params, flatten_policy_params(params)


def _greedy_trajectory(env, params, T, N):
    """Collect (obs, action, reward) from the XLA env under argmax actions —
    the deterministic trajectory both gradient oracles are evaluated on."""
    from gym_electric_motor_tpu.parallel.sharded import policy_logits

    keys = jax.random.split(jax.random.PRNGKey(0), N)
    state, obs = jax.jit(jax.vmap(env.reset))(keys)
    step = jax.jit(jax.vmap(env.step_autoreset))
    OBS, ACT, REW = [], [], []
    for _ in range(T):
        o = jnp.concatenate([obs[0], obs[1]], axis=-1)
        a = jnp.argmax(policy_logits(params, o), axis=-1)
        state, obs, r, _t = step(state, a)
        OBS.append(o), ACT.append(a), REW.append(r)
    return jnp.stack(OBS), jnp.stack(ACT), jnp.stack(REW)


@pytest.mark.parametrize("gamma", [0.0, 0.97])
def test_fused_reinforce_gradient_matches_autodiff_oracle(gamma):
    """The in-kernel eligibility-trace policy gradient must equal jax.grad of
    the REINFORCE surrogate on the same deterministic (greedy + const-ref)
    trajectory: per-step estimator at gamma=0 (exactly the XLA trainer's
    ``_build_reinforce_step`` estimator), discounted return-to-go weights at
    gamma>0."""
    from gym_electric_motor_tpu.parallel.sharded import policy_logits
    from gym_electric_motor_tpu.ops.pallas_rollout import (
        make_fused_reinforce_rollout, unflatten_policy_grads)

    env, params, (w1, b1, w2, b2) = _reinforce_setup()
    T, N, BASE = 150, 128, -0.07

    roll = make_fused_reinforce_rollout(env, T, N, hidden=16, gamma=gamma,
                                        sample="greedy", ref_mode="const",
                                        block_rows=1, interpret=True)
    z = jnp.zeros((1, 128), jnp.float32)
    rd = jnp.full((1, 128), -0.1, jnp.float32)
    rq = jnp.full((1, 128), 0.2, jnp.float32)
    out = roll(0, BASE, w1, b1, w2, b2, z, z, z, rd, rq)
    g_kernel = unflatten_policy_grads(out[5], 6, 8, 16)

    OBS, ACT, REW = _greedy_trajectory(env, params, T, N)
    assert not bool((REW < -5).any()), "config must stay violation-free"

    # discounted return-to-go weights; gamma=0 degenerates to (r_t - b)
    adv = np.asarray(REW, np.float64) - BASE
    w = np.zeros((T, N))
    acc = np.zeros(N)
    for t in range(T - 1, -1, -1):
        acc = adv[t] + gamma * acc
        w[t] = acc
    w = jnp.asarray(w, jnp.float32)

    def surrogate(params):
        logits = policy_logits(params, OBS.reshape(T * N, 6))
        logp = jax.nn.log_softmax(logits)[jnp.arange(T * N), ACT.reshape(-1)]
        return jnp.sum(w.reshape(-1) * logp)

    g_oracle = jax.grad(surrogate)(params)
    for k in ("w1", "b1", "w2", "b2"):
        a, b = np.asarray(g_kernel[k]), np.asarray(g_oracle[k])
        rel = np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9)
        assert rel < 1e-4, (k, rel)


def test_fused_reinforce_trainer_runs_and_updates():
    """Whole-run in-kernel trainer: params move in the ascent direction,
    rewards are recorded per iteration, everything stays finite."""
    from gym_electric_motor_tpu.ops.pallas_rollout import (
        make_fused_reinforce_trainer)

    env, params, _flat = _reinforce_setup()
    env = gemx.make_functional(
        "Finite-CC-PMSM-v0",
        state_filter=("omega", "i_sd", "i_sq", "epsilon"))
    train = make_fused_reinforce_trainer(env, 100, 256, hidden=16,
                                         gamma=0.95, lr=40.0, block_rows=1,
                                         interpret=True)
    p2, rs = train(0, params, 3)
    rs = np.asarray(rs)
    assert rs.shape == (3,) and np.all(np.isfinite(rs))
    # random-policy reward regime for this env (mean WSE in [-0.5, 0])
    assert -0.5 < rs.mean() < 0.0, rs
    for k in params:
        assert np.all(np.isfinite(np.asarray(p2[k])))
        assert not np.allclose(np.asarray(p2[k]), np.asarray(params[k]))


# ---------------------------------------------------------------------------
# DC speed-control kernels (Cont-SC-SeriesDc / Cont-SC-ShuntDc)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("env_id,n_el", [
    ("Cont-SC-SeriesDc-v0", 1),
    ("Cont-SC-ShuntDc-v0", 2),
])
def test_fused_dc_sc_physics_matches_xla_env(env_id, n_el):
    from gym_electric_motor_tpu.ops.pallas_rollout import make_fused_dc_sc_rollout

    env = gemx.make_functional(env_id, reference_generator=rg.ConstReference("omega", 0.0))
    N, T = 128, 60
    rng = np.random.default_rng(4)
    actions = rng.uniform(-1.0, 1.0, size=(T, 1, 128)).astype(np.float32)

    roll = make_fused_dc_sc_rollout(env, T, N, action_mode="buffer", interpret=True)
    zero = jnp.zeros((1, 128), jnp.float32)
    out = roll(*([zero] * (1 + n_el)), jnp.asarray(actions))

    keys = jax.random.split(jax.random.PRNGKey(0), N)
    state, _ = jax.jit(jax.vmap(env.reset))(keys)
    step = jax.jit(jax.vmap(env.step))
    for t in range(T):
        state, obs, r, term = step(state, jnp.asarray(actions[t].reshape(N, 1)))
    phys = state.phys.inner if hasattr(state.phys, "inner") else state.phys
    ode = np.asarray(phys.ode_state)  # [omega, i...] per env

    for j in range(1 + n_el):
        np.testing.assert_allclose(np.asarray(out[j]).reshape(N), ode[:, j],
                                   rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("env_id,n_el,sig_lo,sig_hi", [
    ("Cont-SC-SeriesDc-v0", 1, 1e-3, 2e-2),
    ("Cont-SC-ShuntDc-v0", 2, 1e-3, 3e-2),
])
def test_fused_dc_sc_stochastic_stats(env_id, n_el, sig_lo, sig_hi):
    from gym_electric_motor_tpu.ops.pallas_rollout import make_fused_dc_sc_rollout

    env = gemx.make_functional(env_id)
    roll = make_fused_dc_sc_rollout(env, T_STAT, N_STAT, interpret=True)
    z = jnp.zeros((2, 128), jnp.float32)
    out = roll(3, *([z] * (1 + n_el)))
    reward, terms, rv, rk, rl, rs = out[1 + n_el:]

    ps = env.physical_system
    names = list(ps.state_names)
    margin = float(ps.nominal_state[names.index("omega")]
                   / ps.limits[names.index("omega")])
    _check_wiener_state(rv, rk, rl, rs, margin, sig_lo, sig_hi)
    # the SC omega reference window is one-sided [0, margin]
    assert np.asarray(rv).min() >= 0.0

    kernel_mean_r = float(jnp.sum(reward)) / (N_STAT * T_STAT)
    kernel_term_rate = float(jnp.sum(terms)) / (N_STAT * T_STAT)
    xla_mean_r, xla_term_rate = _xla_random_rollout(env_id, N_STAT, T_STAT)
    assert abs(kernel_mean_r - xla_mean_r) < 0.08
    assert abs(kernel_term_rate - xla_term_rate) < max(
        0.5 * max(kernel_term_rate, xla_term_rate), 2e-3)
    for x in out[:1 + n_el]:
        assert np.all(np.isfinite(np.asarray(x)))


def test_fused_synrm_physics_matches_xla_env():
    """The PMSM kernel doubles as the SynRM kernel (same dq machine with
    psi_p = 0): buffer-action parity vs the XLA env."""
    env = gemx.make_functional(
        "Finite-CC-SynRM-v0",
        reference_generator=rg.ReferenceSpec(
            [rg.ConstReference("i_sd", 0.0), rg.ConstReference("i_sq", 0.0)]
        ),
    )
    N, T = 128, 40
    rng = np.random.default_rng(7)
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


def test_fused_synrm_stochastic_stats():
    env = gemx.make_functional("Finite-CC-SynRM-v0")
    roll = make_fused_pmsm_rollout(env, T_STAT, N_STAT, interpret=True)
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
        "Finite-CC-SynRM-v0", N_STAT, T_STAT)
    assert abs(kernel_mean_r - xla_mean_r) < 0.05
    assert abs(kernel_term_rate - xla_term_rate) < max(
        0.5 * max(kernel_term_rate, xla_term_rate), 2e-3)


@pytest.mark.parametrize("env_id,kernel,n_state", [
    ("Finite-CC-PermExDc-v0", "permex", 1),
    ("Cont-SC-ShuntDc-v0", "dc_sc", 3),
    ("Cont-CC-DFIM-v0", "dfim", 5),
])
def test_sharded_fused_rollout_all_kernels(env_id, kernel, n_state):
    """The sharded wrapper dispatches every kernel family (virtual 8-device
    CPU mesh): local shards run on-core, metrics psum globally."""
    from gym_electric_motor_tpu.parallel import make_env_mesh
    from gym_electric_motor_tpu.ops.pallas_rollout import make_sharded_fused_rollout

    env = gemx.make_functional(env_id)
    mesh = make_env_mesh(8)
    T, N = 300, 8 * 128
    roll = make_sharded_fused_rollout(env, T, N, mesh, kernel=kernel,
                                      interpret=True)
    z = jnp.zeros((N // 128, 128), jnp.float32)
    out = roll(3, *([z] * n_state))
    rsum, tsum = out[-2], out[-1]
    assert np.isfinite(float(rsum[0])) and float(rsum[0]) < 0.0
    assert float(tsum[0]) >= 0.0
    for x in out[:n_state]:
        assert np.all(np.isfinite(np.asarray(x)))


# ---------------------------------------------------------------------------
# DC speed-control cascade in the loop
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("env_id,n_state", [
    ("Cont-SC-PermExDc-v0", 2),
    ("Cont-SC-SeriesDc-v0", 2),
    ("Cont-SC-ShuntDc-v0", 3),
])
def test_fused_dc_cascade_matches_control_environment(env_id, n_state):
    """The in-kernel three-stage speed cascade (PI speed -> torque clip ->
    analytic OPS -> current clip -> PI current + EMF-FF -> voltage clip ->
    cont output) must track GemController.control_environment: same tuned
    gains, anti-windup and converter duty clipping, against the
    PolynomialStaticLoad physics."""
    from gym_electric_motor_tpu.controllers import GemController
    from gym_electric_motor_tpu.ops.pallas_rollout import (
        make_fused_dc_cascade_rollout,
    )

    env = gemx.make_functional(
        env_id, reference_generator=rg.ConstReference("omega", 0.5))
    ctrl = GemController.make(env, env_id)
    T, N = 4000, 128
    roll = make_fused_dc_cascade_rollout(env, ctrl, T, N, interpret=True)
    z = jnp.zeros((1, 128), jnp.float32)
    out = roll(0, *([z] * n_state))
    omega_k = float(out[0][0, 0])
    rew_k = float(out[n_state].sum()) / (N * T)
    assert float(out[n_state + 1].sum()) == 0.0  # no violations

    res = ctrl.control_environment(env, T, key=jax.random.PRNGKey(0))
    names = env.state_names
    lim = np.asarray(env.physical_system.limits)
    w_lim = lim[names.index("omega")]
    omega_x = float(np.asarray(res["states"])[-1, names.index("omega")]) * w_lim
    np.testing.assert_allclose(omega_k, omega_x, rtol=1e-5, atol=1e-2)
    np.testing.assert_allclose(
        rew_k, float(np.asarray(res["rewards"]).mean()), rtol=1e-4,
        atol=1e-6)
    # converged to the setpoint
    np.testing.assert_allclose(omega_k, 0.5 * w_lim, rtol=2e-3)


def test_fused_dc_cascade_wiener_mode():
    """Wiener speed references through the in-kernel cascade: the closed
    loop tracks (mean |omega_n - ref| far below the open-loop spread) with
    zero violations."""
    from gym_electric_motor_tpu.controllers import GemController
    from gym_electric_motor_tpu.ops.pallas_rollout import (
        make_fused_dc_cascade_rollout,
    )

    env = gemx.make_functional("Cont-SC-PermExDc-v0")
    ctrl = GemController.make(env, "Cont-SC-PermExDc-v0")
    T, N = 3000, 256
    roll = make_fused_dc_cascade_rollout(env, ctrl, T, N, interpret=True)
    z = jnp.zeros((N // 128, 128), jnp.float32)
    out = roll(3, *([z] * 2))
    mean_reward = float(out[2].sum()) / (N * T)
    terms = float(out[3].sum())
    assert terms == 0.0
    # WSE = -|omega_n - ref| mean; tracking keeps it well under the
    # random-policy level (~-0.5 for an uncontrolled DC SC env)
    assert -0.15 < mean_reward < 0.0, mean_reward
    rv = np.asarray(out[4])
    (sub,) = env.reference_generator.subs
    assert rv.min() >= sub.margin[0] - 1e-6
    assert rv.max() <= sub.margin[1] + 1e-6
