"""Fused domain randomization (every motor family): motor parameters
as per-env state planes.

``randomize={name: (lo, hi)}`` turns electrical motor parameters into
extra ``(R, LANE)`` planes appended after the supply planes — read by the
in-kernel ODE every step, redrawn uniform on every violation reset (a
reset is a new motor instance).  The fused counterpart of the XLA path's
``dynamic_params=True`` (tests/test_randomization.py), validated here
bit-level against exactly that path.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu import references as rg
from gym_electric_motor_tpu.ops.pallas_rollout import (
    fused_state_arity,
    make_fused_dc_rollout,
)

N, T = 128, 60


def _with_params(state, **overrides):
    """Per-env motor parameters into the dynamic-params state pytree."""
    mp = dict(state.phys.mp)
    mp.update({k: jnp.asarray(v, jnp.float32) for k, v in overrides.items()})
    phys = dataclasses.replace(state.phys, mp=mp)
    return dataclasses.replace(state, phys=phys)


def test_fused_randomize_buffer_parity():
    """Buffer-mode fused rollout with per-env (r_a, l_a) planes matches
    the XLA env with the same per-env dynamic params step-for-step."""
    env = gemx.make_functional(
        "Cont-CC-PermExDc-v0",
        reference_generator=rg.ConstReference("i", 0.0))
    envd = gemx.make_functional(
        "Cont-CC-PermExDc-v0", dynamic_params=True,
        reference_generator=rg.ConstReference("i", 0.0))
    mp = env.physical_system.motor.parameter
    rng = np.random.default_rng(7)
    r_a = (mp["r_a"] * rng.uniform(0.7, 1.3, N)).astype(np.float32)
    l_a = (mp["l_a"] * rng.uniform(0.7, 1.3, N)).astype(np.float32)
    actions = rng.uniform(-0.6, 0.6, size=(T, 1, 128)).astype(np.float32)

    roll = make_fused_dc_rollout(
        env, T, N, action_mode="buffer", interpret=True,
        randomize={"r_a": (float(r_a.min()), float(r_a.max())),
                   "l_a": (float(l_a.min()), float(l_a.max()))})
    zero = jnp.zeros((1, 128), jnp.float32)
    # state planes: (i, l_a, r_a) — param planes appended alphabetically
    out = roll(zero, jnp.asarray(l_a.reshape(1, 128)),
               jnp.asarray(r_a.reshape(1, 128)), jnp.asarray(actions))

    keys = jax.random.split(jax.random.PRNGKey(0), N)
    state, _ = jax.jit(jax.vmap(envd.reset))(keys)
    state = _with_params(state, r_a=r_a, l_a=l_a)
    step = jax.jit(jax.vmap(envd.step))
    for t in range(T):
        state, _o, _r, _term = step(state,
                                    jnp.asarray(actions[t].reshape(N, 1)))
    ode = np.asarray(state.phys.ode_state)
    np.testing.assert_allclose(np.asarray(out[0]).reshape(N), ode[:, 1],
                               rtol=1e-4, atol=1e-3)
    # the param planes ride through the rollout unchanged
    np.testing.assert_array_equal(np.asarray(out[1]).reshape(N), l_a)
    np.testing.assert_array_equal(np.asarray(out[2]).reshape(N), r_a)


def test_fused_randomize_reset_redraws_params():
    """Random-action mode: envs that hit a violation reset leave with
    REDRAWN parameters (new motor instance); violation-free envs keep
    their initial draw."""
    env = gemx.make_functional("Finite-CC-PermExDc-v0")
    mp = env.physical_system.motor.parameter
    lo, hi = 0.7 * mp["r_a"], 1.3 * mp["r_a"]
    roll = make_fused_dc_rollout(env, 400, N, interpret=True,
                                 randomize={"r_a": (lo, hi)})
    rng = np.random.default_rng(3)
    r0 = rng.uniform(lo, hi, (1, 128)).astype(np.float32)
    zero = jnp.zeros((1, 128), jnp.float32)
    out = roll(5, zero, jnp.asarray(r0))
    # outputs: (i, r_a, reward_sum, term_count, rv, rk, rl, rs)
    r_end = np.asarray(out[1]).reshape(N)
    terms = np.asarray(out[3]).reshape(N)
    assert terms.sum() > 0  # random finite actions violate somewhere
    changed = r_end != r0.reshape(N)
    assert np.all(changed[terms > 0])
    assert not np.any(changed[terms == 0])
    assert np.all((r_end >= lo) & (r_end <= hi))


def test_fused_randomize_ppo_trainer():
    """make_fused_ppo_trainer(randomize=...): the policy kernel carries
    the parameter planes; training runs and the planes stay in range."""
    from gym_electric_motor_tpu.ops.pallas_policy import (
        fused_policy_init_planes, policy_act_ns, policy_obs_dim)
    from gym_electric_motor_tpu.parallel.sharded import (
        init_actor_critic_params, make_fused_ppo_trainer)

    env = gemx.make_functional("Finite-CC-PermExDc-v0")
    mp = env.physical_system.motor.parameter
    rnd = {"r_a": (0.7 * mp["r_a"], 1.3 * mp["r_a"]),
           "psi_e": (0.8 * mp["psi_e"], 1.2 * mp["psi_e"])}
    init_opt, train = make_fused_ppo_trainer(
        env, hidden=16, horizon=32, n_envs=256, n_minibatches=4, lr=1e-3,
        interpret=True, randomize=rnd)
    params = init_actor_critic_params(
        jax.random.PRNGKey(1), policy_obs_dim(env),
        int(sum(policy_act_ns(env))), 16)
    planes = fused_policy_init_planes(env, 256, randomize=rnd)
    assert len(planes) == fused_state_arity(env, randomize=rnd) == 3
    params, _opt, planes, rs = train(params, init_opt(params), planes, 3, 2)
    rs = np.asarray(rs)
    assert np.isfinite(rs).all() and -1.0 < rs.mean() < 0.0
    # param planes stay inside their configured ranges ('psi_e' < 'r_a')
    psi = np.asarray(planes[1])
    assert np.all((psi >= rnd["psi_e"][0]) & (psi <= rnd["psi_e"][1]))
    # observation dim is unchanged: policies are robust-blind
    assert policy_obs_dim(env) == 4


def test_fused_randomize_dqn_trainer():
    from gym_electric_motor_tpu.parallel.sharded import (
        make_fused_dqn_trainer)

    env = gemx.make_functional("Finite-CC-PermExDc-v0")
    mp = env.physical_system.motor.parameter
    rnd = {"l_a": (0.7 * mp["l_a"], 1.3 * mp["l_a"])}
    init_state, train = make_fused_dqn_trainer(
        env, hidden=16, horizon=32, n_envs=256, replay_slots=2,
        n_updates=2, mb_envs=8, interpret=True, randomize=rnd)
    carry = init_state(jax.random.PRNGKey(1))
    carry, rs, _ls = train(carry, 3, 2)
    assert np.isfinite(np.asarray(rs)).all()
    la = np.asarray(carry[3][1])  # planes = (i, l_a)
    assert np.all((la >= rnd["l_a"][0]) & (la <= rnd["l_a"][1]))


def test_fused_randomize_rejections():
    from gym_electric_motor_tpu.ops.pallas_rollout import (
        make_fused_rollout, make_fused_sync_rollout)

    env = gemx.make_functional("Cont-CC-EESM-v0")
    with pytest.raises(NotImplementedError, match="resistances"):
        # EESM inductances set obs/OPS normalization constants
        make_fused_rollout(env, 8, N, randomize={"l_d": (0.1, 0.2)})
    envd = gemx.make_functional("Finite-CC-PermExDc-v0")
    with pytest.raises(NotImplementedError, match="electrical"):
        make_fused_dc_rollout(envd, 8, N, randomize={"tau": (0.1, 0.2)})
    envs = gemx.make_functional("Finite-CC-SynRM-v0")
    with pytest.raises(NotImplementedError, match="electrical"):
        # SynRM has no psi_p to randomize
        make_fused_sync_rollout(envs, 8, N, randomize={"psi_p": (0.1, 0.2)})
    envi = gemx.make_functional("Cont-CC-SCIM-v0")
    with pytest.raises(NotImplementedError, match="resistances"):
        # SCIM inductances set static obs normalization constants
        from gym_electric_motor_tpu.ops.pallas_rollout import (
            make_fused_induction_rollout)
        make_fused_induction_rollout(envi, 8, N,
                                     randomize={"l_m": (0.1, 0.2)})


def test_fused_randomize_sync_buffer_parity():
    """Synchronous family: buffer-mode fused PMSM rollout with per-env
    (r_s, psi_p) planes matches the XLA dynamic-params env."""
    from gym_electric_motor_tpu.ops.pallas_rollout import (
        make_fused_sync_rollout)

    env = gemx.make_functional(
        "Cont-CC-PMSM-v0",
        reference_generator=rg.ConstReference("i_sd", 0.0))
    envd = gemx.make_functional(
        "Cont-CC-PMSM-v0", dynamic_params=True,
        reference_generator=rg.ConstReference("i_sd", 0.0))
    mp = env.physical_system.motor.parameter
    rng = np.random.default_rng(11)
    r_s = (mp["r_s"] * rng.uniform(0.7, 1.3, N)).astype(np.float32)
    psi_p = (mp["psi_p"] * rng.uniform(0.8, 1.2, N)).astype(np.float32)
    actions = rng.uniform(-0.4, 0.4, size=(T, 3, 1, 128)).astype(np.float32)

    roll = make_fused_sync_rollout(
        env, T, N, action_mode="buffer", interpret=True,
        randomize={"r_s": (float(r_s.min()), float(r_s.max())),
                   "psi_p": (float(psi_p.min()), float(psi_p.max()))})
    zero = jnp.zeros((1, 128), jnp.float32)
    # state planes: (i_sd, i_sq, eps, psi_p, r_s)
    out = roll(zero, zero, zero, jnp.asarray(psi_p.reshape(1, 128)),
               jnp.asarray(r_s.reshape(1, 128)), jnp.asarray(actions))

    keys = jax.random.split(jax.random.PRNGKey(0), N)
    state, _ = jax.jit(jax.vmap(envd.reset))(keys)
    state = _with_params(state, r_s=r_s, psi_p=psi_p)
    step = jax.jit(jax.vmap(envd.step))
    for t in range(T):
        state, _o, _r, _term = step(
            state, jnp.asarray(actions[t].reshape(3, N).T))
    ode = np.asarray(state.phys.ode_state)
    i_names = list(envd.physical_system.state_names)
    # ode_state rows: [omega?, i_sd, i_sq, eps] per the sync system layout
    np.testing.assert_allclose(np.asarray(out[0]).reshape(N), ode[:, 1],
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out[1]).reshape(N), ode[:, 2],
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(out[3]).reshape(N), psi_p)
    np.testing.assert_array_equal(np.asarray(out[4]).reshape(N), r_s)


def test_fused_randomize_sync_ppo_trainer():
    """Randomized PMSM PPO: the flagship env trains across a psi_p/l_q
    population in the universal policy kernel."""
    from gym_electric_motor_tpu.ops.pallas_policy import (
        fused_policy_init_planes, policy_act_ns, policy_obs_dim)
    from gym_electric_motor_tpu.parallel.sharded import (
        init_actor_critic_params, make_fused_ppo_trainer)

    env = gemx.make_functional("Finite-CC-PMSM-v0")
    mp = env.physical_system.motor.parameter
    rnd = {"psi_p": (0.8 * mp["psi_p"], 1.2 * mp["psi_p"]),
           "l_q": (0.8 * mp["l_q"], 1.2 * mp["l_q"])}
    init_opt, train = make_fused_ppo_trainer(
        env, hidden=16, horizon=32, n_envs=256, n_minibatches=4, lr=1e-3,
        interpret=True, randomize=rnd)
    params = init_actor_critic_params(
        jax.random.PRNGKey(1), policy_obs_dim(env),
        int(sum(policy_act_ns(env))), 16)
    planes = fused_policy_init_planes(env, 256, randomize=rnd)
    assert len(planes) == 5  # (i_sd, i_sq, eps, l_q, psi_p)
    params, _opt, planes, rs = train(params, init_opt(params), planes, 3, 2)
    rs = np.asarray(rs)
    assert np.isfinite(rs).all() and -1.0 < rs.mean() < 0.0
    lq = np.asarray(planes[3])
    assert np.all((lq >= rnd["l_q"][0]) & (lq <= rnd["l_q"][1]))


def test_fused_randomize_scim_buffer_parity():
    """Induction family: buffer-mode fused SCIM rollout with per-env
    (r_s, r_r) planes — the canonical rotor-resistance temperature-drift
    axis — matches the XLA dynamic-params env."""
    from gym_electric_motor_tpu.ops.pallas_rollout import (
        make_fused_induction_rollout)

    env = gemx.make_functional(
        "Cont-CC-SCIM-v0",
        reference_generator=rg.ConstReference("i_sd", 0.0))
    envd = gemx.make_functional(
        "Cont-CC-SCIM-v0", dynamic_params=True,
        reference_generator=rg.ConstReference("i_sd", 0.0))
    mp = env.physical_system.motor.parameter
    rng = np.random.default_rng(13)
    r_s = (mp["r_s"] * rng.uniform(0.8, 1.2, N)).astype(np.float32)
    r_r = (mp["r_r"] * rng.uniform(0.7, 1.4, N)).astype(np.float32)
    actions = rng.uniform(-0.3, 0.3, size=(T, 3, 1, 128)).astype(np.float32)

    roll = make_fused_induction_rollout(
        env, T, N, action_mode="buffer", interpret=True,
        randomize={"r_s": (float(r_s.min()), float(r_s.max())),
                   "r_r": (float(r_r.min()), float(r_r.max()))})
    zero = jnp.zeros((1, 128), jnp.float32)
    # state planes: (i_salpha, i_sbeta, psi_ralpha, psi_rbeta, r_r, r_s)
    out = roll(zero, zero, zero, zero, jnp.asarray(r_r.reshape(1, 128)),
               jnp.asarray(r_s.reshape(1, 128)), jnp.asarray(actions))

    keys = jax.random.split(jax.random.PRNGKey(0), N)
    state, _ = jax.jit(jax.vmap(envd.reset))(keys)
    state = _with_params(state, r_s=r_s, r_r=r_r)
    step = jax.jit(jax.vmap(envd.step))
    for t in range(T):
        state, _o, _r, _term = step(
            state, jnp.asarray(actions[t].reshape(3, N).T))
    ode = np.asarray(state.phys.ode_state)
    # ode rows: [omega?, i_salpha, i_sbeta, psi_ralpha, psi_rbeta, eps]
    np.testing.assert_allclose(np.asarray(out[0]).reshape(N), ode[:, 1],
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out[2]).reshape(N), ode[:, 3],
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(out[4]).reshape(N), r_r)
    np.testing.assert_array_equal(np.asarray(out[5]).reshape(N), r_s)


def test_fused_randomize_eesm_buffer_parity():
    """EESM: per-env (r_s, r_e) winding-resistance planes match the XLA
    dynamic-params env (the excitation resistance transforms stator-side
    by k^2 * 1.5 inside the resolver)."""
    from gym_electric_motor_tpu.ops.pallas_rollout import (
        make_fused_eesm_family_rollout)

    kw = dict(reference_generator=rg.ConstReference("i_sd", 0.0))
    env = gemx.make_functional("Cont-CC-EESM-v0", **kw)
    envd = gemx.make_functional("Cont-CC-EESM-v0", dynamic_params=True, **kw)
    mp = env.physical_system.motor.parameter
    rng = np.random.default_rng(17)
    r_s = (mp["r_s"] * rng.uniform(0.8, 1.2, N)).astype(np.float32)
    r_e = (mp["r_e"] * rng.uniform(0.7, 1.4, N)).astype(np.float32)
    actions = rng.uniform(-0.3, 0.3, size=(T, 4, 1, 128)).astype(np.float32)

    roll = make_fused_eesm_family_rollout(
        env, T, N, action_mode="buffer", interpret=True,
        randomize={"r_s": (float(r_s.min()), float(r_s.max())),
                   "r_e": (float(r_e.min()), float(r_e.max()))})
    zero = jnp.zeros((1, 128), jnp.float32)
    # state planes: (i_sd, i_sq, i_e, eps, r_e, r_s)
    out = roll(zero, zero, zero, zero, jnp.asarray(r_e.reshape(1, 128)),
               jnp.asarray(r_s.reshape(1, 128)), jnp.asarray(actions))

    keys = jax.random.split(jax.random.PRNGKey(0), N)
    state, _ = jax.jit(jax.vmap(envd.reset))(keys)
    state = _with_params(state, r_s=r_s, r_e=r_e)
    step = jax.jit(jax.vmap(envd.step))
    for t in range(T):
        state, _o, _r, _term = step(
            state, jnp.asarray(actions[t].reshape(4, N).T))
    ode = np.asarray(state.phys.ode_state)
    for k, c in ((0, 1), (1, 2), (2, 3)):     # i_sd, i_sq, i_e
        np.testing.assert_allclose(np.asarray(out[k]).reshape(N),
                                   ode[:, c], rtol=1e-4, atol=2e-3)
    np.testing.assert_array_equal(np.asarray(out[4]).reshape(N), r_e)
    np.testing.assert_array_equal(np.asarray(out[5]).reshape(N), r_s)


def test_fused_randomize_dfim_buffer_parity():
    """DFIM: per-env (r_s, r_r) planes match the XLA dynamic-params env."""
    from gym_electric_motor_tpu.ops.pallas_rollout import (
        make_fused_dfim_family_rollout)

    kw = dict(reference_generator=rg.ConstReference("i_sd", 0.0))
    env = gemx.make_functional("Cont-CC-DFIM-v0", **kw)
    envd = gemx.make_functional("Cont-CC-DFIM-v0", dynamic_params=True, **kw)
    mp = env.physical_system.motor.parameter
    rng = np.random.default_rng(19)
    r_s = (mp["r_s"] * rng.uniform(0.8, 1.2, N)).astype(np.float32)
    r_r = (mp["r_r"] * rng.uniform(0.7, 1.4, N)).astype(np.float32)
    actions = rng.uniform(-0.3, 0.3, size=(T, 6, 1, 128)).astype(np.float32)

    roll = make_fused_dfim_family_rollout(
        env, T, N, action_mode="buffer", interpret=True,
        randomize={"r_s": (float(r_s.min()), float(r_s.max())),
                   "r_r": (float(r_r.min()), float(r_r.max()))})
    zero = jnp.zeros((1, 128), jnp.float32)
    # state planes: (i_sa, i_sb, psi_ra, psi_rb, eps, r_r, r_s)
    out = roll(zero, zero, zero, zero, zero,
               jnp.asarray(r_r.reshape(1, 128)),
               jnp.asarray(r_s.reshape(1, 128)), jnp.asarray(actions))

    keys = jax.random.split(jax.random.PRNGKey(0), N)
    state, _ = jax.jit(jax.vmap(envd.reset))(keys)
    state = _with_params(state, r_s=r_s, r_r=r_r)
    step = jax.jit(jax.vmap(envd.step))
    for t in range(T):
        state, _o, _r, _term = step(
            state, jnp.asarray(actions[t].reshape(6, N).T))
    ode = np.asarray(state.phys.ode_state)
    for k, c in ((0, 1), (1, 2), (2, 3), (3, 4)):
        np.testing.assert_allclose(np.asarray(out[k]).reshape(N),
                                   ode[:, c], rtol=1e-4, atol=2e-3)
    np.testing.assert_array_equal(np.asarray(out[5]).reshape(N), r_r)
    np.testing.assert_array_equal(np.asarray(out[6]).reshape(N), r_s)


def test_fused_randomize_j_rotor_buffer_parity():
    """Mechanical-inertia randomization (SC tasks): per-env j_rotor
    planes match per-value REBUILT XLA envs (the XLA path bakes j_total
    at build time — physical_systems.py:141 — so the oracle is one env
    build per inertia value, not dynamic_params)."""
    from gym_electric_motor_tpu.models import motors as mt

    env = gemx.make_functional(
        "Cont-SC-PermExDc-v0",
        reference_generator=rg.ConstReference("omega", 0.0))
    mp = env.physical_system.motor.parameter
    j_vals = [0.6 * mp["j_rotor"], 0.9 * mp["j_rotor"],
              1.4 * mp["j_rotor"], 2.0 * mp["j_rotor"]]
    j_r = np.repeat(np.asarray(j_vals, np.float32), 32)     # 128 envs
    rng = np.random.default_rng(21)
    actions = rng.uniform(-0.5, 0.5, size=(T, 1, 128)).astype(np.float32)

    roll = make_fused_dc_rollout(
        env, T, N, action_mode="buffer", interpret=True,
        randomize={"j_rotor": (float(j_r.min()), float(j_r.max()))})
    zero = jnp.zeros((1, 128), jnp.float32)
    out = roll(zero, zero, jnp.asarray(j_r.reshape(1, 128)),
               jnp.asarray(actions))
    w_k = np.asarray(out[0]).reshape(N)
    i_k = np.asarray(out[1]).reshape(N)

    for g, j in enumerate(j_vals):
        envj = gemx.make_functional(
            "Cont-SC-PermExDc-v0",
            motor=mt.permex_dc(motor_parameter={"j_rotor": float(j)}),
            reference_generator=rg.ConstReference("omega", 0.0))
        sl = slice(g * 32, (g + 1) * 32)
        keys = jax.random.split(jax.random.PRNGKey(0), 32)
        state, _ = jax.jit(jax.vmap(envj.reset))(keys)
        step = jax.jit(jax.vmap(envj.step))
        for t in range(T):
            state, _o, _r, _te = step(
                state, jnp.asarray(actions[t, 0, sl].reshape(32, 1)))
        ode = np.asarray(state.phys.ode_state)
        np.testing.assert_allclose(w_k[sl], ode[:, 0], rtol=1e-4,
                                   atol=2e-3, err_msg=f"j group {g}")
        np.testing.assert_allclose(i_k[sl], ode[:, 1], rtol=1e-4,
                                   atol=1e-3, err_msg=f"j group {g}")
    # inertia actually matters: groups diverge
    assert abs(w_k[:32].mean() - w_k[96:].mean()) > 0.05


def test_fused_randomize_j_rotor_needs_poly_load():
    env = gemx.make_functional("Finite-CC-PermExDc-v0")  # const speed
    with pytest.raises(NotImplementedError, match="PolynomialStaticLoad"):
        make_fused_dc_rollout(env, 8, N,
                              randomize={"j_rotor": (1e-4, 2e-4)})


def test_fused_randomize_u_sup_buffer_parity():
    """DC-link voltage randomization (battery/grid sag): per-env u_sup
    planes match per-value REBUILT XLA envs (the supply voltage is an
    env-build constant on the XLA path)."""
    from gym_electric_motor_tpu.models.supplies import ideal_voltage_supply

    env = gemx.make_functional(
        "Cont-CC-PermExDc-v0",
        reference_generator=rg.ConstReference("i", 0.0))
    u_nom = float(env.physical_system.supply.u_nominal)
    u_vals = [0.8 * u_nom, 0.95 * u_nom, 1.05 * u_nom, 1.15 * u_nom]
    u_r = np.repeat(np.asarray(u_vals, np.float32), 32)
    rng = np.random.default_rng(31)
    actions = rng.uniform(-0.5, 0.5, size=(T, 1, 128)).astype(np.float32)

    roll = make_fused_dc_rollout(
        env, T, N, action_mode="buffer", interpret=True,
        randomize={"u_sup": (float(u_r.min()), float(u_r.max()))})
    zero = jnp.zeros((1, 128), jnp.float32)
    out = roll(zero, jnp.asarray(u_r.reshape(1, 128)),
               jnp.asarray(actions))
    i_k = np.asarray(out[0]).reshape(N)

    for g, u in enumerate(u_vals):
        envu = gemx.make_functional(
            "Cont-CC-PermExDc-v0",
            supply=ideal_voltage_supply(u_nominal=float(u)),
            reference_generator=rg.ConstReference("i", 0.0))
        sl = slice(g * 32, (g + 1) * 32)
        keys = jax.random.split(jax.random.PRNGKey(0), 32)
        state, _ = jax.jit(jax.vmap(envu.reset))(keys)
        step = jax.jit(jax.vmap(envu.step))
        for t in range(T):
            state, _o, _r, _te = step(
                state, jnp.asarray(actions[t, 0, sl].reshape(32, 1)))
        ode = np.asarray(state.phys.ode_state)
        np.testing.assert_allclose(i_k[sl], ode[:, 1], rtol=1e-4,
                                   atol=1e-3, err_msg=f"u group {g}")
    assert abs(i_k[:32].mean() - i_k[96:].mean()) > 0.5  # sag matters


def test_fused_randomize_u_sup_rejects_ac_supply():
    """u_sup randomization covers Ideal (DC-link value) and RC (source
    u_0); AC supplies are waveform-parameterized and reject loudly."""
    from gym_electric_motor_tpu.models.supplies import ac_1_phase_supply

    env = gemx.make_functional("Cont-CC-PermExDc-v0",
                               supply=ac_1_phase_supply())
    with pytest.raises(NotImplementedError, match="AC supplies"):
        make_fused_dc_rollout(env, 8, N,
                              randomize={"u_sup": (500.0, 600.0)})


def test_fused_randomize_srm_buffer_parity():
    """SRM (extension family): per-env r_s planes — the winding
    temperature-drift axis — match the XLA dynamic-params env, incl.
    through the unipolar diode clamp."""
    from gym_electric_motor_tpu.ops.pallas_rollout import (
        make_fused_srm_rollout)

    env = gemx.make_functional(
        "Cont-CC-SRM-v0",
        reference_generator=rg.ConstReference("i_a", 0.1))
    envd = gemx.make_functional(
        "Cont-CC-SRM-v0", dynamic_params=True,
        reference_generator=rg.ConstReference("i_a", 0.1))
    mp = env.physical_system.motor.parameter
    rng = np.random.default_rng(13)
    r_s = (mp["r_s"] * rng.uniform(0.7, 1.4, N)).astype(np.float32)
    actions = rng.uniform(-0.4, 0.4, size=(T, 3, 1, 128)).astype(np.float32)

    roll = make_fused_srm_rollout(
        env, T, N, action_mode="buffer", interpret=True,
        randomize={"r_s": (float(r_s.min()), float(r_s.max()))})
    zero = jnp.zeros((1, 128), jnp.float32)
    # state planes: (i_a, i_b, i_c, eps, r_s)
    out = roll(zero, zero, zero, zero,
               jnp.asarray(r_s.reshape(1, 128)), jnp.asarray(actions))

    keys = jax.random.split(jax.random.PRNGKey(0), N)
    state, _ = jax.jit(jax.vmap(envd.reset))(keys)
    state = _with_params(state, r_s=r_s)
    step = jax.jit(jax.vmap(envd.step))
    for t in range(T):
        state, _o, _r, _term = step(
            state, jnp.asarray(actions[t].reshape(3, N).T))
    ode = np.asarray(state.phys.ode_state)
    # ode rows (const-speed load): [omega, i_a, i_b, i_c, eps]
    for k in range(3):
        np.testing.assert_allclose(np.asarray(out[k]).reshape(N),
                                   ode[:, 1 + k], rtol=1e-4, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(out[4]).reshape(N), r_s)

def test_fused_randomize_srm_inductance_buffer_parity():
    """SRM l0/l1 randomization: per-env inductance-profile planes match
    the XLA dynamic-params env step-for-step — the SRM obs norms never
    read l0/l1 (currents + cos/sin eps only), so the inductance profile
    is a clean randomization axis here, unlike the induction families."""
    from gym_electric_motor_tpu.ops.pallas_rollout import (
        make_fused_srm_rollout)

    env = gemx.make_functional(
        "Cont-CC-SRM-v0",
        reference_generator=rg.ConstReference("i_a", 0.1))
    envd = gemx.make_functional(
        "Cont-CC-SRM-v0", dynamic_params=True,
        reference_generator=rg.ConstReference("i_a", 0.1))
    mp = env.physical_system.motor.parameter
    rng = np.random.default_rng(17)
    l0 = (mp["l0"] * rng.uniform(0.8, 1.3, N)).astype(np.float32)
    l1 = (mp["l1"] * rng.uniform(0.6, 1.0, N)).astype(np.float32)
    actions = rng.uniform(-0.4, 0.4, size=(T, 3, 1, 128)).astype(np.float32)

    roll = make_fused_srm_rollout(
        env, T, N, action_mode="buffer", interpret=True,
        randomize={"l0": (float(l0.min()), float(l0.max())),
                   "l1": (float(l1.min()), float(l1.max()))})
    zero = jnp.zeros((1, 128), jnp.float32)
    # state planes: (i_a, i_b, i_c, eps, l0, l1) — params alphabetical
    out = roll(zero, zero, zero, zero,
               jnp.asarray(l0.reshape(1, 128)),
               jnp.asarray(l1.reshape(1, 128)), jnp.asarray(actions))

    keys = jax.random.split(jax.random.PRNGKey(0), N)
    state, _ = jax.jit(jax.vmap(envd.reset))(keys)
    state = _with_params(state, l0=l0, l1=l1)
    step = jax.jit(jax.vmap(envd.step))
    for t in range(T):
        state, _o, _r, _term = step(
            state, jnp.asarray(actions[t].reshape(3, N).T))
    ode = np.asarray(state.phys.ode_state)
    # ode rows (const-speed load): [omega, i_a, i_b, i_c, eps]
    for k in range(3):
        np.testing.assert_allclose(np.asarray(out[k]).reshape(N),
                                   ode[:, 1 + k], rtol=1e-4, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(out[4]).reshape(N), l0)
    np.testing.assert_array_equal(np.asarray(out[5]).reshape(N), l1)


def test_fused_randomize_srm_torque_reward_uses_planes():
    """A TC-SRM random rollout with l1 randomized must read the PER-ENV
    l1 in the torque reward path (ref_quantity resolves the planes)."""
    from gym_electric_motor_tpu.ops.pallas_rollout import (
        make_fused_srm_rollout)

    env = gemx.make_functional(
        "Finite-TC-SRM-v0",
        reference_generator=rg.ConstReference("torque", 0.2))
    roll = make_fused_srm_rollout(
        env, 64, N, interpret=True, randomize={"l1": (0.02, 0.08)})
    zero = jnp.zeros((1, 128), jnp.float32)
    # same seed (same actions/physics draws), two different l1 planes:
    # the torque produced — and with it the reward — must differ
    r_sums = []
    for l1v in (0.02, 0.08):
        l1p = jnp.full((1, 128), l1v, jnp.float32)
        out = roll(11, zero, zero, zero, zero, l1p)
        s = float(np.asarray(out[1]).sum())
        assert np.isfinite(s)
        r_sums.append(s)
    assert abs(r_sums[0] - r_sums[1]) > 1.0, r_sums

def test_fused_randomize_u_sup_rc_buffer_parity():
    """RC-supply source-voltage randomization: per-env u_0 planes feed
    the in-kernel RC element (NOT an output override) and match
    per-value REBUILT XLA envs; the reset cap voltage is the drawn u_0
    (RCVoltageSupply initializes _u_sup = u_0)."""
    from gym_electric_motor_tpu.models.supplies import rc_voltage_supply

    env = gemx.make_functional(
        "Cont-CC-PermExDc-v0", supply=rc_voltage_supply(),
        reference_generator=rg.ConstReference("i", 0.0))
    u_nom = float(env.physical_system.supply.u_nominal)
    u_vals = [0.8 * u_nom, 0.95 * u_nom, 1.05 * u_nom, 1.15 * u_nom]
    u_r = np.repeat(np.asarray(u_vals, np.float32), 32)
    rng = np.random.default_rng(37)
    actions = rng.uniform(-0.5, 0.5, size=(T, 1, 128)).astype(np.float32)

    roll = make_fused_dc_rollout(
        env, T, N, action_mode="buffer", interpret=True,
        randomize={"u_sup": (float(u_r.min()), float(u_r.max()))})
    zero = jnp.zeros((1, 128), jnp.float32)
    u_plane = jnp.asarray(u_r.reshape(1, 128))
    # state planes: (i, u_sup_cap, sup_t, u_sup_param)
    out = roll(zero, u_plane, zero, u_plane, jnp.asarray(actions))
    i_k = np.asarray(out[0]).reshape(N)
    u_cap_k = np.asarray(out[1]).reshape(N)

    for g, u in enumerate(u_vals):
        envu = gemx.make_functional(
            "Cont-CC-PermExDc-v0",
            supply=rc_voltage_supply(u_nominal=float(u)),
            reference_generator=rg.ConstReference("i", 0.0))
        sl = slice(g * 32, (g + 1) * 32)
        keys = jax.random.split(jax.random.PRNGKey(0), 32)
        state, _ = jax.jit(jax.vmap(envu.reset))(keys)
        step = jax.jit(jax.vmap(envu.step))
        for t in range(T):
            state, _o, _r, _te = step(
                state, jnp.asarray(actions[t, 0, sl].reshape(32, 1)))
        ode = np.asarray(state.phys.ode_state)
        sup_state = np.asarray(state.phys.sup_state)
        np.testing.assert_allclose(i_k[sl], ode[:, 1], rtol=1e-4,
                                   atol=1e-3, err_msg=f"u group {g}")
        np.testing.assert_allclose(u_cap_k[sl], sup_state[:, 0],
                                   rtol=1e-4, atol=1e-2,
                                   err_msg=f"u group {g}")
    assert abs(i_k[:32].mean() - i_k[96:].mean()) > 0.1  # source matters
