"""Extended DC-family fused-kernel coverage: non-default converters
(1QC/2QC incl. freewheeling body diodes), AC1/RC supplies and the
Ornstein-Uhlenbeck speed load — the env-arg space beyond the catalog
defaults (converters.py:218-496, voltage_supplies.py:75-166,
ornstein_uhlenbeck_load.py).

Deterministic corners are validated step-for-step against the XLA env in
buffer-action mode (interpret); the stochastic parts (per-episode AC phase,
OU noise) via mean-reward / termination-rate agreement with the XLA env
under random actions, mirroring tests/test_pallas_dc_universal.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu import references as rg
from gym_electric_motor_tpu.models import converters as cv
from gym_electric_motor_tpu.models.loads import ornstein_uhlenbeck_load
from gym_electric_motor_tpu.models.supplies import (
    ac_1_phase_supply,
    rc_voltage_supply,
)
from gym_electric_motor_tpu.ops.pallas_rollout import (
    fused_state_arity,
    make_fused_dc_rollout,
)

N, T = 128, 60


def _xla_states(env, actions, n_envs):
    """Final XLA-env state after replaying the action buffer (no autoreset)."""
    keys = jax.random.split(jax.random.PRNGKey(0), n_envs)
    state, _ = jax.jit(jax.vmap(env.reset))(keys)
    step = jax.jit(jax.vmap(env.step))
    finite = actions.dtype.kind == "i"
    for t in range(actions.shape[0]):
        if finite:
            act = jnp.asarray(actions[t].reshape(n_envs))
        else:
            act = jnp.asarray(actions[t].reshape(n_envs, 1))
        state, _obs, _r, _term = step(state, act)
    return state


@pytest.mark.parametrize("conv_builder,n_actions", [
    (cv.finite_one_quadrant_converter, 2),
    (cv.finite_two_quadrant_converter, 3),
])
def test_fused_dc_nondefault_finite_converters(conv_builder, n_actions):
    """1QC/2QC overrides: freewheeling reads the pre-step current exactly
    like the env converter (converters.py:218-310)."""
    env = gemx.make_functional(
        "Finite-CC-PermExDc-v0",
        converter=conv_builder(1e-5),
        reference_generator=rg.ConstReference("i", 0.0))
    rng = np.random.default_rng(3)
    actions = rng.integers(0, n_actions, size=(T, 1, 128)).astype(np.int32)

    roll = make_fused_dc_rollout(env, T, N, action_mode="buffer",
                                 interpret=True)
    zero = jnp.zeros((1, 128), jnp.float32)
    out = roll(zero, jnp.asarray(actions))
    out = out if isinstance(out, tuple) else (out,)

    state = _xla_states(env, actions, N)
    ode = np.asarray(state.phys.ode_state)
    np.testing.assert_allclose(np.asarray(out[0]).reshape(N), ode[:, 1],
                               rtol=1e-4, atol=1e-3)


def test_fused_dc_cont_2qc_converter():
    env = gemx.make_functional(
        "Cont-CC-PermExDc-v0",
        converter=cv.cont_two_quadrant_converter(1e-4),
        reference_generator=rg.ConstReference("i", 0.0))
    rng = np.random.default_rng(4)
    actions = rng.uniform(0.0, 1.0, size=(T, 1, 128)).astype(np.float32)

    roll = make_fused_dc_rollout(env, T, N, action_mode="buffer",
                                 interpret=True)
    zero = jnp.zeros((1, 128), jnp.float32)
    out = roll(zero, jnp.asarray(actions))
    out = out if isinstance(out, tuple) else (out,)

    state = _xla_states(env, actions, N)
    ode = np.asarray(state.phys.ode_state)
    np.testing.assert_allclose(np.asarray(out[0]).reshape(N), ode[:, 1],
                               rtol=1e-4, atol=1e-3)


def test_fused_dc_rc_supply_matches_xla():
    """RC supply: u_sup sags under load through the embedded Euler element
    (voltage_supplies.py:75-123) — kernel planes (i, u_sup, t)."""
    env = gemx.make_functional(
        "Cont-CC-PermExDc-v0",
        supply=rc_voltage_supply(u_nominal=420.0,
                                 supply_parameter={"R": 1.0, "C": 4e-3}),
        reference_generator=rg.ConstReference("i", 0.0))
    assert fused_state_arity(env) == 3
    rng = np.random.default_rng(5)
    actions = rng.uniform(-1.0, 1.0, size=(T, 1, 128)).astype(np.float32)

    roll = make_fused_dc_rollout(env, T, N, action_mode="buffer",
                                 interpret=True)
    zero = jnp.zeros((1, 128), jnp.float32)
    u0 = jnp.full((1, 128), 420.0, jnp.float32)
    out = roll(zero, u0, zero, jnp.asarray(actions))

    state = _xla_states(env, actions, N)
    ode = np.asarray(state.phys.ode_state)
    sup = np.asarray(state.phys.sup_state)
    # the supply must actually have moved, else this test is vacuous
    assert np.std(sup[:, 0]) > 1.0
    np.testing.assert_allclose(np.asarray(out[0]).reshape(N), ode[:, 1],
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out[1]).reshape(N), sup[:, 0],
                               rtol=1e-4, atol=1e-2)


def test_fused_dc_rc_supply_finite_matches_xla():
    """Finite converter + RC supply: i_sup must read the PREVIOUS cycle's
    switch state (the reference queries i_sup before convert() applies the
    new action — physical_systems.py:171-203 call order), so the kernel
    carries the previous action through the step loop."""
    env = gemx.make_functional(
        "Finite-CC-PermExDc-v0",
        supply=rc_voltage_supply(u_nominal=420.0,
                                 supply_parameter={"R": 2.0, "C": 1e-3}),
        reference_generator=rg.ConstReference("i", 0.0))
    assert fused_state_arity(env) == 3
    rng = np.random.default_rng(9)
    actions = rng.integers(0, 4, size=(T, 1, 128)).astype(np.int32)

    roll = make_fused_dc_rollout(env, T, N, action_mode="buffer",
                                 interpret=True)
    zero = jnp.zeros((1, 128), jnp.float32)
    u0 = jnp.full((1, 128), 420.0, jnp.float32)
    out = roll(zero, u0, zero, jnp.asarray(actions))

    state = _xla_states(env, actions, N)
    ode = np.asarray(state.phys.ode_state)
    sup = np.asarray(state.phys.sup_state)
    assert np.std(sup[:, 0]) > 0.05
    np.testing.assert_allclose(np.asarray(out[0]).reshape(N), ode[:, 1],
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out[1]).reshape(N), sup[:, 0],
                               rtol=1e-4, atol=1e-2)


def test_fused_dc_ac1_supply_fixed_phase_matches_xla():
    """AC1 supply with a pinned phase is deterministic: the kernel's
    (theta, theta_lo) double-float phase planes replay
    u = max_amp sin(2 pi f t + phi) (voltage_supplies.py:126-166;
    theta(0) = phi)."""
    env = gemx.make_functional(
        "Finite-CC-PermExDc-v0",
        supply=ac_1_phase_supply(
            u_nominal=230.0,
            supply_parameter={"frequency": 50.0, "phase": 0.3}),
        reference_generator=rg.ConstReference("i", 0.0))
    assert fused_state_arity(env) == 3
    rng = np.random.default_rng(6)
    actions = rng.integers(0, 4, size=(T, 1, 128)).astype(np.int32)

    roll = make_fused_dc_rollout(env, T, N, action_mode="buffer",
                                 interpret=True)
    zero = jnp.zeros((1, 128), jnp.float32)
    phi0 = jnp.full((1, 128), 0.3, jnp.float32)
    out = roll(zero, phi0, zero, jnp.asarray(actions))

    state = _xla_states(env, actions, N)
    ode = np.asarray(state.phys.ode_state)
    np.testing.assert_allclose(np.asarray(out[0]).reshape(N), ode[:, 1],
                               rtol=1e-4, atol=1e-3)
    # theta plane advanced T increments past the pinned phase
    np.testing.assert_allclose(np.asarray(out[1]).reshape(N),
                               0.3 + T * 2.0 * np.pi * 50.0 * 1e-5,
                               rtol=1e-5)


def test_fused_dc_ou_load_deterministic_core_matches_xla():
    """OU load with sigma=0 reduces to the deterministic relaxation
    theta (mu - omega) tau — bit-comparable through the shared RK4."""
    load = ornstein_uhlenbeck_load(mu=80.0, sigma=0.0, theta=50.0, tau=1e-4,
                                   omega_range=(-200.0, 200.0))
    env = gemx.make_functional(
        "Cont-CC-PermExDc-v0", load=load,
        reference_generator=rg.ConstReference("i", 0.0))
    assert fused_state_arity(env) == 2
    rng = np.random.default_rng(7)
    actions = rng.uniform(-1.0, 1.0, size=(T, 1, 128)).astype(np.float32)

    # feed the kernel the XLA env's post-reset omegas (uniform in the OU
    # range) so the deterministic trajectories line up exactly
    keys = jax.random.split(jax.random.PRNGKey(0), N)
    state0, _ = jax.jit(jax.vmap(env.reset))(keys)
    omega0 = np.asarray(state0.phys.ode_state)[:, 0]
    assert np.std(omega0) > 10.0  # uniform init actually randomized

    roll = make_fused_dc_rollout(env, T, N, action_mode="buffer",
                                 interpret=True)
    zero = jnp.zeros((1, 128), jnp.float32)
    out = roll(jnp.asarray(omega0.reshape(1, 128), jnp.float32).astype(
        jnp.float32), zero, jnp.asarray(actions))

    state = _xla_states(env, actions, N)
    ode = np.asarray(state.phys.ode_state)
    np.testing.assert_allclose(np.asarray(out[0]).reshape(N), ode[:, 0],
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out[1]).reshape(N), ode[:, 1],
                               rtol=1e-4, atol=1e-3)


# ---------------------------------------------------------------------------
# Stochastic paths: kernel vs XLA env under random actions
# ---------------------------------------------------------------------------

N_STAT, T_STAT = 2048, 400


def _xla_random_stats(env, n_envs, n_steps, seed=0):
    """Mean reward / termination rate of the XLA env under random actions
    drawn from the env's own action space bounds."""
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
                lo = np.nan_to_num(np.asarray(space.low), neginf=-1.0)
                hi = np.nan_to_num(np.asarray(space.high), posinf=1.0)
                u = jax.random.uniform(ka, (n_envs,) + space.shape)
                actions = jnp.asarray(lo) + u * jnp.asarray(hi - lo)
            state, _obs, reward, term = step(state, actions)
            return (state, k), (jnp.sum(reward), jnp.sum(term))

        (_, _), (rsums, tsums) = jax.lax.scan(
            body, (state, jax.random.PRNGKey(seed + 1)), None,
            length=n_steps)
        return jnp.sum(rsums), jnp.sum(tsums)

    r, t = run(jax.random.PRNGKey(seed))
    total = n_envs * n_steps
    return float(r) / total, float(t) / total


@pytest.mark.parametrize("case", ["ou", "ac1"])
def test_fused_dc_stochastic_extensions_match_xla(case):
    if case == "ou":
        env = gemx.make_functional(
            "Cont-CC-PermExDc-v0",
            load=ornstein_uhlenbeck_load(mu=0.0, sigma=30.0, theta=5.0,
                                         tau=1e-4,
                                         omega_range=(-200.0, 200.0)))
    else:
        env = gemx.make_functional(
            "Cont-CC-PermExDc-v0",
            supply=ac_1_phase_supply(u_nominal=230.0))

    n_state = fused_state_arity(env)
    roll = make_fused_dc_rollout(env, T_STAT, N_STAT, interpret=True)
    R = N_STAT // 128
    z = jnp.zeros((R, 128), jnp.float32)
    planes = [z] * n_state
    if case == "ac1":
        # match the XLA env's per-episode random phase at t=0
        rng = np.random.default_rng(11)
        planes[1] = jnp.asarray(
            rng.uniform(0.0, 2.0 * np.pi, (R, 128)).astype(np.float32))
    out = roll(3, *planes)
    states, reward, terms = out[:n_state], out[n_state], out[n_state + 1]

    kernel_mean_r = float(jnp.sum(reward)) / (N_STAT * T_STAT)
    kernel_term_rate = float(jnp.sum(terms)) / (N_STAT * T_STAT)
    xla_mean_r, xla_term_rate = _xla_random_stats(env, N_STAT, T_STAT)
    assert abs(kernel_mean_r - xla_mean_r) < 0.08, (
        f"{kernel_mean_r} vs {xla_mean_r}")
    assert abs(kernel_term_rate - xla_term_rate) < max(
        0.5 * max(kernel_term_rate, xla_term_rate), 2e-3)
    for s in states:
        assert np.all(np.isfinite(np.asarray(s)))

    if case == "ou":
        # in-kernel resets draw omega ~ U(-200, 200); combined with the OU
        # drift toward mu=0 the omega plane must show real spread
        w = np.asarray(states[0]).ravel()
        assert np.std(w) > 20.0
        assert np.all(np.abs(w) <= 200.0 + 1e-3)


@pytest.mark.parametrize("conv_builder,n_actions", [
    (cv.finite_four_quadrant_converter, 4),
    (cv.finite_two_quadrant_converter, 3),
])
def test_fused_dc_finite_interlocking_matches_xla(conv_builder, n_actions):
    """Finite-converter interlocking: the kernel carries the half-bridge
    switching states across steps, integrates the 2-sub-interval schedule
    (interlock pattern for the whole cycle — the reference's deferred
    quirk) and freezes interval-1 signals for envs with no interlock this
    cycle; trajectories must match the XLA env step-for-step."""
    env = gemx.make_functional(
        "Finite-CC-PermExDc-v0",
        converter=conv_builder(1e-5, interlocking_time=1e-6),
        reference_generator=rg.ConstReference("i", 0.0))
    rng = np.random.default_rng(13)
    actions = rng.integers(0, n_actions, size=(T, 1, 128)).astype(np.int32)

    roll = make_fused_dc_rollout(env, T, N, action_mode="buffer",
                                 interpret=True)
    zero = jnp.zeros((1, 128), jnp.float32)
    out = roll(zero, jnp.asarray(actions))
    out = out if isinstance(out, tuple) else (out,)

    state = _xla_states(env, actions, N)
    ode = np.asarray(state.phys.ode_state)
    np.testing.assert_allclose(np.asarray(out[0]).reshape(N), ode[:, 1],
                               rtol=1e-4, atol=1e-3)

    # the interlock must actually bite: the same buffer without
    # interlocking must differ measurably
    env0 = gemx.make_functional(
        "Finite-CC-PermExDc-v0", converter=conv_builder(1e-5),
        reference_generator=rg.ConstReference("i", 0.0))
    roll0 = make_fused_dc_rollout(env0, T, N, action_mode="buffer",
                                  interpret=True)
    out0 = roll0(zero, jnp.asarray(actions))
    out0 = out0 if isinstance(out0, tuple) else (out0,)
    assert float(np.max(np.abs(np.asarray(out[0]) - np.asarray(out0[0])))) \
        > 1e-3
