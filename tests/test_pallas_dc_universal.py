"""Universal fused DC rollout kernel (``make_fused_dc_rollout``) tests.

The builder covers all 24 DC catalog configs; here every (motor kind x
converter type x task) corner is validated:

* **Deterministic physics** (buffer-action mode, interpret): step-for-step
  vs the XLA env — 8 configs spanning all four motors, finite/cont
  converters, constant-speed and dynamic (SC) mechanics, and the ExtExDc
  dual channel.
* **Stochastic machinery** (random mode, interpret): Wiener sub-episode
  statistics from the kernel's final-state snapshot plus reset-rate /
  mean-reward agreement with the XLA env — single-ref (temporal Box-Muller
  pairing), dual-ref (spatial pairing), and the SC omega window.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu import references as rg
from gym_electric_motor_tpu.ops.pallas_rollout import make_fused_dc_rollout

from test_pallas_rollout import (
    N_STAT,
    T_STAT,
    _check_wiener_state,
    _xla_random_rollout,
)

# (env_id, finite, n_ch, mech, n_el, const-ref names)
PHYSICS_CASES = [
    ("Finite-TC-PermExDc-v0", True, 1, False, 1, ["torque"]),
    ("Cont-SC-PermExDc-v0", False, 1, True, 1, ["omega"]),
    ("Finite-SC-SeriesDc-v0", True, 1, True, 1, ["omega"]),
    ("Cont-CC-SeriesDc-v0", False, 1, False, 1, ["i"]),
    ("Cont-TC-ShuntDc-v0", False, 1, False, 2, ["torque"]),
    ("Finite-SC-ShuntDc-v0", True, 1, True, 2, ["omega"]),
    ("Finite-CC-ExtExDc-v0", True, 2, False, 2, ["i_a", "i_e"]),
    ("Cont-SC-ExtExDc-v0", False, 2, True, 2, ["omega"]),
]


@pytest.mark.parametrize("env_id,finite,n_ch,mech,n_el,ref_names",
                         PHYSICS_CASES, ids=[c[0] for c in PHYSICS_CASES])
def test_fused_dc_physics_matches_xla_env(env_id, finite, n_ch, mech, n_el,
                                          ref_names):
    consts = [rg.ConstReference(n, 0.0) for n in ref_names]
    ref = rg.ReferenceSpec(consts) if len(consts) > 1 else consts[0]
    env = gemx.make_functional(env_id, reference_generator=ref)
    N, T = 128, 50
    rng = np.random.default_rng(7)
    ch = (n_ch,) if n_ch > 1 else ()
    if finite:
        actions = rng.integers(0, 4, size=(T,) + ch + (1, 128)).astype(np.int32)
    else:
        actions = rng.uniform(-1.0, 1.0,
                              size=(T,) + ch + (1, 128)).astype(np.float32)

    roll = make_fused_dc_rollout(env, T, N, action_mode="buffer",
                                 interpret=True)
    zero = jnp.zeros((1, 128), jnp.float32)
    n_state = n_el + (1 if mech else 0)
    out = roll(*([zero] * n_state), jnp.asarray(actions))
    out = out if isinstance(out, tuple) else (out,)

    keys = jax.random.split(jax.random.PRNGKey(0), N)
    state, _ = jax.jit(jax.vmap(env.reset))(keys)
    step = jax.jit(jax.vmap(env.step))
    for t in range(T):
        if n_ch > 1:
            act = jnp.asarray(actions[t].reshape(n_ch, N).T)
        elif finite:
            act = jnp.asarray(actions[t].reshape(N))
        else:
            act = jnp.asarray(actions[t].reshape(N, 1))
        state, _obs, _r, _term = step(state, act)
    ode = np.asarray(state.phys.ode_state)  # [omega, currents...]

    cols = ([0] if mech else []) + list(range(1, 1 + n_el))
    for k, (o, c) in enumerate(zip(out, cols)):
        np.testing.assert_allclose(
            np.asarray(o).reshape(N), ode[:, c], rtol=1e-4, atol=1e-3,
            err_msg=f"{env_id} kernel state {k} (ode col {c})")


STAT_CASES = [
    # n_state = n_el + (1 if SC else 0)
    ("Finite-SC-PermExDc-v0", 2),   # single ref, omega window, mech ODE
    ("Cont-CC-ExtExDc-v0", 2),      # dual ref (spatial BM pairing), dual channel
    ("Finite-TC-SeriesDc-v0", 1),   # torque ref off the nonlinear i^2 torque
]


@pytest.mark.parametrize("env_id,n_state", STAT_CASES,
                         ids=[c[0] for c in STAT_CASES])
def test_fused_dc_stochastic_stats(env_id, n_state):
    env = gemx.make_functional(env_id)
    sub = env.reference_generator.subs[0]
    roll = make_fused_dc_rollout(env, T_STAT, N_STAT, interpret=True)
    z = jnp.zeros((2, 128), jnp.float32)
    out = roll(3, *([z] * n_state))
    states, reward, terms = out[:n_state], out[n_state], out[n_state + 1]
    rv, rk, rl, rs = out[n_state + 2:]

    margin = max(abs(sub.margin[0]), abs(sub.margin[1]))
    _check_wiener_state(rv, rk, rl, rs, margin, *sub.sigma_range)

    kernel_mean_r = float(jnp.sum(reward)) / (N_STAT * T_STAT)
    kernel_term_rate = float(jnp.sum(terms)) / (N_STAT * T_STAT)
    xla_mean_r, xla_term_rate = _xla_random_rollout(env_id, N_STAT, T_STAT)
    assert abs(kernel_mean_r - xla_mean_r) < 0.08
    assert abs(kernel_term_rate - xla_term_rate) < max(
        0.5 * max(kernel_term_rate, xla_term_rate), 2e-3)
    for s in states:
        assert np.all(np.isfinite(np.asarray(s)))
