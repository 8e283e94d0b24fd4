"""Universal fused synchronous-family rollout kernel
(``make_fused_sync_rollout``) tests — all 12 {Finite,Cont} x {CC,TC,SC} x
{PMSM,SynRM} catalog configs come from one builder; the corners validated
here: finite B6 bits vs cont duty, constant-speed (incremental Park
rotation) vs SC (mechanical ODE + per-step sincos), dual current refs vs
torque/omega scalar refs, for both machines (SynRM = psi_p = 0).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu import references as rg
from gym_electric_motor_tpu.ops.pallas_rollout import make_fused_sync_rollout

from test_pallas_rollout import (
    N_STAT,
    T_STAT,
    _check_wiener_state,
    _xla_random_rollout,
)

# (env_id, finite, mech(SC), const-ref names)
PHYSICS_CASES = [
    ("Finite-TC-PMSM-v0", True, False, ["torque"]),
    ("Cont-CC-PMSM-v0", False, False, ["i_sd", "i_sq"]),
    ("Finite-SC-PMSM-v0", True, True, ["omega"]),
    ("Cont-SC-SynRM-v0", False, True, ["omega"]),
    ("Cont-TC-SynRM-v0", False, False, ["torque"]),
    ("Finite-CC-SynRM-v0", True, False, ["i_sd", "i_sq"]),
]


@pytest.mark.parametrize("env_id,finite,mech,ref_names", PHYSICS_CASES,
                         ids=[c[0] for c in PHYSICS_CASES])
def test_fused_sync_physics_matches_xla_env(env_id, finite, mech, ref_names):
    consts = [rg.ConstReference(n, 0.0) for n in ref_names]
    ref = rg.ReferenceSpec(consts) if len(consts) > 1 else consts[0]
    env = gemx.make_functional(env_id, reference_generator=ref)
    N, T = 128, 50
    rng = np.random.default_rng(11)
    if finite:
        actions = rng.integers(0, 8, size=(T, 1, 128)).astype(np.int32)
    else:
        actions = rng.uniform(-1.0, 1.0,
                              size=(T, 3, 1, 128)).astype(np.float32)

    roll = make_fused_sync_rollout(env, T, N, action_mode="buffer",
                                   interpret=True)
    zero = jnp.zeros((1, 128), jnp.float32)
    n_state = 4 if mech else 3
    out = roll(*([zero] * n_state), jnp.asarray(actions))

    keys = jax.random.split(jax.random.PRNGKey(0), N)
    state, _ = jax.jit(jax.vmap(env.reset))(keys)
    step = jax.jit(jax.vmap(env.step))
    for t in range(T):
        act = jnp.asarray(actions[t].reshape(N) if finite
                          else actions[t].reshape(3, N).T)
        state, _obs, _r, _term = step(state, act)
    ode = np.asarray(state.phys.ode_state)  # [omega, i_sd, i_sq, eps]

    cols = ([0] if mech else []) + [1, 2, 3]
    for k, (o, c) in enumerate(zip(out, cols)):
        got = np.asarray(o).reshape(N)
        if c == 3:
            # circular comparison — 0 and 2*pi are the same angle and the
            # wrap boundary is representation-dependent in float32
            d = np.mod(got - ode[:, c] + np.pi, 2 * np.pi) - np.pi
            np.testing.assert_allclose(d, 0.0, atol=1e-4,
                                       err_msg=f"{env_id} eps")
        else:
            np.testing.assert_allclose(
                got, ode[:, c], rtol=1e-4, atol=1e-3,
                err_msg=f"{env_id} kernel state {k} (ode col {c})")


STAT_CASES = [
    ("Finite-SC-PMSM-v0", 4),   # mech ODE + per-step sincos
    ("Cont-TC-PMSM-v0", 3),     # torque ref, cont duty converter
    ("Cont-CC-SynRM-v0", 3),    # dual ref, psi_p = 0
]


@pytest.mark.parametrize("env_id,n_state", STAT_CASES,
                         ids=[c[0] for c in STAT_CASES])
def test_fused_sync_stochastic_stats(env_id, n_state):
    env = gemx.make_functional(env_id)
    sub = env.reference_generator.subs[0]
    roll = make_fused_sync_rollout(env, T_STAT, N_STAT, interpret=True)
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
