"""Universal fused family kernels for SCIM (``make_fused_induction_rollout``),
EESM (``make_fused_eesm_family_rollout``) and DFIM
(``make_fused_dfim_family_rollout``) — each builder covers its motor's 6
{Finite,Cont} x {CC,TC,SC} catalog configs.

Validation mirrors tests/test_pallas_{dc,sync}_universal.py: buffer-action
deterministic physics step-for-step vs the XLA env over the task/converter/
mechanics corners, plus interpret-mode stochastic statistics (Wiener
sub-episode state, reward/termination rates) vs the XLA env at matched
config.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu import references as rg
from gym_electric_motor_tpu.ops.pallas_rollout import (
    make_fused_dfim_family_rollout,
    make_fused_eesm_family_rollout,
    make_fused_induction_rollout,
)

from test_pallas_rollout import (
    N_STAT,
    T_STAT,
    _check_wiener_state,
    _xla_random_rollout,
)


def _build_actions(rng, T, finite, n_ch, finite_highs=None):
    if finite:
        if n_ch == 1:
            return rng.integers(0, finite_highs[0],
                                size=(T, 1, 128)).astype(np.int32)
        cols = [rng.integers(0, h, size=(T, 1, 128)) for h in finite_highs]
        return np.stack(cols, axis=1).astype(np.int32)
    shape = (T, n_ch, 1, 128) if n_ch > 1 else (T, 1, 128)
    return rng.uniform(-1.0, 1.0, size=shape).astype(np.float32)


def _run_xla(env, actions, finite, n_ch):
    N = 128
    keys = jax.random.split(jax.random.PRNGKey(0), N)
    state, _ = jax.jit(jax.vmap(env.reset))(keys)
    step = jax.jit(jax.vmap(env.step))
    for t in range(actions.shape[0]):
        if n_ch > 1:
            act = jnp.asarray(actions[t].reshape(n_ch, N).T)
        elif finite:
            act = jnp.asarray(actions[t].reshape(N))
        else:
            act = jnp.asarray(actions[t].reshape(N, 1))
        state, _obs, _r, _term = step(state, act)
    return np.asarray(state.phys.ode_state)


def _assert_states(out, ode, cols, env_id, eps_col=None):
    N = 128
    for k, (o, c) in enumerate(zip(out, cols)):
        got = np.asarray(o).reshape(N)
        if c == eps_col:
            d = np.mod(got - ode[:, c] + np.pi, 2 * np.pi) - np.pi
            np.testing.assert_allclose(d, 0.0, atol=1e-4,
                                       err_msg=f"{env_id} eps")
        else:
            np.testing.assert_allclose(
                got, ode[:, c], rtol=1e-4, atol=2e-3,
                err_msg=f"{env_id} kernel state {k} (ode col {c})")


# ---------------------------------------------------------------------------
# SCIM — states (omega?, i_sa, i_sb, psi_ra, psi_rb)
# ---------------------------------------------------------------------------

SCIM_CASES = [
    ("Finite-TC-SCIM-v0", True, False, ["torque"]),
    ("Cont-CC-SCIM-v0", False, False, ["i_sd", "i_sq"]),
    ("Finite-SC-SCIM-v0", True, True, ["omega"]),
    ("Cont-SC-SCIM-v0", False, True, ["omega"]),
    ("Finite-CC-SCIM-v0", True, False, ["i_sd", "i_sq"]),
]


@pytest.mark.parametrize("env_id,finite,mech,ref_names", SCIM_CASES,
                         ids=[c[0] for c in SCIM_CASES])
def test_fused_scim_family_physics(env_id, finite, mech, ref_names):
    consts = [rg.ConstReference(n, 0.0) for n in ref_names]
    ref = rg.ReferenceSpec(consts) if len(consts) > 1 else consts[0]
    env = gemx.make_functional(env_id, reference_generator=ref)
    rng = np.random.default_rng(21)
    T = 60
    n_ch = 1 if finite else 3
    actions = _build_actions(rng, T, finite, n_ch, finite_highs=[8])
    n_state = 5 if mech else 4
    roll = make_fused_induction_rollout(env, T, 128, action_mode="buffer",
                                        interpret=True)
    zero = jnp.zeros((1, 128), jnp.float32)
    out = roll(*([zero] * n_state), jnp.asarray(actions))
    ode = _run_xla(env, actions, finite, n_ch)
    cols = ([0] if mech else []) + [1, 2, 3, 4]
    _assert_states(out, ode, cols, env_id)


@pytest.mark.parametrize("env_id,n_state",
                         [("Finite-CC-SCIM-v0", 4), ("Cont-SC-SCIM-v0", 5)],
                         ids=["Finite-CC-SCIM-v0", "Cont-SC-SCIM-v0"])
def test_fused_scim_family_stats(env_id, n_state):
    _stat(make_fused_induction_rollout, env_id, n_state)


# ---------------------------------------------------------------------------
# EESM — states (omega?, i_sd, i_sq, i_e, eps); actions (B6, 4QC) | 4 duties
# ---------------------------------------------------------------------------

EESM_CASES = [
    ("Finite-TC-EESM-v0", True, False, ["torque"]),
    ("Cont-CC-EESM-v0", False, False, ["i_sd", "i_sq", "i_e"]),
    ("Finite-SC-EESM-v0", True, True, ["omega"]),
    ("Cont-SC-EESM-v0", False, True, ["omega"]),
    ("Finite-CC-EESM-v0", True, False, ["i_sd", "i_sq", "i_e"]),
]


@pytest.mark.parametrize("env_id,finite,mech,ref_names", EESM_CASES,
                         ids=[c[0] for c in EESM_CASES])
def test_fused_eesm_family_physics(env_id, finite, mech, ref_names):
    consts = [rg.ConstReference(n, 0.0) for n in ref_names]
    ref = rg.ReferenceSpec(consts) if len(consts) > 1 else consts[0]
    env = gemx.make_functional(env_id, reference_generator=ref)
    rng = np.random.default_rng(31)
    T = 50
    n_ch = 2 if finite else 4
    actions = _build_actions(rng, T, finite, n_ch, finite_highs=[8, 4])
    n_state = 5 if mech else 4
    roll = make_fused_eesm_family_rollout(env, T, 128, action_mode="buffer",
                                          interpret=True)
    zero = jnp.zeros((1, 128), jnp.float32)
    out = roll(*([zero] * n_state), jnp.asarray(actions))
    ode = _run_xla(env, actions, finite, n_ch)
    cols = ([0] if mech else []) + [1, 2, 3, 4]
    _assert_states(out, ode, cols, env_id, eps_col=4)


@pytest.mark.parametrize("env_id,n_state",
                         [("Finite-SC-EESM-v0", 5), ("Cont-TC-EESM-v0", 4)],
                         ids=["Finite-SC-EESM-v0", "Cont-TC-EESM-v0"])
def test_fused_eesm_family_stats(env_id, n_state):
    _stat(make_fused_eesm_family_rollout, env_id, n_state)


# ---------------------------------------------------------------------------
# DFIM — states (omega?, i_sa, i_sb, psi_ra, psi_rb, eps);
# actions (B6 stator, B6 rotor) | 6 duties
# ---------------------------------------------------------------------------

DFIM_CASES = [
    ("Cont-TC-DFIM-v0", False, False, ["torque"]),
    ("Finite-CC-DFIM-v0", True, False, ["i_sd", "i_sq"]),
    ("Finite-SC-DFIM-v0", True, True, ["omega"]),
    ("Cont-SC-DFIM-v0", False, True, ["omega"]),
    ("Finite-TC-DFIM-v0", True, False, ["torque"]),
]


@pytest.mark.parametrize("env_id,finite,mech,ref_names", DFIM_CASES,
                         ids=[c[0] for c in DFIM_CASES])
def test_fused_dfim_family_physics(env_id, finite, mech, ref_names):
    consts = [rg.ConstReference(n, 0.0) for n in ref_names]
    ref = rg.ReferenceSpec(consts) if len(consts) > 1 else consts[0]
    env = gemx.make_functional(env_id, reference_generator=ref)
    rng = np.random.default_rng(41)
    T = 50
    n_ch = 2 if finite else 6
    actions = _build_actions(rng, T, finite, n_ch, finite_highs=[8, 8])
    n_state = 6 if mech else 5
    roll = make_fused_dfim_family_rollout(env, T, 128, action_mode="buffer",
                                          interpret=True)
    zero = jnp.zeros((1, 128), jnp.float32)
    out = roll(*([zero] * n_state), jnp.asarray(actions))
    ode = _run_xla(env, actions, finite, n_ch)
    cols = ([0] if mech else []) + [1, 2, 3, 4, 5]
    _assert_states(out, ode, cols, env_id, eps_col=5)


@pytest.mark.parametrize("env_id,n_state",
                         [("Finite-TC-DFIM-v0", 5), ("Cont-SC-DFIM-v0", 6)],
                         ids=["Finite-TC-DFIM-v0", "Cont-SC-DFIM-v0"])
def test_fused_dfim_family_stats(env_id, n_state):
    _stat(make_fused_dfim_family_rollout, env_id, n_state)


# ---------------------------------------------------------------------------


def _stat(build, env_id, n_state):
    env = gemx.make_functional(env_id)
    sub = env.reference_generator.subs[0]
    roll = build(env, T_STAT, N_STAT, interpret=True)
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
