"""Extended three-phase fused-kernel coverage: AC1/RC supplies and the
Ornstein-Uhlenbeck speed load for the sync/SCIM/EESM/DFIM universal family
kernels — the env-arg space beyond the catalog defaults
(voltage_supplies.py:75-166, ornstein_uhlenbeck_load.py), mirroring
tests/test_pallas_dc_extended.py.

The RC-supply buffer tests are the sharpest: they exercise the in-kernel
converter supply-current reconstruction (B6 upper-switch / duty-weighted
phase sums from the dq/alphabeta state, plus the EESM excitation 4QC and
the DFIM rotor-current-from-flux path) because a wrong i_sup feeds back
into u_sup and diverges the trajectories within a few steps.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu import references as rg
from gym_electric_motor_tpu.models.loads import ornstein_uhlenbeck_load
from gym_electric_motor_tpu.models.supplies import (
    ac_1_phase_supply,
    rc_voltage_supply,
)
from gym_electric_motor_tpu.ops.pallas_rollout import (
    fused_state_arity,
    make_fused_rollout,
)

from test_pallas_dc_extended import _xla_random_stats
from test_pallas_families import _assert_states, _build_actions

N, T = 128, 50

# (env_id, n_core, finite channel count / highs, const-ref names,
#  eps column in the XLA ode_state [omega, motor states...])
FAMILY_CASES = {
    "sync": ("Cont-CC-PMSM-v0", 3, (3, None), ["i_sd", "i_sq"], 3),
    "scim": ("Cont-TC-SCIM-v0", 4, (3, None), ["torque"], None),
    "eesm": ("Finite-CC-EESM-v0", 4, (2, [8, 4]), ["i_sd", "i_sq", "i_e"], 4),
    "dfim": ("Finite-TC-DFIM-v0", 5, (2, [8, 8]), ["torque"], 5),
}


def _make_env(family, **kwargs):
    env_id, n_core, (n_ch, highs), ref_names, eps_col = FAMILY_CASES[family]
    consts = [rg.ConstReference(nm, 0.0) for nm in ref_names]
    ref = rg.ReferenceSpec(consts) if len(consts) > 1 else consts[0]
    env = gemx.make_functional(env_id, reference_generator=ref, **kwargs)
    finite = highs is not None
    return env, env_id, n_core, n_ch, highs, finite, eps_col


def _run_xla(env, actions, finite, n_ch):
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
    return (np.asarray(state.phys.ode_state),
            np.asarray(state.phys.sup_state)
            if state.phys.sup_state is not None else None)


@pytest.mark.parametrize("family", list(FAMILY_CASES))
def test_fused_threephase_rc_supply_matches_xla(family):
    """RC DC-link: u_sup sags with the converter supply current — validates
    the per-family i_sup reconstruction against the XLA env step-for-step
    (voltage_supplies.py:75-123; converters.py:289-298, 429-435)."""
    env, env_id, n_core, n_ch, highs, finite, eps_col = _make_env(
        family, supply=rc_voltage_supply(
            u_nominal=420.0, supply_parameter={"R": 2.0, "C": 2e-3}))
    assert fused_state_arity(env) == n_core + 2
    rng = np.random.default_rng(51)
    actions = _build_actions(rng, T, finite, n_ch, finite_highs=highs)

    roll = make_fused_rollout(env, T, N, action_mode="buffer",
                              interpret=True)
    zero = jnp.zeros((1, 128), jnp.float32)
    u0 = jnp.full((1, 128), 420.0, jnp.float32)
    out = roll(*([zero] * n_core), u0, zero, jnp.asarray(actions))

    ode, sup = _run_xla(env, actions, finite, n_ch)
    # the supply must actually have moved, else this test is vacuous
    assert np.std(sup[:, 0]) > 2e-3, np.std(sup[:, 0])
    cols = list(range(1, n_core + 1))  # XLA col 0 is omega (const speed)
    _assert_states(out[:n_core], ode, cols, env_id, eps_col=eps_col)
    np.testing.assert_allclose(np.asarray(out[n_core]).reshape(N),
                               sup[:, 0], rtol=1e-4, atol=1e-2)


def test_fused_sync_ac1_supply_fixed_phase_matches_xla():
    """AC1 DC-link with pinned phase replays u = amp sin(2 pi f t + phi)
    deterministically through the (theta, theta_lo) double-float phase
    planes (theta(0) = phi)."""
    env, env_id, n_core, n_ch, highs, finite, eps_col = _make_env(
        "sync", supply=ac_1_phase_supply(
            u_nominal=230.0,
            supply_parameter={"frequency": 50.0, "phase": 0.7}))
    assert fused_state_arity(env) == n_core + 2
    rng = np.random.default_rng(52)
    actions = _build_actions(rng, T, finite, n_ch, finite_highs=highs)

    roll = make_fused_rollout(env, T, N, action_mode="buffer",
                              interpret=True)
    zero = jnp.zeros((1, 128), jnp.float32)
    phi0 = jnp.full((1, 128), 0.7, jnp.float32)
    out = roll(*([zero] * n_core), phi0, zero, jnp.asarray(actions))

    ode, _sup = _run_xla(env, actions, finite, n_ch)
    cols = list(range(1, n_core + 1))
    _assert_states(out[:n_core], ode, cols, env_id, eps_col=eps_col)
    # theta plane advanced T increments past the pinned phase
    tau = float(env.physical_system.tau)
    np.testing.assert_allclose(np.asarray(out[n_core]).reshape(N),
                               0.7 + T * 2.0 * np.pi * 50.0 * tau,
                               rtol=1e-5)


@pytest.mark.parametrize("family", ["sync", "dfim"])
def test_fused_threephase_ou_load_deterministic_matches_xla(family):
    """OU load with sigma=0: deterministic speed relaxation through the
    shared RK4 — the mech-branch (per-step sincos) path under a
    non-polynomial load."""
    env, env_id, n_core, n_ch, highs, finite, eps_col = _make_env(
        family, load=ornstein_uhlenbeck_load(
            mu=60.0, sigma=0.0, theta=40.0, tau=1e-4,
            omega_range=(-300.0, 300.0)))
    n_state = n_core + 1  # omega plane joins the core
    assert fused_state_arity(env) == n_state
    rng = np.random.default_rng(53)
    actions = _build_actions(rng, T, finite, n_ch, finite_highs=highs)

    keys = jax.random.split(jax.random.PRNGKey(0), N)
    state0, _ = jax.jit(jax.vmap(env.reset))(keys)
    omega0 = np.asarray(state0.phys.ode_state)[:, 0]
    assert np.std(omega0) > 10.0  # uniform init actually randomized

    roll = make_fused_rollout(env, T, N, action_mode="buffer",
                              interpret=True)
    zero = jnp.zeros((1, 128), jnp.float32)
    w0 = jnp.asarray(omega0.reshape(1, 128), jnp.float32)
    out = roll(w0, *([zero] * n_core), jnp.asarray(actions))

    ode, _sup = _run_xla(env, actions, finite, n_ch)
    cols = list(range(0, n_state))
    _assert_states(out[:n_state], ode, cols, env_id, eps_col=eps_col)


# ---------------------------------------------------------------------------
# Stochastic paths: kernel vs XLA env under random actions
# ---------------------------------------------------------------------------

N_STAT, T_STAT = 2048, 400


@pytest.mark.parametrize("env_id,case", [
    ("Cont-CC-PMSM-v0", "ou"),
    ("Finite-TC-SCIM-v0", "ac1"),
    ("Cont-SC-EESM-v0", "ou"),
])
def test_fused_threephase_stochastic_extensions_match_xla(env_id, case):
    if case == "ou":
        env = gemx.make_functional(
            env_id, load=ornstein_uhlenbeck_load(
                mu=0.0, sigma=25.0, theta=5.0, tau=float(
                    gemx.make_functional(env_id).physical_system.tau),
                omega_range=(-150.0, 150.0)))
    else:
        env = gemx.make_functional(
            env_id, supply=ac_1_phase_supply(u_nominal=230.0))

    n_state = fused_state_arity(env)
    roll = make_fused_rollout(env, T_STAT, N_STAT, interpret=True)
    R = N_STAT // 128
    z = jnp.zeros((R, 128), jnp.float32)
    planes = [z] * n_state
    if case == "ac1":
        # match the XLA env's per-episode random phase at t=0
        rng = np.random.default_rng(11)
        planes[n_state - 2] = jnp.asarray(
            rng.uniform(0.0, 2.0 * np.pi, (R, 128)).astype(np.float32))
    out = roll(3, *planes)
    states, reward, terms = out[:n_state], out[n_state], out[n_state + 1]

    kernel_mean_r = float(jnp.sum(reward)) / (N_STAT * T_STAT)
    kernel_term_rate = float(jnp.sum(terms)) / (N_STAT * T_STAT)
    xla_mean_r, xla_term_rate = _xla_random_stats(env, N_STAT, T_STAT)
    assert abs(kernel_mean_r - xla_mean_r) < 0.08, (
        f"{kernel_mean_r} vs {xla_mean_r}")
    assert abs(kernel_term_rate - xla_term_rate) < max(
        0.5 * max(kernel_term_rate, xla_term_rate), 5e-3)
    for s in states:
        assert np.all(np.isfinite(np.asarray(s)))

    if case == "ou":
        # in-kernel resets draw omega ~ U(lo, hi); with drift toward mu=0
        # the omega plane must show real spread and respect the clip range
        w = np.asarray(states[0]).ravel()
        assert np.std(w) > 5.0
        assert np.all(np.abs(w) <= 150.0 + 1e-3)


# ---------------------------------------------------------------------------
# Trajectory recorder under the new modes
# ---------------------------------------------------------------------------


def test_record_buffer_rc_supply_matches_xla():
    """Recorder + RC supply (finite sync): the recorded per-step trajectory
    incl. the u_sup plane matches the XLA env across chunk boundaries, with
    the previous-action scratch carrying the i_sup switch state."""
    from gym_electric_motor_tpu.ops.pallas_record import (
        make_fused_record_rollout)

    env = gemx.make_functional(
        "Finite-CC-PMSM-v0",
        reference_generator=rg.ReferenceSpec(
            [rg.ConstReference("i_sd", 0.0), rg.ConstReference("i_sq", 0.0)]),
        supply=rc_voltage_supply(u_nominal=420.0,
                                 supply_parameter={"R": 2.0, "C": 1e-3}))
    T, CHUNK = 40, 8
    rng = np.random.default_rng(61)
    actions = rng.integers(0, 8, size=(T, 1, 128)).astype(np.int32)

    roll = make_fused_record_rollout(env, T, N, chunk=CHUNK,
                                     action_mode="buffer", interpret=True)
    zero = jnp.zeros((1, 128), jnp.float32)
    u0 = jnp.full((1, 128), 420.0, jnp.float32)
    out = roll(zero, zero, zero, u0, zero, jnp.asarray(actions))
    trajs = [out[name] for name in roll.signals]
    assert roll.signals == ("i_sd", "i_sq", "eps", "u_sup", "sup_t")

    keys = jax.random.split(jax.random.PRNGKey(0), N)
    state, _ = jax.jit(jax.vmap(env.reset))(keys)
    step = jax.jit(jax.vmap(env.step))
    for t in range(T):
        state, _obs, _r, _term = step(state,
                                      jnp.asarray(actions[t].reshape(N)))
        ode = np.asarray(state.phys.ode_state)
        sup = np.asarray(state.phys.sup_state)
        for k, c in enumerate([1, 2, 3]):
            got = np.asarray(trajs[k][t]).reshape(N)
            if c == 3:
                d = np.mod(got - ode[:, c] + np.pi, 2 * np.pi) - np.pi
                np.testing.assert_allclose(d, 0.0, atol=1e-4,
                                           err_msg=f"eps t={t}")
            else:
                np.testing.assert_allclose(got, ode[:, c], rtol=1e-4,
                                           atol=2e-3, err_msg=f"t={t}")
        np.testing.assert_allclose(np.asarray(trajs[3][t]).reshape(N),
                                   sup[:, 0], rtol=1e-4, atol=1e-2,
                                   err_msg=f"u_sup t={t}")


def test_record_random_ou_load_smoke():
    """Recorder + OU load (random mode): finite signals, omega stays inside
    the clip range, done steps reset omega to a fresh uniform draw."""
    from gym_electric_motor_tpu.ops.pallas_record import (
        make_fused_record_rollout)

    env = gemx.make_functional(
        "Cont-CC-PermExDc-v0",
        load=ornstein_uhlenbeck_load(mu=0.0, sigma=30.0, theta=5.0,
                                     tau=1e-4, omega_range=(-200.0, 200.0)))
    T = 512
    roll = make_fused_record_rollout(env, T, 256, chunk=8, interpret=True)
    zero = jnp.zeros((2, 128), jnp.float32)
    out = {k: np.asarray(v) for k, v in roll(5, zero, zero).items()}
    w = out["omega"]
    assert np.all(np.isfinite(w)) and np.all(np.abs(w) <= 200.0 + 1e-3)
    assert np.std(w) > 5.0
    assert np.all(np.isfinite(out["reward"]))


# ---------------------------------------------------------------------------
# Cont-converter interlocking dead time (duty discount + i_sup correction)
# ---------------------------------------------------------------------------

T_INT = 4e-6  # 4% of tau=1e-4


def _interlocked_env(family):
    from gym_electric_motor_tpu.models import converters as cv

    tau = 1e-4
    if family == "dc2qc":
        return gemx.make_functional(
            "Cont-CC-PermExDc-v0",
            converter=cv.cont_two_quadrant_converter(tau, T_INT),
            reference_generator=rg.ConstReference("i", 0.0)), 1, None
    if family == "dc4qc":
        return gemx.make_functional(
            "Cont-CC-PermExDc-v0",
            converter=cv.cont_four_quadrant_converter(tau, T_INT),
            reference_generator=rg.ConstReference("i", 0.0)), 1, None
    if family == "sync":
        env = gemx.make_functional(
            "Cont-CC-PMSM-v0",
            converter=cv.cont_b6_bridge_converter(tau, T_INT),
            reference_generator=rg.ReferenceSpec(
                [rg.ConstReference("i_sd", 0.0),
                 rg.ConstReference("i_sq", 0.0)]))
        return env, 3, 3
    if family == "eesm":
        subs = [cv.cont_b6_bridge_converter(tau, T_INT),
                cv.cont_four_quadrant_converter(tau, T_INT)]
        env = gemx.make_functional(
            "Cont-CC-EESM-v0",
            converter=cv.cont_multi_converter(subs, tau, T_INT),
            reference_generator=rg.ReferenceSpec(
                [rg.ConstReference(n, 0.0)
                 for n in ("i_sd", "i_sq", "i_e")]))
        return env, 4, 4
    subs = [cv.cont_b6_bridge_converter(tau, T_INT),
            cv.cont_b6_bridge_converter(tau, T_INT)]
    env = gemx.make_functional(
        "Cont-TC-DFIM-v0",
        converter=cv.cont_multi_converter(subs, tau, T_INT),
        reference_generator=rg.ConstReference("torque", 0.0))
    return env, 6, 5


@pytest.mark.parametrize("family", ["dc2qc", "dc4qc", "sync", "eesm",
                                    "dfim"])
def test_fused_cont_interlocking_matches_xla(family):
    """Cont-converter interlocking folds into the static duty discount
    _c2u and the i_sup correction _c2i (converters.py:148-184, 429-435):
    fused trajectories must match the XLA env step-for-step with
    interlocking_time > 0.  The discount flips sign with the pre-step
    phase current, so buffer replay exercises the current-dependent
    branch."""
    env, n_ch, eps_col = _interlocked_env(family)
    n_core = fused_state_arity(env)
    rng = np.random.default_rng(71)
    actions = _build_actions(rng, T, False, n_ch, finite_highs=None)

    roll = make_fused_rollout(env, T, N, action_mode="buffer",
                              interpret=True)
    zero = jnp.zeros((1, 128), jnp.float32)
    out = roll(*([zero] * n_core), jnp.asarray(actions))
    out = out if isinstance(out, tuple) else (out,)

    ode, _sup = _run_xla(env, actions, False, n_ch)
    cols = list(range(1, n_core + 1))
    _assert_states(out[:n_core], ode, cols, f"{family}+interlock",
                   eps_col=eps_col)
    # the interlock discount must actually bite: replay WITHOUT interlock
    # must differ measurably (guards against a silently-ignored t_int)
    env0, _n, _e = _interlocked_env(family)
    base_id = {"dc2qc": "Cont-CC-PermExDc-v0", "dc4qc": "Cont-CC-PermExDc-v0",
               "sync": "Cont-CC-PMSM-v0", "eesm": "Cont-CC-EESM-v0",
               "dfim": "Cont-TC-DFIM-v0"}[family]
    env_ni = gemx.make_functional(
        base_id, reference_generator=env.reference_generator)
    roll_ni = make_fused_rollout(env_ni, T, N, action_mode="buffer",
                                 interpret=True)
    out_ni = roll_ni(*([zero] * n_core), jnp.asarray(actions))
    out_ni = out_ni if isinstance(out_ni, tuple) else (out_ni,)
    diff = max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
               for a, b in zip(out[:2], out_ni[:2]))
    assert diff > 1e-3, diff


def _finite_interlocked_env(family):
    from gym_electric_motor_tpu.models import converters as cv

    tau, ti = 1e-5, 1e-6
    if family == "sync":
        env = gemx.make_functional(
            "Finite-CC-PMSM-v0",
            converter=cv.finite_b6_bridge_converter(tau, ti),
            reference_generator=rg.ReferenceSpec(
                [rg.ConstReference("i_sd", 0.0),
                 rg.ConstReference("i_sq", 0.0)]))
        return env, 3, (1, [8]), 3
    if family == "scim":
        env = gemx.make_functional(
            "Finite-TC-SCIM-v0",
            converter=cv.finite_b6_bridge_converter(tau, ti),
            reference_generator=rg.ConstReference("torque", 0.0))
        return env, 4, (1, [8]), None
    if family == "eesm":
        subs = [cv.finite_b6_bridge_converter(tau, ti),
                cv.finite_four_quadrant_converter(tau, ti)]
        env = gemx.make_functional(
            "Finite-CC-EESM-v0",
            converter=cv.finite_multi_converter(subs, tau, ti),
            reference_generator=rg.ReferenceSpec(
                [rg.ConstReference(n, 0.0)
                 for n in ("i_sd", "i_sq", "i_e")]))
        return env, 4, (2, [8, 4]), 4
    subs = [cv.finite_b6_bridge_converter(tau, ti),
            cv.finite_b6_bridge_converter(tau, ti)]
    env = gemx.make_functional(
        "Finite-TC-DFIM-v0",
        converter=cv.finite_multi_converter(subs, tau, ti),
        reference_generator=rg.ConstReference("torque", 0.0))
    return env, 5, (2, [8, 8]), 5


@pytest.mark.parametrize("family", ["sync", "scim", "eesm", "dfim"])
def test_fused_finite_interlocking_matches_xla(family):
    """Finite B6/multi interlocking: carried half-bridge switching states,
    2-sub-interval integration with mid-cycle angle/current refresh and
    interval-1 freeze for no-interlock envs — step-for-step vs the XLA
    env (converters.py:99-111, 300-310; physical_systems.py:487-525)."""
    env, n_core, (n_ch, highs), eps_col = _finite_interlocked_env(family)
    rng = np.random.default_rng(81)
    actions = _build_actions(rng, T, True, n_ch, finite_highs=highs)

    roll = make_fused_rollout(env, T, N, action_mode="buffer",
                              interpret=True)
    zero = jnp.zeros((1, 128), jnp.float32)
    out = roll(*([zero] * n_core), jnp.asarray(actions))
    out = out if isinstance(out, tuple) else (out,)

    ode, _sup = _run_xla(env, actions, True, n_ch)
    cols = list(range(1, n_core + 1))
    _assert_states(out[:n_core], ode, cols, f"{family}+finite-interlock",
                   eps_col=eps_col)

    # the interlock must actually bite
    env0, _c, _h, _e = _finite_interlocked_env(family)
    base = {"sync": "Finite-CC-PMSM-v0", "scim": "Finite-TC-SCIM-v0",
            "eesm": "Finite-CC-EESM-v0", "dfim": "Finite-TC-DFIM-v0"}[family]
    env_ni = gemx.make_functional(
        base, reference_generator=env.reference_generator)
    roll_ni = make_fused_rollout(env_ni, T, N, action_mode="buffer",
                                 interpret=True)
    out_ni = roll_ni(*([zero] * n_core), jnp.asarray(actions))
    out_ni = out_ni if isinstance(out_ni, tuple) else (out_ni,)
    diff = max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
               for a, b in zip(out[:2], out_ni[:2]))
    assert diff > 1e-3, diff


def test_sharded_auto_dispatch_with_supply_planes():
    """make_sharded_fused_rollout(kernel='auto') handles the extra supply
    state planes (arity via fused_state_arity) over the 8-device mesh."""
    from gym_electric_motor_tpu.parallel import make_env_mesh
    from gym_electric_motor_tpu.ops.pallas_rollout import (
        make_sharded_fused_rollout)

    mesh = make_env_mesh(8)
    env = gemx.make_functional("Cont-CC-PMSM-v0",
                               supply=ac_1_phase_supply(u_nominal=230.0))
    n = fused_state_arity(env)
    assert n == 5  # (i_sd, i_sq, eps, sup_phi, sup_t)
    roll = make_sharded_fused_rollout(env, 32, 2048, mesh, kernel="auto",
                                      interpret=True)
    planes = [jnp.zeros((16, 128), jnp.float32) for _ in range(n)]
    out = roll(7, *planes)
    assert np.isfinite(float(out[-2][0]))
    for x in out[:n]:
        assert np.isfinite(np.asarray(x)).all()


def test_record_buffer_finite_interlock_matches_xla():
    """Recorder + finite interlocking: the half-bridge switching states
    persist in scratch across chunk boundaries; recorded trajectories
    match the XLA env step-for-step."""
    from gym_electric_motor_tpu.models import converters as cv
    from gym_electric_motor_tpu.ops.pallas_record import (
        make_fused_record_rollout)

    env = gemx.make_functional(
        "Finite-CC-PMSM-v0",
        converter=cv.finite_b6_bridge_converter(1e-5, interlocking_time=1e-6),
        reference_generator=rg.ReferenceSpec(
            [rg.ConstReference("i_sd", 0.0), rg.ConstReference("i_sq", 0.0)]))
    T, CHUNK = 40, 8
    rng = np.random.default_rng(91)
    actions = rng.integers(0, 8, size=(T, 1, 128)).astype(np.int32)

    roll = make_fused_record_rollout(env, T, N, chunk=CHUNK,
                                     action_mode="buffer", interpret=True)
    zero = jnp.zeros((1, 128), jnp.float32)
    out = roll(zero, zero, zero, jnp.asarray(actions))
    trajs = [out[name] for name in roll.signals]

    keys = jax.random.split(jax.random.PRNGKey(0), N)
    state, _ = jax.jit(jax.vmap(env.reset))(keys)
    step = jax.jit(jax.vmap(env.step))
    for t in range(T):
        state, _obs, _r, _term = step(state,
                                      jnp.asarray(actions[t].reshape(N)))
        ode = np.asarray(state.phys.ode_state)
        for k, c in enumerate([1, 2, 3]):
            got = np.asarray(trajs[k][t]).reshape(N)
            if c == 3:
                d = np.mod(got - ode[:, c] + np.pi, 2 * np.pi) - np.pi
                np.testing.assert_allclose(d, 0.0, atol=1e-4,
                                           err_msg=f"eps t={t}")
            else:
                np.testing.assert_allclose(got, ode[:, c], rtol=1e-4,
                                           atol=2e-3, err_msg=f"t={t}")
