"""Universal trajectory-recording kernel (``make_fused_record_rollout``).

One generic chunked-grid recorder covers all 54 catalog ids by consuming
the same family namespaces as the reducing kernels.  Validation mirrors
tests/test_pallas_record.py:

* buffer mode: the RECORDED per-step trajectory matches the XLA env
  step-for-step (one config per family, spanning finite/cont converters,
  constant-speed and dynamic mechanics, single/dual action channels and
  every chunk-boundary handoff through the VMEM scratch state);
* random mode (interpret-mode xorshift bit source): rewards recompute
  exactly from the recorded signals, done steps carry the violation
  reward and reset the state, references respect the Wiener margins, and
  the reset rate agrees with the reducing kernel at matched config;
* catalog-wide: every env id builds and runs the recorder.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu import references as rg
from gym_electric_motor_tpu.envs.catalog import ENV_IDS
from gym_electric_motor_tpu.ops.pallas_record import make_fused_record_rollout
from gym_electric_motor_tpu.ops.pallas_rollout import (
    fused_state_arity,
    make_fused_rollout,
)

# (env_id, finite, action channels, finite highs, mech,
#  kernel-state -> ode-state column, eps column, const-ref names)
BUFFER_CASES = [
    ("Cont-TC-PermExDc-v0", False, 1, None, False, [1], None, ["torque"]),
    ("Finite-CC-ExtExDc-v0", True, 2, [4, 4], False, [1, 2], None,
     ["i_a", "i_e"]),
    ("Cont-SC-ShuntDc-v0", False, 1, None, True, [0, 1, 2], None, ["omega"]),
    ("Cont-TC-PMSM-v0", False, 3, None, False, [1, 2, 3], 3, ["torque"]),
    ("Finite-SC-SynRM-v0", True, 1, [8], True, [0, 1, 2, 3], 3, ["omega"]),
    ("Finite-CC-SCIM-v0", True, 1, [8], False, [1, 2, 3, 4], None,
     ["i_sd", "i_sq"]),
    ("Cont-CC-EESM-v0", False, 4, None, False, [1, 2, 3, 4], 4,
     ["i_sd", "i_sq", "i_e"]),
    ("Finite-TC-DFIM-v0", True, 2, [8, 8], False, [1, 2, 3, 4, 5], 5,
     ["torque"]),
]


def _build_actions(rng, T, finite, n_ch, highs):
    if finite:
        if n_ch == 1:
            return rng.integers(0, highs[0], size=(T, 1, 128)).astype(np.int32)
        cols = [rng.integers(0, h, size=(T, 1, 128)) for h in highs]
        return np.stack(cols, axis=1).astype(np.int32)
    shape = (T, n_ch, 1, 128) if n_ch > 1 else (T, 1, 128)
    return rng.uniform(-1.0, 1.0, size=shape).astype(np.float32)


@pytest.mark.parametrize(
    "env_id,finite,n_ch,highs,mech,cols,eps_col,ref_names", BUFFER_CASES,
    ids=[c[0] for c in BUFFER_CASES])
def test_record_buffer_matches_xla_env(env_id, finite, n_ch, highs, mech,
                                       cols, eps_col, ref_names):
    consts = [rg.ConstReference(n, 0.0) for n in ref_names]
    ref = rg.ReferenceSpec(consts) if len(consts) > 1 else consts[0]
    env = gemx.make_functional(env_id, reference_generator=ref)
    N, T, CHUNK = 128, 40, 8
    rng = np.random.default_rng(11)
    actions = _build_actions(rng, T, finite, n_ch, highs)

    roll = make_fused_record_rollout(env, T, N, chunk=CHUNK,
                                     action_mode="buffer", interpret=True)
    zero = jnp.zeros((1, 128), jnp.float32)
    out = roll(*([zero] * len(cols)), jnp.asarray(actions))
    # jit sorts dict keys — index by the builder's signal order, not .values()
    trajs = [out[name] for name in roll.signals]
    assert all(x.shape == (T, 1, 128) for x in trajs)

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
        ode = np.asarray(state.phys.ode_state)
        for k, c in enumerate(cols):
            got = np.asarray(trajs[k][t]).reshape(N)
            if c == eps_col:
                d = np.mod(got - ode[:, c] + np.pi, 2 * np.pi) - np.pi
                np.testing.assert_allclose(
                    d, 0.0, atol=1e-4, err_msg=f"{env_id} eps t={t}")
            else:
                np.testing.assert_allclose(
                    got, ode[:, c], rtol=1e-4, atol=2e-3,
                    err_msg=f"{env_id} state {k} (ode col {c}) t={t}")


# ---------------------------------------------------------------------------
# Random mode: transitions recompute
# ---------------------------------------------------------------------------


def _wse_coef(env, name):
    rw = env.reward_function
    names = list(env.physical_system.state_names)
    idx = names.index(name)
    return float(rw._weights[idx] / rw._state_length[idx])


def _margins(env, name):
    for s in env.reference_generator.subs:
        if s.reference_state == name:
            return float(s.margin[0]), float(s.margin[1])
    raise KeyError(name)


def test_record_random_permex_current_control():
    env = gemx.make_functional("Finite-CC-PermExDc-v0")
    ps = env.physical_system
    names = list(ps.state_names)
    i_lim = float(np.asarray(ps.limits)[names.index("i")])
    mlo, mhi = _margins(env, "i")

    N, T = 256, 512
    zero = jnp.zeros((N // 128, 128), jnp.float32)
    roll = make_fused_record_rollout(env, T, N, chunk=8, interpret=True)
    out = {k: np.asarray(v) for k, v in roll(5, zero).items()}
    i, ref, act = out["i"], out["ref_i"], out["action"]
    rew, done = out["reward"], out["done"]

    assert act.min() >= 0 and act.max() <= 3
    assert np.all(ref >= mlo - 1e-6) and np.all(ref <= mhi + 1e-6)
    assert np.std(ref) > 1e-3
    coef = _wse_coef(env, "i")
    ok = done < 0.5
    np.testing.assert_allclose(rew[ok], -coef * np.abs(i[ok] / i_lim - ref[ok]),
                               rtol=1e-5, atol=1e-6)
    bad = ~ok
    assert bad.any()
    np.testing.assert_allclose(rew[bad],
                               float(env.reward_function._violation_value),
                               rtol=1e-6)
    assert np.all(i[bad] == 0.0)


def test_record_random_pmsm_torque_control():
    """TC config: the recorded reward must recompute from the TORQUE of the
    recorded post-step currents — checks the quantity path, not just raw
    states."""
    env = gemx.make_functional("Finite-TC-PMSM-v0")
    ps = env.physical_system
    mp = ps.motor.parameter
    names = list(ps.state_names)
    t_lim = float(np.asarray(ps.limits)[names.index("torque")])
    l_d, l_q = float(mp["l_d"]), float(mp["l_q"])
    psi_p, p = float(mp["psi_p"]), float(mp["p"])

    N, T = 256, 512
    zero = jnp.zeros((N // 128, 128), jnp.float32)
    roll = make_fused_record_rollout(env, T, N, chunk=8, interpret=True)
    out = {k: np.asarray(v) for k, v in roll(3, zero, zero, zero).items()}
    assert set(out) == {"i_sd", "i_sq", "eps", "ref_torque", "action",
                        "reward", "done"}
    assert out["eps"].min() >= 0.0 and out["eps"].max() < 2 * np.pi

    torque = 1.5 * p * (psi_p + (l_d - l_q) * out["i_sd"]) * out["i_sq"]
    coef = _wse_coef(env, "torque")
    ok = out["done"] < 0.5
    np.testing.assert_allclose(
        out["reward"][ok],
        -coef * np.abs(torque[ok] / t_lim - out["ref_torque"][ok]),
        rtol=1e-4, atol=1e-5)


def test_record_random_scim_stale_flux_angle():
    """CC-SCIM: the recorded reward at step t uses the PRE-step rotor-flux
    direction (the reference's stale-angle quirk) — recompute it from the
    recorded state at t-1 on runs with no reset at t-1 or t."""
    env = gemx.make_functional("Cont-CC-SCIM-v0")
    ps = env.physical_system
    names = list(ps.state_names)
    i_lim = float(np.asarray(ps.limits)[names.index("i_sd")])

    N, T = 256, 256
    zero = jnp.zeros((N // 128, 128), jnp.float32)
    roll = make_fused_record_rollout(env, T, N, chunk=8, interpret=True)
    out = {k: np.asarray(v) for k, v in roll(17, *([zero] * 4)).items()}

    ps_a, ps_b = out["psi_ralpha"][:-1], out["psi_rbeta"][:-1]
    mag = np.sqrt(ps_a**2 + ps_b**2)
    safe = mag > 1e-9
    c = np.where(safe, ps_a / np.where(safe, mag, 1.0), 1.0)
    s = np.where(safe, ps_b / np.where(safe, mag, 1.0), 0.0)
    i_sa, i_sb = out["i_salpha"][1:], out["i_sbeta"][1:]
    i_sd = (c * i_sa + s * i_sb) / i_lim
    i_sq = (c * i_sb - s * i_sa) / i_lim

    coef_d, coef_q = _wse_coef(env, "i_sd"), _wse_coef(env, "i_sq")
    expect = -(coef_d * np.abs(i_sd - out["ref_i_sd"][1:])
               + coef_q * np.abs(i_sq - out["ref_i_sq"][1:]))
    ok = (out["done"][1:] < 0.5) & (out["done"][:-1] < 0.5) & safe
    assert ok.mean() > 0.8
    np.testing.assert_allclose(out["reward"][1:][ok], expect[ok],
                               rtol=1e-4, atol=1e-5)


def test_record_reset_rate_matches_reducing_kernel():
    env = gemx.make_functional("Finite-CC-PMSM-v0")
    N, T = 256, 2048
    zero = jnp.zeros((N // 128, 128), jnp.float32)

    rec = make_fused_record_rollout(env, T, N, chunk=8, interpret=True)
    rate_rec = float(np.asarray(rec(3, zero, zero, zero)["done"]).mean())

    red = make_fused_rollout(env, T, N, interpret=True)
    terms = np.asarray(red(3, zero, zero, zero)[4])
    rate_red = terms.sum() / (N * T)

    assert rate_rec > 0 and rate_red > 0
    assert 0.5 < (rate_rec / rate_red) < 2.0


def test_record_cont_actions_recorded_in_range():
    env = gemx.make_functional("Cont-CC-EESM-v0")
    N, T = 128, 64
    zero = jnp.zeros((1, 128), jnp.float32)
    roll = make_fused_record_rollout(env, T, N, interpret=True)
    out = roll(1, zero, zero, zero, zero)
    for k in ("action_a", "action_b", "action_c", "action_e"):
        a = np.asarray(out[k])
        assert a.dtype == np.float32
        assert a.min() >= -1.0 and a.max() <= 1.0
        assert np.std(a) > 0.1


# ---------------------------------------------------------------------------
# Catalog-wide coverage
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Sharded recorder over a device mesh
# ---------------------------------------------------------------------------


def test_sharded_record_rollout_over_mesh():
    """Recorder x shard_map: one recording kernel per device, trajectories
    sharded P(None, 'env') — multi-chip off-policy collection (virtual
    8-device CPU mesh; real chips unchanged)."""
    from gym_electric_motor_tpu.parallel import make_env_mesh
    from gym_electric_motor_tpu.ops.pallas_record import (
        make_sharded_record_rollout,
    )

    env = gemx.make_functional("Finite-CC-PermExDc-v0")
    mesh = make_env_mesh(8)
    T, N = 256, 8 * 128
    roll = make_sharded_record_rollout(env, T, N, mesh, interpret=True)
    z = jnp.zeros((N // 128, 128), jnp.float32)
    out = roll(5, z)
    assert set(out) == set(roll.signals)
    rew = np.asarray(out["reward"])
    assert rew.shape == (T, N // 128, 128)
    # every device produced a distinct, live shard (decorrelated seeds)
    shard_means = rew.reshape(T, 8, -1).mean(axis=(0, 2))
    assert np.all(np.isfinite(shard_means)) and np.all(shard_means < 0.0)
    assert np.std(shard_means) > 0.0
    # same reward distribution as the unsharded recorder at matched config
    single = make_fused_record_rollout(env, T, 128, interpret=True)
    ref = float(np.asarray(single(9, z[:1])["reward"]).mean())
    assert abs(rew.mean() - ref) < 0.05, (rew.mean(), ref)
    # rewards recompute from the recorded local signals, shard by shard
    ps = env.physical_system
    names = list(ps.state_names)
    i_lim = float(np.asarray(ps.limits)[names.index("i")])
    coef = _wse_coef(env, "i")
    ok = np.asarray(out["done"]) < 0.5
    np.testing.assert_allclose(
        rew[ok],
        (-coef * np.abs(np.asarray(out["i"]) / i_lim
                        - np.asarray(out["ref_i"])))[ok],
        rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("env_id", ENV_IDS)
def test_every_catalog_id_records(env_id):
    env = gemx.make_functional(env_id)
    n_state = fused_state_arity(env)
    T, N = 12, 128
    roll = make_fused_record_rollout(env, T, N, interpret=True)
    z = jnp.zeros((1, 128), jnp.float32)
    out = roll(7, *([z] * n_state))
    assert {"reward", "done"} <= set(out)
    assert len(out) == len(roll.signals)
    for k, v in out.items():
        assert v.shape == (T, 1, 128), (env_id, k)
        assert np.all(np.isfinite(np.asarray(v, np.float64))), (env_id, k)
    # random actions on a fresh env: strictly non-positive WSE reward
    assert np.asarray(out["reward"]).sum() < 0.0, env_id


def test_fused_random_mode_supports_const_references():
    """Constant references (the standard controller-evaluation setup) ride
    the fused kernels as a degenerate Wiener (margins pinned, sigma~0):
    the recorded reference is exactly the constant every step and the
    reward recomputes against it."""
    env = gemx.make_functional(
        "Finite-CC-PermExDc-v0",
        reference_generator=rg.ConstReference("i", reference_value=0.3))
    ps = env.physical_system
    i_lim = float(np.asarray(ps.limits)[list(ps.state_names).index("i")])

    N, T = 256, 512
    zero = jnp.zeros((N // 128, 128), jnp.float32)
    roll = make_fused_record_rollout(env, T, N, chunk=8, interpret=True)
    out = {k: np.asarray(v) for k, v in roll(5, zero).items()}
    np.testing.assert_allclose(out["ref_i"], 0.3, rtol=1e-6)
    coef = _wse_coef(env, "i")
    ok = out["done"] < 0.5
    np.testing.assert_allclose(
        out["reward"][ok],
        -coef * np.abs(out["i"][ok] / i_lim - 0.3), rtol=1e-5, atol=1e-6)

    # the reducing kernel agrees on the mean reward at matched config
    red = make_fused_rollout(env, T, N, interpret=True)
    r_red = float(np.asarray(red(5, zero)[1]).sum()) / (N * T)
    assert abs(r_red - out["reward"].mean()) < 0.03


def test_fused_const_references_multi_ref():
    """Two const references (CC dq pair) through the universal sync kernel."""
    ref = rg.ReferenceSpec([rg.ConstReference("i_sd", reference_value=-0.1),
                            rg.ConstReference("i_sq", reference_value=0.4)])
    env = gemx.make_functional("Cont-CC-PMSM-v0", reference_generator=ref)
    N, T = 128, 256
    zero = jnp.zeros((1, 128), jnp.float32)
    roll = make_fused_record_rollout(env, T, N, interpret=True)
    out = {k: np.asarray(v) for k, v in roll(9, zero, zero, zero).items()}
    np.testing.assert_allclose(out["ref_i_sd"], -0.1, rtol=1e-6)
    np.testing.assert_allclose(out["ref_i_sq"], 0.4, rtol=1e-6)
