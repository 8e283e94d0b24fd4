"""Switched reluctance motor family — EXTENSION tests.

The reference only STUBS the SRM: ``envs/gym_srm/srm_finite_control_env
.py`` raises NotImplementedError on every method (documented here by
driving the stub).  This framework implements the full family: the
sinusoidal-inductance model (models/motors.py), asymmetric half-bridge
converters, 6 catalog ids, and the fused Pallas family
(ops/pallas_srm.py) riding every universal tier.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu import references as rg

T, N = 40, 128


def test_reference_id_partition():
    """The catalog keeps the reference's 54 ids separable from the 6 SRM
    extension ids (REFERENCE_MOTORS is the contract the interop and
    parity layers rely on)."""
    from gym_electric_motor_tpu.envs.catalog import (
        ENV_IDS, REFERENCE_MOTORS)

    ref_ids = [i for i in ENV_IDS if i.split("-")[2] in REFERENCE_MOTORS]
    assert len(ENV_IDS) == 60 and len(ref_ids) == 54
    assert all("SRM" not in i for i in ref_ids)
    assert sum("SRM" in i for i in ENV_IDS) == 6


def test_reference_stubs_srm():
    """Upstream SRM envs are unusable: every method raises."""
    import os
    import sys
    if not os.path.isdir("/root/reference/src"):
        pytest.skip("reference repo not mounted")
    if "/root/reference/src" not in sys.path:
        sys.path.insert(0, "/root/reference/src")
    from gym_electric_motor.envs.gym_srm.srm_finite_control_env import (
        SRMFiniteControlEnv)

    env = SRMFiniteControlEnv()
    with pytest.raises(NotImplementedError):
        env.reset()
    with pytest.raises(NotImplementedError):
        env.step(0)


def test_srm_torque_sign_follows_inductance_slope():
    """Reluctance torque: positive on the rising-inductance side
    (0 < eps < pi for phase a), negative on the falling side — the
    physical foundation of SRM commutation."""
    from gym_electric_motor_tpu.models.motors import (
        srm_torque, switched_reluctance_motor)

    m = switched_reluctance_motor()
    mp = m.mp()
    i = 10.0
    t_rising = float(srm_torque(mp, jnp.array([i, 0.0, 0.0, 0.5 * np.pi])))
    t_falling = float(srm_torque(mp, jnp.array([i, 0.0, 0.0,
                                                -0.5 * np.pi])))
    t_aligned = float(srm_torque(mp, jnp.array([i, 0.0, 0.0, np.pi])))
    assert t_rising > 0.0
    assert t_falling == -t_rising
    assert abs(t_aligned) < 1e-5          # zero slope at alignment
    # the quadratic current dependence (torque is current-sign-blind)
    t2 = float(srm_torque(mp, jnp.array([2 * i, 0.0, 0.0, 0.5 * np.pi])))
    np.testing.assert_allclose(t2, 4.0 * t_rising, rtol=1e-6)


def test_srm_unipolar_clamp_and_demagnetization():
    """Magnetize -> current rises; demagnetize -> current falls and
    CLAMPS at exactly zero (ideal freewheel diodes), never negative."""
    env = gemx.make_functional("Finite-CC-SRM-v0", constraints=())
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    state, _ = jax.jit(jax.vmap(env.reset))(keys)
    step = jax.jit(jax.vmap(env.step_autoreset))
    mag = jnp.tile(jnp.array([[1, 0, 0]]), (4, 1))
    dem = jnp.tile(jnp.array([[2, 0, 0]]), (4, 1))
    for _ in range(30):
        state, _o, _r, _te = step(state, mag)
    i_peak = float(np.asarray(state.phys.ode_state)[0, 1])
    assert i_peak > 1.0
    for _ in range(60):
        state, _o, _r, _te = step(state, dem)
        i_now = np.asarray(state.phys.ode_state)[:, 1]
        assert (i_now >= 0.0).all()        # never negative
    assert float(np.asarray(state.phys.ode_state)[0, 1]) == 0.0


def test_srm_commutation_accelerates():
    """Position-based commutation with a hysteresis current band
    (magnetize the phase whose inductance is rising while its current is
    below the band, freewheel above it, demagnetize on the falling side)
    produces sustained positive torque and spins up the SC env from
    standstill with ZERO violations — the SRM actually WORKS as a
    motor (measured: 0 -> ~50 rad/s in 60 ms)."""
    env = gemx.make_functional(
        "Finite-SC-SRM-v0",
        reference_generator=rg.ConstReference("omega", 0.5))
    names = list(env.state_names)
    i_eps = names.index("epsilon")
    i_om = names.index("omega")
    idx_i = jnp.array([names.index(n) for n in ("i_a", "i_b", "i_c")])
    w_lim = float(np.asarray(env.physical_system.limits)[i_om])

    def commutate(sys_state):
        eps = sys_state[:, i_eps] * np.pi
        i3 = sys_state[:, idx_i]          # normalized phase currents
        phis = jnp.array([0.0, 2 * np.pi / 3, 4 * np.pi / 3])
        s = jnp.sin(eps[:, None] - phis[None, :])
        want = s > 0.2                    # rising-inductance firing window
        a = jnp.where(want & (i3 < 0.5), 1,
                      jnp.where(want, 0, 2))
        return a.astype(jnp.int32)

    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    state, _ = jax.jit(jax.vmap(env.reset))(keys)
    step = jax.jit(jax.vmap(env.step_autoreset))

    @jax.jit
    def run(state):
        def body(carry, _):
            state = carry
            state, _o, r, te = step(state, commutate(state.system_state))
            return state, (r, te)

        return jax.lax.scan(body, state, None, length=3000)

    state, (rs, tes) = run(state)
    omega = np.asarray(state.system_state)[:, i_om] * w_lim
    assert (omega > 20.0).all(), omega    # accelerated from standstill
    assert np.asarray(tes).sum() == 0     # zero violations throughout


@pytest.mark.parametrize("eid,n_ch,finite", [
    ("Finite-CC-SRM-v0", 3, True),
    ("Cont-TC-SRM-v0", 3, False),
    ("Finite-SC-SRM-v0", 3, True),
], ids=["Finite-CC", "Cont-TC", "Finite-SC"])
def test_srm_fused_buffer_parity(eid, n_ch, finite):
    """The fused SRM kernel matches the XLA env step-for-step (buffer
    mode, deterministic physics) — states incl. the diode clamp and the
    epsilon wrap."""
    from gym_electric_motor_tpu.ops.pallas_rollout import (
        fused_state_arity, make_fused_rollout)

    ref = {"CC": "i_a", "TC": "torque", "SC": "omega"}[eid.split("-")[1]]
    env = gemx.make_functional(
        eid, reference_generator=rg.ConstReference(ref, 0.1))
    n_state = fused_state_arity(env)
    rng = np.random.default_rng(5)
    if finite:
        acts = rng.integers(0, 3, size=(T, 3, 1, 128)).astype(np.int32)
    else:
        acts = rng.uniform(-0.5, 0.5,
                           size=(T, 3, 1, 128)).astype(np.float32)
    roll = make_fused_rollout(env, T, N, action_mode="buffer",
                              interpret=True)
    z = jnp.zeros((1, 128), jnp.float32)
    out = roll(*([z] * n_state), jnp.asarray(acts))
    keys = jax.random.split(jax.random.PRNGKey(0), N)
    state, _ = jax.jit(jax.vmap(env.reset))(keys)
    step = jax.jit(jax.vmap(env.step_autoreset))
    for t in range(T):
        state, _o, _r, _te = step(state,
                                  jnp.asarray(acts[t].reshape(3, N).T))
    ode = np.asarray(state.phys.ode_state)
    off = 0 if env.physical_system.load.omega_fixed is None else 1
    for k in range(n_state):
        np.testing.assert_allclose(np.asarray(out[k]).reshape(N),
                                   ode[:, k + off], rtol=1e-4, atol=2e-3,
                                   err_msg=f"{eid} state {k}")


def test_srm_fused_random_and_trainer():
    """Random mode runs at the right reward scale, and the fused DQN
    trainer (universal policy kernel, 3x3x3 factorized heads) runs
    end-to-end on the SRM in interpret mode."""
    from gym_electric_motor_tpu.ops.pallas_rollout import (
        fused_state_arity, make_fused_rollout)
    from gym_electric_motor_tpu.parallel.sharded import (
        make_fused_dqn_trainer)

    env = gemx.make_functional("Finite-CC-SRM-v0")
    n_state = fused_state_arity(env)
    roll = make_fused_rollout(env, 64, 256, interpret=True)
    z = jnp.zeros((2, 128), jnp.float32)
    out = roll(5, *([z] * n_state))
    assert all(np.isfinite(np.asarray(o)).all() for o in out)
    assert -1.0 < float(np.asarray(out[n_state]).mean()) / 64 < 0.0

    init_state, train = make_fused_dqn_trainer(
        env, hidden=16, horizon=16, n_envs=128, replay_slots=2,
        n_updates=2, mb_envs=8, interpret=True)
    carry, rs, ls = train(init_state(jax.random.PRNGKey(1)), 3, 2)
    assert np.isfinite(np.asarray(rs)).all()
    assert np.isfinite(np.asarray(ls)).all()
    # three int8 action columns (one per phase) land in the replay ring
    assert carry[4][2].shape[-1] == 3


def test_srm_fused_cascade_matches_control_environment():
    """The in-kernel SC commutation cascade (PI speed loop + single-pulse
    commutation + hysteresis regulation) matches control_environment on
    the mean reward EXACTLY with a const reference (zero violations,
    identical final omega)."""
    from gym_electric_motor_tpu.controllers import GemController
    from gym_electric_motor_tpu.ops.pallas_rollout import (
        fused_state_arity, make_fused_srm_cascade_rollout)

    env = gemx.make_functional(
        "Finite-SC-SRM-v0",
        reference_generator=rg.ConstReference("omega", 0.4))
    ctrl = GemController.make(env, "Finite-SC-SRM-v0")
    n_state = fused_state_arity(env)
    T2 = 3000
    roll = make_fused_srm_cascade_rollout(env, ctrl, T2, N, interpret=True)
    z = jnp.zeros((1, 128), jnp.float32)
    out = roll(5, *([z] * n_state))
    r_mean = float(np.asarray(out[n_state]).mean()) / T2
    assert float(np.asarray(out[n_state + 1]).sum()) == 0.0
    oc = ctrl.control_environment(env, T2)
    np.testing.assert_allclose(r_mean,
                               float(np.asarray(oc["rewards"]).mean()),
                               atol=2e-5)
    om_kernel = float(np.asarray(out[0]).reshape(N)[0])
    om_xla = float(np.asarray(oc["states"])[-1, 0] * ctrl.w_lim)
    np.testing.assert_allclose(om_kernel, om_xla, rtol=1e-4)


def test_srm_saturation_model():
    """Opt-in magnetic saturation (motor_parameter={'psi_s': ...}): the
    exponential flux model's coenergy torque saturates with current
    (T(2i) < 4 T(i)), recovers the linear model exactly as i -> 0, and
    the default (psi_s absent) stays bit-identical linear."""
    from gym_electric_motor_tpu.models.motors import (
        srm_torque, switched_reluctance_motor)

    m_lin = switched_reluctance_motor()
    assert "psi_s" not in m_lin.parameter
    m_sat = switched_reluctance_motor(motor_parameter={"psi_s": 1.2})
    mpl, mps = m_lin.mp(), m_sat.mp()

    def tq(mp, i):
        return float(srm_torque(mp, jnp.array([i, 0.0, 0.0,
                                               0.5 * np.pi])))

    # quadratic below saturation, sub-quadratic within
    assert tq(mps, 10.0) < 4.0 * tq(mps, 5.0) < 4.0 * tq(mpl, 5.0)
    # small-current limit recovers the linear torque (i = 0.5 A keeps
    # the float32 coenergy cancellation (1-e) - x e well above eps;
    # below ~0.1 A the torque itself is physically negligible ~1e-5 Nm)
    np.testing.assert_allclose(tq(mps, 0.5), tq(mpl, 0.5), rtol=2e-2)
    # deep saturation (psi_s = 0.4): torque grows far sub-quadratically
    mpd = switched_reluctance_motor(
        motor_parameter={"psi_s": 0.4}).mp()
    assert tq(mpd, 20.0) / tq(mpd, 10.0) < 2.6


def test_srm_saturation_fused_parity():
    """The saturating flux model runs in the fused kernel too —
    buffer-mode parity vs the XLA env (both the fixed-speed stage-
    rotation path and the mech per-stage-sincos path exercise the
    exp(-i L / psi_s) incremental factor)."""
    from gym_electric_motor_tpu.ops.pallas_rollout import (
        fused_state_arity, make_fused_rollout)

    for eid, finite in (("Finite-TC-SRM-v0", True),
                        ("Cont-SC-SRM-v0", False)):
        ref = "torque" if "TC" in eid else "omega"
        env = gemx.make_functional(
            eid, motor={"motor_parameter": {"psi_s": 1.2}},
            reference_generator=rg.ConstReference(ref, 0.1))
        n_state = fused_state_arity(env)
        rng = np.random.default_rng(5)
        if finite:
            acts = rng.integers(0, 3, size=(T, 3, 1, 128)).astype(np.int32)
        else:
            acts = rng.uniform(-0.5, 0.5,
                               size=(T, 3, 1, 128)).astype(np.float32)
        roll = make_fused_rollout(env, T, N, action_mode="buffer",
                                  interpret=True)
        z = jnp.zeros((1, 128), jnp.float32)
        out = roll(*([z] * n_state), jnp.asarray(acts))
        keys = jax.random.split(jax.random.PRNGKey(0), N)
        state, _ = jax.jit(jax.vmap(env.reset))(keys)
        step = jax.jit(jax.vmap(env.step_autoreset))
        for t in range(T):
            state, _o, _r, _te = step(
                state, jnp.asarray(acts[t].reshape(3, N).T))
        ode = np.asarray(state.phys.ode_state)
        off = 0 if env.physical_system.load.omega_fixed is None else 1
        for k in range(n_state):
            np.testing.assert_allclose(np.asarray(out[k]).reshape(N),
                                       ode[:, k + off], rtol=1e-4,
                                       atol=2e-3,
                                       err_msg=f"{eid} state {k}")

@pytest.mark.parametrize("env_id,ref", [
    ("Finite-TC-SRM-v0", ("torque", 0.3)),
    ("Cont-TC-SRM-v0", ("torque", 0.3)),
    ("Cont-SC-SRM-v0", ("omega", 0.4)),
])
def test_srm_fused_cascade_tc_cont_matches_control_environment(env_id,
                                                               ref):
    """The TC (integral trim on the measured coenergy torque) and Cont
    (P duty + resistive feed-forward regulation) cascade variants run
    in-kernel and match control_environment on the mean reward with a
    const reference."""
    from gym_electric_motor_tpu.controllers import GemController
    from gym_electric_motor_tpu.ops.pallas_rollout import (
        fused_state_arity, make_fused_srm_cascade_rollout)

    env = gemx.make_functional(
        env_id, reference_generator=rg.ConstReference(*ref))
    ctrl = GemController.make(env, env_id)
    n_state = fused_state_arity(env)
    T2 = 2000
    roll = make_fused_srm_cascade_rollout(env, ctrl, T2, N,
                                          interpret=True)
    z = jnp.zeros((1, 128), jnp.float32)
    out = roll(5, *([z] * n_state))
    r_mean = float(np.asarray(out[n_state]).mean()) / T2
    assert float(np.asarray(out[n_state + 1]).sum()) == 0.0
    oc = ctrl.control_environment(env, T2)
    np.testing.assert_allclose(r_mean,
                               float(np.asarray(oc["rewards"]).mean()),
                               atol=5e-5)


def test_srm_fused_cascade_cc_matches_control_environment():
    """The CC variant (straight per-phase hysteresis regulation toward
    the three referenced currents) matches control_environment exactly
    with const references on all three phases."""
    from gym_electric_motor_tpu.controllers import GemController
    from gym_electric_motor_tpu.ops.pallas_rollout import (
        fused_state_arity, make_fused_srm_cascade_rollout)

    env = gemx.make_functional(
        "Finite-CC-SRM-v0",
        reference_generator=rg.ReferenceSpec([
            rg.ConstReference("i_a", 0.3),
            rg.ConstReference("i_b", 0.15),
            rg.ConstReference("i_c", 0.0)]))
    ctrl = GemController.make(env, "Finite-CC-SRM-v0")
    n_state = fused_state_arity(env)
    T2 = 2000
    roll = make_fused_srm_cascade_rollout(env, ctrl, T2, N,
                                          interpret=True)
    z = jnp.zeros((1, 128), jnp.float32)
    out = roll(5, *([z] * n_state))
    r_mean = float(np.asarray(out[n_state]).mean()) / T2
    assert float(np.asarray(out[n_state + 1]).sum()) == 0.0
    oc = ctrl.control_environment(env, T2)
    np.testing.assert_allclose(r_mean,
                               float(np.asarray(oc["rewards"]).mean()),
                               atol=2e-5)
