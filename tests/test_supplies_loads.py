"""Voltage-supply and mechanical-load unit tests (counterparts of the
reference's tests/test_physical_systems/test_voltage_supplies.py and
test_mechanical_loads.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu.models import loads as ld
from gym_electric_motor_tpu.models import supplies as sp


def test_ideal_supply():
    s = sp.ideal_voltage_supply(400.0)
    u0, st = s.reset(s.sp(), jax.random.PRNGKey(0))
    assert float(u0[0]) == 400.0
    u, st = s.get_voltage(s.sp(), st, jnp.asarray(0.5), jnp.asarray(10.0))
    assert float(u[0]) == 400.0
    assert s.supply_range == (400.0, 400.0)


def test_rc_supply_discharges_under_load():
    """RC supply: voltage sags under positive supply current and recovers
    (voltage_supplies.py:75-123)."""
    s = sp.rc_voltage_supply(400.0, {"R": 1.0, "C": 1e-3})
    params = s.sp()
    u, st = s.reset(params, jax.random.PRNGKey(0))
    t = 0.0
    for _ in range(100):
        t += 1e-4
        u, st = s.get_voltage(params, st, jnp.asarray(t), jnp.asarray(50.0))
    sagged = float(u[0])
    assert sagged < 400.0
    for _ in range(300):
        t += 1e-4
        u, st = s.get_voltage(params, st, jnp.asarray(t), jnp.asarray(0.0))
    assert float(u[0]) > sagged  # recovers toward u_0


def test_rc_supply_absolute_time_semantics():
    """A second call at the same t must be a no-op (matches the reference's
    internal solver integrating to absolute t)."""
    s = sp.rc_voltage_supply(400.0)
    params = s.sp()
    _, st = s.reset(params, jax.random.PRNGKey(0))
    u1, st1 = s.get_voltage(params, st, jnp.asarray(1e-4), jnp.asarray(30.0))
    u2, st2 = s.get_voltage(params, st1, jnp.asarray(1e-4), jnp.asarray(30.0))
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2))


@pytest.mark.parametrize("factory,n_phase", [(sp.ac_1_phase_supply, 1),
                                             (sp.ac_3_phase_supply, 3)])
def test_ac_supplies(factory, n_phase):
    s = factory(230.0 if n_phase == 1 else 400.0, {"frequency": 50.0})
    params = s.sp()
    u0, st = s.reset(params, jax.random.PRNGKey(1))
    assert u0.shape == (n_phase,)
    max_amp = s.supply_range[1]
    us = []
    for k in range(400):
        u, st = s.get_voltage(params, st, jnp.asarray(k * 1e-4), jnp.asarray(0.0))
        us.append(np.asarray(u))
    us = np.array(us)
    assert us.max() <= max_amp + 1e-3
    # one 50 Hz period over 200 steps: amplitude reached
    assert us.max() > 0.95 * max_amp
    if n_phase == 3:
        # phases sum to ~0
        np.testing.assert_allclose(us.sum(axis=1), 0.0, atol=1e-3 * max_amp)


def test_ac_supply_random_phase_per_reset():
    s = sp.ac_1_phase_supply(230.0)
    params = s.sp()
    u1, _ = s.reset(params, jax.random.PRNGKey(1))
    u2, _ = s.reset(params, jax.random.PRNGKey(2))
    assert abs(float(u1[0]) - float(u2[0])) > 1e-3  # random phase


def test_polynomial_static_load_torque_balance():
    """PolynomialStaticLoad: d omega/dt = (T - T_L(omega)) / J with the
    zero-crossing linearization (polynomial_static_load.py:87-107)."""
    load = ld.polynomial_static_load(dict(a=0.5, b=0.2, c=0.1, j_load=1e-3))
    lp = load.lp(j_rotor=1e-3)
    omega = jnp.asarray([10.0])
    t_load = 0.5 + 0.2 * 10.0 + 0.1 * 100.0  # a + b*w + c*w^2
    d = load.ode(lp, 0.0, omega, jnp.asarray(t_load))
    np.testing.assert_allclose(float(d[0]), 0.0, atol=1e-4)  # equilibrium
    d2 = load.ode(lp, 0.0, omega, jnp.asarray(t_load + 1.0))
    np.testing.assert_allclose(float(d2[0]), 1.0 / 2e-3, rtol=1e-5)
    # near omega=0 the constant term is linearized, not sign-discontinuous
    d_small_pos = float(load.ode(lp, 0.0, jnp.asarray([1e-8]), jnp.asarray(0.0))[0])
    d_small_neg = float(load.ode(lp, 0.0, jnp.asarray([-1e-8]), jnp.asarray(0.0))[0])
    assert abs(d_small_pos + d_small_neg) < 1e-2  # antisymmetric, no jump


def test_constant_speed_load():
    load = ld.constant_speed_load(omega_fixed=120.0)
    lp = load.lp(j_rotor=1e-3)
    d = load.ode(lp, 0.0, jnp.asarray([120.0]), jnp.asarray(50.0))
    assert float(d[0]) == 0.0
    assert load.initializer["states"]["omega"] == 120.0


def test_external_speed_load_tracks_profile():
    profile = lambda t: 100.0 * jnp.sin(2 * jnp.pi * 5.0 * t)
    load = ld.external_speed_load(profile, tau=1e-4)
    lp = load.lp(j_rotor=1e-3)
    omega = jnp.asarray([0.0])
    t = 0.0
    for _ in range(2000):
        d = load.ode(lp, jnp.asarray(t), omega, jnp.asarray(0.0))
        omega = omega + 1e-4 * d
        t += 1e-4
    expect = float(profile(jnp.asarray(t)))
    np.testing.assert_allclose(float(omega[0]), expect, atol=2.0)


def test_ou_load_in_env():
    """OrnsteinUhlenbeckLoad consumes the per-step noise sample."""
    env = gemx.make_functional(
        "Cont-CC-PermExDc-v0", load=ld.ornstein_uhlenbeck_load(sigma=10.0, tau=1e-4)
    )
    assert env.physical_system.load.needs_noise
    state, obs = env.reset(jax.random.PRNGKey(0))
    oms = []
    for _ in range(50):
        state, (s, r), rew, term = env.step(state, jnp.asarray([0.0]))
        oms.append(float(s[0]))
    assert np.std(np.diff(oms)) > 0  # the speed random-walks


def test_dq_control_space():
    """SynchronousMotorSystem(control_space='dq') exposes a 2-dim dq action
    (physical_systems.py:470-485)."""
    env = gemx.make_functional("Cont-CC-PMSM-v0", control_space="dq")
    assert env.action_space.shape == (2,)
    state, obs = env.reset(jax.random.PRNGKey(0))
    state, (s, r), rew, term = env.step(state, jnp.asarray([0.1, -0.2]))
    assert np.all(np.isfinite(np.asarray(s)))
