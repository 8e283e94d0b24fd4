"""Domain randomization and random state initializers."""

import jax
import jax.numpy as jnp
import numpy as np

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu.models import motors as mt


def test_randomize_motor_parameters_batched():
    env = gemx.make_functional("Cont-CC-PermExDc-v0", dynamic_params=True)
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    state, _ = jax.jit(jax.vmap(env.reset))(keys)
    state = env.randomize_motor_parameters(
        state, jax.random.PRNGKey(9), spread=0.3, params=("r_a",)
    )
    r_a = np.asarray(state.phys.mp["r_a"])
    assert r_a.shape == (8,)
    assert len(np.unique(np.round(r_a, 6))) == 8
    assert np.all((r_a > 0.016 * 0.7) & (r_a < 0.016 * 1.3))
    # other params untouched
    np.testing.assert_allclose(np.asarray(state.phys.mp["psi_e"]), 0.165, rtol=1e-6)

    step = jax.jit(jax.vmap(env.step))
    for _ in range(100):
        state, (s, r), rew, term = step(state, jnp.full((8, 1), 0.5, jnp.float32))
    i = np.asarray(s[:, env.state_names.index("i")])
    assert len(np.unique(np.round(i, 5))) >= 6  # trajectories diverge per params


def test_params_sticky_across_autoreset():
    env = gemx.make_functional("Cont-CC-PermExDc-v0", dynamic_params=True)
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    state, _ = jax.jit(jax.vmap(env.reset))(keys)
    state = env.randomize_motor_parameters(state, jax.random.PRNGKey(2), spread=0.2)
    before = np.asarray(state.phys.mp["r_a"])
    step = jax.jit(jax.vmap(env.step_autoreset))
    for _ in range(300):  # long enough to hit violations/resets
        state, obs, rew, term = step(state, jnp.full((4, 1), 1.0, jnp.float32))
    np.testing.assert_array_equal(np.asarray(state.phys.mp["r_a"]), before)


def test_dynamic_params_required():
    import pytest

    env = gemx.make_functional("Cont-CC-PermExDc-v0")
    state, _ = env.reset(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="dynamic_params"):
        env.randomize_motor_parameters(state, jax.random.PRNGKey(1))


def test_random_uniform_initializer():
    motor = mt.permex_dc(motor_initializer={"random_init": "uniform"})
    env = gemx.make_functional("Cont-CC-PermExDc-v0", motor=motor)
    vals = []
    for seed in range(6):
        state, (s, r) = env.reset(jax.random.PRNGKey(seed))
        vals.append(float(s[env.state_names.index("i")]))
    assert len(set(np.round(vals, 6))) >= 5  # random initial currents
    assert all(abs(v) <= 1.0 for v in vals)


def test_truncnorm_initializer():
    motor = mt.permex_dc(motor_initializer={
        "random_init": "gaussian", "random_params": (0.0, 20.0)})
    env = gemx.make_functional("Cont-CC-PermExDc-v0", motor=motor)
    vals = [float(env.reset(jax.random.PRNGKey(s))[1][0][env.state_names.index("i")])
            for s in range(8)]
    assert len(set(np.round(vals, 6))) >= 6
    # bounded by the nominal-value interval
    assert all(abs(v) * 210.0 <= 97.0 + 1e-3 for v in vals)


def test_scim_random_flux_init():
    """Induction-motor random init orients the rotor flux by a random field
    angle (squirrel_cage_induction_motor.py:146-157)."""
    from gym_electric_motor_tpu.models import motors as mt2

    motor = mt2.scim(motor_initializer={"random_init": "uniform"})
    env = gemx.make_functional("Cont-CC-SCIM-v0", motor=motor)
    mp = env.physical_system.motor.parameter
    psi_max = mp["l_m"] * env.physical_system.motor.nominal.get("i_sd", 1.0)
    angles, mags = [], []
    for seed in range(12):
        state, _ = env.reset(jax.random.PRNGKey(seed))
        ode = np.asarray(state.phys.ode_state)
        psi = ode[3:5]  # [psi_ralpha, psi_rbeta] after 1 mech state + 2 currents
        angles.append(np.arctan2(psi[1], psi[0]))
        mags.append(np.hypot(*psi))
    assert max(mags) <= psi_max + 1e-6
    assert np.std(angles) > 0.5  # angles spread over the circle
    assert len(set(np.round(mags, 8))) > 8  # magnitudes random too
