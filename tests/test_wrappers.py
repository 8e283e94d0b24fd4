"""Physical-system wrapper tests (counterparts of the reference's
``tests/test_physical_system_wrappers/``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu import wrappers as wr


def run_steps(env, actions, key=0):
    state, (s, r) = env.reset(jax.random.PRNGKey(key))
    out = [np.asarray(s)]
    for a in actions:
        state, (s, r), _rew, _t = env.step(state, jnp.asarray(a))
        out.append(np.asarray(s))
    return np.array(out)


def test_cos_sin_processor():
    env = gemx.make_functional(
        "Finite-CC-PMSM-v0",
        physical_system_wrappers=(wr.CosSinProcessor(angle="epsilon"),),
    )
    names = env.state_names
    assert names[-2:] == ["cos(epsilon)", "sin(epsilon)"]
    eps_idx = names.index("epsilon")
    traj = run_steps(env, [1, 5, 3, 6])
    # appended entries are cos/sin of the normalized angle * pi
    # (cos_sin_processor.py:87-100)
    np.testing.assert_allclose(traj[:, -2], np.cos(traj[:, eps_idx] * np.pi), atol=1e-5)
    np.testing.assert_allclose(traj[:, -1], np.sin(traj[:, eps_idx] * np.pi), atol=1e-5)


def test_cos_sin_remove_angle():
    env = gemx.make_functional(
        "Finite-CC-PMSM-v0",
        physical_system_wrappers=(wr.CosSinProcessor(angle="epsilon", remove_angle=True),),
    )
    assert "epsilon" not in env.state_names
    assert env.state_names[-2:] == ["cos(epsilon)", "sin(epsilon)"]
    traj = run_steps(env, [1, 5, 3])
    assert traj.shape[1] == len(env.state_names)
    np.testing.assert_allclose(
        traj[:, -2] ** 2 + traj[:, -1] ** 2, np.ones(len(traj)), atol=1e-5
    )


def test_current_sum_processor():
    env = gemx.make_functional(
        "Finite-CC-ShuntDc-v0",
        physical_system_wrappers=(wr.CurrentSumProcessor(("i_a", "i_e")),),
    )
    assert env.state_names[-1] == "i_sum"
    ia, ie = env.state_names.index("i_a"), env.state_names.index("i_e")
    traj = run_steps(env, [1, 2, 3, 0])
    np.testing.assert_allclose(traj[:, -1], traj[:, ia] + traj[:, ie], atol=1e-6)


def test_dead_time_processor():
    """Wrapped env with actions [a0, a1, ...] equals the plain env driven with
    [0, a0, a1, ...] (one-step delay, dead_time_processor.py:74-88)."""
    actions = [3, 1, 2, 0, 3, 2]
    env_d = gemx.make_functional(
        "Finite-CC-PermExDc-v0",
        physical_system_wrappers=(wr.DeadTimeProcessor(steps=1),),
    )
    env_p = gemx.make_functional("Finite-CC-PermExDc-v0")
    traj_d = run_steps(env_d, actions)
    traj_p = run_steps(env_p, [0] + actions[:-1])
    np.testing.assert_allclose(traj_d, traj_p, atol=1e-6)


def test_flux_observer_matches_reference_formula():
    env = gemx.make_functional(
        "Cont-CC-SCIM-v0",
        physical_system_wrappers=(wr.FluxObserver(),),
    )
    assert env.state_names[-2:] == ["psi_abs", "psi_angle"]
    mp = env.physical_system.motor.parameter
    l_m, l_r, r_r, p = mp["l_m"], mp["l_m"] + mp["l_sigr"], mp["r_r"], mp["p"]
    tau = env.tau
    limits = np.asarray(env.physical_system.limits)
    inner_limits = limits[:-2]
    i_idx = [env.state_names.index(n) for n in ("i_sa", "i_sb", "i_sc")]
    om_idx = env.state_names.index("omega")

    rng = np.random.default_rng(0)
    actions = [rng.uniform(-1, 1, size=3) for _ in range(25)]
    traj = run_steps(env, actions)

    # replicate flux_observer.py:93-109 in numpy on the recorded states
    t23 = 2.0 / 3.0 * np.array([[1, -0.5, -0.5], [0, np.sqrt(3) / 2, -np.sqrt(3) / 2]])
    psi = 0j
    for k in range(1, len(traj)):
        denorm = traj[k] * limits
        i_ab = t23 @ denorm[i_idx]
        omega = denorm[om_idx] * p
        delta = complex(i_ab[0], i_ab[1]) * r_r * l_m / l_r - psi * complex(r_r / l_r, -omega)
        psi += delta * tau
        np.testing.assert_allclose(traj[k, -2] * limits[-2], abs(psi), rtol=1e-4, atol=1e-7)
        np.testing.assert_allclose(traj[k, -1] * np.pi, np.angle(psi), rtol=1e-4, atol=1e-6)


def test_dq_to_abc_pmsm():
    """dq-action wrapper equals manual advance-angle transformation
    (dq_to_abc_action_processor.py:95-107)."""
    env_dq = gemx.make_functional(
        "Cont-CC-PMSM-v0",
        physical_system_wrappers=(wr.DqToAbcActionProcessor.make("PMSM"),),
    )
    env_abc = gemx.make_functional("Cont-CC-PMSM-v0")
    assert env_dq.action_space.shape == (2,)

    names = env_abc.state_names
    eps_idx, om_idx = names.index("epsilon"), names.index("omega")
    limits = np.asarray(env_abc.physical_system.limits)
    p = env_abc.physical_system.motor.parameter["p"]
    tau = env_abc.tau

    rng = np.random.default_rng(1)
    dq_actions = [rng.uniform(-1, 1, size=2) for _ in range(10)]

    # run wrapped
    traj_dq = run_steps(env_dq, dq_actions, key=3)

    # run plain with manually transformed actions
    state, (s, _) = env_abc.reset(jax.random.PRNGKey(3))
    traj_manual = [np.asarray(s)]
    for a in dq_actions:
        denorm = np.asarray(traj_manual[-1]) * limits
        adv = denorm[eps_idx] + 0.5 * tau * denorm[om_idx] * p
        abc = np.asarray(
            jnp.asarray(
                gemx.ops.transforms.dq_to_abc(jnp.asarray(a), jnp.asarray(adv, jnp.float32))
            )
        )
        state, (s, _), _r, _t = env_abc.step(state, jnp.asarray(abc))
        traj_manual.append(np.asarray(s))
    np.testing.assert_allclose(traj_dq, np.array(traj_manual), atol=1e-5)


def test_state_noise_processor():
    noisy = gemx.make_functional(
        "Cont-CC-PermExDc-v0",
        physical_system_wrappers=(
            wr.StateNoiseProcessor(("omega",), random_kwargs=dict(loc=0.0, scale=0.05)),
        ),
    )
    clean = gemx.make_functional("Cont-CC-PermExDc-v0")
    om = clean.state_names.index("omega")
    i_idx = clean.state_names.index("i")
    actions = [np.array([0.3])] * 30
    t_noisy = run_steps(noisy, actions, key=5)
    t_clean = run_steps(clean, actions, key=5)
    diff_om = t_noisy[:, om] - t_clean[:, om]
    # noise applied to omega only; other states untouched
    np.testing.assert_allclose(t_noisy[:, i_idx], t_clean[:, i_idx], atol=1e-6)
    assert 0.01 < np.std(diff_om) < 0.15
    # deterministic under the same key
    t_noisy2 = run_steps(noisy, actions, key=5)
    np.testing.assert_array_equal(t_noisy, t_noisy2)


def test_wrapper_stacking_and_vmap():
    env = gemx.make_functional(
        "Finite-CC-PMSM-v0",
        physical_system_wrappers=(
            wr.DeadTimeProcessor(steps=1),
            wr.CosSinProcessor(angle="epsilon"),
        ),
    )
    # DqToAbc advance angle grows with dead time beneath it
    venv = gemx.VectorEnv(env, n_envs=4)
    state, obs = venv.reset(jax.random.PRNGKey(0))
    assert obs[0].shape == (4, len(env.state_names))
    state, obs, r, t = venv.step(state, jnp.zeros((4,), jnp.int32))
    assert np.all(np.isfinite(np.asarray(r)))
