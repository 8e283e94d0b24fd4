"""SwitchedReferenceGenerator / ZeroReferenceGenerator tests
(counterparts of the reference's switched/zero generator tests)."""

import jax
import numpy as np

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu import references as rg

STATE_NAMES = ["omega", "torque", "i", "u", "u_sup"]
LIMITS = np.array([400.0, 38.0, 210.0, 60.0, 60.0])
NOMINAL = np.array([300.0, 16.0, 97.0, 60.0, 60.0])
LOW = np.array([-1.0, -1.0, -1.0, -1.0, 0.0])
HIGH = np.ones(5)


def bind(spec):
    return spec.bind(STATE_NAMES, LIMITS, NOMINAL, LOW, HIGH, 1e-4)


def scan_rollout(spec, key, n):
    def run(key):
        st, _, _ = spec.reset(key)

        def body(st, _):
            st, v = spec.advance(st)
            return st, (v, st["active"])

        _, (vals, actives) = jax.lax.scan(body, st, None, length=n)
        return vals, actives

    vals, actives = jax.jit(run)(key)
    return np.asarray(vals), np.asarray(actives)


def test_switched_switches_and_respects_margins():
    spec = bind(rg.SwitchedReference(
        [rg.ConstReference("i", reference_value=0.2),
         rg.SinusoidalReference("i", amplitude_range=(0.1, 0.1), offset_range=(0.3, 0.3),
                                frequency_range=(100, 100))],
        super_episode_length=(50, 60),
    ))
    vals, actives = scan_rollout(spec, jax.random.PRNGKey(0), 600)
    # both sub-generators must have been active at some point
    assert set(np.unique(actives)) == {0, 1}
    # values from const segments are exactly 0.2; sinusoid stays in [0.2, 0.4]
    assert np.all(vals >= 0.2 - 1e-5) and np.all(vals <= 0.45)
    # switching cadence ~50-60 steps
    switches = np.nonzero(np.diff(actives))[0]
    if len(switches) > 1:
        gaps = np.diff(switches)
        assert gaps.min() >= 40


def test_switched_deterministic():
    spec = bind(rg.SwitchedReference(
        [rg.WienerProcessReference("i"), rg.StepReference("i")],
        super_episode_length=(30, 40),
    ))
    v1, a1 = scan_rollout(spec, jax.random.PRNGKey(3), 200)
    v2, a2 = scan_rollout(spec, jax.random.PRNGKey(3), 200)
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_array_equal(a1, a2)


def test_switched_in_env():
    env = gemx.make_functional(
        "Finite-CC-PermExDc-v0",
        reference_generator=rg.SwitchedReference(
            [rg.WienerProcessReference("i"), rg.SinusoidalReference("i")],
            super_episode_length=(20, 30),
        ),
    )
    state, (s, r) = env.reset(jax.random.PRNGKey(0))
    for k in range(30):
        state, (s, r), rew, term = env.step(state, jax.numpy.asarray(k % 4))
        assert np.isfinite(float(rew))
    assert env.reference_names == ["i"]


def test_zero_reference_generator():
    env = gemx.make_functional(
        "Cont-CC-PermExDc-v0", reference_generator=rg.ZeroReferenceGenerator()
    )
    state, (s, r) = env.reset(jax.random.PRNGKey(0))
    assert np.asarray(r).shape == (0,)
    state, (s, r), rew, term = env.step(state, jax.numpy.asarray([0.3]))
    assert np.asarray(r).shape == (0,)
    assert np.isfinite(float(rew))
    assert env.reference_names == []
