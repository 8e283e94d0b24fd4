"""Reference-generator tests: episode structure, margins, clipping and
determinism, mirroring the distributional tests of the reference
(``tests/test_reference_generators/test_reference_generators.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_electric_motor_tpu import references as rg

STATE_NAMES = ["omega", "torque", "i", "u", "u_sup"]
LIMITS = np.array([400.0, 38.0, 210.0, 60.0, 60.0])
NOMINAL = np.array([300.0, 16.0, 97.0, 60.0, 60.0])
LOW = np.array([-1.0, -1.0, -1.0, -1.0, 0.0])
HIGH = np.ones(5)
TAU = 1e-4


def bind(spec):
    return spec.bind(STATE_NAMES, LIMITS, NOMINAL, LOW, HIGH, TAU)


def rollout(spec, key, n):
    def run(key):
        st, _, _ = spec.reset(key)

        def body(st, _):
            st, v = spec.advance(st)
            return st, v

        _, vals = jax.lax.scan(body, st, None, length=n)
        return vals

    return np.asarray(jax.jit(run)(key))


def test_default_limit_margin_is_nominal_ratio():
    s = bind(rg.WienerProcessReference("i"))
    ratio = NOMINAL[2] / LIMITS[2]
    assert s.margin == pytest.approx((-ratio, ratio))


def test_explicit_limit_margin_tuple():
    s = bind(rg.WienerProcessReference("i", limit_margin=(0, 0.8)))
    assert s.margin == pytest.approx((0.0, 0.8))


def test_wiener_respects_margin_and_moves():
    s = bind(rg.WienerProcessReference("i", sigma_range=(1e-2, 1e-1)))
    vals = rollout(s, jax.random.PRNGKey(0), 600)
    assert vals.min() >= s.margin[0] - 1e-6
    assert vals.max() <= s.margin[1] + 1e-6
    assert np.std(np.diff(vals)) > 0.0


def test_waveforms_respect_margin():
    for kind in (rg.SinusoidalReference, rg.StepReference, rg.TriangularReference,
                 rg.SawtoothReference):
        s = bind(kind("omega", frequency_range=(10, 100)))
        vals = rollout(s, jax.random.PRNGKey(1), 400)
        assert vals.min() >= s.margin[0] - 1e-5, kind
        assert vals.max() <= s.margin[1] + 1e-5, kind
        assert vals.std() > 1e-4, kind


def test_sinusoid_is_sinusoidal():
    s = bind(rg.SinusoidalReference("omega", amplitude_range=(0.3, 0.3),
                                    offset_range=(0.0, 0.0), frequency_range=(50, 50),
                                    episode_lengths=(10000, 10001)))
    # 50 Hz at tau=1e-4 -> 200 steps/period; 400 steps = exactly 2 periods
    vals = rollout(s, jax.random.PRNGKey(2), 400)
    assert abs(vals.max() - 0.3) < 1e-2
    assert abs(vals.mean()) < 2e-2


def test_const_reference():
    s = bind(rg.ConstReference("omega", reference_value=0.4))
    vals = rollout(s, jax.random.PRNGKey(3), 50)
    assert np.all(vals == pytest.approx(0.4))


def test_subepisode_regeneration():
    s = bind(rg.StepReference("omega", episode_lengths=(5, 6), frequency_range=(1, 2)))

    def run(key):
        st, _, _ = s.reset(key)

        def body(st, _):
            st, _v = s.advance(st)
            return st, st["p"]

        _, ps = jax.lax.scan(body, st, None, length=40)
        return ps

    ps = np.asarray(jax.jit(run)(jax.random.PRNGKey(4)))
    # with sub-episodes of length 5-6, 40 steps must span several
    # re-randomizations of the waveform parameters
    assert len({tuple(np.round(row, 6)) for row in ps}) >= 2


def test_determinism_same_key():
    s = bind(rg.WienerProcessReference("i"))
    v1 = rollout(s, jax.random.PRNGKey(7), 100)
    v2 = rollout(s, jax.random.PRNGKey(7), 100)
    np.testing.assert_array_equal(v1, v2)
    v3 = rollout(s, jax.random.PRNGKey(8), 100)
    assert not np.array_equal(v1, v3)


def test_composite_reference_spec():
    spec = rg.ReferenceSpec([
        rg.WienerProcessReference("i"),
        rg.SinusoidalReference("omega"),
    ])
    bound = spec.bind(STATE_NAMES, LIMITS, NOMINAL, LOW, HIGH, TAU)
    assert bound.reference_names == ["i", "omega"]
    mask = bound.referenced_states()
    assert mask[0] and mask[2] and not mask[1]
    states, ref_array, obs = bound.reset(jax.random.PRNGKey(0))
    assert ref_array.shape == (5,)
    assert obs.shape == (2,)
    states, obs2 = bound.advance(states)
    assert obs2.shape == (2,)
    # scatter positions: ref_array holds i at index 2, omega at index 0
    vals = bound.current_values(states)
    arr = bound.to_reference_array(vals)
    assert float(arr[1]) == 0.0 and float(arr[3]) == 0.0
