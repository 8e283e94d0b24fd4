"""WeightedSumOfErrors and constraint tests against the reference formulas
(``reward_functions/weighted_sum_of_errors.py``, ``constraints.py``)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gym_electric_motor_tpu.constraints import (
    ConstraintMonitor,
    LimitConstraint,
    SquaredConstraint,
)
from gym_electric_motor_tpu.rewards import WeightedSumOfErrors

STATE_NAMES = ["omega", "torque", "i", "u", "u_sup"]
LOW = np.array([-1.0, -1.0, -1.0, -1.0, 0.0])
HIGH = np.ones(5)


def make_wse(**kw):
    ref_mask = np.array([False, False, True, False, False])
    return WeightedSumOfErrors(**kw).bind(STATE_NAMES, LOW, HIGH, ref_mask)


def test_wse_default_weights_on_referenced_states():
    wse = make_wse()
    state = jnp.array([0.1, 0.2, 0.5, 0.0, 1.0])
    ref = jnp.array([0.0, 0.0, 0.25, 0.0, 0.0])
    # only 'i' is referenced -> weight 1 on it; state span is 2 for i
    expected = -1.0 * (abs(0.5 - 0.25) / 2.0)
    np.testing.assert_allclose(float(wse.reward(state, ref)), expected, rtol=1e-6)


def test_wse_explicit_weights_and_power():
    wse = WeightedSumOfErrors(
        reward_weights=dict(omega=2.0, i=1.0), reward_power=2
    ).bind(STATE_NAMES, LOW, HIGH, np.zeros(5, bool))
    state = jnp.array([0.5, 0.0, -0.5, 0.0, 0.0])
    ref = jnp.zeros(5)
    expected = -(2.0 * (0.5 / 2) ** 2 + 1.0 * (0.5 / 2) ** 2)
    np.testing.assert_allclose(float(wse.reward(state, ref)), expected, rtol=1e-6)


def test_wse_violation_blend_and_default_violation_reward():
    wse = make_wse(gamma=0.9)
    # default violation reward = r_min / (1 - gamma)  (weighted_sum_of_errors.py:110-118)
    assert wse._violation_value == pytest.approx(-1.0 / 0.1)
    state = jnp.zeros(5)
    ref = jnp.zeros(5)
    r = wse.reward(state, ref, violation_degree=1.0)
    np.testing.assert_allclose(float(r), -10.0, rtol=1e-6)
    r_half = wse.reward(state, ref, violation_degree=0.5)
    np.testing.assert_allclose(float(r_half), -5.0, rtol=1e-6)


def test_wse_normed_weights_bias_positive():
    wse = WeightedSumOfErrors(
        reward_weights=dict(omega=3.0, i=1.0), normed_reward_weights=True, bias="positive"
    ).bind(STATE_NAMES, LOW, HIGH, np.zeros(5, bool))
    assert wse.reward_range == (0.0, 1.0)
    state = jnp.zeros(5)
    np.testing.assert_allclose(float(wse.reward(state, jnp.zeros(5))), 1.0, rtol=1e-6)


def test_limit_constraint():
    c = LimitConstraint(("i",)).bind(STATE_NAMES, HIGH * 10, HIGH)
    assert float(c(jnp.array([0.0, 0.0, 0.5, 0.0, 0.0]))) == 0.0
    assert float(c(jnp.array([0.0, 0.0, 1.5, 0.0, 0.0]))) == 1.0
    assert float(c(jnp.array([5.0, 0.0, 0.5, 0.0, 0.0]))) == 0.0  # omega not observed
    c_all = LimitConstraint("all_states").bind(STATE_NAMES, HIGH * 10, HIGH)
    assert float(c_all(jnp.array([5.0, 0.0, 0.5, 0.0, 0.0]))) == 1.0


def test_squared_constraint():
    names = ["i_sd", "i_sq"]
    c = SquaredConstraint(("i_sd", "i_sq")).bind(names, np.array([10.0, 10.0]), np.ones(2))
    assert float(c(jnp.array([0.5, 0.5]))) == 0.0  # 0.5 <= 1
    assert float(c(jnp.array([0.9, 0.9]))) == 1.0  # 1.62 > 1


def test_monitor_merge():
    names = ["a", "b"]
    lims = np.ones(2)
    m = ConstraintMonitor(
        constraints=(LimitConstraint(("a",)), LimitConstraint(("b",))),
        merge_violations="max",
    ).bind(names, lims, lims)
    assert float(m.check_constraints(jnp.array([2.0, 0.0]))) == 1.0
    m2 = ConstraintMonitor(
        constraints=(LimitConstraint(("a",)), LimitConstraint(("b",))),
        merge_violations="product",
    ).bind(names, lims, lims)
    # product merge: 1 - prod(1 - d) (core.py:826-833)
    assert float(m2.check_constraints(jnp.array([2.0, 0.0]))) == 1.0
    assert float(m2.check_constraints(jnp.array([0.0, 0.0]))) == 0.0
