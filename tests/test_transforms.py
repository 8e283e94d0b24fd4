"""Clarke/Park transform unit tests.

Oracle: the fixed matrices of the reference's ``ThreePhaseMotor``
(``/root/reference/src/gym_electric_motor/physical_systems/electric_motors/
three_phase_motor.py:16-118``): t_23 = 2/3 [[1,-1/2,-1/2],[0,√3/2,-√3/2]],
t_32 = [[1,0],[-1/2,√3/2],[-1/2,-√3/2]], q(ε) = rotation by ε.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_electric_motor_tpu.ops import transforms as tf

T23 = 2.0 / 3.0 * np.array([[1.0, -0.5, -0.5], [0.0, np.sqrt(3) / 2, -np.sqrt(3) / 2]])
T32 = np.array([[1.0, 0.0], [-0.5, np.sqrt(3) / 2], [-0.5, -np.sqrt(3) / 2]])


def rot(eps):
    return np.array([[np.cos(eps), -np.sin(eps)], [np.sin(eps), np.cos(eps)]])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_abc_alphabeta_matches_matrices(seed):
    rng = np.random.default_rng(seed)
    abc = rng.normal(size=3)
    np.testing.assert_allclose(tf.abc_to_alphabeta(jnp.asarray(abc)), T23 @ abc, rtol=1e-6)
    ab = rng.normal(size=2)
    np.testing.assert_allclose(tf.alphabeta_to_abc(jnp.asarray(ab)), T32 @ ab, rtol=1e-6)


@pytest.mark.parametrize("eps", [0.0, 0.3, -2.5, np.pi])
def test_dq_rotations(eps):
    rng = np.random.default_rng(42)
    dq = rng.normal(size=2)
    # q(eps): dq -> alphabeta rotates by +eps (three_phase_motor.py:63-77)
    np.testing.assert_allclose(
        tf.dq_to_alphabeta(jnp.asarray(dq), jnp.asarray(eps)), rot(eps) @ dq, rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        tf.alphabeta_to_dq(jnp.asarray(dq), jnp.asarray(eps)), rot(-eps) @ dq, rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("eps", [0.0, 0.7, -1.1])
def test_roundtrips(eps):
    rng = np.random.default_rng(3)
    dq = jnp.asarray(rng.normal(size=2))
    eps = jnp.asarray(eps)
    back = tf.abc_to_dq(tf.dq_to_abc(dq, eps), eps)
    np.testing.assert_allclose(back, dq, rtol=1e-5, atol=1e-6)
    # abc roundtrip only preserves the zero-sum component
    abc = jnp.asarray(rng.normal(size=3))
    abc = abc - jnp.mean(abc)
    np.testing.assert_allclose(tf.alphabeta_to_abc(tf.abc_to_alphabeta(abc)), abc, rtol=1e-5, atol=1e-6)


def test_wrap_angle():
    eps = jnp.asarray([0.0, 3.5, -3.5, 2 * np.pi, 7.0, -7.0])
    wrapped = tf.wrap_angle(eps)
    assert np.all(np.asarray(wrapped) <= np.pi + 1e-6)
    assert np.all(np.asarray(wrapped) >= -np.pi - 1e-6)
    np.testing.assert_allclose(np.sin(np.asarray(wrapped)), np.sin(np.asarray(eps)), atol=1e-5)
    np.testing.assert_allclose(np.cos(np.asarray(wrapped)), np.cos(np.asarray(eps)), atol=1e-5)


def test_transforms_jit_and_vmap():
    eps = jnp.linspace(0, 2 * np.pi, 8)
    dq = jnp.ones((8, 2))
    out = jax.jit(jax.vmap(tf.dq_to_abc))(dq, eps)
    assert out.shape == (8, 3)
    assert not np.any(np.isnan(np.asarray(out)))
