"""Golden-trace regression: the bit-reproducibility contract.

Counterpart of the reference's ``tests/integration_tests/test_integration.py``
(:19-105): a committed 2001-step closed-loop trace (cascade controller on
Cont-SC-PermExDc-v0, sinusoidal reference, seed 1337) must be reproduced
exactly, and a different seed must NOT reproduce it."""

import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_trace.npz")


@pytest.fixture(scope="module")
def golden():
    assert os.path.exists(GOLDEN), "run tests/make_golden_trace.py to create it"
    return np.load(GOLDEN)


def run(seed):
    import jax

    import gym_electric_motor_tpu as gemx
    from gym_electric_motor_tpu import references as rg
    from gym_electric_motor_tpu.controllers import GemController

    env = gemx.make_functional(
        "Cont-SC-PermExDc-v0",
        reference_generator=rg.SinusoidalReference(
            "omega", amplitude_range=(0.3, 0.3), offset_range=(0.4, 0.4),
            frequency_range=(2, 2), episode_lengths=(10000, 10001),
        ),
    )
    ctrl = GemController.make(env, "Cont-SC-PermExDc-v0")
    return ctrl.control_environment(env, 2001, key=jax.random.PRNGKey(seed))


def test_golden_trace_reproduced(golden):
    out = run(1337)
    np.testing.assert_allclose(np.asarray(out["states"], np.float32),
                               golden["states"], rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out["rewards"], np.float32),
                               golden["rewards"], rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(out["terminations"]),
                                  golden["terminations"])


def test_wrong_seed_differs(golden):
    out = run(1234)
    assert not np.allclose(np.asarray(out["states"], np.float32),
                           golden["states"], rtol=1e-6, atol=1e-7)
