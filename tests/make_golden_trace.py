"""Regenerate the committed golden trace (tests/golden_trace.npz).

The counterpart of the reference's committed
``tests/integration_tests/ref_data.npz`` (test_integration.py:88-105): a
fixed-seed 2001-step closed-loop run of the auto-tuned cascade controller on
Cont-SC-PermExDc-v0 with a sinusoidal reference.  Run this script only when
an intentional behavior change invalidates the trace.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def generate():
    import jax

    jax.config.update("jax_platforms", "cpu")
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
    out = ctrl.control_environment(env, 2001, key=jax.random.PRNGKey(1337))
    return dict(
        states=np.asarray(out["states"], dtype=np.float32),
        references=np.asarray(out["references"], dtype=np.float32),
        rewards=np.asarray(out["rewards"], dtype=np.float32),
        terminations=np.asarray(out["terminations"]),
    )


if __name__ == "__main__":
    data = generate()
    path = os.path.join(os.path.dirname(__file__), "golden_trace.npz")
    np.savez_compressed(path, **data)
    print("wrote", path, {k: v.shape for k, v in data.items()})
