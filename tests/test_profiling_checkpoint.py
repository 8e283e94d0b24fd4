"""Profiling trace + checkpoint/resume helpers (SURVEY §5 aux subsystems)."""

import glob
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu.utils import profiling


def test_trace_writes_profile():
    env = gemx.make_functional("Cont-CC-PermExDc-v0")
    log_dir = tempfile.mkdtemp()
    with profiling.trace(log_dir):
        state, obs = env.reset(jax.random.PRNGKey(0))
        state, obs, r, t = jax.jit(env.step)(state, jnp.asarray([0.3]))
        jax.block_until_ready(r)
    files = glob.glob(os.path.join(log_dir, "**", "*"), recursive=True)
    assert any(os.path.isfile(f) for f in files), "no trace artifacts written"


def test_checkpoint_resume_bit_exact():
    """Save mid-rollout env state, keep stepping, restore, re-step: the
    resumed trajectory must match bit-for-bit (checkpoint/resume is a plain
    pytree round-trip because ALL state is explicit)."""
    env = gemx.make_functional("Cont-CC-PMSM-v0")
    step = jax.jit(env.step)
    a = jnp.asarray([0.2, -0.1, 0.05])
    state, _ = env.reset(jax.random.PRNGKey(0))
    for _ in range(20):
        state, obs, r, t = step(state, a)

    path = os.path.join(tempfile.mkdtemp(), "ckpt")
    profiling.save_checkpoint(path, state)

    cont_state, (cont_obs, _), cont_r, _ = step(state, a)

    restored = profiling.load_checkpoint(path, like=state)
    res_state, (res_obs, _), res_r, _ = step(restored, a)

    np.testing.assert_array_equal(np.asarray(cont_obs), np.asarray(res_obs))
    assert float(cont_r) == float(res_r)
