"""Guard against device-resident closure constants in jitted entry points.

Round-1 post-mortem: the driver's `python bench.py` died with
FAILED_PRECONDITION because jit-tracing `reset` had to embed a constant that
lived on the TPU (spec dicts built eagerly with `jnp.asarray` at construction
time, `physical_systems.py` round-1 line 128).  Embedding such a constant
requires a device->host read-back at trace time — one tunnel hiccup kills the
whole program before a single step runs.

The invariant enforced here: tracing `reset` / `step_autoreset` must produce a
jaxpr whose constants are all host-side (numpy / python scalars), never
`jax.Array`.  Host constants embed from host memory with no device round-trip.
"""

import jax
import numpy as np
import pytest

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu.envs.catalog import ENV_IDS

# Full catalog sweep: cheap (trace-only, no compile) and this is exactly the
# failure that cost round 1 its recorded benchmark.
_FAMILIES = sorted(ENV_IDS)


def _device_consts(closed_jaxpr):
    return [c for c in closed_jaxpr.consts if isinstance(c, jax.Array)]


def _zero_action(space):
    kind = space.__class__.__name__
    if kind == "Discrete":
        return 0
    if kind == "MultiDiscrete":
        return np.zeros(len(space.nvec), np.int32)
    return np.zeros(space.shape, np.float32)


@pytest.mark.parametrize("env_id", _FAMILIES)
def test_no_device_constants_in_reset_and_step(env_id):
    env = gemx.make_functional(env_id)
    key = jax.random.PRNGKey(0)
    bad = _device_consts(jax.make_jaxpr(env.reset)(key))
    assert not bad, f"reset({env_id}) closes over device arrays: {bad}"

    state, _ = env.reset(key)
    action = _zero_action(env.action_space)
    bad = _device_consts(jax.make_jaxpr(env.step_autoreset)(state, action))
    assert not bad, f"step_autoreset({env_id}) closes over device arrays: {bad}"


def test_spec_dicts_stay_on_host():
    env = gemx.make_functional("Finite-CC-PMSM-v0")
    ps = env.physical_system
    for name, d in (("mp", ps.mp), ("lp", ps.lp), ("sp", ps.sp)):
        for k, v in d.items():
            assert not isinstance(v, jax.Array), f"{name}[{k}] is a device array"
