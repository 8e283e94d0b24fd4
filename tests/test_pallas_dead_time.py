"""Fused DeadTimeProcessor: the action-delay wrapper runs INSIDE the
family kernels (pallas_common._wrap_dead_time — the reference's deque
becomes steps x action-planes of carried state prepended to the bridge
planes; dead_time_processor.py:9-88).

Buffer-mode parity vs the XLA wrapper path is the validation: identical
action sequences through the fused kernel and through the wrapped env
must produce the same trajectories (standard fused-vs-XLA float
tolerance).  The delayed action is observable: the first ``steps``
control cycles apply the zero action, so trajectories with different
delays measurably diverge (asserted too — a no-op delay would pass a
pure parity check against an equally-broken oracle only if both dropped
the wrapper, which the XLA path demonstrably does not).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu import references as rg
from gym_electric_motor_tpu.ops.pallas_record import make_fused_record_rollout
from gym_electric_motor_tpu.ops.pallas_rollout import make_fused_rollout
from gym_electric_motor_tpu.wrappers import DeadTimeProcessor

T, N = 40, 128


def _ode_of(state):
    ph = state.phys
    while not hasattr(ph, "ode_state"):
        ph = ph.inner
    return np.asarray(ph.ode_state)


def _xla_states(env, actions_env):
    keys = jax.random.split(jax.random.PRNGKey(0), N)
    state, _ = jax.jit(jax.vmap(env.reset))(keys)
    step = jax.jit(jax.vmap(env.step))
    traj = []
    for t in range(T):
        state, _o, _r, _te = step(state, jnp.asarray(actions_env[t]))
        traj.append(_ode_of(state))
    return np.stack(traj)


@pytest.mark.parametrize("steps", [1, 2])
def test_dead_time_permex_finite_buffer_parity(steps):
    env = gemx.make_functional(
        "Finite-CC-PermExDc-v0",
        physical_system_wrappers=(DeadTimeProcessor(steps=steps),),
        reference_generator=rg.ConstReference("i", 0.0))
    rng = np.random.default_rng(1)
    acts = rng.integers(0, 4, size=(T, 1, 128)).astype(np.int32)
    roll = make_fused_record_rollout(env, T, N, action_mode="buffer",
                                     interpret=True)
    out = roll(jnp.zeros((1, 128), jnp.float32), jnp.asarray(acts))
    ode = _xla_states(env, acts.reshape(T, N))
    got = np.asarray(out["i"]).reshape(T, N)
    np.testing.assert_allclose(got, ode[:, :, 1], rtol=1e-4, atol=1e-3)
    # the delay is real: an undelayed env fed the same actions diverges
    # measurably (the XLA oracle above carries the real wrapper, so the
    # parity check alone already proves the kernel delays — this guards
    # against BOTH paths silently dropping the wrapper)
    env0 = gemx.make_functional(
        "Finite-CC-PermExDc-v0",
        reference_generator=rg.ConstReference("i", 0.0))
    roll0 = make_fused_record_rollout(env0, T, N, action_mode="buffer",
                                      interpret=True)
    out0 = roll0(jnp.zeros((1, 128), jnp.float32), jnp.asarray(acts))
    undelayed = np.asarray(out0["i"]).reshape(T, N)
    assert np.abs(got - undelayed).max() > 1.0


def test_dead_time_pmsm_finite_buffer_parity():
    env = gemx.make_functional(
        "Finite-CC-PMSM-v0",
        physical_system_wrappers=(DeadTimeProcessor(steps=1),))
    rng = np.random.default_rng(2)
    acts = rng.integers(0, 8, size=(T, 1, 128)).astype(np.int32)
    roll = make_fused_record_rollout(env, T, N, action_mode="buffer",
                                     interpret=True)
    z = jnp.zeros((1, 128), jnp.float32)
    out = roll(z, z, z, jnp.asarray(acts))
    ode = _xla_states(env, acts.reshape(T, N))
    for nm, c in (("i_sd", 1), ("i_sq", 2)):
        np.testing.assert_allclose(np.asarray(out[nm]).reshape(T, N),
                                   ode[:, :, c], rtol=1e-4, atol=1e-3)


def test_dead_time_cont_pmsm_float_planes():
    """Continuous actions ride float32 delay planes (bridge_dtypes)."""
    env = gemx.make_functional(
        "Cont-CC-PMSM-v0",
        physical_system_wrappers=(DeadTimeProcessor(steps=1),))
    rng = np.random.default_rng(3)
    acts = rng.uniform(-1, 1, size=(T, 3, 1, 128)).astype(np.float32)
    roll = make_fused_record_rollout(env, T, N, action_mode="buffer",
                                     interpret=True)
    z = jnp.zeros((1, 128), jnp.float32)
    out = roll(z, z, z, jnp.asarray(acts))
    ode = _xla_states(env, acts.reshape(T, 3, N).transpose(0, 2, 1))
    for nm, c in (("i_sd", 1), ("i_sq", 2)):
        np.testing.assert_allclose(np.asarray(out[nm]).reshape(T, N),
                                   ode[:, :, c], rtol=1e-4, atol=1e-3)


def test_dead_time_eesm_multihead_buffer_parity():
    env = gemx.make_functional(
        "Finite-CC-EESM-v0",
        physical_system_wrappers=(DeadTimeProcessor(steps=1),))
    rng = np.random.default_rng(4)
    a_b6 = rng.integers(0, 8, size=(T, 1, 1, 128))
    a_e = rng.integers(0, 4, size=(T, 1, 1, 128))
    acts = np.concatenate([a_b6, a_e], axis=1).astype(np.int32)
    roll = make_fused_record_rollout(env, T, N, action_mode="buffer",
                                     interpret=True)
    z = jnp.zeros((1, 128), jnp.float32)
    out = roll(z, z, z, z, jnp.asarray(acts))
    acts_env = acts.reshape(T, 2, N).transpose(0, 2, 1)
    ode = _xla_states(env, acts_env)
    for nm, c in (("i_sd", 1), ("i_sq", 2), ("i_e", 3)):
        np.testing.assert_allclose(np.asarray(out[nm]).reshape(T, N),
                                   ode[:, :, c], rtol=1e-4, atol=2e-3)


def test_dead_time_reducing_kernel_runs():
    """The reducing (random-mode) family kernel carries the delay planes
    through the fori carry and resets them on violation."""
    env = gemx.make_functional(
        "Finite-CC-PermExDc-v0",
        physical_system_wrappers=(DeadTimeProcessor(steps=1),))
    roll = make_fused_rollout(env, 64, N, interpret=True)
    out = roll(7, jnp.zeros((1, 128), jnp.float32))
    assert all(np.isfinite(np.asarray(o)).all() for o in out)


def test_state_noise_now_fused():
    """Round-4 update: plane-state sensor noise runs IN the fused
    kernels (tests/test_pallas_state_noise.py); only derived-quantity
    couplings still reject."""
    from gym_electric_motor_tpu.wrappers import StateNoiseProcessor

    env = gemx.make_functional(
        "Finite-CC-PermExDc-v0",
        physical_system_wrappers=(StateNoiseProcessor(states=("i",)),))
    make_fused_rollout(env, 32, N, interpret=True)
