"""Trajectory-recording fused rollout (make_fused_pmsm_record_rollout).

Unlike the reducing kernels (final state + metric sums), the recording
kernel streams every per-step signal to HBM through a sequential time-chunk
grid. Validation mirrors tests/test_pallas_rollout.py:

* buffer mode: the RECORDED per-step trajectory must match the XLA env
  step-for-step (not just the final state — this checks every chunk
  boundary handoff through the VMEM scratch state);
* random mode (interpret-mode xorshift bit source): internal consistency
  of the recorded transitions — rewards recompute exactly from the recorded
  state/references, done steps carry the violation reward, references
  respect the Wiener clip margin, and the reset rate agrees with the
  non-recording kernel at matched config.
"""

import jax
import jax.numpy as jnp
import numpy as np

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu import references as rg
from gym_electric_motor_tpu.ops.pallas_rollout import (
    make_fused_permex_record_rollout,
    make_fused_pmsm_record_rollout,
    make_fused_pmsm_rollout,
)


def test_record_buffer_trajectory_matches_xla_env():
    env = gemx.make_functional(
        "Finite-CC-PMSM-v0",
        reference_generator=rg.ReferenceSpec(
            [rg.ConstReference("i_sd", 0.0), rg.ConstReference("i_sq", 0.0)]
        ),
    )
    N, T, CHUNK = 128, 40, 8
    rng = np.random.default_rng(0)
    actions = rng.integers(0, 8, size=(T, 1, 128)).astype(np.int32)

    roll = make_fused_pmsm_record_rollout(
        env, T, N, chunk=CHUNK, action_mode="buffer", interpret=True)
    zero = jnp.zeros((1, 128), jnp.float32)
    isd_t, isq_t, eps_t = roll(zero, zero, zero, jnp.asarray(actions))
    assert isd_t.shape == (T, 1, 128)

    keys = jax.random.split(jax.random.PRNGKey(0), N)
    state, _ = jax.jit(jax.vmap(env.reset))(keys)
    step = jax.jit(jax.vmap(env.step))
    for t in range(T):
        state, _obs, _r, _term = step(state, jnp.asarray(actions[t].reshape(N)))
        ode = np.asarray(state.phys.ode_state)  # [omega, i_sd, i_sq, eps]
        np.testing.assert_allclose(np.asarray(isd_t[t]).reshape(N),
                                   ode[:, 1], rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(isq_t[t]).reshape(N),
                                   ode[:, 2], rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(eps_t[t]).reshape(N),
                                   np.mod(ode[:, 3], 2 * np.pi),
                                   rtol=1e-5, atol=1e-5)


def test_record_random_transitions_internally_consistent():
    env = gemx.make_functional("Finite-CC-PMSM-v0")
    ps = env.physical_system
    names = list(ps.state_names)
    i_lim = float(np.asarray(ps.limits)[names.index("i_sd")])
    margin = float(ps.nominal_state[names.index("i_sd")] / i_lim)

    N, T = 256, 512
    zero = jnp.zeros((N // 128, 128), jnp.float32)
    roll = make_fused_pmsm_record_rollout(env, T, N, chunk=8, interpret=True)
    isd, isq, eps, rd, rq, act, rew, done = map(
        np.asarray, roll(5, zero, zero, zero))
    # epsilon stays wrapped to [0, 2*pi)
    assert eps.min() >= 0.0 and eps.max() < 2 * np.pi

    # actions are B6 subactions 0..7
    assert act.min() >= 0 and act.max() <= 7
    # references obey the Wiener clip margin and actually move
    assert np.all(np.abs(rd) <= margin + 1e-6)
    assert np.all(np.abs(rq) <= margin + 1e-6)
    assert np.std(rd) > 1e-3

    # non-terminal steps: reward recomputes exactly from the recorded
    # post-step state (post-merge == pre-reset when not violated) and the
    # recorded references
    w = 0.5 / 2.0
    wse = -(w * np.abs(isd / i_lim - rd) + w * np.abs(isq / i_lim - rq))
    ok = done < 0.5
    np.testing.assert_allclose(rew[ok], wse[ok], rtol=1e-5, atol=1e-6)
    # terminal steps carry the violation reward and reset the state to 0
    bad = ~ok
    if bad.any():
        np.testing.assert_allclose(rew[bad], -10.0, rtol=1e-6)
        assert np.all(isd[bad] == 0.0) and np.all(isq[bad] == 0.0)


def test_record_seeds_give_decorrelated_streams():
    """Per-chunk reseeding strides by n_chunks, so launches with adjacent
    root seeds must not share per-chunk action streams (a plain seed+pid
    scheme would make seed=0 chunk c identical to seed=1 chunk c-1)."""
    env = gemx.make_functional("Finite-CC-PMSM-v0")
    N, T = 128, 64  # chunk=8 -> 8 chunks
    zero = jnp.zeros((1, 128), jnp.float32)
    roll = make_fused_pmsm_record_rollout(env, T, N, chunk=8, interpret=True)
    act0 = np.asarray(roll(0, zero, zero, zero)[5])
    act1 = np.asarray(roll(1, zero, zero, zero)[5])
    # compare chunk c of seed 0 against chunk c-1 of seed 1
    assert not np.array_equal(act0[8:], act1[:-8])
    assert not np.array_equal(act0, act1)


def test_record_default_chunk_handles_awkward_sizes():
    """The default chunk is clamped to n_steps and snapped to a divisor, so
    small-T / small-N builds must not trip the divisibility assert."""
    env = gemx.make_functional(
        "Finite-CC-PMSM-v0",
        reference_generator=rg.ReferenceSpec(
            [rg.ConstReference("i_sd", 0.0), rg.ConstReference("i_sq", 0.0)]
        ),
    )
    N, T = 128, 12  # default target chunk (1024) > T, and 8 does not divide 12
    actions = np.zeros((T, 1, 128), np.int32)
    roll = make_fused_pmsm_record_rollout(env, T, N, action_mode="buffer",
                                          interpret=True)
    zero = jnp.zeros((1, 128), jnp.float32)
    isd_t, _isq_t, _eps_t = roll(zero, zero, zero, jnp.asarray(actions))
    assert isd_t.shape == (T, 1, 128)
    assert np.isfinite(np.asarray(isd_t)).all()


def test_permex_record_buffer_trajectory_matches_xla_env():
    env = gemx.make_functional(
        "Finite-CC-PermExDc-v0",
        reference_generator=rg.ConstReference("i", 0.0),
    )
    N, T = 128, 48
    rng = np.random.default_rng(2)
    actions = rng.integers(0, 4, size=(T, 1, 128)).astype(np.int32)

    roll = make_fused_permex_record_rollout(
        env, T, N, chunk=8, action_mode="buffer", interpret=True)
    zero = jnp.zeros((1, 128), jnp.float32)
    i_t = roll(zero, jnp.asarray(actions))
    assert i_t.shape == (T, 1, 128)

    keys = jax.random.split(jax.random.PRNGKey(0), N)
    state, _ = jax.jit(jax.vmap(env.reset))(keys)
    step = jax.jit(jax.vmap(env.step))
    for t in range(T):
        state, _obs, _r, _term = step(state, jnp.asarray(actions[t].reshape(N)))
        i_ref = np.asarray(state.phys.ode_state)[:, 1]  # [omega, i]
        np.testing.assert_allclose(np.asarray(i_t[t]).reshape(N), i_ref,
                                   rtol=1e-5, atol=1e-4)


def test_permex_record_random_transitions_internally_consistent():
    env = gemx.make_functional("Finite-CC-PermExDc-v0")
    ps = env.physical_system
    names = list(ps.state_names)
    i_lim = float(np.asarray(ps.limits)[names.index("i")])
    margin = float(ps.nominal_state[names.index("i")] / i_lim)

    N, T = 256, 512
    zero = jnp.zeros((N // 128, 128), jnp.float32)
    roll = make_fused_permex_record_rollout(env, T, N, chunk=8,
                                            interpret=True)
    i, ref, act, rew, done = map(np.asarray, roll(9, zero))

    assert act.min() >= 0 and act.max() <= 3
    assert np.all(np.abs(ref) <= margin + 1e-6)
    assert np.std(ref) > 1e-3
    ok = done < 0.5
    np.testing.assert_allclose(
        rew[ok], -0.5 * np.abs(i[ok] / i_lim - ref[ok]),
        rtol=1e-5, atol=1e-6)
    bad = ~ok
    if bad.any():
        np.testing.assert_allclose(rew[bad], -10.0, rtol=1e-6)
        assert np.all(i[bad] == 0.0)


def test_record_reset_rate_matches_reducing_kernel():
    env = gemx.make_functional("Finite-CC-PMSM-v0")
    N, T = 256, 2048
    zero = jnp.zeros((N // 128, 128), jnp.float32)

    rec = make_fused_pmsm_record_rollout(env, T, N, chunk=8, interpret=True)
    done = np.asarray(rec(3, zero, zero, zero)[7])
    rate_rec = done.mean()

    red = make_fused_pmsm_rollout(env, T, N, interpret=True)
    terms = np.asarray(red(3, zero, zero, zero)[4])
    rate_red = terms.sum() / (N * T)

    # same config, different RNG streams: agree within 2x and both nonzero
    assert rate_rec > 0 and rate_red > 0
    assert 0.5 < (rate_rec / rate_red) < 2.0
