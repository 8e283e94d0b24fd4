"""Fused Pallas rollout kernel tests.

The deterministic physics (buffer-action mode, run through the Pallas
interpreter on CPU) must match the XLA env path step-for-step; the full
stochastic kernel needs real TPU hardware and is exercised by bench.py.
"""

import jax
import jax.numpy as jnp
import numpy as np

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu import references as rg
from gym_electric_motor_tpu.ops.pallas_rollout import make_fused_pmsm_rollout


def test_fused_physics_matches_xla_env():
    env = gemx.make_functional(
        "Finite-CC-PMSM-v0",
        reference_generator=rg.ReferenceSpec(
            [rg.ConstReference("i_sd", 0.0), rg.ConstReference("i_sq", 0.0)]
        ),
    )
    N, T = 128, 40
    rng = np.random.default_rng(0)
    actions = rng.integers(0, 8, size=(T, 1, 128)).astype(np.int32)

    roll = make_fused_pmsm_rollout(env, T, N, action_mode="buffer", interpret=True)
    zero = jnp.zeros((1, 128), jnp.float32)
    i_sd_k, i_sq_k, eps_k, _r, _t = roll(zero, zero, zero, jnp.asarray(actions))

    keys = jax.random.split(jax.random.PRNGKey(0), N)
    state, _ = jax.jit(jax.vmap(env.reset))(keys)
    step = jax.jit(jax.vmap(env.step))
    for t in range(T):
        state, obs, r, term = step(state, jnp.asarray(actions[t].reshape(N)))
    ode = np.asarray(state.phys.ode_state)  # [omega, i_sd, i_sq, eps]

    np.testing.assert_allclose(np.asarray(i_sd_k).reshape(N), ode[:, 1],
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(i_sq_k).reshape(N), ode[:, 2],
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(eps_k).reshape(N),
                               np.mod(ode[:, 3], 2 * np.pi), rtol=1e-5, atol=1e-5)
