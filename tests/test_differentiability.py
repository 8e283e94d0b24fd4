"""End-to-end differentiability of the environment step.

No reference counterpart (scipy solvers are not differentiable): gradients
flow through the converter, ODE integration, reward and even multi-step
rollouts — enabling first-order MPC / policy optimization through the
physics."""

import jax
import jax.numpy as jnp
import numpy as np

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu import references as rg


def test_grad_reward_wrt_action():
    env = gemx.make_functional(
        "Cont-CC-PermExDc-v0",
        reference_generator=rg.ConstReference("i", reference_value=0.3),
    )
    state, obs = env.reset(jax.random.PRNGKey(0))

    def reward_of_action(a):
        _st, _obs, reward, _t = env.step(state, a)
        return reward

    g = jax.grad(reward_of_action)(jnp.asarray([0.1]))
    assert np.isfinite(float(g[0]))
    assert abs(float(g[0])) > 0  # increasing duty moves i toward/away from ref
    # finite-difference check
    eps = 1e-3
    r1 = float(reward_of_action(jnp.asarray([0.1 + eps])))
    r0 = float(reward_of_action(jnp.asarray([0.1 - eps])))
    np.testing.assert_allclose(float(g[0]), (r1 - r0) / (2 * eps), rtol=2e-2)


def test_grad_through_rollout():
    """Differentiate the summed tracking error through a 50-step rollout with
    a parameterized linear policy — gradient descent must reduce the loss."""
    env = gemx.make_functional(
        "Cont-CC-PermExDc-v0",
        reference_generator=rg.ConstReference("i", reference_value=0.4),
    )
    i_idx = env.state_names.index("i")

    def loss(gain):
        state, (obs, ref) = env.reset(jax.random.PRNGKey(1))

        def body(carry, _):
            state, obs, ref = carry
            action = gain * (ref - obs[i_idx:i_idx + 1])
            state, (obs, ref), _r, _t = env.step(state, action)
            return (state, obs, ref), (obs[i_idx] - 0.4) ** 2

        _, errs = jax.lax.scan(body, (state, obs, ref), None, length=50)
        return jnp.mean(errs)

    # the loss over the P-gain has its minimum near gain~1.  Beyond the
    # converter-saturation region the 50-step backprop is chaotic (as for any
    # long-horizon differentiable sim), so assert the well-behaved regime:
    grad_fn = jax.jit(jax.grad(loss))
    g_low = float(grad_fn(0.5))
    assert np.isfinite(g_low) and g_low < 0  # downhill toward the optimum
    # finite differences agree with backprop through all 50 steps
    eps = 1e-3
    fd = (float(loss(0.5 + eps)) - float(loss(0.5 - eps))) / (2 * eps)
    np.testing.assert_allclose(g_low, fd, rtol=5e-2)
    # and a short gradient descent improves the loss
    gain, lr = 0.5, 0.05
    l0 = float(loss(gain))
    for _ in range(25):
        g = float(grad_fn(gain))
        gain = gain - lr * np.clip(g, -2.0, 2.0)
    assert float(loss(gain)) < l0, (l0, float(loss(gain)), gain)
