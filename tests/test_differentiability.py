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


def test_grad_sysid_recovers_motor_params():
    """Differentiable system identification: backprop through a 120-step
    rollout recovers perturbed motor parameters (r_a, psi_e) by gradient
    descent on the trajectory error.  No reference counterpart — the
    reference's scipy solvers admit no parameter gradients; here the whole
    physics is reverse-mode differentiable via dynamic_params=True (motor
    parameters ride the state pytree, physical_systems.py:52-60)."""
    import optax

    env = gemx.make_functional("Cont-CC-PermExDc-v0", dynamic_params=True)
    state0, _ = env.reset(jax.random.PRNGKey(0))
    i_idx = env.state_names.index("i")
    T = 120
    # persistent sinusoid excitation (identifiability of r_a and psi_e)
    acts = 0.7 * jnp.sin(jnp.linspace(0.0, 6.0 * np.pi, T))[:, None]

    def rollout_i(theta):
        mp = dict(state0.phys.mp)
        mp["r_a"], mp["psi_e"] = jnp.exp(theta[0]), jnp.exp(theta[1])
        st = state0.replace(phys=state0.phys.replace(mp=mp))

        def body(s, a):
            s2, _obs, _r, _t = env.step(s, a)
            return s2, s2.system_state[i_idx]

        _, i_traj = jax.lax.scan(body, st, acts)
        return i_traj

    true = jnp.log(jnp.asarray(
        [state0.phys.mp["r_a"], state0.phys.mp["psi_e"]], jnp.float32))
    target = rollout_i(true)

    def loss(theta):
        return jnp.mean((rollout_i(theta) - target) ** 2)

    theta0 = true + jnp.asarray([0.3, -0.25], jnp.float32)  # ~±30% off
    opt = optax.adam(0.05)

    @jax.jit
    def fit(theta):
        def step_opt(carry, _):
            th, os = carry
            l, g = jax.value_and_grad(loss)(th)
            up, os = opt.update(g, os)
            return (optax.apply_updates(th, up), os), l

        (th, _), ls = jax.lax.scan(step_opt, (theta, opt.init(theta)),
                                   None, length=250)
        return th, ls

    theta_hat, ls = fit(theta0)
    assert float(ls[-1]) < 1e-4 * float(ls[0])  # loss collapsed
    rec = np.exp(np.asarray(theta_hat))
    tru = np.exp(np.asarray(true))
    np.testing.assert_allclose(rec, tru, rtol=0.02)
