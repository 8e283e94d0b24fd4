"""Differentiable system identification of a PMSM through the simulator.

The whole drive physics (converter -> dq ODE -> Park/Clarke transforms) is
reverse-mode differentiable, so motor parameters can be recovered by
gradient descent on the trajectory error — no feature engineering, no
linear-regression setup, just ``jax.grad`` through a 200-step rollout.
The reference cannot do this: its scipy solvers (solvers.py:139-184)
admit no parameter gradients.

Recipe:
1. build the env with ``dynamic_params=True`` — the motor parameters ride
   the state pytree (physical_systems.py:52-60) instead of being baked
   into the compiled program;
2. roll out a persistently-exciting abc voltage sequence under the TRUE
   parameters -> measured i_sd/i_sq trajectory;
3. perturb (r_s, l_d, l_q, psi_p) by up to +-40%, then Adam-descend the
   mean-squared trajectory error in log-parameter space (positivity +
   scale-free steps for parameters spanning 0.0004 .. 0.07).

Typical result: all four parameters recover to <1% in ~400 iterations
(a few seconds, whole fit is one jitted scan).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

import gym_electric_motor_tpu as gemx

PARAMS = ("r_s", "l_d", "l_q", "psi_p")


def make_rollout(env, state0, actions, idx):
    """i_dq trajectory under candidate log-parameters theta."""

    def rollout(theta):
        mp = dict(state0.phys.mp)
        for name, th in zip(PARAMS, theta):
            mp[name] = jnp.exp(th)
        st = state0.replace(phys=state0.phys.replace(mp=mp))

        def body(s, a):
            s2, _obs, _r, _t = env.step(s, a)
            return s2, s2.system_state[idx]

        _, traj = jax.lax.scan(body, st, actions)
        return traj

    return rollout


def run(iters=400, n_steps=200, verbose=True):
    env = gemx.make_functional("Cont-CC-PMSM-v0", dynamic_params=True)
    state0, _ = env.reset(jax.random.PRNGKey(0))
    names = env.state_names
    idx = jnp.asarray([names.index("i_sd"), names.index("i_sq")])

    # persistently-exciting abc duty cycles: mixed-frequency sinusoids
    T = n_steps
    t = jnp.linspace(0.0, 1.0, T)[:, None]
    ph = jnp.asarray([0.0, 2.09, 4.19])
    actions = 0.5 * jnp.sin(2 * np.pi * 23.0 * t + ph) \
        + 0.3 * jnp.sin(2 * np.pi * 7.0 * t + 1.0 + ph)

    rollout = make_rollout(env, state0, actions, idx)
    true = jnp.log(jnp.asarray([float(state0.phys.mp[n]) for n in PARAMS],
                               jnp.float32))
    target = rollout(true)

    def loss(theta):
        return jnp.mean((rollout(theta) - target) ** 2)

    rng = np.random.default_rng(1)
    theta0 = true + jnp.asarray(rng.uniform(-0.4, 0.4, len(PARAMS)),
                                jnp.float32)
    opt = optax.adam(0.03)

    @jax.jit
    def fit(theta):
        def step_opt(carry, _):
            th, os = carry
            val, g = jax.value_and_grad(loss)(th)
            up, os = opt.update(g, os)
            return (optax.apply_updates(th, up), os), val

        (th, _), ls = jax.lax.scan(step_opt, (theta, opt.init(theta)),
                                   None, length=iters)
        return th, ls

    theta_hat, ls = fit(theta0)
    if verbose:
        print(f"loss: {float(ls[0]):.3e} -> {float(ls[-1]):.3e}")
        print(f"{'param':>6} {'true':>10} {'init':>10} {'recovered':>10} "
              f"{'err%':>7}")
        for k, name in enumerate(PARAMS):
            tru, ini, rec = (float(np.exp(true[k])), float(np.exp(theta0[k])),
                             float(np.exp(theta_hat[k])))
            print(f"{name:>6} {tru:>10.6f} {ini:>10.6f} {rec:>10.6f} "
                  f"{100 * abs(rec - tru) / tru:>6.2f}%")
    rel_err = np.abs(np.exp(np.asarray(theta_hat))
                     / np.exp(np.asarray(true)) - 1)
    return {"rel_err": rel_err, "loss0": float(ls[0]),
            "loss": float(ls[-1])}


if __name__ == "__main__":
    out = run()
    assert out["rel_err"].max() < 0.02, out["rel_err"]
    print("all parameters recovered to <2%")
