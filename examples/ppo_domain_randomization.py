"""Domain-randomized fused PPO: train one controller for a POPULATION of
motors, inside the kernel.

``randomize={param: (lo, hi)}`` turns electrical motor parameters into
per-env state planes of the fused collection kernel: every env simulates
a different motor instance (drawn uniform at init, redrawn on every
violation reset), so one PPO run trains against the whole manufacturing
spread at fused-collection speed.  The policy observation does NOT
include the parameters — the result is a robust-blind controller.

The reference has no counterpart (one env = one fixed parameter set; a
population needs a Python loop of env instances); the XLA path's
``dynamic_params=True`` (see ``grad_sysid_pmsm.py``) is the 100x-slower
general-path equivalent.

Measured on one TPU v5e chip (Finite-TC-PermExDc, +-30% r_a/l_a, +-20%
psi_e; 600 iterations x 2048 envs x 256 steps = 315M env steps, ~5 s per
training run; eval = 15 collection-only rollouts on freshly drawn
motors, same seeds for both policies):

    nominal-trained policy  on random motors:  -0.0232
    DR-trained policy       on random motors:  -0.0225

The gap is real but small BY DESIGN of this framework's observation:
the policy sees the measured controlled quantity (torque) every step, so
feedback already compensates most of the parameter error — domain
randomization buys the remaining ~3% and costs nothing (PPO loop 219 vs
221M env-steps/s, a 0.7% difference).  The interesting capability is the
population itself: every env is a different motor, redrawn per episode,
trained in one fused run.

Run: ``python examples/ppo_domain_randomization.py``
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu.ops.pallas_policy import (
    fused_policy_init_planes,
    make_fused_policy_record_universal,
    policy_act_ns,
    policy_obs_dim,
)
from gym_electric_motor_tpu.parallel.sharded import (
    init_actor_critic_params,
    make_fused_ppo_trainer,
)

ENV_ID = "Finite-TC-PermExDc-v0"
NE, T, HID, ITERS = 2048, 256, 32, 600


def train(env, randomize, label):
    init_opt, tr = make_fused_ppo_trainer(
        env, hidden=HID, horizon=T, n_envs=NE, n_minibatches=8,
        n_epochs=2, lr=1e-3, gamma=0.9, vf_coef=0.1, ent_coef=0.01,
        kernel="universal", randomize=randomize)
    params = init_actor_critic_params(
        jax.random.PRNGKey(1), policy_obs_dim(env),
        int(sum(policy_act_ns(env))), HID)
    opt = init_opt(params)
    planes = fused_policy_init_planes(env, NE, randomize=randomize)
    seed, t0 = 3, time.time()
    for _seg in range(ITERS // 50):
        params, opt, planes, rs = tr(params, opt, planes, seed, 50)
        seed += 50
    rs = np.asarray(rs)
    print(f"  {label}: trained to {rs[-5:].mean():+.4f} "
          f"({time.time() - t0:.1f} s)")
    return params


def evaluate_on_random_motors(env, randomize, params, label):
    """Collection-only rollouts (no updates) on freshly drawn motors."""
    roll = make_fused_policy_record_universal(env, T, NE, hidden=HID,
                                              randomize=randomize)
    planes = fused_policy_init_planes(env, NE, randomize=randomize, seed=99)
    rews = []
    for seed in range(100, 120):
        out = roll(seed, params["w1"].reshape(-1), params["b1"],
                   params["wp"].reshape(-1), params["bp"], *planes)
        planes = tuple(out[nm][-1] for nm in roll.state_names)
        rews.append(float(jnp.mean(out["reward"])))
    print(f"  {label} on random motors: {np.mean(rews[5:]):+.4f}")
    return np.mean(rews[5:])


def main():
    env = gemx.make_functional(ENV_ID)
    mp = env.physical_system.motor.parameter
    rnd = {"r_a": (0.7 * mp["r_a"], 1.3 * mp["r_a"]),
           "l_a": (0.7 * mp["l_a"], 1.3 * mp["l_a"]),
           "psi_e": (0.8 * mp["psi_e"], 1.2 * mp["psi_e"])}
    print(f"{ENV_ID}: randomizing {sorted(rnd)}")

    p_nom = train(env, None, "nominal-trained")
    p_dr = train(env, rnd, "DR-trained     ")

    r_nom = evaluate_on_random_motors(env, rnd, p_nom, "nominal-trained")
    r_dr = evaluate_on_random_motors(env, rnd, p_dr, "DR-trained     ")
    print(f"robustness gap closed: {r_nom:+.4f} -> {r_dr:+.4f}")


if __name__ == "__main__":
    main()
