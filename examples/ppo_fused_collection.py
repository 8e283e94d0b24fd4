"""PPO with fused-kernel on-policy collection — Finite-CC-PMSM-v0.

The rollout runs INSIDE a Pallas kernel (the actor MLP is evaluated
per-step in VMEM, its sampled switching action drives the B6 bridge, and
the transition stream is written straight to HBM), while GAE and the
clipped-surrogate updates stay in XLA.  On one TPU v5e chip this trains
on ~1.3 BILLION environment steps in ~45 seconds — mean tracking reward
improves from the random-policy -0.20 to ~-0.06.  The reference trains
the same kind of task through stable-baselines3 at ~1e3-1e4 steps/s
(examples/reinforcement_learning_controllers/), where 1.3B steps would
take days.

Two details that make it learn (both mirrored from the reference's RL
setups): the rotor angle enters the observation as cos/sin (the
CosSinProcessor trick — a raw wrapped angle is a discontinuous feature),
and the data budget is ~1000x what single-env collection affords.

Run: ``python examples/ppo_fused_collection.py [n_iters]``
(~1 min on TPU with the default 2500; pass 200 for a quick look).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu.parallel.sharded import (
    init_actor_critic_params,
    make_fused_ppo_trainer,
)

N_ENVS, HORIZON, SEG = 2048, 256, 50


def main(n_iters=2500):
    env = gemx.make_functional(
        "Finite-CC-PMSM-v0",
        state_filter=("omega", "i_sd", "i_sq", "epsilon"))
    init_opt, train = make_fused_ppo_trainer(
        env, hidden=32, horizon=HORIZON, n_envs=N_ENVS, n_minibatches=8,
        n_epochs=2, lr=1e-3, gamma=0.9, vf_coef=0.1, ent_coef=0.01)
    params = init_actor_critic_params(jax.random.PRNGKey(1), 7, 8, 32)
    opt_state = init_opt(params)
    planes = tuple(jnp.zeros((N_ENVS // 128, 128), jnp.float32)
                   for _ in range(3))

    t0, seed, done = time.time(), 3, 0
    while done < n_iters:
        n = min(SEG, n_iters - done)
        params, opt_state, planes, rs = train(params, opt_state, planes,
                                              seed, n)
        seed += n
        done += n
        rs = np.asarray(rs)
        if done % 500 < SEG or done == n_iters:
            steps = done * N_ENVS * HORIZON
            print(f"iter {done:5d}  ({steps / 1e9:.2f}B steps, "
                  f"{time.time() - t0:5.0f}s)  mean reward "
                  f"{rs[-10:].mean():+.4f}")
    total = n_iters * N_ENVS * HORIZON
    dt = time.time() - t0
    print(f"\n{total / 1e9:.2f}B env steps in {dt:.0f}s "
          f"({total / dt / 1e6:.0f}M steps/s through the full PPO loop)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2500)
