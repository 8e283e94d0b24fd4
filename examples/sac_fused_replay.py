"""Fused-collection Soft Actor-Critic.

The entropy-regularized member of the off-policy family (see
``td3_fused_replay.py`` / ``dqn_fused_replay.py``): the stochastic SAC
policy ITSELF collects — the actor's pre-squash mean rides the in-kernel
MLP and the learned state-independent log-std is the kernel's
squashed-Gaussian log-std vector, so there is no separate exploration
process to tune.  Twin soft critics, reparameterized tanh-Gaussian actor
updates (exact change-of-variables log-prob), Polyak targets and
automatic temperature tuning against the -|A| entropy target run in XLA
on the shared device-resident replay ring.

Measured on one TPU v5e chip (2048 envs x 256 steps):

    Cont-CC-PermExDc-v0: -2.2 -> -0.03 by ~800 iterations
    (420M env steps, ~7 s; the temperature equilibrates sigma at ~0.1)

Run: ``python examples/sac_fused_replay.py [env_id] [n_iters]``
(continuous-action ids).
"""

import sys
import time

import jax
import numpy as np

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu.parallel.sharded import make_fused_sac_trainer


def main(env_id="Cont-CC-PermExDc-v0", n_iters=1000):
    env = gemx.make_functional(env_id)
    init_state, train = make_fused_sac_trainer(
        env, hidden=32, horizon=256, n_envs=2048, replay_slots=4,
        n_updates=16, mb_envs=64)
    carry = init_state(jax.random.PRNGKey(1))

    seed, t0 = 3, time.time()
    done_iters = 0
    while done_iters < n_iters:  # chunked only for progress prints
        n = min(50, n_iters - done_iters)
        carry, rs, _ls = train(carry, seed, n)
        seed += n
        done_iters += n
        rs = np.asarray(rs)
        print(f"  iters {done_iters - n:4d}+: reward {rs[:5].mean():+.4f}"
              f" -> {rs[-5:].mean():+.4f}   "
              f"alpha {float(np.exp(carry[3])):.4f}  "
              f"sigma {float(np.exp(np.asarray(carry[0]['ls']).mean())):.3f}")
    dt = time.time() - t0
    total = n_iters * 2048 * 256
    print(f"{total / 1e6:.0f}M env steps in {dt:.1f} s "
          f"({total / dt / 1e6:.1f}M full-loop steps/s)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "Cont-CC-PermExDc-v0",
         int(sys.argv[2]) if len(sys.argv) > 2 else 1000)
