"""Fused-collection double-DQN with a device-resident replay ring.

Off-policy counterpart of ``ppo_universal_families.py``: the Q-network
IS the in-kernel MLP of the universal policy recorder, and Boltzmann
exploration (``softmax(Q / temperature)`` per converter sub-action) is
implemented by scaling the output layer by ``1/temperature`` — so the
exploration policy runs in VMEM at fused-kernel speed with zero kernel
changes.  Replay is a ring of the last K collected batches living in
device HBM (env-major rows, coarse gathers only); updates are double-DQN
TD with a Polyak target network, Q(s,a) looked up by one-hot
contraction, never a gather.

Measured on one TPU v5e chip (2048 envs x 256 steps, 16 TD updates of
64 env-rows per iteration, gamma=0.9):

    Finite-CC-PermExDc-v0: reward -0.54 -> ~-0.06 over 600 iterations
    (315M env steps, ~10 s wall)

The AC machines (B6 converter, 8 actions) need a slightly different
recipe — gamma=0.95 and a faster, deeper temperature anneal
(temp_min=0.02, temp_half_life=100) — plus ~2400 iterations; with it
(pass ``--ac``) DQN beats the matched PPO result on all three families:

    Finite-CC-PMSM-v0: -0.198 -> -0.080   (PPO reaches -0.11)
    Finite-CC-SCIM-v0: -0.212 -> -0.102   (PPO: -0.13)
    Finite-CC-EESM-v0: -0.267 -> -0.074   (PPO: -0.10)

Interesting negative result for contrast: OFFLINE DQN on recorded random
data fails on this task (the Q residual floor exceeds the tau=1e-5
action gap — see ``offline_sysid_fcs_control.py``); online Boltzmann
collection at gamma=0.9 closes exactly that gap by concentrating data
near the current greedy policy.

Run: ``python examples/dqn_fused_replay.py [env_id] [n_iters]``
(any finite-action catalog id; continuous envs -> use the PPO trainer).
The reference's flagship RL example trains an SB3/keras-rl DQN on one
CPU env instance (examples/reinforcement_learning_controllers/).
"""

import sys
import time

import jax
import numpy as np

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu.parallel.sharded import make_fused_dqn_trainer


def main(env_id="Finite-CC-PermExDc-v0", n_iters=600, ac_recipe=False):
    env = gemx.make_functional(env_id)
    recipe = (dict(gamma=0.95, temp_min=0.02, temp_half_life=100.0)
              if ac_recipe
              else dict(gamma=0.9, temp_min=0.05, temp_half_life=150.0))
    init_state, train = make_fused_dqn_trainer(
        env, hidden=32, horizon=256, n_envs=2048, replay_slots=4,
        n_updates=16, mb_envs=64, lr=1e-3, temp0=1.0, polyak=0.02,
        **recipe)
    carry = init_state(jax.random.PRNGKey(1))

    seed, t0 = 3, time.time()
    # chunked host loop only for progress prints (train() itself
    # auto-segments the compiled scan for axon worker stability)
    done_iters = 0
    while done_iters < n_iters:
        n = min(50, n_iters - done_iters)
        carry, rs, ls = train(carry, seed, n)
        seed += n
        done_iters += n
        rs, ls = np.asarray(rs), np.asarray(ls)
        print(f"  iters {done_iters - n:4d}+: reward {rs[:5].mean():+.4f} -> "
              f"{rs[-5:].mean():+.4f}   td-loss {ls[-5:].mean():.5f}")
    dt = time.time() - t0
    total = n_iters * 2048 * 256
    print(f"{total / 1e6:.0f}M env steps in {dt:.1f} s "
          f"({total / dt / 1e6:.1f}M full-loop steps/s)")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--ac"]
    main(args[0] if args else "Finite-CC-PermExDc-v0",
         int(args[1]) if len(args) > 1 else 600,
         ac_recipe="--ac" in sys.argv[1:])
