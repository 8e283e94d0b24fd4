"""Fused-collection TD3 on a continuous-action drive env.

The continuous off-policy counterpart of ``dqn_fused_replay.py`` (and
the off-policy counterpart of ``ppo_universal_families.py``): the
deterministic actor's pre-squash mean IS the in-kernel MLP of the
universal policy recorder, exploration is the kernel's own Gaussian
sampling with an annealed state-independent sigma, and the replay ring /
twin-critic TD3 updates (target smoothing, min(Q1', Q2'), delayed
actor, Polyak targets) run in XLA on env-major rows.

Stability on these constraint-guarded envs is all about actor pacing
(see the ``make_fused_td3_trainer`` docstring): a fast actor improves
briefly and then collapses into the all-violation basin; the default
``actor_lr=1e-4`` + ``polyak=0.005`` + annealed-sigma recipe is stable —
Cont-CC-PermExDc reaches ~-0.05 collected reward (at the
exploration-noise floor) by 600 iterations / 315M env steps, ~5 s of
chip time.

Run: ``python examples/td3_fused_replay.py [env_id] [n_iters]``
(continuous-action ids; finite-action envs -> ``dqn_fused_replay.py``).
Reference counterpart: the SB3 DDPG notebook
(examples/reinforcement_learning_controllers/ddpg_pmsm_dq_current_
control.py) training one CPU env instance — TD3 is its modern
successor.  The EXACT counterpart config — the dq-action PMSM
current-control env — trains fused too (the dq interface runs in-kernel):

    make_functional("Cont-CC-PMSM-v0", control_space="dq")
    -> reward -0.20 -> -0.09 over 315M env steps in ~6 s on one chip.
"""

import sys
import time

import jax
import numpy as np

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu.parallel.sharded import make_fused_td3_trainer


def main(env_id="Cont-CC-PermExDc-v0", n_iters=600):
    env = gemx.make_functional(env_id)
    init_state, train = make_fused_td3_trainer(
        env, hidden=32, horizon=256, n_envs=2048, replay_slots=4,
        n_updates=16, mb_envs=64)
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
              f"{rs[-5:].mean():+.4f}   critic-loss {ls[-5:].mean():.5f}")
    dt = time.time() - t0
    total = n_iters * 2048 * 256
    print(f"{total / 1e6:.0f}M env steps in {dt:.1f} s "
          f"({total / dt / 1e6:.1f}M full-loop steps/s)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "Cont-CC-PermExDc-v0",
         int(sys.argv[2]) if len(sys.argv) > 2 else 600)
