"""Fused-collection PPO on ANY catalog env — one script, every family.

Round-4 capability: the in-kernel actor rides the family-namespace
surface (``ops.pallas_policy.make_fused_policy_record_universal``), so
the same trainer drives

* finite envs with factorized-categorical heads (EESM = 8 x 4 B6 + 4QC,
  DFIM = 8 x 8 dual B6, ExtExDc = 4 x 4 dual 4QC), and
* continuous envs with squashed-Gaussian duty channels (learned
  per-channel log-stds; raw pre-squash samples recorded so behavior
  log-probs recompute exactly host-side).

The observation is built per family from the obs spec (normalized
speed / current / flux planes, cos/sin of the rotor angle, the
normalized controlled quantities, the reference values).

Measured on one TPU v5e chip (2048 envs x 256 steps, 600 iterations =
~315M env steps in ~15-25 s per env):

    Finite-CC-PermExDc  -0.47 -> -0.02      Finite-CC-SCIM  -0.21 -> -0.13
    Finite-CC-EESM      -0.26 -> -0.10      Finite-CC-PMSM  -0.20 -> -0.11
    Cont-CC-PermExDc    -0.61 -> -0.001     Cont-CC-PMSM    -0.20 -> -0.04

Run: ``python examples/ppo_universal_families.py [env_id] [n_iters]``
(default Finite-CC-PermExDc-v0, 600 iters; any of the 54 catalog ids
works).  The reference trains through stable-baselines3 one CPU env at a
time (examples/reinforcement_learning_controllers/) — this is the
TPU-native counterpart at ~10,000x the data rate.
"""

import sys
import time

import jax
import numpy as np

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu.ops.pallas_policy import (
    fused_policy_init_planes,
    policy_act_ns,
    policy_n_cont,
    policy_obs_dim,
)
from gym_electric_motor_tpu.parallel.sharded import (
    init_actor_critic_params,
    make_fused_ppo_trainer,
)


def main(env_id="Finite-CC-PermExDc-v0", n_iters=600):
    env = gemx.make_functional(env_id)
    n_envs, horizon, hidden = 2048, 256, 32
    obs_dim = policy_obs_dim(env)
    act_ns = policy_act_ns(env)
    n_cont = policy_n_cont(env)
    n_out = n_cont if n_cont else int(sum(act_ns))
    kind = (f"{n_cont} squashed-Gaussian duty channels" if n_cont
            else f"categorical heads {act_ns}")
    print(f"{env_id}: obs_dim={obs_dim}, policy = {kind}")

    init_opt, train = make_fused_ppo_trainer(
        env, hidden=hidden, horizon=horizon, n_envs=n_envs,
        n_minibatches=8, n_epochs=2, lr=1e-3, gamma=0.9, vf_coef=0.1,
        ent_coef=0.0 if n_cont else 0.01, kernel="universal")
    params = init_actor_critic_params(jax.random.PRNGKey(1), obs_dim,
                                      n_out, hidden, n_cont=n_cont)
    opt_state = init_opt(params)
    planes = fused_policy_init_planes(env, n_envs)

    seed, t0 = 3, time.time()
    # chunked host loop only for progress prints (train() itself
    # auto-segments the compiled scan for axon worker stability)
    done_iters = 0
    while done_iters < n_iters:
        n = min(50, n_iters - done_iters)
        params, opt_state, planes, rs = train(params, opt_state, planes,
                                              seed, n)
        seed += n
        done_iters += n
        rs = np.asarray(rs)
        print(f"  iters {done_iters - n:4d}+: mean tracking reward "
              f"{rs[:5].mean():+.4f} -> {rs[-5:].mean():+.4f}")
    dt = time.time() - t0
    total = n_iters * n_envs * horizon
    print(f"{total / 1e6:.0f}M env steps in {dt:.1f} s "
          f"({total / dt / 1e6:.1f}M full-loop steps/s)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "Finite-CC-PermExDc-v0",
         int(sys.argv[2]) if len(sys.argv) > 2 else 600)
