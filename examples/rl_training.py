#!/usr/bin/env python
"""Train an RL current controller on a sharded env batch.

Counterpart of the reference's RL examples
(``/root/reference/examples/reinforcement_learning_controllers/`` —
SB3 DQN/DDPG notebooks driving one env through the gym API): here a softmax
policy trains with REINFORCE over thousands of lockstep
``Finite-CC-PermExDc-v0`` envs sharded ``P('env')`` across every available
device, the whole (rollout + gradient + psum + update) step jitted as one
program.  The dense current-tracking reward makes one-step REINFORCE
converge to a measurably better-than-random controller inside a minute.

Run:  python examples/rl_training.py [--iters 1500] [--envs 4096]
(On a CPU-only box it auto-switches to a small virtual mesh.)

For classical (non-learned) control, see examples/classic_controller.py;
for a gymnasium/SB3-style single env, ``gymnasium.make("Finite-CC-PMSM-v0")``.
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu.parallel import (
    ShardedVectorEnv,
    make_env_mesh,
)
from gym_electric_motor_tpu.parallel.sharded import (
    init_policy_params,
    make_reinforce_trainer,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env-id", default="Finite-CC-PermExDc-v0")
    ap.add_argument("--iters", type=int, default=1500)
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--lr", type=float, default=3e-3)
    args = ap.parse_args()

    if jax.default_backend() == "cpu":
        args.envs = min(args.envs, 512)

    env = gemx.make_functional(args.env_id)
    mesh = make_env_mesh()
    n_envs = args.envs - args.envs % mesh.size
    venv = ShardedVectorEnv(env, n_envs, mesh)
    print(f"{args.env_id}: {n_envs} envs over {mesh.size} device(s) "
          f"[{jax.default_backend()}]")

    obs_dim = len(np.asarray(env._state_filter)) + env.observation_space[1].shape[0]
    n_actions = env.action_space.n
    params = init_policy_params(jax.random.PRNGKey(0), obs_dim, n_actions)
    state, _ = venv.reset(jax.random.PRNGKey(1))
    # the ENTIRE training run is one jitted program (scan over iterations,
    # shard_map over the env mesh, psum'd gradients) — a single dispatch
    train = make_reinforce_trainer(env, mesh, lr=args.lr)

    key = jax.random.PRNGKey(2)
    train(params, state, key, args.iters)[2].block_until_ready()  # compile
    t0 = time.time()
    params, state, rs = train(params, state, key, args.iters)
    rs = np.asarray(rs)
    dt = time.time() - t0
    for it in range(0, args.iters, max(1, args.iters // 8)):
        print(f"iter {it:5d}  mean reward/step {rs[it]:+.4f}")
    early, final = rs[:50].mean(), rs[-50:].mean()
    print(f"\n{args.iters} iters x {n_envs} envs in {dt:.1f}s "
          f"({args.iters * n_envs / dt / 1e6:.1f}M env-steps/s through training)")
    print(f"mean reward/step: {early:+.4f} (first 50) -> {final:+.4f} (last 50)")
    if final > early:
        print("policy improved ✓")


if __name__ == "__main__":
    main()
