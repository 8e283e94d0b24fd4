"""Massively vectorized RL-style rollout.

The counterpart of the reference's reinforcement-learning example notebooks
(``/root/reference/examples/reinforcement_learning_controllers/``), redesigned
for TPU: a policy network steps 16k environments in lockstep inside one
jitted scan, and a REINFORCE update with psum-reduced gradients runs over the
device mesh.

Run:  python examples/rl_rollout.py  [--envs 16384 --steps 200 --iters 20]
"""

import argparse
import time

import jax
import jax.numpy as jnp

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu.parallel import (
    make_env_mesh,
    train_step_reinforce,
)
from gym_electric_motor_tpu.parallel.sharded import init_policy_params
from jax.sharding import NamedSharding, PartitionSpec as P


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--env-id", default="Finite-CC-PMSM-v0")
    args = ap.parse_args()

    env = gemx.make_functional(args.env_id)
    mesh = make_env_mesh()
    shard = NamedSharding(mesh, P(mesh.axis_names[0]))
    print(f"devices: {jax.devices()}  mesh: {mesh}")

    keys = jax.device_put(jax.random.split(jax.random.PRNGKey(0), args.envs), shard)
    state, _obs = jax.jit(jax.vmap(env.reset))(keys)

    obs_dim = len(env.state_names) + len(env.reference_names)
    params = init_policy_params(jax.random.PRNGKey(1), obs_dim, env.action_space.n)

    t0 = time.perf_counter()
    for it in range(args.iters):
        params, state, loss = train_step_reinforce(
            env, mesh, params, state, jax.random.PRNGKey(2 + it)
        )
        if it % 5 == 0:
            print(f"iter {it:3d}  loss {float(loss):+.5f}")
    jax.block_until_ready(params)
    dt = time.perf_counter() - t0
    print(f"{args.iters} updates x {args.envs} envs in {dt:.2f}s "
          f"({args.iters * args.envs / dt:,.0f} env-steps/s incl. grads)")


if __name__ == "__main__":
    main()
