#!/usr/bin/env python
"""Headline benchmark: vectorized env-steps/s on Finite-CC-PMSM-v0.

Runs `N_ENVS` lockstep PMSM current-control environments (the BASELINE.json
flagship config) with a random discrete policy, scanned over time inside one
jitted program on the default backend (the real TPU chip under the driver).

Prints ONE JSON line:
  {"metric": "env_steps_per_s", "value": ..., "unit": "steps/s",
   "vs_baseline": value / 10e6}
where the baseline is the driver-set north star of 10M env-steps/s/chip
(BASELINE.md; the reference publishes no numbers of its own).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import gym_electric_motor_tpu as gemx  # noqa: E402

N_ENVS = int(os.environ.get("BENCH_N_ENVS", 16384))
N_STEPS = int(os.environ.get("BENCH_N_STEPS", 1000))
N_REPS = int(os.environ.get("BENCH_REPS", 3))
BASELINE_STEPS_PER_S = 10e6


def main():
    env = gemx.make_functional("Finite-CC-PMSM-v0")
    n_actions = env.action_space.n

    reset = jax.jit(jax.vmap(env.reset))
    step = jax.vmap(env.step_autoreset)

    @jax.jit
    def rollout(state, key):
        def body(carry, _):
            state, key = carry
            key, k_act = jax.random.split(key)
            actions = jax.random.randint(k_act, (N_ENVS,), 0, n_actions)
            state, _obs, reward, term = step(state, actions)
            return (state, key), None

        (state, _), _ = jax.lax.scan(body, (state, key), None, length=N_STEPS)
        # reduce something so nothing is dead-code eliminated
        return state, jnp.sum(state.system_state)

    keys = jax.random.split(jax.random.PRNGKey(0), N_ENVS)
    state, _obs = reset(keys)
    # warmup / compile
    state, checksum = rollout(state, jax.random.PRNGKey(1))
    checksum.block_until_ready()

    best = 0.0
    for rep in range(N_REPS):
        t0 = time.perf_counter()
        state, checksum = rollout(state, jax.random.PRNGKey(2 + rep))
        checksum.block_until_ready()
        dt = time.perf_counter() - t0
        best = max(best, N_ENVS * N_STEPS / dt)

    print(json.dumps({
        "metric": "env_steps_per_s",
        "value": round(best, 1),
        "unit": "steps/s",
        "vs_baseline": round(best / BASELINE_STEPS_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
