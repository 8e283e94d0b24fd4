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


def measure(env_id):
    env = gemx.make_functional(env_id)
    space = env.action_space
    kind = space.__class__.__name__

    reset = jax.jit(jax.vmap(env.reset))
    step = jax.vmap(env.step_autoreset)

    if kind == "Discrete":
        def sample_actions(key):
            return jax.random.randint(key, (N_ENVS,), 0, space.n)
    elif kind == "MultiDiscrete":
        nvec = jnp.asarray(space.nvec)

        def sample_actions(key):
            u = jax.random.uniform(key, (N_ENVS, len(space.nvec)))
            return (u * nvec).astype(jnp.int32)
    else:
        dim = space.shape[0]

        def sample_actions(key):
            return jax.random.uniform(key, (N_ENVS, dim), minval=-1.0, maxval=1.0)

    @jax.jit
    def rollout(state, key):
        def body(carry, _):
            state, key = carry
            key, k_act = jax.random.split(key)
            state, _obs, reward, term = step(state, sample_actions(k_act))
            return (state, key), None

        (state, _), _ = jax.lax.scan(body, (state, key), None, length=N_STEPS)
        # reduce something so nothing is dead-code eliminated
        return state, jnp.sum(state.system_state)

    keys = jax.random.split(jax.random.PRNGKey(0), N_ENVS)
    state, _obs = reset(keys)
    # warmup / compile (fetch the checksum: through the axon tunnel,
    # block_until_ready alone does not reliably wait for completion)
    state, checksum = rollout(state, jax.random.PRNGKey(1))
    float(checksum)

    best = 0.0
    for rep in range(N_REPS):
        t0 = time.perf_counter()
        state, checksum = rollout(state, jax.random.PRNGKey(2 + rep))
        float(checksum)
        dt = time.perf_counter() - t0
        best = max(best, N_ENVS * N_STEPS / dt)
    return best


def measure_fused():
    """The fused Pallas rollout for the flagship config: the whole T-step
    loop runs inside one kernel with all state resident in VMEM.  A longer
    rollout amortizes the fixed dispatch/tunnel overhead (~30 ms/call)."""
    from gym_electric_motor_tpu.ops.pallas_rollout import make_fused_pmsm_rollout

    n_steps = int(os.environ.get("BENCH_FUSED_STEPS", 16000))
    env = gemx.make_functional("Finite-CC-PMSM-v0")
    rollout = make_fused_pmsm_rollout(env, n_steps, N_ENVS, action_mode="random")
    z = jnp.zeros((N_ENVS // 128, 128), jnp.float32)
    float(rollout(1, z, z, z)[3].sum())  # warmup; fetch forces completion
    best = 0.0
    for rep in range(N_REPS):
        t0 = time.perf_counter()
        out = rollout(2 + rep, z, z, z)
        float(out[3].sum())
        best = max(best, N_ENVS * n_steps / (time.perf_counter() - t0))
    return best


def main():
    if os.environ.get("BENCH_ALL"):
        # the full BASELINE.json config set; per-config numbers to stderr
        for env_id in ("Finite-CC-PermExDc-v0", "Cont-SC-SeriesDc-v0",
                       "Cont-SC-ShuntDc-v0", "Finite-CC-PMSM-v0",
                       "Cont-TC-SCIM-v0", "Finite-CC-EESM-v0", "Cont-CC-DFIM-v0"):
            v = measure(env_id)
            print(f"{env_id}: {v / 1e6:.1f}M env-steps/s", file=sys.stderr)
        # second fused kernel (DC family)
        from gym_electric_motor_tpu.ops.pallas_rollout import make_fused_permex_rollout

        envp = gemx.make_functional("Finite-CC-PermExDc-v0")
        n_steps = int(os.environ.get("BENCH_FUSED_STEPS", 16000))
        rollp = make_fused_permex_rollout(envp, n_steps, N_ENVS)
        z = jnp.zeros((N_ENVS // 128, 128), jnp.float32)
        float(rollp(1, z)[1].sum())
        t0 = time.perf_counter()
        float(rollp(2, z)[1].sum())
        v = N_ENVS * n_steps / (time.perf_counter() - t0)
        print(f"Finite-CC-PermExDc-v0 (fused Pallas rollout): {v / 1e6:.1f}M "
              f"env-steps/s", file=sys.stderr)

    xla = measure("Finite-CC-PMSM-v0")
    print(f"Finite-CC-PMSM-v0 (general XLA path): {xla / 1e6:.1f}M env-steps/s",
          file=sys.stderr)
    try:
        fused = measure_fused()
        print(f"Finite-CC-PMSM-v0 (fused Pallas rollout): {fused / 1e6:.1f}M "
              f"env-steps/s", file=sys.stderr)
    except Exception as e:  # pallas path needs real TPU hardware
        print(f"fused Pallas rollout unavailable ({e!r}); using XLA path",
              file=sys.stderr)
        fused = 0.0
    best = max(xla, fused)
    print(json.dumps({
        "metric": "env_steps_per_s",
        "value": round(best, 1),
        "unit": "steps/s",
        "vs_baseline": round(best / BASELINE_STEPS_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
