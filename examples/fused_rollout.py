"""Speed-of-light rollouts for ANY catalog env id via the universal fused
Pallas dispatch.

Every one of the 54 env ids maps to one of five family kernels
(``ops/pallas_rollout.py``) that run the ENTIRE T-step rollout — converter,
motor ODE (RK4), Wiener references, WSE reward, constraints, in-kernel
auto-reset — inside one ``pallas_call`` with all state resident in VMEM.
On one TPU v5e chip this reaches 3.8-6.8B env-steps/s depending on the
family (see docs/performance.md); on CPU this example runs the same kernel
code through the Pallas interpreter (slow, but semantically identical).

Usage: python examples/fused_rollout.py [env-id] [n_steps] [n_envs]
"""

import sys

import jax
import jax.numpy as jnp

import gym_electric_motor_tpu as gemx
from gym_electric_motor_tpu.ops.pallas_rollout import (
    fused_state_arity,
    make_fused_rollout,
)


def main():
    env_id = sys.argv[1] if len(sys.argv) > 1 else "Cont-SC-PMSM-v0"
    on_tpu = jax.default_backend() not in ("cpu",)
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else (16000 if on_tpu else 500)
    n_envs = int(sys.argv[3]) if len(sys.argv) > 3 else (16384 if on_tpu else 256)

    env = gemx.make_functional(env_id)
    n_state = fused_state_arity(env)
    rollout = make_fused_rollout(env, n_steps, n_envs, interpret=not on_tpu)

    zero = jnp.zeros((n_envs // 128, 128), jnp.float32)
    out = rollout(0, *([zero] * n_state))
    states, reward_sum, term_count = out[:n_state], out[n_state], out[n_state + 1]

    import time

    t0 = time.perf_counter()
    out = rollout(1, *([zero] * n_state))
    total_reward = float(out[n_state].sum())  # value fetch = completion fence
    dt = time.perf_counter() - t0

    print(f"{env_id}: {n_envs} envs x {n_steps} steps "
          f"({'TPU kernel' if on_tpu else 'CPU interpreter'})")
    print(f"  mean reward/step: {total_reward / (n_envs * n_steps):+.4f}")
    print(f"  terminations:     {float(out[n_state + 1].sum()):.0f}")
    print(f"  throughput:       {n_envs * n_steps / dt / 1e6:.1f}M env-steps/s")


if __name__ == "__main__":
    main()
